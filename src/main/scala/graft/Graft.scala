package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Shared session + table helpers for the graft engine.
  *
  * The engine is DataFrame-first (SURVEY.md §7.1): every operator is a pure
  * `DataFrame => DataFrame` function so Catalyst owns optimization (pushdown,
  * pruning, AQE) and so each operator is expressible as the ANSI SQL the
  * DuckDB oracle needs.
  */
object Graft {

  /** Canonical local session for tests / standalone runs. The driver's
    * Verify/Bench mains build their own sessions with harness-provided CPU
    * counts; this one mirrors their config.
    */
  def session(cores: Int = 32, appName: String = "graft"): SparkSession = {
    val spark = SparkSession
      .builder()
      .master(s"local[$cores]")
      .appName(appName)
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }

  /** Load one of the driver testdata tables from a scale-factor directory. */
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")
}
