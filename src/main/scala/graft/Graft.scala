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
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }

  /** Load one of the driver testdata tables from a scale-factor directory. */
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    // the events fixture carries TIMESTAMP(NANOS), which Spark's reader
    // rejects unless nanos are surfaced as long
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$sfDir/$name.parquet")
  }

  /** The events table with `ts` normalized to a TIMESTAMP column (the
    * fixture stores TIMESTAMP(NANOS); Spark reads it as long nanos under
    * the legacy flag — truncate to micros, matching DuckDB's nanos→micros
    * cast).
    */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val raw = table(spark, sfDir, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        // integer division — `/` is double division and long→double loses
        // precision above 2^53, shifting ~12% of nanos timestamps by 1µs
        // vs DuckDB's integer truncation
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _ => raw
    }
  }

  /** The events table as a file-source STREAM with the same `ts`
    * normalization as [[events]] (file streams need an explicit schema —
    * taken from a batch peek at the same path). Each call returns an
    * independent source instance, so a self-join reads two clean scans.
    * The fixture is a single FILE, and `FileStreamSource` demands a
    * directory-shaped base path — a one-character glob class on the last
    * letter makes the source derive the sfDir parent as basePath while
    * still matching only events.parquet.
    */
  def eventsStream(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val raw = table(spark, sfDir, "events")
    val stream =
      spark.readStream.schema(raw.schema).parquet(s"$sfDir/events.parque[t]")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        stream.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _ => stream
    }
  }
}
