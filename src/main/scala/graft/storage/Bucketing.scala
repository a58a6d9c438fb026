package graft.storage

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Physical-layout operators for shuffle avoidance at scale:
  * bucketed-table co-located joins (the durable form of the reference's
  * M×R partition files — SURVEY.md §2.5 X1) and deterministic skew
  * salting.
  */
object Bucketing {

  /** Persist a DataFrame as a bucketed, sorted table: rows co-located by
    * hash(bucketCol) into `numBuckets` files. Two tables bucketed the same
    * way join WITHOUT any shuffle exchange (asserted in PlanShapeSpec) —
    * at 100 TB this turns every repeated join on the key into a local
    * merge, paying the shuffle once at write time.
    */
  def writeBucketed(
      df: DataFrame,
      table: String,
      bucketCol: String,
      numBuckets: Int): Unit =
    df.write
      .mode("overwrite")
      .bucketBy(numBuckets, bucketCol)
      .sortBy(bucketCol)
      .saveAsTable(table)

  /** Join two same-bucketed tables on the bucket key — no exchange. */
  def coLocatedJoin(
      spark: SparkSession,
      table1: String,
      table2: String,
      key: String): DataFrame =
    spark.table(table1).join(spark.table(table2), Seq(key))

  /** Deterministic skew-salted equi-join: the big side gets a salt derived
    * from a hash of its own row (stable across task retries — no rand()),
    * the small side is replicated `factor` times; the join key becomes
    * (key, salt), splitting each hot key's rows across `factor` reducers.
    * AQE's skew-join handles moderate skew automatically; explicit salting
    * is for the pathological single-key case AQE cannot split further.
    * Produces exactly the rows of `big.join(small, key)`.
    */
  def saltedEquiJoin(
      big: DataFrame,
      small: DataFrame,
      key: String,
      factor: Int): DataFrame = {
    require(factor >= 1, "salt factor must be >= 1")
    val saltedBig = big.withColumn(
      "_salt",
      pmod(hash(big.columns.map(col).toSeq: _*), lit(factor)))
    val replicatedSmall = small.withColumn(
      "_salt",
      explode(sequence(lit(0), lit(factor - 1))))
    saltedBig
      .join(replicatedSmall, Seq(key, "_salt"))
      .drop("_salt")
  }
}
