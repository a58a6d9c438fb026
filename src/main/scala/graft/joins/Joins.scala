package graft.joins

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Temporal join operators beyond Spark's built-in equi-joins: time-bounded
  * event joins and as-of joins (the reference has no joins at all —
  * SURVEY.md §2.3; these are the training-pipeline/event-analytics
  * extensions).
  */
object Joins {

  /** Time-bounded event join: for each left event, all right events with
    * the same key and `r.ts` in `[l.ts, l.ts + window]`. The batch form of
    * a Structured Streaming stream–stream inner join (the same condition
    * works on two watermarked streams — see
    * [[graft.streaming.StreamOps]]'s tests).
    *
    * Scale: an equi-join on the key plus a range predicate — Spark hashes
    * on the key and filters the range inside the join, so skew follows key
    * cardinality (salt hot keys upstream if needed).
    */
  def timeBoundJoin(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      rightKey: String,
      leftTs: String,
      rightTs: String,
      window: String): DataFrame = {
    require(
      (Set(leftKey, leftTs) intersect Set(rightKey, rightTs)).isEmpty,
      "rename join columns to distinct names first (avoids self-join ambiguity)")
    left.join(
      right,
      col(leftKey) === col(rightKey) &&
        col(rightTs) >= col(leftTs) &&
        col(rightTs) <= col(leftTs) + expr(s"INTERVAL $window"))
  }

  /** As-of join: for each left row, the single LATEST right row (same key)
    * with `r.ts <= l.ts` — the standard point-in-time lookup (prices,
    * model versions, most recent preceding event). Rows with no preceding
    * match are kept with nulls (left as-of). Ties on `r.ts` break by the
    * larger `rightVal` (max-by-(ts, value)).
    *
    * Implementation: tag + union + per-key running `last(ignoreNulls)`
    * window — both sides shuffle ONCE on the key and sort by (ts, side,
    * value); each left row reads the latest preceding right struct off the
    * running window. Linear in |L| + |R| per key: no join, so a hot key
    * with many left and many right rows costs |L|+|R| log(|L|+|R|) (sort),
    * never the |L|·|R| fan-out a pre-aggregation range join materializes.
    *
    * @param rightVal  the right-side value column to fetch
    * @return left rows + (asof_ts, asof_value nullable)
    */
  def asofJoin(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTs: String,
      rightTs: String,
      rightVal: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.types.{StructField, StructType}
    val rStructType = StructType(Seq(
      StructField("_rts", right.schema(rightTs).dataType),
      StructField("_rval", right.schema(rightVal).dataType)))
    // identical schemas: (_k, _ts, _side, _r, <left columns>); the right
    // side carries nulls for the left payload, the left side a null _r
    val l = left.select(
      Seq(
        col(key).as("_k"),
        col(leftTs).as("_ts"),
        lit(1).as("_side"),
        lit(null).cast(rStructType).as("_r")) ++
        left.columns.map(col): _*)
    val r = right.select(
      Seq(
        col(key).as("_k"),
        col(rightTs).as("_ts"),
        lit(0).as("_side"),
        struct(col(rightTs).as("_rts"), col(rightVal).as("_rval")).as("_r")) ++
        left.columns.map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)
    // order: ts, then side (right=0 before left=1 so r.ts == l.ts counts as
    // preceding), then the right struct ascending so the running `last` is
    // the max-by-(ts, value). Left rows tie on (ts, 1, null) but contribute
    // nothing to the running last, so their relative order is immaterial.
    val w = Window
      .partitionBy(col("_k"))
      .orderBy(col("_ts"), col("_side"), col("_r"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.union(r)
      .withColumn("_b", last(col("_r"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
      .select(
        left.columns.map(col).toIndexedSeq :+
          col("_b._rts").as("asof_ts") :+
          col("_b._rval").as("asof_value"): _*)
  }

  /** Interval-overlap join WITHOUT an equi key (range join): every
    * (left, right) pair whose closed intervals `[lStart, lEnd]` and
    * `[rStart, rEnd]` overlap. Spark's native plans for a pure range
    * predicate are BroadcastNestedLoopJoin (driver-memory-bounded) or a
    * cartesian (O(|L|·|R|) — dead at any scale). This operator makes it
    * an EQUI join: each interval explodes into the fixed-width buckets
    * it touches, the two sides hash-join on the bucket id, the true
    * overlap predicate filters inside the join, and each pair is kept
    * exactly once by crediting it to the FIRST bucket the two intervals
    * share (`_b = greatest(floor(lStart/w), floor(rStart/w))` — the
    * standard dedup rule, no distinct shuffle).
    *
    * Scale: replication factor per row is `len/w + 1`, and per-bucket
    * work is the bucket's left-density × right-density — pick
    * `bucketWidth` near the typical interval length so both stay O(1).
    * The bucket equi-join shuffles both sides once; a pathologically
    * dense bucket is an ordinary equi-join skew, which AQE's skew split
    * re-plans at runtime (no custom salting needed).
    *
    * Bounds must be integral (epoch seconds, days, positions…).
    * Malformed intervals (end < start) are dropped on both sides —
    * Spark's `sequence(a, b)` would otherwise generate DESCENDING
    * buckets for them and manufacture overlaps.
    */
  def intervalJoin(
      left: DataFrame,
      right: DataFrame,
      lStart: String,
      lEnd: String,
      rStart: String,
      rEnd: String,
      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive, got $bucketWidth")
    require(
      (Set(lStart, lEnd) intersect Set(rStart, rEnd)).isEmpty,
      "rename join columns to distinct names first (avoids self-join ambiguity)")
    def buckets(s: String, e: String) =
      sequence(
        floor(col(s) / bucketWidth).cast("long"),
        floor(col(e) / bucketWidth).cast("long"))
    val lb = left
      .filter(col(lEnd) >= col(lStart))
      .withColumn("_lb0", floor(col(lStart) / bucketWidth).cast("long"))
      .withColumn("_b", explode(buckets(lStart, lEnd)))
    val rb = right
      .filter(col(rEnd) >= col(rStart))
      .withColumn("_rb0", floor(col(rStart) / bucketWidth).cast("long"))
      .withColumn("_b", explode(buckets(rStart, rEnd)))
    lb.join(rb, Seq("_b"))
      .where(col(rStart) <= col(lEnd) && col(lStart) <= col(rEnd))
      .where(col("_b") === greatest(col("_lb0"), col("_rb0")))
      .drop("_b", "_lb0", "_rb0")
  }
}
