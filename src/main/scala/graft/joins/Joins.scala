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
    * match are kept with nulls (left as-of).
    *
    * Implementation: equi-join on key + range filter, then per-left-row
    * argmax over (r.ts, tiebreak) via a hash-aggregate min/max-by struct —
    * partial aggregation bounds the shuffle; no window sort. For sorted
    * co-partitioned inputs a merge-scan `mapPartitions` would be cheaper
    * still; this formulation keeps Catalyst in control.
    *
    * @param leftCols  columns of `left` to carry (must include `key`)
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
    val lid = monotonically_increasing_id()
    val l = left.withColumn("_lrow", lid)
    val r = right.select(
      col(key).as("_rkey"),
      col(rightTs).as("_rts"),
      col(rightVal).as("_rval"))
    val joined = l.join(
      r,
      l(key) === col("_rkey") && col("_rts") <= l(leftTs),
      "left")
    val best = max(struct(col("_rts"), col("_rval"))).as("_best")
    val lCols = left.columns.map(c => first(col(c)).as(c))
    joined
      .groupBy(col("_lrow"))
      .agg(lCols.head, (lCols.tail :+ best): _*)
      .select(
        left.columns.map(col) :+
          col("_best._rts").as("asof_ts") :+
          col("_best._rval").as("asof_value"): _*)
  }
}
