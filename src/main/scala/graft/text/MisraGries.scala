package graft.text

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Misra–Gries frequent-items summary over a token stream — the
  * mergeable-sketch form of "what are the heavy tokens of a 100 TB
  * corpus". The exact head (`groupBy(token).count` + top-k) ships one
  * row per DISTINCT token per map partition, and distinct tokens grow
  * with the corpus (Heaps' law) — at web scale the exchange itself is
  * corpus-sized, the same trap [[TextOps.distinctVocabApprox]] names
  * for vocabulary counting. This buffer is AT MOST `m` counters: each
  * map partition folds its tokens locally and the exchange moves
  * O(m × partitions) rows regardless of vocabulary size.
  *
  * Guarantees (the classic ones — Misra & Gries 1982; merge bound per
  * Agarwal et al., "Mergeable Summaries", PODS'12): with N total
  * tokens,
  *   - UNDERCOUNT ONLY, bounded: every surviving counter holds
  *     `true_count - N/(m+1) <= est <= true_count`;
  *   - COVERAGE: every token with `true_count > N/(m+1)` survives.
  * Both hold under ARBITRARY partitioning and merge order, which is
  * what makes the verdict columns of
  * [[TextOps.heavyHittersChecked]] deterministic — and is why the
  * merge step subtracts the (m+1)-th largest count rather than
  * truncating (truncation would break the bound).
  *
  * The decrement step is O(m) per eviction event, but each event
  * consumes m+1 units of count mass, so total update work is O(N)
  * amortized — the property that keeps this viable as a per-row
  * aggregate path.
  */
class MisraGries(m: Int) extends Aggregator[String, Map[String, Long], Map[String, Long]]
    with Serializable {
  require(m >= 1, "summary size m must be >= 1")

  override def zero: Map[String, Long] = Map.empty

  override def reduce(b: Map[String, Long], tok: String): Map[String, Long] =
    b.get(tok) match {
      case Some(c) => b.updated(tok, c + 1L)
      case None if b.size < m => b.updated(tok, 1L)
      case None =>
        // full buffer, new token: decrement every counter (the incoming
        // token's virtual counter hits 0 and is never inserted)
        b.collect { case (t, c) if c > 1L => (t, c - 1L) }
    }

  override def merge(
      x: Map[String, Long], y: Map[String, Long]): Map[String, Long] = {
    if (x.isEmpty) y
    else if (y.isEmpty) x
    else {
      val combined = y.foldLeft(x) { case (acc, (t, c)) =>
        acc.updated(t, acc.getOrElse(t, 0L) + c)
      }
      if (combined.size <= m) combined
      else {
        // subtract the (m+1)-th largest count from every counter and
        // drop the non-positive: at most m counters can exceed it, and
        // the subtraction preserves the N/(m+1) undercount bound where
        // a plain top-m truncation would not
        val cut = combined.valuesIterator.toIndexedSeq.sorted(
          Ordering[Long].reverse)(m)
        combined.collect { case (t, c) if c > cut => (t, c - cut) }
      }
    }
  }

  override def finish(r: Map[String, Long]): Map[String, Long] = r

  override def bufferEncoder: Encoder[Map[String, Long]] =
    ExpressionEncoder[Map[String, Long]]()

  override def outputEncoder: Encoder[Map[String, Long]] =
    ExpressionEncoder[Map[String, Long]]()
}
