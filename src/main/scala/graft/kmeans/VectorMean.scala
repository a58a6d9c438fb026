package graft.kmeans

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed vector-mean aggregator: the n-D generalization of the reference's
  * reduce kernel (`reducer.py:124-132` computes the per-dimension arithmetic
  * mean of a cluster's points; `num_dimensions = len(data_points[0])`).
  *
  * One-pass partial+final aggregation: the buffer is a running
  * (sum-vector, count), so the shuffle carries one `(Array[Double], Long)`
  * per (cluster × map task) — O(K·d·partitions) bytes regardless of input
  * row count, the property that makes the update step viable at 100 TB.
  *
  * Dimension mismatches (ragged input) fail fast rather than silently
  * truncating.
  */
object VectorMean
    extends Aggregator[Array[Double], (Array[Double], Long), Array[Double]] {

  override def zero: (Array[Double], Long) = (Array.emptyDoubleArray, 0L)

  override def reduce(
      b: (Array[Double], Long),
      a: Array[Double]): (Array[Double], Long) = {
    if (b._2 == 0L) (a.clone(), 1L)
    else {
      val s = b._1
      require(
        s.length == a.length,
        s"VectorMean: ragged input (${s.length} vs ${a.length} dims)")
      var i = 0
      while (i < s.length) { s(i) += a(i); i += 1 }
      (s, b._2 + 1L)
    }
  }

  override def merge(
      x: (Array[Double], Long),
      y: (Array[Double], Long)): (Array[Double], Long) = {
    if (x._2 == 0L) y
    else if (y._2 == 0L) x
    else {
      val s = x._1
      require(
        s.length == y._1.length,
        s"VectorMean: ragged merge (${s.length} vs ${y._1.length} dims)")
      var i = 0
      while (i < s.length) { s(i) += y._1(i); i += 1 }
      (s, x._2 + y._2)
    }
  }

  override def finish(r: (Array[Double], Long)): Array[Double] = {
    if (r._2 == 0L) Array.emptyDoubleArray
    else {
      val out = r._1.clone()
      var i = 0
      while (i < out.length) { out(i) /= r._2; i += 1 }
      out
    }
  }

  override def bufferEncoder: Encoder[(Array[Double], Long)] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[(Array[Double], Long)]()

  override def outputEncoder: Encoder[Array[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Double]]()
}
