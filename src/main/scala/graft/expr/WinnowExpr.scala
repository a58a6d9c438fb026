package graft.expr

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftshim.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Winnowing document fingerprint (Schleimer, Wilkerson, Aiken, SIGMOD'03):
  * hash every character k-gram (md5 hex digits 1–15 as int — the same
  * portable hash as [[graft.text.TextOps.rollingFingerprint]]), slide a
  * window of `w` consecutive hashes, keep each window's minimum, and emit
  * the DISTINCT selected hashes sorted ascending.
  *
  * Guarantees: any shared substring of length ≥ w+k−1 contributes at least
  * one common fingerprint — the local-min selection makes the sketch
  * position-robust, unlike a global min.
  *
  * One compiled pass (CodegenFallback with a tight eval — no per-element
  * interpreted dispatch, no CollapseProject inlining hazards). Texts
  * shorter than k hash as a single gram.
  */
case class Winnow(child: Expression, k: Int, w: Int)
    extends UnaryExpression with CodegenFallback {
  require(k >= 1 && w >= 1, "k and w must be >= 1")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  private def gramHash(md: MessageDigest, s: String): Long = {
    val bytes = md.digest(s.getBytes("UTF-8"))
    var u = 0L
    var i = 0
    while (i < 15) {
      val nib = (bytes(i >> 1) >> (if ((i & 1) == 0) 4 else 0)) & 0xf
      u = (u << 4) | nib
      i += 1
    }
    u
  }

  override def nullSafeEval(input: Any): Any = {
    val text = input.asInstanceOf[UTF8String].toString
    val md = MessageDigest.getInstance("MD5")
    val nGrams = math.max(text.length - k + 1, 1)
    val hashes = new Array[Long](nGrams)
    var i = 0
    while (i < nGrams) {
      hashes(i) = gramHash(md, text.substring(i, math.min(i + k, text.length)))
      i += 1
    }
    val selected = new java.util.TreeSet[java.lang.Long]()
    val nWins = math.max(nGrams - w + 1, 1)
    i = 0
    while (i < nWins) {
      var m = Long.MaxValue
      var j = i
      val end = math.min(i + w, nGrams)
      while (j < end) { if (hashes(j) < m) m = hashes(j); j += 1 }
      selected.add(m)
      i += 1
    }
    val out = new Array[Any](selected.size())
    val it = selected.iterator()
    var idx = 0
    while (it.hasNext) { out(idx) = it.next().longValue(); idx += 1 }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Winnow {
  def apply(text: Column, k: Int, w: Int): Column =
    Bridge.column(Winnow(Bridge.expression(text), k, w))
}

/** Rolling-hash document fingerprint: the MINIMUM gram hash over all
  * character n-grams — a 1-hash MinHash over character shingles
  * (winnowing's global-min special case; same gram hash as [[Winnow]]:
  * md5 hex digits 1–15 as a long, so the DuckDB
  * `list_min(list_transform(...))` oracle is bit-exact). One compiled
  * pass; texts shorter than n hash as a single gram. Replaces a
  * 3-deep interpreted higher-order-function stack whose normalize
  * regex was CollapseProject-inlined into every gram.
  */
case class RollingMinHash(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {
  require(n >= 1, "ngram size must be >= 1")

  override def dataType: DataType = LongType

  private def gramHash(md: MessageDigest, s: String): Long = {
    val bytes = md.digest(s.getBytes("UTF-8"))
    var u = 0L
    var i = 0
    while (i < 15) {
      val nib = (bytes(i >> 1) >> (if ((i & 1) == 0) 4 else 0)) & 0xf
      u = (u << 4) | nib
      i += 1
    }
    u
  }

  override def nullSafeEval(input: Any): Any = {
    val text = input.asInstanceOf[UTF8String].toString
    val md = MessageDigest.getInstance("MD5")
    val nGrams = math.max(text.length - n + 1, 1)
    var min = Long.MaxValue
    var i = 0
    while (i < nGrams) {
      val h = gramHash(md, text.substring(i, math.min(i + n, text.length)))
      if (h < min) min = h
      i += 1
    }
    min
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object RollingMinHash {
  def apply(text: Column, n: Int): Column =
    Bridge.column(RollingMinHash(Bridge.expression(text), n))
}
