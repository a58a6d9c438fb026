package graft.expr

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** 64-bit SimHash (Charikar, STOC'02) of a token array in ONE compiled
  * pass: md5 each token, treat the first 16 hex digits as 64 bits, and
  * accumulate the per-bit ±1 votes; bit j of the fingerprint is 1 iff its
  * vote sum is positive.
  *
  * Bit layout matches the composed-column formulation this replaces (and
  * the DuckDB oracle): quad q = hex digits [4q, 4q+4) as a 16-bit int;
  * bit j of a token = bit (15 − j%16) of quad j/16.
  *
  * TF weighting is the CALLER's choice: pass `array_distinct(tokens)` for
  * the unweighted variant (each distinct token votes once) or the raw
  * token array for the tf-weighted one (one vote per occurrence).
  *
  * `asBits = true` emits the 64-char '0'/'1' string (portable,
  * oracle-checkable); `asBits = false` emits the 4 packed 16-bit int
  * blocks (the pigeonhole join / hamming representation). Emitting the
  * final representation directly keeps the expression single-use per row —
  * deriving one from the other in a later projection would let
  * CollapseProject inline the whole token scan once per use.
  *
  * CodegenFallback with a tight eval: one virtual call per ROW (the
  * documented fast pattern, cf. [[Winnow]]) versus the 64 interpreted
  * `aggregate()` higher-order functions it replaces, which dispatched an
  * interpreted lambda per token × 64.
  */
case class SimHashPack(child: Expression, asBits: Boolean)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType =
    if (asBits) StringType else ArrayType(IntegerType, containsNull = false)

  override def nullSafeEval(input: Any): Any = {
    val toks = input.asInstanceOf[ArrayData]
    val n = toks.numElements()
    val weights = new Array[Int](64)
    val md = MessageDigest.getInstance("MD5")
    var i = 0
    while (i < n) {
      val bytes = md.digest(toks.getUTF8String(i).getBytes)
      var b = 0
      while (b < 4) {
        val quad = ((bytes(2 * b) & 0xff) << 8) | (bytes(2 * b + 1) & 0xff)
        var r = 0
        while (r < 16) {
          weights(16 * b + r) += ((quad >> (15 - r)) & 1) * 2 - 1
          r += 1
        }
        b += 1
      }
      i += 1
    }
    if (asBits) {
      val sb = new java.lang.StringBuilder(64)
      var j = 0
      while (j < 64) {
        sb.append(if (weights(j) > 0) '1' else '0')
        j += 1
      }
      UTF8String.fromString(sb.toString)
    } else {
      val blocks = new Array[Int](4)
      var b = 0
      while (b < 4) {
        var block = 0
        var r = 0
        while (r < 16) {
          if (weights(16 * b + r) > 0) block |= 1 << (15 - r)
          r += 1
        }
        blocks(b) = block
        b += 1
      }
      new GenericArrayData(blocks)
    }
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SimHashPack {
  /** 64-char '0'/'1' fingerprint string. */
  def bits(tokens: Column): Column =
    Bridge.column(SimHashPack(Bridge.expression(tokens), asBits = true))

  /** 4 packed 16-bit int blocks (join/hamming representation). */
  def blocks(tokens: Column): Column =
    Bridge.column(SimHashPack(Bridge.expression(tokens), asBits = false))
}
