package graft.expr

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.graftshim.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Distinct n-gram shingle keys from a token array, in one compiled pass:
  *
  *   - per token: u = md5 hex digits 1–15 as int mod P,
  *                v = md5 hex digits 16–30 as int mod P  (P = 2³¹−1)
  *   - per shingle i: key.u = Σ_j γ_j·u_{i+j} mod P, γ_j = 3266489917·(j+1)
  *     mod P (likewise v) — position-sensitive combination
  *   - output: DISTINCT keys as ARRAY<STRUCT<u BIGINT, v BIGINT>>
  *
  * Exactly the arithmetic of the DuckDB oracle CTEs (see SparkEntry's
  * `dd_jaccard_pairs`/`dd_minhash_pairs`). A single expression because the
  * composed-column formulation is a Catalyst trap: CollapseProject pushes
  * projections through repartitions, so `element_at(tokenKeys, i+j)` inside
  * a shingle lambda re-evaluates the whole md5 token pass per access —
  * O(n·shingles·tokens) digests instead of O(tokens).
  *
  * CodegenFallback is deliberate: eval is one compiled-Scala call per ROW
  * (the per-element work happens in tight loops here, not in interpreted
  * expression dispatch).
  */
case class ShingleKeys(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {

  private val P = 2147483647L

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("u", LongType, nullable = false),
      StructField("v", LongType, nullable = false))),
    containsNull = false)

  private val gammas: Array[Long] =
    Array.tabulate(n)(j => (3266489917L * (j + 1)) % P)

  override def nullSafeEval(input: Any): Any = {
    val toks = input.asInstanceOf[ArrayData]
    val m = toks.numElements()
    if (m < n) return new GenericArrayData(Array.empty[Any])
    val md = MessageDigest.getInstance("MD5")
    val us = new Array[Long](m)
    val vs = new Array[Long](m)
    var i = 0
    while (i < m) {
      val bytes = md.digest(toks.getUTF8String(i).getBytes)
      // u: hex nibbles 0..14; v: hex nibbles 15..29 (1-based substr(1,15)
      // and substr(16,15) of the hex string)
      var u = 0L
      var v = 0L
      var k = 0
      while (k < 15) {
        val nibU = (bytes(k >> 1) >> (if ((k & 1) == 0) 4 else 0)) & 0xf
        u = (u << 4) | nibU
        val k2 = k + 15
        val nibV = (bytes(k2 >> 1) >> (if ((k2 & 1) == 0) 4 else 0)) & 0xf
        v = (v << 4) | nibV
        k += 1
      }
      us(i) = u % P
      vs(i) = v % P
      i += 1
    }
    val seen = new java.util.HashSet[Long]()
    val out = new java.util.ArrayList[InternalRow]()
    i = 0
    while (i <= m - n) {
      var su = 0L
      var sv = 0L
      var j = 0
      while (j < n) {
        su += gammas(j) * us(i + j) % P
        sv += gammas(j) * vs(i + j) % P
        j += 1
      }
      su %= P
      sv %= P
      if (seen.add(su * P + sv)) {
        out.add(new GenericInternalRow(Array[Any](su, sv)))
      }
      i += 1
    }
    new GenericArrayData(out.toArray.asInstanceOf[Array[Any]])
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ShingleKeys {
  def apply(tokens: Column, n: Int): Column =
    Bridge.column(ShingleKeys(Bridge.expression(tokens), n))
}

/** [[ShingleKeys]]' POSITIONAL sibling: every n-gram window key with
  * its 0-based start position, NO dedup — ARRAY<STRUCT<pos BIGINT,
  * u BIGINT, v BIGINT>>, one entry per window in document order.
  * [[ShingleKeys]] feeds the set-semantics operators (Jaccard,
  * containment, MinHash — a shingle either occurs or it doesn't);
  * this feeds the occurrence-semantics ones
  * ([[graft.dedup.Dedup.substringDupSpans]] needs WHERE each window
  * sits to merge cut spans, [[graft.text.TextOps.dsirScore]] counts
  * every bigram occurrence). Same token hashing and positional
  * combination, same DuckDB-portable arithmetic (the oracle CTE drops
  * the DISTINCT and emits the range index).
  */
case class PositionalShingleKeys(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {

  private val P = 2147483647L

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("pos", LongType, nullable = false),
      StructField("u", LongType, nullable = false),
      StructField("v", LongType, nullable = false))),
    containsNull = false)

  private val gammas: Array[Long] =
    Array.tabulate(n)(j => (3266489917L * (j + 1)) % P)

  override def nullSafeEval(input: Any): Any = {
    val toks = input.asInstanceOf[ArrayData]
    val m = toks.numElements()
    if (m < n) return new GenericArrayData(Array.empty[Any])
    val md = MessageDigest.getInstance("MD5")
    val us = new Array[Long](m)
    val vs = new Array[Long](m)
    var i = 0
    while (i < m) {
      val bytes = md.digest(toks.getUTF8String(i).getBytes)
      var u = 0L
      var v = 0L
      var k = 0
      while (k < 15) {
        val nibU = (bytes(k >> 1) >> (if ((k & 1) == 0) 4 else 0)) & 0xf
        u = (u << 4) | nibU
        val k2 = k + 15
        val nibV = (bytes(k2 >> 1) >> (if ((k2 & 1) == 0) 4 else 0)) & 0xf
        v = (v << 4) | nibV
        k += 1
      }
      us(i) = u % P
      vs(i) = v % P
      i += 1
    }
    val out = new Array[Any](m - n + 1)
    i = 0
    while (i <= m - n) {
      var su = 0L
      var sv = 0L
      var j = 0
      while (j < n) {
        su += gammas(j) * us(i + j) % P
        sv += gammas(j) * vs(i + j) % P
        j += 1
      }
      out(i) = new GenericInternalRow(Array[Any](i.toLong, su % P, sv % P))
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object PositionalShingleKeys {
  def apply(tokens: Column, n: Int): Column =
    Bridge.column(PositionalShingleKeys(Bridge.expression(tokens), n))
}
