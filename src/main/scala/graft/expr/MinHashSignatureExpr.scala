package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Codegen'd MinHash signature: given the per-shingle key array
  * (ARRAY<STRUCT<u: BIGINT, v: BIGINT>>), computes all `numHashes` minima
  * in ONE loop over the shingles —
  *
  *   sig[h] = min over shingles of (A_h·u mod P + B_h·v mod P + C_h) mod P,
  *   A_h = 2654435761(h+1) mod P, B_h = 2246822519(h+1) mod P,
  *   C_h = 104729(h+1) mod P,  P = 2³¹−1
  *
  * — the same 2-universal family as [[graft.dedup.Dedup.minHashSignatures]]'s
  * SQL-oracle formulation, but numHashes× fewer array traversals and no
  * interpreted lambda dispatch (the higher-order `transform`/`array_min`
  * path is CodegenFallback).
  */
case class MinHashSignature(child: Expression, numHashes: Int)
    extends UnaryExpression {

  private val P = 2147483647L

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val sig = Array.fill(numHashes)(Long.MaxValue)
    var i = 0
    while (i < n) {
      val s = arr.getStruct(i, 2)
      val u = s.getLong(0)
      val v = s.getLong(1)
      var h = 0
      while (h < numHashes) {
        val a = 2654435761L * (h + 1) % P
        val b = 2246822519L * (h + 1) % P
        val c = 104729L * (h + 1) % P
        val hv = (a * u % P + b * v % P + c) % P
        if (hv < sig(h)) sig(h) = hv
        h += 1
      }
      i += 1
    }
    new GenericArrayData(sig)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val sig = ctx.freshName("sig")
      val i = ctx.freshName("i")
      val h = ctx.freshName("h")
      val s = ctx.freshName("s")
      val u = ctx.freshName("u")
      val v = ctx.freshName("v")
      val hv = ctx.freshName("hv")
      s"""
         |int $n = $a.numElements();
         |long[] $sig = new long[$numHashes];
         |java.util.Arrays.fill($sig, Long.MAX_VALUE);
         |for (int $i = 0; $i < $n; $i++) {
         |  org.apache.spark.sql.catalyst.InternalRow $s = $a.getStruct($i, 2);
         |  long $u = $s.getLong(0);
         |  long $v = $s.getLong(1);
         |  for (int $h = 0; $h < $numHashes; $h++) {
         |    long $hv = ((2654435761L * ($h + 1) % ${P}L) * $u % ${P}L
         |               + (2246822519L * ($h + 1) % ${P}L) * $v % ${P}L
         |               + 104729L * ($h + 1) % ${P}L) % ${P}L;
         |    if ($hv < $sig[$h]) $sig[$h] = $hv;
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($sig);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinHashSignature {
  def apply(keys: Column, numHashes: Int): Column =
    Bridge.column(MinHashSignature(Bridge.expression(keys), numHashes))
}
