package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.Bridge
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native Catalyst expressions for the vector hot path.
  *
  * Spark's higher-order functions (`transform`/`zip_with`/`aggregate`) are
  * CodegenFallback — every element hop goes through the interpreter, which
  * dominates wall-clock on all-pairs similarity and K-way argmin at scale.
  * These expressions generate a tight primitive loop inside whole-stage
  * codegen instead (SURVEY.md §7.3 flagged the fused squared-distance as
  * the one worthwhile custom expression).
  *
  * Null semantics: null if either input array is null; array elements are
  * assumed non-null (enforced upstream by the engine's schemas). Ragged
  * lengths fold over the common prefix, matching `zip_with`+`aggregate`
  * over equal-length inputs and failing soft on bad data.
  */
abstract class ArrayFoldExpression extends BinaryExpression {
  // inputs must be ARRAY<DOUBLE>; the graft Column API guarantees it
  // (ExpectsInputTypes lives behind private[sql], so no declared coercion)
  override def dataType: DataType = DoubleType

  protected def foldJava(a: String, b: String, n: String, acc: String, i: String): String

  protected def foldScala(a: ArrayData, b: ArrayData): Double

  override def nullSafeEval(left: Any, right: Any): Any =
    foldScala(left.asInstanceOf[ArrayData], right.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      // EVERY local, including the loop variable, must go through
      // freshName: Janino hoists for-init declarations into the enclosing
      // block scope, so two instances of this expression in one generated
      // method would collide on a fixed name ("Redefinition of local
      // variable"), kicking the whole projection back to the interpreted
      // path. freshName is deterministic per context (i_0, i_1, …), so the
      // codegen source cache stays effective.
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val i = ctx.freshName("i")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |${foldJava(a, b, n, acc, i)}
         |${ev.value} = $acc;
       """.stripMargin
    })
}

/** Σ a_i · b_i — codegen'd dot product over ARRAY<DOUBLE>. */
case class ArrayDot(left: Expression, right: Expression) extends ArrayFoldExpression {
  override def prettyName: String = "array_dot"

  override protected def foldJava(
      a: String, b: String, n: String, acc: String, i: String): String =
    s"""
       |for (int $i = 0; $i < $n; $i++) {
       |  $acc += $a.getDouble($i) * $b.getDouble($i);
       |}
     """.stripMargin

  override protected def foldScala(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) { acc += a.getDouble(i) * b.getDouble(i); i += 1 }
    acc
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression,
      newRight: Expression): Expression = copy(left = newLeft, right = newRight)
}

/** Σ (a_i − b_i)² — codegen'd squared Euclidean distance over ARRAY<DOUBLE>. */
case class ArraySqDist(left: Expression, right: Expression) extends ArrayFoldExpression {
  override def prettyName: String = "array_sqdist"

  override protected def foldJava(
      a: String, b: String, n: String, acc: String, i: String): String = {
    val diff = s"${i}_diff"
    s"""
       |for (int $i = 0; $i < $n; $i++) {
       |  double $diff = $a.getDouble($i) - $b.getDouble($i);
       |  $acc += $diff * $diff;
       |}
     """.stripMargin
  }

  override protected def foldScala(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      val d = a.getDouble(i) - b.getDouble(i)
      acc += d * d
      i += 1
    }
    acc
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression,
      newRight: Expression): Expression = copy(left = newLeft, right = newRight)
}

/** Product-quantization asymmetric-distance accumulate:
  * Σ_j lut[j·ksub + (codes[j] + 128)] over a query's per-subspace
  * lookup table — the PQ "ADC" inner loop (Jégou et al., TPAMI 2011).
  * `left` is the row's ARRAY<TINYINT> PQ code (m entries, offset −128),
  * `right` the query's flattened ARRAY<DOUBLE> LUT (m·ksub entries,
  * subspace-major). The probe scan runs this once per (query, row)
  * candidate — the hot loop of IVF-PQ search — so it generates a tight
  * primitive loop like the other fold expressions instead of going
  * through the HOF interpreter. Out-of-range LUT indices contribute 0
  * (fail-soft on corrupt codes, matching the ragged-prefix philosophy
  * above).
  */
case class PqAdcDot(left: Expression, right: Expression, ksub: Int)
    extends BinaryExpression {
  require(ksub > 0 && ksub <= 256, s"ksub=$ksub out of (0, 256]")

  override def prettyName: String = "pq_adc_dot"
  override def dataType: DataType = DoubleType

  override def nullSafeEval(codes: Any, lut: Any): Any = {
    val c = codes.asInstanceOf[ArrayData]
    val l = lut.asInstanceOf[ArrayData]
    val m = c.numElements()
    val nLut = l.numElements()
    var acc = 0.0
    var j = 0
    while (j < m) {
      val idx = j * ksub + (c.getByte(j) + 128)
      if (idx >= 0 && idx < nLut) acc += l.getDouble(idx)
      j += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (c, l) => {
      val m = ctx.freshName("m")
      val nLut = ctx.freshName("nLut")
      val acc = ctx.freshName("acc")
      val j = ctx.freshName("j")
      val idx = ctx.freshName("idx")
      s"""
         |int $m = $c.numElements();
         |int $nLut = $l.numElements();
         |double $acc = 0.0;
         |for (int $j = 0; $j < $m; $j++) {
         |  int $idx = $j * $ksub + ($c.getByte($j) + 128);
         |  if ($idx >= 0 && $idx < $nLut) $acc += $l.getDouble($idx);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression,
      newRight: Expression): Expression = copy(left = newLeft, right = newRight)
}

/** Product-quantization encoder: for each of the m subspaces, the argmin
  * sub-centroid id (lowest-id tiebreak) over that subspace's codebook,
  * emitted as one TINYINT (id − 128) — the whole m-subspace encode as ONE
  * expression node with a tight primitive loop.
  *
  * The codebooks ride as plain constructor data (flattened vectors +
  * parallel id array + per-subspace offsets, entries sorted by id so a
  * strict `<` keeps the lowest id on ties), embedded in generated code
  * via `addReferenceObj` — NOT as child expressions: the alternative
  * (per-candidate `least/when` chains) builds m·ksub distance nodes
  * (2048 at m=8, ksub=256) whose analysis/codegen dominates the whole
  * build. Used by the PQ index build, append-time encode, AND the
  * codebook fit's assignment step (one corpus pass assigns all
  * subspaces).
  *
  * Subspace j covers dims [j·dsub, (j+1)·dsub); a subspace with no
  * surviving codebook entry (offsets[j] == offsets[j+1]) emits code
  * −128, and ragged rows fold over the dims present (fail-soft).
  */
case class PqEncode(
    child: Expression,
    flat: Array[Double],
    cids: Array[Int],
    offsets: Array[Int],
    dsub: Int) extends UnaryExpression {
  require(dsub > 0, s"dsub=$dsub")
  require(offsets.length >= 1, "offsets must cover m+1 bounds")

  private def m: Int = offsets.length - 1

  override def prettyName: String = "pq_encode"
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.ByteType, containsNull = false)

  private def encode(v: ArrayData): Array[Byte] = {
    val out = new Array[Byte](m)
    val nDims = v.numElements()
    var j = 0
    while (j < m) {
      var best = -128
      var bestD = Double.MaxValue
      var e = offsets(j)
      while (e < offsets(j + 1)) {
        var d2 = 0.0
        var i = 0
        while (i < dsub) {
          val dim = j * dsub + i
          if (dim < nDims) {
            val diff = v.getDouble(dim) - flat(e * dsub + i)
            d2 += diff * diff
          }
          i += 1
        }
        if (d2 < bestD) { bestD = d2; best = cids(e) - 128 }
        e += 1
      }
      out(j) = best.toByte
      j += 1
    }
    out
  }

  override def nullSafeEval(input: Any): Any =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      encode(input.asInstanceOf[ArrayData]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // the codebook arrays are shared runtime references, not inlined
    // source (16k doubles would blow the 64 KB method limit)
    val flatRef = ctx.addReferenceObj("pqFlat", flat, "double[]")
    val cidsRef = ctx.addReferenceObj("pqCids", cids, "int[]")
    val offsRef = ctx.addReferenceObj("pqOffs", offsets, "int[]")
    nullSafeCodeGen(ctx, ev, v => {
      val out = ctx.freshName("out")
      val nDims = ctx.freshName("nDims")
      val j = ctx.freshName("j")
      val e = ctx.freshName("e")
      val i = ctx.freshName("i")
      val dim = ctx.freshName("dim")
      val d2 = ctx.freshName("d2")
      val diff = ctx.freshName("diff")
      val best = ctx.freshName("best")
      val bestD = ctx.freshName("bestD")
      s"""
         |byte[] $out = new byte[${m}];
         |int $nDims = $v.numElements();
         |for (int $j = 0; $j < ${m}; $j++) {
         |  int $best = -128;
         |  double $bestD = Double.MAX_VALUE;
         |  for (int $e = $offsRef[$j]; $e < $offsRef[$j + 1]; $e++) {
         |    double $d2 = 0.0;
         |    for (int $i = 0; $i < $dsub; $i++) {
         |      int $dim = $j * $dsub + $i;
         |      if ($dim < $nDims) {
         |        double $diff = $v.getDouble($dim) - $flatRef[$e * $dsub + $i];
         |        $d2 += $diff * $diff;
         |      }
         |    }
         |    if ($d2 < $bestD) { $bestD = $d2; $best = $cidsRef[$e] - 128; }
         |  }
         |  $out[$j] = (byte) $best;
         |}
         |${ev.value} =
         |  new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Product-quantization LUT builder: the query-side companion of
  * [[PqAdcDot]]. For a query vector, emits the flattened m·ksub lookup
  * table lut[j·ksub + id] = dot(q_subⱼ, codebookⱼ[id]) in ONE node
  * (missing codebook slots stay 0 and are never referenced by codes).
  * The alternative — a CreateArray of m·ksub dot expressions (2048 at
  * the 8-bit default) — dominates plan analysis and overflows codegen
  * method limits. Runs once per QUERY row, never per candidate.
  * Codebook layout and subspace conventions are [[PqEncode]]'s.
  */
case class PqLut(
    child: Expression,
    flat: Array[Double],
    cids: Array[Int],
    offsets: Array[Int],
    dsub: Int,
    ksub: Int) extends UnaryExpression {
  require(dsub > 0, s"dsub=$dsub")
  require(ksub > 0 && ksub <= 256, s"ksub=$ksub out of (0, 256]")

  private def m: Int = offsets.length - 1

  override def prettyName: String = "pq_lut"
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(DoubleType, containsNull = false)

  private def build(v: ArrayData): Array[Double] = {
    val out = new Array[Double](m * ksub)
    val nDims = v.numElements()
    var j = 0
    while (j < m) {
      var e = offsets(j)
      while (e < offsets(j + 1)) {
        var acc = 0.0
        var i = 0
        while (i < dsub) {
          val dim = j * dsub + i
          if (dim < nDims) acc += v.getDouble(dim) * flat(e * dsub + i)
          i += 1
        }
        out(j * ksub + cids(e)) = acc
        e += 1
      }
      j += 1
    }
    out
  }

  override def nullSafeEval(input: Any): Any =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      build(input.asInstanceOf[ArrayData]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val flatRef = ctx.addReferenceObj("pqLutFlat", flat, "double[]")
    val cidsRef = ctx.addReferenceObj("pqLutCids", cids, "int[]")
    val offsRef = ctx.addReferenceObj("pqLutOffs", offsets, "int[]")
    nullSafeCodeGen(ctx, ev, v => {
      val out = ctx.freshName("out")
      val nDims = ctx.freshName("nDims")
      val j = ctx.freshName("j")
      val e = ctx.freshName("e")
      val i = ctx.freshName("i")
      val dim = ctx.freshName("dim")
      val acc = ctx.freshName("acc")
      s"""
         |double[] $out = new double[${m * ksub}];
         |int $nDims = $v.numElements();
         |for (int $j = 0; $j < ${m}; $j++) {
         |  for (int $e = $offsRef[$j]; $e < $offsRef[$j + 1]; $e++) {
         |    double $acc = 0.0;
         |    for (int $i = 0; $i < $dsub; $i++) {
         |      int $dim = $j * $dsub + $i;
         |      if ($dim < $nDims) $acc += $v.getDouble($dim) * $flatRef[$e * $dsub + $i];
         |    }
         |    $out[$j * $ksub + $cidsRef[$e]] = $acc;
         |  }
         |}
         |${ev.value} =
         |  new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** K-way nearest-centroid argmin as ONE expression node: for an input
  * ARRAY<DOUBLE> row vector, the (cid, dist2) of the centroid minimizing
  * the squared Euclidean distance, lowest-cid tiebreak. `flat` holds the
  * k centroid vectors concatenated in ASCENDING-cid order (k·d doubles),
  * `cids` the parallel cid list (same order), `d` the centroid width.
  *
  * BIT-IDENTICAL to the round-10 three-projection least/when chain it
  * replaces (`OpsN.assignN`): each candidate distance folds
  * left-to-right over min(d, row-dims) exactly like [[ArraySqDist]]
  * (ragged rows fold the common prefix), the running min of doubles is
  * the same value `least` computes in any order, and the strict `<`
  * scan in ascending-cid order IS the when-chain's first-match-wins
  * lowest-cid tiebreak — so every oracle-pinned consumer (Lloyd fits,
  * IVF quantizers, semdedup cells) sees identical assignments.
  *
  * Why an expression and not the chain (round-20, guide §7.3): the chain
  * builds 3 projections with k distance nodes + a k-deep when-chain that
  * Catalyst re-analyzes and whole-stage codegen re-generates PER
  * ITERATION of every quantizer loop — measured ~60–140 ms of driver
  * time per iteration on the IVF keys at k=8, and the centroids CHANGE
  * each iteration so no plan-level caching helps. Here the model rides
  * as runtime references (the [[PqEncode]] discipline): the plan is one
  * node, and the generated source is IDENTICAL across iterations (only
  * the reference objects differ), so janino's compile cache hits.
  */
case class NearestCentroid(
    child: Expression,
    flat: Array[Double],
    cids: Array[Int],
    d: Int) extends UnaryExpression {
  require(d > 0, s"d=$d")
  require(cids.length >= 1, "empty centroid set")
  require(flat.length == cids.length * d,
    s"flat length ${flat.length} != k*d = ${cids.length * d}")

  private def k: Int = cids.length

  override def prettyName: String = "nearest_centroid"
  override def dataType: DataType = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField(
      "cid", org.apache.spark.sql.types.IntegerType, nullable = false),
    org.apache.spark.sql.types.StructField("dist2", DoubleType,
      nullable = false)))

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val nDims = v.numElements()
    var best = 0
    var bestD = Double.MaxValue
    var c = 0
    while (c < k) {
      val n = math.min(nDims, d)
      var acc = 0.0
      var i = 0
      while (i < n) {
        val diff = v.getDouble(i) - flat(c * d + i)
        acc += diff * diff
        i += 1
      }
      if (acc < bestD) { bestD = acc; best = cids(c) }
      c += 1
    }
    org.apache.spark.sql.catalyst.InternalRow(best, bestD)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val flatRef = ctx.addReferenceObj("ncFlat", flat, "double[]")
    val cidsRef = ctx.addReferenceObj("ncCids", cids, "int[]")
    nullSafeCodeGen(ctx, ev, v => {
      val nDims = ctx.freshName("nDims")
      val n = ctx.freshName("n")
      val c = ctx.freshName("c")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val diff = ctx.freshName("diff")
      val best = ctx.freshName("best")
      val bestD = ctx.freshName("bestD")
      s"""
         |int $nDims = $v.numElements();
         |int $n = java.lang.Math.min($nDims, $d);
         |int $best = 0;
         |double $bestD = Double.MAX_VALUE;
         |for (int $c = 0; $c < ${k}; $c++) {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    double $diff = $v.getDouble($i) - $flatRef[$c * $d + $i];
         |    $acc += $diff * $diff;
         |  }
         |  if ($acc < $bestD) { $bestD = $acc; $best = $cidsRef[$c]; }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.expressions
         |  .GenericInternalRow(new Object[] {
         |    java.lang.Integer.valueOf($best),
         |    java.lang.Double.valueOf($bestD) });
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ArrayVector {
  /** A constant vector as ONE Literal plan node. `array(lit, lit, …)`
    * builds d Literal children under a CreateArray that the optimizer
    * must fold (and canonicalize, and codegen) element by element; with
    * K centroids × d dims × a K-deep argmin chain that snowballed to
    * ~10⁵-node trees whose ANALYSIS dominated every Lloyd iteration
    * (round-10 probe: 1.25 s/iteration on 2000 rows — all plan overhead).
    * `typedlit` carries the same ArrayData as a single leaf: identical
    * values, identical evaluation, ~K·d× smaller trees.
    */
  def vecLit(xs: Seq[Double]): Column =
    org.apache.spark.sql.functions.typedlit(xs)

  /** Column API: codegen'd dot product. */
  def dot(a: Column, b: Column): Column =
    Bridge.column(ArrayDot(Bridge.expression(a), Bridge.expression(b)))

  /** Column API: codegen'd squared Euclidean distance. */
  def sqDist(a: Column, b: Column): Column =
    Bridge.column(ArraySqDist(Bridge.expression(a), Bridge.expression(b)))

  /** Column API: codegen'd K-way argmin (see [[NearestCentroid]]).
    * `centroids` is (cid, vector) pairs; sorted ascending-cid here so the
    * strict-< scan reproduces the lowest-cid tiebreak.
    */
  def nearestCentroid(v: Column, centroids: Seq[(Int, Array[Double])]): Column = {
    val sorted = centroids.sortBy(_._1)
    val d = sorted.head._2.length
    Bridge.column(NearestCentroid(
      Bridge.expression(v),
      sorted.flatMap(_._2).toArray,
      sorted.map(_._1).toArray,
      d))
  }

  /** Column API: codegen'd PQ asymmetric-distance accumulate. */
  def pqAdc(codes: Column, lut: Column, ksub: Int): Column =
    Bridge.column(
      PqAdcDot(Bridge.expression(codes), Bridge.expression(lut), ksub))

  /** Column API: codegen'd PQ encode against flattened codebooks (see
    * [[PqEncode]]). `books(j)` lists subspace j's surviving (id, vector)
    * entries sorted by id.
    */
  def pqEncode(
      v: Column, books: IndexedSeq[Seq[(Int, Array[Double])]],
      dsub: Int): Column = {
    val (flat, cids, offsets) = flattenBooks(books)
    Bridge.column(PqEncode(Bridge.expression(v), flat, cids, offsets, dsub))
  }

  /** Column API: codegen'd PQ query-LUT build (see [[PqLut]]). */
  def pqLut(
      v: Column, books: IndexedSeq[Seq[(Int, Array[Double])]],
      dsub: Int, ksub: Int): Column = {
    val (flat, cids, offsets) = flattenBooks(books)
    Bridge.column(PqLut(Bridge.expression(v), flat, cids, offsets, dsub, ksub))
  }

  private def flattenBooks(
      books: IndexedSeq[Seq[(Int, Array[Double])]])
      : (Array[Double], Array[Int], Array[Int]) = {
    val offsets = books.scanLeft(0)(_ + _.size).toArray
    val entries = books.flatten
    (entries.flatMap(_._2).toArray, entries.map(_._1).toArray, offsets)
  }
}
