package graft.kmeans

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** n-D generalizations of the reference's map/reduce kernels over
  * `ARRAY<DOUBLE>` feature columns (the reference's mapper parses arbitrary
  * arity, `mapper.py:110`; the reducer's mean is n-D, `reducer.py:124-132`;
  * only the wire protocol clamps it to 2-D, `comm.proto:50-53`).
  *
  * Scale notes: assignment stays a shuffle-free per-row projection (the
  * K·d centroid model rides as runtime references of one codegen'd
  * argmin node — [[graft.expr.NearestCentroid]]); the update is a single
  * partial+final aggregation via [[VectorMean]], so the exchange carries
  * O(K·d·partitions) bytes. For K·d too large for one per-row loop
  * (≫10^4), use [[assignCrossJoinN]], which broadcasts the centroid
  * table instead.
  */
object OpsN {

  /** Canonical n-D points view over the embeddings testdata: (pid, features). */
  def pointsFromEmbeddings(embeddings: DataFrame): DataFrame =
    embeddings.select(
      col("vec_id").as("pid"),
      col("embedding").cast("array<double>").as("features"))

  /** Squared Euclidean distance between two ARRAY<DOUBLE> columns — the
    * codegen'd [[graft.expr.ArraySqDist]] expression (same left-to-right
    * multiply/add fold as `aggregate(zip_with(...))`, so bit-identical to
    * DuckDB's `list_sum(list_transform(...))`, but inside whole-stage
    * codegen instead of the interpreted higher-order-function path).
    */
  def dist2N(a: Column, b: Column): Column =
    graft.expr.ArrayVector.sqDist(a, b)

  /** L1 n-D: first K rows in pid order become centroids 0..K-1.
    * (Rank after limit(k) touches only K rows; the non-foldable
    * constant-zero partition key avoids WindowExec's unpartitioned-window
    * path — see [[Ops.initFirstK]].)
    */
  def initFirstKN(points: DataFrame, k: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(pmod(col("pid"), lit(1))).orderBy(col("pid"))
    points
      .orderBy(col("pid"))
      .limit(k)
      .withColumn("cid", (row_number().over(w) - 1).cast("int"))
      .select(col("cid"), col("features"))
  }

  /** Collect a K-row centroid DataFrame to the driver model state. */
  def collectCentroidsN(centroids: DataFrame): Seq[CentroidN] =
    centroids
      .select(col("cid").cast("int"), col("features").cast("array<double>"))
      .collect()
      .map(r => CentroidN(r.getInt(0), r.getSeq[Double](1).toArray))
      .sortBy(_.cid)
      .toSeq

  /** The centroid model as a literal ARRAY<STRUCT<cid, features>> column. */
  def centroidLiteralN(centroids: Seq[CentroidN]): Column =
    array(centroids.sortBy(_.cid).map { c =>
      struct(
        lit(c.cid).as("cid"),
        array(c.features.toIndexedSeq.map(lit(_)): _*).as("features"))
    }: _*)

  /** J1+A3 n-D: nearest-centroid assignment, lowest-cid tiebreak.
    * Output: (pid, features, cid, dist2).
    */
  def assignN(points: DataFrame, centroids: Seq[CentroidN]): DataFrame = {
    require(centroids.nonEmpty, "assignN: empty centroid set")
    val d = centroids.head.features.length
    require(
      centroids.forall(_.features.length == d),
      "assignN: ragged centroid dimensions")
    // ONE codegen'd argmin node with the model as runtime references
    // ([[graft.expr.NearestCentroid]]) — bit-identical values to the
    // round-10 three-projection least/when chain (same left-to-right
    // distance fold, same min, same lowest-cid tiebreak; asserted in
    // NDimSpec/KMeansProperties), but the plan no longer carries k
    // distance nodes + a k-deep when-chain that Catalyst re-analyzes and
    // codegen re-generates per quantizer ITERATION (round-20, guide
    // §7.3: ~60–140 ms driver per iteration at k=8 across the IVF/Lloyd
    // family; the generated source is iteration-invariant, so janino's
    // compile cache hits where the chain's changing literals forced a
    // fresh source walk each time).
    // TWO projections (argmin struct → field extraction), the second
    // referencing the first's ATTRIBUTE: CollapseProject keeps a
    // non-cheap alias referenced twice apart, so the argmin evaluates
    // once per row, and whole-stage codegen still fuses the pair.
    val nc = graft.expr.ArrayVector.nearestCentroid(
      col("features"),
      centroids.map(c => (c.cid, c.features)))
    points
      .select(col("pid"), col("features"), nc.as("__gnc"))
      .select(
        col("pid"),
        col("features"),
        col("__gnc.cid").as("cid"),
        col("__gnc.dist2").as("dist2"))
  }

  /** [[assignN]] while the centroid set fits the per-row argmin loop
    * (k ≤ `literalBound`), [[assignCrossJoinN]] past it: the single-node
    * loop is unbeatable at small k (zero shuffle, O(k·d) per row), but a
    * corpus-sized quantizer (k ~ n/occupancy) needs the broadcast join's
    * per-partition hash relation rather than an every-row full scan of
    * the model. Same distances, same lowest-cid tiebreak either way;
    * downstream aggregation order (and so last-ulp mean noise) can
    * differ, which is why every ORACLE-checked path runs at
    * k ≤ literalBound.
    */
  def assignNAdaptive(
      points: DataFrame,
      centroids: Seq[CentroidN],
      literalBound: Int = 64): DataFrame =
    if (centroids.size <= literalBound) assignN(points, centroids)
    else {
      val spark = points.sparkSession
      import spark.implicits._
      assignCrossJoinN(points,
        centroids.map(c => (c.cid, c.features.toSeq)).toDF("cid", "features"))
    }

  /** Broadcast-join formulation for centroid sets too large to inline as a
    * plan literal. Per-row argmin via `min_by`-style struct min under a
    * groupBy on a generated row id.
    */
  def assignCrossJoinN(points: DataFrame, centroids: DataFrame): DataFrame = {
    val c = broadcast(
      centroids.select(col("cid").cast("int").as("cid"), col("features").as("cf")))
    points
      .withColumn("rid", monotonically_increasing_id())
      .crossJoin(c)
      .withColumn("dist2", dist2N(col("features"), col("cf")))
      .groupBy(col("rid"))
      .agg(
        first(col("pid")).as("pid"),
        first(col("features")).as("features"),
        min(struct(col("dist2"), col("cid"))).as("best"))
      .select(
        col("pid"),
        col("features"),
        col("best.cid").as("cid"),
        col("best.dist2").as("dist2"))
  }

  /** A2 n-D: per-cluster mean vector via the one-pass [[VectorMean]]
    * aggregator. Output: (cid, features, n).
    */
  def updateN(assigned: DataFrame): DataFrame = {
    val meanVec = udaf(VectorMean)
    assigned
      .groupBy(col("cid"))
      .agg(
        meanVec(col("features")).as("features"),
        count(lit(1)).as("n"))
  }

  /** A2 n-D alternative: posexplode + per-dimension avg + re-assemble.
    * Same result as [[updateN]]; kept because it is the ANSI-SQL-expressible
    * formulation (the oracle's shape) and scales via plain hash aggregates.
    * Output: (cid, dim, mean) — exploded, one row per dimension.
    */
  def updateNExploded(assigned: DataFrame): DataFrame =
    assigned
      .select(col("cid"), posexplode(col("features")).as(Seq("dim", "v")))
      .groupBy(col("cid"), col("dim"))
      .agg(avg(col("v")).as("mean"))

  /** C4 n-D: id-joined max movement. */
  def maxMovementN(oldC: Seq[CentroidN], newC: Seq[CentroidN]): Double = {
    val oldById = oldC.map(c => c.cid -> c).toMap
    newC.iterator.flatMap { n =>
      oldById.get(n.cid).map(o => math.sqrt(o.dist2To(n.features)))
    }.foldLeft(0.0)(math.max)
  }

  def convergedN(oldC: Seq[CentroidN], newC: Seq[CentroidN], tol: Double): Boolean =
    oldC.map(_.cid).toSet == newC.map(_.cid).toSet &&
      maxMovementN(oldC, newC) <= tol

  /** Scalable k-means|| initialization (Bahmani et al., VLDB'12) — the
    * init the reference lacks: first-K init seeds adjacent points
    * (terrible spread); k-means++ is inherently sequential (one point
    * per pass). k-means|| oversamples ~l candidates per round for
    * `rounds` rounds, each round sampling ∝ d²(x, C) against the
    * CURRENT candidate set, then keeps the k heaviest candidates by
    * nearest-point count.
    *
    * DETERMINISTIC by construction (no rand(), no Σd² scalar): per-round
    * weighted sampling-without-replacement uses the Efraimidis–Spirakis
    * exponential clock — key = −ln(u)/d², u the id-pure
    * [[graft.text.TextOps.hashUniform]] draw (salt per round) — so the
    * l smallest keys ARE a ∝d² sample, with NO global d² sum whose
    * floating partial-aggregation order could flip membership (the
    * tx_dsir_sample Gumbel-top-k discipline; keys floor-truncated at
    * 1e-6 before ranking, pid tiebreak). Points at d² = 0 (the current
    * candidates and their exact duplicates) are excluded from the draw.
    *
    * The finisher is the paper's recluster-the-candidates step in its
    * DERANDOMIZED greedy form (weighted greedy k-means++ / maxmin):
    * seed with the heaviest candidate, then repeatedly add the
    * candidate maximizing wt·min-d² to the chosen set (pid tiebreak) —
    * NOT a plain weight-top-k, which provably collapses into the
    * densest cluster (a 40-vs-10 two-cluster fixture picks two seeds
    * from the dense side; spec-locked against exactly that).
    *
    * Scale shape: each round is one map-only [[assignN]] distance pass
    * (candidates ride as plan literals) + a TakeOrdered(l) — never a
    * global sort; the final weighting is one more assign pass + an
    * O(candidates) count, and the greedy finish runs driver-side over
    * the ≤ 1+rounds·l candidates, exactly like Lloyd's model state.
    *
    * Output: (cid, pid) — cid 0-based in selection order, the chosen k
    * seed points.
    */
  def initKMeansParallel(
      points: DataFrame, k: Int, rounds: Int, l: Int): DataFrame = {
    require(k >= 1 && rounds >= 1 && l >= 1,
      s"need k, rounds, l >= 1, got k=$k rounds=$rounds l=$l")
    require(k <= 1 + rounds * l,
      s"k=$k exceeds the candidate pool 1 + rounds*l = ${1 + rounds * l}")
    val spark = points.sparkSession
    import spark.implicits._
    val first = points.orderBy(col("pid")).limit(1)
      .select(col("pid"), col("features"))
      .as[(Long, Seq[Double])].collect()
    require(first.nonEmpty, "initKMeansParallel: empty input")
    var cands: Vector[(Long, Array[Double])] =
      Vector(first.head._1 -> first.head._2.toArray)
    for (r <- 1 to rounds) {
      // cid = index in pid-ascending order, so assignN's lowest-cid
      // distance tiebreak is the oracle's lowest-candidate-pid tiebreak
      val cs = cands.sortBy(_._1).zipWithIndex
        .map { case ((_, v), i) => CentroidN(i, v) }
      val key = floor(
        (-log(graft.text.TextOps.hashUniform(col("pid"), s"kmpar$r")) /
          col("dist2")) * 1e6) / 1e6
      val kept = assignN(points, cs)
        .filter(col("dist2") > 0.0)
        .select(col("pid"), col("features"), key.as("key"))
        .orderBy(col("key"), col("pid")).limit(l)
        .select(col("pid"), col("features"))
        .as[(Long, Seq[Double])].collect()
      cands ++= kept.map { case (p, v) => p -> v.toArray }
    }
    val ordered = cands.sortBy(_._1)
    val cs = ordered.zipWithIndex.map { case ((_, v), i) => CentroidN(i, v) }
    val weights = assignN(points, cs)
      .groupBy(col("cid")).agg(count(lit(1)).as("wt"))
      .as[(Int, Long)].collect().toMap
    val pool = ordered.zipWithIndex.map { case ((pid, v), i) =>
      (pid, v, weights.getOrElse(i, 0L).toDouble)
    }
    def d2(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { val d = a(i) - b(i); s += d * d; i += 1 }
      s
    }
    // greedy weighted k-means++: heaviest first (pid tiebreak), then
    // argmax wt * min-d² to the chosen set (pid tiebreak — exact-zero
    // ties are real when candidates duplicate vectors)
    val first0 = pool.minBy { case (pid, _, wt) => (-wt, pid) }
    var chosen = Vector(first0)
    var rest = pool.filterNot(_._1 == first0._1)
    while (chosen.size < k && rest.nonEmpty) {
      val next = rest.minBy { case (pid, v, wt) =>
        (-(wt * chosen.map(c => d2(v, c._2)).min), pid)
      }
      chosen :+= next
      rest = rest.filterNot(_._1 == next._1)
    }
    chosen.zipWithIndex.map { case ((pid, _, _), cid) => (cid.toLong, pid) }
      .toDF("cid", "pid")
  }

  /** Prototype-distance outlier pruning (Sorscher et al. NeurIPS'22
    * prototypicality; D4, Tirumala et al. NeurIPS'23): assign each
    * embedding to its nearest prototype and emit the points whose
    * squared distance exceeds their OWN cluster's `pct` quantile — the
    * off-manifold tail an embedding-curation pipeline drops before
    * training (a global cut would mistake every small/tight cluster's
    * whole population for inliers and a diffuse cluster's core for
    * outliers; the per-cluster cut normalizes by local density).
    *
    * Scale shape: the assignment is the map-only [[assignN]] literal
    * chain (no shuffle); the per-cluster cut is ONE partial+final
    * aggregation producing k rows that broadcast back onto the
    * assigned stream; the outlier filter is map-side. One k-row
    * shuffle total, never a corpus sort. The exact per-group buffer
    * (`sort_array(collect_list(...))` — the same memory class the
    * previous `percentile` aggregate already carried) is kept so the
    * cut is oracle-derivable; at real corpus sizes swap
    * `percentile_approx` (the a5_percentiles_sketch contrast).
    *
    * The cut is the NEAREST-RANK percentile — the ⌈pct·n⌉-th smallest
    * d2 within the cluster, an exact DATUM of the data rather than an
    * interpolation (the tx_ppl_buckets rank-arithmetic discipline,
    * closing the r14-advice residual: two engines' `percentile` /
    * `quantile_cont` interpolation arithmetic could disagree in the
    * last ulp exactly on a truncation boundary and flip membership;
    * a rank-picked datum has no arithmetic to disagree on). Membership
    * is strict (d2 > cut), so points tied WITH the cut value are
    * inliers in both engines.
    *
    * Output: (pid, cid, d2, cut) for points with d2 > cut.
    */
  def prototypeOutliers(
      points: DataFrame, centroids: Seq[CentroidN], pct: Double): DataFrame = {
    require(pct > 0.0 && pct < 1.0, s"pct must be in (0,1), got $pct")
    // cached: feeds both the cut aggregation and the outlier join
    val assigned = graft.util.OpCaches.cache(
      assignN(points, centroids).select(col("pid"), col("cid"), col("dist2")))
    val cuts = assigned
      .groupBy(col("cid"))
      .agg(element_at(sort_array(collect_list(col("dist2"))),
        ceil(lit(pct) * count(lit(1))).cast("int")).as("cut"))
    assigned
      .join(broadcast(cuts), Seq("cid"))
      .where(col("dist2") > col("cut"))
      .select(col("pid"), col("cid"), col("dist2").as("d2"), col("cut"))
  }
}
