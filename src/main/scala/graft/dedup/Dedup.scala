package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.text.TextOps

/** Deduplication operators for training-data pipelines: exact (hash),
  * MinHash+LSH, SimHash, n-gram Jaccard, and embedding-cosine near-dup.
  *
  * Scale design (100 TB):
  *   - Exact dedup is one hash aggregate on a 32-byte fingerprint — the
  *     shuffle carries fingerprints, not documents.
  *   - Jaccard via an inverted shingle index (explode → co-count → filter)
  *     is exact but quadratic in the worst case; `maxShingleDf` drops
  *     ubiquitous shingles before the self-join (the standard stop-shingle
  *     cut) to bound join fan-out.
  *   - MinHash+LSH is the scale path: O(docs × numHashes) signature pass,
  *     then candidates only within equal LSH buckets — no all-pairs work.
  *     Hash h_i(s) = md5(i || '|' || s) compared LEXICOGRAPHICALLY; hex md5
  *     strings order identically in Spark and DuckDB, which keeps every
  *     stage oracle-checkable with zero custom hash code.
  *   - SimHash packs a doc into 64 bits; near-dup candidates must share at
  *     least one of 4 exact 16-bit blocks when hamming ≤ 3 (pigeonhole),
  *     so the join is equality-based, never all-pairs.
  *   - Embedding cosine: exact brute force for small sides; LSH/IVF path in
  *     [[graft.sim.Similarity]].
  *
  * All operators are pure column expressions (no UDFs) so they stay inside
  * whole-stage codegen and remain expressible as DuckDB oracle SQL.
  *
  * Caching: the self-join operators persist their shared inputs
  * (MEMORY_AND_DISK) and cannot unpersist them before the caller consumes
  * the lazily-evaluated result — long-lived sessions running many dedup
  * pipelines should `spark.catalog.clearCache()` between them or rely on
  * LRU eviction.
  */
object Dedup {

  // ---------------------------------------------------------------------
  // Exact dedup
  // ---------------------------------------------------------------------

  /** Exact duplicate groups: fingerprint → count + representative (min id).
    * Output: (fp, n, keep_id).
    */
  def exactGroups(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), TextOps.fingerprint(col("text")).as("fp"))
      .groupBy(col("fp"))
      .agg(count(lit(1)).as("n"), min(col("doc_id")).as("keep_id"))

  /** Exact dedup: keep one representative (lowest doc_id) per fingerprint. */
  def exactDedup(docs: DataFrame): DataFrame = {
    val keep = exactGroups(docs).select(col("keep_id").as("doc_id"))
    docs.join(keep, Seq("doc_id"), "left_semi")
  }

  // ---------------------------------------------------------------------
  // Shingles + exact n-gram Jaccard
  // ---------------------------------------------------------------------

  /** Distinct token n-gram shingles per doc: (doc_id, shingle). */
  def docShingles(docs: DataFrame, n: Int): DataFrame =
    docs
      .select(
        col("doc_id"),
        explode(TextOps.shingles(TextOps.tokens(col("text")), n)).as("shingle"))
      .distinct()

  /** Exact n-gram Jaccard near-dup pairs via inverted shingle index over
    * HASHED shingle identities (`shash` = u·P + v from [[docShingleKeys]] —
    * a 62-bit key; collisions are negligible and, since both engines use
    * the same formula, consistent). Joining on longs instead of shingle
    * strings keeps the index compact and the exchange cheap.
    *
    * @param maxShingleDf if set, shingles appearing in more than this many
    *   docs are dropped before the self-join (bounds fan-out at scale;
    *   similarity becomes a lower bound).
    * Output: (d1, d2, jac) with d1 < d2 and jac >= threshold.
    */
  def jaccardPairs(
      docs: DataFrame,
      n: Int,
      threshold: Double,
      maxShingleDf: Option[Long] = None): DataFrame = {
    val sh0 = docShingleKeys(docs, n)
      .select(
        col("doc_id"),
        explode(col("keys")).as("k"))
      .select(
        col("doc_id"),
        (col("k.u") * MinHashP + col("k.v")).as("shash"))
    val shUnfiltered = maxShingleDf match {
      case Some(limit) =>
        val rare = sh0.groupBy(col("shash")).agg(count(lit(1)).as("df"))
          .filter(col("df") <= limit).select("shash")
        sh0.join(rare, Seq("shash"), "left_semi")
      case None => sh0
    }
    // cache: consumed three times (sizes + both sides of the self-join)
    val sh = shUnfiltered.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("sz"))
    val co = sh.as("a")
      .join(sh.as("b"), col("a.shash") === col("b.shash"))
      .filter(col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
      .agg(count(lit(1)).as("c"))
    co
      .join(sizes.select(col("doc_id").as("d1"), col("sz").as("sz1")), "d1")
      .join(sizes.select(col("doc_id").as("d2"), col("sz").as("sz2")), "d2")
      .withColumn("jac", col("c") / (col("sz1") + col("sz2") - col("c")))
      .filter(col("jac") >= threshold)
      .select(col("d1"), col("d2"), col("jac"))
  }

  // ---------------------------------------------------------------------
  // MinHash + LSH
  // ---------------------------------------------------------------------

  /** MinHash hash family: h_i(s) = (a_i·u + b_i·v + c_i) mod P over the
    * Mersenne prime P = 2³¹−1, where (u, v) are two independent md5-prefix
    * keys of the shingle (hex digits 1–15 and 16–30, each reduced mod P) —
    * a 2-universal family over a 120-bit key. ONE md5 per shingle, then
    * integer arithmetic per hash function (~12× cheaper than hashing per
    * (i, s)); each product is reduced mod P before summing so nothing
    * exceeds 2⁶² in any engine; expressible verbatim in DuckDB.
    */
  val MinHashP: Long = 2147483647L
  def minHashA(i: Int): Long = (2654435761L * (i + 1)) % MinHashP
  def minHashB(i: Int): Long = (2246822519L * (i + 1)) % MinHashP
  def minHashC(i: Int): Long = (104729L * (i + 1)) % MinHashP

  /** Per-token (u, v) keys: two md5-prefix ints reduced mod P — ONE md5
    * per token occurrence, from which every shingle key derives
    * arithmetically (no shingle strings are ever built).
    */
  def tokenKeys(toks: Column): Column =
    transform(toks, t => {
      val h = md5(t)
      struct(
        (conv(h.substr(1, 15), 16, 10).cast("long") % MinHashP).as("u"),
        (conv(h.substr(16, 15), 16, 10).cast("long") % MinHashP).as("v"))
    })

  /** n-gram shingle keys by positional combination of token keys:
    * key.u = Σ_j γ_j·u_{i+j} mod P with γ_j = 3266489917·(j+1) mod P
    * (likewise for v). Position-sensitive, overflow-free, identical
    * arithmetic in DuckDB.
    */
  def shingleKeyArr(tkeys: Column, n: Int): Column = {
    require(n >= 1, "shingle size must be >= 1")
    def combine(f: String, i: Column): Column =
      (0 until n).map { j =>
        lit((3266489917L * (j + 1)) % MinHashP) *
          element_at(tkeys, (i + lit(j + 1)).cast("int")).getField(f) % MinHashP
      }.reduce(_ + _) % MinHashP
    when(
      size(tkeys) >= n,
      transform(
        sequence(lit(0), size(tkeys) - n),
        i => struct(combine("u", i).as("u"), combine("v", i).as("v"))))
      .otherwise(array().cast("array<struct<u:bigint,v:bigint>>"))
  }

  /** Distinct shingle keys per doc: (doc_id, keys ARRAY<STRUCT<u,v>>),
    * via the single compiled [[graft.expr.ShingleKeys]] expression — one
    * md5 per token occurrence, arithmetic combination, dedup, all in one
    * pass. (The composed-column formulation [[tokenKeys]]+[[shingleKeyArr]]
    * is kept for documentation/tests but is a Catalyst inlining trap —
    * see the expression's scaladoc.)
    */
  def docShingleKeys(docs: DataFrame, n: Int): DataFrame =
    docs.select(
      col("doc_id"),
      graft.expr.ShingleKeys(TextOps.tokens(col("text")), n).as("keys"))

  /** MinHash signatures via the codegen'd [[graft.expr.MinHashSignature]]
    * expression — all `numHashes` minima in one compiled loop over the
    * shingle keys. Output: (doc_id, sig ARRAY<BIGINT>). Docs with no
    * shingles are dropped.
    */
  def minHashSignatures(docs: DataFrame, n: Int, numHashes: Int): DataFrame =
    docShingleKeys(docs, n)
      .filter(size(col("keys")) > 0)
      .select(
        col("doc_id"),
        graft.expr.MinHashSignature(col("keys"), numHashes).as("sig"))

  /** LSH band buckets: signature split into `bands` bands of `rowsPerBand`
    * values; bucket id = md5 of the band's concatenated values.
    * Output: (doc_id, band, bucket).
    */
  def lshBuckets(sigs: DataFrame, bands: Int, rowsPerBand: Int): DataFrame =
    sigs
      .select(
        col("doc_id"),
        posexplode(
          transform(
            sequence(lit(0), lit(bands - 1)),
            b =>
              md5(concat_ws(",",
                transform(
                  slice(col("sig"), b * rowsPerBand + 1, lit(rowsPerBand)),
                  v => v.cast("string"))))))
          .as(Seq("band", "bucket")))

  /** Candidate near-dup pairs: docs sharing any (band, bucket).
    * Output: (d1, d2) distinct, d1 < d2.
    */
  def minHashCandidates(
      docs: DataFrame,
      n: Int,
      numHashes: Int,
      bands: Int): DataFrame = {
    require(numHashes % bands == 0, "numHashes must be divisible by bands")
    // cache the buckets: the self-join would otherwise recompute the full
    // signature pass for each side
    val b = lshBuckets(minHashSignatures(docs, n, numHashes), bands, numHashes / bands)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    b.as("a")
      .join(b.as("b"), Seq("band", "bucket"))
      .filter(col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
      .distinct()
  }

  /** End-to-end near-dedup: MinHash+LSH candidates, verified against exact
    * Jaccard, then greedy keep-lowest-id — a doc is dropped iff some
    * SMALLER-id doc is near-identical to it. (One-step transitive closure:
    * the standard single-pass policy; full connected components would need
    * an iterative join.) Output: the surviving docs.
    */
  def nearDedup(
      docs: DataFrame,
      n: Int,
      numHashes: Int,
      bands: Int,
      threshold: Double): DataFrame = {
    val cands = minHashCandidates(docs, n, numHashes, bands)
    val verified = verifyJaccard(docs, cands, n, threshold)
    val dropped = verified.select(col("d2").as("doc_id")).distinct()
    docs.join(dropped, Seq("doc_id"), "left_anti")
  }

  /** Exact Jaccard for a given candidate-pair set (cheap: computes
    * similarity only for candidates, not all pairs).
    * Input pairs: (d1, d2). Output: (d1, d2, jac) with jac >= threshold.
    */
  def verifyJaccard(
      docs: DataFrame,
      pairs: DataFrame,
      n: Int,
      threshold: Double): DataFrame = {
    val keys = docShingleKeys(docs, n)
      .select(col("doc_id"), col("keys"))
    val left = keys.select(col("doc_id").as("d1"), col("keys").as("k1"))
    val right = keys.select(col("doc_id").as("d2"), col("keys").as("k2"))
    pairs
      .join(left, "d1")
      .join(right, "d2")
      .withColumn("inter", size(array_intersect(col("k1"), col("k2"))))
      .withColumn(
        "jac",
        col("inter") / (size(col("k1")) + size(col("k2")) - col("inter")))
      .filter(col("jac") >= threshold)
      .select(col("d1"), col("d2"), col("jac"))
  }

  /** Duplicate GROUPS: connected components over the verified near-dup
    * pair graph, labeled by the minimum doc_id in each component.
    * Iterative min-label propagation on DataFrames (each round: take the
    * min of a node's label and its neighbors' labels) — converges in
    * O(component diameter) rounds; near-dup components are tiny chains in
    * practice, and `maxRounds` bounds the worst case. Only docs that are in
    * some pair appear. Output: (doc_id, gid).
    */
  def dupGroups(pairs: DataFrame, maxRounds: Int = 10): DataFrame = {
    val edges = pairs.select(col("d1").as("a"), col("d2").as("b"))
      .union(pairs.select(col("d2").as("a"), col("d1").as("b")))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var labels = edges.select(col("a").as("doc_id"))
      .distinct()
      .withColumn("gid", col("doc_id"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // min-label propagation only ever DECREASES labels, so the label sum is
    // a strictly decreasing convergence witness (and avoids the ambiguous
    // self-join a row-wise old-vs-new compare would need)
    def labelSum(df: DataFrame): Long = {
      val row = df.agg(sum(col("gid"))).collect()(0)
      if (row.isNullAt(0)) 0L else row.getLong(0) // sum over empty = null
    }
    var round = 0
    var prevSum = labelSum(labels)
    var changed = prevSum != 0L // empty pair set: nothing to propagate
    while (round < maxRounds && changed) {
      round += 1
      val propagated = edges
        .join(labels.withColumnRenamed("doc_id", "a"), "a")
        .select(col("b").as("doc_id"), col("gid"))
      val next = labels.union(propagated)
        .groupBy(col("doc_id")).agg(min(col("gid")).as("gid"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val nextSum = labelSum(next)
      changed = nextSum != prevSum
      prevSum = nextSum
      labels.unpersist(blocking = false)
      labels = next
    }
    edges.unpersist(blocking = false)
    if (changed)
      throw new IllegalStateException(
        s"dupGroups did not converge within $maxRounds rounds — a component's " +
          "diameter exceeds the bound; raise maxRounds (silent truncation " +
          "would mislabel groups)")
    labels
  }

  // ---------------------------------------------------------------------
  // SimHash
  // ---------------------------------------------------------------------

  /** Per-token hash quads: md5(token) hex split into 4 × 16-bit ints
    * (4 hex digits each). bit j of a token = bit (15 − j%16) of quad j/16 —
    * identical to "bit (3 − j%4) of hex digit j/4", but integer ops replace
    * per-bit string probing.
    */
  private def tokenHashQuads(toks: Column): Column =
    transform(
      array_distinct(toks),
      t =>
        transform(
          sequence(lit(0), lit(3)),
          q => conv(md5(t).substr(q * 4 + 1, lit(4)), 16, 10).cast("int")))

  /** The 64 SimHash majority weights over a materialized `hs` column
    * (array of per-token quads): weight_j = Σ_tokens (2·bit_j − 1).
    */
  private def simHashWeights(hs: Column): IndexedSeq[Column] =
    (0 until 64).map { j =>
      aggregate(
        hs,
        lit(0),
        (acc, h) =>
          acc + (shiftright(element_at(h, j / 16 + 1), 15 - j % 16)
            .bitwiseAND(lit(1)) * 2 - 1))
    }

  /** (doc_id, hs) with the per-token md5 quads materialized behind a
    * shuffle barrier — without it CollapseProject would inline the md5
    * computation into each of the 64 weight expressions (64× recompute).
    */
  private def tokenHashFrame(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), tokenHashQuads(TextOps.tokens(col("text"))).as("hs"))
      .repartition(col("doc_id"))

  /** Per-doc SimHash fingerprints as a 64-char '0'/'1' string (portable,
    * oracle-checkable). (doc_id, simhash).
    */
  def simHash(docs: DataFrame): DataFrame = {
    val weights = simHashWeights(col("hs"))
    val bits = weights.map(w => when(w > 0, lit("1")).otherwise(lit("0")))
    tokenHashFrame(docs).select(col("doc_id"), concat(bits: _*).as("simhash"))
  }

  /** TF-weighted SimHash: like [[simHash]] but each distinct token's ±1
    * vote is weighted by its occurrence count (term frequency), so a
    * token repeated ten times dominates a hapax — the standard weighted
    * variant (Charikar'02 with tf weights). Emitted as the 64-char bit
    * string. (doc_id, simhash).
    */
  def simHashWeighted(docs: DataFrame): DataFrame = {
    // hs carries one quad per token OCCURRENCE (no distinct): summing the
    // per-occurrence ±1 votes IS the tf weighting
    val hs = transform(
      TextOps.tokens(col("text")),
      t =>
        transform(
          sequence(lit(0), lit(3)),
          q => conv(md5(t).substr(q * 4 + 1, lit(4)), 16, 10).cast("int")))
    val framed = docs
      .select(col("doc_id"), hs.as("hs"))
      .repartition(col("doc_id")) // projection barrier (see tokenHashFrame)
    val weights = simHashWeights(col("hs"))
    val bits = weights.map(w => when(w > 0, lit("1")).otherwise(lit("0")))
    framed.select(col("doc_id"), concat(bits: _*).as("simhash"))
  }

  /** Per-doc SimHash packed as 4 × 16-bit int blocks (the join/hamming
    * representation). (doc_id, blocks ARRAY<INT> of length 4).
    */
  def simHashBlocks(docs: DataFrame): DataFrame = {
    val weights = simHashWeights(col("hs"))
    val blocks = (0 until 4).map { b =>
      (0 until 16).map { r =>
        when(weights(16 * b + r) > 0, lit(1 << (15 - r))).otherwise(lit(0))
      }.reduce(_ + _)
    }
    tokenHashFrame(docs)
      .select(col("doc_id"), array(blocks: _*).as("blocks"))
  }

  /** Hamming distance between two equal-length bit strings. */
  def hammingDist(a: Column, b: Column): Column =
    size(
      filter(
        sequence(lit(1), length(a)),
        i => a.substr(i, lit(1)) =!= b.substr(i, lit(1))))

  /** SimHash near-dup pairs with hamming distance <= maxDist (< 16): by
    * pigeonhole over 4 16-bit blocks, candidates must match at least one
    * block exactly, so the join is equality-based (scales; no all-pairs).
    * Hamming distance is Σ `bit_count(xor)` over the packed int blocks —
    * 4 integer ops per pair instead of 64 string probes.
    * Output: (d1, d2, hamming).
    */
  def simHashPairs(docs: DataFrame, maxDist: Int): DataFrame = {
    require(maxDist < 4, "pigeonhole over 4 blocks guarantees recall only for maxDist < 4")
    // cache: the self-join would otherwise run the fingerprint pass twice
    val fp = simHashBlocks(docs)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val exploded = fp.select(
      col("doc_id"),
      col("blocks"),
      posexplode(col("blocks")).as(Seq("blk", "blkval")))
    val hamming = (1 to 4).map { i =>
      bit_count(
        element_at(col("a.blocks"), i).bitwiseXOR(element_at(col("b.blocks"), i)))
    }.reduce(_ + _)
    exploded.as("a")
      .join(exploded.as("b"), Seq("blk", "blkval"))
      .filter(col("a.doc_id") < col("b.doc_id"))
      .select(
        col("a.doc_id").as("d1"),
        col("b.doc_id").as("d2"),
        hamming.as("hamming"))
      .filter(col("hamming") <= maxDist)
      .distinct()
  }
}
