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

  /** Exact n-gram Jaccard near-dup pairs via inverted shingle index.
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
    val sh0 = docShingles(docs, n)
    val sh = maxShingleDf match {
      case Some(limit) =>
        val rare = sh0.groupBy(col("shingle")).agg(count(lit(1)).as("df"))
          .filter(col("df") <= limit).select("shingle")
        sh0.join(rare, Seq("shingle"), "left_semi")
      case None => sh0
    }
    val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("sz"))
    val co = sh.as("a")
      .join(sh.as("b"), col("a.shingle") === col("b.shingle"))
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

  /** MinHash signatures: sig[i] = min over shingles of md5(i || '|' || s),
    * compared lexicographically (hex strings — portable across engines).
    * Output: (doc_id, sig ARRAY<STRING> of length numHashes). Docs with no
    * shingles are dropped.
    */
  def minHashSignatures(docs: DataFrame, n: Int, numHashes: Int): DataFrame = {
    val shl = docs
      .select(
        col("doc_id"),
        array_distinct(TextOps.shingles(TextOps.tokens(col("text")), n))
          .as("shingles"))
      .filter(size(col("shingles")) > 0)
    val sig = transform(
      sequence(lit(0), lit(numHashes - 1)),
      h =>
        array_min(
          transform(
            col("shingles"),
            s => md5(concat(h.cast("string"), lit("|"), s)))))
    shl.select(col("doc_id"), sig.as("sig"))
  }

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
              md5(concat_ws("", slice(col("sig"), b * rowsPerBand + 1, lit(rowsPerBand))))))
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
    val b = lshBuckets(minHashSignatures(docs, n, numHashes), bands, numHashes / bands)
    b.as("a")
      .join(b.as("b"), Seq("band", "bucket"))
      .filter(col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
      .distinct()
  }

  // ---------------------------------------------------------------------
  // SimHash
  // ---------------------------------------------------------------------

  /** 64-bit SimHash over distinct token shingle-1s (unit weights), emitted
    * as a 64-char '0'/'1' string (portable, lexicographically comparable).
    *
    * bit j of a token = bit (3 - j%4) of hex digit j/4 of md5(token);
    * weight_j = Σ_tokens (2·bit−1); fingerprint bit j = 1 iff weight_j > 0.
    */
  def simHashBits(toks: Column): Column = {
    val hashes = transform(array_distinct(toks), t => md5(t))
    val hexDigits = lit("0123456789abcdef")
    val bitOf = (h: Column, j: Int) => {
      val digit = instr(hexDigits, substring(h, j / 4 + 1, 1)) - 1
      floor(digit / lit(1 << (3 - j % 4))).cast("int") % 2
    }
    val bits = (0 until 64).map { j =>
      val w = aggregate(
        hashes,
        lit(0),
        (acc, h) => acc + (bitOf(h, j) * 2 - 1))
      when(w > 0, lit("1")).otherwise(lit("0"))
    }
    concat(bits: _*)
  }

  /** Per-doc SimHash fingerprints: (doc_id, simhash STRING(64)). */
  def simHash(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      simHashBits(TextOps.tokens(col("text"))).as("simhash"))

  /** Hamming distance between two equal-length bit strings. */
  def hammingDist(a: Column, b: Column): Column =
    size(
      filter(
        sequence(lit(1), length(a)),
        i => a.substr(i, lit(1)) =!= b.substr(i, lit(1))))

  /** SimHash near-dup pairs with hamming distance <= maxDist (< 16): by
    * pigeonhole over 4 16-bit blocks, candidates must match at least one
    * block exactly, so the join is equality-based (scales; no all-pairs).
    * Output: (d1, d2, hamming).
    */
  def simHashPairs(docs: DataFrame, maxDist: Int): DataFrame = {
    require(maxDist < 16, "pigeonhole blocks assume maxDist < blocks count bits")
    val fp = simHash(docs)
    val blocks = fp.select(
      col("doc_id"),
      col("simhash"),
      posexplode(
        transform(
          sequence(lit(0), lit(3)),
          b => col("simhash").substr(b * 16 + 1, lit(16))))
        .as(Seq("blk", "blkval")))
    blocks.as("a")
      .join(blocks.as("b"), Seq("blk", "blkval"))
      .filter(col("a.doc_id") < col("b.doc_id"))
      .select(
        col("a.doc_id").as("d1"),
        col("b.doc_id").as("d2"),
        col("a.simhash").as("s1"),
        col("b.simhash").as("s2"))
      .distinct()
      .withColumn("hamming", hammingDist(col("s1"), col("s2")))
      .filter(col("hamming") <= maxDist)
      .select(col("d1"), col("d2"), col("hamming"))
  }
}
