package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.kmeans.SparkTestSession

/** Degenerate-input behavior of EVERY query key (the r17 verdict's #6):
  * against a zero-row (schema-preserving) fixture, each key either
  * COMPLETES with a defined result — the oracle's empty set, plus the
  * handful of keys whose output is constant-shaped (capability matrix,
  * global-aggregate summary rows, probe rows) — or REFUSES LOUDLY with
  * an `IllegalArgumentException` naming the operator and the missing
  * precondition. Nothing may die with an opaque engine error (the
  * pre-round-18 failure modes this pins against: bare
  * `NoSuchElementException: head of empty array` in the PQ/MLlib fits,
  * `PATH_NOT_FOUND` on the CM store's zero-batch glob,
  * `UNABLE_TO_INFER_SCHEMA` reading a BM25 store whose empty
  * partitionBy write produced no part files, `ROW_VALUE_IS_NULL`
  * reading a classifier meta row whose SUM-over-zero-rows totals were
  * NULL, and an MLlib k-means task-level stage failure).
  *
  * The refusal set is PINNED both ways: a key in the set must throw
  * (silently returning garbage on empty input would be a regression),
  * and a key outside it must complete. Regenerate the classification
  * with `Test/runMain graft.tools.EmptySweep` when adding a key, and
  * move it into `refuses` only when its refusal message names the
  * operator.
  *
  * WHY each family refuses (documented per the verdict's ask):
  *   - k-means assignment/fit (`a*`, `c4`, `j1_a3`, `l2`, `l6`, `p5`,
  *     `x1`, `st_event_assign`, `an_*`, `mllib_kmeans_sizes`): an empty
  *     corpus yields an EMPTY CENTROID SET — argmin over zero centroids
  *     is undefined, and the literal-array assign forms collect the
  *     model to build codegen literals. (`j1_crossjoin_assign` is the
  *     relational form of the same operator: its empty cross join is a
  *     well-defined empty set, so it completes — the asymmetry is
  *     inherent to literal-model vs relational-model shapes.)
  *   - ANN index fits (`sm_ann_ivf_*`, `sm_knn_join*`, `sm_semdedup*`,
  *     `sm_prototype_outliers`, `st_ivf_ingest`): the quantizer /
  *     prototype fit needs >= 1 vector ("fewer than 1 point available
  *     for k=N init"); serving a store that cannot be built would be a
  *     lie. Store READS are separately guarded (readIvfCentroids
  *     requires a non-empty store).
  *   - BM25 store family (`tx_bm25_*`): a zero-row partitionBy write
  *     is schema-less on disk, so the BUILD refuses
  *     ("writeBm25Index: empty corpus") instead of deferring the
  *     failure to an opaque read error. Append/delete/serve keys build
  *     their base index first, so they refuse at the same gate.
  *   - classifier (`tx_classifier_fit`, `tx_classifier_fit_score`,
  *     `st_classifier_serve`): a fit needs >= 1 token in EACH class;
  *     a persisted empty-corpus model carries tp=tn=0 and the store
  *     read refuses with "has an empty class (tp=0 tn=0)".
  *   - `mllib_minhash_pairs`: MLlib MinHashLSH cannot fit on zero
  *     vectors; the wrapper names that instead of MLlib's bare
  *     head-of-empty-array.
  *
  * Everything else — scans, filters, dedup (exact/near/SimHash/
  * substring), windows, joins, percentiles, text analysis/quality/LM/
  * TF-IDF/DSIR, BPE (fit of zero words = zero merge rows), packing,
  * mixing, multimodal decode, and the signature-store/CM-sketch
  * streaming serves (zero micro-batches => empty output, guarded glob
  * reads) — completes with the empty set or its defined
  * constant-shaped output.
  */
class EmptyInputSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  /** Keys that must refuse loudly on a zero-row fixture. */
  val refuses: Set[String] = Set(
    // k-means family: empty centroid set / empty fit input
    "a1_group_sizes", "a2_mean_update", "an_lloydn_fit", "an_ndim_assign",
    "an_ndim_mean", "an_ndim_sizes", "c4_convergence_movement",
    "j1_a3_assign", "l2_union_compile", "l6_kminit_parallel",
    "mllib_kmeans_sizes", "p5_f32_lloyd", "st_event_assign",
    "x1_mod_partition",
    // ANN / semantic fits: quantizer or prototype fit needs >= 1 vector
    "sm_ann_ivf_delete", "sm_ann_ivf_pq", "sm_ann_ivf_sq",
    "sm_ann_ivf_store", "sm_ann_ivf_topk", "sm_knn_join",
    "sm_knn_join_probe", "sm_prototype_outliers", "sm_semdedup",
    "sm_semdedup_sized", "st_ivf_ingest",
    // BM25 store family: empty index would be schema-less on disk
    "tx_bm25_append", "tx_bm25_append_serve", "tx_bm25_delete",
    "tx_bm25_delete_serve", "tx_bm25_store",
    // classifier: needs >= 1 token in each class (inline and stored)
    "tx_classifier_fit", "tx_classifier_fit_score", "st_classifier_serve",
    // MLlib LSH: cannot fit on zero vectors
    "mllib_minhash_pairs")

  private def rootCause(e: Throwable): Throwable = {
    var c = e
    while (c.getCause != null && c.getCause != c) c = c.getCause
    c
  }

  test("every query key on a zero-row fixture either completes with a " +
      "defined result or refuses with a loud IllegalArgumentException") {
    val dest = graft.tools.EmptySweep.ensureEmptyFixture(
      spark, "/root/testdata/sf0.001", "target/empty-sf")
    val failures = scala.collection.mutable.ArrayBuffer.empty[String]
    SparkEntry.queries.keys.toSeq.sorted.foreach { name =>
      spark.catalog.clearCache()
      graft.util.OpCaches.releaseAll(spark)
      val outcome =
        try Right(SparkEntry.queries(name)(spark, dest).count())
        catch { case e: Throwable => Left(e) }
      (outcome, refuses(name)) match {
        case (Right(_), true) =>
          failures += s"$name: expected a loud refusal, but it completed"
        case (Right(n), false) if n < 0 =>
          failures += s"$name: negative count $n"
        case (Right(_), false) => // defined result — ok
        case (Left(e), true) =>
          // the refusal must be OUR loud precondition, with a message —
          // never an opaque engine error (walk the cause chain: a
          // refusal raised inside foreachBatch arrives wrapped)
          val c = rootCause(e)
          if (!c.isInstanceOf[IllegalArgumentException] ||
              Option(c.getMessage).forall(_.isEmpty))
            failures += s"$name: opaque failure ${c.getClass.getName}: " +
              s"${Option(c.getMessage).getOrElse("")}"
        case (Left(e), false) =>
          val c = rootCause(e)
          failures += s"$name: expected completion, got " +
            s"${c.getClass.getName}: ${Option(c.getMessage).getOrElse("").take(120)}"
      }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }
}
