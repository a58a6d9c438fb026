package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: where does `tx_pipeline_e2e_bpe`'s wall delta over the
  * regex sibling go — the survivor chain, the fit-store freshness
  * check, the dict read, or the packing join?
  *   sbt "Test/runMain graft.tools.ProbePipelineBpe [sfDir]"
  */
object ProbePipelineBpe {
  def main(args: Array[String]): Unit = {
    val sf = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]").config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.dedup.Dedup
    import graft.text.TextOps

    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe] $label%-32s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    val docs = graft.Graft.table(spark, sf, "documents")
    // the shared survivor chain, cached like the key builds it
    val kept0 = docs.join(
      TextOps.analyze(docs).filter(col("quality") >= 0.5)
        .select(col("doc_id")), Seq("doc_id"), "left_semi")
    val kept1 = Dedup.exactDedup(kept0)
    val kept2 = graft.util.OpCaches.cache(Dedup.nearDedup(kept1,
      n = 3, numHashes = 12, bands = 4, threshold = 0.5))
    val leaks = TextOps.splitLeakage(kept2,
      n = 3, threshold = 0.4, maxShingleDf = Some(50L))
    val contaminated = leaks
      .select(when(col("split1") === "train", col("d1"))
        .when(col("split2") === "train", col("d2")).as("doc_id"))
      .filter(col("doc_id").isNotNull).distinct()
    val kept3 = graft.util.OpCaches.cache(
      kept2.join(contaminated, Seq("doc_id"), "left_anti"))
    val capped = graft.util.OpCaches.cache(kept3.join(
      TextOps.sourceCap(kept3, cap = 7).select(col("doc_id")),
      Seq("doc_id"), "left_semi"))
    t("survivor chain -> capped")(println(s"  n=${capped.count()}"))

    val store = "target/graft_stores/probe_bpe_" +
      sf.replaceAll("[^A-Za-z0-9]", "_")
    t("bpeFitStore (cold fit+write)")(
      TextOps.bpeFitStore(docs, 12, store).count())
    val dict = t("bpeModelOrFit (warm)")(
      TextOps.bpeModelOrFit(docs, 12, store)._2)
    println(s"[probe] capped storageLevel=${capped.storageLevel} " +
      s"persistentRDDs=${spark.sparkContext.getPersistentRDDs.size}")
    t("capped.count (cache hit?)")(capped.count())
    t("capped.count (3rd)")(capped.count())
    t("capped.count (4th)")(capped.count())
    t("kept3.count")(kept3.count())
    t("kept2.count")(kept2.count())
    t("regex packSequences")(
      TextOps.packSequences(capped, 512L, 8)
        .write.mode("overwrite").format("noop").save())
    t("dict.count")(dict.count())
    t("bpeApplyCountsWith(capped)")(
      TextOps.bpeApplyCountsWith(capped, dict)
        .write.mode("overwrite").format("noop").save())
    t("packSequencesBpe (same capped)")(
      TextOps.packSequencesBpe(capped, dict, 512L, 8)
        .write.mode("overwrite").format("noop").save())
    t("packSequencesBpe (2nd run)")(
      TextOps.packSequencesBpe(capped, dict, 512L, 8)
        .write.mode("overwrite").format("noop").save())
    t("bpe over FULL docs (ref)")(
      TextOps.packSequencesBpe(docs, dict, 512L, 8)
        .write.mode("overwrite").format("noop").save())
    val cpd = t("capped.localCheckpoint")(capped.localCheckpoint())
    t("cpd.count")(cpd.count())
    t("packSequencesBpe (checkpointed)")(
      TextOps.packSequencesBpe(cpd, dict, 512L, 8)
        .write.mode("overwrite").format("noop").save())
    t("regex pack (checkpointed)")(
      TextOps.packSequences(cpd, 512L, 8)
        .write.mode("overwrite").format("noop").save())
    graft.util.OpCaches.releaseAll(spark)
    spark.stop()
  }
}
