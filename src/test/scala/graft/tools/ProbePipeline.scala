package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev probe: per-stage wall cost of `tx_pipeline_e2e` at a given SF —
  * where does the composed pipeline spend its time vs the standalone
  * stage keys, and which caching layout minimizes it?
  *   sbt "Test/runMain graft.tools.ProbePipeline [sfDir]"
  */
object ProbePipeline {
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
      println(f"[probe] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    val docs = graft.Graft.table(spark, sf, "documents")
    val kept0 = docs.join(
      TextOps.analyze(docs).filter(col("quality") >= 0.5)
        .select(col("doc_id")),
      Seq("doc_id"), "left_semi")
    val kept1 = Dedup.exactDedup(kept0)
    val kept2 = graft.util.OpCaches.cache(Dedup.nearDedup(kept1,
      n = 3, numHashes = 12, bands = 4, threshold = 0.5))
    t("kept2 (materialize cache)")(println(s"  kept2 n=${kept2.count()}"))
    val leaks = TextOps.splitLeakage(kept2,
      n = 3, threshold = 0.4, maxShingleDf = Some(50L))
    t("leaks (one pass)")(println(s"  leaks n=${leaks.count()}"))
    val contaminated = leaks.filter(col("split1") === "train")
      .select(col("d1").as("doc_id"))
      .union(leaks.filter(col("split2") === "train")
        .select(col("d2").as("doc_id")))
      .distinct()
    t("contaminated (2nd+3rd pass)")(println(s"  n=${contaminated.count()}"))
    val kept3 = graft.util.OpCaches.cache(
      kept2.join(contaminated, Seq("doc_id"), "left_anti"))
    t("kept3 (materialize cache)")(println(s"  kept3 n=${kept3.count()}"))
    val capped = kept3.join(
      TextOps.sourceCap(kept3, cap = 7).select(col("doc_id")),
      Seq("doc_id"), "left_semi")
    val packed = TextOps.packSequences(capped, budget = 512L, shards = 8)
    t("cap+pack")(println(s"  packed n=${packed.count()}"))
    graft.util.OpCaches.releaseAll(spark)
    spark.stop()
  }
}
