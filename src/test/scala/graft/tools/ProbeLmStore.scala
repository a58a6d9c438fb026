package graft.tools

import org.apache.spark.sql.functions._

/** Dev probe backing the BASELINE.md fit-once/score-many analysis for
  * the bigram-LM store (round 12). The bench's in-harness scale ratios
  * can't show the claim directly — `tx_lm_store` REFITS on whatever
  * corpus dir it's handed, so at 10× both its fit and its scoring grow.
  * This probe separates the legs the way production uses them:
  *
  *   - fit `writeLmModel` ONCE on the base corpus (the rare refit);
  *   - time `lmScoreFromStore` on a 1× batch vs a 10× batch — the
  *     daily-gate leg, which must scale ~linearly in the BATCH and be
  *     independent of the train corpus;
  *   - time inline `lmScore` on both corpora as the contrast — the
  *     fit-every-time shape whose cost carries the train split.
  *
  * Run AFTER a bench so the scale corpus exists:
  *   sbt "Test/runMain graft.tools.ProbeLmStore"
  */
object ProbeLmStore {
  def main(args: Array[String]): Unit = {
    val base = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val scale = args.lift(1).getOrElse("target/scale10")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]").config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.text.TextOps

    def docs(dir: String) = spark.read
      .parquet(s"$dir/documents.parquet").select(col("doc_id"), col("text"))

    val store = "target/probe_lm_store/model"
    TextOps.writeLmModel(docs(base), store)
    graft.util.OpCaches.releaseAll(spark)

    def time(body: => Unit): Double = {
      spark.catalog.clearCache()
      graft.util.OpCaches.releaseAll(spark)
      val t0 = System.nanoTime()
      body
      (System.nanoTime() - t0) / 1e9
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()

    // warm-up one pass of each shape, then min-of-3 (the scale-block
    // discipline: box noise is one-sided)
    def best(body: => Unit): Double = { time(body); Seq.fill(3)(time(body)).min }

    val storeBase = best(noop(TextOps.lmScoreFromStore(docs(base), store)))
    val storeScale = best(noop(TextOps.lmScoreFromStore(docs(scale), store)))
    val inlineBase = best(noop(TextOps.lmScore(docs(base))))
    val inlineScale = best(noop(TextOps.lmScore(docs(scale))))

    println(
      s"""{"store_score_1x":$storeBase,"store_score_10x":$storeScale,""" +
        s""""store_ratio":${storeScale / storeBase},""" +
        s""""inline_1x":$inlineBase,"inline_10x":$inlineScale,""" +
        s""""inline_ratio":${inlineScale / inlineBase},""" +
        s""""store_vs_inline_at_10x":${storeScale / inlineScale}}""")
    spark.stop()
  }
}
