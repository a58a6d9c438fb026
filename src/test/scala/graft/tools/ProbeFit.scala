package graft.tools

import org.apache.spark.sql.functions._

/** Dev probe: component-level timing of the SemDeDup-sized pipeline at the
  * bench SF — count, quantizer fit (per-iteration), final assignment, and
  * the within-cell pairwise stage — to locate the dominant cost before
  * optimizing (round-10: `sm_semdedup_sized` at 9.77 s is ~all quantizer
  * fit per the r9 verdict; this separates plan/codegen overhead from data
  * work).
  */
object ProbeFit {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[8]").config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.kmeans.{LloydN, OpsN}

    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"PROBEFIT $label%-28s ${(System.nanoTime() - t0) / 1e9}%7.3f s")
      r
    }

    // mirror sm_semdedup_sized's inputs
    val vecs = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id").as("id"), col("embedding").cast("array<double>").as("vec"))
    val pts = vecs.select(col("id").as("pid"), col("vec").as("features"))

    (1 to 2).foreach { round =>
      println(s"--- round $round ---")
      spark.catalog.clearCache(); graft.util.OpCaches.releaseAll(spark)
      val n = t("count")(pts.count())
      val nlist = math.max((n + 63) / 64, 1L).toInt
      println(s"PROBEFIT n=$n nlist=$nlist")

      // per-iteration breakdown of the fit (mirrors LloydN.iterateN)
      val cached = pts.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      var cents = t("init firstK")(
        OpsN.collectCentroidsN(OpsN.initFirstKN(cached, nlist)))
      (1 to 5).foreach { i =>
        val df = t(s"iter $i build")(
          OpsN.updateN(OpsN.assignNAdaptive(cached, cents)).drop("n"))
        t(s"iter $i plan") { df.queryExecution.executedPlan; () }
        t(s"iter $i exec 1st")(OpsN.collectCentroidsN(df))
        cents = t(s"iter $i exec 2nd")(OpsN.collectCentroidsN(df))
      }
      cached.unpersist(blocking = false)

      spark.catalog.clearCache(); graft.util.OpCaches.releaseAll(spark)
      val model = t("iterateNSampled total")(
        LloydN.iterateNSampled(pts, nlist, 5, 100000L, Some(n)))

      t("final assign + pairwise")(
        graft.sim.Similarity.semDedup(
            vecs, nlist, 0.45, 5, 100000L, Some(n))
          .write.mode("overwrite").format("noop").save())
      println(s"PROBEFIT model size=${model.size}")

      spark.catalog.clearCache(); graft.util.OpCaches.releaseAll(spark)
      t("sm_semdedup_sized e2e")(
        graft.SparkEntry.queries("sm_semdedup_sized")(spark, dir)
          .write.mode("overwrite").format("noop").save())
    }
    spark.stop()
  }
}
