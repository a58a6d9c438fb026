package graft.tools

/** Dev probe: the fixed-vs-sized SemDeDup scale contrast in isolation
  * (min-of-2 at the bench SF and at the ~10× replica corpus, mirroring
  * Bench's scale block). Exists because the sized variant's first scale
  * run exposed quantizer FITTING as the dominant cost (a corpus-sized
  * k paid a k-deep literal codegen chain per Lloyd iteration —
  * `OpsN.assignNAdaptive` is the fix); this reproduces that measurement
  * in ~a minute instead of a full bench pass.
  */
object ProbeSemDedup {
  def main(args: Array[String]): Unit = {
    val base = args.headOption.getOrElse("/root/testdata/sf0.01")
    val scaled = if (args.length > 1) args(1) else "target/scale10"
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[8]").config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    GenScaleCorpus.ensure(spark, base, scaled, 10)
    def run(name: String, dir: String): Double = {
      spark.catalog.clearCache(); graft.util.OpCaches.releaseAll(spark)
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(name)(spark, dir)
        .write.mode("overwrite").format("noop").save()
      (System.nanoTime() - t0) / 1e9
    }
    Seq("sm_semdedup", "sm_semdedup_sized").foreach { q =>
      run(q, base) // warm
      val b = Seq.fill(2)(run(q, base)).min
      run(q, scaled) // warm
      val s = Seq.fill(2)(run(q, scaled)).min
      println(f"SEMDEDUP $q%-20s base=$b%6.2f s  10x=$s%6.2f s  ratio=${s / b}%5.1f")
    }
    spark.stop()
  }
}
