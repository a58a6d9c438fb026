package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only probe: is dd_near_dedup's >10x scale-smoke ratio a
  * partition-sizing artifact? Times the query on the 10x corpus at
  * several shuffle-partition settings (the base bench runs 32 — at 10x
  * the per-partition sort/join state is 10x too, so spills would show
  * here and vanish with more partitions).
  */
object ProbeScale {
  def main(args: Array[String]): Unit = {
    val scaleDir = args.headOption.getOrElse("target/scale10")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def runOnce(name: String): Double = {
      spark.catalog.clearCache()
      graft.util.OpCaches.releaseAll(spark)
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(name)(spark, scaleDir)
        .write.mode("overwrite").format("noop").save()
      (System.nanoTime() - t0) / 1e9
    }

    runOnce("dd_near_dedup") // warm-up
    for (parts <- Seq("32", "128", "320", "32", "128")) {
      spark.conf.set("spark.sql.shuffle.partitions", parts)
      val t = runOnce("dd_near_dedup")
      println(f"PROBE scale dd_near_dedup parts=$parts%-4s $t%6.2f s")
    }
    spark.stop()
  }
}
