package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only probe: where does st_stream_join's fixed cost live?
  * Times the full query at several shuffle-partition settings (state
  * store count scales with it) on sf0.1.
  */
object ProbeStream {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def runOnce(): Long = {
      val q = SparkEntryAccess.stStreamJoin(spark, dir)
      q.count()
    }

    for (parts <- Seq("32", "32", "8", "4", "8", "32", "4")) {
      spark.conf.set("spark.sql.shuffle.partitions", parts)
      val t0 = System.nanoTime()
      val n = runOnce()
      println(f"PROBE shufflePartitions=$parts%-3s ${(System.nanoTime() - t0) / 1e9}%6.2f s rows=$n")
    }
    spark.stop()
  }
}

/** Re-run the registered query outside Bench. */
object SparkEntryAccess {
  def stStreamJoin(spark: SparkSession, dir: String) =
    graft.SparkEntry.queries("st_stream_join")(spark, dir)
}
