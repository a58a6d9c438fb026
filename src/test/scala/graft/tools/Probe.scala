package graft.tools

import org.apache.spark.sql.SparkSession

import graft.dedup.Dedup

/** Dev-only timing probe for hot operators (not part of the driver
  * contract).
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"PROBE $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
    }

    time("shingles")(Dedup.docShingles(docs, 3).count())
    time("keys_materialized") {
      import org.apache.spark.sql.functions._
      Dedup.docShingleKeys(docs, 3)
        .agg(sum(size(col("keys")))).collect()(0).getLong(0)
    }
    time("signatures")(Dedup.minHashSignatures(docs, 3, 12).count())
    val sigs = Dedup.minHashSignatures(docs, 3, 12).cache()
    time("signatures_cached")(sigs.count())
    time("buckets")(Dedup.lshBuckets(sigs, 4, 3).count())
    val b = Dedup.lshBuckets(sigs, 4, 3).cache()
    b.count()
    time("join_on_cached_buckets") {
      import org.apache.spark.sql.functions._
      b.as("a").join(b.as("b"), Seq("band", "bucket"))
        .filter(col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
        .distinct().count()
    }
    time("full_candidates")(Dedup.minHashCandidates(docs, 3, 12, 4).count())

    // bucketed co-located join drive: write, join, inspect plan
    import org.apache.spark.sql.functions._
    import graft.storage.Bucketing
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select(col("l_orderkey").as("k"), col("l_extendedprice").as("price"),
        col("l_discount").as("disc"))
    Bucketing.writeBucketed(li.select(col("k"), col("price")), "probe_bkt_a", "k", 8)
    Bucketing.writeBucketed(li.select(col("k"), col("disc")), "probe_bkt_b", "k", 8)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val j = Bucketing.coLocatedJoin(spark, "probe_bkt_a", "probe_bkt_b", "k")
    val plan = j.queryExecution.executedPlan.toString
    println(s"PROBE bucketed_join_rows=${j.count()} exchange_free=${!plan.contains("Exchange")}")
    spark.sql("DROP TABLE probe_bkt_a"); spark.sql("DROP TABLE probe_bkt_b")
    spark.stop()
  }
}
