package graft.tools

import org.apache.spark.sql.functions._

/** Dev probe (round-16 drift adjudication, the ProbeSizedLshPairs
  * recipe applied to the semantic-dedup head): measure the within-cell
  * CANDIDATE-PAIR VOLUME Σ|cell|·(|cell|−1)/2 — the quantity the sized
  * cell count exists to bound — for the fixed-nlist and sized variants
  * at the bench SF and at the ~10× replica corpus. Wall ratios on
  * sub-second rows are fit-constant-dominated; the pair volume is the
  * scale property itself: fixed nlist grows it ~n²/nlist (quadratic),
  * occupancy-sized nlist holds it ~targetCellSize·n/2 (linear).
  */
object ProbeSemDedupPairs {
  def main(args: Array[String]): Unit = {
    val base = args.headOption.getOrElse("/root/testdata/sf0.1")
    val scaled = if (args.length > 1) args(1) else "target/scale10"
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[8]").config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    GenScaleCorpus.ensure(spark, base, scaled, 10)
    import graft.kmeans.{LloydN, OpsN}
    def pairs(dir: String, sized: Boolean): (Long, Long, Int) = {
      spark.catalog.clearCache(); graft.util.OpCaches.releaseAll(spark)
      val pts = OpsN.pointsFromEmbeddings(
        spark.read.parquet(s"$dir/embeddings.parquet"))
      val n = pts.count()
      // mirror sm_semdedup (nlist = 8) / sm_semdedup_sized (64/cell)
      val nlist =
        if (sized) math.max((n + 63) / 64, 1L).toInt else 8
      val model = LloydN.iterateNSampled(pts, nlist, 5, 100000L, Some(n))
      val vol = OpsN.assignN(pts, model)
        .groupBy(col("cid")).agg(count(lit(1)).as("c"))
        .agg(coalesce(sum(expr("c * (c - 1) div 2")), lit(0L)))
        .collect()(0).getLong(0)
      (n, vol, nlist)
    }
    for (sized <- Seq(false, true)) {
      val (n1, v1, l1) = pairs(base, sized)
      val (n2, v2, l2) = pairs(scaled, sized)
      val tag = if (sized) "sized(64/cell)" else "fixed(nlist=8)"
      println(f"SEMDEDUP-PAIRS $tag%-15s base: n=$n1%7d nlist=$l1%4d " +
        f"pairs=$v1%12d | 10x: n=$n2%7d nlist=$l2%4d pairs=$v2%12d " +
        f"| pair-ratio=${v2.toDouble / v1}%7.1f (rows ${n2.toDouble / n1}%4.1f x)")
    }
    spark.stop()
  }
}
