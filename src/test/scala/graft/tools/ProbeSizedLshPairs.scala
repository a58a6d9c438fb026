package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev probe adjudicating the `sm_cosine_lsh_sized` 10× wall-ratio drift
  * (r11 certified 1.6×; three r14 certified runs read 2.98–3.36× on an
  * untouched path). The question is CLASS, not constants: does the sized
  * sign-LSH path's candidate-pair volume still grow ~linearly (≈replica×)
  * at 10× replicas, or has bucket skew under the extra sizing bits gone
  * superlinear? This counts, for the fixed-bit control and the sized
  * path, at base sf0.1 and target/scale10:
  *
  *  - n and the derived bitsPerBand,
  *  - the PRE-distinct candidate volume Σ_bands Σ_buckets C(|bucket|,2)
  *    (the within-bucket join work, straight from a bucket histogram —
  *    no pair materialization),
  *  - the distinct candidate-pair count and the verified-pair count.
  *
  * Linear candidate growth (≈10× ±2×) ⇒ the wall drift is runtime fit
  * constants (tiny absolute times, ~0.7 s base) and the class is
  * certified in BASELINE.md; superlinear growth ⇒ the sizing needs a
  * skew fix (hot-bucket cap as in the hardened path). Run AFTER a bench
  * so target/scale10 exists:
  *   sbt "Test/runMain graft.tools.ProbeSizedLshPairs"
  */
object ProbeSizedLshPairs {
  def main(args: Array[String]): Unit = {
    val base = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val scale = args.lift(1).getOrElse("target/scale10")
    val spark = SparkSession.builder()
      .master("local[32]").config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.sim.Similarity

    val bands = 4
    val d = 64

    def vecs(dir: String): DataFrame =
      spark.read.parquet(s"$dir/embeddings.parquet")
        .select(col("vec_id").as("id"),
          col("embedding").cast("array<double>").as("vec"))

    /** (n, bits, preDistinctVolume, distinctCandidates, verifiedPairs) */
    def stats(dir: String, fixedBits: Option[Int])
        : (Long, Int, Long, Long, Long) = {
      val v = vecs(dir)
      val n = v.count()
      val bits = fixedBits.getOrElse(Similarity.sizedBitsPerBand(n))
      val planes = Similarity.hyperplanes(bands * bits, d)
      val sig = graft.util.OpCaches.cache(
        v.select(col("id"), col("vec"),
          Similarity.norm(col("vec")).as("nn"),
          Similarity.lshSignature(col("vec"), planes).as("s")))
      val banded = sig.select(
        col("id"),
        posexplode(transform(sequence(lit(0), lit(bands - 1)),
          b => col("s").substr(b * bits + 1, lit(bits)))))
        .toDF("id", "band", "bucket")
      val vol = banded.groupBy("band", "bucket").count()
        .agg(sum((col("count") * (col("count") - 1) / 2).cast("long")))
        .collect()(0).getLong(0)
      val cands = banded.as("a").join(banded.as("b"), Seq("band", "bucket"))
        .filter(col("a.id") < col("b.id"))
        .select(col("a.id").as("d1"), col("b.id").as("d2")).distinct()
      val nc = cands.count()
      val nv = cands
        .join(sig.select(col("id").as("d1"), col("vec").as("v1"),
          col("nn").as("n1")), "d1")
        .join(sig.select(col("id").as("d2"), col("vec").as("v2"),
          col("nn").as("n2")), "d2")
        .withColumn("sim",
          when(col("n1") * col("n2") === 0.0, lit(0.0))
            .otherwise(Similarity.dot(col("v1"), col("v2")) /
              (col("n1") * col("n2"))))
        .filter(col("sim") >= 0.45).count()
      graft.util.OpCaches.releaseAll(spark)
      (n, bits, vol, nc, nv)
    }

    def report(label: String, fixedBits: Option[Int]): Unit = {
      val (nb, bb, volB, candB, verB) = stats(base, fixedBits)
      val (ns, bs, volS, candS, verS) = stats(scale, fixedBits)
      println(f"$label base:  n=$nb%d bits=$bb%d volume=$volB%d " +
        f"candidates=$candB%d verified=$verB%d")
      println(f"$label scale: n=$ns%d bits=$bs%d volume=$volS%d " +
        f"candidates=$candS%d verified=$verS%d")
      println(f"$label ratios: n=${ns.toDouble / nb}%.2f " +
        f"volume=${volS.toDouble / volB}%.2f " +
        f"candidates=${candS.toDouble / candB}%.2f " +
        f"verified=${verS.toDouble / verB}%.2f")
    }

    report("fixed4", Some(4))
    report("sized ", None)
    spark.stop()
  }
}
