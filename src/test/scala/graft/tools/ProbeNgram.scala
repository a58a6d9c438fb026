package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dev probe: alternative physical formulations of the bigram count
  * (`tx_ngram_topk`'s core, the suite's top cost at ~5.5 s after the
  * round-10 store fix) to see where the constant lives — the shingle
  * array build, the 5M-row concat allocations, or the hash aggregate
  * itself.
  *
  *   A. current: explode(transform(sequence, concat_ws(element_at)))
  *      then groupBy(ngram-string)
  *   B. struct keys: same explode, but aggregate on the (tok1, tok2)
  *      struct and concat only the surviving distinct pairs
  *   C. no-array: posexplode tokens, bigram via lead() window — a
  *      shuffle-bearing straw man to confirm arrays beat windows
  */
object ProbeNgram {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]").config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.text.TextOps

    def t(label: String)(f: => DataFrame): Unit = {
      // min of 3 after 1 warm pass, same one-sided-noise logic as Bench
      f.write.mode("overwrite").format("noop").save()
      val times = Seq.fill(3) {
        val t0 = System.nanoTime()
        f.write.mode("overwrite").format("noop").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"PROBENGRAM $label%-12s ${times.min}%7.3f s  (min of 3)")
    }

    val docs = spark.read.parquet(s"$dir/documents.parquet")

    t("A-current") {
      TextOps.ngramTopK(docs, n = 2, k = 20)
    }

    t("B-struct") {
      val toks = docs.select(TextOps.tokens(col("text")).as("t"))
      toks
        .select(explode(when(size(col("t")) >= 2,
          transform(sequence(lit(0), size(col("t")) - 2),
            i => struct(
              element_at(col("t"), (i + 1).cast("int")).as("a"),
              element_at(col("t"), (i + 2).cast("int")).as("b"))))
          .otherwise(array().cast("array<struct<a:string,b:string>>")))
          .as("bg"))
        .groupBy(col("bg"))
        .agg(count(lit(1)).as("cnt"))
        .select(concat_ws(" ", col("bg.a"), col("bg.b")).as("ngram"),
          col("cnt"))
        .orderBy(col("cnt").desc, col("ngram"))
        .limit(20)
    }

    t("D-proj-str") {
      // isolate the variable: project the token array into a column
      // FIRST (as B does), but keep A's string keys — if this matches
      // B, the win is the projection (the inline split expression was
      // being re-evaluated per element access in the transform lambda),
      // not the struct keys
      docs.select(TextOps.tokens(col("text")).as("t"))
        .select(explode(TextOps.shingles(col("t"), 2)).as("ngram"))
        .groupBy(col("ngram"))
        .agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("ngram"))
        .limit(20)
    }

    t("C-window") {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
      docs
        .select(col("doc_id"),
          posexplode(TextOps.tokens(col("text"))).as(Seq("pos", "tok")))
        .withColumn("nxt", lead(col("tok"), 1).over(w))
        .filter(col("nxt").isNotNull)
        .select(concat_ws(" ", col("tok"), col("nxt")).as("ngram"))
        .groupBy(col("ngram"))
        .agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("ngram"))
        .limit(20)
    }

    spark.stop()
  }
}
