package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

import graft.kmeans.SparkTestSession
import graft.text.TextOps

/** Hashed TF-IDF featurization. */
class TfidfSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  def docs(ds: (Long, String)*): DataFrame = ds.toDF("doc_id", "text")

  val corpus: Seq[(Long, String)] = Seq(
    (1L, "the cat sat on the mat"),
    (2L, "the dog sat on the rug"),
    (3L, "a cat and a dog"),
    (4L, "entirely novel tokens here"))

  private def bucket(tok: String, nBuckets: Int): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(tok.getBytes("UTF-8"))
      .map(b => f"${b & 0xff}%02x").mkString
    java.lang.Long.parseLong(hex.take(8), 16) % nBuckets
  }

  test("tfidf matches a hand-rolled derivation bit-exactly") {
    val nBuckets = 64
    val toks = corpus.map { case (id, t) => id -> t.trim.split("\\s+").toSeq }
    val tf: Map[(Long, Long), Double] = toks.flatMap { case (id, ts) =>
      ts.groupBy(t => bucket(t, nBuckets))
        .map { case (b, g) => (id, b) -> g.size.toDouble }
    }.toMap
    val n = corpus.size.toDouble
    val df = tf.keys.groupBy(_._2).map { case (b, g) => b -> g.size.toDouble }
    val w = tf.map { case ((id, b), t) =>
      (id, b) -> t * (math.log((n + 1.0) / (df(b) + 1.0)) + 1.0)
    }
    val expected = w.map { case ((id, b), x) =>
      val nrm = math.sqrt(
        w.filter(_._1._1 == id).toSeq.sortBy(_._1._2)
          .foldLeft(0.0) { case (acc, (_, y)) => acc + y * y })
      (id, b) -> math.floor(x / nrm * 1e6) / 1e6
    }
    val got = TextOps.tfidf(docs(corpus: _*), nBuckets)
      .as[(Long, Long, Double)].collect()
      .map { case (id, b, x) => (id, b) -> x }.toMap
    assert(got === expected)
  }

  test("per-document weight vectors are L2-normalized") {
    val sums = TextOps.tfidf(docs(corpus: _*), 64)
      .as[(Long, Long, Double)].collect()
      .groupBy(_._1).values.map(_.map(r => r._3 * r._3).sum)
    sums.foreach(s => assert(math.abs(s - 1.0) < 1e-4))
  }

  test("tfidf is invariant to input partitioning") {
    val a = TextOps.tfidf(docs(corpus: _*), 64)
      .as[(Long, Long, Double)].collect().sortBy(r => (r._1, r._2))
    val b = TextOps.tfidf(docs(corpus: _*).repartition(5), 64)
      .as[(Long, Long, Double)].collect().sortBy(r => (r._1, r._2))
    assert(a.toSeq === b.toSeq)
  }
}
