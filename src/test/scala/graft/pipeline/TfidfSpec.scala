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

  test("tfidfFromStore == tfidf bit-exactly (fit-once/featurize-many)") {
    val d = docs(corpus: _*)
    val storeDir =
      java.nio.file.Files.createTempDirectory("tfidf_spec_").toFile
    val store = storeDir.getAbsolutePath + "/model"
    TextOps.writeTfidfModel(d, store, 64)
    val inline = TextOps.tfidf(d, 64)
      .as[(Long, Long, Double)].collect().sortBy(r => (r._1, r._2))
    val stored = TextOps.tfidfFromStore(d, store)
      .as[(Long, Long, Double)].collect().sortBy(r => (r._1, r._2))
    assert(inline.toSeq === stored.toSeq)
    org.apache.commons.io.FileUtils.deleteQuietly(storeDir)
  }

  test("a fresh batch featurizes under the STORED df, not its own") {
    val d = docs(corpus: _*)
    val storeDir =
      java.nio.file.Files.createTempDirectory("tfidf_spec_").toFile
    val store = storeDir.getAbsolutePath + "/model"
    val nBuckets = 64
    TextOps.writeTfidfModel(d, store, nBuckets)
    // one doc: a repeated fit-corpus token and a token the fit corpus
    // never saw — the expected weights derive from the FIT corpus's
    // per-BUCKET df (collisions at 64 buckets included), with the
    // unseen token taking the df=0 smoothed idf unless its bucket
    // happens to collide with a fit bucket
    val batch = docs((100L, "the the xyzzy"))
    val got = TextOps.tfidfFromStore(batch, store)
      .as[(Long, Long, Double)].collect()
      .map(r => r._2 -> r._3).toMap
    val n = corpus.size.toDouble
    val fitDf: Map[Long, Int] = corpus
      .flatMap { case (id, t) =>
        t.trim.split("\\s+").map(tok => bucket(tok, nBuckets)).distinct
          .map(b => (id, b))
      }
      .groupBy(_._2).map { case (b, g) => b -> g.size }
    def idf(b: Long): Double =
      math.log((n + 1.0) / (fitDf.getOrElse(b, 0) + 1.0)) + 1.0
    val batchTf: Map[Long, Double] = Seq("the", "the", "xyzzy")
      .groupBy(tok => bucket(tok, nBuckets))
      .map { case (b, g) => b -> g.size.toDouble }
    val w = batchTf.map { case (b, t) => b -> t * idf(b) }
    val nrm = math.sqrt(w.values.map(x => x * x).sum)
    val expected = w.map { case (b, x) =>
      b -> math.floor(x / nrm * 1e6) / 1e6
    }
    // the fixture must actually exercise the unseen-bucket leg
    assert(!fitDf.contains(bucket("xyzzy", nBuckets)),
      "xyzzy must hash to a bucket the fit corpus never filled")
    assert(got === expected)
    org.apache.commons.io.FileUtils.deleteQuietly(storeDir)
  }
}
