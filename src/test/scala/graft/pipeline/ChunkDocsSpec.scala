package graft.pipeline

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.kmeans.SparkTestSession
import graft.text.TextOps

/** Overlapping fixed-token chunking ([[TextOps.chunkDocuments]]) — the
  * retrieval-indexing / context-window prep step.
  */
class ChunkDocsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def chunks(text: String, chunk: Int, overlap: Int) =
    TextOps.chunkDocuments(
        Seq((1L, text)).toDF("doc_id", "text"), chunk, overlap)
      .select(col("chunk_id"), col("chunk_text"), col("n_tokens"))
      .as[(Int, String, Long)].collect().sortBy(_._1).toSeq

  test("chunks overlap by exactly `overlap` tokens") {
    // 10 tokens, chunk 4, overlap 2 => starts 0,2,4,6,8
    val got = chunks("t1 t2 t3 t4 t5 t6 t7 t8 t9 t10", 4, 2)
    assert(got === Seq(
      (0, "t1 t2 t3 t4", 4L),
      (1, "t3 t4 t5 t6", 4L),
      (2, "t5 t6 t7 t8", 4L),
      (3, "t7 t8 t9 t10", 4L),
      (4, "t9 t10", 2L)))
  }

  test("zero overlap tiles the document; short tail kept") {
    val got = chunks("a b c d e f g", 3, 0)
    assert(got === Seq(
      (0, "a b c", 3L), (1, "d e f", 3L), (2, "g", 1L)))
  }

  test("a doc shorter than one chunk emits exactly one chunk") {
    assert(chunks("only two", 32, 8) === Seq((0, "only two", 2L)))
  }

  test("every token appears in at least one chunk, in order") {
    val text = (1 to 53).map(i => s"w$i").mkString(" ")
    val got = chunks(text, 8, 3)
    // stride 5: last start <= 52 => covers token 53
    val covered = got.flatMap(_._2.split(" ")).toSet
    assert(covered === (1 to 53).map(i => s"w$i").toSet)
    // reconstruction: stripping each chunk's overlap prefix (except the
    // first) re-yields the document
    val rebuilt = got.head._2 +: got.tail.map(_._2.split(" ").drop(3).mkString(" "))
    assert(rebuilt.filter(_.nonEmpty).mkString(" ") === text)
  }

  test("rejects overlap >= chunkTokens") {
    intercept[IllegalArgumentException] {
      TextOps.chunkDocuments(Seq((1L, "x")).toDF("doc_id", "text"), 4, 4)
    }
  }
}
