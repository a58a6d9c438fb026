package graft.pipeline

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.kmeans.SparkTestSession

/** The round-16 store-corruption guards (ADVICE items): both turn a
  * silently-wrong read into a named failure.
  *
  *  - [[graft.util.SegmentStore.readPartitionAware]] REJECTS a mixed
  *    layout (k=v partition dirs + streaming segment subdirs in one
  *    generation): recursive lookup would silently drop the partition
  *    column, a plain read would silently drop the segments.
  *  - [[graft.text.TextOps.classifierScoreFromStore]] validates every
  *    stored bucket against the meta-declared n_buckets instead of
  *    throwing a raw ArrayIndexOutOfBounds on a corrupt store.
  */
class StoreGuardsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def rm(f: java.io.File): Unit = {
    if (f.isDirectory) f.listFiles.foreach(rm)
    f.delete(); ()
  }

  test("readPartitionAware rejects mixed partitioned+segment layouts " +
      "and still reads each pure layout") {
    val dir = "target/graft_stores/mixed_layout_spec"
    rm(new java.io.File(dir))
    // pure partitioned layout: reads fine, partition column preserved
    Seq((1L, 0), (2L, 1)).toDF("cid_id", "cell")
      .write.partitionBy("cell").parquet(dir)
    val pure = graft.util.SegmentStore.readPartitionAware(spark, dir, "cid_id")
    assert(pure.columns.contains("cell") && pure.count() === 2)
    // drop a streaming-segment subdir next to the k=v dirs -> mixed
    Seq((3L, 2)).toDF("cid_id", "cell")
      .write.parquet(s"$dir/batch-0")
    val e = intercept[IllegalArgumentException](
      graft.util.SegmentStore.readPartitionAware(spark, dir, "cid_id")
        .count())
    assert(e.getMessage.contains("mixed store layout"))
    // pure segment layout (no k=v): folds the segment, no complaint
    val flat = "target/graft_stores/flat_layout_spec"
    rm(new java.io.File(flat))
    Seq((1L, "a")).toDF("cid_id", "v").write.parquet(flat)
    Seq((2L, "b")).toDF("cid_id", "v").write.parquet(s"$flat/batch-0")
    assert(graft.util.SegmentStore.read(spark, flat, "cid_id").count() === 2)
  }

  test("classifierScoreFromStore names the store on an out-of-range " +
      "bucket instead of a raw ArrayIndexOutOfBounds") {
    import graft.text.TextOps
    val docs = Seq(
      (1L, "src0", "alpha beta"), (2L, "src1", "gamma delta"))
      .toDF("doc_id", "source", "text")
    val store = "target/graft_stores/classifier_corrupt_spec"
    rm(new java.io.File(store))
    TextOps.writeClassifierModel(docs, col("source") === "src0", store,
      nBuckets = 64)
    // sanity: the intact store scores
    assert(TextOps.classifierScoreFromStore(docs, store).count() === 2)
    // corrupt: append a counts row whose bucket exceeds meta's n_buckets
    Seq((999L, 1L, 1L)).toDF("bucket", "cp", "cn")
      .write.mode("append").parquet(s"$store/counts")
    val e = intercept[IllegalArgumentException](
      TextOps.classifierScoreFromStore(docs, store).count())
    assert(e.getMessage.contains("corrupt classifier store") &&
      e.getMessage.contains(store))
  }
}
