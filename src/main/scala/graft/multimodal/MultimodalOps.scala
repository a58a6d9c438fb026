package graft.multimodal

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video payloads as opaque
  * `BINARY` columns with typed metadata, batch-oriented decode/feature
  * extraction, and frame sampling.
  *
  * The decode step is a clearly-marked STUB (no image/audio codecs in this
  * environment): `fakeDecodeFeatures` derives a deterministic 16-bin byte
  * histogram so the Spark-side plumbing — schema, partitioning,
  * batched-iterator shape, feature layout — is real and tested, and a real
  * decoder (JPEG/PNG/PCM) drops in by replacing ONE function.
  *
  * Scale notes: payloads stay opaque binary end-to-end (no driver
  * round-trip); decode runs via `mapPartitions` so a real implementation
  * amortizes codec init per partition, the same execution shape as a
  * Python `mapInPandas` batch UDF; metadata-only queries never touch the
  * payload bytes thanks to parquet column pruning.
  */
object MultimodalOps {

  /** Media-table schema: payload + typed metadata. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("media", BinaryType, nullable = true),
    StructField("format", StringType, nullable = true),
    StructField("n_bytes", LongType, nullable = true)
  ))

  /** Build a media table from the documents fixture: the UTF-8 bytes of
    * `text` stand in for an opaque payload (deterministic, so metadata
    * queries remain oracle-checkable via `octet_length`).
    */
  def mediaFromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      encode(col("text"), "UTF-8").as("media"),
      lit("application/octet-stream").as("format"),
      octet_length(col("text")).cast("long").as("n_bytes"))

  /** Metadata-only stats per format — reads no payload bytes. */
  def mediaStats(media: DataFrame): DataFrame =
    media
      .groupBy(col("format"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("n_bytes")).as("total_bytes"),
        min(col("n_bytes")).as("min_bytes"),
        max(col("n_bytes")).as("max_bytes"))

  /** STUB decoder: deterministic 16-bin byte histogram, L1-normalized.
    * Replace with a real codec (???) for production; the signature —
    * bytes in, fixed-width Float features out — is the contract.
    */
  def fakeDecodeFeatures(payload: Array[Byte]): Array[Float] = {
    val bins = new Array[Float](16)
    if (payload == null || payload.isEmpty) return bins
    var i = 0
    while (i < payload.length) {
      bins((payload(i) & 0xff) >> 4) += 1f
      i += 1
    }
    var j = 0
    while (j < 16) { bins(j) /= payload.length.toFloat; j += 1 }
    bins
  }

  /** Batched feature extraction over the media table. Runs the decoder
    * per partition (codec init amortized across the batch, mirroring a
    * `mapInPandas` batch UDF). Output: (media_id, features ARRAY<FLOAT>).
    */
  def extractFeatures(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("features", ArrayType(FloatType), nullable = false)))
    val enc = Encoders.row(outSchema)
    media
      .select(col("media_id"), col("media"))
      .mapPartitions { rows =>
        // per-partition init point for a real codec goes here
        rows.map { r =>
          val id = r.getLong(0)
          val payload = r.getAs[Array[Byte]](1)
          Row(id, fakeDecodeFeatures(payload))
        }
      }(enc)
  }

  /** Frame sampling: cut the payload into fixed-size frames taking every
    * `stride`-th frame (video keyframe-ish sampling on opaque bytes).
    * Pure column expressions — `substring` on BINARY stays codegen'd.
    * Output: (media_id, frame_idx, frame BINARY).
    */
  def frameSample(media: DataFrame, frameSize: Int, stride: Int): DataFrame = {
    require(frameSize > 0 && stride > 0, "frameSize and stride must be positive")
    val nFrames = floor((octet_length(col("media")) + frameSize - 1) / frameSize)
    // empty payload -> no frames (sequence(0, -1) is not expressible, so
    // guard explicitly rather than clamping to a phantom zero-length frame)
    val frameIdxs = when(nFrames > 0,
      filter(
        sequence(lit(0), greatest(nFrames - 1, lit(0)).cast("int")),
        i => i % stride === 0))
      .otherwise(array().cast("array<int>"))
    media
      .select(
        col("media_id"),
        posexplode(
          transform(
            frameIdxs,
            i => col("media").substr((i * frameSize + 1).cast("int"), lit(frameSize))))
          .as(Seq("frame_idx", "frame")))
  }
}
