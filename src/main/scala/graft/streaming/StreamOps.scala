package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}

import graft.kmeans.{Centroid2, Ops}

/** Structured Streaming extensions (the reference is strictly batch —
  * SURVEY.md §2.8; these are the streaming capabilities the engine needs
  * for a live training-data pipeline).
  *
  * Design: every transform is expressed on a plain DataFrame so the same
  * code serves batch tables and `readStream` sources; watermarks are
  * applied only on the streaming path. State (`flatMapGroupsWithState`)
  * carries O(K) running moments, never data rows.
  */
object StreamOps {

  /** Tumbling-window event aggregation: (window_start, window_end,
    * event_type, n, total_value). Works identically on batch and streaming
    * frames — the batch form is the oracle-checkable one (DuckDB
    * `time_bucket`).
    */
  def windowedEventCounts(events: DataFrame, windowDur: String): DataFrame =
    events
      .groupBy(window(col("ts"), windowDur).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 6).as("total_value"))
      .select(
        col("w.start").as("window_start"),
        col("w.end").as("window_end"),
        col("event_type"),
        col("n"),
        col("total_value"))

  /** Streaming variant with a watermark for late data: aggregates finalize
    * `lateness` after the window closes; rows later than that are dropped.
    */
  def streamingWindowedCounts(
      stream: DataFrame,
      windowDur: String,
      lateness: String): DataFrame =
    windowedEventCounts(stream.withWatermark("ts", lateness), windowDur)

  /** Session-window aggregation: events from one user within `gap` of each
    * other merge into one session (Spark `session_window`; works on batch
    * and streaming frames — streaming requires a watermark, see
    * [[streamingSessionCounts]]). Output: (user_id, session_start,
    * session_end, n, total_value).
    */
  def sessionCounts(events: DataFrame, gap: String): DataFrame =
    events
      .groupBy(session_window(col("ts"), gap).as("w"), col("user_id"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 6).as("total_value"))
      .select(
        col("user_id"),
        col("w.start").as("session_start"),
        col("w.end").as("session_end"),
        col("n"),
        col("total_value"))

  /** Streaming variant (session windows require a watermark to finalize). */
  def streamingSessionCounts(
      stream: DataFrame,
      gap: String,
      lateness: String): DataFrame =
    sessionCounts(stream.withWatermark("ts", lateness), gap)

  /** Map events to the canonical 2-D point view: x = value, y = hour of
    * day. (The events table has no natural 2-D embedding; this is the
    * fixture mapping used by the streaming-assignment demo.)
    */
  def eventPoints(events: DataFrame): DataFrame =
    events.select(
      col("event_id").as("pid"),
      col("value").cast("double").as("x"),
      hour(col("ts")).cast("double").as("y"))

  /** Stateless streaming k-means assignment: classify each incoming event
    * against a FIXED centroid model (the common serving pattern: model
    * trained in batch, applied to the stream). Pure projection — no state,
    * no shuffle, append-mode safe at any rate.
    */
  def streamingAssign(stream: DataFrame, centroids: Seq[Centroid2]): DataFrame =
    Ops.assign(eventPoints(stream), centroids)

  /** Per-cluster running state for incremental centroid maintenance. */
  final case class ClusterState(n: Long, sumX: Double, sumY: Double) {
    def centroid(cid: Int): ClusterUpdate =
      ClusterUpdate(cid, sumX / n, sumY / n, n)
  }
  final case class ClusterUpdate(cid: Int, x: Double, y: Double, n: Long)
  final case class AssignedPoint(cid: Int, x: Double, y: Double)

  /** Incremental centroid updates over a stream of assigned points:
    * `flatMapGroupsWithState` keyed by cluster id keeps (n, Σx, Σy) and
    * emits the updated running mean once per cluster per micro-batch —
    * the streaming analogue of the reference's per-iteration mean
    * (`reducer.py:124-132`), with state O(K), not O(rows).
    */
  def incrementalCentroids(
      assigned: Dataset[AssignedPoint]): Dataset[ClusterUpdate] = {
    import assigned.sparkSession.implicits._
    assigned
      .groupByKey(_.cid)
      .flatMapGroupsWithState[ClusterState, ClusterUpdate](
        OutputMode.Append(),
        GroupStateTimeout.NoTimeout()) {
        (cid: Int, rows: Iterator[AssignedPoint], state: GroupState[ClusterState]) =>
          var s = state.getOption.getOrElse(ClusterState(0L, 0.0, 0.0))
          var touched = false
          rows.foreach { p =>
            s = ClusterState(s.n + 1, s.sumX + p.x, s.sumY + p.y)
            touched = true
          }
          if (touched) {
            state.update(s)
            Iterator.single(s.centroid(cid))
          } else Iterator.empty
      }
  }

  /** Wire a streaming DataFrame of raw events through assignment into
    * incremental centroid maintenance.
    */
  def incrementalCentroidStream(
      stream: DataFrame,
      centroids: Seq[Centroid2]): Dataset[ClusterUpdate] = {
    val spark = stream.sparkSession
    import spark.implicits._
    incrementalCentroids(
      streamingAssign(stream, centroids)
        .select(col("cid").cast("int"), col("x"), col("y"))
        .as[AssignedPoint])
  }

  /** Batch-train-then-stream-score: fit on a static points table, then
    * return a function applying the model inside `foreachBatch`.
    */
  def foreachBatchScorer(
      centroids: Seq[Centroid2]): (DataFrame, Long) => DataFrame =
    (batch: DataFrame, _: Long) => Ops.assign(eventPoints(batch), centroids)

  /** Streaming deduplication: drop events whose `idCols` were already seen,
    * with state bounded by the watermark (`dropDuplicatesWithinWatermark` —
    * duplicates arriving within `lateness` of each other are suppressed,
    * state for older keys is reclaimed). The streaming form of
    * [[graft.dedup.Dedup.exactDedup]]; works only on streams (batch frames
    * should use `dropDuplicates`).
    */
  def streamingDedup(
      stream: DataFrame,
      lateness: String,
      idCols: Seq[String]): DataFrame =
    stream
      .withWatermark("ts", lateness)
      .dropDuplicatesWithinWatermark(idCols)

  /** Stream–static enrichment join: events joined to a (small, broadcast)
    * static dimension table keyed by user id — the standard streaming
    * enrichment pattern; the static side is re-read per micro-batch by
    * Structured Streaming, so the same code serves batch and stream.
    * Output: events + the dimension's columns.
    */
  def enrichWithDim(
      events: DataFrame,
      dim: DataFrame,
      key: String): DataFrame =
    events.join(broadcast(dim), Seq(key), "left")

  /** Watermarked STREAM–STREAM time-bounded inner join, run to completion
    * over bounded streaming inputs and returned as the materialized
    * result: both sides get `lateness` watermarks (required for Spark to
    * bound join state — the time-range condition in
    * [[graft.joins.Joins.timeBoundJoin]] then lets it evict rows older
    * than watermark − window), the join runs through a memory sink in
    * append mode, and the drained sink table is returned.
    *
    * On a bounded source (e.g. [[graft.Graft.eventsStream]]) the result
    * equals the batch [[graft.joins.Joins.timeBoundJoin]] — watermarks
    * only drop LATE rows, and a bounded deterministic feed has none —
    * which is what makes the streaming path oracle-checkable. At scale
    * the same pipeline runs unbounded: state stays O(rows within the
    * watermark horizon), not O(stream).
    */
  def runStreamStreamTimeBoundJoin(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      rightKey: String,
      leftTs: String,
      rightTs: String,
      window: String,
      lateness: String,
      sinkName: String,
      statePartitions: Option[Int] = None,
      inspect: org.apache.spark.sql.streaming.StreamingQuery => Unit =
        _ => ()): DataFrame = {
    val spark = left.sparkSession
    val joined = watermarkedTimeBoundJoin(
      left, right, leftKey, rightKey, leftTs, rightTs, window, lateness)
    spark.catalog.dropTempView(sinkName) // stale sink from a prior run
    withShufflePartitions(spark, statePartitions) {
      val q = joined.writeStream
        .format("memory")
        .queryName(sinkName)
        .outputMode(OutputMode.Append())
        // bounded inputs: plan all available data up front and terminate,
        // instead of paying default-trigger micro-batch scheduling overhead
        .trigger(Trigger.AvailableNow())
        .start()
      try { q.awaitTermination(); inspect(q) }
      finally q.stop()
    }
    spark.table(sinkName)
  }

  /** Durable-sink variant of [[runStreamStreamTimeBoundJoin]]: identical
    * watermarked stream–stream join, but the results land in a PARQUET
    * sink (exactly-once via the checkpoint) instead of driver memory —
    * the shape the unbounded 100 TB pipeline runs, where a memory sink
    * would materialize the whole join output on one node. Runs the query
    * to completion over the currently-available data
    * (`Trigger.AvailableNow`) and returns a batch frame over the sink
    * path; an unbounded deployment starts the same plan with a
    * processing-time trigger and never calls the terminal read.
    */
  def runStreamStreamTimeBoundJoinToPath(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      rightKey: String,
      leftTs: String,
      rightTs: String,
      window: String,
      lateness: String,
      outPath: String,
      checkpointDir: String,
      statePartitions: Option[Int] = None): DataFrame = {
    val spark = left.sparkSession
    // outPath and checkpointDir are a PAIRED lifetime: a stale
    // _spark_metadata under outPath with a fresh checkpoint makes
    // FileStreamSink believe batch 0 already committed and silently skip
    // the write (the terminal read would return the OLD run's rows);
    // a retained checkpoint over a cleared outPath loses data the other
    // way. Fail fast instead of returning wrong data.
    val staleSink = java.nio.file.Paths.get(outPath, "_spark_metadata")
    if (java.nio.file.Files.exists(staleSink) &&
        !java.nio.file.Files.exists(java.nio.file.Paths.get(checkpointDir)))
      throw new IllegalStateException(
        s"$outPath holds a prior run's _spark_metadata but $checkpointDir " +
          "is fresh; outPath and checkpointLocation must share one lifetime " +
          "(clear both or keep both)")
    val joined = watermarkedTimeBoundJoin(
      left, right, leftKey, rightKey, leftTs, rightTs, window, lateness)
    withShufflePartitions(spark, statePartitions) {
      val q = joined.writeStream
        .format("parquet")
        .option("path", outPath)
        .option("checkpointLocation", checkpointDir)
        .outputMode(OutputMode.Append())
        .trigger(Trigger.AvailableNow())
        .start()
      try q.awaitTermination()
      finally q.stop()
    }
    // explicit schema: an empty join commits a metadata log with zero data
    // files, and schema inference over that throws instead of returning an
    // empty frame
    spark.read.schema(joined.schema).parquet(outPath)
  }

  /** Run `f` with `spark.sql.shuffle.partitions` temporarily overridden —
    * the knob that sizes STATEFUL-OPERATOR parallelism for a streaming
    * query (a stream–stream join instantiates four state stores per
    * partition per side, and the count is frozen into the checkpoint on
    * first run). The batch default — one partition per core — is the
    * wrong default for streaming state: on a 23-row bounded fixture the
    * 32-partition setting spent ~3× the query's whole runtime creating
    * and committing 128 near-empty store instances per batch (probed
    * round 8: 7.9 s at 32 → 2.6 s at 8). At scale the caller sizes this
    * to keep per-partition state in executor memory, independently of
    * the batch shuffle setting. Restores the previous value; the
    * override window is the query's lifetime, so concurrent BATCH
    * planning in the same session would also see it — run streaming
    * starts serially (as Verify/Bench do) or use a dedicated session.
    */
  private def withShufflePartitions[T](
      spark: SparkSession, n: Option[Int])(f: => T): T = n match {
    case None => f
    case Some(p) =>
      val prev = spark.conf.get("spark.sql.shuffle.partitions")
      spark.conf.set("spark.sql.shuffle.partitions", p.toString)
      try f finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }

  /** Continuous-ingest near-dedup: each micro-batch of documents dedups
    * against the PERSISTED signature store
    * ([[graft.dedup.Dedup.incrementalNearDedupFromStore]] — the corpus
    * text is never re-read), survivors land under `outPath`, and the
    * survivors' signatures extend the store so LATER batches dedup
    * against earlier ones. This is the streaming topology of the
    * daily-ingest path: the dedup "state" lives in the parquet store, not
    * in Structured Streaming state, so it is unbounded-corpus-safe
    * (streaming state stores replicate per-key state in executor memory;
    * a corpus-sized key set does not fit, a parquet store does) and a
    * restart resumes from checkpoint + store contents.
    *
    * '''Exactly-once sinks under at-least-once foreachBatch.''' A
    * replayed micro-batch (crash between the two writes, or a
    * checkpoint-recovered restart re-running the last uncommitted batch)
    * must not double-write. Both sinks are therefore written as one
    * OVERWRITTEN segment directory per batch id — `outPath/batch-…` and
    * `storePath/batch-…` — and the store read EXCLUDES the current
    * batch's own segment, so a replay sees exactly the pre-batch store
    * state, recomputes the identical survivor set, and overwrites both
    * segments with identical content. (Reading the store naively would
    * break replay a second way: the first attempt's appended signatures
    * would self-match the replayed batch and drop every survivor.)
    * A missing `storePath` bootstraps as an empty store, so a cold start
    * needs no out-of-band [[graft.dedup.Dedup.writeSignatureStore]] call;
    * an existing flat store written by that API is read alongside the
    * batch segments. Read either sink root with
    * [[graft.dedup.Dedup.readSignatureStore]]-style recursive listing
    * (`spark.read.option("recursiveFileLookup", true)`).
    *
    * foreachBatch is the right harness here because the batch is joined
    * against an EXTERNAL, batch-updated table — not against keyed
    * streaming state. Runs to completion over currently-available input
    * (`Trigger.AvailableNow`); an unbounded deployment starts the same
    * plan with a processing-time trigger. Batch order decides which of
    * two cross-batch near-dups survives (earlier batch wins — same
    * corpus-dominates policy as the store API); within a batch the
    * keep-min-id policy applies as in the batch operator.
    */
  def runStreamingDedupAgainstStore(
      stream: DataFrame,
      storePath: String,
      outPath: String,
      checkpointDir: String,
      n: Int,
      numHashes: Int,
      bands: Int,
      threshold: Double): Unit = {
    val q = stream.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        dedupBatchAgainstStore(
          batch, batchId, storePath, outPath, n, numHashes, bands, threshold)
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
    try q.awaitTermination()
    finally q.stop()
  }

  /** Streaming ingestion into a persisted IVF index
    * ([[graft.sim.Similarity.writeIvfIndex]] and its quantized
    * variants) — the ANN sibling of [[runStreamingDedupAgainstStore]]:
    * each micro-batch of (id, vec) rows is assigned under the STORED
    * quantizer (O(batch) work, the index is never rewritten) and lands
    * as a per-batch overwrite SEGMENT in every scan tier, so
    * at-least-once foreachBatch replays rewrite identical bytes
    * instead of double-appending — checkpoint-resumable AND
    * replay-idempotent, the same discipline as the signature-store
    * runner. No streaming state: ingest is append-only, so there is
    * nothing to watermark. Flat tier layout only; the index must be
    * built before the stream starts (no quantizer, no assignment —
    * fails fast). The [[graft.sim.Similarity.appendToIvfIndex]] refit
    * discipline applies across the stream's lifetime: a long-lived
    * stream grows the index past its fit, and the remedy is a refit +
    * fresh checkpoint. [[graft.sim.Similarity.compactIvfCells]] folds
    * the per-batch segment buildup back into flat files (don't compact
    * between a crashed batch and its replay, as with the signature
    * store).
    *
    * '''Batch-order invariant''' (unlike the dedup runner, where the
    * earlier batch wins cross-batch near-dup ties): every vector is
    * assigned under the FROZEN stored quantizer and the probe scans all
    * segments, so reordering the input micro-batches permutes segment
    * contents but cannot change any search answer — pinned against a
    * real reversed two-batch feed in StreamingSpec's order-invariance
    * test.
    */
  def runStreamingIvfAppend(
      stream: DataFrame,
      storePath: String,
      checkpointDir: String): Unit = {
    val q = stream.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        graft.sim.Similarity.appendIvfSegment(
          batch, storePath, f"batch-$batchId%09d")
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
    try q.awaitTermination()
    finally q.stop()
  }

  /** Streaming Count–Min sketch: maintain a running token-frequency
    * sketch over a document stream — each micro-batch's
    * [[graft.text.TextOps.cmSketch]] lands as a per-batch overwrite
    * SEGMENT (`batch-<id>`), so at-least-once foreachBatch replays
    * rewrite identical bytes (the batch sketch is a pure deterministic
    * function of the batch) instead of double-counting. The CM merge
    * property (cell-wise SUM — spec-locked in CountMinSpec) makes the
    * segment layout exactly equivalent to one sketch of the whole
    * stream; [[readCmSketchStore]] folds it at query time, and a
    * periodic compaction is the same fold written back as one segment.
    * No streaming state store: the sketch IS the state, and it lives in
    * the segment files — nothing to watermark, O(d·w) per segment
    * regardless of stream volume.
    *
    * '''Batch-order invariant''': the fold is a cell-wise SUM, so any
    * permutation of the micro-batches yields the identical merged
    * sketch — pinned against a real reversed two-batch feed in
    * StreamingSpec's order-invariance test (alongside the commutativity
    * lock in CountMinSpec).
    */
  def runStreamingCmSketch(
      stream: DataFrame,
      storePath: String,
      checkpointDir: String,
      depth: Int,
      width: Int): Unit = {
    val q = stream.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        graft.text.TextOps.cmSketch(batch, depth, width)
          .write.mode("overwrite")
          .parquet(f"$storePath/batch-$batchId%09d")
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
    try q.awaitTermination()
    finally q.stop()
  }

  /** The merged sketch of a [[runStreamingCmSketch]] store: every
    * segment's cells folded by the CM merge property (cell-wise sum).
    * Output: (row, cell, c) — the same shape as a batch
    * [[graft.text.TextOps.cmSketch]] of the entire streamed corpus, and
    * ≤ d·w rows however long the stream has run.
    */
  def readCmSketchStore(
      spark: SparkSession,
      storePath: String): DataFrame = {
    // a feed that produced ZERO micro-batches (empty source) leaves no
    // segments — the glob alone would throw path-not-found where the
    // right answer is the empty sketch (every estimate 0), same guard
    // as the dedup runner's zero-batch output read
    val p = new org.apache.hadoop.fs.Path(storePath)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val hasBatches = fs.exists(p) &&
      fs.listStatus(p).exists(_.getPath.getName.startsWith("batch-"))
    if (!hasBatches)
      spark.range(0).select(
        col("id").cast("int").as("row"), col("id").as("cell"),
        col("id").as("c"))
    else
      spark.read.parquet(s"$storePath/batch-*")
        .groupBy(col("row"), col("cell"))
        .agg(sum(col("c")).as("c"))
  }

  /** One micro-batch of [[runStreamingDedupAgainstStore]] — deterministic
    * and idempotent in (batch contents, batchId, pre-batch store state):
    * re-executing it (foreachBatch replay) overwrites both segment
    * directories with identical rows. Package-visible so the replay
    * property is testable without faking a stream failure.
    */
  private[graft] def dedupBatchAgainstStore(
      batch: DataFrame,
      batchId: Long,
      storePath: String,
      outPath: String,
      n: Int,
      numHashes: Int,
      bands: Int,
      threshold: Double): Unit = {
    import graft.dedup.Dedup
    val spark = batch.sparkSession
    val segment = f"batch-$batchId%09d"
    // resolve the store's generation ONCE per batch: segment write and
    // store read must agree on the active generation directory, and a
    // compacted store's gen-* dirs must never be mistaken for segments
    val storeBase = graft.util.GenStore.resolve(spark, storePath)
    // ONE shingle pass per micro-batch: the signature rows feed the
    // dedup (bucket join + verify keys) AND the store segment — the
    // survivors' signatures are filtered from this cache instead of
    // re-shingling the surviving text
    val sigs = graft.util.OpCaches.cache(
      Dedup.signatureRows(batch, n, numHashes, bands))
    // honor delete tombstones ([[graft.dedup.Dedup
    // .deleteFromSignatureStore]]): a taken-down doc must not keep
    // suppressing look-alikes in the stream
    val store = graft.util.Tombstones.filter(
      readStoreSegmentsExcept(spark, storeBase, segment, sigs),
      spark, storeBase, "doc_id")
    val dropped = graft.util.OpCaches.cache(
      Dedup.incrementalDroppedIds(sigs, store, threshold))
    batch.join(dropped, Seq("doc_id"), "left_anti")
      .write.mode("overwrite").parquet(s"$outPath/$segment")
    sigs.join(dropped, Seq("doc_id"), "left_anti")
      .write.mode("overwrite").parquet(s"$storeBase/$segment")
    graft.util.OpCaches.releaseAll(spark)
    ()
  }

  /** Read every signature-store file under `root` EXCEPT the segment
    * directory `exclude`: flat part-files (a [[graft.dedup.Dedup
    * .writeSignatureStore]] bootstrap) and other batches' segment dirs.
    * Missing or empty roots yield an empty frame (cold start). The read
    * uses the template's schema explicitly — no inference, so a
    * half-written (crashed, uncommitted) segment directory with no data
    * files is harmless — and prunes to the template's columns.
    */
  private def readStoreSegmentsExcept(
      spark: SparkSession,
      root: String,
      exclude: String,
      template: DataFrame): DataFrame = {
    val rootPath = new org.apache.hadoop.fs.Path(root)
    val fs = rootPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val empty = template.limit(0)
    if (!fs.exists(rootPath)) empty
    else {
      val paths = fs.listStatus(rootPath).toIndexedSeq
        .filter { st =>
          val name = st.getPath.getName
          !name.startsWith("_") && !name.startsWith(".") && name != exclude
        }
        .map(_.getPath.toString)
      if (paths.isEmpty) empty
      else spark.read.schema(template.schema).parquet(paths: _*)
        .select(template.columns.map(col).toIndexedSeq: _*)
    }
  }

  /** Shared core of the two runners: watermark both sides (required for
    * Spark to bound join state) and build the time-bounded inner join.
    */
  private def watermarkedTimeBoundJoin(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      rightKey: String,
      leftTs: String,
      rightTs: String,
      window: String,
      lateness: String): DataFrame =
    graft.joins.Joins.timeBoundJoin(
      left.withWatermark(leftTs, lateness),
      right.withWatermark(rightTs, lateness),
      leftKey, rightKey, leftTs, rightTs, window)

  /** SERVE the persisted classifier over a document STREAM — the online
    * leg of the fit-offline/score-online loop
    * ([[graft.text.TextOps.writeClassifierModel]] fits and persists; this
    * scores every arriving micro-batch under the stored model). Scoring
    * is STATELESS map-only ([[graft.text.TextOps.classifierScoreWith]]
    * works unchanged on a streaming frame): the weights are re-derived
    * from the stored integer statistics once at plan time and ride every
    * micro-batch as the same array literal — no state store, no
    * watermark, nothing to compact, so an unbounded deployment costs
    * exactly the map work of the rows that arrive. Over a bounded feed
    * (`Trigger.AvailableNow`, memory sink) the result equals the batch
    * score bit-for-bit — the `tx_classifier_fit_score` oracle applies
    * verbatim.
    */
  def runStreamingClassifierScore(
      docsStream: DataFrame,
      modelPath: String,
      sinkName: String,
      inspect: org.apache.spark.sql.streaming.StreamingQuery => Unit =
        _ => ()): DataFrame = {
    val spark = docsStream.sparkSession
    val scored =
      graft.text.TextOps.classifierScoreFromStore(docsStream, modelPath)
    spark.catalog.dropTempView(sinkName) // stale sink from a prior run
    val q = scored.writeStream
      .format("memory")
      .queryName(sinkName)
      .outputMode(OutputMode.Append())
      .trigger(Trigger.AvailableNow())
      .start()
    try { q.awaitTermination(); inspect(q) }
    finally q.stop()
    spark.table(sinkName)
  }
}
