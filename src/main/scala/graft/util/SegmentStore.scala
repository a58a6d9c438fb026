package graft.util

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** The shared read/delete/compact core of the log-structured persisted
  * stores (signature store, BM25 index, IVF cell tiers). Each store
  * composes the same four pieces — generation resolution
  * ([[GenStore]]), streaming segment subdirectories, tombstone
  * anti-joins ([[Tombstones]]), and count-sized compaction rewrites —
  * and before this object existed each reimplemented the glue. The
  * store-SPECIFIC logic (what a row means, multi-subtable layouts like
  * BM25's postings/terms/stats, partition-pruned query paths) stays in
  * the stores; only the storage mechanics live here.
  *
  * Snapshot-style model stores (TF-IDF df counts, LM bigram counts,
  * classifier sufficient statistics) are DELIBERATELY not clients:
  * they are rebuild-only by contract (overwrite parquet, no appends, no
  * deletes), so generations/tombstones would be dead machinery there.
  */
object SegmentStore {

  /** ⌈total / targetFileRows⌉ clamped to Int — the standard sizing for
    * compaction rewrites (one task per ~targetFileRows rows).
    */
  def fileCount(total: Long, targetFileRows: Long): Int = {
    require(targetFileRows > 0, "targetFileRows must be positive")
    math.max(1L, (total + targetFileRows - 1) / targetFileRows)
      .min(Int.MaxValue.toLong).toInt
  }

  /** Whether the directory carries streaming segment subdirectories
    * (per-batch appends) — one listing call; `k=v` partition directories
    * and `_`/`.`-hidden entries don't count.
    */
  def hasSegmentDirs(spark: SparkSession, dir: String): Boolean = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.exists(p) && fs.listStatus(p).exists(st =>
      st.isDirectory && {
        val n = st.getPath.getName
        !n.startsWith("_") && !n.startsWith(".") && !n.contains("=")
      })
  }

  /** Read a store's active generation with per-batch segment
    * subdirectories folded in (`recursiveFileLookup` — no partition
    * inference) and the generation's tombstones anti-joined on `idCol`
    * (zero plan change when no delete has landed). The read for stores
    * whose layout is always flat part-files + optional segment dirs
    * (signature store).
    */
  def read(spark: SparkSession, store: String, idCol: String): DataFrame = {
    val base = GenStore.resolve(spark, store)
    Tombstones.filter(
      spark.read.option("recursiveFileLookup", "true").parquet(base),
      spark, base, idCol)
  }

  /** Whether the directory carries `k=v` partition subdirectories —
    * one listing call, the dual of [[hasSegmentDirs]].
    */
  def hasPartitionDirs(spark: SparkSession, dir: String): Boolean = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.exists(p) && fs.listStatus(p).exists(st =>
      st.isDirectory && st.getPath.getName.contains("="))
  }

  /** [[read]] for stores that may use a `k=v`-PARTITIONED layout:
    * `recursiveFileLookup` disables partition inference (it would drop
    * the partition column), so it is applied only when segment
    * subdirectories actually exist — the plain layouts pay one listing
    * call and keep their pruning (the IVF tier read).
    *
    * MIXED layouts (partition dirs AND segment subdirs in one
    * generation) are REJECTED: neither read mode is correct there —
    * recursive lookup silently drops the partition column, plain read
    * silently drops the segments. No writer in this repo produces the
    * mix (partitioned stores append partitioned data; segment appends
    * go to flat stores), so hitting this is a store-corruption signal,
    * and the fix is compacting the segments into the partitioned
    * layout before reading.
    */
  def readPartitionAware(
      spark: SparkSession, store: String, idCol: String): DataFrame = {
    val base = GenStore.resolve(spark, store)
    val df =
      if (hasSegmentDirs(spark, base)) {
        require(!hasPartitionDirs(spark, base),
          s"mixed store layout at $base: both k=v partition directories " +
            "and streaming segment subdirectories are present — " +
            "recursiveFileLookup would silently drop the partition " +
            "column; compact the segments into the partitioned layout " +
            "before reading")
        spark.read.option("recursiveFileLookup", "true").parquet(base)
      } else spark.read.parquet(base)
    Tombstones.filter(df, spark, base, idCol)
  }

  /** The DELETE leg shared by every store: the batch's ids land as a
    * tombstone segment inside the ACTIVE generation — O(batch) where a
    * physical rewrite is O(store). Idempotent; single-writer vs
    * compaction, as with appends.
    */
  def delete(spark: SparkSession, store: String, ids: DataFrame): Unit =
    Tombstones.write(ids, GenStore.resolve(spark, store))

  /** Count-sized FLAT compaction: rewrite `rows` (a [[read]]-shaped
    * frame, so tombstones and segments are already folded) into
    * ⌈rows / targetFileRows⌉ files in a new generation and atomically
    * repoint the manifest ([[GenStore.compactInto]]). `coalesce` — a
    * file-merge read, no shuffle. Stores with partitioned layouts keep
    * their own rewrite inside `compactInto`.
    */
  def compactFlat(
      spark: SparkSession,
      store: String,
      rows: DataFrame,
      targetFileRows: Long): Unit = {
    val nFiles = fileCount(rows.count(), targetFileRows)
    GenStore.compactInto(spark, store) { genDir =>
      rows.coalesce(nFiles).write.mode("overwrite").parquet(genDir)
    }
  }
}
