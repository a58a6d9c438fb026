package graft.util

import java.util.concurrent.ConcurrentLinkedQueue

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.storage.StorageLevel

/** Session-scoped registry for the storage the operators allocate
  * internally: persisted intermediates (shingle indexes, LSH buckets,
  * SimHash blocks, signature frames, range-partitioned splits) and the
  * final localCheckpoint round of iterative operators (`Dedup.dupGroups`).
  *
  * Those operators return LAZY DataFrames, so they cannot release their
  * shared sub-plans before the caller materializes the result — the
  * try/finally pattern of [[graft.kmeans.Lloyd.fit]] only works for eager
  * operators. Instead every allocation registers a release thunk here,
  * and [[releaseAll]] runs the lot in one deterministic call: harnesses
  * (Verify, Bench) call it between queries, and long-lived sessions call
  * it between pipelines instead of leaking storage until LRU eviction /
  * the async ContextCleaner. Checkpoint blocks in particular are
  * invisible to `spark.catalog.clearCache()` (they never enter the
  * CacheManager), so this registry is their only deterministic release.
  *
  * Release AFTER materializing the operator's result (the harness
  * pattern). For pure-reuse caches an early release merely loses reuse —
  * the intermediate recomputes; but `Ops.splitContiguous`'s cache PINS
  * the sampled range partitioning its collected offsets were computed
  * from, and a released checkpoint is unrecomputable, so an early
  * release of those can fail or mis-rank a not-yet-materialized result.
  */
object OpCaches {

  private val registry =
    TrieMap.empty[SparkSession, ConcurrentLinkedQueue[() => Unit]]

  private def add(spark: SparkSession, release: () => Unit): Unit =
    registry
      .getOrElseUpdate(spark, new ConcurrentLinkedQueue[() => Unit]())
      .add(release)

  /** Persist `df` (MEMORY_AND_DISK) and track it for [[releaseAll]]. */
  def cache(df: DataFrame): DataFrame = {
    val persisted = df.persist(StorageLevel.MEMORY_AND_DISK)
    add(df.sparkSession, () => persisted.unpersist(blocking = false))
    persisted
  }

  /** Track an arbitrary release action (e.g. dropping an operator's final
    * localCheckpoint blocks, which `Dataset.unpersist` cannot reach).
    * Must be idempotent and safe after the owning job finished.
    */
  def track(spark: SparkSession, release: () => Unit): Unit =
    add(spark, release)

  /** Run every release registered against `spark` (idempotent;
    * non-blocking block removal, but persisted RDDs leave
    * `sparkContext.getPersistentRDDs` synchronously).
    */
  def releaseAll(spark: SparkSession): Unit =
    registry.remove(spark).foreach { q =>
      var release = q.poll()
      while (release != null) {
        release()
        release = q.poll()
      }
    }

  /** Number of tracked (not yet released) allocations — test hook. */
  def trackedCount(spark: SparkSession): Int =
    registry.get(spark).map(_.size).getOrElse(0)
}
