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
  *
  * Lifetime contract: the registry holds a STRONG reference to each
  * SparkSession key until its entry is drained, so a library user who
  * allocates tracked caches MUST eventually call [[releaseAll]] for that
  * session (as Verify/Bench do per query) — a session that never does
  * pins its release thunks for the JVM lifetime. Concurrency: the
  * structures are thread-safe, and [[releaseAll]] re-drains until the
  * session's entry stays empty, so a `cache()`/`track()` racing with a
  * concurrent `releaseAll` is either released by that call or left
  * cleanly registered for the next one — never silently orphaned.
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
    * `sparkContext.getPersistentRDDs` synchronously). Loops until the
    * session's registry entry stays absent: an operator thread that
    * re-creates the queue (or appends to the removed one) mid-drain gets
    * its thunk run by THIS call instead of orphaned until session end.
    */
  def releaseAll(spark: SparkSession): Unit = {
    var drained = registry.remove(spark)
    while (drained.isDefined) {
      drained.foreach { q =>
        // poll-until-empty twice: the second pass catches a thunk that an
        // operator thread raced onto this (already removed) queue after
        // the first pass saw it empty
        var passes = 0
        while (passes < 2 || !q.isEmpty) {
          var release = q.poll()
          while (release != null) {
            release()
            release = q.poll()
          }
          passes += 1
        }
      }
      // a concurrent add() may instead have re-registered the session
      // under a fresh queue — re-check until the entry stays absent
      drained = registry.remove(spark)
    }
  }

  /** Number of tracked (not yet released) allocations — test hook. */
  def trackedCount(spark: SparkSession): Int =
    registry.get(spark).map(_.size).getOrElse(0)
}
