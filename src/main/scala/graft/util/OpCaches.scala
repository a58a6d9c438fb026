package graft.util

import java.util.concurrent.ConcurrentLinkedQueue

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.storage.StorageLevel

/** Session-scoped registry for the intermediates the self-join operators
  * persist internally (shingle indexes, LSH buckets, SimHash blocks,
  * signature frames, range-partitioned splits).
  *
  * Those operators return LAZY DataFrames, so they cannot unpersist their
  * shared sub-plans before the caller materializes the result — the
  * try/finally pattern of [[graft.kmeans.Lloyd.fit]] only works for eager
  * operators. Instead every internal persist is tracked here, and
  * [[releaseAll]] unpersists the lot in one deterministic call: harnesses
  * (Verify, Bench) call it between queries, and long-lived sessions call
  * it between pipelines instead of leaking cache until LRU eviction.
  *
  * Release AFTER materializing the operator's result (the harness
  * pattern). For the pure-reuse caches an early release merely loses
  * reuse — the intermediate recomputes; but `Ops.splitContiguous`'s cache
  * also PINS the sampled range partitioning its collected offsets were
  * computed from, so releasing it before the result materializes could
  * recompute different partition bounds and mis-rank rows.
  */
object OpCaches {

  private val registry =
    TrieMap.empty[SparkSession, ConcurrentLinkedQueue[DataFrame]]

  /** Persist `df` (MEMORY_AND_DISK) and track it for [[releaseAll]]. */
  def cache(df: DataFrame): DataFrame = {
    val persisted = df.persist(StorageLevel.MEMORY_AND_DISK)
    registry
      .getOrElseUpdate(df.sparkSession, new ConcurrentLinkedQueue[DataFrame]())
      .add(persisted)
    persisted
  }

  /** Unpersist every operator cache registered against `spark` (idempotent;
    * non-blocking block removal, but the RDDs leave
    * `sparkContext.getPersistentRDDs` synchronously).
    */
  def releaseAll(spark: SparkSession): Unit =
    registry.remove(spark).foreach { q =>
      var df = q.poll()
      while (df != null) {
        df.unpersist(blocking = false)
        df = q.poll()
      }
    }

  /** Number of tracked (not yet released) caches — test hook. */
  def trackedCount(spark: SparkSession): Int =
    registry.get(spark).map(_.size).getOrElse(0)
}
