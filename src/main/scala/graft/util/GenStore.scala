package graft.util

import java.io.IOException
import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.{FileContext, Options, Path}
import org.apache.spark.sql.SparkSession

/** Generation-manifest layout for the persisted stores (signature
  * store, BM25 index, IVF cells) — the piece that makes store
  * COMPACTION atomic for concurrent readers.
  *
  * Layout: a store directory optionally carries a one-line manifest
  * file (`_graft_manifest`) naming the ACTIVE generation subdirectory
  * (`gen-000000042`). Readers and appenders resolve the manifest and
  * work inside the named generation; a store without a manifest is the
  * legacy flat layout (data directly under the root) and resolves to
  * the root itself, so every store written before this layer existed
  * keeps working unchanged.
  *
  * Compaction writes a brand-new generation directory next to the live
  * one, then repoints the manifest in ONE filesystem rename of a
  * single small file ([[commit]] writes `_graft_manifest.tmp` and
  * renames it over the manifest with `Options.Rename.OVERWRITE` —
  * atomic on POSIX and HDFS; on eventual-consistency object stores the
  * manifest is one object PUT, the smallest swap window the store
  * admits). A reader that resolved the manifest BEFORE the swap keeps
  * reading the previous generation's files, which [[vacuum]]
  * deliberately leaves in place for one full compaction cycle: each
  * compaction keeps {new generation, previous generation} and deletes
  * only generations superseded TWICE (and, once the previous
  * generation is itself a `gen-` directory, any legacy flat files).
  * Mid-query readers therefore always see a complete, immutable file
  * set — the "run OFFLINE" contract the r10 compactors carried is gone
  * for readers.
  *
  * What stays single-writer: appends/streaming segments vs compaction.
  * An append that lands in the old generation AFTER compaction has
  * read it would be silently dropped from the new generation, so store
  * WRITERS (append, compact) still must not overlap — the standard
  * log-structured-store discipline; the atomicity this layer buys is
  * for the unbounded population of readers, which is what a 100 TB
  * store serving daily queries actually needs.
  */
object GenStore {

  private val ManifestName = "_graft_manifest"
  private val GenPrefix = "gen-"

  private def fsOf(spark: SparkSession, p: Path) =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** The active generation's subdirectory name, if `store` has a
    * manifest; None for legacy flat stores and not-yet-created paths.
    */
  def currentGen(spark: SparkSession, store: String): Option[String] = {
    val mp = new Path(store, ManifestName)
    val fs = fsOf(spark, mp)
    if (!fs.exists(mp)) None
    else {
      val in = fs.open(mp)
      try {
        val bytes = org.apache.commons.io.IOUtils.toByteArray(in)
        val name = new String(bytes, StandardCharsets.UTF_8).trim
        require(name.startsWith(GenPrefix) && !name.contains("/"),
          s"corrupt store manifest at $mp: '$name'")
        Some(name)
      } finally in.close()
    }
  }

  /** The path readers and appenders should use: `store/gen-N` when a
    * manifest exists, else `store` itself (legacy flat layout).
    */
  def resolve(spark: SparkSession, store: String): String =
    currentGen(spark, store).map(g => s"$store/$g").getOrElse(store)

  /** The name for the next generation: one past the highest existing
    * `gen-` directory (0 when none exist).
    */
  def nextGen(spark: SparkSession, store: String): String = {
    val root = new Path(store)
    val fs = fsOf(spark, root)
    val maxExisting =
      if (!fs.exists(root)) -1L
      else
        fs.listStatus(root).toSeq
          .map(_.getPath.getName)
          .filter(_.startsWith(GenPrefix))
          .flatMap(n => scala.util.Try(n.drop(GenPrefix.length).toLong).toOption)
          .foldLeft(-1L)(math.max)
    f"$GenPrefix${maxExisting + 1}%09d"
  }

  /** Atomically repoint the manifest at `gen`: write a temp sibling,
    * fsync-close it, rename it over the manifest with OVERWRITE — one
    * metadata operation, so a concurrent [[resolve]] sees either the
    * old pointer or the new one, never a torn or missing manifest.
    */
  def commit(spark: SparkSession, store: String, gen: String): Unit = {
    require(gen.startsWith(GenPrefix), s"not a generation name: $gen")
    val mp = new Path(store, ManifestName)
    val tmp = new Path(store, s"$ManifestName.tmp")
    val fs = fsOf(spark, mp)
    val out = fs.create(tmp, true)
    try {
      out.write(gen.getBytes(StandardCharsets.UTF_8))
      out.hflush()
    } finally out.close()
    val fc = FileContext.getFileContext(
      mp.toUri, spark.sparkContext.hadoopConfiguration)
    try fc.rename(tmp, mp, Options.Rename.OVERWRITE)
    catch {
      case e: IOException =>
        throw new IOException(
          s"store manifest swap failed for $store -> $gen; live pointer " +
            "unchanged", e)
    }
  }

  /** Delete superseded store content: every `gen-` directory not in
    * `keep`, plus — when `dropLegacy` — any legacy flat files/dirs at
    * the root (everything that is neither a generation nor the
    * manifest). Compactors pass `keep = {new, previous}` and
    * `dropLegacy = previous-is-a-generation`, which gives in-flight
    * readers of the previous state a full compaction cycle of grace.
    */
  def vacuum(
      spark: SparkSession,
      store: String,
      keep: Set[String],
      dropLegacy: Boolean): Unit = {
    val root = new Path(store)
    val fs = fsOf(spark, root)
    if (fs.exists(root)) {
      fs.listStatus(root).foreach { st =>
        val name = st.getPath.getName
        val isManifest = name == ManifestName || name == s"$ManifestName.tmp"
        val isGen = name.startsWith(GenPrefix)
        if (!isManifest && ((isGen && !keep(name)) || (!isGen && dropLegacy)))
          fs.delete(st.getPath, true)
      }
    }
  }

  /** The compactor's whole atomic-swap dance: pick the next generation
    * name, let `write` materialize the compacted store into it, commit
    * the manifest pointer, vacuum everything older than the previous
    * state. `write` receives the absolute generation directory.
    */
  def compactInto(spark: SparkSession, store: String)(
      write: String => Unit): Unit = {
    val prev = currentGen(spark, store)
    val gen = nextGen(spark, store)
    write(s"$store/$gen")
    commit(spark, store, gen)
    vacuum(spark, store, keep = Set(gen) ++ prev, dropLegacy = prev.isDefined)
  }

  /** Clear a store path entirely (full-rebuild writers call this so an
    * `overwrite` rebuild of a generation-carrying store cannot leave a
    * stale manifest pointing past the rebuild).
    */
  def reset(spark: SparkSession, store: String): Unit = {
    val root = new Path(store)
    val fs = fsOf(spark, root)
    fs.delete(root, true)
    ()
  }
}
