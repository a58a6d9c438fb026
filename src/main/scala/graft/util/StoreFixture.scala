package graft.util

import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** Marker-guarded PRISTINE store fixtures for the serve-shaped bench
  * keys (`tx_bm25_append_serve` / `tx_bm25_delete_serve`): the
  * ≡-rebuild gate keys rebuild their store from scratch on every call
  * — correct for the correctness harness, but a bench row built that
  * way times the O(corpus) base build, not the O(batch) append/delete
  * it claims to measure (the round-12 `a5_percentiles_sketch` split,
  * applied to the store CRUD). This helper pays the base build ONCE
  * and restores the store to its pristine base state before each
  * mutating call:
  *
  *  - [[ensurePristine]] builds the store iff the marker is absent or
  *    its recorded input FINGERPRINT differs (so a regenerated
  *    `target/scale10` under the same path invalidates correctly),
  *    then records the pristine file listing in the marker.
  *  - On every later call it deletes every file NOT in that listing —
  *    O(mutation files), since only the previous call's append/delete
  *    segments are newer — and prunes emptied directories (an empty
  *    `_tombstones/` dir would otherwise break the parquet read that
  *    probes it by existence).
  *
  * The marker lives at `store/_graft_pristine`: the underscore prefix
  * keeps it invisible to data reads, like `_graft_manifest`. Parquet
  * part files carry per-job UUIDs, so a mutation can never overwrite a
  * pristine file in place — deletion-by-listing restores exactly.
  * Single-writer, like the stores themselves.
  */
object StoreFixture {

  private val MarkerName = "_graft_pristine"

  /** Marker format version, first line of the marker file: v2 markers
    * record PROPERLY-RELATIVIZED listings (qualified-root stripping). A
    * marker without this header predates the fix — its listing may hold
    * unstripped absolute paths that would mark every pristine file
    * foreign — so it is treated as a fingerprint mismatch (full
    * rebuild), never trusted for a restore.
    */
  private val MarkerVersion = "graft-pristine-v2"

  private def fsOf(spark: SparkSession, p: Path): FileSystem =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Fingerprint of an input directory: one line of
    * `name:length:mtime` per file (sorted) — catches both data edits
    * and in-place regeneration of a same-named dir.
    */
  def fingerprint(spark: SparkSession, dir: String): String = {
    val p = new Path(dir)
    val fs = fsOf(spark, p)
    if (!fs.exists(p)) s"absent:$dir"
    else
      listFiles(fs, p)
        .map(st => s"${st.getPath.getName}:${st.getLen}:${st.getModificationTime}")
        .sorted
        .mkString("|")
  }

  private def listFiles(fs: FileSystem, root: Path) = {
    val it = fs.listFiles(root, true)
    val b = Seq.newBuilder[org.apache.hadoop.fs.LocatedFileStatus]
    while (it.hasNext) b += it.next()
    b.result()
  }

  /** Run `build` into `store` unless a pristine build for `fp` already
    * exists there; either way, leave `store` in the pristine post-build
    * state (files added since the pristine listing are deleted).
    */
  def ensurePristine(spark: SparkSession, store: String, fp: String)(
      build: => Unit): Unit = {
    val rawRoot = new Path(store)
    val fs = fsOf(spark, rawRoot)
    // Qualify BEFORE relativizing: listFiles returns fully-qualified
    // absolute paths, so a relative `store` (the serve keys pass
    // `target/graft_stores/...`) would otherwise never strip and the
    // restore pass would treat every pristine file — marker included —
    // as foreign and delete it, silently degrading every call after
    // the first back to a full O(corpus) rebuild.
    val root = fs.makeQualified(rawRoot)
    val marker = new Path(root, MarkerName)
    val recorded: Option[Seq[String]] =
      if (!fs.exists(marker)) None
      else {
        val in = fs.open(marker)
        val lines =
          try new String(
            org.apache.commons.io.IOUtils.toByteArray(in),
            StandardCharsets.UTF_8).linesIterator.toSeq
          finally in.close()
        if (lines.headOption.contains(MarkerVersion) &&
          lines.drop(1).headOption.contains(fp)) Some(lines.drop(2))
        else None
      }
    recorded match {
      case Some(keepRel) =>
        val keep = keepRel.toSet
        val rootUri = root.toUri.getPath
        def rel(p: Path): String =
          p.toUri.getPath.stripPrefix(rootUri).stripPrefix("/")
        listFiles(fs, root).foreach { st =>
          val r = rel(st.getPath)
          // Belt-and-braces marker guard by NAME, not relativized path:
          // the marker must survive any relativization surprise or the
          // fixture degrades to rebuild-every-call.
          if (st.getPath.getName != MarkerName && !keep(r))
            fs.delete(st.getPath, false)
        }
        pruneEmptyDirs(fs, root)
      case None =>
        fs.delete(root, true)
        build
        val rootUri = root.toUri.getPath
        val listing = listFiles(fs, root)
          .map(_.getPath.toUri.getPath.stripPrefix(rootUri).stripPrefix("/"))
          .filter(_ != MarkerName)
          .sorted
        val out = fs.create(marker, true)
        try out.write((MarkerVersion +: fp +: listing)
          .mkString("\n").getBytes(StandardCharsets.UTF_8))
        finally out.close()
    }
  }

  /** Delete directories left with no children (bottom-up; never the
    * root): a restored store must not keep an empty segment dir a
    * reader probes by existence.
    */
  private def pruneEmptyDirs(fs: FileSystem, root: Path): Unit = {
    def walk(p: Path): Boolean = { // returns "now empty and deleted"
      val children = fs.listStatus(p)
      val remaining = children.filterNot { st =>
        st.isDirectory && walk(st.getPath)
      }
      if (remaining.isEmpty && p != root) { fs.delete(p, false); true }
      else false
    }
    if (fs.exists(root)) { walk(root); () }
  }
}
