package graft.util

import java.io.IOException

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Filesystem plumbing shared by the persisted stores' offline
  * maintenance (signature store, IVF index): replace a live store
  * directory with a freshly rewritten one.
  */
object StoreFiles {

  /** Swap `tmpPath` into place at `livePath`: the current directory is
    * renamed aside, the rewrite renamed in, and the old directory
    * deleted. Two renames, not one — NOT atomic for concurrent readers;
    * run store maintenance offline (the compaction docs carry the
    * contract). On a failed second rename the previous store is
    * preserved at the `.__precompact` sibling and named in the error.
    */
  def swapInto(spark: SparkSession, livePath: String, tmpPath: String): Unit = {
    val root = new Path(livePath)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val old = new Path(s"$livePath.__precompact")
    fs.delete(old, true)
    if (!fs.rename(root, old))
      throw new IOException(s"store swap failed renaming $livePath aside")
    if (!fs.rename(new Path(tmpPath), root))
      throw new IOException(
        s"store swap failed installing $tmpPath — previous store " +
          s"preserved at $old")
    fs.delete(old, true)
    ()
  }
}
