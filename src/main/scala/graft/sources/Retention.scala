package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** Object-store retention maintenance (SURVEY.md §2.1 S13): delete data
  * files under a prefix older than a cutoff, reporting count and bytes —
  * the reference's 72h bronze retention policy
  * (`/root/reference/src/assets/maintenance.py:11-62`) as a Hadoop-FS
  * utility (works on s3a:// and local paths alike). Not a query operator;
  * exposed as a maintenance job.
  */
object Retention {

  case class Report(deletedCount: Long, deletedBytes: Long)

  /** Delete DATA files under `prefix` with modification time strictly
    * older than `cutoffMillis`. Directories are left in place (harmless
    * empty shells, mirroring object-store prefix semantics).
    *
    * Safety rails for a destructive maintenance job:
    *   - bookkeeping files ('_'/'.'-prefixed anywhere on the path:
    *     _SUCCESS markers, streaming checkpoint metadata, hidden temp
    *     dirs) are never touched — same convention Lakehouse compaction
    *     uses;
    *   - `dryRun = true` returns the would-delete report (count + bytes)
    *     without deleting anything — run it first when pointing at a new
    *     prefix.
    */
  def deleteOlderThan(
      spark: SparkSession,
      prefix: String,
      cutoffMillis: Long,
      dryRun: Boolean = false): Report = {
    val path = new Path(prefix)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(path)) return Report(0L, 0L)
    val root = fs.makeQualified(path)
    // '_'/'.'-prefixed segment anywhere below the prefix => bookkeeping
    def isBookkeeping(p: Path): Boolean = {
      var cur = p
      while (cur != null && cur != root) {
        val n = cur.getName
        if (n.startsWith("_") || n.startsWith(".")) return true
        cur = cur.getParent
      }
      false
    }
    var count = 0L
    var bytes = 0L
    val it = fs.listFiles(path, true)
    while (it.hasNext) {
      val f = it.next()
      if (f.isFile && f.getModificationTime < cutoffMillis &&
        !isBookkeeping(f.getPath)) {
        val len = f.getLen
        if (dryRun || fs.delete(f.getPath, false)) {
          count += 1
          bytes += len
        }
      }
    }
    Report(count, bytes)
  }
}
