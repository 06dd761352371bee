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

  /** Delete files under `prefix` with modification time strictly older
    * than `cutoffMillis`. Directories are left in place (harmless empty
    * shells, mirroring object-store prefix semantics).
    */
  def deleteOlderThan(
      spark: SparkSession,
      prefix: String,
      cutoffMillis: Long): Report = {
    val path = new Path(prefix)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(path)) return Report(0L, 0L)
    var count = 0L
    var bytes = 0L
    val it = fs.listFiles(path, true)
    while (it.hasNext) {
      val f = it.next()
      if (f.isFile && f.getModificationTime < cutoffMillis) {
        val len = f.getLen
        if (fs.delete(f.getPath, false)) {
          count += 1
          bytes += len
        }
      }
    }
    Report(count, bytes)
  }
}
