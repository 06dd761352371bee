package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Write-once scratch materialization of small derived tables — the
  * pairGraph/madStats discipline (build a tiny shared intermediate once
  * per dataset dir per JVM, every consumer scans the parquet) factored
  * into one place, with the two lifecycle guarantees the inline
  * versions lacked (ADVICE r9):
  *
  *  - INVALIDATION: entries are keyed on (logical key, dataset-dir
  *    content fingerprint). A long-lived session that regenerates or
  *    appends the data at the same path gets a rebuild, never stale
  *    statistics. The fingerprint is a listing walk (relative path,
  *    size, mtime per file) — cheap relative to any build, and exactly
  *    the signal a lakehouse table version would provide at scale.
  *  - CLEANUP: the scratch dir is removed by a JVM shutdown hook, so
  *    repeated harness runs don't accumulate temp parquet.
  *
  * Values are identical to the inline computation by construction (the
  * build IS the derivation; parquet round-trips doubles/longs/strings
  * bit-exactly), so oracle hashes never move when a query adopts this.
  */
object Materialized {
  private case class Entry(fp: String, path: String)
  private val entries = scala.collection.mutable.Map.empty[String, Entry]
  // Build counter, exposed for the build-once specs.
  private[graft] var buildCount = 0

  private lazy val scratch: java.nio.file.Path = {
    val p = java.nio.file.Files.createTempDirectory("graft-materialized-")
    Runtime.getRuntime.addShutdownHook(new Thread(() => deleteTree(p)))
    p
  }

  private def deleteTree(p: java.nio.file.Path): Unit =
    try {
      import scala.jdk.CollectionConverters._
      val walk = java.nio.file.Files.walk(p)
      try walk.sorted(java.util.Comparator.reverseOrder())
        .iterator().asScala
        .foreach(f => try java.nio.file.Files.deleteIfExists(f)
          catch { case _: Throwable => () })
      finally walk.close()
    } catch { case _: Throwable => () }

  /** Content fingerprint of a dataset dir: every regular file's relative
    * path, size, and mtime, sorted. Missing dirs fingerprint as a
    * constant (an entry built from them stays cached until they appear).
    */
  private[graft] def fingerprint(dir: String): String = {
    import scala.jdk.CollectionConverters._
    val root = java.nio.file.Paths.get(dir)
    if (!java.nio.file.Files.exists(root)) return "absent"
    val walk = java.nio.file.Files.walk(root)
    try {
      val items = walk.iterator().asScala
        .filter(java.nio.file.Files.isRegularFile(_))
        .map { f =>
          val rel = root.relativize(f).toString
          val sz = java.nio.file.Files.size(f)
          val mt = java.nio.file.Files.getLastModifiedTime(f).toMillis
          s"$rel:$sz:$mt"
        }
        .toSeq.sorted
      java.util.UUID
        .nameUUIDFromBytes(items.mkString("\n").getBytes("UTF-8"))
        .toString
    } finally walk.close()
  }

  /** The table for (`key`, current content of `dir`): a parquet scan of
    * the scratch copy, built by `build` on first access or whenever the
    * dir's fingerprint has moved since the cached build.
    */
  def table(spark: SparkSession, key: String, dir: String)(
      build: => DataFrame): DataFrame = {
    val fp = fingerprint(dir)
    val path = synchronized {
      entries.get(key) match {
        case Some(e) if e.fp == fp => e.path
        case _ =>
          buildCount += 1
          val p = scratch.resolve(s"t$buildCount").toString
          build.coalesce(1).write.mode("overwrite").parquet(p)
          entries(key) = Entry(fp, p)
          p
      }
    }
    spark.read.parquet(path)
  }

  /** Explicit invalidation hook for embedding sessions that mutate data
    * out-of-band of the filesystem signal (e.g. object stores with
    * coarse mtimes). Cached files stay on disk until JVM exit; the next
    * access rebuilds.
    */
  def invalidateAll(): Unit = synchronized { entries.clear() }
}
