package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Plain-parquet lakehouse maintenance primitives (no table format in the
  * reference — SURVEY.md §1.1): partition-scoped upsert and small-file
  * compaction. With Delta/Iceberg these become MERGE/OPTIMIZE; on plain
  * parquet directories they are dynamic partition overwrite and a
  * partition rewrite — both safe to run while readers use other
  * partitions.
  */
object Lakehouse {

  /** Overwrite ONLY the date partitions present in `updates`, leaving all
    * other partitions untouched (dynamic partition overwrite — the
    * idiomatic incremental backfill for a date-partitioned fact table;
    * static overwrite mode would drop the whole table).
    */
  def upsertPartitions(updates: DataFrame, path: String,
      partitionCol: String = "date"): Unit = {
    val spark = updates.sparkSession
    val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try updates.write
      .mode("overwrite")
      .partitionBy(partitionCol)
      .parquet(path)
    finally prev match {
      case Some(v) => spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
      case None => spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
    }
  }

  /** Rewrite one partition directory into `targetFiles` files (small-file
    * compaction after many incremental appends). Returns (filesBefore,
    * filesAfter).
    */
  def compactPartition(
      spark: SparkSession,
      tableRoot: String,
      partitionDir: String,
      targetFiles: Int = 1): (Int, Int) = {
    val dir = new Path(s"$tableRoot/$partitionDir")
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def dataFiles(): Int =
      fs.listStatus(dir).count(s => s.isFile &&
        !s.getPath.getName.startsWith("_") && !s.getPath.getName.startsWith("."))
    val before = dataFiles()
    val tmp = new Path(s"$tableRoot/.compact_tmp_${partitionDir.replace('=', '_').replace('/', '_')}")
    spark.read.parquet(dir.toString)
      .coalesce(targetFiles)
      .write.mode("overwrite").parquet(tmp.toString)
    // Crash-safe swap order: move the compacted files IN first, delete the
    // originals after. Spark part-file names carry a fresh UUID, so the
    // new names never collide with the originals; a crash between the two
    // loops leaves duplicate data (repairable) rather than an empty
    // partition (data loss). Originals are recorded before the move so
    // the delete loop can't touch the files just moved in.
    val originals = fs.listStatus(dir).filter(s => s.isFile &&
      !s.getPath.getName.startsWith("_") && !s.getPath.getName.startsWith("."))
      .map(_.getPath)
    val compacted = fs.listStatus(tmp).filter(s => s.isFile &&
      !s.getPath.getName.startsWith("_") && !s.getPath.getName.startsWith("."))
      .map(_.getPath)
    require(compacted.nonEmpty,
      s"compaction of $dir produced no data files in $tmp — aborting swap")
    // HDFS-style rename signals failure by RETURNING false, not throwing
    // — a silently failed move here followed by the delete loop would be
    // data loss, so every rename must be checked before any delete runs.
    compacted.foreach { p =>
      require(fs.rename(p, new Path(dir, p.getName)),
        s"rename $p -> $dir failed — aborting swap before any delete")
    }
    originals.foreach(p => fs.delete(p, false))
    fs.delete(tmp, true)
    (before, dataFiles())
  }
}
