package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Schema-evolution-safe reads over a multi-batch parquet dataset whose
  * schema grew across writes (the additive-columns case every
  * long-lived lakehouse table hits: a crawler starts emitting a new
  * quality field, old partitions predate it).
  *
  * Spark's parquet reader takes the schema of ONE footer unless
  * `mergeSchema` is on — so a plain read returns whichever vintage it
  * sampled and silently DROPS newer columns for mixed paths. This
  * helper always merges, then applies caller-declared defaults so rows
  * from pre-evolution batches carry a value instead of NULL and
  * downstream code never branches on batch vintage.
  *
  * Deliberate non-goals (spec-pinned): TYPE changes are not patched —
  * parquet footers with conflicting types for one column fail the
  * merged read loudly, and that is the correct behavior (a silent cast
  * hides data corruption; an engine that needs int->long widening
  * migrates the files, not the reader). Column RENAMES are two
  * evolution events (add + deprecate), not a reader concern.
  *
  * 100 TB posture: mergeSchema unions footers at planning time (driver
  * metadata work, one footer per file — partition-count-sized, not
  * data-sized); the default fill is pure map work fused into the scan
  * projection, and column pruning still reaches the files (a query not
  * touching the evolved column never pays for it).
  */
object SchemaEvolution {

  /** Read `root` with schema merging and fill declared defaults — but
    * only for rows whose SOURCE FILE predates the column (its footer
    * lacks the field). A genuine NULL written after evolution is data
    * and stays NULL (ADVICE r7: the old blanket `coalesce` rewrote
    * those too). Batch vintage is consulted per file footer: files are
    * grouped by their footer's field-name set, each vintage group is
    * scanned as plain parquet (pushdown + pruning intact per branch),
    * missing columns are materialized from their defaults, and the
    * groups are unioned by name. Defaults are Columns, so literals,
    * expressions over other columns, or marker values all work.
    *
    * The footer sweep is driver metadata work, one footer per file —
    * the same cost class `mergeSchema` itself pays at planning time.
    */
  def readEvolved(spark: SparkSession, root: String,
      defaults: Map[String, Column] = Map.empty): DataFrame = {
    if (defaults.isEmpty)
      return spark.read.option("mergeSchema", "true").parquet(root)
    val hadoopConf = spark.sessionState.newHadoopConf()
    val rootPath = new org.apache.hadoop.fs.Path(root)
    val fs = rootPath.getFileSystem(hadoopConf)
    val files = scala.collection.mutable.ArrayBuffer.empty[String]
    val it = fs.listFiles(rootPath, true)
    while (it.hasNext) {
      val f = it.next()
      val n = f.getPath.getName
      if (n.endsWith(".parquet") && !n.startsWith("_") && !n.startsWith("."))
        files += f.getPath.toString
    }
    require(files.nonEmpty,
      s"readEvolved: no parquet files under $root")
    // Vintage = the footer's field-name set, read via ParquetFileReader
    // (footer metadata only — NOT a per-file spark.read, which pays
    // full reader resolution per file)
    val groups = files.toSeq.groupBy { f =>
      val in = org.apache.parquet.hadoop.util.HadoopInputFile
        .fromPath(new org.apache.hadoop.fs.Path(f), hadoopConf)
      val reader = org.apache.parquet.hadoop.ParquetFileReader.open(in)
      try {
        import scala.jdk.CollectionConverters._
        reader.getFileMetaData.getSchema.getFields.asScala
          .map(_.getName).toSet
      } finally reader.close()
    }
    val parts = groups.toSeq.map { case (_, paths) =>
      // basePath anchors Hive-style partition-directory discovery so
      // path columns (day=..., lang=...) survive the per-group file
      // listing exactly as the plain root read would surface them;
      // mergeSchema within the (same-name-set) group keeps the type-
      // conflict check loud
      val df = spark.read
        .option("basePath", root)
        .option("mergeSchema", "true")
        .parquet(paths: _*)
      // fill decisions consult the ACTUAL frame columns (footer fields
      // + partition-path columns), so a partition column never gets
      // clobbered by a same-named default
      val present = df.columns.toSet
      defaults.foldLeft(df) { case (d, (name, default)) =>
        if (present.contains(name)) d else d.withColumn(name, default)
      }
    }
    // unionByName fails loudly on cross-vintage type conflicts — the
    // same deliberate non-goal the merged read enforced
    parts.reduce(_.unionByName(_, allowMissingColumns = true))
  }
}
