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

  /** Read `root` with schema merging and fill declared defaults:
    * a column absent from the merged schema entirely is materialized
    * from its default; a present-but-null value (a pre-evolution row)
    * is coalesced onto it. Defaults are Columns, so literals,
    * expressions over other columns, or marker values all work.
    */
  def readEvolved(spark: SparkSession, root: String,
      defaults: Map[String, Column] = Map.empty): DataFrame = {
    val merged = spark.read.option("mergeSchema", "true").parquet(root)
    defaults.foldLeft(merged) { case (df, (name, default)) =>
      if (df.columns.contains(name))
        df.withColumn(name, coalesce(col(name), default))
      else df.withColumn(name, default)
    }
  }
}
