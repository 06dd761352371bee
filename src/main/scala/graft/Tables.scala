package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver testdata layout (`TESTDATA.md`): one parquet file
  * per table under the scale-factor dir. Column pruning + predicate pushdown
  * reach the parquet scan because these return plain file-source relations.
  */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** `events.ts` has shipped in two physical forms across driver testdata
    * generations: TIMESTAMP(NANOS), which Spark's reader rejects (read as
    * a nanos long and truncate to microseconds — the same ns->us
    * truncation DuckDB applies), and plain TIMESTAMP(MICROS) without a
    * timezone, which Spark reads as TIMESTAMP_NTZ. Normalize both to
    * TimestampType: sessions pin spark.sql.session.timeZone=UTC, so the
    * NTZ->LTZ cast is value-identity and oracle timestamps match exactly
    * either way.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
    import org.apache.spark.sql.types.{LongType, TimestampType}
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = table(spark, dir, "events")
    raw.schema("ts").dataType match {
      case LongType      => raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampType => raw
      case _             => raw.withColumn("ts", col("ts").cast(TimestampType))
    }
  }
  def lineitem(spark: SparkSession, dir: String): DataFrame   = table(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame     = table(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame   = table(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame   = table(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame       = table(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame     = table(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame     = table(spark, dir, "region")
  def documents(spark: SparkSession, dir: String): DataFrame  = table(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "embeddings")
}
