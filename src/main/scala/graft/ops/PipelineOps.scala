package graft.ops

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Composite training-data pipeline operators: quality-filter -> dedup ->
  * per-source stats (the classic corpus-cleaning chain), and
  * deterministic hash-based train/val/test splitting. Everything is one
  * declarative plan per query — filters reach the scan, the dedup is a
  * single hash shuffle, stats piggyback on the dedup partitioning.
  */
object PipelineOps {

  /** Quality score: the t03 formula (length/alpha/stopword ratios). */
  private def qualityScore: Column = {
    val t = split(col("text"), " ")
    val nTok = size(t)
    val nChars = length(col("text"))
    val alphaChars = length(regexp_replace(col("text"), "[^A-Za-z]", ""))
    val stop = size(filter(t, x =>
      x.isin(Seq("the", "a", "of", "and", "is", "to", "in").map(lit(_)): _*)))
    val stopRatio = stop.cast("double") / nTok
    val alphaRatio = alphaChars.cast("double") / nChars
    val lenScore = least(nTok.cast("double") / lit(100.0), lit(1.0))
    lenScore * 0.4 + alphaRatio * 0.3 + stopRatio * 0.3
  }

  private val qualitySql =
    """least(CAST(len(string_split(text, ' ')) AS DOUBLE) / 100.0, 1.0) * 0.4
      | + (CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS DOUBLE)
      |    / length(text)) * 0.3
      | + (CAST(len(list_filter(string_split(text, ' '),
      |      x -> x IN ('the','a','of','and','is','to','in'))) AS DOUBLE)
      |    / len(string_split(text, ' '))) * 0.3""".stripMargin
      .replace("\n", " ")

  /** Corpus cleaning: quality gate -> exact dedup (keep lowest doc_id per
    * content hash) -> per-source stats over the survivors.
    */
  def p01CorpusClean(spark: SparkSession, dir: String): DataFrame = {
    val scored = Tables.documents(spark, dir)
      .withColumn("q", qualityScore)
      .filter(col("q") >= 0.55 && size(split(col("text"), " ")) >= 30)
    val kept = scored
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(md5(col("text"))).orderBy(col("doc_id"))))
      .filter(col("rn") === 1)
    kept.groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("q").cast(DecimalType(28, 12))).cast("double")
          .as("sum_quality"),
        sum(size(split(col("text"), " ")).cast("long")).cast("long")
          .as("total_tokens"))
      .withColumn("avg_quality", col("sum_quality") / col("n_docs"))
      .select("source", "n_docs", "total_tokens", "sum_quality", "avg_quality")
      .orderBy("source")
  }

  /** Deterministic train/val/test assignment: bucket 0-7 train, 8 val,
    * 9 test, from a salted md5 of the doc id — stable across engines,
    * re-runs, and partitionings (never `rand()`).
    */
  def p02HashSplit(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .withColumn("bucket",
        expr("CAST(conv(substring(md5(concat('split:', CAST(doc_id AS STRING))), 1, 8), 16, 10) AS BIGINT) % 10"))
      .withColumn("split",
        when(col("bucket") < 8, "train")
          .when(col("bucket") === 8, "val")
          .otherwise("test"))
      .select("doc_id", "bucket", "split")
      .orderBy("doc_id")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "p01_corpus_clean" -> (p01CorpusClean _),
    "p02_hash_split" -> (p02HashSplit _)
  )

  val oracle: Map[String, String] = Map(
    "p01_corpus_clean" ->
      s"""WITH scored AS (
         |  SELECT *, $qualitySql AS q FROM documents
         |  WHERE $qualitySql >= 0.55 AND len(string_split(text, ' ')) >= 30
         |),
         |kept AS (
         |  SELECT * FROM (
         |    SELECT *, row_number() OVER (PARTITION BY md5(text)
         |      ORDER BY doc_id) AS rn FROM scored) WHERE rn = 1
         |)
         |SELECT source, count(*) AS n_docs,
         |       CAST(SUM(CAST(len(string_split(text, ' ')) AS BIGINT))
         |         AS BIGINT) AS total_tokens,
         |       CAST(SUM(CAST(q AS DECIMAL(28,12))) AS DOUBLE) AS sum_quality,
         |       CAST(SUM(CAST(q AS DECIMAL(28,12))) AS DOUBLE) / count(*)
         |         AS avg_quality
         |FROM kept GROUP BY source ORDER BY source""".stripMargin,

    "p02_hash_split" ->
      """SELECT doc_id,
        |  CAST('0x' || substring(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 8)
        |    AS BIGINT) % 10 AS bucket,
        |  CASE WHEN CAST('0x' || substring(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 8)
        |         AS BIGINT) % 10 < 8 THEN 'train'
        |       WHEN CAST('0x' || substring(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 8)
        |         AS BIGINT) % 10 = 8 THEN 'val'
        |       ELSE 'test' END AS split
        |FROM documents ORDER BY doc_id""".stripMargin
  )
}
