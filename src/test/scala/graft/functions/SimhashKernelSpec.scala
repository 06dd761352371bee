package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** graft_simhash must be bit-identical to the declarative chain it
  * fused (the form the DuckDB oracle still states): per-token md5 hex
  * digests, 16 per-position nibble-sum majority votes, split(' ')
  * multiset semantics with every empty token kept.
  */
class SimhashKernelSpec extends SparkTestBase {
  import spark.implicits._

  private def sqlChain(df: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    def bit(j: Int): String =
      s"CASE WHEN 2 * aggregate(th, 0L, (acc, h) -> acc + " +
        s"(instr('0123456789abcdef', substring(h, $j, 1)) - 1)) > " +
        s"15 * size(th) THEN '1' ELSE '0' END"
    val sig = (1 to 16).map(bit).mkString("concat(", ", ", ")")
    df.withColumn("th", expr("transform(split(text, ' '), t -> md5(t))"))
      .select(col("id"), expr(sig).as("simhash"),
        size(col("th")).cast("long").as("n_tokens"))
  }

  private def kernel(df: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    GraftFunctions.register(df.sparkSession)
    df.select(col("id"), expr("graft_simhash(text)").as("s"))
      .select(col("id"), col("s.simhash").as("simhash"),
        col("s.n_tokens").as("n_tokens"))
  }

  private def assertSame(texts: Seq[String]): Unit = {
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
    val a = sqlChain(df).orderBy("id").collect().toSeq
    val b = kernel(df).orderBy("id").collect().toSeq
    assert(a == b)
  }

  test("split-semantics edge cases: empty text, leading/trailing/double spaces") {
    assertSame(Seq(
      "",            // split -> [""], one empty token
      " ",           // ["", ""]
      "a",
      "a ",          // trailing empty kept
      " a",          // leading empty kept
      "a  b",        // middle empty kept
      "exact same tokens", "exact same tokens",
      "the quick brown fox jumps over the lazy dog"))
  }

  test("multi-byte tokens and long tokens past the one-block boundary") {
    val emoji = new String(Character.toChars(0x1F600))
    assertSame(Seq(
      s"café ole $emoji",
      "日本語 トークン 分割",
      ("x" * 80) + " short " + ("y" * 200))) // >55-byte tokens take the fallback
  }

  test("random corpora over a small vocabulary") {
    val rnd = new scala.util.Random(11)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "", "x")
    assertSame((1 to 40).map { _ =>
      (0 until rnd.nextInt(30)).map(_ => vocab(rnd.nextInt(vocab.size)))
        .mkString(" ")
    })
  }

  test("sf0.001 corpus: kernel == SQL chain") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select(col("doc_id").as("id"), col("text"))
    val a = sqlChain(docs).orderBy("id").collect().toSeq
    val b = kernel(docs).orderBy("id").collect().toSeq
    assert(a == b)
  }
}
