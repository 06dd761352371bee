package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** graft_winnow must equal the declarative chain it fused (the form
  * d21 ran through r15's first restructure, and the form the DuckDB
  * oracle still states): per-position padded-string tie-break encoding,
  * array_min over every clamped width-W slice, array_distinct. The
  * kernel's consecutive-dedup == global-distinct argument and its
  * monotonic-deque window minimum are both exercised by adversarial
  * fixtures (ties, monotone runs, short docs, supplementary-plane
  * text) plus random corpora.
  */
class WinnowKernelSpec extends SparkTestBase {
  import spark.implicits._

  private val K = 8
  private val W = 4

  /** The pre-fusion SQL chain, decoded to (pos, fp) pairs. */
  private def sqlChain(df: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val vs = s"transform(graft_pos_hashes(text, $K), (h, i) -> " +
      "concat(lpad(cast(h AS string), 10, '0'), '-', " +
      "lpad(cast(i + 1 AS string), 8, '0')))"
    df.select(col("id"), expr(vs).as("vs"))
      .select(col("id"), explode(expr(
        s"array_distinct(transform(" +
          s"sequence(1, greatest(size(vs) - ${W - 1}, 1)), " +
          s"i -> array_min(slice(vs, i, $W))))")).as("sel"))
      .select(col("id"),
        substring(col("sel"), 12, 8).cast("long").as("pos"),
        substring(col("sel"), 1, 10).cast("long").as("fp"))
  }

  private def kernel(df: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val enc = GraftHash.WinnowPosEnc
    df.select(col("id"),
      explode(expr(s"graft_winnow(text, $K, $W)")).as("sel"))
      .select(col("id"),
        pmod(col("sel"), lit(enc)).as("pos"),
        expr(s"sel div ${enc}L").as("fp"))
  }

  private def assertSame(texts: Seq[String]): Unit = {
    GraftFunctions.register(spark)
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
    val a = sqlChain(df).orderBy("id", "pos", "fp").collect().toSeq
    val b = kernel(df).orderBy("id", "pos", "fp").collect().toSeq
    assert(a == b, s"kernel diverged from the SQL chain")
    // selection order must ALSO match (d21 only needs the set — the
    // explode order is plan-internal — but order equality is free to
    // assert and pins the consecutive-dedup == distinct argument)
    val ao = sqlChain(df).collect().toSeq
    val bo = kernel(df).collect().toSeq
    assert(ao == bo, "selection ORDER diverged from array_distinct order")
  }

  test("adversarial fixtures: ties, monotone runs, short and empty docs") {
    assertSame(Seq(
      "",                       // empty -> single clamped shingle ""
      "a",                      // shorter than the shingle
      "abcdefg",                // exactly one short shingle
      "abcdefgh",               // exactly one full shingle
      "abcdefghi",              // two positions, one window
      "aaaaaaaaaaaaaaaaaaaaaa", // all-equal hashes: tie-breaks every window
      "abababababababababab",   // period-2: repeated hash values
      ("abcdefghij" * 30),      // long periodic doc
      "the quick brown fox jumps over the lazy dog"))
  }

  test("supplementary-plane text: code-point shingles, multi-byte slices") {
    val emoji = new String(Character.toChars(0x1F600))
    assertSame(Seq(
      emoji * 12,
      s"ab${emoji}cd${emoji}ef${emoji}gh",
      "日本語のテキストを含む長めの文書です。重複検出のための指紋。"))
  }

  test("random corpora over a small alphabet (dense hash collisions)") {
    val rnd = new scala.util.Random(7)
    val texts = (1 to 40).map { _ =>
      val n = rnd.nextInt(120)
      (0 until n).map(_ => ('a' + rnd.nextInt(3)).toChar).mkString
    }
    assertSame(texts)
  }

  test("sf0.001 corpus: kernel == SQL chain end to end") {
    GraftFunctions.register(spark)
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select(col("doc_id").as("id"), col("text"))
    val a = sqlChain(docs).orderBy("id", "pos", "fp").collect().toSeq
    val b = kernel(docs).orderBy("id", "pos", "fp").collect().toSeq
    assert(a == b)
  }
}
