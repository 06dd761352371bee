// scratch probe, not committed
package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object T10Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    def t(label: String)(f: => Long): Unit = {
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime()
        val n = f
        println(f"$label run $i: ${(System.nanoTime()-t0)/1e9}%.2fs n=$n")
      }
    }
    val docs = Tables.documents(spark, dir)
    docs.count()
    // A: current form — split(text) inside the lambda body
    val words = "split(text, ' ')"
    val pairsA = s"transform(sequence(1, size($words) - 1)," +
      s" i -> struct(element_at($words, i) AS w1," +
      s" array_join(slice($words, i, 2), ' ') AS bigram))"
    val instA = docs.filter(size(split(col("text"), " ")) >= 2)
      .select(col("doc_id"), explode(expr(pairsA)).as("p"))
      .select(col("doc_id"), col("p.w1").as("w1"), col("p.bigram").as("bigram"))
    t("A lambda-split")(instA.count())
    // B: project toks first, lambda references the attribute
    val pairsB = "transform(sequence(1, size(toks) - 1)," +
      " i -> struct(element_at(toks, i) AS w1," +
      " concat(element_at(toks, i), ' ', element_at(toks, i + 1)) AS bigram))"
    val instB = docs.select(col("doc_id"), split(col("text"), " ").as("toks"))
      .filter(size(col("toks")) >= 2)
      .select(col("doc_id"), explode(expr(pairsB)).as("p"))
      .select(col("doc_id"), col("p.w1").as("w1"), col("p.bigram").as("bigram"))
    t("B projected-toks")(instB.count())
    instB.explain("formatted")
    spark.stop()
  }
}
