package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // Second (warm) pass on by default: cold totals are dominated by
    // one-shot Janino/JIT codegen (NOTES: 3-6x steady state), so the
    // warm pass is the throughput number. SPARK_GRAFT_WARM=0 disables.
    val warmPass = sys.env.getOrElse("SPARK_GRAFT_WARM", "1") != "0"
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm up JVM/codegen/parquet-reader paths so the first timed query
    // isn't charged for session initialization.
    spark.range(1000).selectExpr("sum(id)").collect()
    try Tables.events(spark, sfDir).limit(1).collect()
    catch { case _: Throwable => () }
    def pass(): Map[String, Double] = SparkEntry.queries.map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      val dt = (System.nanoTime() - t0) / 1e9
      Caches.unpersistAll() // bookkeeping, outside the timed span
      name -> dt
    }
    def json(m: Map[String, Double]): String =
      m.map { case (k, v) => s"\"" + k + "\":" + v }.mkString("{", ",", "}")
    val cold = pass()
    val coldTotal = if (cold.nonEmpty) cold.values.sum else 0.0
    // "value" stays the cold total — comparable with every prior round's
    // BENCH_r*.json; warm numbers ride along as extra keys.
    val extra = if (warmPass) {
      val warm = pass()
      val warmTotal = if (warm.nonEmpty) warm.values.sum else 0.0
      s""","warm_total":$warmTotal,"queries_warm":${json(warm)}"""
    } else ""
    println(s"""{"metric":"total","value":$coldTotal,"unit":"sec","queries":${json(cold)}$extra,"sf":"$sfDir"}""")
    spark.stop()
  }
}
