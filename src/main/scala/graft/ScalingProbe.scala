package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev utility: similarity-search scaling measurement on a planted
  * clustered corpus (same geometry as the OpsSpec recall tests, scaled).
  * `sbt "runMain graft.ScalingProbe 50000 100"` -> n vectors, k clusters;
  * times banded-LSH and IVF ANN warm (run 2) at that scale.
  *
  * The point: candidate work for both paths is bucket-local, so runtime
  * should grow ~linearly in n while brute force grows n*q — the numbers
  * land in NOTES.md next to the d03 10x corpus run.
  */
object ScalingProbe {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toInt else 50000
    val k = if (args.length > 1) args(1).toInt else 100
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val vecs = PlantedVectors.corpus(n, k)
    val emb = vecs.toDF("vec_id", "embedding")
    val every = math.max(1, n / 100) // ~100 query points (all rows if n < 100)
    val prepared = graft.ops.SimOps.prepareVectors(emb)
      .withColumn("label", expr(s"CAST(vec_id DIV ${n / k} AS INT)"))

    def time(name: String)(body: => Long): Unit =
      (1 to 2).foreach { i =>
        val t0 = System.nanoTime()
        val rows = body
        println(f"$name n=$n run $i: ${(System.nanoTime() - t0) / 1e9}%.2fs rows=$rows")
        Caches.unpersistAll()
      }

    time("banded_lsh") {
      graft.ops.SimOps.bandedTopK(prepared, col("vec_id") % every === 0, 5).count()
    }
    time("ivf_nprobe2") {
      graft.ops.SimOps.ivfTopK(prepared, col("vec_id") % every === 0, 2, 5).count()
    }
    spark.stop()
  }
}
