package graft

import org.apache.spark.sql.SparkSession

/** Dev utility: sweep EVERY registered query's physical plan and flag
  * the classic scale traps — nested-loop/cartesian joins and
  * single-partition exchanges. Known-benign cases still print (a 1-row
  * scalar broadcast is a BroadcastNestedLoopJoin; a final global
  * orderBy is a SinglePartition exchange) so the audit is an explicit
  * eyeball list, not a silent filter.
  * `sbt "runMain graft.PlanAudit"` (sf dir via SPARK_GRAFT_SF_DIR).
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "false") // full plan visibility
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = if (args.nonEmpty) args.toSeq else SparkEntry.queries.keys.toSeq.sorted
    var flagged = 0
    names.foreach { n =>
      try {
        val plan = SparkEntry.queries(n)(spark, sfDir).queryExecution.executedPlan
        val s = plan.toString
        val flags = Seq(
          "CartesianProduct" -> s.contains("CartesianProduct"),
          "BroadcastNestedLoopJoin" -> s.contains("BroadcastNestedLoopJoin"),
          // SinglePartition exchanges beyond the final presentation sort
          "multi-SinglePartition" ->
            (s.sliding("SinglePartition".length).count(_ == "SinglePartition") > 1)
        ).collect { case (f, true) => f }
        if (flags.nonEmpty) { flagged += 1; println(s"[audit] $n: ${flags.mkString(", ")}") }
      } catch {
        case e: Exception => println(s"[audit] $n: ERROR ${e.getMessage.take(100)}")
      } finally Caches.unpersistAll() // even on error — leaked caches distort later plans
    }
    println(s"[audit] done: ${names.size} queries, $flagged flagged")
    spark.stop()
  }
}
