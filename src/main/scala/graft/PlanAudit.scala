package graft

import org.apache.spark.sql.SparkSession

/** Sweep EVERY registered query's physical plan and flag the classic
  * scale traps — nested-loop/cartesian joins and single-partition
  * exchanges. Known-benign cases still flag (a 1-row scalar broadcast
  * is a BroadcastNestedLoopJoin; a final global orderBy is a
  * SinglePartition exchange) so the audit is an explicit eyeball list,
  * not a silent filter.
  *
  * The sweep is both a dev main (`sbt "runMain graft.PlanAudit"`, sf
  * dir via SPARK_GRAFT_SF_DIR) and a CI gate: PlanAuditSpec pins the
  * flag map to an explicit allowlist, so any NEW trap in any query
  * fails `sbt test` instead of sailing into the next round.
  */
object PlanAudit {

  /** Scale-trap flags for one physical-plan string. */
  def flags(plan: String): Seq[String] = Seq(
    "CartesianProduct" -> plan.contains("CartesianProduct"),
    "BroadcastNestedLoopJoin" -> plan.contains("BroadcastNestedLoopJoin"),
    // SinglePartition exchanges beyond the final presentation sort
    "multi-SinglePartition" ->
      (plan.sliding("SinglePartition".length).count(_ == "SinglePartition") > 1)
  ).collect { case (f, true) => f }

  /** Plan-compile every named query (no execution) and return the
    * queries that flag, name -> flags. Errors surface as an `ERROR ...`
    * flag — a query whose plan cannot even build must fail the audit,
    * not hide the rest of it; the catch is Throwable on purpose (Janino
    * codegen StackOverflowError / NoClassDefFoundError are query-local
    * here, and this never runs inside an executor).
    */
  def sweep(spark: SparkSession, names: Seq[String], sfDir: String)
      : Map[String, Seq[String]] =
    names.flatMap { n =>
      val fs =
        try flags(
          SparkEntry.queries(n)(spark, sfDir).queryExecution.executedPlan.toString)
        catch {
          case e: Throwable =>
            Seq(s"ERROR ${e.getClass.getSimpleName}: " +
              String.valueOf(e.getMessage).take(100))
        } finally Caches.unpersistAll() // even on error — leaked caches distort later plans
      if (fs.isEmpty) None else Some(n -> fs)
    }.toMap

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
    val flagged = sweep(spark, names, sfDir)
    flagged.toSeq.sortBy(_._1).foreach { case (n, fs) =>
      println(s"[audit] $n: ${fs.mkString(", ")}")
    }
    println(s"[audit] done: ${names.size} queries, ${flagged.size} flagged")
    spark.stop()
  }
}
