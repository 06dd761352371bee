package graft

import org.apache.spark.sql.DataFrame

/** Caches.release — the r9 fixpoint-loop memory discipline: a single
  * checkpointed frame's blocks can be freed mid-query without touching
  * the rest of the registry.
  */
class CachesSpec extends SparkTestBase {

  private def checkpointedRddIds(df: DataFrame): Seq[Int] =
    df.queryExecution.analyzed.collectLeaves().collect {
      case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd.id
    }

  test("release frees one checkpointed frame's blocks and leaves " +
      "others registered") {
    val a = Caches.checkpoint(spark.range(1000).toDF("id"))
    val b = Caches.checkpoint(spark.range(2000).toDF("id"))
    val (aIds, bIds) = (checkpointedRddIds(a), checkpointedRddIds(b))
    val persisted = spark.sparkContext.getPersistentRDDs.keySet
    assert(aIds.forall(persisted.contains) && bIds.forall(persisted.contains))
    Caches.release(a)
    val after = spark.sparkContext.getPersistentRDDs.keySet
    assert(aIds.forall(!after.contains(_)), "released blocks still pinned")
    assert(bIds.forall(after.contains), "release touched the wrong frame")
    // idempotent + safe on an already-released frame
    Caches.release(a)
    // unpersistAll still clears the survivor
    Caches.unpersistAll()
    val end = spark.sparkContext.getPersistentRDDs.keySet
    assert(bIds.forall(!end.contains(_)))
  }

  test("release is a no-op for frames the registry never checkpointed") {
    val plain = spark.range(10).toDF("id")
    Caches.release(plain) // must not throw
    val cached = Caches.cache(spark.range(10).toDF("id"))
    cached.count()
    Caches.release(cached) // cache()-registered, not checkpointed: no-op
    assert(cached.count() == 10L) // still usable
    Caches.unpersistAll()
  }
}
