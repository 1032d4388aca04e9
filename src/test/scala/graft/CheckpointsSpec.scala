package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the two load-bearing properties of [[Checkpoints.free]]:
  * a checkpoint's blocks really are released (bounded storage for
  * iterative kernels), and a frame merely DERIVED from a checkpoint is
  * a no-op (freeing through the tree once tore edge-list blocks out from
  * under later PageRank rounds — CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND).
  */
class CheckpointsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("free releases a checkpointed frame's cached blocks") {
    val ck = Seq(1L, 2L, 3L).toDF("x").localCheckpoint()
    assert(ck.count() == 3)
    val rddId = ck.queryExecution.analyzed
      .asInstanceOf[org.apache.spark.sql.execution.LogicalRDD].rdd.id
    assert(spark.sparkContext.getRDDStorageInfo.exists(_.id == rddId),
      "precondition: checkpoint blocks should be cached")
    Checkpoints.free(ck)
    // blocking=false: wait for the async removal to land
    val deadline = System.currentTimeMillis() + 10000
    def live = spark.sparkContext.getRDDStorageInfo.exists(i =>
      i.id == rddId && i.numCachedPartitions > 0)
    while (live && System.currentTimeMillis() < deadline)
      Thread.sleep(100)
    assert(!live, "checkpoint blocks were not released")
  }

  test("free is a no-op on a frame derived from a checkpoint") {
    val ck = Seq(1L, 2L, 3L, 4L).toDF("x").localCheckpoint()
    val derived = ck.filter(col("x") > 1).select((col("x") * 2).as("y"))
    Checkpoints.free(derived) // must NOT free ck's blocks
    Thread.sleep(500)
    // the checkpoint (lineage-truncated) is still fully readable
    assert(ck.count() == 4)
    assert(derived.count() == 3)
    Checkpoints.free(ck)
  }

  test("roll materializes the next round before freeing the previous") {
    var r = Seq(1L).toDF("v").localCheckpoint()
    (1 to 3).foreach { _ =>
      r = Checkpoints.roll(r.select((col("v") + 1).as("v")), r)
    }
    assert(r.as[Long].head() == 4L)
  }

  test("freeingAfter releases exactly the RDDs the body persisted") {
    val sc = spark.sparkContext
    val outside = Seq(1L, 2L).toDF("x").localCheckpoint() // pre-existing
    val outsideId = outside.queryExecution.analyzed
      .asInstanceOf[org.apache.spark.sql.execution.LogicalRDD].rdd.id
    var insideId = -1
    val n = Checkpoints.freeingAfter(spark) {
      val ck = Seq(3L, 4L, 5L).toDF("x").localCheckpoint()
      insideId = ck.queryExecution.analyzed
        .asInstanceOf[org.apache.spark.sql.execution.LogicalRDD].rdd.id
      ck.count()
    }
    assert(n == 3)
    val deadline = System.currentTimeMillis() + 10000
    def live(id: Int) = sc.getPersistentRDDs.contains(id)
    while (live(insideId) && System.currentTimeMillis() < deadline)
      Thread.sleep(100)
    assert(!live(insideId), "body's checkpoint was not released")
    assert(live(outsideId), "pre-existing checkpoint must survive")
    assert(outside.count() == 2)
    Checkpoints.free(outside)
  }
}
