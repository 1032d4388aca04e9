package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for the whole test run.
  *
  * INVARIANT (pinned in build.sbt via testForkedParallel=false): suites
  * execute sequentially in the forked JVM and every suite builds its own
  * inputs — no suite reads a frame that an earlier suite cached or
  * checkpointed. PlanGuardSpec relies on this to sweep the session's
  * storage (clearCache + blocking unpersist of ALL persistent RDDs)
  * before metering plans; a suite that held a localCheckpointed frame
  * across that sweep would fail with unrecoverable missing blocks.
  */
object TestSpark {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .withExtensions(new graft.functions.GraftExtensions)
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir",
        s"/tmp/graft-test-warehouse-${System.nanoTime()}")
      .config("spark.sql.streaming.checkpointLocation",
        s"/tmp/graft-test-ckpt-${System.nanoTime()}")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  val Sf = "/root/testdata/sf0.001"
}
