// Dev scratch: where do q107's seconds go — the edge build (join +
// distinct + repartition + degree fold + checkpoint) or the two
// propagation rounds? And does the orders×lineitem join broadcast?
// Run: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain graft.tools.ProfileQ107"
package graft.tools

import graft.Tables
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object ProfileQ107 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .withExtensions(new graft.functions.GraftExtensions)
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // mirrors q107's current edge construction (explode symmetrization)
    def edges() = {
      val off = lit(1000000L)
      val e0 = Tables.t(spark, sfDir, "orders")
        .select(col("o_orderkey"), col("o_custkey"))
        .join(Tables.t(spark, sfDir, "lineitem")
          .select(col("l_orderkey"), col("l_suppkey")),
          col("o_orderkey") === col("l_orderkey"))
        .select(col("o_custkey").as("src"),
          (col("l_suppkey") + off).as("dst"))
        .distinct()
      e0.select(explode(array(
          struct(col("src"), col("dst")),
          struct(col("dst").as("src"), col("src").as("dst")))).as("e"))
        .select(col("e.src").as("src"), col("e.dst").as("dst"))
    }

    def time(name: String)(body: => Unit): Unit = {
      val t0 = System.nanoTime()
      body
      println(f"$name%-30s ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }

    // warm both paths
    graft.ops.GraphQueries.pagerank(edges(), 2).write
      .format("noop").mode("overwrite").save()

    time("edge frame only (noop)") {
      edges().write.format("noop").mode("overwrite").save()
    }
    time("full pagerank 2 iters") {
      graft.Checkpoints.freeingAfter(spark) {
        graft.ops.GraphQueries.pagerank(edges(), 2).write
          .format("noop").mode("overwrite").save()
      }
    }
    time("full pagerank 1 iter") {
      graft.Checkpoints.freeingAfter(spark) {
        graft.ops.GraphQueries.pagerank(edges(), 1).write
          .format("noop").mode("overwrite").save()
      }
    }
    // join strategy of the edge build
    val plan = edges().queryExecution.executedPlan.toString
    println("edge-build join: " + (
      if (plan.contains("BroadcastHashJoin")) "broadcast"
      else if (plan.contains("SortMergeJoin")) "sort-merge"
      else "other"))
    println(s"edge rows: ${edges().count()}")
    spark.stop()
  }
}
