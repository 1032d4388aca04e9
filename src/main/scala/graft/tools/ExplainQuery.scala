// Dev scratch: print a declared query's EXECUTED (AQE-final) plan.
// Run: sbt "runMain graft.tools.ExplainQuery q255_bloom_semijoin [...]"
package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession

object ExplainQuery {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[8]")
      .withExtensions(new graft.functions.GraftExtensions)
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args.foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      df.collect() // drive AQE to the final plan
      println(s"==== $name ====")
      println(df.queryExecution.executedPlan.toString
        .split("== Initial Plan ==")(0))
    }
    spark.stop()
  }
}
