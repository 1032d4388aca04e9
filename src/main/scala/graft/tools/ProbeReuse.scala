// Dev scratch: check static-planner (AQE off) ReusedExchange in self-join queries.
package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession

object ProbeReuse {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .withExtensions(new graft.functions.GraftExtensions)
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args.foreach { name =>
      val p = SparkEntry.queries(name)(spark, "/root/testdata/sf0.001")
        .queryExecution.executedPlan.toString
      println(s"$name reused=${p.contains("ReusedExchange")}")
    }
    spark.stop()
  }
}
