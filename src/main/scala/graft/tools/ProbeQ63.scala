// Dev scratch: decompose q63's 20x cost — time the exact array-percentile
// half and the approx_percentile sketch half separately at two scales.
// Run: sbt "runMain graft.tools.ProbeQ63 <dirA> <dirB>"
package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object ProbeQ63 {
  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.1", "scaledata/sf2")
    val spark = SparkSession.builder().master("local[32]")
      .withExtensions(new graft.functions.GraftExtensions)
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time(tag: String, dir: String)(df: => org.apache.spark.sql.DataFrame)
        : Unit = {
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"$tag%-12s $dir%-22s median=${ts.sorted.apply(1)}%.2f " +
        f"min=${ts.min}%.2f")
    }
    for (dir <- dirs) {
      val li = graft.Tables.t(spark, dir, "lineitem")
      time("exact3", dir)(li.groupBy(col("l_returnflag")).agg(
        expr("percentile(l_quantity, array(0.49, 0.51))"),
        expr("percentile(l_extendedprice, array(0.89, 0.91))"),
        expr("percentile(l_discount, array(0.24, 0.26))")))
      time("approx3", dir)(li.groupBy(col("l_returnflag")).agg(
        expr("approx_percentile(l_quantity, 0.5, 10000)"),
        expr("approx_percentile(l_extendedprice, 0.9, 10000)"),
        expr("approx_percentile(l_discount, 0.25, 10000)")))
      time("approx3k1", dir)(li.groupBy(col("l_returnflag")).agg(
        expr("approx_percentile(l_quantity, 0.5, 1000)"),
        expr("approx_percentile(l_extendedprice, 0.9, 1000)"),
        expr("approx_percentile(l_discount, 0.25, 1000)")))
      time("both6", dir)(li.groupBy(col("l_returnflag")).agg(
        expr("percentile(l_quantity, array(0.49, 0.51))"),
        expr("percentile(l_extendedprice, array(0.89, 0.91))"),
        expr("percentile(l_discount, array(0.24, 0.26))"),
        expr("approx_percentile(l_quantity, 0.5, 10000)"),
        expr("approx_percentile(l_extendedprice, 0.9, 10000)"),
        expr("approx_percentile(l_discount, 0.25, 10000)")))
    }
    spark.stop()
  }
}
