// Dev scratch: where do q104's seconds go — the exact-percentile
// aggregation, or the clip pass? And is a window-rank formulation of the
// same interpolated percentile faster than the Percentile ObjectAgg?
// Run: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain graft.tools.ProfileQ104"
package graft.tools

import graft.Tables
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

object ProfileQ104 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .withExtensions(new graft.functions.GraftExtensions)
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val li = Tables.t(spark, sfDir, "lineitem")
      .select(col("l_returnflag"), col("l_extendedprice"))

    def time(name: String)(body: => Unit): Unit = {
      body // warm
      val t0 = System.nanoTime()
      body
      println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }

    time("percentile-agg (current)") {
      li.groupBy(col("l_returnflag"))
        .agg(round(expr("percentile(l_extendedprice, 0.05)"), 4).as("lo"),
             round(expr("percentile(l_extendedprice, 0.95)"), 4).as("hi"))
        .write.format("noop").mode("overwrite").save()
    }

    time("window-rank bounds") {
      val cnt = li.groupBy(col("l_returnflag")).agg(count(lit(1)).as("cnt"))
      val w = Window.partitionBy(col("l_returnflag"))
        .orderBy(col("l_extendedprice"))
      val pos05 = lit(0.05) * (col("cnt") - 1).cast("double")
      val pos95 = lit(0.95) * (col("cnt") - 1).cast("double")
      val r = col("rn").cast("double") - 1
      li.join(broadcast(cnt), "l_returnflag")
        .withColumn("rn", row_number().over(w))
        .filter(r === floor(pos05) || r === ceil(pos05) ||
                r === floor(pos95) || r === ceil(pos95))
        .groupBy(col("l_returnflag"))
        .agg(max(col("cnt")).as("cnt"),
          min(when(r === floor(pos05), col("l_extendedprice"))).as("l05"),
          min(when(r === ceil(pos05), col("l_extendedprice"))).as("h05"),
          min(when(r === floor(pos95), col("l_extendedprice"))).as("l95"),
          min(when(r === ceil(pos95), col("l_extendedprice"))).as("h95"))
        .write.format("noop").mode("overwrite").save()
    }

    // bit-equality of the two bounds formulations at this SF: the window
    // form replicates Percentile's interpolation arithmetic
    // ((higher-pos)*lowerKey + (pos-lower)*higherKey, equal-key guard), so
    // the rounded thresholds must be IDENTICAL doubles.
    {
      val old = li.groupBy(col("l_returnflag"))
        .agg(round(expr("percentile(l_extendedprice, 0.05)"), 4).as("lo"),
             round(expr("percentile(l_extendedprice, 0.95)"), 4).as("hi"))
        .orderBy("l_returnflag").collect()
      val cnt = li.groupBy(col("l_returnflag")).agg(count(lit(1)).as("cnt"))
      val w = Window.partitionBy(col("l_returnflag"))
        .orderBy(col("l_extendedprice"))
      val r = col("rn").cast("double") - 1
      def pos(p: Double) = lit(p) * (col("cnt") - 1).cast("double")
      def interp(l: org.apache.spark.sql.Column,
                 h: org.apache.spark.sql.Column, p: Double) =
        when(h === l, l).otherwise(
          (ceil(pos(p)) - pos(p)) * l + (pos(p) - floor(pos(p))) * h)
      val neu = li.join(broadcast(cnt), "l_returnflag")
        .withColumn("rn", row_number().over(w))
        .filter(r === floor(pos(0.05)) || r === ceil(pos(0.05)) ||
                r === floor(pos(0.95)) || r === ceil(pos(0.95)))
        .groupBy(col("l_returnflag"))
        .agg(max(col("cnt")).as("cnt"),
          min(when(r === floor(pos(0.05)), col("l_extendedprice"))).as("l05"),
          min(when(r === ceil(pos(0.05)), col("l_extendedprice"))).as("h05"),
          min(when(r === floor(pos(0.95)), col("l_extendedprice"))).as("l95"),
          min(when(r === ceil(pos(0.95)), col("l_extendedprice"))).as("h95"))
        .select(col("l_returnflag"),
          round(interp(col("l05"), col("h05"), 0.05), 4).as("lo"),
          round(interp(col("l95"), col("h95"), 0.95), 4).as("hi"))
        .orderBy("l_returnflag").collect()
      val ok = old.zip(neu).forall { case (a, b) =>
        a.getString(0) == b.getString(0) &&
        java.lang.Double.doubleToLongBits(a.getDouble(1)) ==
          java.lang.Double.doubleToLongBits(b.getDouble(1)) &&
        java.lang.Double.doubleToLongBits(a.getDouble(2)) ==
          java.lang.Double.doubleToLongBits(b.getDouble(2))
      }
      println(s"bounds bit-equal: $ok")
      old.zip(neu).foreach { case (a, b) => println(s"  old=$a new=$b") }
    }

    time("clip pass alone") {
      val bounds = li.groupBy(col("l_returnflag"))
        .agg(min(col("l_extendedprice")).as("lo"),
             max(col("l_extendedprice")).as("hi"))
      li.join(broadcast(bounds), "l_returnflag")
        .groupBy(col("l_returnflag"))
        .agg(count(when(col("l_extendedprice") < col("lo"), 1)).as("n_low"),
             count(lit(1)).as("n"))
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
