// Dev scratch: q72 timing at sf0.1 — fused expression vs old explode shape.
// Run: sbt "runMain graft.tools.ProfileQ72"
package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession

object ProfileQ72 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .withExtensions(new graft.functions.GraftExtensions)
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time(name: String)(body: => Unit): Unit = {
      body // warm
      val t0 = System.nanoTime()
      body
      println(f"$name%-12s ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    time("q72") {
      SparkEntry.queries("q72_langid_ngram")(spark, "/root/testdata/sf0.1")
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
