// Dev scratch: does q71 slow down after the rest of the query set has run
// in the same session (the BENCH context), and which prior queries cause it?
// Run: sbt "runMain graft.tools.ProfileQ71InContext"
package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession

object ProfileQ71InContext {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .withExtensions(new graft.functions.GraftExtensions)
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    def run(name: String): Double = {
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, dir)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    def timeQ71(tag: String): Unit = {
      val ts = (1 to 3).map(_ => run("q71_dedup_clusters"))
      println(f"q71 [$tag] median ${ts.sorted.apply(1)}%.2f  " +
        f"(min ${ts.min}%.2f max ${ts.max}%.2f)")
    }
    run("q71_dedup_clusters") // warm
    timeQ71("fresh session")
    // now run everything else once, as the bench does
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter(_._1 != "q71_dedup_clusters")
      .foreach { case (n, _) =>
        try run(n)
        catch { case e: Throwable => println(s"$n failed: ${e.getMessage}") }
      }
    timeQ71("after full set")
    println("storage: " + spark.sparkContext.getRDDStorageInfo.length +
      " cached RDDs, executor mem used = " +
      spark.sparkContext.getExecutorMemoryStatus.map { case (_, (max, rem)) =>
        s"${(max - rem) / 1e6}MB of ${max / 1e6}MB"
      }.mkString(", "))
    timeQ71("after full set 2")
    spark.stop()
  }
}
