// Dev scratch: q71 stage timing at sf0.1 — pair join vs propagation cost.
// Run: sbt "runMain graft.tools.ProfileQ71"
package graft.tools

import graft.{SparkEntry, Tables}
import graft.llm.{DedupQueries, TextQueries}
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

object ProfileQ71 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .withExtensions(new graft.functions.GraftExtensions)
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    def time(name: String)(body: => Unit): Unit = {
      body // warm
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        body
        (System.nanoTime() - t0) / 1e9
      }
      println(f"$name%-12s ${ts.sorted.apply(1)}%.2f s (min ${ts.min}%.2f max ${ts.max}%.2f)")
    }
    val d = Tables.t(spark, dir, "documents").select(
      col("doc_id"), col("source"),
      array_sort(array_distinct(transform(split(col("text"), " "),
        (t: Column) => xxhash64(t)))).as("tok"))
    time("pairs-only") {
      TextQueries.prefixJaccardPairs(d, 0.6)
        .write.format("noop").mode("overwrite").save()
    }
    time("q71-full") {
      SparkEntry.queries("q71_dedup_clusters")(spark, dir)
        .write.format("noop").mode("overwrite").save()
    }
    // how many propagation rounds does the sf0.1 pair graph need?
    val pairs = TextQueries.prefixJaccardPairs(d, 0.6)
    val (_, rounds) =
      DedupQueries.connectedComponentsWithRounds(pairs, maxIter = 50)
    println(s"cc-rounds     $rounds")
    spark.stop()
  }
}
