// Dev scratch: isolate q131's cost — the PPJoin pair stage vs the full
// weighted rescoring (fused SortedWeightedIntersectSum kernel).
// Run: sbt "runMain graft.tools.ProfileQ131"
package graft.tools

import graft.Tables
import graft.llm.TextQueries
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

object ProfileQ131 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .withExtensions(new graft.functions.GraftExtensions)
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time(tag: String)(df: => org.apache.spark.sql.DataFrame): Unit = {
      df.write.format("noop").mode("overwrite").save() // warm
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      println(f"$tag%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    val docs = Tables.t(spark, sfDir, "documents")
    val d = docs.select(col("doc_id"), col("source"),
      array_sort(array_distinct(transform(split(col("text"), " "),
        (t: Column) => xxhash64(t)))).as("tok"))
    time("pairs only") {
      TextQueries.prefixJaccardPairs(d, 0.6, presentationSort = false)
    }
    time("full q131") {
      graft.SparkEntry.queries("q131_weighted_jaccard")(spark, sfDir)
    }
    spark.stop()
  }
}
