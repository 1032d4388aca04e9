// Dev scratch: stage-wise timing of the MinHash pipeline at sf0.1.
// Run: sbt "runMain graft.tools.ProfileQ36"
package graft.tools

import graft.Tables
import graft.llm.DedupQueries
import org.apache.spark.sql.SparkSession

object ProfileQ36 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = Tables.t(spark, "/root/testdata/sf0.1", "documents")
    def time(name: String)(df: org.apache.spark.sql.DataFrame): Unit = {
      df.write.format("noop").mode("overwrite").save() // warm
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      println(f"$name%-20s ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    time("signatures")(DedupQueries.signatures(docs))
    time("bands")(DedupQueries.bands(DedupQueries.signatures(docs)))
    time("candidates")(DedupQueries.candidatePairs(docs))
    time("full")(DedupQueries.minhashPairs(docs, 0.6))
    spark.stop()
  }
}
