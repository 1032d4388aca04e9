// Dev scratch: formatted plan of shipped q34 at sf0.1 — exchange-reuse audit.
package graft.tools

import graft.Tables
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

object ExplainQ34 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val raw = Tables.t(spark, "/root/testdata/sf0.1", "documents")
    val docs = raw.select(col("doc_id"), col("source"),
      array_sort(array_distinct(transform(split(col("text"), " "),
        (t: Column) => xxhash64(t)))).as("tok"))
    val q = graft.llm.TextQueries.prefixJaccardPairs(docs, 0.6)
    q.write.format("noop").mode("overwrite").save()  // let AQE finalize
    println(q.queryExecution.executedPlan.toString.take(12000))
    spark.stop()
  }
}
