// Dev scratch: finalized AQE plan of shipped q34 — shuffle-stage audit.
package graft.tools

import graft.Tables
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

object ExplainQ34 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val raw = Tables.t(spark, "/root/testdata/sf0.001", "documents")
    val docs = raw.select(col("doc_id"), col("source"),
      array_sort(array_distinct(transform(split(col("text"), " "),
        (t: Column) => xxhash64(t)))).as("tok"))
    val q = graft.llm.TextQueries.prefixJaccardPairs(docs, 0.6)
    q.collect()
    val s = q.queryExecution.executedPlan.toString
    println("=== stages ===")
    """(ShuffleQueryStage \d+|ReusedExchange|Exchange \w+partitioning\([^)]*\)|ShuffledHashJoin|Window \[row_number)""".r
      .findAllIn(s).foreach(println)
  }
}
