// Dev scratch: stage-wise timing of the prefix-filtered Jaccard pipeline
// (q34/q50) at sf0.1. Run: sbt "runMain graft.tools.ProfileJaccard"
package graft.tools

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

object ProfileJaccard {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val raw = Tables.t(spark, "/root/testdata/sf0.1", "documents")
    def time(name: String)(df: DataFrame): Unit = {
      df.write.format("noop").mode("overwrite").save() // warm
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      println(f"$name%-24s ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }

    // q34 tokenization
    val docs34 = raw.select(col("doc_id"), col("source"),
      array_sort(array_distinct(transform(split(col("text"), " "),
        (t: Column) => xxhash64(t)))).as("tok"))
    // q50 shingles
    val tokE = split(col("text"), " ")
    val docs50 = raw.filter(size(tokE) >= 3)
      .select(col("doc_id"), col("source"),
        array_sort(array_distinct(transform(sequence(lit(1), size(tokE) - 2),
          (i: Column) => xxhash64(array_join(slice(tokE, i, lit(3)), " ")))))
          .as("tok"))

    // stages come from the SHIPPED pipeline (TextQueries.prefixCandidates /
    // prefixJaccardPairs) — an inline copy here drifted from the real plan
    // once the length filter landed
    def stages(tag: String, docs: DataFrame, threshold: Double,
               dfOrdered: Boolean = true): Unit = {
      val cand = graft.llm.TextQueries
        .prefixCandidates(docs, threshold, dfOrdered)
      time(s"$tag tokenize")(docs)
      time(s"$tag candidates")(cand)
      println(s"$tag n_candidates = " + cand.count())
      time(s"$tag full")(
        graft.llm.TextQueries.prefixJaccardPairs(docs, threshold, dfOrdered))
    }
    stages("q34", docs34, 0.6)
    stages("q50", docs50, 0.4, dfOrdered = false)
    spark.stop()
  }
}
