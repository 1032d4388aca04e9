// Dev scratch: stage-wise timing of the prefix-filtered Jaccard pipeline
// (q34/q50) at sf0.1. Run: sbt "runMain graft.tools.ProfileJaccard"
package graft.tools

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
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

    def stages(tag: String, docs: DataFrame, threshold: Double,
               dfOrdered: Boolean = true): Unit = {
      val toks = docs.select(col("source"), col("doc_id"),
        size(col("tok")).cast("long").as("ntok"), explode(col("tok")).as("h"))
      val dfreq = toks.groupBy(col("source"), col("h"))
        .agg(count(lit(1)).as("df"))
      val prefixLen = col("ntok") -
        ceil(lit(threshold) * col("ntok") - lit(1e-9)).cast("long") + lit(1L)
      val w = Window.partitionBy(col("source"), col("doc_id"))
        .orderBy(col("df"), col("h"))
      val prefix = toks.join(dfreq, Seq("source", "h"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= prefixLen)
        .select(col("source"), col("h"), col("doc_id"))
      val cand = prefix.select(col("source"), col("h"), col("doc_id").as("a_id"))
        .join(prefix.select(col("source"), col("h"), col("doc_id").as("b_id")),
          Seq("source", "h"))
        .filter(col("a_id") < col("b_id"))
        .select(col("source"), col("a_id"), col("b_id"))
        .distinct()
      time(s"$tag tokenize")(docs)
      time(s"$tag explode+df")(dfreq)
      time(s"$tag prefix")(prefix)
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
