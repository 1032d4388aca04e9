// Dev scratch: measure the actual Hamming separation between exact
// near-dup pairs and the successor baseline, to calibrate q266's bounds.
// Run: sbt "runMain graft.tools.ProbeSimhash [sfDir]"
package graft.tools

import graft.Tables
import graft.llm.{DedupQueries, TextQueries}
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

object ProbeSimhash {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[8]")
      .withExtensions(new graft.functions.GraftExtensions)
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = Tables.t(spark, dir, "documents")
    val d = docs.select(col("doc_id"), col("source"),
      array_sort(array_distinct(transform(split(col("text"), " "),
        (t: Column) => xxhash64(t)))).as("tok"))
    val exact = TextQueries.prefixJaccardPairs(d, 0.6,
      presentationSort = false)
      .select(col("source"), col("a_id"), col("b_id")).localCheckpoint()
    val sh = DedupQueries.simhash(docs).localCheckpoint()
    def hd(p: org.apache.spark.sql.DataFrame) = p
      .join(sh.select(col("doc_id").as("a_id"), col("simhash").as("ha")),
        "a_id")
      .join(sh.select(col("doc_id").as("b_id"), col("simhash").as("hb")),
        "b_id")
      .select(bit_count(col("ha").bitwiseXOR(col("hb"))).cast("long")
        .as("hd"))
      .agg(count(lit(1)), avg(col("hd")), min(col("hd")), max(col("hd")),
        expr("percentile(hd, 0.9)"))
    val wS = Window.partitionBy(col("source")).orderBy(col("doc_id"))
    val base = docs.select(col("source"), col("doc_id"))
      .withColumn("b_id", lead(col("doc_id"), 1).over(wS))
      .filter(col("b_id").isNotNull)
      .select(col("source"), col("doc_id").as("a_id"), col("b_id"))
      .join(exact, Seq("source", "a_id", "b_id"), "left_anti")
    println("dup:  " + hd(exact).collect().head)
    println("base: " + hd(base).collect().head)
    spark.stop()
  }
}
