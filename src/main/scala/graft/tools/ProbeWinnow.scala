// Dev scratch: measure winnow-fingerprint set overlap for exact near-dup
// pairs vs the successor baseline, to calibrate q269's declared bounds.
// Run: sbt "runMain graft.tools.ProbeWinnow [sfDir]"
package graft.tools

import graft.Tables
import graft.llm.{DedupQueries, TextQueries}
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

object ProbeWinnow {
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
    val fp = DedupQueries.winnowFingerprints(docs)
      .select(col("doc_id"), array_sort(col("fingerprints")).as("fp"))
      .localCheckpoint()
    def jac(p: org.apache.spark.sql.DataFrame) = p
      .join(fp.select(col("doc_id").as("a_id"), col("fp").as("fa")), "a_id")
      .join(fp.select(col("doc_id").as("b_id"), col("fp").as("fb")), "b_id")
      .withColumn("ni", graft.functions.SortedIntersectCount
        .sortedIntersectCount(col("fa"), col("fb")).cast("double"))
      .withColumn("j", col("ni") /
        (size(col("fa")) + size(col("fb")) - col("ni")))
      .agg(count(lit(1)), avg(col("j")), min(col("j")),
        expr("percentile(j, 0.1)"))
    val wS = Window.partitionBy(col("source")).orderBy(col("doc_id"))
    val base = docs.select(col("source"), col("doc_id"))
      .withColumn("b_id", lead(col("doc_id"), 1).over(wS))
      .filter(col("b_id").isNotNull)
      .select(col("source"), col("doc_id").as("a_id"), col("b_id"))
      .join(exact, Seq("source", "a_id", "b_id"), "left_anti")
    println("dup:  " + jac(exact).collect().head)
    println("base: " + jac(base).collect().head)
    spark.stop()
  }
}
