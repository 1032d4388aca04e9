// Dev scratch: measure single-probe hyperplane-LSH recall@10 vs the exact
// top-10 (q39 vs q38), to calibrate q267's declared bound.
// Run: sbt "runMain graft.tools.ProbeAnn [sfDir]"
package graft.tools

import graft.Tables
import graft.llm.SimilarityQueries
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object ProbeAnn {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[8]")
      .withExtensions(new graft.functions.GraftExtensions)
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val e = Tables.t(spark, dir, "embeddings")
    val q = e.filter(col("vec_id") < 5)
    val exact = SimilarityQueries.topK(e, q, 10)
      .select(col("query_id"), col("vec_id"))
    val ann = SimilarityQueries.annTopK(e, q, 10)
      .select(col("query_id"), col("vec_id")).withColumn("hit", lit(1))
    exact.join(ann, Seq("query_id", "vec_id"), "left")
      .groupBy(col("query_id"))
      .agg(count(lit(1)).as("n_exact"),
        sum(coalesce(col("hit"), lit(0))).as("n_caught"))
      .orderBy("query_id")
      .collect().foreach(println)
    spark.stop()
  }
}
