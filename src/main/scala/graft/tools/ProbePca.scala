// Dev scratch: PC1 invariants — unit norm, eigen residual, explained
// variance share — to calibrate q269's declared bounds.
// Run: sbt "runMain graft.tools.ProbePca [sfDir]"
package graft.tools

import graft.Tables
import graft.llm.SimilarityQueries
import org.apache.spark.sql.SparkSession

object ProbePca {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[8]")
      .withExtensions(new graft.functions.GraftExtensions)
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = Tables.t(spark, dir, "embeddings")
    val (axis, lambda, _) = SimilarityQueries.pc1Axis(emb)
    val d = axis.length
    val cov = Array.ofDim[Double](d, d)
    SimilarityQueries.covUpper(emb).collect().foreach { r =>
      val i = r.getLong(0).toInt; val j = r.getLong(1).toInt
      cov(i)(j) = r.getDouble(2); cov(j)(i) = r.getDouble(2)
    }
    val av = Array.tabulate(d)(i =>
      (0 until d).map(j => cov(i)(j) * axis(j)).sum)
    val resid = math.sqrt(
      av.zip(axis).map { case (a, v) => val e = a - lambda * v; e * e }.sum)
    val trace = (0 until d).map(i => cov(i)(i)).sum
    println(f"norm=${math.sqrt(axis.map(x => x * x).sum)}%.12f " +
      f"residual/lambda=${resid / lambda}%.3e " +
      f"explained=${lambda / trace}%.6f")
    spark.stop()
  }
}
