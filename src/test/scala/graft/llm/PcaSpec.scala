package graft.llm

import graft.{Tables, TestSpark}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Quantitative bounds for q140's PC1 power iteration — the no-oracle
  * contract (eigensolvers aren't SQL-expressible, so no DuckDB twin
  * exists): the returned axis must actually be the leading eigenvector of
  * the exact covariance matrix, verified three independent ways.
  */
class PcaSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def emb = Tables.t(spark, TestSpark.Sf, "embeddings")

  private lazy val (axis, lambda, mean) = SimilarityQueries.pc1Axis(emb)

  private lazy val cov: Array[Array[Double]] = {
    val d = SimilarityQueries.Dim
    val m = Array.ofDim[Double](d, d)
    SimilarityQueries.covUpper(emb).collect().foreach { r =>
      val i = r.getLong(0).toInt
      val j = r.getLong(1).toInt
      m(i)(j) = r.getDouble(2)
      m(j)(i) = r.getDouble(2)
    }
    m
  }

  test("axis is unit length with the sign convention applied") {
    assert(math.abs(axis.map(x => x * x).sum - 1.0) < 1e-12)
    val k = axis.indices.maxBy(i => math.abs(axis(i)))
    assert(axis(k) > 0, "largest-magnitude component must be positive")
  }

  test("eigen residual: ||C v - lambda v|| <= 1e-8 * lambda") {
    val d = axis.length
    val cv = Array.tabulate(d)(i =>
      (0 until d).map(j => cov(i)(j) * axis(j)).sum)
    val resid = math.sqrt(
      cv.zip(axis).map { case (a, b) => val r = a - lambda * b; r * r }.sum)
    assert(lambda > 0)
    assert(resid <= 1e-8 * lambda,
      s"residual $resid vs lambda $lambda — power iteration not converged")
  }

  test("Rayleigh quotient dominates every coordinate-axis variance") {
    val maxDiag = cov.indices.map(i => cov(i)(i)).max
    assert(lambda >= maxDiag - 1e-12,
      s"lambda $lambda below max diagonal variance $maxDiag")
  }

  test("q140 projection variance equals lambda (centered data)") {
    val scores = graft.SparkEntry
      .queries("q140_pca_projection")(spark, TestSpark.Sf)
      .select(col("pc1")).collect().map(_.getDouble(0))
    val n = scores.length.toDouble
    val mu = scores.sum / n
    // population variance to match covUpper's /n convention; scores are
    // rounded to 1e-4, so allow the rounding-induced slack
    val variance = scores.map(x => (x - mu) * (x - mu)).sum / n
    assert(math.abs(variance - lambda) <= 1e-3 * math.max(lambda, 1.0),
      s"projection variance $variance vs lambda $lambda")
    // centering: the mean projection of centered vectors is ~0
    assert(math.abs(mu) < 1e-3, s"projections not centered: mean $mu")
  }
}
