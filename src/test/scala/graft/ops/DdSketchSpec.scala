package graft.ops

import graft.TestSpark
import graft.functions.DdSketchAgg
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** DDSketch aggregate invariants beyond the streaming twin
  * (StreamingSpec) and the declared oracle contract (q287): the α
  * relative-error guarantee on random data, partitioning invariance of
  * the evaluated array, the bounded-state collapse path, and the
  * defensive deserialize.
  */
class DdSketchSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val alpha = 0.01

  private def randomValues(seed: Int, n: Int): Seq[Double] = {
    val rnd = new scala.util.Random(seed)
    // three decades of positive values — the log-bucket stress shape
    (1 to n).map(_ => math.exp(rnd.nextGaussian() * 2.0 + 3.0))
  }

  test("rank-walk estimates hold the alpha band against exact order stats") {
    import spark.implicits._
    for (seed <- Seq(3, 17, 59)) {
      val xs = randomValues(seed, 5000)
      val pairs = xs.toDF("x")
        .agg(DdSketchAgg.ddSketch(col("x"), alpha).as("dd"))
        .head().getSeq[Long](0).toIndexedSeq
      val sorted = xs.sorted
      for (q <- Seq(0.01, 0.1, 0.5, 0.9, 0.95, 0.99, 1.0)) {
        val r = math.max(1, math.ceil(q * xs.size).toInt)
        val exact = sorted(r - 1)
        val est = DdSketchAgg.quantile(pairs, alpha, q)
        assert(math.abs(est - exact) <= alpha * exact + 1e-12,
          s"seed=$seed q=$q: est $est vs exact $exact")
      }
    }
  }

  test("the evaluated array is partitioning-invariant (exact merge)") {
    import spark.implicits._
    val xs = randomValues(11, 3000)
    def sketchAt(parts: Int) = xs.toDF("x").repartition(parts)
      .agg(DdSketchAgg.ddSketch(col("x"), alpha).as("dd"))
      .head().getSeq[Long](0)
    assert(sketchAt(1) == sketchAt(7),
      "bucket-wise-sum merge must fold identically at any partitioning")
  }

  test("collapse keeps state under maxBuckets and upper quantiles in band") {
    import spark.implicits._
    val xs = randomValues(23, 4000)
    val pairs = xs.toDF("x")
      .agg(DdSketchAgg.ddSketch(col("x"), alpha, maxBuckets = 16).as("dd"))
      .head().getSeq[Long](0).toIndexedSeq
    assert(pairs.size <= 32, s"state exceeded maxBuckets: ${pairs.size / 2}")
    // total count survives every collapse
    assert((1 until pairs.length by 2).map(pairs).sum == xs.size)
    // collapses only ever merge the LOWEST buckets (paper §2.3), so
    // quantiles that land ABOVE the collapsed mass keep the α band —
    // the maximum always does (the top bucket is never collapsed);
    // quantiles inside the collapsed mass blur by design
    val exactMax = xs.max
    val est = DdSketchAgg.quantile(pairs, alpha, 1.0)
    assert(math.abs(est - exactMax) <= alpha * exactMax + 1e-12,
      s"max after collapse: est $est vs exact $exactMax")
  }

  test("nonpositive values count into the underflow bucket as 0.0") {
    import spark.implicits._
    val pairs = Seq(-5.0, 0.0, 1.0, 2.0, 3.0).toDF("x")
      .agg(DdSketchAgg.ddSketch(col("x"), alpha).as("dd"))
      .head().getSeq[Long](0).toIndexedSeq
    assert(pairs(0) == Int.MinValue.toLong && pairs(1) == 2L,
      "underflow bucket must lead the array with the <=0 count")
    assert(DdSketchAgg.quantile(pairs, alpha, 0.2) == 0.0)
    assert(DdSketchAgg.quantile(pairs, alpha, 1.0) > 0.0)
  }

  test("deserialize rejects truncated or foreign buffers loudly") {
    import org.apache.spark.sql.graftbridge.ExprBridge
    val agg = graft.functions.DdSketchAgg(
      ExprBridge.expression(col("x")), alpha)
    val buf = agg.createAggregationBuffer()
    buf.update(3, 7L)
    val bytes = agg.serialize(buf)
    assert(agg.deserialize(bytes).toSeq == buf.toSeq)
    val e = intercept[IllegalArgumentException] {
      agg.deserialize(bytes.dropRight(4))
    }
    assert(e.getMessage.contains("expected"))
  }
}
