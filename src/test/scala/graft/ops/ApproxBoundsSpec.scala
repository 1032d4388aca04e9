package graft.ops

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Quantitative error bounds for the two no-oracle sketch aggregations —
  * the exact-twin pattern DedupSpec uses for LSH recall, applied to q44
  * (HLL++ vs q16-style exact distinct) and q63 (GK quantile sketch vs
  * q56's exact interpolated percentiles). Sketch internals are engine-
  * specific so no DuckDB oracle exists, but the error vs the exact answer
  * is a hard contract: HLL++ at default precision carries ~2.3% relative
  * standard deviation, and approx_percentile at accuracy 10000 bounds
  * rank error at n/10000 — both comfortably inside the 5% asserted here.
  */
class ApproxBoundsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("q44 approx distinct within 5% of exact per group") {
    val rows = graft.SparkEntry.queries("q44_approx_distinct")(
      spark, TestSpark.Sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val approx = r.getAs[Long]("approx_parts").toDouble
      val exact = r.getAs[Long]("exact_parts").toDouble
      assert(exact > 0)
      val relErr = math.abs(approx - exact) / exact
      assert(relErr <= 0.05,
        s"group ${r.get(0)}: approx=$approx exact=$exact relErr=$relErr")
    }
  }

  test("q63 approx percentiles within 5% of q56 exact per group") {
    def byFlag(q: String) = graft.SparkEntry.queries(q)(spark, TestSpark.Sf)
      .collect().map(r => r.getString(0) -> r).toMap
    val exact = byFlag("q56_percentiles")
    val approx = byFlag("q63_approx_percentiles")
    assert(exact.keySet == approx.keySet && exact.nonEmpty)
    // column pairs share names across the twins. The sketch returns a
    // REAL data value at bounded rank error while exact interpolates
    // between grid points, so the tolerance is 5% relative OR one data
    // grid step (quantity integers, discount hundredths), whichever is
    // larger — a 0.025 interpolated discount vs the nearest real 0.02 is
    // sketch-perfect, not 20% error.
    val gridStep = Map("median_qty" -> 1.0, "p90_price" -> 1.0,
      "p25_disc" -> 0.011)
    for (flag <- exact.keys; c <- Seq("median_qty", "p90_price", "p25_disc")) {
      val e = exact(flag).getAs[Double](c)
      val a = approx(flag).getAs[Double](c)
      val tol = math.max(0.05 * math.abs(e), gridStep(c))
      assert(math.abs(a - e) <= tol,
        s"$flag.$c: approx=$a exact=$e tol=$tol")
    }
    for (flag <- exact.keys)
      assert(exact(flag).getAs[Long]("n") == approx(flag).getAs[Long]("n"))
  }

  test("q192 HLL rolling actives within 10% of q176 exact per window") {
    // q192 now carries its own bound check (r9: the exact counts + the
    // |est - exact|/exact <= 10% verdicts are THE query output, so the
    // driver's oracle compare enforces the accuracy contract). The spec
    // checks the same three things independently: exact columns equal
    // the q176 twin's, and every verdict is true.
    val exact = graft.SparkEntry.queries("q176_rolling_active")(
      spark, graft.TestSpark.Sf)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    val rows = graft.SparkEntry.queries("q192_hll_rolling")(
      spark, graft.TestSpark.Sf).collect()
    assert(rows.map(_.getLong(0)).toSet == exact.keySet,
      "same window set as the exact twin")
    rows.foreach { r =>
      val day = r.getLong(0)
      assert((r.getLong(1), r.getLong(2)) == exact(day),
        s"day $day exact columns must equal the q176 twin's")
      assert(r.getBoolean(3), s"day $day dau estimate out of 10% bound")
      assert(r.getBoolean(4), s"day $day wau7 estimate out of 10% bound")
    }
  }
}
