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
    // r9: q44 now carries its accuracy contract as query output (the
    // q192 pattern — exact count + within-bound verdict, both
    // oracle-checked). The spec independently recomputes the raw
    // estimate and checks the verdict column agrees with it.
    val rows = graft.SparkEntry.queries("q44_approx_distinct")(
      spark, TestSpark.Sf).collect()
    assert(rows.nonEmpty)
    val raw = graft.Tables.t(spark, TestSpark.Sf, "lineitem")
      .groupBy(org.apache.spark.sql.functions.col("l_returnflag"))
      .agg(org.apache.spark.sql.functions
        .approx_count_distinct(org.apache.spark.sql.functions
          .col("l_partkey")).as("a"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      val exact = r.getAs[Long]("exact_parts").toDouble
      assert(exact > 0)
      val approx = raw(r.getString(0)).toDouble
      val relErr = math.abs(approx - exact) / exact
      assert(relErr <= 0.05,
        s"group ${r.get(0)}: approx=$approx exact=$exact relErr=$relErr")
      assert(r.getAs[Boolean]("within_5pct") == (relErr <= 0.05),
        s"group ${r.get(0)}: verdict disagrees with recomputed error")
    }
  }

  test("q63 approx percentiles land in the exact ±1%-rank band") {
    // r9: q63's output is now the accuracy contract itself — each
    // estimate must sit between the exact (p−1%) and (p+1%) percentiles
    // (accuracy 10000 ⇒ rank error ≤ 1e-4·n, two orders under the
    // band). The spec checks every verdict TRUE and that n matches the
    // q56 exact twin on the same fixture.
    def byFlag(q: String) = graft.SparkEntry.queries(q)(spark, TestSpark.Sf)
      .collect().map(r => r.getString(0) -> r).toMap
    val exact = byFlag("q56_percentiles")
    val approx = byFlag("q63_approx_percentiles")
    assert(exact.keySet == approx.keySet && exact.nonEmpty)
    for (flag <- approx.keys;
         c <- Seq("median_qty_in_band", "p90_price_in_band",
           "p25_disc_in_band"))
      assert(approx(flag).getAs[Boolean](c), s"$flag.$c out of band")
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
