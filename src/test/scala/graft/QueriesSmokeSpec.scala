package graft

import org.scalatest.funsuite.AnyFunSuite

/** Every declared query runs on sf0.001 and yields a sane result; queries
  * whose semantics guarantee output are asserted non-empty. Oracle equality
  * is covered by the driver gate (tools/local_verify.py replica).
  */
class QueriesSmokeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  // may legitimately be empty at tiny SF (no customer without orders, etc.)
  private val mayBeEmpty = Set("q14_anti_join", "q34_jaccard_pairs",
    "q36_minhash_pairs", "q50_shingle_jaccard", "q49_embedding_neardup",
    "q71_dedup_clusters")

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name runs on sf0.001") {
      val n = fn(spark, TestSpark.Sf).count()
      if (!mayBeEmpty(name)) assert(n > 0, s"$name returned no rows")
    }
  }

  test("entry flagship returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key has a matching query") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracles without queries: $missing")
  }

  test("pivot fills absent combinations with 0 (fixtures never exercise it)") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val df = Seq((1L, "click"), (1L, "view"), (2L, "click"))
      .toDF("user_id", "event_type")
      .groupBy(col("user_id"))
      .pivot("event_type", Seq("click", "error", "view"))
      .agg(count(lit(1))).na.fill(0L)
      .orderBy("user_id")
    val rows = df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.toSeq == Seq((1L, 1L, 0L, 1L), (2L, 1L, 0L, 0L)))
  }

  test("approx_percentile tracks the exact percentiles (q63 vs q56)") {
    val approx = SparkEntry.queries("q63_approx_percentiles")(spark, TestSpark.Sf)
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2)))
      .toMap
    val exact = SparkEntry.queries("q56_percentiles")(spark, TestSpark.Sf)
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2)))
      .toMap
    exact.foreach { case (flag, (med, p90)) =>
      val (aMed, aP90) = approx(flag)
      // approx returns a real data point; exact interpolates — allow the
      // gap of one observation at this accuracy
      assert(math.abs(aMed - med) / math.max(med, 1.0) < 0.05,
        s"$flag median: $aMed vs $med")
      assert(math.abs(aP90 - p90) / math.max(p90, 1.0) < 0.05,
        s"$flag p90: $aP90 vs $p90")
    }
  }

  test("approx_count_distinct is within 10% of exact (q44)") {
    SparkEntry.queries("q44_approx_distinct")(spark, TestSpark.Sf)
      .collect().foreach { r =>
        val (approx, exact) = (r.getLong(1), r.getLong(2))
        assert(math.abs(approx - exact).toDouble / exact < 0.1,
          s"approx $approx vs exact $exact")
      }
  }
}
