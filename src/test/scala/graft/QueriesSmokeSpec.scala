package graft

import org.scalatest.funsuite.AnyFunSuite

/** Every declared query runs on sf0.001 and yields a sane result; queries
  * whose semantics guarantee output are asserted non-empty. Oracle equality
  * is covered by the driver gate (tools/local_verify.py replica).
  */
class QueriesSmokeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  // may legitimately be empty at tiny SF (near-dup pairs need density)
  private val mayBeEmpty = Set("q34_jaccard_pairs",
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

  // q44/q63 are declared as accuracy CONTRACTS (r9): the sketch estimate
  // stays out of the hashed columns and the output carries per-group
  // verdict booleans against the exact twin. The spec asserts every
  // declared verdict holds at this SF too (the driver checks sf0.01).
  test("approx_percentile verdicts hold against the exact bands (q63)") {
    SparkEntry.queries("q63_approx_percentiles")(spark, TestSpark.Sf)
      .collect().foreach { r =>
        Seq("median_qty_in_band", "p90_price_in_band", "p25_disc_in_band")
          .foreach { c =>
            assert(r.getAs[Boolean](c),
              s"${r.getString(0)}: $c is false at sf0.001")
          }
      }
  }

  test("approx_count_distinct verdicts hold against the exact twin (q44)") {
    SparkEntry.queries("q44_approx_distinct")(spark, TestSpark.Sf)
      .collect().foreach { r =>
        assert(r.getAs[Boolean]("within_5pct"),
          s"${r.getString(0)}: HLL++ drifted past its 5% rsd at sf0.001")
      }
  }
}
