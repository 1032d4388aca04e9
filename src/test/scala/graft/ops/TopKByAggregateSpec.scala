package graft.ops

import graft.TestSpark
import graft.functions.TopKByAggregate.topKBy
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Properties of the bounded-heap top-k aggregate: on random grouped
  * data (with deliberate value ties) and across partition counts (to
  * force partial-buffer merges), the emitted arrays must equal the
  * driver-side sort by (value DESC, id ASC) truncated to k — per group,
  * element order included.
  */
class TopKByAggregateSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def data(seed: Long, n: Int): Seq[(Int, Double, Long)] = {
    val rnd = new scala.util.Random(seed)
    // values drawn from a SMALL grid so ties are common — the id
    // tiebreak must then decide deterministically
    (0 until n).map(i =>
      (rnd.nextInt(7), (rnd.nextInt(20) * 0.5), i.toLong))
  }

  for (seed <- Seq(13L, 77L); parts <- Seq(1, 8); k <- Seq(1, 5)) {
    test(s"topKBy matches driver sort, seed=$seed parts=$parts k=$k") {
      import spark.implicits._
      val rows = data(seed, 500)
      val got = rows.toDF("g", "v", "id").repartition(parts)
        .groupBy($"g").agg(topKBy($"v", $"id", k).as("top"))
        .as[(Int, Seq[(Double, Long)])].collect().toMap
      val want = rows.groupBy(_._1).view.mapValues(
        _.map(r => (r._2, r._3))
          .sortWith((a, b) => a._1 > b._1 || (a._1 == b._1 && a._2 < b._2))
          .take(k)).toMap
      assert(got == want)
    }
  }

  test("top_k_by is reachable from SQL with a literal k") {
    val r = spark.sql(
      "SELECT top_k_by(v, id, 2) AS t FROM VALUES " +
        "(1.0D, 10L), (3.0D, 11L), (2.0D, 12L) AS x(v, id)")
      .head().getSeq[org.apache.spark.sql.Row](0)
    assert(r.map(_.getLong(1)) == Seq(11L, 12L))
  }

  test("null values and ids are skipped, not ranked") {
    import spark.implicits._
    val got = Seq((Some(5.0), Some(1L)), (None, Some(2L)),
        (Some(7.0), None), (Some(3.0), Some(4L)))
      .toDF("v", "id")
      .agg(topKBy($"v", $"id", 3).as("top"))
      .as[Seq[(Double, Long)]].head()
    assert(got == Seq((5.0, 1L), (3.0, 4L)))
  }

  for (seed <- Seq(13L, 77L); parts <- Seq(1, 8); k <- Seq(1, 5)) {
    test(s"bottomKBy matches driver sort, seed=$seed parts=$parts k=$k") {
      import spark.implicits._
      import graft.functions.BottomKByAggregate.bottomKBy
      val rows = data(seed, 500)
      val got = rows.toDF("g", "v", "id").repartition(parts)
        .groupBy($"g").agg(bottomKBy($"v", $"id", k).as("bot"))
        .as[(Int, Seq[(Double, Long)])].collect().toMap
      val want = rows.groupBy(_._1).view.mapValues(
        _.map(r => (r._2, r._3))
          .sortWith((a, b) => a._1 < b._1 || (a._1 == b._1 && a._2 < b._2))
          .take(k)).toMap
      assert(got == want)
    }
  }

  test("bottom_k_by is reachable from SQL with a literal k") {
    val r = spark.sql(
      "SELECT bottom_k_by(v, id, 2) AS t FROM VALUES " +
        "(1.0D, 10L), (3.0D, 11L), (2.0D, 12L) AS x(v, id)")
      .head().getSeq[org.apache.spark.sql.Row](0)
    assert(r.map(_.getLong(1)) == Seq(10L, 12L))
  }
}
