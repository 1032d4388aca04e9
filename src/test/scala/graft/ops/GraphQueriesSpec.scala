package graft.ops

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Unit-level checks of the PageRank kernel on hand-computed graphs —
  * the oracle (q107) checks the fixture-scale result; these pin the
  * update rule itself.
  */
class GraphQueriesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def undirected(pairs: (Long, Long)*) = {
    val e = pairs.toDF("src", "dst")
    e.union(e.select(col("dst").as("src"), col("src").as("dst")))
  }

  test("one iteration on the 1-2-3 path graph matches the hand result") {
    // degrees: 1->1, 2->2, 3->1; n=3; r0 = 1/3 each
    // r1(1) = r1(3) = 0.15/3 + 0.85*(1/3)/2 = 0.05 + 0.85/6
    // r1(2) = 0.15/3 + 0.85*(1/3 + 1/3)     = 0.05 + 1.7/3
    val r = GraphQueries.pagerank(undirected((1L, 2L), (2L, 3L)), 1)
      .collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap
    assert(math.abs(r(1L) - (0.05 + 0.85 / 6)) < 1e-12)
    assert(math.abs(r(3L) - (0.05 + 0.85 / 6)) < 1e-12)
    assert(math.abs(r(2L) - (0.05 + 1.7 / 3)) < 1e-12)
  }

  test("rank mass is conserved (sums to 1 on a regular graph)") {
    // 4-cycle: every node degree 2 — PageRank stays uniform and total
    // mass is exactly preserved at every iteration
    val r = GraphQueries.pagerank(
      undirected((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L)), 3)
      .collect().map(_.getDouble(1))
    assert(r.length == 4)
    r.foreach(x => assert(math.abs(x - 0.25) < 1e-12))
  }

  test("higher-degree hubs outrank leaves on a star graph") {
    val r = GraphQueries.pagerank(
      undirected((1L, 10L), (2L, 10L), (3L, 10L), (4L, 10L)), 2)
      .collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap
    assert(r(10L) > r(1L))
    assert(math.abs(r.values.sum - 1.0) < 1e-9)
  }
}
