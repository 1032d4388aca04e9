package graft.ops

import graft.TestSpark
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

/** Property check for the fixed-round Bellman-Ford kernel: on random
  * weighted undirected graphs the distances must equal a driver-side
  * Dijkstra from the same seed (the smallest node id) — bit-for-bit,
  * because both accumulate each path as a left-associated chain of IEEE
  * adds and MIN picks among identical values. Rounds = nNodes − 1
  * guarantees fixpoint, so the comparison is against the true shortest
  * paths, independent of the fixture graph and the unrolled-CTE oracle.
  */
class SsspPropertiesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def graph(seed: Long, nNodes: Int, p: Double)
      : Seq[(Long, Long, Double)] = {
    val rnd = new scala.util.Random(seed)
    for {
      a <- 0L until nNodes.toLong
      b <- (a + 1) until nNodes.toLong
      if rnd.nextDouble() < p
    } yield (a, b, 1.0 / (1 + rnd.nextInt(9)).toDouble)
  }

  private def dijkstra(edges: Seq[(Long, Long, Double)])
      : Map[Long, Double] = {
    val adj = edges.flatMap { case (a, b, w) =>
      Seq(a -> (b, w), b -> (a, w)) }
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val src = edges.flatMap(e => Seq(e._1, e._2)).min
    val dist = scala.collection.mutable.Map(src -> 0.0)
    val done = scala.collection.mutable.Set.empty[Long]
    while (done.size < dist.size) {
      val (u, du) = dist.filterNot { case (n, _) => done(n) }
        .minBy { case (n, d) => (d, n) }
      done += u
      for ((v, w) <- adj.getOrElse(u, Nil)) {
        val cand = du + w
        if (!dist.contains(v) || cand < dist(v)) dist(v) = cand
      }
    }
    dist.toMap
  }

  for (seed <- Seq(11L, 47L)) {
    test(s"weightedSssp matches driver Dijkstra, seed=$seed") {
      import spark.implicits._
      val es = graph(seed, 40, 0.08)
      val sym = es.flatMap { case (a, b, w) => Seq((a, b, w), (b, a, w)) }
      val got = GraphQueries
        .weightedSssp(sym.toDF("src", "dst", "w"), es.size.min(39))
        .as[(Long, Double)].collect().toMap
      val want = dijkstra(es)
      assert(got.keySet == want.keySet)
      for ((n, d) <- want) assert(got(n) == d,
        s"node $n: engine ${got(n)} != dijkstra $d")
    }
  }

  test("weightedSssp at an insufficient round count is a mid-relaxation " +
    "snapshot (the oracle's guard round exists to catch exactly this)") {
    import spark.implicits._
    // path graph 0-1-2-3 (unit weights): after 2 rounds node 3 is
    // unreached; after 3 it converges
    val es = Seq((0L, 1L, 1.0), (1L, 2L, 1.0), (2L, 3L, 1.0))
    val sym = es.flatMap { case (a, b, w) => Seq((a, b, w), (b, a, w)) }
    val two = GraphQueries.weightedSssp(sym.toDF("src", "dst", "w"), 2)
      .as[(Long, Double)].collect().toMap
    assert(!two.contains(3L) && two(2L) == 2.0)
    val three = GraphQueries.weightedSssp(sym.toDF("src", "dst", "w"), 3)
      .as[(Long, Double)].collect().toMap
    assert(three(3L) == 3.0)
  }
}
