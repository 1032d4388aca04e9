package graft.ops

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Property check for the oriented triangle join: on random undirected
  * graphs (dense enough for real triangle structure, two label blocks to
  * exercise the block key) the per-node counts must equal a plain
  * in-driver enumeration over the adjacency sets. This is the
  * each-triangle-found-exactly-once claim of the a<b<c orientation
  * tested independently of the mutual-kNN construction and the oracle.
  */
class TrianglePropertiesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def graph(seed: Long, nNodes: Int, p: Double)
      : Seq[(Int, Long, Long)] = {
    val rnd = new scala.util.Random(seed)
    for {
      label <- Seq(0, 1)
      a <- 0L until nNodes.toLong
      b <- (a + 1) until nNodes.toLong
      if rnd.nextDouble() < p
    } yield (label, a, b)
  }

  private def naive(edges: Seq[(Int, Long, Long)])
      : Map[(Int, Long), Long] = {
    val adj = edges.flatMap { case (l, a, b) => Seq((l, a) -> b, (l, b) -> a) }
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val counts = scala.collection.mutable.Map.empty[(Int, Long), Long]
      .withDefaultValue(0L)
    for {
      (l, a, b) <- edges
      c <- adj((l, a)).intersect(adj((l, b)))
      if c > b // a < b < c: count each triangle once
    } {
      counts((l, a)) += 1; counts((l, b)) += 1; counts((l, c)) += 1
    }
    counts.toMap
  }

  for (seed <- Seq(3L, 11L, 99L)) {
    test(s"oriented triangle join is exact on random graph seed=$seed") {
      import spark.implicits._
      val edges = graph(seed, 14, 0.35)
      val got = GraphQueries.triangleCounts(
        edges.toDF("label", "a_id", "b_id"))
        .collect()
        .map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
      assert(got == naive(edges))
    }
  }
}
