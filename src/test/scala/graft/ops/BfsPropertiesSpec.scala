package graft.ops

import graft.TestSpark
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

/** Property check for the frontier-delta BFS: on random undirected
  * graphs the hop distances must equal a plain in-driver BFS from the
  * same seed (the smallest node id), and nodes beyond maxHops must be
  * absent. Exercises the rolled-checkpoint loop independently of the
  * fixture graph and the recursive-CTE oracle.
  */
class BfsPropertiesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def graph(seed: Long, nNodes: Int, p: Double): Seq[(Long, Long)] = {
    val rnd = new scala.util.Random(seed)
    for {
      a <- 0L until nNodes.toLong
      b <- (a + 1) until nNodes.toLong
      if rnd.nextDouble() < p
    } yield (a, b)
  }

  private def naive(edges: Seq[(Long, Long)], maxHops: Int)
      : Map[Long, Int] = {
    val adj = edges.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val src = edges.flatMap(e => Seq(e._1, e._2)).min
    val dist = scala.collection.mutable.Map(src -> 0)
    var frontier = Seq(src)
    for (h <- 1 to maxHops) {
      frontier = frontier.flatMap(n => adj.getOrElse(n, Nil))
        .distinct.filterNot(dist.contains)
      frontier.foreach(n => dist(n) = h)
    }
    dist.toMap
  }

  for (seed <- Seq(5L, 23L); maxHops <- Seq(2, 4)) {
    test(s"bfsHops matches driver BFS, seed=$seed maxHops=$maxHops") {
      import spark.implicits._
      val es = graph(seed, 60, 0.04)
      val sym = es.flatMap { case (a, b) => Seq((a, b), (b, a)) }
      val got = GraphQueries.bfsHops(sym.toDF("src", "dst"), maxHops)
        .select(col("node").cast("long"), col("dist").cast("int"))
        .as[(Long, Int)].collect().toMap
      assert(got == naive(es, maxHops))
    }
  }
}
