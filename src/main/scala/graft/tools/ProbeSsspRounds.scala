// Dev scratch: how many Bellman-Ford rounds does q292's weighted SSSP
// take to fixpoint at each fixture scale? The declared kernel runs a
// FIXED round count matched to the oracle's unroll depth; this probe
// pins that count (plus margin) so the oracle's convergence guard stays
// a safety net, not a live tripwire.
// Run: sbt "runMain graft.tools.ProbeSsspRounds [dirs...]"
package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object ProbeSsspRounds {
  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01",
        "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .withExtensions(new graft.functions.GraftExtensions)
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (dir <- dirs) {
      val pairs = graft.Tables.t(spark, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"))
        .join(graft.Tables.t(spark, dir, "lineitem")
          .select(col("l_orderkey"), col("l_suppkey")),
          col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("o_custkey").as("src"),
          (col("l_suppkey") + lit(1000000L)).as("dst"))
        .agg(count(lit(1)).as("cnt"))
        .collect().map(r => (r.getLong(0), r.getLong(1),
          1.0 / r.getLong(2).toDouble))
      // sequential Bellman-Ford over the symmetrized list, counting
      // rounds until no distance moves (the engine relaxes every edge
      // each round too, so round counts are directly comparable)
      val es = pairs.flatMap { case (a, b, w) =>
        Seq((a, b, w), (b, a, w)) }
      val src = es.map(_._1).min
      val dist = scala.collection.mutable.Map(src -> 0.0)
      var rounds = 0
      var changed = true
      while (changed) {
        changed = false
        val snap = dist.toMap
        for ((u, v, w) <- es; du <- snap.get(u)) {
          val cand = du + w
          if (!dist.contains(v) || cand < dist(v)) {
            dist(v) = cand; changed = true
          }
        }
        rounds += 1
      }
      println(s"[sssp-rounds] $dir: pairs=${pairs.length} " +
        s"rounds_to_fixpoint=$rounds reached=${dist.size}")
    }
    spark.stop()
  }
}
