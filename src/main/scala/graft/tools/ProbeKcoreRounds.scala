// Dev scratch: how many peel rounds does the scaled-k k-core take at each
// fixture scale? Rounds × edges is the loop's true cost; a growing round
// count explains a superlinear wall-clock ratio without any per-round
// quadratic. Run: sbt "runMain graft.tools.ProbeKcoreRounds [dirs...]"
package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object ProbeKcoreRounds {
  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.1", "scaledata/sf1", "scaledata/sf2")
    val spark = SparkSession.builder().master("local[32]")
      .withExtensions(new graft.functions.GraftExtensions)
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (dir <- dirs; kk <- Seq(2, 3)) {
      val emb = graft.Tables.t(spark, dir, "embeddings")
      val cells = math.ceil(math.sqrt(emb.count().toDouble)).toInt
      val edges = graft.llm.SimilarityQueries
        .mutualKnnEdgesScaledK(emb, 5, cells, 2)
        .select(col("label"), col("a_id"), col("b_id"))
        .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
      // sequential peel, counting rounds to fixpoint (k = 3, per label
      // but rounds counted globally — the engine's loop is global too)
      var es = edges.toSeq
      var rounds = 0
      var changed = true
      while (changed) {
        val deg = es.flatMap(e => Seq((e._1, e._2), (e._1, e._3)))
          .groupBy(identity).view.mapValues(_.size).toMap
        val next = es.filter(e =>
          deg((e._1, e._2)) >= kk && deg((e._1, e._3)) >= kk)
        changed = next.size != es.size
        es = next
        rounds += 1
      }
      println(s"[kcore-rounds] $dir k=$kk: edges=${edges.length} " +
        s"rounds_to_fixpoint=$rounds surviving=${es.size}")
    }
    spark.stop()
  }
}
