// Dev scratch: per-pass time matrix for a query subset under Bench's
// interleaved protocol — distinguishes monotone in-JVM degradation
// (pass index correlates with time) from random contention (it doesn't).
// Run: sbt "runMain graft.tools.ProbePassDrift q34_jaccard_pairs ..."
package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession

object ProbePassDrift {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val names = if (args.nonEmpty) args.toSeq else Seq(
      "q34_jaccard_pairs", "q165_incremental_dedup", "q104_winsorize",
      "q17_rollup", "q180_feature_hash", "q77_stat_aggs",
      "q253_ivfpq_search", "q119_bigram_lm")
    val spark = SparkSession.builder().master("local[32]")
      .withExtensions(new graft.functions.GraftExtensions)
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      // match Bench's r12 codegen-cache sizing: the probe exists to
      // attribute the RESIDUAL median/floor gap, so it must not
      // reintroduce the cache-miss recompilation the fix removed
      .config("spark.sql.codegen.cache.maxEntries", "10000")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // warm-up at the smallest fixture, like Bench
    names.foreach { n =>
      try graft.Checkpoints.freeingAfter(spark) {
        SparkEntry.queries(n)(spark, "/root/testdata/sf0.001")
          .write.format("noop").mode("overwrite").save()
      } catch { case _: Throwable => () }
    }
    System.gc(); Thread.sleep(200)
    val times = scala.collection.mutable.Map.empty[String, Vector[Double]]
      .withDefaultValue(Vector.empty)
    for (pass <- 1 to 5; n <- names) {
      graft.Checkpoints.freeingAfter(spark) {
        val t0 = System.nanoTime()
        SparkEntry.queries(n)(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
        times(n) = times(n) :+ (System.nanoTime() - t0) / 1e9
      }
    }
    println(f"${"query"}%-26s p1      p2      p3      p4      p5")
    names.foreach { n =>
      println(f"$n%-26s " + times(n).map(t => f"$t%7.2f").mkString(" "))
    }
    val byPass = (0 until 5).map(i => names.map(n => times(n)(i)).sum)
    println("pass sums: " + byPass.map(t => f"$t%7.2f").mkString(" "))
    spark.stop()
  }
}
