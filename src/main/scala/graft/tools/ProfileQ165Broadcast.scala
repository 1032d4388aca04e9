// Dev scratch: q165 with vs without broadcast joins at sf0.1 — the sf1
// ScaleProof inversion (faster at 10x after the BHJ->SMJ flip) suggested
// the sf0.1 broadcast path might be the slow one. MEASURED (this box,
// clean window): bcast=true median 8.40 s, bcast=false 8.49 s — the flip
// is NOT the cause; the cost is the probe/verify/decision branches each
// re-running the lazy tokenize pipeline (checkpointing it measured +2 s,
// see the q165 comment), and the sf1 inversion is partition-utilization:
// 5k docs at sf0.1 underfill 32 cores in the PPJoin stages.
package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession

object ProfileQ165Broadcast {
  def main(args: Array[String]): Unit = {
    val sfDir = "/root/testdata/sf0.1"
    def run(bcast: Boolean): Unit = {
      val b = SparkSession.builder().master("local[32]")
        .withExtensions(new graft.functions.GraftExtensions)
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
      val s = (if (bcast) b else b
        .config("spark.sql.autoBroadcastJoinThreshold", "-1")
        .config("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1"))
        .getOrCreate()
      s.sparkContext.setLogLevel("ERROR")
      val fn = SparkEntry.queries("q165_incremental_dedup")
      fn(s, sfDir).write.format("noop").mode("overwrite").save() // warm
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        fn(s, sfDir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"bcast=$bcast%-5s median=${ts.sorted.apply(1)}%.2f all=${ts.map(t => f"$t%.2f").mkString(",")}")
      s.stop()
    }
    run(true)
    run(false)
  }
}
