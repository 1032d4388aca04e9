// Dev scratch: q292 kernel-shape comparison — per-round checkpoint rolls
// (the unbounded-loop house pattern) vs a single 8-round lazy DAG (the
// fixed-depth alternative): rounds are FIXED here, so lineage is bounded
// and the rolls may be pure job-scheduling overhead.
// Run: sbt "runMain graft.tools.ProbeSsspShape [dir]"
package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

object ProbeSsspShape {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .withExtensions(new graft.functions.GraftExtensions)
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def edges(): DataFrame = {
      val off = lit(1000000L)
      val pair = graft.Tables.t(spark, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"))
        .join(graft.Tables.t(spark, dir, "lineitem")
          .select(col("l_orderkey"), col("l_suppkey")),
          col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("o_custkey").as("src"),
          (col("l_suppkey") + off).as("dst"))
        .agg(count(lit(1)).as("cnt"))
        .select(col("src"), col("dst"),
          (lit(1.0) / col("cnt").cast("double")).as("w"))
      pair.select(explode(array(
          struct(col("src"), col("dst"), col("w")),
          struct(col("dst").as("src"), col("src").as("dst"), col("w"))))
          .as("e"))
        .select(col("e.src").as("src"), col("e.dst").as("dst"),
          col("e.w").as("w"))
    }

    def lazyDag(rounds: Int): DataFrame = {
      val e = edges().repartition(col("src")).localCheckpoint(true,
        org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
      var d = e.agg(min(col("src")).as("node"))
        .select(col("node"), lit(0.0).as("dist"))
      var r = 0
      while (r < rounds) {
        val relaxed = e.join(d.withColumnRenamed("node", "src"), "src")
          .select(col("dst").as("node"),
            (col("dist") + col("w")).as("dist"))
        d = d.unionByName(relaxed).groupBy(col("node"))
          .agg(min(col("dist")).as("dist"))
        r += 1
      }
      d
    }

    def time(label: String, f: () => DataFrame): Unit = {
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        graft.Checkpoints.freeingAfter(spark) {
          f().write.format("noop").mode("overwrite").save()
        }
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[sssp-shape] $label%-16s median=${ts.sorted.apply(1)}%6.2f s")
    }

    // warm-up
    graft.ops.GraphQueries.weightedSssp(edges(), 8).write
      .format("noop").mode("overwrite").save()
    time("roll-per-round", () => graft.ops.GraphQueries.weightedSssp(edges(), 8))
    time("lazy-8-rounds", () => lazyDag(8))
    spark.stop()
  }
}
