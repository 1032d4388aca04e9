// Dev scratch: dump one query's result to parquet for oracle diffing.
// Run: sbt "runMain graft.tools.DumpQuery q102_bigram_pmi /tmp/q102"
package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession

object DumpQuery {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val Array(name, outDir) = args
    val spark = SparkSession.builder().master("local[8]")
      .withExtensions(new graft.functions.GraftExtensions)
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    SparkEntry.queries(name)(spark, sfDir)
      .coalesce(1).write.mode("overwrite").parquet(outDir)
    spark.stop()
  }
}
