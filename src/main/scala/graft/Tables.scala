package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.expr

/** Fixture-table loader (TESTDATA.md / FIXTURES.md).
  *
  * Parquet stands in for the reference's external RDBMS/warehouse tables
  * (python-openetl keeps all data in Postgres-family or BigQuery —
  * `pyopenetl/connections.py:42-212`); a scan here is the analog of the
  * reference's `SELECT * FROM {table}` chunked read
  * (`pyopenetl/operations.py:39-51`), with Spark partitions playing the role
  * of the 100k-row pandas chunks.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def t(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    // events.ts is parquet TIMESTAMP(NANOS), which Spark's reader rejects
    // ([PARQUET_TYPE_ILLEGAL]); read it as raw nanos and floor to micros.
    // Whole-µs fixture values make this lossless, and flooring agrees with
    // how µs-precision engines compare against whole-second literals.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // A µs-precision fixture written without the UTC-adjusted annotation
    // (pyarrow timestamp[us]) would otherwise surface as TIMESTAMP_NTZ,
    // which unix_micros/window-range arithmetic reject. The session runs
    // in UTC, so reading it as an instant preserves every face value and
    // matches the oracle's naive-timestamp comparisons.
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    val df0 = spark.read.parquet(s"$sfDir/$name.parquet")
    val df =
      if (name == "events" && df0.schema("ts").dataType == org.apache.spark.sql.types.LongType)
        df0.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      else df0
    // Scan fanout (r14; guide §2.5 "input skew — one huge unsplittable
    // file"): the fixture tables are SINGLE-ROW-GROUP parquet files, so
    // however the session splits byte ranges, exactly one scan task
    // carries rows — and every per-row expression fused into the scan
    // (tokenization, hash regeneration, MinHash banding, n-gram
    // explodes) serializes on one core while the other 31 idle
    // (profiled: q165's dominant stage was 1 task × 8.2 s, q293's two
    // 1 task × 2.4 s each). One round-robin repartition right after the
    // read spreads the rows across the session's cores. Scale-adaptive,
    // not a local constant: the branch fires only when the file's own
    // split math (size / maxPartitionBytes) cannot reach the session's
    // parallelism — at production scale inputs are thousands of
    // splittable files, estimated splits exceed the core count, and the
    // plan is untouched (no shuffle added). Results are unaffected by
    // construction: every declared query is partitioning-order
    // independent (the oracle-hash discipline), and repartition(n) with
    // an explicit count is exempt from AQE coalescing.
    val par = spark.sparkContext.defaultParallelism
    val bytes = try java.nio.file.Files.size(
      java.nio.file.Paths.get(s"$sfDir/$name.parquet"))
    catch { case _: Throwable => Long.MaxValue }
    val splits = math.max(1L,
      bytes / spark.sessionState.conf.filesMaxPartitionBytes)
    if (splits < par) df.repartition(par) else df
  }
}
