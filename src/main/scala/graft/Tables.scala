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
    val df = spark.read.parquet(s"$sfDir/$name.parquet")
    if (name == "events" && df.schema("ts").dataType == org.apache.spark.sql.types.LongType)
      df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
    else df
  }
}
