package graft.etl

import graft.{Tables, TestSpark}
import graft.sources._
import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The reference is a *database* ETL library — its tables live in
  * Postgres-family endpoints reached over a DB-API connection
  * (connections.py:42-174). This spec executes the engine's JDBC seam for
  * real against embedded Derby (ships in Spark's jars — zero egress):
  *
  *  - W5/W6 seed: create-table-from-df via `JdbcSink(mode = Overwrite)`
  *    (drop/recreate + load, operations.py:312-366);
  *  - W2 append: a second `JdbcSink` write lands in the same table
  *    (`if_exists="append"`, operations.py:130-212);
  *  - R1/C2 read-back: `JdbcSource` with fetchsize (≙ `stream_results`
  *    server cursor, connections.py:58,84) and a partitioned scan
  *    (partitionColumn/bounds/numPartitions ≙ the 100k-row chunk loop at
  *    operations.py:39-51, parallelized);
  *  - C3 replica routing: the read goes through `readReplica`
  *    (connections.py:118-121) — here the same Derby URL, proving the
  *    routed URL is the one that executes;
  *  - W11/W14 upsert: `UpsertKernel.upsert` with BOTH relations read from
  *    Derby and the merged result landed back in Derby
  *    (operations.py:515-609, staged merge :688-730), asserted row-for-row
  *    equal to the parquet-backed q04 kernel on the same inputs.
  */
class JdbcRoundTripSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  // keep derby.log out of the repo working tree
  System.setProperty("derby.system.home", "/tmp")

  private val dbDir = s"/tmp/graft-derby-${System.nanoTime()}"
  private val url = s"jdbc:derby:$dbDir;create=true"
  // credential resolution goes through the versioned backend (C1) — the
  // JDBC path reads the LATEST rotated version, like the reference
  private val secrets = {
    val p = FileSecretProvider(s"/tmp/graft-derby-sec-${System.nanoTime()}")
    p.addVersion("db_pw", "stale-rotated-out")
    p.addVersion("db_pw", "unused-by-derby")
    p
  }

  private def sink(table: String, mode: SaveMode) =
    JdbcSink(url, table, "app", "db_pw", secrets,
      batchSize = 5000, numPartitions = 2, mode = mode)

  private def source(table: String,
                     partitioned: Boolean = false,
                     bounds: (Long, Long) = (0L, 0L)) =
    if (partitioned)
      JdbcSource(url, table, "app", "db_pw", secrets, fetchSize = 5000,
        partitionColumn = Some("event_id"),
        lowerBound = Some(bounds._1), upperBound = Some(bounds._2),
        numPartitions = 4, readReplica = Some(url))
    else
      JdbcSource(url, table, "app", "db_pw", secrets, fetchSize = 5000,
        readReplica = Some(url))

  private def events: DataFrame = Tables.t(spark, TestSpark.Sf, "events")

  private def sortedRows(df: DataFrame) =
    df.select(col("event_id"), col("ts"), col("user_id"),
      col("event_type"), col("value"), col("props"))
      .orderBy("event_id").collect().toSeq

  test("seed (create-from-df), append, and partitioned read-back round-trip") {
    val old = events.filter(col("ts") < expr("TIMESTAMP '2024-01-20 00:00:00'"))
    val late = events.filter(col("ts") >= expr("TIMESTAMP '2024-01-20 00:00:00'"))

    // W5/W6: drop/recreate + load
    sink("events_rt", SaveMode.Overwrite).write(old)
    // W2: append into the now-existing table
    sink("events_rt", SaveMode.Append).write(late)

    val bounds = events.agg(min("event_id"), max("event_id")).head()
    val back = source("events_rt", partitioned = true,
      bounds = (bounds.getLong(0), bounds.getLong(1))).read(spark)
    // the stride spec really partitions the scan
    assert(back.rdd.getNumPartitions == 4)
    assert(back.count() == events.count())
    assert(sortedRows(back) == sortedRows(events))
  }

  test("fetchsize path without partitioning reads the same rows") {
    val n = source("events_rt").read(spark).count()
    assert(n == events.count())
  }

  test("upsert sourced from Derby lands in Derby and matches parquet q04") {
    val asOf = expr("TIMESTAMP '2024-01-20 00:00:00'")
    // stage the two relations the q04 scenario uses
    sink("events_old", SaveMode.Overwrite)
      .write(events.filter(col("ts") < asOf))
    sink("events_src", SaveMode.Overwrite)
      .write(events.filter(col("event_id") % 10 =!= 0))

    val oldDb = source("events_old").read(spark)
    val srcDb = source("events_src").read(spark)
    val merged = UpsertKernel.upsert(oldDb, srcDb, "event_id", "ts", asOf, 48)

    // staged merge: land the result back in the warehouse
    sink("events_merged", SaveMode.Overwrite).write(merged)
    val landed = source("events_merged").read(spark)

    val expected = graft.SparkEntry
      .queries("q04_upsert_kernel")(spark, TestSpark.Sf)
    assert(sortedRows(landed) == sortedRows(expected))
  }

  test("schema introspection round-trips column names and types") {
    // W4: the destination schema is discoverable from the endpoint itself
    val sch = source("events_rt").read(spark).schema
    assert(sch.fieldNames.toSet ==
      Set("event_id", "ts", "user_id", "event_type", "value", "props"))
    assert(sch("event_id").dataType.typeName == "long")
    assert(sch("ts").dataType.typeName == "timestamp")
    assert(sch("value").dataType.typeName == "double")
  }
}
