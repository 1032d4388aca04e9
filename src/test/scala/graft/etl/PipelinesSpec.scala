package graft.etl

import graft.{Tables, TestSpark}
import graft.sources._
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The three reference pipelines (pipelines.py) as orchestration functions,
  * plus the source-ADT seams.
  */
class PipelinesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("seed pipeline snapshots a parquet source") {
    val dst = s"/tmp/graft-test-pipe-seed-${System.nanoTime()}"
    val out = Pipelines.seedParquet(spark, s"${TestSpark.Sf}/region.parquet", dst)
    assert(out.count() == 5)
  }

  test("update pipeline applies delta and reconciles deletions in place") {
    val dst = s"/tmp/graft-test-pipe-upd-${System.nanoTime()}"
    val ev = Tables.t(spark, TestSpark.Sf, "events")
    // destination = old snapshot (events before the 20th)
    ev.filter(col("ts") < expr("TIMESTAMP '2024-01-20 00:00:00'"))
      .write.parquet(dst)
    // source lost all event_id % 10 == 0 rows
    val srcPath = s"/tmp/graft-test-pipe-src-${System.nanoTime()}"
    ev.filter(col("event_id") % 10 =!= 0).write.parquet(srcPath)
    val out = Pipelines.updatePipeline(spark, ParquetSource(srcPath), dst,
      "event_id", "ts", expr("TIMESTAMP '2024-01-20 00:00:00'"), 48)
    // matches the oracle-checked q04 kernel on the same inputs
    val expected = graft.SparkEntry.queries("q04_upsert_kernel")(spark, TestSpark.Sf)
    assert(out.count() == expected.count())
    assert(out.filter(col("event_id") % 10 === 0).count() == 0)
  }

  test("flatfile pipeline loads multiple CSV tables") {
    val root = s"/tmp/graft-test-pipe-flat-${System.nanoTime()}"
    val csvN = s"$root-csv-nation"
    val csvR = s"$root-csv-region"
    Tables.t(spark, TestSpark.Sf, "nation")
      .write.option("header", "true").csv(csvN)
    Tables.t(spark, TestSpark.Sf, "region")
      .write.option("header", "true").csv(csvR)
    val out = Pipelines.flatfilePipeline(spark,
      Map("cb_nation" -> Seq(csvN), "cb_region" -> Seq(csvR)), root)
    assert(out("cb_nation").count() == 25)
    assert(out("cb_region").count() == 5)
  }

  test("json source round-trips rows through JSON lines") {
    val dir = s"/tmp/graft-test-json-${System.nanoTime()}"
    val nation = Tables.t(spark, TestSpark.Sf, "nation")
    nation.write.json(dir)
    val back = JsonSource(dir).read(spark)
    assert(back.count() == 25)
    assert(back.columns.sorted.sameElements(nation.columns.sorted))
  }

  test("orc source round-trips rows through ORC files") {
    val dir = s"/tmp/graft-test-orc-${System.nanoTime()}"
    val nation = Tables.t(spark, TestSpark.Sf, "nation")
    nation.write.orc(dir)
    val back = OrcSource(dir).read(spark)
    assert(back.count() == 25)
    assert(back.columns.sorted.sameElements(nation.columns.sorted))
  }

  test("binary-file source feeds whole files into the multimodal decoder") {
    val dir = s"/tmp/graft-test-bin-${System.nanoTime()}"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
    // one real PNG (via the JDK encoder), one text file the glob excludes
    val img = new java.awt.image.BufferedImage(
      20, 10, java.awt.image.BufferedImage.TYPE_INT_RGB)
    javax.imageio.ImageIO.write(img, "png", new java.io.File(s"$dir/a.png"))
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$dir/skip.txt"), "not an image")

    val files = BinaryFileSource(dir, globFilter = Some("*.png")).read(spark)
    assert(files.count() == 1)
    val meta = graft.llm.Multimodal.decodeMeta(
      files.select(monotonically_increasing_id().as("doc_id"),
        col("content").as("payload")))
      .collect()(0)
    assert(meta.getString(3) == "png")
    assert((meta.getLong(4), meta.getLong(5)) == (20L, 10L))
  }

  test("binary-file source fails loudly past the per-file size bound") {
    val dir = s"/tmp/graft-test-bin-big-${System.nanoTime()}"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/big.bin"),
      Array.fill[Byte](1024)(1))
    // the metadata pre-scan rejects at read() time, naming the offender —
    // before any content byte is materialized
    val e = intercept[IllegalArgumentException] {
      BinaryFileSource(dir, maxBytes = 100L).read(spark)
    }
    assert(e.getMessage.contains("big.bin"))
    // raising the bound admits the same file
    assert(BinaryFileSource(dir, maxBytes = 10000L).read(spark).count() == 1)
  }

  test("jdbc source configures the full option bundle without connecting") {
    val src = JdbcSource(
      url = "jdbc:postgresql://example.invalid:5432/db",
      table = "events",
      user = "reader",
      secretName = "db_password",
      secrets = MapSecretProvider(Map("db_password" -> "hunter2")),
      partitionColumn = Some("event_id"),
      readReplica = Some("jdbc:postgresql://replica.invalid:5432/db"))
    // construction + option resolution must work offline; load() would need
    // a live endpoint
    src.configure(spark)
  }

  test("bigquery source configures the full option bundle without connecting") {
    val src = BigQuerySource(
      project = "example-project",
      table = "analytics.events",
      credentialsSecret = Some("bq_key"),
      secrets = MapSecretProvider(Map("bq_key" -> "base64-key")),
      viewsEnabled = true,
      materializationDataset = Some("scratch"))
    // construction + option resolution offline (C5, connections.py:177-212);
    // load() needs the connector jar + a live endpoint
    src.configure(spark)
  }

  test("jdbc sink configures the append writer without connecting") {
    val sink = JdbcSink(
      url = "jdbc:postgresql://example.invalid:5432/db",
      table = "events_out",
      user = "writer",
      secretName = "db_password",
      secrets = MapSecretProvider(Map("db_password" -> "hunter2")),
      batchSize = 50000)
    // the write side of W2 (operations.py:130-212): writer assembles
    // offline; save() would need a live endpoint
    val df = Tables.t(spark, TestSpark.Sf, "region")
    sink.configure(df)
  }

  test("secret providers resolve and fail loudly") {
    assert(MapSecretProvider(Map("a" -> "b")).get("a") == "b")
    intercept[IllegalArgumentException] {
      MapSecretProvider(Map.empty).get("missing")
    }
  }
}
