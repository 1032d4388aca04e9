package graft.etl

import graft.{Tables, TestSpark}
import org.scalatest.funsuite.AnyFunSuite

/** Seed (W9) and CSV ingest (W10/W13) round-trips through real files. */
class IngestSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("seed round-trips schema and rows (snapshot copy)") {
    val dst = s"/tmp/graft-test-seed-${System.nanoTime()}"
    Seed.seed(spark, s"${TestSpark.Sf}/nation.parquet", dst, Seq("n_nationkey"))
    val out = Seed.readBack(spark, dst)
    val src = spark.read.parquet(s"${TestSpark.Sf}/nation.parquet")
    assert(out.count() == src.count())
    assert(out.schema == src.schema)
  }

  test("csv ingest infers schema and preserves rows (flatfile pipeline)") {
    val csvDir = s"/tmp/graft-test-csv-${System.nanoTime()}"
    val dst    = s"/tmp/graft-test-csv-out-${System.nanoTime()}"
    val nation = Tables.t(spark, TestSpark.Sf, "nation")
    nation.write.option("header", "true").csv(csvDir)
    CsvIngest.ingest(spark, dst, csvDir)
    val back = spark.read.parquet(dst)
    assert(back.count() == nation.count())
    assert(back.columns.sorted.sameElements(nation.columns.sorted))
  }

  test("safe insert splits conflicts from insertables") {
    import spark.implicits._
    val existing = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    val incoming = Seq((2L, "b2"), (3L, "c")).toDF("id", "v")
    assert(SafeInsert.conflicts(incoming, existing, "id")
      .collect().map(_.getLong(0)).toSeq == Seq(2L))
    assert(SafeInsert.insertable(incoming, existing, "id")
      .collect().map(_.getLong(0)).toSeq == Seq(3L))
  }
}
