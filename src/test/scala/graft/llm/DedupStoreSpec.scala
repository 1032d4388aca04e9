package graft.llm

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class DedupStoreSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def store(): String = java.nio.file.Files
    .createTempDirectory("graft_dedupstore").toString + "/seen"

  test("cross-run dedup drops previously seen content and grows the store") {
    import spark.implicits._
    val root = store()

    // run 1: two distinct texts, one repeated inside the batch
    val b1 = Seq((1L, "alpha"), (2L, "beta"), (3L, "alpha"))
      .toDF("doc_id", "text")
    val n1 = DedupStore.dedupeAgainstStore(b1, root).collect()
    assert(n1.map(_.getAs[Long]("doc_id")).sorted.toSeq == Seq(1L, 2L),
      "lowest-id canonical per content, batch-internal repeat dropped")

    // run 2: one repeat of run 1, one new text
    val b2 = Seq((10L, "beta"), (11L, "gamma")).toDF("doc_id", "text")
    val n2 = DedupStore.dedupeAgainstStore(b2, root).collect()
    assert(n2.map(_.getAs[Long]("doc_id")).toSeq == Seq(11L),
      "content seen in a previous run must not re-enter")

    // run 3: nothing new
    val b3 = Seq((20L, "alpha"), (21L, "gamma")).toDF("doc_id", "text")
    assert(DedupStore.dedupeAgainstStore(b3, root).isEmpty)

    // the store carries exactly one fingerprint per distinct content,
    // attributed to its first-seen key
    val seen = graft.etl.Snapshot.read(spark, root)
      .orderBy("doc_id").collect()
    assert(seen.map(_.getAs[Long]("doc_id")).toSeq == Seq(1L, 2L, 11L))
    assert(seen.map(_.getAs[String]("content_hash")).distinct.length == 3)
  }

  test("novel frame returned by a run is stable after its own commit") {
    import spark.implicits._
    val root = store()
    val b1 = Seq((1L, "x"), (2L, "y")).toDF("doc_id", "text")
    val novel = DedupStore.dedupeAgainstStore(b1, root)
    // consume AFTER the commit: must still report this run's novelty
    // against the pre-commit store, not filter itself out
    assert(novel.count() == 2)
    assert(novel.agg(count(lit(1))).head().getLong(0) == 2)
  }
}
