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

  test("lsh postings store: a torn delta is invisible and the retried " +
       "landing equals the from-scratch postings build") {
    import spark.implicits._
    import org.apache.hadoop.fs.Path
    import graft.etl.Snapshot
    val mk = (rows: Seq[(Long, String)]) => rows.toDF("doc_id", "text")
    val corpus = mk(Seq(1L -> "alpha beta gamma delta",
      2L -> "epsilon zeta eta theta", 3L -> "iota kappa lambda mu"))
    val dump = mk(Seq(10L -> "nu xi omicron pi", 11L -> "rho sigma tau"))
    val root = "/tmp/graft_lshidx_crash_" + System.nanoTime()
    Snapshot.commit(DedupStore.bandPostings(corpus), root)
    val baseCount = corpus.count() * DedupQueries.Bands
    assert(Snapshot.read(spark, root).count() == baseCount)
    // crash state: the dump's delta writer died after a torn _v1_d1 but
    // before the pointer swap — index readers must keep seeing the base
    val fs = new Path(root).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val torn = new Path(root, "_v1_d1/part-00000.parquet")
    val o = fs.create(torn, true)
    o.write("torn bytes, not parquet".getBytes("UTF-8")); o.close()
    assert(Snapshot.read(spark, root).count() == baseCount,
      "a torn delta must stay invisible to index readers")
    // the retried landing overwrites the torn directory whole
    Snapshot.commitDelta(DedupStore.bandPostings(dump), root, "posting_id")
    val cols = Seq("posting_id", "doc_id", "band", "band_hash")
    val got = Snapshot.read(spark, root)
      .select(cols.head, cols.tail: _*).orderBy("posting_id")
      .collect().toSeq
    val want = DedupStore.bandPostings(corpus.unionByName(dump))
      .select(cols.head, cols.tail: _*).orderBy("posting_id")
      .collect().toSeq
    assert(got == want, "snapshot-merged postings must equal direct build")
    fs.delete(new Path(root), true)
  }

  test("lsh postings store: re-landing a document replaces exactly its " +
       "own band rows") {
    import spark.implicits._
    import graft.etl.Snapshot
    val root = "/tmp/graft_lshidx_pk_" + System.nanoTime()
    val v1 = Seq(1L -> "alpha beta gamma", 2L -> "delta epsilon zeta")
      .toDF("doc_id", "text")
    Snapshot.commit(DedupStore.bandPostings(v1), root)
    // doc 2's text changes; its delta must replace ONLY doc 2's rows
    val v2 = Seq(2L -> "eta theta iota").toDF("doc_id", "text")
    Snapshot.commitDelta(DedupStore.bandPostings(v2), root, "posting_id")
    val back = Snapshot.read(spark, root)
    assert(back.count() == 2 * DedupQueries.Bands)
    val doc1 = back.filter(col("doc_id") === 1L)
      .orderBy("posting_id").collect().toSeq
    val doc1Want = DedupStore.bandPostings(v1.filter(col("doc_id") === 1L))
      .orderBy("posting_id").collect().toSeq
    assert(doc1 == doc1Want, "doc 1's postings must be untouched")
    val doc2 = back.filter(col("doc_id") === 2L)
      .orderBy("posting_id").collect().toSeq
    val doc2Want = DedupStore.bandPostings(v2)
      .orderBy("posting_id").collect().toSeq
    assert(doc2 == doc2Want, "doc 2's postings must be the new text's")
    new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
      .delete(new org.apache.hadoop.fs.Path(root), true)
  }
}
