package graft.llm

import graft.{Tables, TestSpark}
import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The fused winnowing expression vs the independent generator-based
  * reference computation — hash-for-hash over the whole fixture corpus —
  * plus edge shapes the invariant tests don't pin down.
  */
class WinnowFingerprintsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val W = DedupQueries.WinnowWindow

  test("fingerprints equal the generator formulation, hash for hash") {
    val docs = Tables.t(spark, TestSpark.Sf, "documents")
    // independent reference: posexplode + rows-frame window min
    val tok = split(col("text"), " ")
    val sh = transform(sequence(lit(1), size(tok) - 2),
      (i: Column) => xxhash64(array_join(slice(tok, i, lit(3)), " ")))
    val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val ref = docs.filter(size(tok) >= 3 + W - 1)
      .select(col("doc_id"), posexplode(sh).as(Seq("pos", "h")))
      .withColumn("wmin", min(col("h")).over(w.rowsBetween(0, W - 1)))
      .withColumn("n", count(lit(1)).over(w.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing)))
      .filter(col("pos") <= col("n") - W)
      .groupBy(col("doc_id"))
      .agg(array_sort(collect_set(col("wmin"))).as("ref_fp"))
    val got = DedupQueries.winnowFingerprints(docs)
      .select(col("doc_id"), array_sort(col("fingerprints")).as("got_fp"))
    val joined = got.join(ref, "doc_id")
    assert(joined.count() == got.count() && joined.count() == ref.count())
    assert(joined.filter(col("got_fp") =!= col("ref_fp")).count() == 0)
  }

  test("documents below the window threshold are excluded, not empty") {
    import spark.implicits._
    // 5 tokens -> 3 shingles < window 4: excluded; 6 tokens -> 4: kept
    val out = DedupQueries.winnowFingerprints(
      Seq((1L, "a b c d e"), (2L, "a b c d e f")).toDF("doc_id", "text"))
      .collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(2L))
    assert(out(0).getSeq[Long](1).nonEmpty)
  }

  test("interior empty tokens (double spaces) match Spark split semantics") {
    import spark.implicits._
    val docs = Seq((1L, "a  b c d e f")).toDF("doc_id", "text")
    val viaExpr = DedupQueries.winnowFingerprints(docs)
      .collect()(0).getSeq[Long](1).toSet
    // reference computed declaratively on the same text
    val tok = split(col("text"), " ")
    val sh = transform(sequence(lit(1), size(tok) - 2),
      (i: Column) => xxhash64(array_join(slice(tok, i, lit(3)), " ")))
    val mins = docs.select(explode(transform(
        sequence(lit(0), size(tok) - 2 - W),
        (p: Column) => array_min(slice(sh, p + 1, lit(W))))).as("m"))
      .collect().map(_.getLong(0)).toSet
    assert(viaExpr == mins)
  }

  test("participates in whole-stage codegen") {
    // raw parquet read, not Tables.t: the r14 scan-fanout exchange would
    // sit between scan and projection and hide the codegen span this
    // probe greps for — the assertion is about the EXPRESSION, not the
    // loader plumbing
    val plan = spark.read.parquet(s"${TestSpark.Sf}/documents.parquet")
      .limit(5)
      .select(graft.functions.WinnowFingerprints.winnow(col("text"), W))
      .queryExecution.executedPlan.toString
    assert(plan.linesIterator.exists(l =>
      l.contains("winnowfingerprints") && l.contains("*(")),
      s"not codegen'd:\n$plan")
  }
}
