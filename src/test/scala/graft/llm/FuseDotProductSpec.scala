package graft.llm

import graft.{Tables, TestSpark}
import graft.functions.DotProduct
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The FuseDotProduct optimizer rule: the HOF dot-product spelling must be
  * rewritten to the fused native expression without changing a single bit
  * of output, and non-matching aggregates must be left alone.
  */
class FuseDotProductSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def emb = Tables.t(spark, TestSpark.Sf, "embeddings")
    .limit(100)
    .select(col("vec_id"),
      transform(col("embedding"), (x: Column) => x.cast("double")).as("v"))

  private def containsDot(df: org.apache.spark.sql.DataFrame): Boolean =
    df.queryExecution.optimizedPlan
      .collect { case p => p.expressions }.flatten
      .exists(_.exists(_.isInstanceOf[DotProduct]))

  test("HOF dot product is rewritten to the fused DotProduct expression") {
    val df = emb.select(
      SimilarityQueries.dot(col("v"), col("v")).as("d"))
    assert(containsDot(df), df.queryExecution.optimizedPlan.toString)
  }

  test("rewritten plan is bit-identical to the native expression") {
    // dot() goes through the rule; the manual loop result must match
    val rows = emb.select(col("vec_id"),
        SimilarityQueries.dot(col("v"), col("v")).as("d"),
        col("v"))
      .collect()
    rows.foreach { r =>
      val v = r.getSeq[Double](2)
      var expect = 0.0
      v.foreach(x => expect += x * x)
      assert(r.getDouble(1) == expect, s"vec ${r.getLong(0)}")
    }
  }

  test("non-dot aggregates are left untouched") {
    // same shape but a sum fold (no zip_with multiply) — must NOT fuse
    val df = emb.select(
      aggregate(col("v"), lit(0.0), (acc: Column, x: Column) => acc + x)
        .as("s"))
    assert(!containsDot(df))
    // multiply fold over a single array — also not a dot product
    val df2 = emb.select(
      aggregate(col("v"), lit(1.0), (acc: Column, x: Column) => acc * x)
        .as("p"))
    assert(!containsDot(df2))
  }

  test("null and length-mismatch inputs yield NULL like the HOF form") {
    import spark.implicits._
    val df = Seq(
      (1L, Seq(1.0, 2.0), Seq(3.0, 4.0)),
      (2L, Seq(1.0, 2.0), Seq(3.0)))
      .toDF("id", "a", "b")
    val out = df.select(col("id"),
        SimilarityQueries.dot(col("a"), col("b")).as("d"))
      .orderBy("id").collect()
    assert(out(0).getDouble(1) == 11.0)
    assert(out(1).isNullAt(1), "length mismatch must be NULL")
  }
}
