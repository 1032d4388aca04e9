package graft.etl

import graft.TestSpark
import org.apache.spark.sql.types.{StringType, TimestampType}
import org.scalatest.funsuite.AnyFunSuite

class TypeNormalizerSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("string *_at columns become timestamps, bad values null (coerce)") {
    val df = Seq(
      ("2024-01-01 10:00:00", "x"),
      ("not-a-date", "y")).toDF("created_at", "v")
    val out = TypeNormalizer.normalize(df)
    assert(out.schema("created_at").dataType == TimestampType)
    val vals = out.orderBy("v").collect().map(r => Option(r.getTimestamp(0)))
    assert(vals(0).contains(java.sql.Timestamp.valueOf("2024-01-01 10:00:00")))
    assert(vals(1).isEmpty)
  }

  test("suffix match only — the reference's substring trap " +
       "(login_attempts must NOT be coerced; operations.py:123)") {
    val df = Seq(("3", "2024-01-01 00:00:00")).toDF("login_attempts", "updated_at")
    val out = TypeNormalizer.normalize(df)
    assert(out.schema("login_attempts").dataType == StringType)
    assert(out.schema("updated_at").dataType == TimestampType)
  }

  test("non-string _at columns pass through untouched") {
    val df = Seq((1L, 2.5)).toDF("seen_at", "v") // already long — leave it
    val out = TypeNormalizer.normalize(df)
    assert(out.schema("seen_at").dataType.typeName == "long")
  }
}
