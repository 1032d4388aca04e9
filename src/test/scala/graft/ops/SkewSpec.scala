package graft.ops

import graft.{Tables, TestSpark}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The salted-join contract: the salt routes rows, it never changes them —
  * the salted result must be multiset-identical to the plain join, for the
  * full row set (q146's oracle certifies the aggregate; this pins the rows).
  */
class SkewSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("saltedJoin is multiset-identical to the plain join") {
    val fact = Tables.t(spark, TestSpark.Sf, "lineitem")
      .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))
    val dim = Tables.t(spark, TestSpark.Sf, "orders")
      .select(col("o_orderkey").as("l_orderkey"), col("o_orderpriority"))
    val salted = Skew.saltedJoin(fact, dim, "l_orderkey",
      xxhash64(col("l_orderkey"), col("l_linenumber")), buckets = 8)
    val plain = fact.join(dim, "l_orderkey")
    assert(salted.count() == plain.count())
    assert(salted.exceptAll(plain).count() == 0)
    assert(plain.exceptAll(salted).count() == 0)
  }

  test("saltedJoin spreads a hot key across all buckets") {
    import spark.implicits._
    // one key carrying every fact row: the degenerate skew case
    val fact = (1 to 800).map(i => (1L, i)).toDF("k", "payload")
    val dim = Seq((1L, "only")).toDF("k", "attr")
    val salted = fact.withColumn("__salt",
      pmod(xxhash64(col("k"), col("payload")), lit(8)).cast("int"))
    val used = salted.select(countDistinct(col("__salt"))).first().getLong(0)
    assert(used == 8, s"salt must use all 8 buckets, used $used")
    val joined = Skew.saltedJoin(fact, dim, "k",
      xxhash64(col("k"), col("payload")), buckets = 8)
    assert(joined.count() == 800)
  }
}
