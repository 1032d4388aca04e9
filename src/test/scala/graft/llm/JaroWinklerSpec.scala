package graft.llm

import graft.TestSpark
import graft.functions.JaroWinkler
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

/** Bit-equality pins for the native Jaro-Winkler expression against
  * DuckDB's `jaro_winkler_similarity` (the q278 oracle's scorer) — the
  * expected doubles below are DuckDB's own outputs, full precision.
  */
class JaroWinklerSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def s(x: String) = UTF8String.fromString(x)

  test("kernel matches DuckDB bit for bit on the classic pairs") {
    // expected values produced by DuckDB 'SELECT jaro_winkler_similarity(a, b)'
    val pins = Seq(
      ("MARTHA", "MARHTA", 0.9611111111111111),
      ("DIXON", "DICKSONX", 0.8133333333333332),
      ("JELLYFISH", "SMELLYFISH", 0.8962962962962964),
      ("abc", "abc", 1.0),
      ("CRATE", "TRACE", 0.7333333333333334), // jaro > 0.7 but prefix 0
      ("DWAYNE", "DUANE", 0.8400000000000001),
      ("ABCD", "ABZZZZZZZZ", 0.5666666666666667), // under the 0.7 boost gate
      ("PREFIX", "PREFIXXXXXXXXXXXZZ", 0.8666666666666666), // prefix capped at 4
      ("Customer#000000001", "Customer#000000010", 0.9888888888888889))
    pins.foreach { case (a, b, want) =>
      assert(JaroWinkler.sim(s(a), s(b)) == want, s"($a, $b)")
      assert(JaroWinkler.sim(s(b), s(a)) == want, s"symmetric ($b, $a)")
    }
  }

  test("empty and no-match inputs follow the DuckDB convention") {
    assert(JaroWinkler.sim(s(""), s("abc")) == 0.0)
    assert(JaroWinkler.sim(s("abc"), s("")) == 0.0)
    assert(JaroWinkler.sim(s(""), s("")) == 0.0) // NOT 1.0 — DuckDB's choice
    assert(JaroWinkler.sim(s("a"), s("b")) == 0.0)
  }

  test("the Column path (whole-stage codegen) equals the kernel") {
    val df = Seq(("MARTHA", "MARHTA"), ("DIXON", "DICKSONX"),
      ("", ""), ("same", "same")).toDF("a", "b")
    val got = df.select(JaroWinkler.jaroWinkler(col("a"), col("b")))
      .collect().map(_.getDouble(0)).toSeq
    val want = Seq(0.9611111111111111, 0.8133333333333332, 0.0, 1.0)
    assert(got == want)
    // null propagates (BinaryExpression null-safety), doesn't crash
    val withNull = Seq((Some("x"), None: Option[String])).toDF("a", "b")
      .select(JaroWinkler.jaroWinkler(col("a"), col("b"))).collect()
    assert(withNull.head.isNullAt(0))
  }
}
