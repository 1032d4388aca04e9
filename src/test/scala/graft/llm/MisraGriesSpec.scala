package graft.llm

import graft.{SparkEntry, TestSpark}
import graft.functions.MisraGriesSketch.misraGries
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Properties of the mergeable Misra-Gries summary that the q197
  * exact-recount design depends on:
  *  - NOMINATION: every item with true count > n/(k+1) is present in the
  *    merged sketch (else the recount could miss a true heavy hitter);
  *  - UNDERCOUNT BOUND: stored counts never exceed the true count and
  *    undercount by at most n/(k+1), across partition merges;
  *  - the end-to-end q197 result equals the exact full-groupBy answer.
  */
class MisraGriesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  /** Zipf-ish skewed stream: item i appears ~n/(i+1) times, shuffled
    * deterministically so partition order is adversarial-ish.
    */
  private def stream(seed: Long, nItems: Int, mass: Int): Seq[String] = {
    val raw = (0 until nItems).flatMap { i =>
      Seq.fill(mass / (i + 1))(s"item_$i")
    }
    new scala.util.Random(seed).shuffle(raw)
  }

  for (seed <- Seq(7L, 42L); parts <- Seq(1, 8)) {
    test(s"MG nominates all heavy hitters, seed=$seed parts=$parts") {
      import spark.implicits._
      val k = 16
      val data = stream(seed, 200, 2000)
      val n = data.size
      val truth = data.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val sketch = data.toDF("tok").repartition(parts)
        .agg(misraGries(col("tok"), k).as("mg"))
        .select(explode(col("mg")).as(Seq("tok", "c")))
        .as[(String, Long)].collect().toMap
      assert(sketch.size <= k)
      val floor = n.toDouble / (k + 1)
      truth.foreach { case (tok, c) =>
        if (c > floor)
          assert(sketch.contains(tok),
            s"missed heavy hitter $tok (count $c > floor $floor)")
      }
      sketch.foreach { case (tok, c) =>
        assert(c <= truth(tok), s"$tok overcounted: $c > ${truth(tok)}")
        assert(c >= truth(tok) - floor - 1,
          s"$tok undercounted past the bound: $c vs ${truth(tok)}")
      }
    }
  }

  test("misra_gries_sketch is reachable from SQL with a literal k") {
    val keys = spark.sql(
      "SELECT map_keys(misra_gries_sketch(c, 4)) AS ks " +
        "FROM VALUES ('a'), ('a'), ('b'), ('a') AS t(c)")
      .head().getSeq[String](0)
    assert(keys.contains("a"))
  }

  test("q197 equals the exact full-groupBy heavy hitters at sf0.001") {
    import spark.implicits._
    val got = SparkEntry.queries("q197_heavy_hitters")(spark, TestSpark.Sf)
      .select("tok", "cnt").as[(String, Long)].collect().toSeq
    val toks = spark.read.parquet(s"${TestSpark.Sf}/documents.parquet")
      .select(explode(split(col("text"), " ")).as("tok"))
    val n = toks.count()
    val want = toks.groupBy("tok").count()
      .filter(col("count") * 100 > n)
      .select(col("tok"), col("count"))
      .as[(String, Long)].collect().toSeq
    assert(got.sorted == want.sorted)
    assert(got.nonEmpty, "fixture should have at least one >1% token")
  }
}
