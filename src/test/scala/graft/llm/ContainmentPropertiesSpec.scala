package graft.llm

import graft.TestSpark
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Property check for the df-ordered containment join (q148's kernel): on
  * random corpora (small vocabulary → dense subsets AND hot tokens that
  * would explode an un-pruned posting join) the output must equal a plain
  * in-driver pairwise containment over string token sets. This is the
  * exactness claim of the A-prefix / size / positional prunes tested
  * independently of the DuckDB oracle and of the fixtures — in
  * particular it covers subset-heavy corpora (short docs fully inside
  * long ones) that the fixtures only sample.
  */
class ContainmentPropertiesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val vocab = Vector("the", "cat", "sat", "on", "mat", "dog", "ran",
    "fast", "spark", "data", "row", "col", "x", "y", "z")

  private def corpus(seed: Long, nDocs: Int): Seq[(Long, String, String)] = {
    val rnd = new scala.util.Random(seed)
    (0 until nDocs).map { i =>
      val len = 1 + rnd.nextInt(12)
      val text = Seq.fill(len)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
      (i.toLong, if (rnd.nextBoolean()) "web" else "wiki", text)
    }
  }

  private def naive(docs: Seq[(Long, String, String)], t: Double)
      : Set[(String, Long, Long, Double)] = {
    val toks = docs.map { case (id, src, text) =>
      (id, src, text.split(" ").toSet)
    }
    (for {
      (aId, aSrc, aTok) <- toks
      (bId, bSrc, bTok) <- toks
      if aSrc == bSrc && aId != bId
      c = aTok.intersect(bTok).size.toDouble / aTok.size
      if c >= t
    } yield (aSrc, aId, bId,
      BigDecimal(c).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble))
      .toSet
  }

  private def viaPruned(docs: Seq[(Long, String, String)], t: Double)
      : Set[(String, Long, Long, Double)] = {
    import spark.implicits._
    val d = docs.toDF("doc_id", "source", "text")
      .select(col("doc_id"), col("source"),
        array_sort(array_distinct(transform(split(col("text"), " "),
          (tk: Column) => xxhash64(tk)))).as("tok"))
    DedupQueries.containmentPairs(d, t)
      .select(col("source"), col("a_id"), col("b_id"),
        round(col("containment"), 4).as("containment"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSet
  }

  for (seed <- Seq(1L, 7L, 42L); t <- Seq(0.6, 0.8)) {
    test(s"containment prunes are exact on random corpus seed=$seed t=$t") {
      val docs = corpus(seed, 30)
      assert(viaPruned(docs, t) == naive(docs, t))
    }
  }
}
