package graft.llm

import graft.TestSpark
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Property check for the prefix-filtered Jaccard join: on random corpora
  * (small vocabulary → dense near-dups AND hot tokens) the output must
  * equal a plain in-driver pairwise computation over string token sets —
  * for both the df-ordered and hash-ordered prefix variants, at both
  * fixture thresholds. This is the exactness claim of the prefix filter
  * tested independently of the DuckDB oracle and of the fixtures.
  */
class PrefixJaccardPropertiesSpec extends AnyFunSuite {
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
      if aSrc == bSrc && aId < bId
      j = aTok.intersect(bTok).size.toDouble / aTok.union(bTok).size
      if j >= t
    } yield (aSrc, aId, bId,
      BigDecimal(j).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble))
      .toSet
  }

  private def viaPrefix(docs: Seq[(Long, String, String)], t: Double,
                        dfOrdered: Boolean): Set[(String, Long, Long, Double)] = {
    import spark.implicits._
    val d = docs.toDF("doc_id", "source", "text")
      .select(col("doc_id"), col("source"),
        array_sort(array_distinct(transform(split(col("text"), " "),
          (tk: Column) => xxhash64(tk)))).as("tok"))
    TextQueries.prefixJaccardPairs(d, t, dfOrdered)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSet
  }

  for (seed <- Seq(1L, 7L, 42L); t <- Seq(0.4, 0.6)) {
    test(s"prefix filter is exact on random corpus seed=$seed t=$t") {
      val docs = corpus(seed, 30)
      val want = naive(docs, t)
      assert(viaPrefix(docs, t, dfOrdered = true) == want, "df-ordered")
      assert(viaPrefix(docs, t, dfOrdered = false) == want, "hash-ordered")
    }
  }
}
