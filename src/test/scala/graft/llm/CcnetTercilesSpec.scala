package graft.llm

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** q321 — CCNet's perplexity-tercile filter over the q318 trigram
  * scores. The oracle proves the bucket assignment and mass tallies
  * bit-for-bit; this spec pins the SEMANTIC properties the hash can't
  * state: every source genuinely populates all three buckets (the
  * filter discriminates — no degenerate tercile), the buckets carry
  * tercile-shaped mass, the keep decision drops exactly the tail, and
  * the per-source shares close to 1.
  */
class CcnetTercilesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.01"

  test("q321: every source populates head/middle/tail with tercile mass" +
       " and keep drops exactly the tail") {
    val rows = TextQueries.queries("q321_ccnet_terciles")(spark, sf)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getBoolean(2),
        r.getLong(3), r.getDouble(5)))
    val bySource = rows.groupBy(_._1)
    assert(bySource.nonEmpty)
    bySource.foreach { case (src, rs) =>
      val buckets = rs.map(_._2).toSet
      assert(buckets == Set("head", "middle", "tail"),
        s"$src missing buckets: got $buckets")
      rs.foreach { case (_, b, keep, n, share) =>
        assert(n > 0, s"$src/$b empty")
        assert(keep == (b != "tail"), s"$src/$b keep=$keep")
        // terciles on a real score distribution: each bucket holds a
        // third give-or-take the boundary docs
        assert(share > 0.15 && share < 0.55,
          s"$src/$b doc_share $share not tercile-shaped")
      }
      val total = rs.map(_._5).sum
      assert(math.abs(total - 1.0) < 1e-9,
        s"$src doc shares sum to $total")
    }
  }
}
