package graft.llm

import graft.TestSpark
import graft.functions.TrigramProfileHits.trigramProfileHits
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

/** Property tests for the fused scan-local expressions against their
  * declarative references on RANDOM corpora — beyond the fixture corpus
  * the corpus-equality specs cover: short strings, repeated tokens,
  * double spaces, non-ASCII (including astral-plane codepoints), and
  * empty documents.
  */
class FusedExprPropertiesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def randomCorpus(seed: Int, n: Int): Seq[(Long, String)] = {
    val rnd = new Random(seed)
    val vocab = Seq("the", "of", "and", "tab", "row", "data", "value",
      "x", "", "thé", "δata", "a😀b", "longertokenhere")
    (1 to n).map { i =>
      val len = rnd.nextInt(30)
      (i.toLong, (0 until len).map(_ => vocab(rnd.nextInt(vocab.size)))
        .mkString(" "))
    }
  }

  test("TrigramProfileHits equals the explode formulation on random text") {
    import spark.implicits._
    val profiles = Seq(
      Seq("the", "he ", " th"), Seq("tab", "row"), Seq("dat", " va"))
    for (seed <- Seq(2, 11, 77)) {
      val docs = randomCorpus(seed, 120).toDF("doc_id", "text")
      val txt = lower(col("text"))
      val hits = trigramProfileHits(txt, profiles)
      val grams = when(length(txt) >= 3,
        transform(sequence(lit(1), length(txt) - 2),
          (i: Column) => substr(txt, i, lit(3))))
        .otherwise(array().cast("array<string>"))
      def ref(p: Seq[String]): Column =
        size(filter(grams, (g: Column) => g.isInCollection(p))).cast("long")
      val bad = docs.select(
          hits.getItem(0).as("f0"), hits.getItem(1).as("f1"),
          hits.getItem(2).as("f2"),
          ref(profiles(0)).as("r0"), ref(profiles(1)).as("r1"),
          ref(profiles(2)).as("r2"))
        .filter(col("f0") =!= col("r0") || col("f1") =!= col("r1") ||
          col("f2") =!= col("r2"))
      assert(bad.count() == 0, s"seed=$seed")
    }
  }

  test("MinHashBands equals the signatures+bands formulation on random text") {
    import spark.implicits._
    for (seed <- Seq(5, 23, 101)) {
      val docs = randomCorpus(seed, 120).toDF("doc_id", "text")
        .withColumn("source", lit("s"))
      val ref = DedupQueries.bands(DedupQueries.signatures(docs))
        .select(col("doc_id"), col("band"), col("band_hash").as("ref_hash"))
      val got = docs.select(col("doc_id"),
        posexplode(graft.functions.MinHashBands.minhashBands(
          col("text"), DedupQueries.NumHashes, DedupQueries.Bands))
          .as(Seq("band", "band_hash")))
      assert(got.count() == ref.count(), s"seed=$seed row sets differ")
      assert(got.join(ref, Seq("doc_id", "band"))
        .filter(col("band_hash") =!= col("ref_hash")).count() == 0,
        s"seed=$seed")
    }
  }

  test("ShingleHashes equals the HOF formulation on random text") {
    import spark.implicits._
    for (seed <- Seq(7, 41, 63); k <- Seq(3, 5)) {
      val docs = randomCorpus(seed, 120).toDF("doc_id", "text")
      val tok = split(col("text"), " ")
      // HOF reference only valid when at least one shingle exists
      // (sequence(1, n) with n < 1 counts DOWN); guard like the queries do
      val withRef = docs.filter(size(tok) >= k)
        .select(col("doc_id"),
          graft.functions.ShingleHashes.shingleHashes(col("text"), k)
            .as("got"),
          array_sort(array_distinct(transform(
            sequence(lit(1), size(tok) - (k - 1)),
            (i: Column) => xxhash64(array_join(slice(tok, i, lit(k)), " ")))))
            .as("ref"))
      assert(withRef.filter(col("got") =!= col("ref")).count() == 0,
        s"seed=$seed k=$k")
      // short documents: empty array, never null, never an error
      val short = docs.filter(size(tok) < k)
        .select(graft.functions.ShingleHashes.shingleHashes(col("text"), k)
          .as("got"))
      assert(short.filter(col("got").isNull || size(col("got")) =!= 0)
        .count() == 0, s"seed=$seed k=$k short docs")
    }
  }

  test("PositionalShingleHashes equals the positional HOF formulation") {
    import spark.implicits._
    for (seed <- Seq(7, 41, 63); k <- Seq(3, 5, 12)) {
      val docs = randomCorpus(seed, 120).toDF("doc_id", "text")
      val tok = split(col("text"), " ")
      val withRef = docs.filter(size(tok) >= k)
        .select(col("doc_id"),
          graft.functions.ShingleHashes
            .positionalShingleHashes(col("text"), k).as("got"),
          transform(sequence(lit(1), size(tok) - (k - 1)),
            (i: Column) => xxhash64(array_join(slice(tok, i, lit(k)), " ")))
            .as("ref"))
      assert(withRef.filter(col("got") =!= col("ref")).count() == 0,
        s"seed=$seed k=$k")
      val short = docs.filter(size(tok) < k)
        .select(graft.functions.ShingleHashes
          .positionalShingleHashes(col("text"), k).as("got"))
      assert(short.filter(col("got").isNull || size(col("got")) =!= 0)
        .count() == 0, s"seed=$seed k=$k short docs")
      // the two forms agree on the shingle SET (q285's grouping keys are
      // the same hashes ShingleHashes consumers dedup on)
      val setEq = docs.filter(size(tok) >= k).select(
        graft.functions.ShingleHashes.shingleHashes(col("text"), k)
          .as("s"),
        array_sort(array_distinct(graft.functions.ShingleHashes
          .positionalShingleHashes(col("text"), k))).as("ps"))
      assert(setEq.filter(col("s") =!= col("ps")).count() == 0,
        s"seed=$seed k=$k set equality")
    }
  }

  test("NGramStats.top at n=1 equals the HOF top-token formulation") {
    import spark.implicits._
    for (seed <- Seq(9, 33, 87)) {
      val docs = randomCorpus(seed, 150).toDF("doc_id", "text")
      val tok = split(col("text"), " ")
      val ref = array_max(transform(array_distinct(tok),
        (d: Column) => size(filter(tok, (t: Column) => t === d))))
        .cast("long")
      val bad = docs.select(
          graft.functions.NGramStats.ngramStats(col("text"), 1)
            .getField("top").as("got"),
          ref.as("ref"))
        .filter(col("got") =!= col("ref") || col("got").isNull)
      assert(bad.count() == 0, s"seed=$seed")
    }
  }

  test("NGramStats equals the explode formulation on random text") {
    import spark.implicits._
    for (seed <- Seq(17, 29, 53); n <- Seq(1, 2, 3)) {
      val docs = randomCorpus(seed, 150).toDF("doc_id", "text")
      val tok = split(col("text"), " ")
      val grams = transform(sequence(lit(1), size(tok) - (n - 1)),
        (i: Column) => array_join(slice(tok, i, lit(n)), " "))
      val ref = docs.filter(size(tok) >= n)
        .select(col("doc_id"), explode(grams).as("gram"))
        .groupBy(col("doc_id"), col("gram")).count()
        .groupBy(col("doc_id"))
        .agg(sum(col("count")).as("r_total"),
          count(lit(1)).as("r_distinct"),
          max(col("count")).as("r_top"),
          count_if(col("count") === 1).as("r_singletons"))
      val st = graft.functions.NGramStats.ngramStats(col("text"), n)
      val got = docs.filter(st.getField("total") > 0)
        .select(col("doc_id"), st.as("st"))
      assert(got.count() == ref.count(), s"seed=$seed n=$n row sets differ")
      val bad = got.join(ref, "doc_id").filter(
        col("st.total") =!= col("r_total") ||
        col("st.distinct") =!= col("r_distinct") ||
        col("st.top") =!= col("r_top") ||
        col("st.singletons") =!= col("r_singletons"))
      assert(bad.count() == 0, s"seed=$seed n=$n")
    }
  }

  test("fused expressions are reachable from SQL with literal params") {
    val r = spark.sql(
      """SELECT shingle_hashes('a b c d', 3) AS sh,
        |       ngram_stats('x y x', 1).top AS tt,
        |       ngram_stats('x y x y', 2) AS ng,
        |       size(minhash_bands('a b c', 32, 8)) AS mb,
        |       size(winnow_fingerprints('a b c d e f g', 4)) AS wf,
        |       dot_product(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS dp,
        |       sorted_intersect_count(array(1L, 2L, 3L),
        |                              array(2L, 3L, 4L)) AS ic
        |""".stripMargin).head()
    assert(r.getSeq[Long](0).length == 2)
    assert(r.getAs[Long]("tt") == 2L)
    assert(r.getAs[org.apache.spark.sql.Row]("ng").getAs[Long]("top") == 2L)
    assert(r.getAs[Int]("mb") == 8)
    assert(r.getAs[Int]("wf") >= 1)
    assert(r.getAs[Double]("dp") == 11.0)
    assert(r.getAs[Long]("ic") == 2L)
    // structural params reject non-literals loudly, not with a wrong plan
    val e = intercept[Exception](
      spark.sql("SELECT shingle_hashes('a b c', cast(rand() * 3 AS INT))")
        .collect())
    assert(e.getMessage.contains("integer literal"))
  }

  test("WinnowFingerprints equals the generator formulation on random text") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val W = DedupQueries.WinnowWindow
    for (seed <- Seq(3, 13, 99)) {
      val docs = randomCorpus(seed, 120).toDF("doc_id", "text")
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
      assert(got.count() == ref.count(), s"seed=$seed row sets differ")
      assert(got.join(ref, "doc_id")
        .filter(col("got_fp") =!= col("ref_fp")).count() == 0, s"seed=$seed")
    }
  }

  test("SortedWeightedIntersectSum equals an exact BigDecimal reference") {
    import graft.functions.SortedWeightedIntersectSum.weightedIntersectSum
    import spark.implicits._
    val rnd = new Random(41)
    // random weighted sets: hashes sorted-distinct, weights split as
    // (intpart, frac in 1e-18 units) exactly like q131's decimal split
    def mkSet(): Seq[(Long, Long, Long)] = {
      val n = rnd.nextInt(12)
      (0 until n).map(_ => rnd.nextInt(40).toLong).distinct.sorted
        .map(h => (h, rnd.nextInt(9).toLong,
          math.abs(rnd.nextLong()) % 1000000000000000000L))
    }
    val rows = (1 to 300).map(i => (i.toLong, mkSet(), mkSet()))
    val df = rows.toDF("id", "a", "b")
      .select(col("id"),
        col("a").cast("array<struct<h: bigint, ip: bigint, fr: bigint>>")
          .as("a"),
        col("b").cast("array<struct<h: bigint, ip: bigint, fr: bigint>>")
          .as("b"))
    val got = df.select(col("id"),
        weightedIntersectSum(col("a"), col("b")).as("w"),
        weightedIntersectSum(col("a"), col("a")).as("aw"))
      .collect().map(r => r.getLong(0) -> ((r.getDouble(1), r.getDouble(2))))
      .toMap
    def refSum(els: Seq[(Long, Long, Long)]): Double =
      els.map { case (_, ip, fr) =>
        java.math.BigDecimal.valueOf(ip)
          .add(java.math.BigDecimal.valueOf(fr, 18))
      }.foldLeft(java.math.BigDecimal.ZERO)(_.add(_)).doubleValue()
    rows.foreach { case (id, a, b) =>
      val bh = b.map(_._1).toSet
      val inter = refSum(a.filter(e => bh(e._1)))
      assert(got(id)._1 == inter, s"id=$id intersect sum differs")
      assert(got(id)._2 == refSum(a), s"id=$id self (total) sum differs")
    }
  }
}
