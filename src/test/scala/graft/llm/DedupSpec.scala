package graft.llm

import graft.{Tables, TestSpark}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Correctness of the no-oracle probabilistic operators: LSH candidates are
  * exact-verified (precision 1 by construction), so the test surface is
  * recall vs the exact inverted-index answer (q34), plus SimHash invariants.
  */
class DedupSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def docs = Tables.t(spark, TestSpark.Sf, "documents")

  private def pairSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.select("a_id", "b_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("minhash-LSH pairs: precision 1 and recall >= 0.8 vs exact jaccard") {
    val exact = pairSet(
      TextQueries.queries("q34_jaccard_pairs")(spark, TestSpark.Sf))
    val lsh = pairSet(DedupQueries.minhashPairs(docs, 0.6))
    assert(lsh.subsetOf(exact), "LSH must not invent pairs (exact-verified)")
    assert(exact.nonEmpty, "fixture should contain near-dup pairs")
    val recall = lsh.size.toDouble / exact.size
    assert(recall >= 0.8, s"recall $recall too low (${lsh.size}/${exact.size})")
  }

  test("identical token sets get identical simhash; hamming tracks overlap") {
    val sh = DedupQueries.simhash(docs)
    // token-set-identical pairs == jaccard 1.0 pairs from the exact query
    val ones = TextQueries.queries("q34_jaccard_pairs")(spark, TestSpark.Sf)
      .filter(col("jaccard") === 1.0)
    assert(ones.count() > 0, "fixture should contain jaccard-1.0 pairs")
    val joined = ones
      .join(sh.select(col("doc_id").as("a_id"), col("simhash").as("ha")), "a_id")
      .join(sh.select(col("doc_id").as("b_id"), col("simhash").as("hb")), "b_id")
    val mismatched = joined.filter(col("ha") =!= col("hb")).count()
    assert(mismatched == 0, "equal token sets must hash identically")
  }

  test("simhash output is one row per document") {
    assert(DedupQueries.simhash(docs).count() == docs.count())
  }

  test("SortedIntersectCount equals size(array_intersect) on sorted sets") {
    import org.apache.spark.sql.Column
    val toks = docs.select(col("doc_id"),
      array_sort(array_distinct(org.apache.spark.sql.functions.transform(
        split(col("text"), " "), (t: Column) => xxhash64(t)))).as("tok"))
    val a = toks.select(col("doc_id").as("a_id"), col("tok").as("a_tok"))
    val b = toks.select(col("doc_id").as("b_id"), col("tok").as("b_tok"))
    val pairs = a.join(b, col("a_id") < col("b_id")).limit(5000)
      .withColumn("fused",
        graft.functions.SortedIntersectCount.sortedIntersectCount(
          col("a_tok"), col("b_tok")))
      .withColumn("builtin",
        size(array_intersect(col("a_tok"), col("b_tok"))).cast("long"))
    assert(pairs.filter(col("fused") =!= col("builtin")).count() == 0)
  }

  test("connected components label every node with its component minimum") {
    import spark.implicits._
    // components: {1,2,3,9} via chain, {5,6}; 3-9 closes a cycle
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 9L), (9L, 1L), (5L, 6L))
      .toDF("a_id", "b_id")
    val got = DedupQueries.connectedComponents(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 9L -> 1L,
      5L -> 5L, 6L -> 5L))
  }

  test("connected components converge on a long path graph") {
    import spark.implicits._
    // a 12-node path needs multiple propagation rounds end-to-end
    val pairs = (1L until 12L).map(i => (i, i + 1)).toDF("a_id", "b_id")
    val got = DedupQueries.connectedComponents(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.size == 12 && got.values.forall(_ == 1L))
  }

  test("winnowing: identical text gives identical fingerprints; counts bounded") {
    import spark.implicits._
    val dup = Seq(
      (1L, "a b c d e f g h i j"),
      (2L, "a b c d e f g h i j"),     // exact duplicate
      (3L, "z y x w v u t s r q"))
      .toDF("doc_id", "text")
    val fp = DedupQueries.winnowFingerprints(dup)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toMap
    assert(fp(1L) == fp(2L), "identical text must fingerprint identically")
    assert(fp(1L) != fp(3L), "different text must differ")
    // n_fingerprints <= n_windows <= n_shingles on the real corpus
    val both = DedupQueries.winnowFingerprints(docs)
      .join(docs.select(col("doc_id"),
        (size(split(col("text"), " ")) - 2).cast("long").as("n_shingles")),
        "doc_id")
    assert(both.filter(col("n_fingerprints") > col("n_shingles")).count() == 0)
  }

  test("prefix dedup keeps exactly the longest member per 20-token prefix") {
    val got = DedupQueries.queries("q125_prefix_dedup")(spark, TestSpark.Sf)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2))))
      .toMap
    val naive = docs.select("doc_id", "text", "n_chars").collect()
      .map(r => (r.getLong(0), r.getString(1).split(" ").take(20).mkString(" "),
        r.getLong(2)))
      .groupBy(_._2)
    assert(got.keySet == naive.values.flatten.map(_._1).toSet,
      "every document appears exactly once")
    naive.values.foreach { g =>
      val survivor = g.minBy(d => (-d._3, d._1))._1
      g.foreach { case (id, _, _) =>
        assert(got(id)._1 == g.length, s"group size wrong for doc $id")
        assert(got(id)._2 == (id == survivor), s"kept flag wrong for doc $id")
      }
    }
  }

  test("probe-index PPJoin equals the naive probe x index jaccard join") {
    val d = docs.select(col("doc_id"), col("source"),
      array_sort(array_distinct(transform(split(col("text"), " "),
        t => xxhash64(t)))).as("tok"))
    val probe = d.filter(col("source") === "src0").drop("source")
    val index = d.filter(col("source") =!= "src0").drop("source")
    val got = DedupQueries.probeIndexJaccardPairs(probe, index, 0.6)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    def sets(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toMap
    val (ps, is) = (sets(probe), sets(index))
    val naive = (for {
      (a, at) <- ps.toSeq; (b, bt) <- is.toSeq
      inter = (at & bt).size
      if inter.toDouble / (at.size + bt.size - inter) >= 0.6
    } yield (a, b)).toSet
    assert(naive.nonEmpty, "fixture should contain cross-source near-dups")
    assert(got == naive, s"missing=${(naive -- got).take(5)} " +
      s"extra=${(got -- naive).take(5)}")
  }

  test("word communities: label is the community minimum; sizes consistent") {
    // sf0.01 so the PMI graph is non-degenerate (sf0.001 has too few
    // bigram repeats to pass the c_xy >= 5 support floor)
    val rows = graft.SparkEntry.queries("q183_word_communities")(
      spark, "/root/testdata/sf0.01")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(rows.nonEmpty, "sf0.01 should yield PMI communities")
    val byComm = rows.groupBy(_._2)
    assert(byComm.size > 1, "threshold should split multiple communities")
    byComm.foreach { case (comm, ms) =>
      assert(ms.map(_._1).min == comm, "label must be the member minimum")
      assert(ms.forall(_._3 == ms.length.toLong), "size column consistent")
    }
  }

  test("leakage split: a near-dup cluster never straddles two splits") {
    val split = DedupQueries.queries("q169_leakage_split")(spark, TestSpark.Sf)
      .select("doc_id", "split_key", "split").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2)))).toMap
    val clusters = DedupQueries.queries("q71_dedup_clusters")(spark, TestSpark.Sf)
      .select("doc_id", "cluster_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(clusters.nonEmpty, "fixture should contain near-dup clusters")
    clusters.groupBy(_._2).foreach { case (cid, members) =>
      val splits = members.map(m => split(m._1)._2).distinct
      assert(splits.length == 1,
        s"cluster $cid straddles splits ${splits.toSeq}")
      members.foreach(m => assert(split(m._1)._1 == cid,
        s"clustered doc ${m._1} must key on its cluster id"))
    }
    // singletons key on their own id — q103's per-doc rule
    val clustered = clusters.map(_._1).toSet
    split.foreach { case (id, (key, _)) =>
      if (!clustered.contains(id)) assert(key == id,
        s"singleton $id must key on its own doc_id")
    }
    // and every document is assigned exactly one split
    assert(split.size == docs.count(),
      "split table must cover the whole corpus")
  }

  test("substring dedup removes planted duplicate runs at exact offsets") {
    import spark.implicits._
    val boiler = (1 to 15).map(i => s"b$i").mkString(" ")
    val corpus = Seq(
      (1L, "u1 u2 u3 u4 u5 " + boiler + " t1 t2"),    // canonical keeper
      (2L, "v1 v2 v3 v4 " + boiler + " w1"),          // loses the run only
      (3L, (1 to 13).map(i => s"x$i").mkString(" ")), // unique, untouched
      (4L, "v1 v2 v3 v4 " + boiler + " w1"))          // exact dup of 2
      .toDF("doc_id", "text")
    val out = DedupQueries.substringDedup(corpus, 12)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(out(0) == ((1L, 22L, 0L, "u1 u2 u3 u4 u5 " + boiler + " t1 t2")),
      "the canonical (lowest doc_id, offset) occurrence keeps every token")
    assert(out(1) == ((2L, 20L, 15L, "v1 v2 v3 v4 w1")),
      "a later occurrence loses exactly the duplicated run's tokens")
    assert(out(2)._3 == 0L && out(2)._4.startsWith("x1 "),
      "a unique document is untouched")
    assert(out(3) == ((4L, 20L, 20L, "")),
      "an exact duplicate document is removed entirely")
    // runs SHORTER than minRun survive: with minRun above every shared
    // run's length no duplicated gram exists and nothing is removed
    val none = DedupQueries.substringDedup(corpus, 21)
      .filter(col("n_removed") > 0).count()
    assert(none == 0L, "a minRun longer than every shared run removes nothing")
  }
}
