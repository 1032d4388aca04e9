package graft.llm

import graft.{SparkEntry, Tables, TestSpark}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SimilaritySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def emb = Tables.t(spark, TestSpark.Sf, "embeddings")

  test("brute-force topK returns k ordered neighbors per query") {
    val out = SimilarityQueries.topK(emb, emb.filter(col("vec_id") < 3), 5)
      .collect()
    assert(out.length == 15)
    val byQ = out.groupBy(_.getLong(0))
    byQ.foreach { case (_, rows) =>
      val cosines = rows.sortBy(_.getInt(3)).map(_.getDouble(2))
      assert(cosines.sameElements(cosines.sortBy(-(_: Double))),
        "neighbors must be in descending cosine order")
    }
  }

  test("ANN results carry true cosines and are a subset of correctness") {
    // every ANN neighbor's cosine must equal the brute-force cosine for the
    // same (query, vec) pair — ANN may miss pairs, never mis-score them
    val ann = SimilarityQueries.annTopK(emb, emb.filter(col("vec_id") < 3), 5)
      .select(col("query_id"), col("vec_id"), col("cosine"))
    val brute = SimilarityQueries
      .topK(emb, emb.filter(col("vec_id") < 3), Int.MaxValue)
      .select(col("query_id"), col("vec_id"),
        col("cosine").as("true_cosine"))
    val joined = ann.join(brute, Seq("query_id", "vec_id"), "left")
    assert(joined.filter(col("true_cosine").isNull).count() == 0)
    assert(joined.filter(col("cosine") =!= col("true_cosine")).count() == 0)
  }

  test("native CosineSimilarity expression is bit-identical to the HOF form") {
    import org.apache.spark.sql.Column
    val e = emb.limit(200).select(
      col("vec_id"),
      org.apache.spark.sql.functions.transform(
        col("embedding"), (x: Column) => x.cast("double")).as("v"))
    val paired = e.alias("a").join(e.alias("b"),
      col("a.vec_id") < col("b.vec_id"))
    val diff = paired.select(
        SimilarityQueries.cosine(col("a.v"), col("b.v")).as("native"),
        SimilarityQueries.cosineHof(col("a.v"), col("b.v")).as("hof"))
      .filter(col("native") =!= col("hof"))
    assert(diff.count() == 0, "native expression must equal HOF bit-for-bit")
  }

  test("cosine_sim NULLs on mismatched lengths and null elements, like the HOF") {
    // SQL-reachable degenerate inputs (user arrays hit cosine_sim directly):
    // both must yield NULL, matching aggregate(zip_with(...)) semantics
    val r = spark.sql(
      """SELECT
        |  cosine_sim(array(1.0D, 2.0D), array(1.0D)) AS len_mismatch,
        |  cosine_sim(array(1.0D, CAST(NULL AS DOUBLE)), array(1.0D, 2.0D))
        |    AS null_elem,
        |  cosine_sim(array(1.0D, 0.0D), array(1.0D, 0.0D)) AS ok
        |""".stripMargin).collect()(0)
    assert(r.isNullAt(0) && r.isNullAt(1) && r.getDouble(2) == 1.0)
  }

  test("native CosineSimilarity participates in whole-stage codegen") {
    import org.apache.spark.sql.Column
    // raw parquet read, not Tables.t: the r14 scan-fanout exchange would
    // hide the codegen span this probe greps for
    val e = spark.read.parquet(s"${TestSpark.Sf}/embeddings.parquet")
      .limit(10).select(
      org.apache.spark.sql.functions.transform(
        col("embedding"), (x: Column) => x.cast("double")).as("v"))
    val plan = e.select(SimilarityQueries.cosine(col("v"), col("v")).as("c"))
      .queryExecution.executedPlan.toString
    // a `*(n)` prefix marks the operator as inside a WholeStageCodegen stage
    assert(plan.linesIterator.exists(l =>
      l.contains("cosinesimilarity") && l.contains("*(")),
      s"cosinesimilarity not codegen'd:\n$plan")
  }

  test("ANN self-bucket membership: every query finds at least one neighbor") {
    val ann = SimilarityQueries.annTopK(emb, emb.filter(col("vec_id") < 5), 10)
    val perQuery = ann.groupBy("query_id").count().collect()
    assert(perQuery.nonEmpty)
    perQuery.foreach(r => assert(r.getLong(1) >= 1))
  }

  test("q129 mutual-kNN edges are exactly the bidirectional top-5 pairs") {
    val got = SparkEntry.queries("q129_mutual_knn")(spark, TestSpark.Sf)
      .select("a_id", "b_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // naive per-cell top-5 in Scala
    val vecs = emb.select("label", "vec_id", "embedding").collect()
      .map(r => (r.getInt(0), r.getLong(1),
        r.getSeq[Float](2).map(_.toDouble).toArray))
    def cos(a: Array[Double], b: Array[Double]) = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      dot / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    val knn = vecs.toSeq.groupBy(_._1).values.flatMap { cell =>
      cell.flatMap { case (_, id, v) =>
        cell.filter(_._2 != id)
          .map { case (_, oid, ov) => (id, oid, cos(v, ov)) }
          .sortBy { case (_, oid, c) => (-c, oid) }
          .take(5).map { case (a, b, _) => (a, b) }
      }
    }.toSet
    val mutual = knn.filter { case (a, b) => a < b && knn((b, a)) }
    assert(mutual.nonEmpty, "fixture cells should produce mutual edges")
    assert(got == mutual,
      s"missing=${(mutual -- got).take(5)} extra=${(got -- mutual).take(5)}")
  }

  test("q171 silhouette equals a brute-force pass over the trained model") {
    def cos(a: Seq[Double], b: Seq[Double]): Double = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      dot / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    val cents = SimilarityQueries.kmeansCentroids(emb, 4, 2).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).sortBy(_._1)
    val vs = emb.collect().map(r => (r.getLong(0),
      r.getSeq[Float](1).map(_.toDouble)))
    val perVec = vs.map { case (_, v) =>
      val scored = cents.map { case (cid, cv) => (cid, cos(v, cv)) }
        .sortBy { case (cid, c) => (-c, cid) }
      val (ownCid, c1) = scored(0)
      val c2 = scored(1)._2
      val (a, b) = (1.0 - c1, 1.0 - c2)
      (ownCid, if (math.max(a, b) > 0) (b - a) / math.max(a, b) else 0.0)
    }
    val want = perVec.groupBy(_._1).view.mapValues { ss =>
      (ss.length.toLong, ss.map(_._2).sum / ss.length)
    }.toMap
    val got = SparkEntry.queries("q171_silhouette")(spark, TestSpark.Sf)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2))))
      .toMap
    assert(got.keySet == want.keySet)
    got.foreach { case (cid, (n, mean)) =>
      assert(n == want(cid)._1)
      // brute-force mean uses plain double sums; davg's decimal path
      // agrees to the 1e-6 cast grid times the member count
      assert(math.abs(mean - want(cid)._2) < 1e-4,
        s"cluster $cid: $mean vs ${want(cid)._2}")
      assert(mean >= -1.0 && mean <= 1.0)
    }
  }

  test("q173 1-NN eval equals a brute-force IVF probe replay") {
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      for (i <- a.indices) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i) }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val vs = emb.collect().map(r => (r.getLong(0), r.getInt(2),
      r.getSeq[Float](1).map(_.toDouble).toArray))
    val cents = vs.groupBy(_._2).view.mapValues { g =>
      val dims = g.head._3.length
      Array.tabulate(dims)(i => g.map(_._3(i)).sum / g.length)
    }.toMap
    // per vector: centroid ranks by (cos desc, label asc)
    val ranked = vs.map { case (id, lbl, v) =>
      (id, lbl, v, cents.toSeq.map { case (cl, cv) => (cl, cos(v, cv)) }
        .sortBy { case (cl, c) => (-c, cl) }.map(_._1))
    }
    val cellOf = ranked.map(r => r._1 -> r._4.head).toMap
    val correctByLabel = ranked.map { case (id, lbl, v, order) =>
      val probed = order.take(2).toSet
      val cands = ranked.filter(o => o._1 != id && probed(cellOf(o._1)))
      val nn = cands.map(o => (o._1, o._2, cos(v, o._3)))
        .sortBy { case (cid, _, c) => (-c, cid) }.head
      (lbl, nn._2 == lbl)
    }.groupBy(_._1).view
      .mapValues(g => (g.length.toLong, g.count(_._2).toLong)).toMap
    val got = SparkEntry.queries("q173_knn_eval")(spark, TestSpark.Sf)
      .collect().map(r => r.getInt(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(got.keySet == correctByLabel.keySet)
    got.foreach { case (lbl, (n, correct, acc)) =>
      assert((n, correct) == correctByLabel(lbl),
        s"label $lbl: ($n, $correct) vs ${correctByLabel(lbl)}")
      assert(acc == correct.toDouble / n)
    }
  }

  test("scaled-k kNN eval covers every vector and stays deterministic") {
    val e = graft.Tables.t(spark, TestSpark.Sf, "embeddings")
    val n = e.count()
    val k = math.ceil(math.sqrt(n.toDouble)).toInt
    val r1 = SimilarityQueries.knnEvalScaledK(e, k, 2).collect()
    // every vector is evaluated exactly once (probes cover all queries)
    assert(r1.map(_.getLong(1)).sum == n)
    // deterministic: same model, same accuracy, run-to-run
    val r2 = SimilarityQueries.knnEvalScaledK(e, k, 2).collect()
    assert(r1.map(_.toSeq).toSeq == r2.map(_.toSeq).toSeq)
  }

  test("scaled-k mutual-kNN edges are oriented, mutual, and degree-bounded") {
    val e = graft.Tables.t(spark, TestSpark.Sf, "embeddings")
    val k = 5
    val cells = math.ceil(math.sqrt(e.count().toDouble)).toInt
    val edges = SimilarityQueries.mutualKnnEdgesScaledK(e, k, cells, 2)
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    // oriented: a < b, no duplicates
    assert(edges.forall { case (a, b) => a < b })
    assert(edges.distinct.length == edges.length)
    // degree bound: mutuality keeps each node's degree <= k
    val deg = edges.flatMap { case (a, b) => Seq(a, b) }
      .groupBy(identity).view.mapValues(_.length)
    assert(deg.values.forall(_ <= k))
  }

  test("ann index snapshot: a torn delta is invisible and the retried " +
       "incremental update lands the exact full assignment") {
    import org.apache.hadoop.fs.Path
    import graft.etl.Snapshot
    val emb = Tables.t(spark, TestSpark.Sf, "embeddings")
    val base = emb.filter(col("vec_id") % 8 =!= 7)
    val delta = emb.filter(col("vec_id") % 8 === 7)
    val (cArr, cb) = SimilarityQueries.annIndexArtifacts(base)
    val root = "/tmp/graft_annidx_crash_" + System.nanoTime()
    Snapshot.commit(SimilarityQueries.annIndexRows(base, cArr, cb), root)
    val baseCount = base.count()
    // crash state: the delta writer died after writing a torn _v1_d1 but
    // before the pointer swap — readers must keep seeing the base index
    val fs = new Path(root).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val torn = new Path(root, "_v1_d1/part-00000.parquet")
    val o = fs.create(torn, true)
    o.write("torn bytes, not parquet".getBytes("UTF-8")); o.close()
    assert(Snapshot.read(spark, root).count() == baseCount,
      "a torn delta must stay invisible to index readers")
    // the retried incremental update overwrites the torn directory whole
    Snapshot.commitDelta(
      SimilarityQueries.annIndexRows(delta, cArr, cb), root, "vec_id")
    val cols = Seq("vec_id", "cell", "code_0", "code_1", "code_2", "code_3")
    val got = Snapshot.read(spark, root)
      .select(cols.head, cols.tail: _*).orderBy("vec_id").collect().toSeq
    // merge-on-read equals the direct full assignment into the SAME
    // frozen artifacts — the index a from-scratch assignment produces
    val want = SimilarityQueries.annIndexRows(emb, cArr, cb)
      .select(cols.head, cols.tail: _*).orderBy("vec_id").collect().toSeq
    assert(got == want, "snapshot-merged index must equal the direct build")
    fs.delete(new Path(root), true)
  }

  test("scaled-k semantic dedup keeps the lowest id of each similar group") {
    val e = graft.Tables.t(spark, TestSpark.Sf, "embeddings")
    val n = e.count()
    val k = math.ceil(math.sqrt(n.toDouble)).toInt
    val out = SimilarityQueries.semDedupScaledK(e, 0.97, k, 2).collect()
    assert(out.length == n)                       // verdict for every vector
    val byCell = out.groupBy(_.get(1))
    byCell.values.foreach { cell =>
      // within each cell the smallest vec_id can never be dropped
      val minId = cell.map(_.getLong(0)).min
      assert(cell.find(_.getLong(0) == minId).get.getBoolean(2))
    }
  }
}
