package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.llm.{DedupQueries, SimilarityQueries, TextQueries}

/** Measures the RAW accuracy statistics behind the q313–q315 verdicts on
  * the planted-family Zipf corpus (deterministic per SF — MinHash/SimHash
  * seeds are fixed), so the declared bounds are set from measured floors
  * rather than the idealized banding formula (the q266 precedent).
  * Run: sbt "runMain graft.tools.ProbeZipfContracts" [sfDir...]
  */
object ProbeZipfContracts {
  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01",
        "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[8]")
      .withExtensions(new graft.functions.GraftExtensions)
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (dir <- dirs) {
      val zdocs = graft.Tables.t(spark, dir, "documents")
        .select(col("doc_id"), col("source"),
          array_join(TextQueries.zipfFamilyTokArray, " ").as("text"))
        .localCheckpoint()
      val toks = zdocs.select(col("doc_id"), col("source"),
        array_sort(array_distinct(transform(split(col("text"), " "),
          t => xxhash64(t)))).as("tok"))
      val exact = TextQueries
        .prefixJaccardPairs(toks, 0.6, presentationSort = false)
        .select(col("source"), col("a_id"), col("b_id"))
        .localCheckpoint()
      val nTrue = exact.count()
      val lsh = DedupQueries.minhashPairs(zdocs, 0.6)
        .select(col("source"), col("a_id"), col("b_id"))
      val nCaught = exact.join(lsh, Seq("source", "a_id", "b_id")).count()
      val nInv = lsh.join(exact, Seq("source", "a_id", "b_id"), "left_anti")
        .count()
      println(f"[$dir] q313 minhash: true=$nTrue caught=$nCaught " +
        f"recall=${nCaught.toDouble / nTrue}%.4f invented=$nInv")

      val sh = DedupQueries.simhash(zdocs).localCheckpoint()
      def ham(p: org.apache.spark.sql.DataFrame) = p
        .join(sh.select(col("doc_id").as("a_id"), col("simhash").as("ha")),
          "a_id")
        .join(sh.select(col("doc_id").as("b_id"), col("simhash").as("hb")),
          "b_id")
        .withColumn("hd",
          DedupQueries.hammingDistance(col("ha"), col("hb")).cast("long"))
        .agg(count(lit(1)), sum(col("hd"))).head()
      val wS = Window.partitionBy(col("source")).orderBy(col("doc_id"))
      val base = zdocs.select(col("source"), col("doc_id"))
        .withColumn("b_id", lead(col("doc_id"), 1).over(wS))
        .filter(col("b_id").isNotNull)
        .select(col("source"), col("doc_id").as("a_id"), col("b_id"))
        .join(exact, Seq("source", "a_id", "b_id"), "left_anti")
      val d = ham(exact); val b = ham(base)
      val dm = d.getLong(1).toDouble / d.getLong(0)
      val bm = b.getLong(1).toDouble / b.getLong(0)
      println(f"[$dir] q314 simhash: dupMean=$dm%.2f baseMean=$bm%.2f " +
        f"sep=${bm - dm}%.2f (n=${d.getLong(0)}/${b.getLong(0)})")

      val tf = zdocs
        .select(col("doc_id"), explode(split(col("text"), " ")).as("t"))
        .groupBy(col("doc_id"), col("t")).agg(count(lit(1)).as("c"))
      val signs = tf.select(col("t")).distinct()
        .withColumn("h", md5(col("t").cast("binary")))
        .select(col("t"), explode(expr(
          """transform(sequence(0, 15), j -> named_struct(
            |'j', j,
            |'sgn', CAST(conv(substring(h, 1 + 2 * j, 2), 16, 10) AS LONG)
            |       % 2L * 2L - 1L))""".stripMargin)).as("js"))
        .select(col("t"), col("js.j").as("j"), col("js.sgn").as("sgn"))
      val emb = tf.join(broadcast(signs), "t")
        .groupBy(col("doc_id"), col("j"))
        .agg(sum(col("c") * col("sgn")).as("v"))
        .groupBy(col("doc_id"))
        .agg(array_sort(collect_list(struct(col("j"), col("v")))).as("jv"))
        .select(col("doc_id").as("vec_id"),
          concat(expr("transform(jv, s -> CAST(s.v AS DOUBLE))"),
            array_repeat(lit(0.0), 48)).as("embedding"))
        .localCheckpoint()
      val q = emb.filter(col("vec_id") < 100)
      val ex = SimilarityQueries.topK(emb, q, 10)
        .select(col("query_id"), col("vec_id"))
      val ann = SimilarityQueries.annTopK(emb, q, 10)
        .select(col("query_id"), col("vec_id"))
      val rec = ex.join(ann.withColumn("hit", lit(1)),
        Seq("query_id", "vec_id"), "left")
        .groupBy(col("query_id"))
        .agg(count(lit(1)).as("n"),
          sum(coalesce(col("hit"), lit(0))).as("c"))
        .select(col("query_id"),
          (col("c").cast("double") / col("n").cast("double")).as("r"))
        .collect().map(r => (r.getLong(0), r.getDouble(1)))
      val rs = rec.map(_._2)
      println(f"[$dir] q315 ann: queries=${rec.length} " +
        f"minRecall=${rs.min}%.2f meanRecall=${rs.sum / rs.length}%.2f")
    }
    spark.stop()
  }
}
