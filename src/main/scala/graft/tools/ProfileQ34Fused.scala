// Dev scratch: compare the shipped candidates->distinct->verify q34 shape
// against a fused variant (arrays broadcast onto postings, verify inline in
// the self-join, distinct after). Run: sbt "runMain graft.tools.ProfileQ34Fused"
package graft.tools

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

object ProfileQ34Fused {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val raw = Tables.t(spark, "/root/testdata/sf0.1", "documents")
    def time(name: String)(df: DataFrame): Unit = {
      df.write.format("noop").mode("overwrite").save() // warm
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"$name%-28s ${times.sorted.apply(1)}%.2f s  (min ${times.min}%.2f max ${times.max}%.2f)")
    }
    val threshold = 0.6
    val docs = raw.select(col("doc_id"), col("source"),
      array_sort(array_distinct(transform(split(col("text"), " "),
        (t: Column) => xxhash64(t)))).as("tok"))

    // raw (pre-distinct) candidate pair count of the shipped shape
    import org.apache.spark.sql.expressions.Window
    def prefixLen(n: Column) =
      n - ceil(lit(threshold) * n - lit(1e-9)).cast("long") + lit(1L)
    val toks = docs.select(col("source"), col("doc_id"),
      size(col("tok")).cast("long").as("ntok"), explode(col("tok")).as("h"))
    val dfreq = toks.groupBy(col("source"), col("h"))
      .agg(count(lit(1)).as("df"))
    val w = Window.partitionBy(col("source"), col("doc_id"))
      .orderBy(col("df"), col("h"))
    val postings = toks.join(dfreq, Seq("source", "h"))
      .withColumn("pos", row_number().over(w).cast("long"))
      .filter(col("pos") <= prefixLen(col("ntok")))
      .select(col("source"), col("h"), col("doc_id"), col("ntok"), col("pos"))
    def lengthOk(aN: Column, bN: Column): Column =
      least(aN, bN).cast("double") >= lit(threshold) * greatest(aN, bN) - lit(1e-9)
    def positionOk(aN: Column, aP: Column, bN: Column, bP: Column): Column =
      lit(1) + least(aN - aP, bN - bP) >=
        ceil(lit(threshold) * (aN + bN) / lit(1 + threshold) - lit(1e-9))
    val tIdx = 2 * threshold / (1 + threshold)
    def idxPrefixLen(n: Column) =
      n - ceil(lit(tIdx) * n - lit(1e-9)).cast("long") + lit(1L)
    def indexPrefixOk(aN: Column, aP: Column, aId: Column,
                      bN: Column, bP: Column, bId: Column): Column =
      when(aN < bN || (aN === bN && aId < bId),
        aP <= idxPrefixLen(aN)).otherwise(bP <= idxPrefixLen(bN))

    val rawPairs = postings.select(col("source"), col("h"), col("doc_id").as("a_id"),
        col("ntok").as("a_n"), col("pos").as("a_p"))
      .join(postings.select(col("source"), col("h"), col("doc_id").as("b_id"),
        col("ntok").as("b_n"), col("pos").as("b_p")), Seq("source", "h"))
      .filter(col("a_id") < col("b_id") &&
        lengthOk(col("a_n"), col("b_n")) &&
        positionOk(col("a_n"), col("a_p"), col("b_n"), col("b_p")) &&
        indexPrefixOk(col("a_n"), col("a_p"), col("a_id"),
          col("b_n"), col("b_p"), col("b_id")))
    println("raw pre-distinct pairs = " + rawPairs.count())
    time("postings alone")(postings)

    // shipped shape
    time("shipped full")(
      graft.llm.TextQueries.prefixJaccardPairs(docs, threshold))

    // fused: arrays onto postings via broadcast, verify inline, distinct last
    val sides = docs.select(col("doc_id").as("d_id"), col("tok"))
    val pw = postings.join(broadcast(sides), postings("doc_id") === sides("d_id"))
      .select(col("source"), col("h"), col("doc_id"), col("ntok"), col("pos"), col("tok"))
    val fused = pw.select(col("source"), col("h"), col("doc_id").as("a_id"),
        col("ntok").as("a_n"), col("pos").as("a_p"), col("tok").as("a_tok"))
      .join(pw.select(col("source"), col("h"), col("doc_id").as("b_id"),
        col("ntok").as("b_n"), col("pos").as("b_p"), col("tok").as("b_tok")),
        Seq("source", "h"))
      .filter(col("a_id") < col("b_id") &&
        lengthOk(col("a_n"), col("b_n")) &&
        positionOk(col("a_n"), col("a_p"), col("b_n"), col("b_p")) &&
        indexPrefixOk(col("a_n"), col("a_p"), col("a_id"),
          col("b_n"), col("b_p"), col("b_id")))
      .withColumn("n_common",
        graft.functions.SortedIntersectCount.sortedIntersectCount(
          col("a_tok"), col("b_tok")))
      .withColumn("jaccard",
        col("n_common").cast("double") /
          (col("a_n") + col("b_n") - col("n_common")))
      .filter(col("jaccard") >= threshold)
      .select(col("source"), col("a_id"), col("b_id"),
        round(col("jaccard"), 4).as("jaccard"))
      .distinct()
      .orderBy("source", "a_id", "b_id")
    time("fused full")(fused)
    println("fused rows = " + fused.count())
    spark.stop()
  }
}
