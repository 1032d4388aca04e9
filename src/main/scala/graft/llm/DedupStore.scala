package graft.llm

import graft.etl.Snapshot
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Cross-run exact dedup against a persistent fingerprint store — the
  * production shape of one-shot content-hash dedup (q31) run as a daily
  * crawl pipeline: each batch drops documents whose content was ever seen
  * by ANY previous run, then records its own novel fingerprints, all
  * through the crash-atomic [[Snapshot]] delta protocol (O(batch) work
  * per run, compacted past the stack threshold; a killed run never
  * corrupts the store).
  *
  * The store holds fingerprints only — (content_hash, doc_id), never
  * text — so at 100 TB it is a vanishing fraction of corpus bytes and
  * the anti-join shuffles the incoming batch against a 128-bit key.
  * Within-batch duplicates collapse to the lowest-key row first (the
  * deterministic canonical, same tie-break as the one-shot dedup), so a
  * batch carrying its own repeats still commits one fingerprint each.
  */
object DedupStore {

  /** The batch rows novel to (store ∪ earlier rows of this batch), with
    * their `content_hash` attached; commits NOTHING. The returned frame
    * is pinned to the store version current at call time (Snapshot.read
    * resolves the pointer eagerly), so later commits don't re-filter it.
    */
  def novelAgainstStore(batch: DataFrame, storePath: String,
                        textCol: String = "text",
                        keyCol: String = "doc_id"): DataFrame = {
    val spark = batch.sparkSession
    val hashed = batch.withColumn("content_hash", sha2(col(textCol), 256))
    val w = Window.partitionBy(col("content_hash")).orderBy(col(keyCol))
    val canon = hashed.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1).drop("_rn")
    Snapshot.currentVersion(spark, storePath) match {
      case None => canon // first run: everything is novel
      case Some(_) =>
        canon.join(Snapshot.read(spark, storePath).select("content_hash"),
          Seq("content_hash"), "left_anti")
    }
  }

  /** Append the novel rows' fingerprints to the store (O(batch) delta
    * commit). In a two-destination pipeline (corpus + store), commit the
    * CORPUS first: a crash between the two commits then leaves content
    * unrecorded — the replayed batch re-commits the same rows, which the
    * pk-folded snapshot read absorbs — whereas fingerprints-first would
    * make the replay see its own content as "seen" and drop it forever.
    */
  def recordFingerprints(novel: DataFrame, storePath: String,
                         keyCol: String = "doc_id"): Unit = {
    Snapshot.commitDelta(
      novel.select(col("content_hash"), col(keyCol)),
      storePath, pk = "content_hash")
    ()
  }

  /** One-call form: novel rows returned, fingerprints committed. */
  def dedupeAgainstStore(batch: DataFrame, storePath: String,
                         textCol: String = "text",
                         keyCol: String = "doc_id"): DataFrame = {
    val novel = novelAgainstStore(batch, storePath, textCol, keyCol)
    recordFingerprints(novel, storePath, keyCol)
    novel
  }
}
