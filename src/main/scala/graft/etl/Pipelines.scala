package graft.etl

import graft.sources.{CsvSource, ParquetSource, Source}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/** The three user-facing pipelines (`pyopenetl/pipelines.py`), re-expressed
  * as orchestration functions over the tested kernels. The reference's
  * writer-type validation (P0, pipelines.py:17-32) is subsumed by the sealed
  * [[Source]] ADT — invalid wiring does not typecheck.
  */
object Pipelines {

  /** SeedPipeline.execute (pipelines.py:35-70 → seed_table,
    * operations.py:404-474): snapshot copy, schema carried by parquet,
    * chunk loop ≙ partition parallelism, post-load index clone ≙ sorted
    * write.
    */
  def seedPipeline(spark: SparkSession, src: Source, destPath: String,
                   sortCols: Seq[String] = Nil): DataFrame = {
    val df  = TypeNormalizer.normalize(src.read(spark))
    val out = if (sortCols.nonEmpty)
      df.sortWithinPartitions(sortCols.map(df(_)): _*) else df
    out.write.mode("overwrite").parquet(destPath)
    spark.read.parquet(destPath)
  }

  /** UpdatePipeline.execute (pipelines.py:73-115 → update_table_via_upsert,
    * operations.py:515-609): delta-window upsert + delete reconciliation
    * against the current destination snapshot, then a two-phase snapshot
    * swap. The staging hop only resolves the read-your-own-overwrite
    * conflict (the merged plan reads destPath); the final overwrite is NOT
    * crash-atomic — parquet directories have no commit protocol, which is
    * the Delta/Iceberg seam at 100 TB (SURVEY.md §7.3). `asOf` is explicit
    * (never wall-clock — operations.py:539 quirk).
    */
  def updatePipeline(spark: SparkSession, src: Source, destPath: String,
                     pk: String, deltaCol: String, asOf: Column,
                     lookbackHours: Int = 1): DataFrame = {
    val source = TypeNormalizer.normalize(src.read(spark))
    val old    = spark.read.parquet(destPath)
    val result = UpsertKernel.upsert(old, source, pk, deltaCol, asOf,
      lookbackHours)
    val tmp = destPath + "_stage"
    result.write.mode("overwrite").parquet(tmp)
    spark.read.parquet(tmp).write.mode("overwrite").parquet(destPath)
    // destPath is fully written at this point; the staging snapshot is dead
    deletePath(spark, tmp)
    spark.read.parquet(destPath)
  }

  /** Hadoop-FS delete: works for any scheme (local, HDFS, object stores) —
    * a java.io.File delete only covers the local harness. */
  private[graft] def deletePath(spark: SparkSession, path: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(path)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
    ()
  }

  /** CrunchbaseFlatfilePipeline.execute (pipelines.py:118-127 →
    * ingest_crunchbase_flatfiles, operations.py:634-686): multi-CSV bulk
    * load. The reference's download+untar step is environment plumbing, not
    * engine; given extracted files, each target lands as its own table.
    */
  def flatfilePipeline(spark: SparkSession,
                       targets: Map[String, Seq[String]],
                       destRoot: String): Map[String, DataFrame] =
    targets.map { case (table, csvPaths) =>
      val dest = s"$destRoot/$table"
      TypeNormalizer.normalize(CsvSource(csvPaths).read(spark))
        .write.mode("overwrite").parquet(dest)
      table -> spark.read.parquet(dest)
    }

  /** Convenience: seed straight from a lake path (the harness's common
    * case). */
  def seedParquet(spark: SparkSession, srcPath: String, destPath: String)
      : DataFrame =
    seedPipeline(spark, ParquetSource(srcPath), destPath)
}
