package graft.etl

import java.nio.charset.StandardCharsets.UTF_8

import org.apache.hadoop.fs.{FileContext, Options, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Crash-atomic snapshot commit over plain parquet — the reference wraps
  * every chunk write in a transaction (`pyopenetl/operations.py:181`
  * `sql_conn.begin()`); this restores that atomicity at snapshot
  * granularity without a table-format dependency (the full Delta/Iceberg
  * log remains the seam for row-level commits, SURVEY.md §7.3).
  *
  * Layout: `root/_v<N>/` holds complete parquet snapshots; `root/_current`
  * is a one-line pointer file naming the committed version. Commit order:
  *
  *   1. write the new snapshot into a fresh `_v<N+1>` directory — readers
  *      never look at it because the pointer still names `<N>`;
  *   2. write the pointer to a temp file and atomically rename it over
  *      `_current` ([[FileContext.rename]] with OVERWRITE — atomic on
  *      HDFS and POSIX; on S3-likes the pointer is one small object so
  *      the swap is a single atomic PUT);
  *   3. garbage-collect all versions except the new one and its
  *      predecessor (kept for readers that resolved the pointer just
  *      before the swap).
  *
  * A crash at any point leaves either the old pointer + a dead `_v` dir
  * (invisible to readers — underscore-prefixed paths are also ignored by
  * Spark's file index, so even a legacy `spark.read.parquet(root)` never
  * sees a partial version) or the new pointer + a complete snapshot. The
  * next successful commit always picks `max(pointer, existing dirs) + 1`,
  * so a crashed writer's orphan directory is never reused, and the GC pass
  * removes it. Single-writer: concurrent committers need the table-format
  * seam (a compare-and-swap on the pointer).
  */
object Snapshot {

  private val PointerName = "_current"

  private def conf(spark: SparkSession) =
    spark.sparkContext.hadoopConfiguration

  private def versionDir(root: String, v: Long) = new Path(root, s"_v$v")

  /** The committed version, if the root has ever been committed to. */
  def currentVersion(spark: SparkSession, root: String): Option[Long] = {
    val ptr = new Path(root, PointerName)
    val fs  = ptr.getFileSystem(conf(spark))
    if (!fs.exists(ptr)) None
    else {
      val in = fs.open(ptr)
      try Some(new String(in.readAllBytes(), UTF_8).trim.toLong)
      finally in.close()
    }
  }

  /** All `_v<N>` directories present, committed or not. */
  private def listVersions(spark: SparkSession, root: String): Seq[Long] = {
    val p  = new Path(root)
    val fs = p.getFileSystem(conf(spark))
    if (!fs.exists(p)) Nil
    else fs.globStatus(new Path(root, "_v*")).toSeq
      .filter(_.isDirectory)
      .flatMap(s => s.getPath.getName.stripPrefix("_v").toLongOption)
  }

  /** Resolve the pointer and read the committed snapshot. Roots that have
    * never been committed through [[commit]] fall back to a plain parquet
    * read, so legacy destinations upgrade on their next commit.
    */
  def read(spark: SparkSession, root: String): DataFrame =
    currentVersion(spark, root) match {
      case Some(v) =>
        val dir = versionDir(root, v)
        require(dir.getFileSystem(conf(spark)).exists(dir),
          s"snapshot pointer names _v$v but the directory is missing: $root")
        spark.read.parquet(dir.toString)
      case None => spark.read.parquet(root)
    }

  /** Commit `df` as the next version of `root` (see object doc for the
    * crash-safety argument) and return a reader over the committed files.
    * `partitionCols` lays the version out hive-partitioned (directory
    * pruning inside the committed snapshot).
    */
  def commit(df: DataFrame, root: String,
             partitionCols: Seq[String] = Nil): DataFrame = {
    val spark = df.sparkSession
    val prev  = currentVersion(spark, root)
    // one listing serves both the next-version pick and GC (single-writer
    // contract — nothing else appends versions mid-commit); on an object
    // store that's one LIST per commit, not two
    val seen  = listVersions(spark, root)
    val next  = (prev.getOrElse(0L) max seen.maxOption.getOrElse(0L)) + 1

    val w = df.write.mode("overwrite")
    (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w)
      .parquet(versionDir(root, next).toString)
    writePointer(spark, root, next)

    val fs = new Path(root).getFileSystem(conf(spark))
    seen.filter(v => v != next && !prev.contains(v))
      .foreach(v => fs.delete(versionDir(root, v), true))
    // first commit over a legacy plain-parquet root: drop the pre-protocol
    // top-level files, otherwise a reader still on the old contract
    // (spark.read.parquet(root)) silently reads the frozen pre-upgrade
    // snapshot forever and the dead copy holds its disk. After cleanup a
    // legacy read fails loudly instead — the correct outcome once the
    // root's contract has changed.
    if (prev.isEmpty)
      fs.listStatus(new Path(root))
        .filter(st => !st.getPath.getName.startsWith("_"))
        .foreach(st => fs.delete(st.getPath, true))
    spark.read.parquet(versionDir(root, next).toString)
  }

  /** Pointer swap: temp write + atomic OVERWRITE rename, so readers see
    * the old or the new pointer, never a torn one. */
  private def writePointer(spark: SparkSession, root: String, v: Long): Unit = {
    val ptr = new Path(root, PointerName)
    val tmp = new Path(root, s"$PointerName.tmp")
    val fs  = ptr.getFileSystem(conf(spark))
    val out = fs.create(tmp, true)
    try { out.write(v.toString.getBytes(UTF_8)); out.hflush() }
    finally out.close()
    FileContext.getFileContext(ptr.toUri, conf(spark))
      .rename(tmp, ptr, Options.Rename.OVERWRITE)
  }
}
