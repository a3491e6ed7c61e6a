package graft.sources

import java.io.File
import java.nio.charset.StandardCharsets
import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Per-file min-max statistics maintained INCREMENTALLY under the
  * transaction log — Delta's data-skipping stats, kept honest about
  * freshness (engine-added; the closest thing the reference has is a
  * full-table re-read per run).
  *
  * [[graft.operators.Layout.buildMinMaxIndex]] indexes a static
  * directory; a committed table outgrows that: every commit adds files,
  * and re-scanning the table to rebuild the index defeats its purpose.
  * Here the stats table carries a VERSION WATERMARK: `refresh` scans
  * ONLY the files added since the last indexed version — O(Δ) like
  * every other incremental consumer of the log — and appends their
  * (file, min, max, n_rows) rows. Removed files' rows simply go stale;
  * reads intersect stats with the LIVE file set, so stale rows are
  * inert and an overwrite needs no index surgery.
  *
  * Freshness is a safety property, not a liveness one: a live file the
  * stats don't know yet (commits since the last refresh) is always
  * READ, never skipped — a stale index costs I/O, never rows.
  *
  * Stats are integral (LongType column required, like the bloom index's
  * hash-parity rule): exact long min/max, no float-boundary ambiguity.
  */
object TxnStats {

  private def statsDir(table: String, column: String) =
    new File(table, s"_graft_stats/$column")

  private def wmFile(table: String, column: String) =
    new File(statsDir(table, column), "_watermark.json")

  /** The table version the stats cover (0 = never refreshed). */
  def indexedVersion(table: String, column: String): Int = {
    val f = wmFile(table, column)
    if (!f.isFile) 0
    else "\"version\":(\\d+)".r
      .findFirstMatchIn(new String(Files.readAllBytes(f.toPath),
        StandardCharsets.UTF_8))
      .map(_.group(1).toInt).getOrElse(0)
  }

  /** Every file ADDED in (fromExclusive, toInclusive] — unlike
    * `TxnTable.addedFiles` this tolerates removal versions: stats for a
    * since-removed file are just stale rows the live-set intersection
    * ignores. */
  private def addedInRange(table: String, fromExclusive: Int,
                           toInclusive: Int): Seq[String] =
    TxnTable.logFiles(table)
      .filter(f => TxnTable.versionOf(f) > fromExclusive &&
        TxnTable.versionOf(f) <= toInclusive)
      .flatMap(f => TxnTable.parseEntry(f)._1)
      // deletion vectors carry no stats column — they are not data
      .filterNot(_.startsWith("dv/"))

  /** Bring the stats for `column` up to the table's current version by
    * scanning ONLY the newly added files. Returns the number of files
    * indexed (0 when already fresh). Idempotent per version. */
  def refresh(spark: SparkSession, table: String, column: String): Int = {
    val current = TxnTable.currentVersion(table)
    val wm = indexedVersion(table, column)
    if (wm >= current) return 0
    val newRel = addedInRange(table, wm, current)
    if (newRel.nonEmpty) {
      val abs = newRel.map(p => new File(table, p).getPath)
      val src = spark.read.parquet(abs: _*)
      val dt = src.schema(column).dataType
      require(dt == org.apache.spark.sql.types.LongType,
        s"stats column '$column' must be BIGINT (exact long min/max); got $dt")
      val tableAbs = new File(table).getAbsolutePath
      // |new files| rows — a model fetch, never data
      val rows = src.groupBy(input_file_name().as("file"))
        .agg(min(col(column)).as("min"), max(col(column)).as("max"),
          count(lit(1)).as("n_rows"))
        .collect().map { r =>
          val p = r.getString(0)
          val abs0 = if (p.startsWith("file:"))
            new File(new java.net.URI(p)).getAbsolutePath else p
          require(abs0.startsWith(tableAbs + "/"),
            s"stats file outside table root: $abs0")
          (abs0.stripPrefix(tableAbs + "/"),
            r.getLong(1), r.getLong(2), r.getLong(3))
        }
      import spark.implicits._
      statsDir(table, column).mkdirs()
      rows.toSeq.toDF("file", "min", "max", "n_rows")
        .coalesce(1).write.mode("append").parquet(statsDir(table, column).getPath)
    }
    statsDir(table, column).mkdirs()
    Files.write(wmFile(table, column).toPath,
      s"""{"version":$current}""".getBytes(StandardCharsets.UTF_8))
    newRel.size
  }

  /** Per-file (min, max, rows) for an INT64 column straight from the
    * parquet FOOTER's row-group statistics — metadata IO only, no data
    * pages, the same read class as [[TxnTable.footerRowCount]]. None
    * when any row group lacks usable stats for the column (then the
    * file stays unindexed, which the pruner treats as always-read) or
    * when every value is NULL (no min/max exists). */
  private def footerMinMax(f: File, column: String): Option[(Long, Long, Long)] = {
    val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
      new org.apache.hadoop.fs.Path(f.toURI),
      new org.apache.hadoop.conf.Configuration())
    val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
    try {
      import scala.jdk.CollectionConverters._
      val blocks = r.getFooter.getBlocks.asScala.toSeq
      val rows = blocks.map(_.getRowCount).sum
      val perBlock = blocks.map { b =>
        b.getColumns.asScala
          .find(_.getPath.toDotString == column)
          .map(_.getStatistics)
          .filter(s => s != null && !s.isEmpty)
          .map(s =>
            if (!s.hasNonNullValue) None // all-null chunk: no min/max
            else (s.genericGetMin, s.genericGetMax) match {
              case (mn: java.lang.Long, mx: java.lang.Long) =>
                Some((mn.longValue, mx.longValue))
              case _ => throw new IllegalArgumentException(
                s"stats column '$column' must be BIGINT; footer says otherwise")
            })
      }
      // every chunk must CARRY stats (else the file can't be summarized
      // soundly); all-null chunks contribute no bound
      if (perBlock.exists(_.isEmpty)) None
      else {
        val bounds = perBlock.flatten.flatten
        if (bounds.isEmpty) None // all rows null — nothing to bound
        else Some((bounds.map(_._1).min, bounds.map(_._2).max, rows))
      }
    } finally r.close()
  }

  /** [[refresh]]'s METADATA-ONLY twin: bring the stats up to head by
    * reading the new files' parquet footers instead of their data pages
    * — at 100 TB the difference between an O(Δ rows) scan job and
    * O(Δ files) footer reads, the same economics as the commit-time
    * row-count sidecars. A new file whose footer lacks usable stats is
    * simply left unindexed (the pruner always reads unindexed live
    * files — safety is never delegated to the footer). Interchangeable
    * with [[refresh]] per file: both record the exact same
    * (file, min, max, n_rows) row (spec-pinned). */
  def refreshFromFooters(spark: SparkSession, table: String,
                         column: String): Int = {
    val current = TxnTable.currentVersion(table)
    val wm = indexedVersion(table, column)
    if (wm >= current) return 0
    val newRel = addedInRange(table, wm, current)
    val rows = newRel.flatMap { rel =>
      footerMinMax(new File(table, rel), column)
        .map { case (mn, mx, n) => (rel, mn, mx, n) }
    }
    if (rows.nonEmpty) {
      statsDir(table, column).mkdirs()
      // one small parquet per refresh, same layout as the scan path:
      // |new files| rows of driver metadata
      import spark.implicits._
      rows.toDF("file", "min", "max", "n_rows")
        .coalesce(1).write.mode("append").parquet(statsDir(table, column).getPath)
    }
    statsDir(table, column).mkdirs()
    Files.write(wmFile(table, column).toPath,
      s"""{"version":$current}""".getBytes(StandardCharsets.UTF_8))
    rows.size
  }

  /** The live files a `[lo, hi]` point/range lookup must read:
    * stats-known files whose [min, max] overlaps the range, plus every
    * live file the stats have not indexed yet (never skip blind).
    * Returns (filesToRead, nLive) — both table-relative. */
  def pruneFiles(spark: SparkSession, table: String, column: String,
                 lo: Long, hi: Long): (Seq[String], Int) = {
    require(lo <= hi, s"bad range [$lo, $hi]")
    val live = TxnTable.liveSplit(table)._1
    val sd = statsDir(table, column)
    val stats: Map[String, (Long, Long)] =
      if (!sd.isDirectory) Map.empty
      else spark.read.parquet(sd.getPath)
        .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
        .toMap
    val toRead = live.filter { f =>
      stats.get(f) match {
        case Some((mn, mx)) => mn <= hi && mx >= lo
        case None => true // unindexed live file: read, never skip
      }
    }
    (toRead, live.size)
  }

  /** Range scan pruned by the stats: only overlapping (or unindexed)
    * live files are opened; the exact filter follows, so a skipped file
    * never costs a row and an opened file never leaks one. */
  def prunedRead(spark: SparkSession, table: String, column: String,
                 lo: Long, hi: Long): DataFrame = {
    val (toRead, _) = pruneFiles(spark, table, column, lo, hi)
    val (live, dvFiles) = TxnTable.liveSplit(table)
    require(live.nonEmpty, s"no live files in $table")
    val pick = if (toRead.nonEmpty) toRead else live.take(1)
    // route through the DV-aware file-list read: live deletion vectors
    // must anti-join the picked files or deleted rows resurface here
    val df = TxnTable.readFileList(spark, table, pick ++ dvFiles)
      .filter(col(column).between(lo, hi))
    if (toRead.nonEmpty) df else df.filter(lit(false))
  }
}
