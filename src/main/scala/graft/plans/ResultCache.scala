package graft.plans

import java.io.File
import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{CurrentDate, CurrentTimestampLike, LocalTimestamp}
import org.apache.spark.sql.catalyst.plans.logical.{LocalRelation, LogicalPlan}
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat

import graft.sources.TxnTable

/** Plan-keyed RESULT CACHE over transactional snapshots (engine-added;
  * the warehouse feature the reference approximates by hand — its
  * notebooks re-run the same pandas aggregations over an unchanged
  * SQLite load every session, `pipeline.py` re-reads whole tables per
  * run). At 100 TB the dominant cost of a dashboard workload is
  * RE-RUNNING yesterday's queries over data that did not change; a
  * result cache turns those into a metadata check plus a read of the
  * (tiny) cached result.
  *
  * Soundness comes from the lakehouse, not from timestamps: a query is
  * cacheable only when EVERY scan in its plan resolves to a
  * [[TxnTable]] snapshot — an immutable, version-addressed file set.
  * The cache key is
  *
  *   sha-256( canonicalized plan with each scan replaced by a
  *            schema-only placeholder  ++  the scans' (table path,
  *            version) pins in traversal order )
  *
  * so the key IS the validity check — there is no separate
  * invalidation protocol:
  *   - re-running the same query over an unchanged table resolves to
  *     the same (path, version) pins → same key → HIT;
  *   - a commit to a scanned table moves its snapshot's file set → the
  *     re-planned query resolves to the new version → different key →
  *     MISS (recompute); the old entry is simply never asked for again;
  *   - a commit to an UNRELATED table changes no pin → still a HIT —
  *     the granularity a global "anything changed" timestamp can't give;
  *   - time-travel reads (`asOf`) resolve to their own version pin, so
  *     historical queries cache independently and stay valid forever
  *     (snapshots are immutable).
  *
  * Declines (returns no key, caller computes normally) whenever a hit
  * could be wrong: any scan that is not exactly a txn-table snapshot's
  * live file set (plain parquet dirs mutate invisibly; DV-bearing
  * snapshots read marker files that match no live set), any
  * non-deterministic expression, any current_timestamp/date (constant-
  * folded per query, so a hit would freeze time), streaming plans, and
  * duplicate output names (unwritable as parquet).
  *
  * Scale shape: a lookup is driver-side metadata only — ascend each
  * scan's root to its `_graft_log`, replay the log's file lists
  * (O(commits), never data), hash one string. A hit reads the cached
  * result's parquet; nothing else runs. Entries are self-contained
  * parquet dirs installed by atomic rename (crash mid-write leaves only
  * a staging dir the next write clears; a concurrent-writer race leaves
  * whichever equivalent result renamed first).
  */
object ResultCache {

  /** One cache interaction: the frame to use (cached read on a hit,
    * the original query otherwise), whether it hit, the key ("" when
    * the plan was uncacheable), and whether an entry now exists for it
    * (false when uncacheable OR when admission declined the install —
    * see [[run]]'s `maxResultFraction`). Row order of a hit is NOT the
    * computed order — parquet round-trips preserve rows, not order;
    * callers apply their own ORDER BY after, per house rule. */
  final case class Outcome(df: DataFrame, hit: Boolean, key: String,
                           installed: Boolean = true) {
    def cacheable: Boolean = key.nonEmpty
  }

  /** (table path, resolved version) when the scan reads EXACTLY some
    * version's live file set — unlike the MV advisor's head-only gate
    * ([[MvAdvisor]]), ANY version is admissible here: an `asOf` read is
    * perfectly cacheable because snapshots are immutable. Resolution
    * goes through [[TxnTable.resolveVersion]]'s one-pass set-hash
    * index — O(1) per lookup plus one verification replay — instead of
    * a newest-first probe that replays the log once per candidate
    * version and makes a deep `asOf` pin on a long-lived table cost
    * O(versions × entries) of driver IO per cache lookup. */
  private def snapshotOf(lr: LogicalRelation): Option[(String, Int)] =
    lr.relation match {
      case fs: HadoopFsRelation
          if fs.location.rootPaths.nonEmpty &&
            fs.fileFormat.isInstanceOf[ParquetFileFormat] =>
        val roots = fs.location.rootPaths
          .map(p => new File(p.toUri.getPath))
        TxnTable.tableRootOf(roots.head.getParentFile).flatMap { t =>
          // relativize against the table root — the form the log records
          val prefix = t.getCanonicalPath + File.separator
          val rel = roots.foldLeft(Option(Set.empty[String])) { (acc, f) =>
            acc.flatMap { s =>
              val p = f.getCanonicalPath
              if (p.startsWith(prefix)) Some(s + p.substring(prefix.length))
              else None // a root outside the table dir matches no snapshot
            }
          }
          rel.flatMap(TxnTable.resolveVersion(t.getPath, _)
            .map(v => (t.getPath, v)))
        }
      case _ => None
    }

  private def timeDependent(plan: LogicalPlan): Boolean =
    plan.exists(_.expressions.exists(_.exists {
      case _: CurrentTimestampLike | _: CurrentDate | _: LocalTimestamp => true
      case e => !e.deterministic
    }))

  /** The cache key, or None when the plan is uncacheable. Pure
    * metadata — touches the txn logs, never data. */
  def keyOf(df: DataFrame): Option[String] = keyAndPins(df).map(_._1)

  /** The (table path, version) pins of a cacheable plan, in plan
    * traversal order — what a workload report names as the tables a
    * repeated query depends on. None exactly when [[keyOf]] is None. */
  def pinsOf(df: DataFrame): Option[Seq[(String, Int)]] =
    keyAndPins(df).map(_._2)

  /** Render a plan WITHOUT the `spark.sql.debug.maxToStringFields`
    * elision (default 25): `treeString` truncates long argument lists
    * ("... 4 more fields"), so two plans differing only in a 26th+
    * projection column would render identically — and a key built from
    * the truncated text would collide, the one failure a result cache
    * must structurally exclude. Rendering under an unbounded clone of
    * the session conf keeps every field in the digest. */
  private def fullPlanString(plan: LogicalPlan): String = {
    import org.apache.spark.sql.internal.SQLConf
    val conf = SQLConf.get.clone()
    conf.setConf(SQLConf.MAX_TO_STRING_FIELDS, Int.MaxValue)
    SQLConf.withExistingConf(conf)(plan.toString)
  }

  /** [[keyOf]] and [[pinsOf]] in one traversal — a cacheability probe
    * replays txn logs per scan, so workload analyzers that need both
    * ([[WorkloadAdvisor]]) should pay that once, not twice. */
  def keyAndPins(df: DataFrame): Option[(String, Seq[(String, Int)])] =
    templateKeyAndPins(df).map { case (_, k, p) => (k, p) }

  /** (template hash, full key, pins): the template hash covers the
    * canonicalized plan with every snapshot scan replaced by a
    * placeholder but NOT the pins — two runs of the same query over
    * different versions share a template and differ in key. That split
    * is how a workload analyzer tells a cache-friendly repeat (same
    * template, same pins → serve from the result cache) from a
    * CHURNING repeat (same template, moving pins — the cache can never
    * hit; the right tool is a maintained summary view). */
  def templateKeyAndPins(df: DataFrame)
      : Option[(String, String, Seq[(String, Int)])] = {
    if (df.isStreaming) return None
    val plan = df.queryExecution.analyzed
    if ((plan +: plan.subqueriesAll).exists(timeDependent)) return None
    if (df.columns.distinct.length != df.columns.length) return None
    val pins = scala.collection.mutable.ArrayBuffer.empty[(String, Int)]
    var unresolvable = false
    // transformUpWithSubqueries visits children-first left-to-right and
    // descends into subquery plans, so placeholder positions and the pin
    // list stay aligned — and a scan hiding inside a scalar subquery can
    // never be silently dropped from the key.
    val template = plan.transformUpWithSubqueries {
      case lr: LogicalRelation =>
        snapshotOf(lr) match {
          case Some(pin) => pins += pin; LocalRelation(lr.output)
          case None => unresolvable = true; lr
        }
      case leaf: LocalRelation => leaf // literal data participates via toString
    }
    if (unresolvable || pins.isEmpty) None
    else {
      def sha(text: String): String = MessageDigest.getInstance("SHA-256")
        .digest(text.getBytes("UTF-8")).map("%02x".format(_)).mkString
      val templateText = fullPlanString(template.canonicalized)
      val key = sha(templateText + "\n" +
        pins.map { case (p, v) => s"$p@$v" }.mkString("\n"))
      Some((sha(templateText), key, pins.toSeq))
    }
  }

  /** Serve `query` through the cache at `cacheDir`: a hit reads the
    * stored result, a miss computes, installs (staging dir + atomic
    * rename), and serves the installed copy; an uncacheable plan is
    * returned as-is with hit=false.
    *
    * ADMISSION CONTROL: `maxResultFraction` caps what a miss may
    * install, as a fraction of the pinned snapshots' total rows (from
    * log/footer metadata, never a scan). A result bigger than the cap —
    * an identity projection, a barely-reducing join — would cost more
    * to store and serve than the scan it saves, and one such entry can
    * crowd a whole cache; it is computed to staging, measured by its
    * parquet footers, and DROPPED, with the original query served
    * (`installed = false`; the caller's collect recomputes — the price
    * of learning the result was oversize, paid once per miss, never
    * amortized into a bloated cache). The default admits everything. */
  def run(spark: SparkSession, query: DataFrame, cacheDir: String,
          maxResultFraction: Double = Double.PositiveInfinity): Outcome =
    keyAndPins(query) match {
      case None => Outcome(query, hit = false, key = "", installed = false)
      case Some((k, pins)) =>
        val dir = new File(cacheDir, k)
        def entryOk = new File(dir, "_SUCCESS").isFile &&
          spark.read.parquet(dir.getPath).columns.sameElements(query.columns)
        if (dir.isDirectory && entryOk) {
          // actively served → reprieve from a pending two-phase retire
          new File(dir, "_retired").delete()
          Outcome(spark.read.parquet(dir.getPath), hit = true, key = k)
        }
        else {
          org.apache.commons.io.FileUtils.deleteQuietly(dir)
          val staging = new File(cacheDir, s".stage_$k")
          org.apache.commons.io.FileUtils.deleteQuietly(staging)
          query.write.parquet(staging.getPath)
          if (!maxResultFraction.isPosInfinity) {
            val resultRows = Option(staging.listFiles())
              .getOrElse(Array.empty[File])
              .filter(f => f.isFile && f.getName.endsWith(".parquet"))
              .map(TxnTable.footerRowCount).sum
            val pinnedRows = pins
              .map { case (p, v) => TxnTable.snapshotRowCount(p, Some(v)) }
              .sum
            if (resultRows > maxResultFraction * pinnedRows) {
              org.apache.commons.io.FileUtils.deleteQuietly(staging)
              return Outcome(query, hit = false, key = k, installed = false)
            }
          }
          // pins metadata rides inside the entry (underscore-prefixed,
          // invisible to the parquet read) — what [[retain]] ages by
          val pinsJson = pins.map { case (p, v) =>
            s"""{"table":"${p.replace("\\", "\\\\").replace("\"", "\\\"")}","version":$v}"""
          }.mkString("[", ",", "]")
          java.nio.file.Files.write(
            new File(staging, "_pins.json").toPath,
            s"""{"pins":$pinsJson}""".getBytes("UTF-8"))
          if (!staging.renameTo(dir)) {
            // lost an install race — the winner's entry is the same
            // query at the same pins, i.e. equivalent; use theirs.
            org.apache.commons.io.FileUtils.deleteQuietly(staging)
            require(dir.isDirectory, s"result-cache install failed: $dir")
          }
          Outcome(spark.read.parquet(dir.getPath), hit = false, key = k)
        }
    }

  /** AGE-BASED retention, measured in VERSION DISTANCE — no wall clocks
    * in the decision: drop every entry one of whose pins has fallen
    * more than `maxLag` commits behind its table's current head (or
    * whose table is gone). A long-lived deployment calls this
    * periodically to bound the cache dir without knowing the workload:
    * dashboards re-pin to new heads every commit, so an entry `maxLag`
    * versions back is one nobody asks for — and if an `asOf`-pinned
    * historical reader DOES come back, [[run]] simply misses and
    * re-installs (snapshots are immutable, so the recompute is
    * identical). Entries without pins metadata (foreign files) are left
    * to [[evict]].
    *
    * Retirement is TWO-PHASE because a hit's DataFrame is lazy — a
    * reader served just before this call may still be scanning the
    * entry's files. The first cycle that finds an entry lagging only
    * MARKS it (`_retired`, underscore-invisible to the parquet read);
    * the entry is deleted by a LATER retain call that finds the mark
    * still present. [[run]] removes the mark on every hit, so an entry
    * actively being served keeps earning reprieves — size the retain
    * cadence above the longest query and no in-flight reader ever loses
    * its files mid-scan. No wall clocks in the decision: the grace
    * window is "one retention cycle", whatever cadence the operator
    * runs at. Returns the number of entries DELETED this cycle. */
  def retain(cacheDir: String, maxLag: Int): Int = {
    require(maxLag >= 0, s"maxLag must be >= 0, got $maxLag")
    val pinRe = """\{"table":"((?:[^"\\]|\\.)*)","version":(\d+)\}""".r
    val entries = Option(new File(cacheDir).listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory && !f.getName.startsWith("."))
    val dead = entries.filter { dir =>
      val pf = new File(dir, "_pins.json")
      pf.isFile && {
        val s = new String(java.nio.file.Files.readAllBytes(pf.toPath), "UTF-8")
        pinRe.findAllMatchIn(s).exists { m =>
          val table = m.group(1).replace("\\\"", "\"").replace("\\\\", "\\")
          val pinned = m.group(2).toInt
          val head = TxnTable.currentVersion(table)
          head == 0 || head - pinned > maxLag
        }
      }
    }
    val (marked, fresh) = dead.partition(d => new File(d, "_retired").isFile)
    fresh.foreach(d => new File(d, "_retired").createNewFile())
    marked.foreach(org.apache.commons.io.FileUtils.deleteQuietly)
    // an entry within the lag sheds any stale mark (e.g. the operator
    // widened maxLag between cycles) — marks always reflect THIS cycle
    entries.filterNot(dead.contains).foreach(d => new File(d, "_retired").delete())
    marked.length
  }

  /** Evict down to a BYTE budget: drop entries, stalest pin first
    * (largest version lag behind its table's head; missing/foreign
    * tables count as infinitely stale), ties to the LARGEST entry, until
    * the cache dir's entry bytes fit `maxBytes`. The companion to
    * [[retain]] for deployments sized in storage rather than versions —
    * staleness still leads the order because a lagging entry is one the
    * head-following workload has already stopped asking for, while a
    * big FRESH entry may be the cache's most valuable resident. Same
    * caveat as [[evict]]: run it when no query is mid-flight (deletion
    * here is immediate — a byte budget that deferred deletion would not
    * actually free bytes). Returns entries dropped. */
  def evictToBudget(cacheDir: String, maxBytes: Long): Int = {
    require(maxBytes >= 0, s"maxBytes must be >= 0, got $maxBytes")
    val pinRe = """\{"table":"((?:[^"\\]|\\.)*)","version":(\d+)\}""".r
    val entries = Option(new File(cacheDir).listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory && !f.getName.startsWith("."))
    final case class E(dir: File, bytes: Long, lag: Long)
    val es = entries.map { d =>
      val pf = new File(d, "_pins.json")
      val lag =
        if (!pf.isFile) Long.MaxValue
        else {
          val s = new String(
            java.nio.file.Files.readAllBytes(pf.toPath), "UTF-8")
          val lags = pinRe.findAllMatchIn(s).map { m =>
            val table = m.group(1).replace("\\\"", "\"").replace("\\\\", "\\")
            val head = TxnTable.currentVersion(table)
            if (head == 0) Long.MaxValue
            else (head - m.group(2).toInt).toLong
          }.toSeq
          if (lags.isEmpty) Long.MaxValue else lags.max
        }
      E(d, org.apache.commons.io.FileUtils.sizeOfDirectory(d), lag)
    }
    var total = es.map(_.bytes).sum
    val dead = scala.collection.mutable.ArrayBuffer.empty[E]
    for (e <- es.sortBy(e => (-e.lag, -e.bytes, e.dir.getName)))
      if (total > maxBytes) { dead += e; total -= e.bytes }
    dead.foreach(e => org.apache.commons.io.FileUtils.deleteQuietly(e.dir))
    dead.length
  }

  /** Drop entries whose pinned versions no longer resolve — i.e. every
    * key not in `liveKeys` (the keys the current workload still asks
    * for). Metadata-only; safe to run any time no query is mid-install. */
  def evict(cacheDir: String, liveKeys: Set[String]): Int = {
    val entries = Option(new File(cacheDir).listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory && !f.getName.startsWith("."))
    val dead = entries.filterNot(f => liveKeys.contains(f.getName))
    dead.foreach(org.apache.commons.io.FileUtils.deleteQuietly)
    dead.length
  }
}
