package graft.sources

import java.io.File
import java.nio.charset.StandardCharsets
import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Multi-table ATOMIC commit over a set of [[TxnTable]]s — the missing
  * piece the reference's warehouse DAG needs: its schema-gated run
  * (reference `pipeline.py:1068-1074`) loads six tables "together", but
  * each `to_sql` lands independently, so a crash mid-run leaves the
  * warehouse half-updated. Here the unit of visibility is a CATALOG
  * transaction: N per-table commits become visible to catalog readers
  * through ONE atomic log-entry publish — all or none, the metastore/
  * Nessie idea in its minimal honest form.
  *
  * Layout:
  * {{{
  *   catalog/
  *     tables/<name>/             -- each a TxnTable (data + _graft_log)
  *     _graft_txn/t00001.json     -- {"txn":1,"tables":{"cust":2,"ord":1},
  *                                --  "versions":{"cust":[2],"ord":[1]}}
  * }}}
  *
  * Protocol: stage every table write as a normal TxnTable commit (each
  * atomic per-table, but INVISIBLE to catalog readers), then publish one
  * catalog entry — the same put-if-absent link(2) commit point TxnTable
  * uses. A crash or a lost race between the table commits and the
  * catalog publish leaves committed-but-unreferenced table versions:
  * catalog readers replay ONLY entry-listed versions, so orphans are
  * invisible (and die in the per-table vacuum), never half a
  * transaction.
  *
  * Every entry is a SELF-CONTAINED snapshot: `tables` pins each table's
  * head version, and `versions` lists the exact per-table version
  * LINEAGE composing the snapshot — reads replay those log entries and
  * nothing else. Self-containment is what makes [[restore]] sound: a
  * rolled-back transaction's versions sit in the per-table log below a
  * later head, and any cross-entry "all versions ever created" scan
  * would resurrect them (a bug this module's spec caught in an earlier
  * design).
  */
object TxnCatalog {

  /** One table write inside a transaction. `overwrite = true` replaces
    * the table's catalog-visible content; `false` appends. */
  final case class Write(name: String, df: DataFrame, overwrite: Boolean = false)

  def tablePath(catalog: String, name: String): String =
    new File(new File(catalog, "tables"), name).getPath

  private def txnDir(catalog: String) = new File(catalog, "_graft_txn")

  private def txnOf(f: File): Int =
    f.getName.stripPrefix("t").stripSuffix(".json").toInt

  private def txnFiles(catalog: String): Seq[File] =
    Option(txnDir(catalog).listFiles()).getOrElse(Array.empty)
      .filter(f => f.isFile && f.getName.matches("t\\d{5}\\.json"))
      .sortBy(txnOf).toSeq

  /** Latest committed transaction, 0 if the catalog is unborn. */
  def currentTxn(catalog: String): Int =
    txnFiles(catalog).lastOption.map(txnOf).getOrElse(0)

  /** Table names are path segments AND log-parser tokens — keep both
    * honest with one grammar. */
  private def checkName(name: String): Unit =
    require(name.matches("[A-Za-z0-9._-]+"),
      s"table name must be [A-Za-z0-9._-]+: '$name'")

  private def jsonMap(m: Map[String, Int]): String =
    m.toSeq.sortBy(_._1)
      .map { case (k, v) => s""""$k":$v""" }.mkString("{", ",", "}")

  /** Parse `{"name":version,...}` after the given key — same
    * dependency-free quote-scan contract as TxnTable's log parser. */
  private def parseMap(s: String, key: String): Map[String, Int] = {
    val i = s.indexOf("\"" + key + "\":{")
    require(i >= 0, s"malformed catalog entry: missing $key")
    val body = s.substring(s.indexOf('{', i) + 1, s.indexOf('}', i))
    "\"([A-Za-z0-9._-]+)\":(\\d+)".r.findAllMatchIn(body)
      .map(m => m.group(1) -> m.group(2).toInt).toMap
  }

  private def jsonLists(m: Map[String, Seq[Int]]): String =
    m.toSeq.sortBy(_._1)
      .map { case (k, vs) => s""""$k":${vs.mkString("[", ",", "]")}""" }
      .mkString("{", ",", "}")

  /** Parse the `"versions"` object: `{"name":[1,3],...}`. The bracketed-
    * value regex cannot match inside `tables` (plain ints) or `tag`
    * (quoted string), so a whole-entry scan is exact. */
  private def parseLists(s: String): Map[String, Seq[Int]] = {
    require(s.contains("\"versions\":{"),
      "malformed catalog entry: missing versions")
    "\"([A-Za-z0-9._-]+)\":\\[([0-9,]*)\\]".r.findAllMatchIn(s)
      .map(m => m.group(1) ->
        m.group(2).split(',').filter(_.nonEmpty).map(_.toInt).toSeq)
      .toMap
  }

  /** Column MAPPING (rename without rewrite): per table, physical parquet
    * column name → logical name. Serialized flat as `"tbl|phys":"logical"`
    * (`|` is outside both name grammars, so the split is exact); absent
    * in pre-mapping entries. Entries stay self-contained: each carries
    * the FULL map for its snapshot, so restore and time travel resolve
    * names from the entry alone. */
  private def jsonColmap(m: Map[String, Map[String, String]]): String =
    m.toSeq.sortBy(_._1).flatMap { case (t, cols) =>
      cols.toSeq.sortBy(_._1).map { case (p, l) => s""""$t|$p":"$l"""" }
    }.mkString("{", ",", "}")

  private def parseColmap(s: String): Map[String, Map[String, String]] = {
    val i = s.indexOf("\"colmap\":{")
    if (i < 0) Map.empty
    else {
      val body = s.substring(s.indexOf('{', i) + 1, s.indexOf('}', i))
      "\"([A-Za-z0-9._-]+)\\|([A-Za-z0-9_]+)\":\"([A-Za-z0-9_]+)\"".r
        .findAllMatchIn(body)
        .map(m => (m.group(1), m.group(2), m.group(3))).toSeq
        .groupBy(_._1)
        .map { case (t, rows) => t -> rows.map(r => r._2 -> r._3).toMap }
    }
  }

  /** DROPPED columns (physical names) per table — serialized flat as
    * `"tbl|phys":1` under `"coldrop"`. A dropped column vanishes from
    * reads; the bytes stay (and older snapshots still show it). */
  private def jsonDrops(m: Map[String, Set[String]]): String =
    m.toSeq.sortBy(_._1).flatMap { case (t, cols) =>
      cols.toSeq.sorted.map(c => s""""$t|$c":1""")
    }.mkString("{", ",", "}")

  private def parseDrops(s: String): Map[String, Set[String]] = {
    val i = s.indexOf("\"coldrop\":{")
    if (i < 0) Map.empty
    else {
      val body = s.substring(s.indexOf('{', i) + 1, s.indexOf('}', i))
      "\"([A-Za-z0-9._-]+)\\|([A-Za-z0-9_]+)\":1".r
        .findAllMatchIn(body)
        .map(m => (m.group(1), m.group(2))).toSeq
        .groupBy(_._1)
        .map { case (t, rows) => t -> rows.map(_._2).toSet }
    }
  }

  /** The per-table dropped-column set of a snapshot. */
  private[sources] def colDrops(catalog: String,
                                asOf: Option[Int]): Map[String, Set[String]] =
    entryAt(catalog, asOf) match {
      case None => Map.empty
      case Some(f) => parseDrops(new String(Files.readAllBytes(f.toPath),
        StandardCharsets.UTF_8))
    }

  /** The per-table column map of a snapshot (physical → logical). */
  private[sources] def colMap(catalog: String,
                              asOf: Option[Int]): Map[String, Map[String, String]] =
    entryAt(catalog, asOf) match {
      case None => Map.empty
      case Some(f) => parseColmap(new String(Files.readAllBytes(f.toPath),
        StandardCharsets.UTF_8))
    }

  private def entryAt(catalog: String, asOf: Option[Int]): Option[File] =
    txnFiles(catalog).filter(f => asOf.forall(txnOf(f) <= _)).lastOption

  /** The per-table version lineage as of `asOf` — the exact log entries
    * a read replays. */
  private[sources] def versionLists(catalog: String,
                                    asOf: Option[Int]): Map[String, Seq[Int]] =
    entryAt(catalog, asOf) match {
      case None => Map.empty
      case Some(f) => parseLists(new String(Files.readAllBytes(f.toPath),
        StandardCharsets.UTF_8))
    }

  /** Per-table lineage LENGTH of a snapshot — the number of log entries a
    * read of `name` replays (the metadata cost [[compactLineage]] bounds).
    * 0 if the table is absent. */
  def lineageLength(catalog: String, name: String, asOf: Option[Int] = None): Int =
    versionLists(catalog, asOf).get(name).map(_.length).getOrElse(0)

  /** The full table→version mapping as of `asOf` (latest when None). */
  def tableVersions(catalog: String, asOf: Option[Int] = None): Map[String, Int] =
    entryAt(catalog, asOf) match {
      case None => Map.empty
      case Some(f) =>
        parseMap(new String(Files.readAllBytes(f.toPath),
          StandardCharsets.UTF_8), "tables")
    }

  /** The writer tag published with transaction `txn`, if any. */
  def commitTag(catalog: String, txn: Int): Option[String] = {
    val f = new File(txnDir(catalog), f"t$txn%05d.json")
    if (!f.isFile) None
    else "\"tag\":\"([^\"]*)\"".r
      .findFirstMatchIn(new String(Files.readAllBytes(f.toPath),
        StandardCharsets.UTF_8)).map(_.group(1))
  }

  /** Commit every write in `writes` as ONE catalog transaction and
    * return its number. Readers see all of them or none of them.
    *
    * Optimistic concurrency mirrors [[TxnTable.commit]]: pass
    * `expectedTxn` to pin the snapshot this writer built on + 1; a lost
    * race throws `ConcurrentModificationException` AFTER the per-table
    * commits — those versions stay orphaned (catalog-invisible, swept by
    * per-table vacuum), the standard re-read-and-retry loop applies. */
  def commitAll(spark: SparkSession, catalog: String, writes: Seq[Write],
                expectedTxn: Option[Int] = None,
                tag: Option[String] = None): Int = {
    require(writes.nonEmpty, "a transaction needs at least one write")
    require(writes.map(_.name).distinct.size == writes.size,
      s"one version per table per txn: duplicate names in ${writes.map(_.name)}")
    writes.foreach(w => checkName(w.name))
    val txn = expectedTxn.getOrElse(currentTxn(catalog) + 1)
    require(txn >= 1, s"expectedTxn must be >= 1, got $txn")
    val base = tableVersions(catalog, Some(txn - 1))
    // stage: per-table commits, catalog-invisible until the entry lands.
    // An overwrite must remove exactly the CATALOG-visible files, not the
    // table-local live set (which may include orphans a failed txn added
    // and this replay never saw) — so overwrites land as append commits
    // and the removal is carried by the catalog replay: a created version
    // with "overwrite" semantics resets the reader's file set. Encode
    // that by committing through TxnTable with overwrite = w.overwrite:
    // TxnTable's removal list is a superset of the catalog-visible files
    // (same files plus orphans), and replay subtracts only what it added,
    // so both ledgers agree on the catalog-visible outcome.
    val cmap = colMap(catalog, Some(txn - 1))
    val dmap = colDrops(catalog, Some(txn - 1))
    val created = writes.map { w =>
      // the caller writes LOGICAL column names; physical parquet names
      // never change across a rename, so reverse-map before the write
      val toPhys = cmap.getOrElse(w.name, Map.empty).map(_.swap)
      val phys = toPhys.foldLeft(w.df) { case (df, (l, p)) =>
        if (df.columns.contains(l)) df.withColumnRenamed(l, p) else df
      }
      // a DROPPED physical name cannot be re-added in place — reads would
      // silently hide it again; re-introduce the data under a new name
      val clash = phys.columns.filter(
        dmap.getOrElse(w.name, Set.empty).contains)
      require(clash.isEmpty,
        s"column(s) ${clash.mkString(", ")} of '${w.name}' were DROPPED — " +
          "re-adding needs a new column name")
      w.name -> TxnTable.commit(spark, phys, tablePath(catalog, w.name),
        overwrite = w.overwrite, tag = tag)
    }.toMap
    val baseLists = versionLists(catalog, Some(txn - 1))
    val byName = writes.map(w => w.name -> w.overwrite).toMap
    val lists = baseLists ++ created.map { case (name, v) =>
      // an overwrite's removal list covers every catalog-visible file
      // (it removes the table-local live superset), so replaying [v]
      // alone is exact — the lineage TRUNCATES instead of growing,
      // bounding entry size for overwrite-style tables
      name -> (if (byName(name)) Seq(v)
               else baseLists.getOrElse(name, Seq.empty) :+ v)
    }
    // Append-heavy sinks (one version per streaming micro-batch) would
    // otherwise grow every subsequent ENTRY by one version forever —
    // O(txns) metadata per entry. Past the cap, squash the lineage to a
    // single metadata-only file-list version (the [[compactLineage]]
    // move applied automatically at commit time): O(|live files|)
    // driver work, zero data rewritten, time travel unaffected (older
    // entries keep replaying their own lineages).
    val maxLineage = math.max(1, spark.conf
      .get("spark.graft.catalog.maxLineage", "64").toInt)
    var tables = base ++ created
    val capped = lists.map { case (name, lin) =>
      if (lin.length <= maxLineage) name -> lin
      else {
        val table = tablePath(catalog, name)
        val v = TxnTable.publishFileList(table, liveForLineage(table, lin), tag)
        tables += name -> v
        name -> Seq(v)
      }
    }
    publishEntry(catalog, txn, tables, capped, tag, cmap, dmap)
  }

  /** Zero-copy CATALOG CLONE — the dev-sandbox-from-prod move: every
    * regular file under `src` (table data, deletion vectors, per-table
    * logs and checkpoints, catalog entries — the FULL metadata tree)
    * hard-links into the identical relative layout at `dst`. Unlike
    * [[TxnTable.cloneShallow]] (which collapses a snapshot to a fresh
    * v1), the clone keeps every version number and txn entry intact, so
    * per-table lineages in catalog entries keep resolving and TIME
    * TRAVEL works on the clone across the entire pre-clone history.
    * O(|files|) metadata operations, zero data copied.
    *
    * Divergence is free for the same reason as cloneShallow: both sides
    * only ever ADD files, and each side's vacuum unlinks only its own
    * directory entries. Torn `.tmp` staging files are skipped — a clone
    * taken mid-crash never resurrects a torn entry.
    *
    * The clone is PINNED to the source head observed on entry: catalog
    * entries past that txn and per-table log/checkpoint entries past the
    * highest version any pinned entry references are skipped, so a
    * commit racing the walk can never produce a TORN clone (a linked
    * entry whose data files the walk had already passed by). Everything
    * a pinned entry references existed before the pin, so the walk is
    * complete for it; data files a racer stages mid-walk link over as
    * harmless catalog-invisible orphans (the clone's vacuum sweeps
    * them). Returns the cloned head txn (= the pin). */
  def cloneCatalog(src: String, dst: String): Int = {
    val head = currentTxn(src)
    require(head >= 1, s"nothing to clone: $src has no txns")
    require(currentTxn(dst) == 0 && !new File(dst).exists(),
      s"clone target $dst already exists")
    // highest table version ANY entry ≤ head references (not just the
    // head's mapping — a restore's head maps to OLD versions while
    // earlier entries still travel to newer ones)
    val pinned = scala.collection.mutable.Map.empty[String, Int]
    (1 to head).foreach { t =>
      versionLists(src, Some(t)).foreach { case (n, lin) =>
        val hi = (lin ++ tableVersions(src, Some(t)).get(n)).max
        pinned(n) = math.max(pinned.getOrElse(n, 0), hi)
      }
    }
    val srcPath = new File(src).toPath
    val dstPath = new File(dst).toPath
    val txnRel = srcPath.relativize(txnDir(src).toPath)
    def pastPin(p: java.nio.file.Path): Boolean = {
      val name = p.getFileName.toString
      val rel = srcPath.relativize(p)
      if (rel.startsWith(txnRel) && name.matches("t\\d{5}\\.json"))
        txnOf(p.toFile) > head
      else if (rel.getNameCount == 3 &&
          rel.getName(1).toString == "_graft_log" &&
          name.matches("[vc]\\d{5}\\.json"))
        name.drop(1).stripSuffix(".json").toInt >
          pinned.getOrElse(rel.getName(0).toString, 0)
      else false
    }
    val stream = Files.walk(srcPath)
    try {
      stream.filter(p => Files.isRegularFile(p)).forEach { p =>
        if (!p.getFileName.toString.endsWith(".tmp") && !pastPin(p)) {
          val to = dstPath.resolve(srcPath.relativize(p))
          Files.createDirectories(to.getParent)
          Files.createLink(to, p)
        }
      }
    } finally stream.close()
    currentTxn(dst)
  }

  /** Catalog WRITE-AUDIT-PUBLISH — [[TxnTable.publishFrom]] raised to
    * the whole warehouse: `branch` is a [[cloneCatalog]] of `main`,
    * audited with any number of [[commitAll]] transactions (loads,
    * merges, deletes, schema changes — anything), and the entire audit
    * becomes visible on `main` as ONE catalog entry: `main`'s head
    * snapshot overlaid with the branch's state for every table the
    * audit TOUCHED, squashed to `main`'s next txn. Only the touched
    * tables' new files and log entries hard-link over (crash =
    * invisible orphans); the put-if-absent entry publish is the single
    * commit point, so readers see the audit entirely or not at all.
    *
    * Concurrency is TABLE-SCOPED: the fork point is the longest prefix
    * of txn entries the two catalogs share BY INODE IDENTITY (txn
    * numbers can collide across a divergence and even serialize
    * identically — content and numbering comparisons are not sound;
    * inodes are). Two audits forked from the same head may both publish
    * as long as the table sets they touched are DISJOINT from what
    * `main` accumulated since each one's fork — the lakehouse norm
    * (Delta/Iceberg serialize on conflicting tables only, not the
    * warehouse). A touched-table conflict refuses: re-clone and replay
    * the audit. Within a touched table, every file `main` holds must
    * still be the branch's same inode — an out-of-band mutation the
    * entry diff cannot see also refuses. A concurrent `main` writer
    * racing the publish itself loses to the same link(2) adjudication
    * every commit uses. Returns the published txn (`main`'s head when
    * the branch never diverged). */
  def publishFrom(branch: String, main: String,
                  tag: Option[String] = None): Int = {
    val mainTxn = currentTxn(main)
    val branchTxn = currentTxn(branch)
    require(mainTxn >= 1 && branchTxn >= 1,
      s"$branch (t$branchTxn) / $main (t$mainTxn): nothing to publish")
    val fork = forkTxn(branch, main, branchTxn, mainTxn)
    if (branchTxn == fork) return mainTxn // audit committed nothing
    val auditTables = touchedSince(branch, fork, branchTxn)
    // an audit whose NET state equals the fork (e.g. commits then a
    // restore back) has nothing to publish — don't burn a txn on a
    // byte-identical duplicate entry
    if (auditTables.isEmpty) return mainTxn
    val conflicts = auditTables.intersect(touchedSince(main, fork, mainTxn))
    if (conflicts.nonEmpty) throw new WapConflictException(
      s"table(s) ${conflicts.toSeq.sorted.mkString(", ")} changed on BOTH " +
        s"$main and $branch since the fork (t$fork) — re-clone and replay " +
        "the audit")
    // scoped inode fork-safety: within each audited table, anything main
    // holds must be the very file the branch inherited
    for (t <- auditTables) {
      val mDir = new File(tablePath(main, t)).toPath
      val bDir = new File(tablePath(branch, t)).toPath
      if (Files.isDirectory(mDir)) {
        val walk = Files.walk(mDir)
        try walk.filter(p => Files.isRegularFile(p)).forEach { p =>
          if (!p.getFileName.toString.endsWith(".tmp")) {
            val b = bDir.resolve(mDir.relativize(p))
            require(Files.isRegularFile(b) &&
              Files.getAttribute(p, "unix:ino") == Files.getAttribute(b, "unix:ino"),
              s"table '$t' of $main diverged from $branch since the fork " +
                s"(${mDir.relativize(p)}) — re-clone and replay the audit")
          }
        } finally walk.close()
      }
    }
    // link the audited tables' files over; pre-existing paths are the
    // shared clone inodes already (verified above), so only new files land
    for (t <- auditTables; if Files.isDirectory(new File(tablePath(branch, t)).toPath)) {
      val bDir = new File(tablePath(branch, t)).toPath
      val mDir = new File(tablePath(main, t)).toPath
      val stream = Files.walk(bDir)
      try {
        stream.filter(p => Files.isRegularFile(p)).forEach { p =>
          if (!p.getFileName.toString.endsWith(".tmp")) {
            val to = mDir.resolve(bDir.relativize(p))
            if (!Files.exists(to)) {
              Files.createDirectories(to.getParent)
              try Files.createLink(to, p)
              catch { case _: java.nio.file.FileAlreadyExistsException => () }
            }
          }
        }
      } finally stream.close()
    }
    val bv = tableVersions(branch, Some(branchTxn))
    val blists = versionLists(branch, Some(branchTxn))
    val bcmap = colMap(branch, Some(branchTxn))
    val bdrops = colDrops(branch, Some(branchTxn))
    publishEntry(main, mainTxn + 1,
      tableVersions(main, Some(mainTxn)) ++
        auditTables.flatMap(t => bv.get(t).map(t -> _)),
      versionLists(main, Some(mainTxn)) ++
        auditTables.flatMap(t => blists.get(t).map(t -> _)),
      tag,
      (colMap(main, Some(mainTxn)) -- auditTables) ++
        bcmap.filter(kv => auditTables(kv._1)),
      (colDrops(main, Some(mainTxn)) -- auditTables) ++
        bdrops.filter(kv => auditTables(kv._1)))
  }

  /** [[publishFrom]]'s refusal when an audited table also changed on
    * main since the fork — TYPED so [[publishFromOrRebase]]'s dispatch
    * doesn't hang off exception prose. Extends IllegalArgumentException
    * to keep `require`-style handling at existing call sites. */
  final class WapConflictException(msg: String)
      extends IllegalArgumentException(msg)

  /** The last catalog txn `branch` shares with `main` BY INODE — version
    * numbers are not fork identity (two catalogs can both be "at t3" with
    * different histories); the shared hard-linked entry file is. */
  private def forkTxn(branch: String, main: String,
                      branchTxn: Int, mainTxn: Int): Int = {
    def entryIno(cat: String, t: Int): Option[AnyRef] = {
      val f = new File(txnDir(cat), f"t$t%05d.json")
      if (f.isFile) Some(Files.getAttribute(f.toPath, "unix:ino")) else None
    }
    val fork = (1 to math.min(mainTxn, branchTxn)).takeWhile { t =>
      val (m, b) = (entryIno(main, t), entryIno(branch, t))
      m.isDefined && m == b
    }.lastOption.getOrElse(0)
    require(fork >= 1,
      s"$branch is not a clone of $main — no shared txn entry")
    fork
  }

  /** Tables whose snapshot state moved in (`fork`, `head`]: version,
    * lineage, column mapping, or drop set — restores and metadata-only
    * schema ops all surface here. */
  private def touchedSince(cat: String, fork: Int, head: Int): Set[String] =
    if (head == fork) Set.empty
    else {
      val (v0, v1) = (tableVersions(cat, Some(fork)), tableVersions(cat, Some(head)))
      val (l0, l1) = (versionLists(cat, Some(fork)), versionLists(cat, Some(head)))
      val (c0, c1) = (colMap(cat, Some(fork)), colMap(cat, Some(head)))
      val (d0, d1) = (colDrops(cat, Some(fork)), colDrops(cat, Some(head)))
      (v0.keySet ++ v1.keySet).filter { n =>
        v0.get(n) != v1.get(n) || l0.get(n) != l1.get(n) ||
          c0.get(n) != c1.get(n) || d0.get(n) != d1.get(n)
      }
    }

  /** WAP AUTO-REBASE — [[publishFrom]] with the manual re-clone-and-
    * replay loop automated: when the publish refuses because a table
    * changed on BOTH sides since the fork, re-fork a fresh clone from
    * `main`'s CURRENT head, replay the audit's kept writes onto it, and
    * publish that. The replay is mechanical because the branch's ledgers
    * hold everything needed:
    *
    *  - a NON-conflicted audited table's state in the new clone equals
    *    its fork state, so its branch log entries (version numbers and
    *    all) and data files link over verbatim;
    *  - a CONFLICTED table rebases only if the audit's versions are PURE
    *    APPENDS (no removals, no re-lists — [[TxnTable.addedFiles]]'s
    *    contract): the appended files re-publish as fresh versions on
    *    top of main's advanced head. An audit that overwrote, deleted,
    *    or remapped columns on a table main also changed is a GENUINE
    *    conflict — it refuses, because replaying a removal computed
    *    against the fork's file set onto a different head would remove
    *    the wrong rows.
    *
    * The rebase clone lands beside the branch (`<branch>_rebase<k>`) and
    * is published with ONE catalog txn, then [[publishFrom]] completes
    * as usual. Returns main's new head txn. The original branch is left
    * untouched (still a valid audit trail). */
  def publishFromOrRebase(branch: String, main: String,
                          tag: Option[String] = None): Int = {
    try publishFrom(branch, main, tag)
    catch {
      case _: WapConflictException => rebaseAndPublish(branch, main, tag)
    }
  }

  private def rebaseAndPublish(branch: String, main: String,
                               tag: Option[String]): Int = {
    val mainTxn = currentTxn(main)
    val branchTxn = currentTxn(branch)
    val fork = forkTxn(branch, main, branchTxn, mainTxn)
    val auditTables = touchedSince(branch, fork, branchTxn)
    val conflicts = auditTables.intersect(touchedSince(main, fork, mainTxn))
    // the audit's colmap/drop changes on a conflicted table cannot be
    // re-applied over main's independent changes — genuine conflict
    val bcmapB = colMap(branch, Some(branchTxn))
    val bdropB = colDrops(branch, Some(branchTxn))
    val cmapF = colMap(branch, Some(fork))
    val dropF = colDrops(branch, Some(fork))
    for (t <- conflicts)
      require(bcmapB.get(t) == cmapF.get(t) && bdropB.get(t) == dropF.get(t),
        s"table '$t' changed on both sides AND the audit remapped/dropped " +
          "columns on it — cannot rebase; re-run the audit on a new clone")
    // conflicted tables must be pure appends on the audit side, and the
    // appended files must not collide with anything main now holds
    val forkV = tableVersions(branch, Some(fork))
    val branchV = tableVersions(branch, Some(branchTxn))
    val appended: Map[String, Seq[Seq[String]]] = conflicts.toSeq.map { t =>
      val tPath = tablePath(branch, t)
      // a table the FORK never had but both sides now hold was CREATED
      // independently on each — same name, unrelated content; replaying
      // the audit's rows on top of main's would silently union two
      // different tables. Genuine conflict.
      require(forkV.contains(t),
        s"table '$t' was created independently on both $main and the " +
          "audit since the fork — cannot rebase; re-run the audit on a " +
          "new clone")
      val from = forkV(t)
      val to = branchV.getOrElse(t,
        throw new IllegalArgumentException(
          s"table '$t' was dropped by the audit but changed on $main — " +
            "cannot rebase"))
      require(to > from,
        s"table '$t': audit moved it backwards (restore) while $main " +
          "changed it — cannot rebase; re-run the audit on a new clone")
      val perVersion = (from + 1 to to).map { v =>
        val f = new File(TxnTable.logDir(tPath), f"v$v%05d.json")
        require(f.isFile, s"table '$t': missing branch log entry v$v")
        val (added, removed) = TxnTable.parseEntry(f)
        require(removed.isEmpty,
          s"table '$t' changed on both sides and the audit REMOVED files " +
            s"in v$v — a removal computed against the fork cannot replay " +
            "onto main's head; re-run the audit on a new clone")
        // a deletion-vector commit (MOR delete) has removed=[] but is a
        // ROW REMOVAL addressed at fork-era (file, row) positions — on
        // main's advanced head those addresses may point at rewritten or
        // vanished files, silently deleting nothing (or the wrong rows)
        require(added.forall(!_.startsWith("dv/")),
          s"table '$t' changed on both sides and the audit added a " +
            s"DELETION VECTOR in v$v — row addresses computed against " +
            "the fork cannot replay onto main's head; re-run the audit " +
            "on a new clone")
        added
      }
      // a re-list (squash) re-adds fork-live files — refuse like addedFiles
      val forkLive = TxnTable.liveFiles(tPath, Some(from)).toSet
      perVersion.foreach { vs =>
        val relist = vs.filter(forkLive)
        require(relist.isEmpty,
          s"table '$t': the audit squashed its lineage (re-list of " +
            s"${relist.size} file(s)) — cannot rebase; re-run the audit")
      }
      t -> perVersion
    }.toMap
    // fresh clone of main's head — the rebase target
    var k = 1
    while (new File(s"${branch}_rebase$k").exists()) k += 1
    val reb = s"${branch}_rebase$k"
    cloneCatalog(main, reb)
    val rebTxnAtClone = currentTxn(reb)
    // replay: non-conflicted tables link verbatim (log entries included —
    // their base state in the clone equals the fork state); conflicted
    // tables re-publish their appended files as fresh versions
    for (t <- auditTables -- conflicts) {
      val bDir = new File(tablePath(branch, t)).toPath
      val rDir = new File(tablePath(reb, t)).toPath
      if (Files.isDirectory(bDir)) {
        val stream = Files.walk(bDir)
        try stream.filter(p => Files.isRegularFile(p)).forEach { p =>
          if (!p.getFileName.toString.endsWith(".tmp")) {
            val to = rDir.resolve(bDir.relativize(p))
            if (!Files.exists(to)) {
              Files.createDirectories(to.getParent)
              try Files.createLink(to, p)
              catch { case _: java.nio.file.FileAlreadyExistsException => () }
            }
          }
        } finally stream.close()
      }
    }
    val newVersions = appended.map { case (t, perVersion) =>
      val bPath = tablePath(branch, t)
      val rPath = tablePath(reb, t)
      perVersion.flatten.foreach { rel =>
        val from = new File(bPath, rel).toPath
        val to = new File(rPath, rel).toPath
        require(!Files.exists(to) ||
            Files.getAttribute(to, "unix:ino") ==
              Files.getAttribute(from, "unix:ino"),
          s"table '$t': audit file $rel collides with a different file " +
            s"on $main — cannot rebase")
        if (!Files.exists(to)) {
          Files.createDirectories(to.getParent)
          try Files.createLink(to, from)
          catch { case _: java.nio.file.FileAlreadyExistsException => () }
        }
      }
      t -> perVersion.map(files =>
        TxnTable.publishFileList(rPath, files, tag = Some("rebase")))
    }
    // one catalog txn on the rebase clone carrying the whole audit
    val rv = tableVersions(reb, Some(rebTxnAtClone))
    val rlists = versionLists(reb, Some(rebTxnAtClone))
    val bv = tableVersions(branch, Some(branchTxn))
    val blists = versionLists(branch, Some(branchTxn))
    val tablesOut = rv ++
      (auditTables -- conflicts).flatMap(t => bv.get(t).map(t -> _)) ++
      newVersions.map { case (t, vs) => t -> vs.max }
    val listsOut = rlists ++
      (auditTables -- conflicts).flatMap(t => blists.get(t).map(t -> _)) ++
      newVersions.map { case (t, vs) =>
        t -> (rlists.getOrElse(t, Seq.empty) ++ vs) }
    val rcmap = colMap(reb, Some(rebTxnAtClone))
    val rdrops = colDrops(reb, Some(rebTxnAtClone))
    val nonConf = auditTables -- conflicts
    publishEntry(reb, rebTxnAtClone + 1, tablesOut, listsOut, tag,
      (rcmap -- nonConf) ++ bcmapB.filter(kv => nonConf(kv._1)),
      (rdrops -- nonConf) ++ bdropB.filter(kv => nonConf(kv._1)))
    publishFrom(reb, main, tag)
  }

  /** The catalog's OCC RETRY loop — [[TxnTable.commitWithRetry]]'s
    * multi-table sibling: on a lost catalog-entry race, re-read the head
    * and re-stage the whole transaction. Each attempt writes fresh table
    * versions; a losing attempt's versions stay catalog-invisible
    * orphans for vacuum, exactly the documented crash shape. */
  def commitAllWithRetry(spark: SparkSession, catalog: String,
                         writes: Seq[Write], maxAttempts: Int = 3,
                         tag: Option[String] = None): Int = {
    require(maxAttempts >= 1, s"maxAttempts must be >= 1, got $maxAttempts")
    var attempt = 0
    while (true) {
      attempt += 1
      try {
        return commitAll(spark, catalog, writes,
          expectedTxn = Some(currentTxn(catalog) + 1), tag = tag)
      } catch {
        case e: java.util.ConcurrentModificationException =>
          if (attempt >= maxAttempts) throw e
      }
    }
    -1 // unreachable
  }

  /** Zero-copy catalog ROLLBACK: a new transaction whose table mapping
    * equals `toTxn`'s — no per-table commits at all, every table snaps
    * back together. The rolled-back transactions stay travelable
    * (history is append-only), and reads through the restore resolve
    * each table's files from the ORIGINAL creating entries, exactly as
    * any other snapshot read. The multi-table sibling of
    * [[TxnTable.restore]]. */
  def restore(catalog: String, toTxn: Int,
              expectedTxn: Option[Int] = None,
              tag: Option[String] = None): Int = {
    val txn = expectedTxn.getOrElse(currentTxn(catalog) + 1)
    require(toTxn >= 1 && toTxn < txn - 1,
      s"cannot restore $catalog to t$toTxn from t${txn - 1} — the target " +
        "must be strictly before the current head")
    publishEntry(catalog, txn, tableVersions(catalog, Some(toTxn)),
      versionLists(catalog, Some(toTxn)), tag, colMap(catalog, Some(toTxn)),
      colDrops(catalog, Some(toTxn)))
  }

  /** Register every table of ONE catalog snapshot as a temp view
    * (`<prefix><name>`) — the SQL façade: `spark.sql` joins across the
    * views see a single consistent transaction, because each view's
    * file list was pinned by the same entry. Returns the snapshot's
    * transaction number. */
  def registerViews(spark: SparkSession, catalog: String,
                    asOf: Option[Int] = None,
                    prefix: String = ""): Int = {
    val txn = entryAt(catalog, asOf).map(txnOf).getOrElse(
      throw new IllegalArgumentException(s"no committed transaction in $catalog"))
    versionLists(catalog, Some(txn)).keys.foreach { n =>
      read(spark, catalog, n, asOf = Some(txn))
        .createOrReplaceTempView(prefix + n)
    }
    txn
  }

  /** Zero-copy LINEAGE CHECKPOINT for one table: an append-heavy table
    * (e.g. the streaming catalog sink at one version per micro-batch)
    * grows its per-entry `versions` list O(txns) — after 10k batches
    * every new catalog entry re-lists 10k versions and reads replay 10k
    * log entries. This publishes ONE metadata-only table version whose
    * log entry re-lists the snapshot's live files
    * ([[TxnTable.publishFileList]] — no data written, no bytes moved)
    * and a catalog entry whose lineage for `name` is just `[that
    * version]`. Every later transaction inherits the truncated lineage;
    * older entries still travel (their lineages are untouched); vacuum
    * keeps every file any entry references, exactly as before. The
    * overwrite-truncation idea extended to append-only tables. */
  def compactLineage(spark: SparkSession, catalog: String, name: String,
                     expectedTxn: Option[Int] = None,
                     tag: Option[String] = None): Int = {
    checkName(name)
    val txn = expectedTxn.getOrElse(currentTxn(catalog) + 1)
    require(txn >= 2,
      s"no committed transaction in $catalog to compact from")
    val base = tableVersions(catalog, Some(txn - 1))
    val baseLists = versionLists(catalog, Some(txn - 1))
    val lineage = baseLists.getOrElse(name,
      throw new IllegalArgumentException(
        s"table '$name' does not exist in $catalog"))
    val table = tablePath(catalog, name)
    val live = liveForLineage(table, lineage)
    require(live.nonEmpty, s"no live files for '$name' in $catalog")
    // the squash version must come AFTER every lineage version (readers
    // replay in version order); a racing table writer loses on the
    // put-if-absent publish exactly like any commit
    val v = TxnTable.publishFileList(table, live, tag)
    publishEntry(catalog, txn, base + (name -> v),
      baseLists + (name -> Seq(v)), tag, colMap(catalog, Some(txn - 1)),
      colDrops(catalog, Some(txn - 1)))
  }

  /** Catalog-level MERGE-ON-READ DELETE: one metadata-light transaction
    * whose only table change is a deletion-vector version — the predicate
    * addresses the CATALOG-visible snapshot (lineage-pinned; a plain
    * `TxnTable.deleteWhereMor` would address the table-local live set,
    * which may include orphans from failed transactions). The vector
    * version appends to the lineage; reads anti-join it exactly as
    * TxnTable does; no data file moves. No-op (no entry published,
    * current txn returned) when nothing matches. Returns
    * (txn, rows marked). */
  def deleteWhereMor(spark: SparkSession, catalog: String, name: String,
                     predicate: org.apache.spark.sql.Column,
                     expectedTxn: Option[Int] = None,
                     tag: Option[String] = None): (Int, Long) = {
    checkName(name)
    val txn = expectedTxn.getOrElse(currentTxn(catalog) + 1)
    require(txn >= 2, s"no committed transaction in $catalog to delete from")
    val base = tableVersions(catalog, Some(txn - 1))
    val baseLists = versionLists(catalog, Some(txn - 1))
    val lineage = baseLists.getOrElse(name,
      throw new IllegalArgumentException(
        s"table '$name' does not exist in $catalog"))
    val table = tablePath(catalog, name)
    import org.apache.spark.sql.functions.col
    val cmap = colMap(catalog, Some(txn - 1))
    val dmap = colDrops(catalog, Some(txn - 1))
    val addressed = TxnTable
      .fileListWithAddress(spark, table, liveForLineage(table, lineage))
      .drop(dmap.getOrElse(name, Set.empty).toSeq: _*)
    // the predicate speaks LOGICAL names; addresses are name-agnostic
    val logical = cmap.getOrElse(name, Map.empty).foldLeft(addressed) {
      case (df, (p, l)) =>
        if (df.columns.contains(p)) df.withColumnRenamed(p, l) else df
    }
    val doomed = logical
      .filter(predicate)
      .select(col("__fp").as("file_path"), col("__ri").as("row_index"))
    val (v, n) = TxnTable.commitDv(spark, table, doomed,
      TxnTable.currentVersion(table) + 1, tag)
    if (n == 0L) return (currentTxn(catalog), 0L)
    (publishEntry(catalog, txn, base + (name -> v),
      baseLists + (name -> (lineage :+ v)), tag, cmap, dmap), n)
  }

  /** RENAME COLUMN without rewriting a byte — Delta column-mapping in
    * its minimal honest form: physical parquet column names NEVER
    * change; one catalog entry updates the table's physical→logical
    * map, [[read]] renames at scan time, [[commitAll]] reverse-maps
    * incoming logical frames back to the physical schema, and
    * predicate-taking operations ([[deleteWhereMor]], [[forgetWhere]])
    * resolve logical names before filtering. Time travel and restore
    * resolve names from their own entry, so pre-rename snapshots read
    * under the old name. Zero table commits — a pure metadata
    * transaction. */
  def renameColumn(spark: SparkSession, catalog: String, name: String,
                   from: String, to: String,
                   expectedTxn: Option[Int] = None,
                   tag: Option[String] = None): Int = {
    checkName(name)
    require(to.matches("[A-Za-z0-9_]+"),
      s"logical column name must be [A-Za-z0-9_]+: '$to'")
    val txn = expectedTxn.getOrElse(currentTxn(catalog) + 1)
    require(txn >= 2, s"no committed transaction in $catalog to rename in")
    val base = tableVersions(catalog, Some(txn - 1))
    val baseLists = versionLists(catalog, Some(txn - 1))
    require(baseLists.contains(name),
      s"table '$name' does not exist in $catalog")
    val cmap = colMap(catalog, Some(txn - 1))
    val tmap = cmap.getOrElse(name, Map.empty)
    val snapshot = read(spark, catalog, name, asOf = Some(txn - 1))
    require(snapshot.columns.contains(from),
      s"column '$from' does not exist in '$name' " +
        s"(has: ${snapshot.columns.mkString(", ")})")
    require(!snapshot.columns.contains(to),
      s"column '$to' already exists in '$name'")
    // `from` is the current LOGICAL name: find its physical carrier
    // (identity when never renamed)
    val phys = tmap.collectFirst { case (p, l) if l == from => p }
      .getOrElse(from)
    val newTmap =
      if (phys == to) tmap - phys // renamed back to the physical name
      else tmap + (phys -> to)
    val dmap = colDrops(catalog, Some(txn - 1))
    require(!dmap.getOrElse(name, Set.empty).contains(to),
      s"'$to' is a DROPPED physical column of '$name' — reads would hide " +
        "the renamed column; pick another name")
    publishEntry(catalog, txn, base, baseLists, tag,
      cmap + (name -> newTmap), dmap)
  }

  /** DROP COLUMN without rewriting a byte — the third leg of zero-
    * rewrite schema evolution (add = mergeSchema, rename = [[renameColumn]]):
    * one metadata entry marks the PHYSICAL column dropped; reads hide
    * it, [[commitAll]] refuses a frame that would silently re-add it,
    * and older snapshots (time travel, restore) still show it. The
    * bytes stay until the files themselves are rewritten (optimize) or
    * vacuumed with their snapshots. */
  def dropColumn(spark: SparkSession, catalog: String, name: String,
                 colName: String,
                 expectedTxn: Option[Int] = None,
                 tag: Option[String] = None): Int = {
    checkName(name)
    val txn = expectedTxn.getOrElse(currentTxn(catalog) + 1)
    require(txn >= 2, s"no committed transaction in $catalog to drop from")
    val base = tableVersions(catalog, Some(txn - 1))
    val baseLists = versionLists(catalog, Some(txn - 1))
    require(baseLists.contains(name),
      s"table '$name' does not exist in $catalog")
    val snapshot = read(spark, catalog, name, asOf = Some(txn - 1))
    require(snapshot.columns.contains(colName),
      s"column '$colName' does not exist in '$name' " +
        s"(has: ${snapshot.columns.mkString(", ")})")
    require(snapshot.columns.length > 1,
      s"cannot drop the last visible column of '$name'")
    val cmap = colMap(catalog, Some(txn - 1))
    val tmap = cmap.getOrElse(name, Map.empty)
    val dmap = colDrops(catalog, Some(txn - 1))
    // resolve logical -> physical; a renamed column drops by its carrier
    val phys = tmap.collectFirst { case (p, l) if l == colName => p }
      .getOrElse(colName)
    publishEntry(catalog, txn, base, baseLists, tag,
      cmap + (name -> (tmap - phys)),
      dmap + (name -> (dmap.getOrElse(name, Set.empty) + phys)))
  }

  private def catReplicaFile(dst: String) = new File(dst, "_graft_replica.json")

  /** CATALOG-LEVEL replication — the multi-table DR story: mirror `src`
    * into `dst` with O(Δ txns) per sync and the consistency guarantee a
    * warehouse actually needs, CROSS-TABLE SNAPSHOT ATOMICITY. For each
    * unsynced catalog transaction: every per-table log entry in its
    * version lineage copies first (atomic tmp+move; equality-verified
    * if the slot is somehow occupied — a foreign entry is a fork and
    * refuses), then that version's data files (skip-if-present,
    * skip-if-src-vacuumed: the mirror reflects the source's retention),
    * then — LAST — the catalog txn entry via the same put-if-absent
    * link(2) every commit here uses. A replica reader therefore sees
    * whole transactions or nothing, even mid-sync, even mid-crash; a
    * crashed sync resumes idempotently from the marker's watermark.
    *
    * Unlike [[TxnTable.replicate]] there is NO seed collapse: catalog
    * entries pin per-table version LINEAGES by NUMBER, so the per-table
    * logs must replay with their original numbering — the mirror is
    * full-fidelity (catalog restore, time travel, and per-table as-of
    * reads all work at the replica). Constraints files travel per sync.
    * Returns (replica head txn, files copied). */
  def replicate(src: String, dst: String): (Int, Int) = {
    val head = currentTxn(src)
    require(head >= 1, s"nothing to replicate: $src has no txns")
    val srcAbs = new File(src).getAbsolutePath
    val copied = new java.util.concurrent.atomic.AtomicInteger(0)
    def atomicCopy(from: File, to: File): Unit = {
      to.getParentFile.mkdirs()
      val tmp = new File(to.getParentFile,
        s".${to.getName}-${java.util.UUID.randomUUID.toString.take(8)}.tmp")
      Files.copy(from.toPath, tmp.toPath)
      Files.move(tmp.toPath, to.toPath,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
      copied.incrementAndGet()
    }
    def copyData(rel: String): Unit = {
      val from = new File(src, rel)
      // missing at src = vacuumed there; the mirror reflects retention
      if (from.isFile && !new File(dst, rel).isFile)
        atomicCopy(from, new File(dst, rel))
    }
    def copyVerified(rel: String): Unit = {
      val from = new File(src, rel)
      val to = new File(dst, rel)
      if (!to.isFile) atomicCopy(from, to)
      else require(java.util.Arrays.equals(Files.readAllBytes(from.toPath),
        Files.readAllBytes(to.toPath)),
        s"replica fork: $dst/$rel differs from the source's entry")
    }
    require(!catPromotedFile(dst).isFile,
      s"$dst was promoted to primary — the old source can no longer sync into it; " +
        "demote it under the new primary instead")
    val marker = catReplicaFile(dst)
    val synced =
      if (marker.isFile) {
        val m = new String(Files.readAllBytes(marker.toPath),
          StandardCharsets.UTF_8)
        val rec = "\"src\":\"([^\"]+)\"".r.findFirstMatchIn(m)
          .map(_.group(1)).getOrElse("")
        require(rec == srcAbs,
          s"$dst replicates $rec, refusing to sync from $srcAbs")
        val sy = "\"syncedTxn\":(\\d+)".r.findFirstMatchIn(m)
          .map(_.group(1).toInt)
          .getOrElse(throw new IllegalStateException(
            s"malformed catalog replica marker in $dst"))
        // a replica forked AHEAD of the source (local txns past the
        // source's head) would otherwise report a clean no-op sync; a
        // legitimate crash-resume is at most one entry past the marker
        // and never past the source's head
        require(currentTxn(dst) <= head,
          s"$dst has local transactions past the source's head t$head — " +
            "a forked replica, refusing to sync")
        sy
      } else {
        require(currentTxn(dst) == 0,
          s"replica target $dst already exists and is not a replica of $srcAbs")
        new File(dst).mkdirs()
        0
      }
    def writeMarker(t: Int): Unit = {
      // promotion race (see TxnTable.replicate's writeMarker): a
      // concurrent promoteReplica moved the marker aside — writing here
      // would resurrect it on a now-primary catalog. The promotion wins.
      require(!catPromotedFile(dst).isFile,
        s"$dst was promoted to primary mid-sync — the promotion wins; " +
          "aborting without resurrecting the replica marker")
      val tmp = new File(dst,
        s"._graft_replica-${java.util.UUID.randomUUID.toString.take(8)}.tmp")
      Files.write(tmp.toPath,
        s"""{"src":"$srcAbs","syncedTxn":$t}"""
          .getBytes(StandardCharsets.UTF_8))
      Files.move(tmp.toPath, marker.toPath,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    }
    if (!marker.isFile) writeMarker(0)
    // entries carry CUMULATIVE lineages; syncing copies only each
    // entry's DELTA against its predecessor — O(new versions) per txn,
    // not O(history) (a restore's re-listed old versions are in the
    // prior lineage and skip here)
    var prevLin: Map[String, Seq[Int]] =
      if (synced == 0) Map.empty else versionLists(src, Some(synced))
    ((synced + 1) to head).foreach { t =>
      val entry = new File(txnDir(src), f"t$t%05d.json")
      require(entry.isFile, s"replication gap: $src has no txn entry t$t")
      val lin = versionLists(src, Some(t))
      // the txn's DATA files are the bulk and are order-free among
      // themselves — gather them across every table/version in the
      // lineage delta and fan the copies out; the tiny fork-checked log
      // entries copy serially first, and the catalog entry below (the
      // cross-table commit point) waits for the whole batch
      val dataRels = Seq.newBuilder[String]
      lin.toSeq.sortBy(_._1).foreach { case (name, vs) =>
        val srcTable = tablePath(src, name)
        val known = prevLin.getOrElse(name, Seq.empty).toSet
        vs.filterNot(known.contains).foreach { v =>
          val logRel = f"_graft_log/v$v%05d.json"
          val srcLog = new File(srcTable, logRel)
          require(srcLog.isFile,
            s"replication gap: $src table $name has no log entry v$v")
          copyVerified(s"tables/$name/$logRel")
          val stats = f"_graft_log/stats_v$v%05d.json"
          if (new File(srcTable, stats).isFile)
            dataRels += s"tables/$name/$stats"
          TxnTable.parseEntry(srcLog)._1
            .foreach(f => dataRels += s"tables/$name/$f")
        }
      }
      // a bulk-sized txn distributes its data copies as a Spark job
      // (executor NICs, not the driver's); the missing-source policy is
      // always skip here — the mirror reflects the source's retention
      val rels = dataRels.result()
      ParallelCopy.distributedFor(rels.size) match {
        case Some(sess) =>
          copied.addAndGet(ParallelCopy.copyDistributed(sess, rels.map(rel =>
            ParallelCopy.CopyTask(new File(src, rel).getPath,
              new File(dst, rel).getPath, ParallelCopy.SkipMissing)).toSeq).toInt)
        case None => ParallelCopy.foreachPar(rels)(copyData)
      }
      prevLin = lin
      // the catalog entry LAST — the cross-table commit point: a reader
      // of the replica never sees half a transaction
      val tmpE = new File(txnDir(dst),
        f".t$t%05d-${java.util.UUID.randomUUID.toString.take(8)}.json.tmp")
      txnDir(dst).mkdirs()
      Files.copy(entry.toPath, tmpE.toPath)
      val target = new File(txnDir(dst), f"t$t%05d.json").toPath
      try {
        Files.createLink(target, tmpE.toPath)
        Files.deleteIfExists(tmpE.toPath)
      } catch {
        case _: java.nio.file.FileAlreadyExistsException =>
          Files.deleteIfExists(tmpE.toPath)
          require(java.util.Arrays.equals(
            Files.readAllBytes(entry.toPath), Files.readAllBytes(target)),
            s"replica fork: $dst txn t$t was published by a local writer")
      }
      replicateMidSyncHook(t)
      writeMarker(t)
    }
    // constraints travel UNCONDITIONALLY and ATOMICALLY, once per table
    // per sync (not per txn — a backlog sync would re-copy them per
    // entry), data-less syncs included: a declaration moved between
    // transactions must never leave the replica auditing a stale set
    versionLists(src, Some(head)).keys.toSeq.sorted.foreach { name =>
      val cons = new File(tablePath(src, name), "_graft_constraints.json")
      if (cons.isFile) {
        val to = new File(tablePath(dst, name), "_graft_constraints.json")
        to.getParentFile.mkdirs()
        val tmp = new File(to.getParentFile,
          s"._graft_constraints-${java.util.UUID.randomUUID.toString.take(8)}.tmp")
        Files.copy(cons.toPath, tmp.toPath)
        Files.move(tmp.toPath, to.toPath,
          java.nio.file.StandardCopyOption.ATOMIC_MOVE,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      }
    }
    (currentTxn(dst), copied.get)
  }

  private def catPromotedFile(t: String) = new File(t, "_graft_promoted.json")

  /** Spec-only interleaving point, the catalog sibling of
    * [[TxnTable.replicateMidSyncHook]]: invoked between a synced txn's
    * entry publish and its marker write. A no-op in production. */
  private[graft] var replicateMidSyncHook: Int => Unit = _ => ()

  /** FAILOVER, step 1 — PROMOTE a catalog replica to a writable
    * primary: the replica marker moves aside to `_graft_promoted.json`
    * (preserving the lineage [[demoteToReplica]] checks), local commits
    * become legitimate, and the old source can no longer sync in (its
    * next [[replicate]] refuses on the missing marker). Returns the
    * promoted head txn. */
  def promoteReplica(dst: String): Int = {
    val marker = catReplicaFile(dst)
    require(marker.isFile, s"$dst is not a catalog replica — nothing to promote")
    require(currentTxn(dst) >= 1,
      s"$dst has no replicated transactions — sync before promoting")
    Files.move(marker.toPath, catPromotedFile(dst).toPath,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    currentTxn(dst)
  }

  /** FAILOVER, step 2 — DEMOTE the old source catalog under its
    * promoted replica, reversing the sync direction: afterwards
    * `replicate(newPrimary, oldSrc)` ships every txn the new primary
    * committed since promotion. Catalog replication is full-fidelity
    * (shared txn numbering), so the adopted marker is exactly the
    * promoted marker with the roles swapped — no version arithmetic.
    *
    * FORK CHECK, refused loudly: the old source's head must equal the
    * last txn the promoted replica ever synced; anything past it is a
    * commit the new primary never saw (the outage's data-loss window) —
    * export it manually before demoting. */
  def demoteToReplica(oldSrc: String, newPrimary: String): Unit = {
    val pm = catPromotedFile(newPrimary)
    require(pm.isFile,
      s"$newPrimary was never promoted from a catalog replica — cannot demote $oldSrc under it")
    val m = new String(Files.readAllBytes(pm.toPath), StandardCharsets.UTF_8)
    val rec = "\"src\":\"([^\"]+)\"".r.findFirstMatchIn(m)
      .map(_.group(1)).getOrElse("")
    val oldAbs = new File(oldSrc).getAbsolutePath
    require(rec == oldAbs,
      s"$newPrimary was promoted from a replica of $rec, not of $oldAbs")
    require(!catReplicaFile(oldSrc).isFile,
      s"$oldSrc is already a catalog replica — demoting it again is a state error")
    val synced = "\"syncedTxn\":(\\d+)".r.findFirstMatchIn(m)
      .map(_.group(1).toInt).getOrElse(throw new IllegalStateException(
        s"malformed promoted marker in $newPrimary: missing syncedTxn"))
    val head = currentTxn(oldSrc)
    require(head >= synced,
      s"$oldSrc is at t$head but the promoted replica synced t$synced — " +
        "it lost synced history; re-seed a fresh replica instead")
    // tolerate the sync's publish→marker crash window: a txn past the
    // marker counts as synced iff the new primary's slot holds the
    // byte-identical entry; anything else is a commit the new primary
    // never saw and refuses loudly
    ((synced + 1) to head).foreach { t =>
      val se = new File(txnDir(oldSrc), f"t$t%05d.json")
      val de = new File(txnDir(newPrimary), f"t$t%05d.json")
      require(se.isFile && de.isFile && java.util.Arrays.equals(
        Files.readAllBytes(se.toPath), Files.readAllBytes(de.toPath)),
        s"$oldSrc holds transaction t$t the new primary never saw; " +
          "export it before demoting")
    }
    val tmp = new File(oldSrc,
      s"._graft_replica-${java.util.UUID.randomUUID.toString.take(8)}.tmp")
    Files.write(tmp.toPath,
      s"""{"src":"${new File(newPrimary).getAbsolutePath}","syncedTxn":$head}"""
        .getBytes(StandardCharsets.UTF_8))
    Files.move(tmp.toPath, catReplicaFile(oldSrc).toPath,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
  }

  /** Multi-table atomic FORGET — the right-to-be-forgotten transaction:
    * one predicate per table, each staged as a deletion-vector version
    * against the CATALOG-visible snapshot, all made visible through ONE
    * catalog entry. Readers see the subject erased from every table or
    * from none; a crash between the vector commits and the publish
    * leaves catalog-invisible orphans, exactly like [[commitAll]].
    * Tables whose predicate matches nothing stay at their current
    * version inside the same transaction. Returns (txn, rows marked per
    * table); no entry is published when nothing matched anywhere. */
  def forgetWhere(spark: SparkSession, catalog: String,
                  predicates: Map[String, org.apache.spark.sql.Column],
                  expectedTxn: Option[Int] = None,
                  tag: Option[String] = None): (Int, Map[String, Long]) = {
    require(predicates.nonEmpty, "forgetWhere needs at least one table")
    predicates.keys.foreach(checkName)
    val txn = expectedTxn.getOrElse(currentTxn(catalog) + 1)
    require(txn >= 2, s"no committed transaction in $catalog to forget from")
    val base = tableVersions(catalog, Some(txn - 1))
    val baseLists = versionLists(catalog, Some(txn - 1))
    import org.apache.spark.sql.functions.col
    val cmap = colMap(catalog, Some(txn - 1))
    val dmap = colDrops(catalog, Some(txn - 1))
    val staged = predicates.toSeq.sortBy(_._1).map { case (name, pred) =>
      val lineage = baseLists.getOrElse(name,
        throw new IllegalArgumentException(
          s"table '$name' does not exist in $catalog"))
      val table = tablePath(catalog, name)
      val addressed = TxnTable
        .fileListWithAddress(spark, table, liveForLineage(table, lineage))
        .drop(dmap.getOrElse(name, Set.empty).toSeq: _*)
      val logical = cmap.getOrElse(name, Map.empty).foldLeft(addressed) {
        case (df, (p, l)) =>
          if (df.columns.contains(p)) df.withColumnRenamed(p, l) else df
      }
      val doomed = logical
        .filter(pred)
        .select(col("__fp").as("file_path"), col("__ri").as("row_index"))
      val (v, n) = TxnTable.commitDv(spark, table, doomed,
        TxnTable.currentVersion(table) + 1, tag)
      (name, v, n)
    }
    val counts = staged.map { case (name, _, n) => name -> n }.toMap
    if (staged.forall(_._3 == 0L)) return (currentTxn(catalog), counts)
    val touched = staged.filter(_._3 > 0L)
    publishEntry(catalog, txn,
      base ++ touched.map { case (name, v, _) => name -> v },
      baseLists ++ touched.map { case (name, v, _) =>
        name -> (baseLists(name) :+ v)
      }, tag, cmap, dmap)
    (txn, counts)
  }

  /** Replay exactly `lineage`'s log entries, in order — the snapshot
    * those versions compose. */
  private def liveForLineage(table: String, lineage: Seq[Int]): Seq[String] = {
    val wanted = lineage.toSet
    val live = scala.collection.mutable.LinkedHashSet.empty[String]
    TxnTable.logFiles(table)
      .filter(f => wanted.contains(TxnTable.versionOf(f)))
      .foreach { f =>
        val (added, removed) = TxnTable.parseEntry(f)
        live --= removed
        live ++= added
      }
    live.toSeq
  }

  /** Catalog-wide VACUUM: physically delete every table data file that
    * NO catalog entry's lineage references — the bytes crashed and
    * losing transactions stranded (their versions appear in a per-table
    * log but in no published entry). Unlike `TxnTable.vacuum` this
    * keeps EVERY catalog-travelable snapshot intact: any version listed
    * in any entry's lineage keeps all the files its log entry added
    * (even files a later overwrite removed — an older entry still
    * replays them). Returns the deleted file count. */
  def vacuum(catalog: String): Int = {
    val entries = txnFiles(catalog)
    val keepByTable = scala.collection.mutable.Map
      .empty[String, scala.collection.mutable.Set[Int]]
    entries.foreach { f =>
      parseLists(new String(Files.readAllBytes(f.toPath),
        StandardCharsets.UTF_8)).foreach { case (n, vs) =>
        keepByTable.getOrElseUpdate(n,
          scala.collection.mutable.Set.empty) ++= vs
      }
    }
    val tablesDir = new File(catalog, "tables")
    Option(tablesDir.listFiles()).getOrElse(Array.empty)
      .filter(_.isDirectory).map { td =>
        val name = td.getName
        val keepVersions = keepByTable.getOrElse(name, Set.empty[Int])
        val keepFiles: Set[String] = TxnTable.logFiles(td.getPath)
          .filter(f => keepVersions.contains(TxnTable.versionOf(f)))
          .flatMap(f => TxnTable.parseEntry(f)._1).toSet
        val dataRoot = new File(td, "data")
        val doomed = Option(dataRoot.listFiles()).getOrElse(Array.empty)
          .filter(_.isDirectory)
          .flatMap(d => Option(d.listFiles()).getOrElse(Array.empty))
          .filter(f => f.isFile && f.getName.startsWith("part-") &&
            f.getName.endsWith(".parquet") &&
            !keepFiles.contains(s"data/${f.getParentFile.getName}/${f.getName}"))
        // fan the deletes out like the replication copies: order-free,
        // idempotent, and driver-serial would be the 100 TB wall
        ParallelCopy.foreachPar(doomed.toSeq)(f => { f.delete(); () })
        doomed.length
      }.sum
  }

  private def publishEntry(catalog: String, txn: Int,
                           tables: Map[String, Int],
                           versions: Map[String, Seq[Int]],
                           tag: Option[String],
                           colmap: Map[String, Map[String, String]] = Map.empty,
                           drops: Map[String, Set[String]] = Map.empty): Int = {
    val tagField = tag.map { t =>
      require(t.matches("[A-Za-z0-9._-]+"),
        s"tag must be [A-Za-z0-9._-]+: '$t'")
      s""","tag":"$t""""
    }.getOrElse("")
    val colmapField =
      if (colmap.forall(_._2.isEmpty)) ""
      else s""","colmap":${jsonColmap(colmap.filter(_._2.nonEmpty))}"""
    val dropsField =
      if (drops.forall(_._2.isEmpty)) ""
      else s""","coldrop":${jsonDrops(drops.filter(_._2.nonEmpty))}"""
    val entry = s"""{"txn":$txn,"tables":${jsonMap(tables)},""" +
      s""""versions":${jsonLists(versions)}$colmapField$dropsField$tagField}"""
    txnDir(catalog).mkdirs()
    val tmpF = new File(txnDir(catalog),
      f".t$txn%05d-" + java.util.UUID.randomUUID.toString.take(8) + ".json.tmp")
    Files.write(tmpF.toPath, entry.getBytes(StandardCharsets.UTF_8))
    val target = new File(txnDir(catalog), f"t$txn%05d.json").toPath
    try {
      Files.createLink(target, tmpF.toPath)
      Files.deleteIfExists(tmpF.toPath)
    } catch {
      case e: java.nio.file.FileAlreadyExistsException =>
        Files.deleteIfExists(tmpF.toPath)
        throw new java.util.ConcurrentModificationException(
          s"catalog txn $txn of $catalog was published by another writer " +
            "(this writer's staged table versions stay orphaned)", e)
    }
    txn
  }

  /** Read `name` as of catalog transaction `asOf` (latest when None).
    *
    * NOT `TxnTable.read(asOf = pinnedVersion)`: the per-table log may
    * hold versions no committed entry references (failed/racing
    * transactions) or versions a [[restore]] rolled off the current
    * branch — a plain head-pinned replay would resurrect either.
    * Replay here walks EXACTLY the entry's own version lineage, in
    * order: the entry IS the snapshot. */
  def read(spark: SparkSession, catalog: String, name: String,
           asOf: Option[Int] = None): DataFrame = {
    checkName(name)
    require(entryAt(catalog, asOf).nonEmpty,
      s"no committed transaction in $catalog${asOf.fold("")(t => s" as of t$t")}")
    val lineage = versionLists(catalog, asOf).getOrElse(name,
      throw new IllegalArgumentException(
        s"table '$name' does not exist in $catalog" +
          asOf.fold("")(t => s" as of t$t")))
    val table = tablePath(catalog, name)
    val live = liveForLineage(table, lineage)
    require(live.nonEmpty,
      s"no live files for '$name' in $catalog${asOf.fold("")(t => s" as of t$t")}")
    // deletion vectors in the lineage apply exactly as in TxnTable.read;
    // dropped physical columns vanish (mergeSchema reconciles pre/post-
    // drop files deterministically), then the column map renames
    val dropped = colDrops(catalog, asOf).getOrElse(name, Set.empty)
    val base = TxnTable
      .readFileList(spark, table, live, mergeSchema = dropped.nonEmpty)
      .drop(dropped.toSeq: _*)
    colMap(catalog, asOf).getOrElse(name, Map.empty)
      .foldLeft(base) {
        case (df, (p, l)) =>
          if (df.columns.contains(p)) df.withColumnRenamed(p, l) else df
      }
  }
}
