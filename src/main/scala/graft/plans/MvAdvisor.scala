package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, LogicalPlan, Project}
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{IntegerType, LongType}

/** WORKLOAD-DRIVEN summary advisor: given the queries a deployment
  * actually runs, recommend the materialized views worth building —
  * the classic warehouse sizing exercise, done from the query PLANS so
  * the recommendations are exactly the shapes [[MvRewrite]] accepts
  * (keys ⊇ every grouping and filter column, measures integral, one
  * view per base serving its whole key-subset lattice).
  *
  * Per query, [[candidate]] extracts (base scan, key set, measure set):
  *  - keys = the grouping columns (bare attributes only) ∪ every
  *    column a deterministic WHERE references (the rewrite requires
  *    filter columns among the view keys);
  *  - measures = children of SUM/MIN/MAX/AVG and of COUNT over
  *    integral columns ([[Mv.build]] refuses non-integral measures —
  *    integer sums compose losslessly, doubles would re-associate);
  *    COUNT(*) needs no measure (`cnt` is always built); DISTINCT
  *    aggregates and COUNT over non-integral columns route their
  *    column into the KEYS instead (the rewrite answers those from the
  *    grain, not from sums);
  *  - a query declines (None) when any shape falls outside what the
  *    rewrite could ever serve: grouping by an expression, a
  *    non-deterministic filter, MIN/MAX/AVG over a non-integral
  *    column, an exotic aggregate, or an aggregate over a join (the
  *    star advisor is the natural extension).
  *
  * [[recommend]] then merges candidates per base — the KEY-SUBSET
  * rewrite makes the union view serve every contributing query — and
  * prices each recommendation with its exact summary cardinality
  * (`SELECT COUNT(*) FROM (SELECT DISTINCT keys…)`, computed on the
  * engine): a summary near base size caches nothing, so `recommend`
  * is flagged only when est_rows ≤ maxRowsFraction · base_rows. At
  * 100 TB this ratio IS the decision — a 10⁴× reduction turns every
  * matching dashboard query into a few thousand summary rows.
  */
object MvAdvisor {

  final case class Candidate(base: String, keys: Seq[String],
                             measures: Seq[String], basePath: String)

  private def strip(p: LogicalPlan, fs: Seq[Expression])
      : Option[(LogicalRelation, Seq[Expression])] = p match {
    case lr: LogicalRelation => Some((lr, fs))
    case Project(pl, c) if pl.forall(_.isInstanceOf[AttributeReference]) =>
      strip(c, fs)
    case Filter(cond, c) => strip(c, fs :+ cond)
    case _ => None
  }

  /** True when `p` sits inside a [[graft.sources.TxnTable]] (some
    * ancestor dir holds `_graft_log`): such a scan is one SNAPSHOT's
    * file list — when that list happens to be a single file it must
    * not masquerade as a stable standalone base (the snapshot moves on
    * the next commit); txn workloads go through the txn-aware paths. */
  private[plans] def underTxnTable(p: org.apache.hadoop.fs.Path): Boolean =
    graft.sources.TxnTable
      .tableRootOf(new java.io.File(p.toUri.getPath).getParentFile)
      .isDefined

  /** (last path segment, full root path) of a single-root PARQUET scan
    * — the advisor re-reads the base to price the summary, so only
    * re-readable scans qualify; txn-snapshot file lists decline (see
    * [[underTxnTable]]) and are served by [[recommendTxn]]. */
  private def baseOf(lr: LogicalRelation): Option[(String, String)] =
    lr.relation match {
      case fs: HadoopFsRelation
          if fs.location.rootPaths.size == 1 &&
            fs.fileFormat.isInstanceOf[
              org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat] =>
        fs.location.rootPaths.headOption
          .filterNot(underTxnTable)
          .map(p => (p.getName, p.toString))
      case _ => None
    }

  /** The key/measure classification shared by the flat and star forms:
    * (sorted distinct keys, sorted distinct measures) of the aggregate,
    * or None when no summary could serve it. */
  private def classifyAgg(a: Aggregate, filters: Seq[Expression])
      : Option[(Seq[String], Seq[String])] = {
    val integral = Set[org.apache.spark.sql.types.DataType](IntegerType, LongType)
    val groupKeys = a.groupingExpressions.map {
      case ar: AttributeReference => Some(ar.name)
      case _ => None
    }
    if (groupKeys.exists(_.isEmpty) || !filters.forall(_.deterministic)) None
    else {
      val filterKeys = filters.flatMap(_.references.map(_.name))
      // (key additions, measure additions) per aggregate call
      val classified: Seq[Option[(Seq[String], Seq[String])]] =
        a.aggregateExpressions
          .flatMap(_.collect { case ae: AggregateExpression => ae })
          .map { ae =>
            def attr(e: Expression): Option[AttributeReference] =
              e match { case ar: AttributeReference => Some(ar); case _ => None }
            ae.aggregateFunction match {
              case _ if ae.isDistinct =>
                // DISTINCT answers from the view GRAIN → keys
                val as = ae.aggregateFunction.children.map(attr)
                if (as.forall(_.isDefined))
                  Some((as.flatten.map(_.name), Nil))
                else None
              case c: Count if c.children.forall(ch =>
                  ch.isInstanceOf[Literal] &&
                    ch.asInstanceOf[Literal].value != null) =>
                Some((Nil, Nil)) // COUNT(*): cnt is always built
              case c: Count => c.children match {
                case Seq(e) => attr(e).map(ar =>
                  if (integral(ar.dataType)) (Nil, Seq(ar.name))
                  else (Seq(ar.name), Nil))
                case _ => None
              }
              case s: Sum => attr(s.child)
                .filter(ar => integral(ar.dataType))
                .map(ar => (Nil, Seq(ar.name)))
              case m: Min => attr(m.child)
                .filter(ar => integral(ar.dataType))
                .map(ar => (Nil, Seq(ar.name)))
              case m: Max => attr(m.child)
                .filter(ar => integral(ar.dataType))
                .map(ar => (Nil, Seq(ar.name)))
              case av: Average => attr(av.child)
                .filter(ar => integral(ar.dataType))
                .map(ar => (Nil, Seq(ar.name)))
              case _ => None
            }
          }
      if (classified.exists(_.isEmpty)) None
      else {
        val (extraKeys, measures) = classified.flatten.unzip
        Some(((groupKeys.flatten ++ filterKeys ++ extraKeys.flatten)
          .distinct.sorted,
          measures.flatten.distinct.sorted))
      }
    }
  }

  /** The summary shape of one query, or None when no single-base view
    * could serve it (see the object doc for the decline list). */
  def candidate(df: DataFrame): Option[Candidate] =
    for {
      a <- df.queryExecution.analyzed.collectFirst { case x: Aggregate => x }
      (lr, filters) <- strip(a.child, Nil)
      (base, basePath) <- baseOf(lr)
      (keys, measures) <- classifyAgg(a, filters)
    } yield Candidate(base, keys, measures, basePath)

  /** Merge the workload's candidates into ONE recommendation per base
    * (keys/measures union — the key-subset rewrite makes the merged
    * view serve every contributor) and price it exactly. Output one
    * row per base, ordered: (base, view_keys, view_measures,
    * n_queries, est_rows, base_rows, recommend). Queries no view could
    * serve are simply not counted — the advisor proposes, the
    * [[MvRewrite]] gates dispose. */
  def recommend(spark: SparkSession, queries: Seq[DataFrame],
                maxRowsFraction: Double = 0.5,
                exactNdv: Boolean = false,
                rsd: Double = 0.05): DataFrame = {
    val cands = queries.flatMap(candidate)
    val rows = cands.groupBy(_.base).toSeq.sortBy(_._1).map {
      case (base, cs) =>
        val keys = cs.flatMap(_.keys).distinct.sorted
        val measures = cs.flatMap(_.measures).distinct.sorted
        val rel = spark.read.parquet(cs.head.basePath)
        val estRows = estKeyRows(rel, keys, exactNdv, rsd)
        val baseRows = rel.count()
        (base, keys.mkString(","), measures.mkString(","),
          cs.size.toLong, estRows, baseRows,
          admits(estRows, baseRows, maxRowsFraction, exactNdv, rsd))
    }
    import spark.implicits._
    rows.toDF("base", "view_keys", "view_measures", "n_queries",
      "est_rows", "base_rows", "recommend")
  }

  /** Distinct key-combination cardinality of `rel` — the summary's
    * estimated row count. Approximate (HLL++ over the key struct,
    * relative error `rsd`) by default: advisory statistics over a
    * 100 TB base must not cost the expand-shuffle an exact DISTINCT
    * does, and sketch error never changes WHICH shape the workload
    * aggregates, only where the size boundary falls. `exactNdv = true`
    * keeps the exact path — the oracle-gated test configuration. */
  /** The fact-side key remap for a FULLY-DECLARED star, or None when
    * any edge lacks its declarations (then the exact joined probe
    * runs). Every view key owned by a dim is replaced, transitively
    * through snowflake hops, by the edge's parent-side join key until
    * it reaches the fact — sound because a RELY-unique dim key makes
    * every dim attribute a function of it, and the RELY FK makes the
    * inner join fact-preserving (left edges preserve unconditionally).
    * Paths arrive as Hadoop `file:`-prefixed strings; the constraint
    * store keys by plain dirs. */
  private def factSideKeys(c: StarCandidate,
                           keys: Seq[String]): Option[Seq[String]] = {
    import graft.sources.TableConstraints
    def dirOf(path: String): String =
      if (path.startsWith("file:")) path.stripPrefix("file:") else path
    if (c.colOwner.isEmpty || c.edgeParents.isEmpty) return None
    val declared = c.dims.forall { dm =>
      TableConstraints.isUniqueOn(dirOf(dm.path), Set(dm.dimKey)) &&
        (dm.joinType == "left" ||
          c.edgeParents.get(dm.suffix).exists(parent =>
            TableConstraints.fkCovers(dirOf(parent),
              Set(dm.leftKey -> dm.dimKey), dirOf(dm.path))))
    }
    if (!declared) return None
    val bySuffix = c.dims.map(d => d.suffix -> d).toMap
    def remap(k: String): Option[String] = {
      var cur = k
      var guard = c.dims.size + 1
      while (guard > 0) {
        c.colOwner.get(cur) match {
          case Some(s) if s == c.factSuffix => return Some(cur)
          case Some(s) => bySuffix.get(s) match {
            case Some(dm) => cur = dm.leftKey; guard -= 1
            case None => return None
          }
          case None => return None
        }
      }
      None
    }
    val remapped = keys.map(remap)
    if (remapped.exists(_.isEmpty)) None
    else Some(remapped.flatten.distinct)
  }

  private def estKeyRows(rel: DataFrame, keys: Seq[String],
                         exactNdv: Boolean, rsd: Double): Long =
    if (exactNdv) rel.select(keys.map(col): _*).distinct().count()
    else rel.agg(org.apache.spark.sql.functions.approx_count_distinct(
      org.apache.spark.sql.functions.struct(keys.map(col): _*), rsd))
      .head().getLong(0)

  /** The size gate, ERROR-AWARE in approx mode: materializing a view
    * whose true cardinality overshoots the budget wastes the build and
    * the refresh forever after, while declining a borderline fit merely
    * skips a minor win — so the band is one-sided, like
    * [[LayoutAdvisor.recommend]]'s partition boundary. */
  private def admits(estRows: Long, baseRows: Long, maxRowsFraction: Double,
                     exactNdv: Boolean, rsd: Double): Boolean =
    if (exactNdv) estRows <= maxRowsFraction * baseRows
    else estRows * (1 + 2 * rsd) <= maxRowsFraction * baseRows

  /** One dimension of a recommended star, in CHAIN order (leftKey
    * resolves against fact + earlier dims — exactly what
    * [[Mv.buildStar]]/[[Mv.registerStar]] consume). */
  final case class StarDim(suffix: String, path: String, leftKey: String,
                           dimKey: String, joinType: String)

  /** `colOwner` maps every view key and edge column to its owning
    * leaf's suffix; `edgeParents` maps each dim suffix to its PARENT
    * leaf's path in the oriented tree (the fact, or an earlier dim for
    * snowflake hops) — what the declared-FK pricing upgrade consults. */
  final case class StarCandidate(factSuffix: String, factPath: String,
                                 dims: Seq[StarDim], keys: Seq[String],
                                 measures: Seq[String],
                                 colOwner: Map[String, String] = Map.empty,
                                 edgeParents: Map[String, String] = Map.empty)

  /** The STAR summary shape of one join-aggregate query: flatten the
    * equi-join tree ([[MvRewrite.flattenJoin]] — the same matcher the
    * rewrite uses, so a recommendation is by construction a shape it
    * accepts), then ORIENT each edge by rooting the join tree at every
    * fact candidate and probing the would-be dim keys for uniqueness
    * (one cached aggregate per (leaf, key) — the data-driven stand-in
    * for declared constraints; a real catalog would consult them).
    * The fact is the unique root under which every dim key probes
    * unique; LEFT edges additionally pin their dim to the query's
    * null-extended side. Ties (all-unique 1:1 stars) break to the
    * smallest fact suffix for determinism. Declines: non-tree shapes
    * (composite-key edges flatten to two pairs between one leaf pair),
    * ambiguous column ownership, non-parquet leaves, any
    * [[classifyAgg]] decline. */
  def starCandidate(spark: SparkSession, df: DataFrame)
      : Option[StarCandidate] = {
    val uniq = scala.collection.mutable.Map.empty[(String, String), Boolean]
    def uniqueOn(path: String, key: String): Boolean =
      uniq.getOrElseUpdate((path, key), {
        // a declared RELY unique constraint answers from METADATA — at
        // 100 TB the probe below is itself a full shuffle per candidate
        // dim, which is exactly what TableConstraints exists to avoid;
        // absence of a declaration proves nothing, so fall through
        // leaf paths arrive as Hadoop Path strings (`file:/…`), which
        // are NOT percent-encoded — java.net.URI would throw on a space;
        // strip the scheme literally instead
        val dir =
          if (path.startsWith("file:")) path.stripPrefix("file:") else path
        if (graft.sources.TableConstraints.isUniqueOn(dir, Set(key))) true
        else {
          val r = spark.read.parquet(path)
            .agg(org.apache.spark.sql.functions.count(col(key)),
              org.apache.spark.sql.functions.countDistinct(col(key))).head()
          r.getLong(0) == r.getLong(1)
        }
      })
    for {
      a <- df.queryExecution.analyzed.collectFirst { case x: Aggregate => x }
      (leaves, pairs, leftPairs, filters) <- MvRewrite.flattenJoin(a.child)
      if leaves.size >= 2
      bases = leaves.map(baseOf)
      if bases.forall(_.isDefined)
      names = bases.flatten
      if names.map(_._1).distinct.size == names.size
      // column ownership: every edge column must belong to exactly one leaf
      owner = leaves.zipWithIndex.flatMap { case (lr, i) =>
        lr.output.map(_.name -> i) }.groupBy(_._1)
        .map { case (n, os) => n -> os.map(_._2).distinct }
      allPairs = (pairs ++ leftPairs.map(_._1)).toSeq
      if allPairs.size == leaves.size - 1 // a TREE of single-pair edges
      edgesOpt = allPairs.map { p =>
        p.toSeq match {
          case Seq(x, y) =>
            (owner.getOrElse(x, Nil), owner.getOrElse(y, Nil)) match {
              case (Seq(ix), Seq(iy)) if ix != iy =>
                Some((p, ix, x, iy, y))
              case _ => None
            }
          case _ => None
        }
      }
      if edgesOpt.forall(_.isDefined)
      edges = edgesOpt.flatten
      // the query's null-extended leaf index per LEFT pair
      leftDimIdx = leftPairs.toSeq.flatMap { case (p, leaf) =>
        leaves.zipWithIndex.collectFirst {
          case (l, i) if l.eq(leaf) => p -> i } }.toMap
      oriented <- orient(edges, names, leftDimIdx, uniqueOn)
      (keys, measures) <- classifyAgg(a, filters)
    } yield {
      val (factIdx, dims, edgeParents) = oriented
      val edgeCols = dims.flatMap(d => Seq(d.leftKey, d.dimKey))
      val colOwner = (keys ++ edgeCols).distinct.flatMap(cn =>
        owner.get(cn).collect { case Seq(i) => cn -> names(i)._1 }).toMap
      StarCandidate(names(factIdx)._1, names(factIdx)._2, dims,
        keys, measures, colOwner, edgeParents)
    }
  }

  /** Root the join tree at each fact candidate (BFS, dims explored in
    * suffix order for determinism); keep roots under which every edge's
    * child key probes unique and every LEFT edge's child is the query's
    * null-extended leaf; pick the smallest-suffix qualifying fact. */
  private def orient(edges: Seq[(Set[String], Int, String, Int, String)],
                     names: Seq[(String, String)],
                     leftDimIdx: Map[Set[String], Int],
                     uniqueOn: (String, String) => Boolean)
      : Option[(Int, Seq[StarDim], Map[String, String])] = {
    val n = names.size
    val adj = (0 until n).map(i => edges.filter(e => e._2 == i || e._4 == i))
    def tryRoot(f: Int): Option[(Int, Seq[StarDim], Map[String, String])] = {
      val seen = scala.collection.mutable.Set(f)
      val dims = scala.collection.mutable.ArrayBuffer.empty[StarDim]
      val parents = scala.collection.mutable.Map.empty[String, String]
      var frontier = List(f)
      while (frontier.nonEmpty) {
        val next = frontier.flatMap { u =>
          adj(u).flatMap { case (p, ix, x, iy, y) =>
            val (child, childKey, parentKey) =
              if (ix == u && !seen(iy)) (iy, y, x)
              else if (iy == u && !seen(ix)) (ix, x, y)
              else (-1, "", "")
            if (child < 0) None
            else {
              val jt = if (leftDimIdx.contains(p)) "left" else "inner"
              // a LEFT edge's dim must be the null-extended side
              if (jt == "left" && leftDimIdx(p) != child) return None
              if (!uniqueOn(names(child)._2, childKey)) return None
              seen += child
              parents(names(child)._1) = names(u)._2
              Some((names(child)._1,
                StarDim(names(child)._1, names(child)._2, parentKey,
                  childKey, jt), child))
            }
          }
        }.sortBy(_._1)
        dims ++= next.map(_._2)
        frontier = next.map(_._3)
      }
      if (seen.size == n) Some((f, dims.toSeq, parents.toMap)) else None
    }
    (0 until n).sortBy(names(_)._1).iterator
      .map(tryRoot).collectFirst { case Some(r) => r }
  }

  /** [[recommend]] for STAR queries: merge per (fact, oriented dim
    * chain) — key-subset rewrites make the union view serve every
    * contributor — and price with the exact joined-summary cardinality.
    * Output ordered (fact, star): one row per recommended star view,
    * dims rendered `suffix:leftKey=dimKey:joinType` in chain order —
    * feed them straight to [[Mv.buildStar]]/[[Mv.registerStar]]. */
  def recommendStars(spark: SparkSession, queries: Seq[DataFrame],
                     maxRowsFraction: Double = 0.5,
                     exactNdv: Boolean = false,
                     rsd: Double = 0.05): DataFrame = {
    val cands = queries.flatMap(starCandidate(spark, _))
    val rows = cands
      .groupBy(c => (c.factSuffix,
        c.dims.map(d => (d.suffix, d.leftKey, d.dimKey, d.joinType))))
      .toSeq
      .map { case (_, cs) =>
        val c = cs.head
        val keys = cs.flatMap(_.keys).distinct.sorted
        val measures = cs.flatMap(_.measures).distinct.sorted
        val fact = spark.read.parquet(c.factPath)
        // CONSTRAINT-AWARE pricing: a star whose every edge is fully
        // DECLARED (dim key RELY-unique; inner edges also covered by a
        // RELY FK on the edge's parent) is provably non-fanning AND
        // fact-preserving, so each dim attribute is a FUNCTION of its
        // fact-side join key — the summary cardinality is bounded by
        // the NDV of the keys REMAPPED to the fact (transitively
        // through snowflake hops), measured on the FACT SCAN ALONE:
        // the dims are never read, let alone joined. The bound is
        // one-sided the safe way (distinct attrs ≤ distinct keys), so
        // an admitted star truly compresses; an undeclared star keeps
        // the exact joined probe.
        // merged candidates may each own only their OWN keys' columns
        val factOnlyKeys = factSideKeys(
          c.copy(colOwner = cs.flatMap(_.colOwner).toMap), keys)
        val estRows = factOnlyKeys match {
          case Some(fk) => estKeyRows(fact, fk, exactNdv, rsd)
          case None =>
            val joined = c.dims.foldLeft(fact) { (acc, dm) =>
              acc.join(spark.read.parquet(dm.path),
                col(dm.leftKey) === col(dm.dimKey),
                if (dm.joinType == "left") "left" else "inner")
            }
            estKeyRows(joined, keys, exactNdv, rsd)
        }
        val factRows = fact.count()
        val star = c.dims.map(d =>
          s"${d.suffix}:${d.leftKey}=${d.dimKey}:${d.joinType}").mkString(",")
        (c.factSuffix, star, keys.mkString(","), measures.mkString(","),
          cs.size.toLong, estRows, factRows,
          admits(estRows, factRows, maxRowsFraction, exactNdv, rsd))
      }
      .sortBy(r => (r._1, r._2))
    import spark.implicits._
    rows.toDF("fact", "star", "view_keys", "view_measures", "n_queries",
      "est_rows", "fact_rows", "recommend")
  }

  /** A lakehouse workload candidate: the query aggregates a
    * [[graft.sources.TxnTable]] SNAPSHOT (the scan's root-path set is
    * exactly one version's live file set). */
  final case class TxnCandidate(table: String, tablePath: String,
                                version: Int, keys: Seq[String],
                                measures: Seq[String])

  /** (table name, table root, pinned version) when the scan reads
    * EXACTLY a TxnTable snapshot's live file set: ascend from the first
    * scanned file to the directory holding `_graft_log`, then require
    * set equality with that table's CURRENT live files — a scan of an
    * older snapshot (the table committed since the workload was
    * captured) declines rather than recommending a view the head would
    * immediately invalidate. DV-bearing snapshots read through an
    * anti-join, never a bare scan, so they decline upstream in
    * [[strip]]. */
  private def txnBaseOf(lr: LogicalRelation): Option[(String, String, Int)] =
    lr.relation match {
      case fs: HadoopFsRelation
          if fs.location.rootPaths.nonEmpty &&
            fs.fileFormat.isInstanceOf[
              org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat] =>
        import graft.sources.TxnTable
        val roots = fs.location.rootPaths
          .map(p => new java.io.File(p.toUri.getPath))
        TxnTable.tableRootOf(roots.head.getParentFile).flatMap { t =>
          val v = TxnTable.currentVersion(t.getPath)
          val live = TxnTable.liveFiles(t.getPath, Some(v))
            .map(rel => new java.io.File(t, rel).getCanonicalPath).toSet
          if (roots.map(_.getCanonicalPath).toSet == live)
            Some((t.getName, t.getPath, v))
          else None
        }
      case _ => None
    }

  /** The summary shape of one LAKEHOUSE query, version-pinned. */
  def txnCandidate(df: DataFrame): Option[TxnCandidate] =
    for {
      a <- df.queryExecution.analyzed.collectFirst { case x: Aggregate => x }
      (lr, filters) <- strip(a.child, Nil)
      (table, path, v) <- txnBaseOf(lr)
      (keys, measures) <- classifyAgg(a, filters)
    } yield TxnCandidate(table, path, v, keys, measures)

  /** [[recommend]] for TXN-TABLE workloads: merge per (table, version),
    * price against the PINNED snapshot, and emit rows that feed
    * straight into [[Mv.registerTxn]] — whose structural staleness
    * (file-set match) plus [[Mv.refreshTxn]] O(Δ) maintenance complete
    * the self-driving loop: observe workload → recommend → build →
    * serve → commit invalidates → refresh re-serves. Output: (table,
    * version, view_keys, view_measures, n_queries, est_rows,
    * base_rows, recommend), ordered. */
  def recommendTxn(spark: SparkSession, queries: Seq[DataFrame],
                   maxRowsFraction: Double = 0.5,
                   exactNdv: Boolean = false,
                   rsd: Double = 0.05): DataFrame = {
    import graft.sources.TxnTable
    val cands = queries.flatMap(txnCandidate)
    val rows = cands.groupBy(c => (c.tablePath, c.version)).toSeq
      .map { case ((path, v), cs) =>
        val keys = cs.flatMap(_.keys).distinct.sorted
        val measures = cs.flatMap(_.measures).distinct.sorted
        val rel = TxnTable.read(spark, path, asOf = Some(v))
        val estRows = estKeyRows(rel, keys, exactNdv, rsd)
        // base rows come off the snapshot's parquet footers — metadata,
        // not a scan; the pinned file set makes the count exact
        val baseRows = TxnTable.snapshotRowCount(path, asOf = Some(v))
        (cs.head.table, v.toLong, keys.mkString(","),
          measures.mkString(","), cs.size.toLong, estRows, baseRows,
          admits(estRows, baseRows, maxRowsFraction, exactNdv, rsd))
      }
      .sortBy(r => (r._1, r._2))
    import spark.implicits._
    rows.toDF("table", "version", "view_keys", "view_measures",
      "n_queries", "est_rows", "base_rows", "recommend")
  }
}
