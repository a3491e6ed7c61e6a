package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, desc}

/** The self-driving warehouse's FRONT DOOR: one call over an observed
  * workload, one ranked action plan — unifying the advisor family this
  * engine grew piecewise ([[MvAdvisor]] flat + star, [[LayoutAdvisor]]
  * predicates + small files) with repeated-plan detection from the
  * result cache's key ([[ResultCache.keyOf]]). The reference has a
  * human in this seat (its pipeline re-runs the same pandas rollups and
  * reloads whole tables every run, `pipeline.py`); at 100 TB the seat
  * must be held by measurements, because no operator can eyeball a
  * thousand-query workload's scan stats.
  *
  * Output: one row per proposed action, normalized to
  * (family, target, action, detail, weight, recommend) —
  *   - `result_cache`: a plan whose cache key occurred ≥2 times —
  *     identical query over identical snapshot pins; serving it from
  *     the result cache is pure win (target = the pinned tables).
  *   - `view` / `star_view`: the MV advisor's merged single-base /
  *     star-join summary recommendations (detail = keys|measures —
  *     feed them straight to `Mv.register`/`registerStar`).
  *   - `layout`: per (base, column) data-placement moves — partition /
  *     zorder / bloom / bucket, decided from predicate shape × measured
  *     NDV (detail carries the evidence).
  *   - `compaction`: rows-per-file health of the supplied data dirs.
  * `weight` is the size of the evidence (queries served, predicate
  * uses, file count); `recommend` is each family's own admission rule.
  * Everything is deterministic — decisions derive from plans and data,
  * never from wall clocks — so the full report is oracle-checkable.
  *
  * Scale shape: the report itself is metadata plus one stats aggregate
  * per touched base (NDV / distinct-key pricing, inherited from the
  * underlying advisors) — it never materializes a candidate.
  */
object WorkloadAdvisor {

  def report(spark: SparkSession, queries: Seq[DataFrame],
             dataDirs: Seq[String] = Nil,
             targetRowsPerFile: Long = 8192L,
             maxRowsFraction: Double = 0.5,
             maxPartitions: Long = 1024L,
             exactNdv: Boolean = false): DataFrame = {
    import spark.implicits._
    val keyed = queries.flatMap(q => ResultCache.keyAndPins(q))
    val rc = keyed.groupBy(_._1).filter(_._2.size >= 2).toSeq
      .sortBy(_._1)
      .map { case (_, hits) =>
        val tables = hits.head._2
          .map(p => new java.io.File(p._1).getName).distinct.sorted
        ("result_cache", tables.mkString(","), "cache", "repeated_plan",
          hits.size.toLong, true)
      }
    val mv = MvAdvisor.recommend(spark, queries, maxRowsFraction)
      .collect().toSeq
      .map(r => ("view", r.getAs[String]("base"), "materialize",
        r.getAs[String]("view_keys") + "|" + r.getAs[String]("view_measures"),
        r.getAs[Long]("n_queries"), r.getAs[Boolean]("recommend")))
    val stars = MvAdvisor.recommendStars(spark, queries, maxRowsFraction)
      .collect().toSeq
      .map(r => ("star_view", r.getAs[String]("fact"), "materialize_star",
        r.getAs[String]("star") + "|" + r.getAs[String]("view_keys") + "|" +
          r.getAs[String]("view_measures"),
        r.getAs[Long]("n_queries"), r.getAs[Boolean]("recommend")))
    val lay = LayoutAdvisor.recommend(spark, queries, maxPartitions,
        exactNdv = exactNdv)
      .collect().toSeq
      .map(r => ("layout",
        r.getAs[String]("base") + "." + r.getAs[String]("col_name"),
        r.getAs[String]("action"),
        s"eq=${r.getAs[Long]("n_eq")},range=${r.getAs[Long]("n_range")}," +
          s"join=${r.getAs[Long]("n_join")},ndv=${r.getAs[Long]("ndv")}",
        r.getAs[Long]("n_eq") + r.getAs[Long]("n_range") +
          r.getAs[Long]("n_join"),
        true))
    val comp = dataDirs.sorted.map { p =>
      val a = LayoutAdvisor.compactionAdvice(spark, p, targetRowsPerFile)
        .head()
      ("compaction", new java.io.File(p).getName, "compact",
        s"files=${a.getAs[Long]("n_files")}," +
          s"avg_rows=${a.getAs[Long]("avg_rows_per_file")}",
        a.getAs[Long]("n_files"),
        a.getAs[Boolean]("recommend_compact"))
    }
    (rc ++ mv ++ stars ++ lay ++ comp)
      .toDF("family", "target", "action", "detail", "weight", "recommend")
      .orderBy(desc("recommend"), col("family"), col("target"),
        col("action"), col("detail"))
  }
}
