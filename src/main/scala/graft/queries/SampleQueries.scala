package graft.queries

import graft.{QueryDef, Tables}
import graft.QueryDef.sql
import graft.operators.Sampling
import org.apache.spark.sql.functions._

/** Deterministic-sampling surface over the `documents` corpus
  * (engine-added, training-data-pipeline brief): content-hashed Bernoulli
  * sampling and per-stratum caps, both bit-reproducible in DuckDB — the
  * property an RNG-based sample cannot give.
  */
object SampleQueries {

  /** first-8-hex-chars-of-md5 bucket, DuckDB side. */
  private def bucketSql(id: String) =
    s"CAST(('0x' || substr(md5(CAST($id AS VARCHAR)), 1, 8)) AS BIGINT) % 10000"

  val all: Seq[QueryDef] = Seq(

    // ── deterministic ~10% Bernoulli sample: a pure scan-side filter (no
    //    shuffle), same docs selected on every run and every engine
    sql("q_sample_bernoulli",
      s"""SELECT doc_id, lang, source
         |FROM documents WHERE ${bucketSql("doc_id")} < 1000
         |ORDER BY doc_id""".stripMargin) { (s, d) =>
      Sampling.bernoulli(Tables.documents(s, d), "doc_id", rate = 0.10)
        .select("doc_id", "lang", "source")
        .orderBy("doc_id")
    },

    // ── stratified cap: at most 25 docs per language, the 25 smallest
    //    (md5(doc_id), doc_id) per stratum — class rebalancing that keeps
    //    under-represented strata whole
    sql("q_sample_stratified",
      """WITH r AS (
        |  SELECT doc_id, lang,
        |         row_number() OVER (PARTITION BY lang
        |           ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
        |  FROM documents)
        |SELECT doc_id, lang FROM r WHERE rn <= 25
        |ORDER BY doc_id""".stripMargin) { (s, d) =>
      Sampling.stratifiedCap(Tables.documents(s, d), Seq("lang"), "doc_id", k = 25)
        .select("doc_id", "lang")
        .orderBy("doc_id")
    }
  )
}
