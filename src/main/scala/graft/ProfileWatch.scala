package graft

import org.apache.spark.sql.functions._

/** Stage-level profiling of the rotating bench watch items (r11:
  * q_stream_hll, q_scan_mv_cdc_repair; r12: q_src_cdf_scd2; r13:
  * q_stream_enforced_ingest, q_stream_join_outer; r16:
  * q_stream_star_dim_delta, q_ann_txn_upsert) — measures the
  * micro-batch count and per-phase wall time instead of claiming VM
  * drift. `runMain graft.ProfileWatch <sfDir> [reps]`. Each rep prints
  * one line per phase; the driver-visible bench number is the SUM of
  * the phases, so whichever phase moved names the cause. */
object ProfileWatch {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val reps = if (args.length > 1) args(1).toInt else 3
    val spark = GraftSession.create(32)
    spark.sparkContext.setLogLevel("WARN")

    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[watch] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    for (rep <- 1 to reps) {
      println(s"[watch] ── q_stream_hll rep $rep ──")
      // phase 1: the fixture staging typeDistinctUsers does internally
      // (copy events.parquet into a per-sf stream dir — file IO)
      val staged = t("hll stage dir")(
        graft.streaming.EventsStreaming.stageDir(sfDir))
      println(s"[watch] staged files = " +
        new java.io.File(staged).listFiles().count(_.getName.endsWith(".parquet")))
      // phase 2: the stream itself, micro-batch count + per-batch times
      val streamEst = t("hll stream (tws)")(
        graft.streaming.TwsStreaming.typeDistinctUsers(spark, sfDir,
          onQuery = q => {
            val ps = q.recentProgress
            println(s"[watch] hll micro-batches = ${ps.length}")
            ps.foreach(p => println(
              s"[watch]   batch ${p.batchId}: rows=${p.numInputRows} " +
                s"total=${p.durationMs.get("triggerExecution")}ms " +
                s"addBatch=${p.durationMs.get("addBatch")}ms"))
          }))
      // phase 3: the batch side + join the query body adds
      t("hll batch agg + join") {
        val hll = udaf(new graft.functions.HllAggregator(11))
        Tables.events(spark, sfDir).groupBy("event_type")
          .agg(countDistinct(col("user_id")).as("exact_distinct"),
            hll(col("user_id")).as("batch_est"))
          .join(streamEst, "event_type")
          .select(col("event_type"), col("exact_distinct"),
            (abs(col("est") - col("exact_distinct")) / col("exact_distinct") < 0.05)
              .as("within_bound"),
            (col("est") === col("batch_est")).as("stream_eq_batch"))
          .orderBy("event_type").collect()
      }
    }

    for (rep <- 1 to reps) {
      println(s"[watch] ── q_src_cdf_scd2 rep $rep ──")
      import graft.sources.TxnTable
      val sfKey = sfDir.replaceAll("[^A-Za-z0-9]", "_")
      val table = Scratch.dir(s"/root/repo/target/tmp/pw_cdfscd2_$sfKey")
      val base = t("scd2 base ckpt")(
        spark.read.parquet(s"$sfDir/customer.parquet")
          .select(col("c_custkey").as("k"), col("c_mktsegment").as("seg"))
          .coalesce(1).localCheckpoint(true))
      t("scd2 commit v1")(TxnTable.commit(spark, base, table,
        overwrite = false))
      t("scd2 upsert v2")(graft.operators.Merge.upsert(spark, table,
        base.filter(col("k") % 5 === 0).withColumn("seg", lit("SEG_A")),
        Seq("k")))
      t("scd2 upsert v3")(graft.operators.Merge.upsert(spark, table,
        base.filter(col("k") % 7 === 0).withColumn("seg", lit("SEG_B")),
        Seq("k")))
      var dim = TxnTable.read(spark, table, asOf = Some(1))
        .select(col("k"), col("seg"), lit(1L).as("valid_from"),
          lit(null).cast("long").as("valid_to"), lit(true).as("is_current"))
      for (v <- 2 to 3) {
        val changes = t(s"scd2 feed v$v")(TxnTable
          .changeFeed(spark, table, fromExclusive = v - 1, toInclusive = v,
            keys = Seq("k"))
          .filter(col("change").isin("insert", "update"))
          .select(col("k"), col("seg"))
          .localCheckpoint(true))
        dim = t(s"scd2 fold v$v")(graft.operators.Scd.scd2Apply(dim, changes,
          "k", Seq("seg"), effectiveTs = lit(v.toLong))
          .localCheckpoint(true))
      }
      t("scd2 collect")(dim.orderBy("k", "valid_from").collect())
    }

    for (rep <- 1 to reps) {
      println(s"[watch] ── q_scan_mv_cdc_repair rep $rep ──")
      import graft.plans.{Mv, MvRewrite}
      import graft.sources.TxnTable
      val sfKey = sfDir.replaceAll("[^A-Za-z0-9]", "_")
      val table = Scratch.dir(s"/root/repo/target/tmp/pw_cdcmvr_table_$sfKey")
      val mvDir = Scratch.dir(s"/root/repo/target/tmp/pw_cdcmvr_view_$sfKey")
      val base = spark.read.parquet(s"$sfDir/orders.parquet")
        .select(col("o_orderkey").as("k"), col("o_orderpriority").as("g"),
          col("o_custkey").cast("long").as("v"))
      t("cdcr commit base")(TxnTable.commit(spark, base, table,
        overwrite = false))
      val v1 = t("cdcr register mv")(
        Mv.registerTxn(spark, "pw_cdcmvr_q", table, mvDir, Seq("g"), Seq("v")))
      def staged(stage: String) = {
        val q = TxnTable.read(spark, table)
          .groupBy("g").agg(sum("v").as("sv"), min("v").as("mn"),
            max("v").as("mx"), count(lit(1)).as("n"))
        q.select(lit(stage).as("stage"), col("g"), col("sv"), col("mn"),
            col("mx"), col("n")).localCheckpoint(true)
      }
      try {
        t("cdcr stage a (mv answer)")(staged("a_mv"))
        t("cdcr merge upsert")(graft.operators.Merge.upsert(spark, table,
          base.filter(col("k") % 11 === 0)
            .select(col("k"), col("g"), (col("v") * 2).as("v")),
          Seq("k")))
        t("cdcr deleteWhere")(TxnTable.deleteWhere(spark, table,
          col("k") % 7 === 0))
        t("cdcr refresh (repairMinMax)")(Mv.refreshTxnCdc(spark,
          "pw_cdcmvr_q", table, v1, mvDir, Seq("g"), Seq("v"),
          rowKeys = Seq("k"), repairMinMax = true))
        t("cdcr stage b (mv answer)")(staged("b_repaired"))
      } finally MvRewrite.deregister("pw_cdcmvr_q")
    }

    for (rep <- 1 to reps) {
      println(s"[watch] ── q_stream_join_outer rep $rep ──")
      // phase 1: the per-sf stream staging (cached across reps)
      t("ljoin stage dir")(graft.streaming.EventsStreaming.stageDir(sfDir))
      // phase 2: stream build + bounded drain (watermarked outer join,
      // sentinel-flushed) — the streaming machinery itself
      val joined = t("ljoin stream build+drain")(
        graft.streaming.EventsStreaming.clickPurchaseLeftJoin(spark, sfDir,
          withinMinutes = 30))
      // phase 3: the batch-side sort + materialization the query adds
      val n = t("ljoin sort+collect")(
        joined.orderBy("click_id", "purchase_id").collect().length)
      println(s"[watch] ljoin rows = $n")
    }

    for (rep <- 1 to reps) {
      println(s"[watch] ── q_stream_enforced_ingest rep $rep ──")
      import graft.sources.{TableConstraints, TxnTable}
      import org.apache.spark.sql.types.{LongType, StructType}
      import spark.implicits._
      val sfKey = sfDir.replaceAll("[^A-Za-z0-9]", "_")
      val root = Scratch.dir(s"/root/repo/target/tmp/pw_senf_$sfKey")
      val dim = s"$root/dim"; val fact = s"$root/fact"
      val quar = s"$root/quar"; val in = s"$root/in"
      t("senf dim commit+declare") {
        TxnTable.commit(spark,
          spark.read.parquet(s"$sfDir/orders.parquet").select("o_orderkey"),
          dim, overwrite = false)
        new java.io.File(fact).mkdirs()
        TableConstraints.declareUnique(dim, Seq("o_orderkey"),
          validate = Some(spark))
        TableConstraints.declareForeignKey(fact, Seq("l_orderkey"), dim,
          Seq("o_orderkey"))
        TableConstraints.declareNotNull(fact, Seq("l_orderkey"))
      }
      t("senf input write")(
        spark.read.parquet(s"$sfDir/lineitem.parquet")
          .select(col("l_orderkey"), col("l_quantity").cast("long").as("qty"))
          .unionByName(Seq((Some(-1L), 7L)).toDF("l_orderkey", "qty"))
          .unionByName(Seq((Option.empty[Long], 5L)).toDF("l_orderkey", "qty"))
          .write.parquet(in))
      val schema = new StructType()
        .add("l_orderkey", LongType).add("qty", LongType)
      val (goodT, quarT) = t("senf constrained stream")(
        graft.streaming.EventsStreaming.constrainedIngest(spark, in, schema,
          fact, quar))
      t("senf agg+collect") {
        val good = goodT.agg(count(lit(1)).as("cnt"), sum("qty").as("qty"))
          .select(lit("a_good").as("bucket"), col("cnt"), col("qty"))
        val bad = quarT
          .groupBy(when(col("reason").startsWith("fk"), "b_fk")
            .otherwise("c_notnull").as("bucket"))
          .agg(count(lit(1)).as("cnt"), sum("qty").as("qty"))
        good.unionByName(bad).orderBy("bucket").collect().length
      }
    }

    for (rep <- 1 to reps) {
      println(s"[watch] ── q_layout_cluster_advice rep $rep ──")
      import graft.sources.{TxnLayout, TxnTable}
      import spark.implicits._
      val sfKey = sfDir.replaceAll("[^A-Za-z0-9]", "_")
      val table = s"/root/repo/target/tmp/pw_cladv_$sfKey/t$rep"
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(table))
      t("cladv commit fixture")(TxnTable.commit(spark,
        spark.read.parquet(s"$sfDir/orders.parquet").select(
          (col("o_orderkey") % 32768).as("x"),
          (col("o_custkey") % 32768).as("y"),
          col("o_orderkey").as("v")), table, overwrite = false))
      t("cladv optimizeClustered")(
        TxnLayout.optimizeClustered(spark, table, Seq("x", "y"), numFiles = 4))
      // the advice call decomposed into its three measures — the r14
      // additions (clamped mass + file skew) are suspects for the
      // +1.7 s same-tree growth the verdict flagged
      def adviceDecomposed(tag: String): Unit = {
        t(s"cladv $tag stalenessOf")(TxnLayout.staleness(table))
        t(s"cladv $tag boundsStaleness")(TxnLayout.boundsStaleness(spark, table))
        t(s"cladv $tag fileSkew")(TxnLayout.fileSkew(table))
        t(s"cladv $tag full clusterAdvice")(
          graft.plans.LayoutAdvisor.clusterAdvice(spark, table,
            maxStaleFraction = 1e-9).collect())
      }
      adviceDecomposed("a")
      t("cladv append")(TxnTable.commit(spark,
        Seq((40000L, 40000L, 1L), (40001L, 40001L, 2L), (40002L, 40002L, 3L))
          .toDF("x", "y", "v").coalesce(1), table, overwrite = false))
      adviceDecomposed("b")
      t("cladv maintainClustered")(
        TxnLayout.maintainClustered(spark, table, maxStaleFraction = 1e-9))
      adviceDecomposed("c")
    }

    // ── r16 watch: q_stream_star_dim_delta grew 8.93 → ~10.0 s across
    // BOTH r15 runs. The round-15 suspects are the catalog txn layer
    // (parallel-vacuum pool spin-up per commit, promoted-marker stat
    // calls on the commit path) vs the streaming refresh itself — the
    // decomposition separates commit/upsert wall time from the three
    // maintenance streams.
    for (rep <- 1 to reps) {
      println(s"[watch] ── q_stream_star_dim_delta rep $rep ──")
      import graft.sources.{TxnTable, TxnLayout}
      import graft.operators.Merge
      import graft.streaming.EventsStreaming
      val base = s"/root/repo/target/tmp/watch_stardelta_$rep"
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(base))
      val table = s"$base/src"; val dimT = s"$base/dim"; val view = s"$base/agg"
      new java.io.File(s"$view.ckpt").mkdirs()
      val fact = Tables.orders(spark, sfDir)
        .select(col("o_orderkey").as("k"), col("o_custkey"),
          (col("o_orderkey") % 100).as("v"))
      t("sdd dim v1 commit")(TxnTable.commit(spark,
        Tables.customer(spark, sfDir).filter(col("c_custkey") % 2 === 0)
          .select("c_custkey", "c_mktsegment"), dimT, overwrite = false))
      def dims() = Seq((TxnTable.read(spark, dimT), "o_custkey", "c_custkey"))
      val gk = Seq("c_mktsegment", "o_custkey")
      t("sdd fact v1 commit")(TxnTable.commit(spark,
        fact.filter((col("k") % 3).isin(0, 1)).repartition(4),
        table, overwrite = false))
      t("sdd stream 1 (initial)")(
        EventsStreaming.cdcStarViewMaintenance(spark, table, view,
          keys = Seq("k"), groupKeys = gk, countCol = "cnt",
          sums = Map("sum_v" -> "v"), dims = dims(), joinTypes = Seq("left")))
      t("sdd dim upsert")(Merge.upsert(spark, dimT,
        TxnTable.read(spark, dimT).filter(col("c_custkey") % 10 === 0)
          .withColumn("c_mktsegment", lit("RENAMED")), Seq("c_custkey")))
      t("sdd dimDeltaStarRefresh")(
        EventsStreaming.dimDeltaStarRefresh(spark, view, gk,
          measureCols = Seq("cnt", "sum_v"), leftKey = "o_custkey",
          dimKey = "c_custkey", dimTable = dimT,
          fromVersion = 1, toVersion = 2, joinType = "left"))
      t("sdd fact upsert")(Merge.upsert(spark, table,
        fact.filter((col("k") % 3).isin(1, 2))
          .withColumn("v", org.apache.spark.sql.functions
            .when(col("k") % 3 === 1, col("v") + 1000).otherwise(col("v"))),
        Seq("k")))
      t("sdd stream 2 (resume) + agg")(
        EventsStreaming.cdcStarViewMaintenance(spark, table, view,
            keys = Seq("k"), groupKeys = gk, countCol = "cnt",
            sums = Map("sum_v" -> "v"), dims = dims(),
            joinTypes = Seq("left"), resume = true)
          .groupBy("c_mktsegment")
          .agg(sum("cnt").as("cnt"), sum("sum_v").cast("long").as("sum_v"))
          .orderBy("c_mktsegment").collect())
    }

    // ── r16 watch: q_ann_txn_upsert grew 8.12 → ~9.4 s across both
    // r15 runs; same suspects (catalog txn commit path). Decomposed
    // into the index commit, the three lifecycle txns, and the five
    // full-replay searches.
    for (rep <- 1 to reps) {
      println(s"[watch] ── q_ann_txn_upsert rep $rep ──")
      import graft.operators.Similarity
      val embs = Tables.embeddings(spark, sfDir)
      val sfKey = sfDir.replaceAll("[^A-Za-z0-9]", "_")
      val cat = s"/root/repo/target/tmp/watch_annups_$rep"
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(cat))
      val batch = embs.filter(col("vec_id") < 10)
      val idxDir =
        s"${sys.props("user.dir")}/target/ann_index_${sfKey}_c16i2m8k16"
      graft.DerivedCache.ensure(new java.io.File(idxDir),
          Seq(new java.io.File(s"$sfDir/embeddings.parquet")), "meta/_SUCCESS") {
        Similarity.writeIvfPqIndex(embs, idxDir)
      }
      val t1 = t("ann commit index txn")(
        Similarity.commitIvfPqIndexTxnFromDir(spark, idxDir, cat))
      t("ann search base")(
        Similarity.ivfPqTopKIndexedTxn(spark, batch, cat, k = 5).collect())
      t("ann delete txn")(Similarity.deleteFromIvfPqIndexTxn(spark,
        embs.filter(col("vec_id") % 3 === 0 && col("vec_id") >= 10)
          .select("vec_id"), cat))
      val t2 = graft.sources.TxnCatalog.currentTxn(cat)
      t("ann search post-delete")(
        Similarity.ivfPqTopKIndexedTxn(spark, batch, cat, k = 5).collect())
      val up = embs.filter(col("vec_id") === 112)
        .withColumn("vec_id", lit(12L))
        .unionByName(embs.filter(col("vec_id") === 113)
          .withColumn("vec_id", lit(13L)))
      t("ann upsert txn")(Similarity.upsertIntoIvfPqIndexTxn(spark, up, cat))
      t("ann search post-upsert")(
        Similarity.ivfPqTopKIndexedTxn(spark, batch, cat, k = 5).collect())
      t("ann search as-of t1")(Similarity.ivfPqTopKIndexedTxn(
        spark, batch, cat, k = 5, asOf = Some(t1)).collect())
      t("ann search as-of t2")(Similarity.ivfPqTopKIndexedTxn(
        spark, batch, cat, k = 5, asOf = Some(t2)).collect())
    }
    spark.stop()
  }
}
