package graft.streaming

import java.io.File

import graft.SparkSpec
import graft.sources.TxnTable
import org.apache.commons.io.FileUtils
import org.apache.spark.sql.functions._

/** [[EventsStreaming.dimDeltaStarRefresh]]: a dimension change folds
  * into a maintained star view from the VIEW alone (grain retains the
  * fact-side key) — rename, delete, and (LEFT) insert all reallocate
  * measures without a fact scan; an INNER star refuses a pure insert
  * loudly (its unmatched fact rows were never stored). */
class StarDimDeltaSpec extends SparkSpec {

  import spark.implicits._

  private val root = "/root/repo/target/tmp/spec_dimdelta"

  override def beforeAll(): Unit = {
    super.beforeAll()
    FileUtils.deleteQuietly(new File(root))
  }

  private val fact = Seq((1L, 10L), (1L, 20L), (2L, 5L), (3L, 7L), (9L, 1L))

  test("left star: rename, delete, and insert all fold from the view alone") {
    val dimT = s"$root/dim_left"
    val viewT = s"$root/view_left"
    val f = fact.toDF("fk", "v")
    TxnTable.commit(spark,
      Seq((1L, "A"), (2L, "A"), (3L, "B")).toDF("dk", "seg"), dimT,
      overwrite = false)
    def viewOf(dim: org.apache.spark.sql.DataFrame) =
      f.join(dim, col("fk") === col("dk"), "left")
        .groupBy("seg", "fk")
        .agg(count(lit(1)).as("cnt"), sum("v").as("sum_v"))
    TxnTable.commit(spark, viewOf(TxnTable.read(spark, dimT)), viewT,
      overwrite = false)
    // dim v2 (overwrite): dk=1 renamed A→C, dk=2 deleted, dk=3 kept,
    // dk=9 inserted — every transition in one feed
    TxnTable.commit(spark,
      Seq((1L, "C"), (3L, "B"), (9L, "D")).toDF("dk", "seg"), dimT,
      overwrite = true)
    EventsStreaming.dimDeltaStarRefresh(spark, viewT, Seq("seg", "fk"),
      measureCols = Seq("cnt", "sum_v"), leftKey = "fk", dimKey = "dk",
      dimTable = dimT, fromVersion = 1, toVersion = 2, joinType = "left")
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select("seg", "fk", "cnt", "sum_v").collect()
        .map(_.toSeq).toSet
    val got = canon(TxnTable.read(spark, viewT))
    val recomputed = canon(viewOf(TxnTable.read(spark, dimT)))
    assert(got == recomputed, s"got $got\nwant $recomputed")
    // spot the transitions: rename moved fk=1 to C, delete null-extended
    // fk=2, insert attributed fk=9 to D
    assert(got.contains(Seq("C", 1L, 2L, 30L)))
    assert(got.contains(Seq(null, 2L, 1L, 5L)))
    assert(got.contains(Seq("D", 9L, 1L, 1L)))
  }

  test("inner star refuses a pure dim insert, absorbs rename and delete") {
    val dimT = s"$root/dim_inner"
    val viewT = s"$root/view_inner"
    val f = fact.toDF("fk", "v")
    TxnTable.commit(spark,
      Seq((1L, "A"), (2L, "A"), (3L, "B")).toDF("dk", "seg"), dimT,
      overwrite = false)
    def viewOf(dim: org.apache.spark.sql.DataFrame) =
      f.join(dim, col("fk") === col("dk"), "inner")
        .groupBy("seg", "fk")
        .agg(count(lit(1)).as("cnt"), sum("v").as("sum_v"))
    TxnTable.commit(spark, viewOf(TxnTable.read(spark, dimT)), viewT,
      overwrite = false)
    // v2: rename dk=1, delete dk=2 — no insert: absorbable
    TxnTable.commit(spark, Seq((1L, "C"), (3L, "B")).toDF("dk", "seg"),
      dimT, overwrite = true)
    EventsStreaming.dimDeltaStarRefresh(spark, viewT, Seq("seg", "fk"),
      measureCols = Seq("cnt", "sum_v"), leftKey = "fk", dimKey = "dk",
      dimTable = dimT, fromVersion = 1, toVersion = 2, joinType = "inner")
    val got = TxnTable.read(spark, viewT)
      .select("seg", "fk", "cnt", "sum_v").collect().map(_.toSeq).toSet
    val recomputed = viewOf(TxnTable.read(spark, dimT))
      .select("seg", "fk", "cnt", "sum_v").collect().map(_.toSeq).toSet
    assert(got == recomputed, s"got $got\nwant $recomputed")
    assert(!got.exists(_.head == null)) // inner never null-extends
    // v3: a pure insert (dk=9) — the inner view never stored fk=9
    TxnTable.commit(spark, Seq((9L, "D")).toDF("dk", "seg"), dimT,
      overwrite = false)
    val e = intercept[IllegalArgumentException] {
      EventsStreaming.dimDeltaStarRefresh(spark, viewT, Seq("seg", "fk"),
        measureCols = Seq("cnt", "sum_v"), leftKey = "fk", dimKey = "dk",
        dimTable = dimT, fromVersion = 2, toVersion = 3, joinType = "inner")
    }
    assert(e.getMessage.contains("rebuild"))
  }

  test("inner star refuses an insert-then-update; absorbs delete-then-reinsert") {
    val dimT = s"$root/dim_insupd"
    val viewT = s"$root/view_insupd"
    val f = fact.toDF("fk", "v")
    TxnTable.commit(spark,
      Seq((1L, "A"), (2L, "A"), (3L, "B")).toDF("dk", "seg"), dimT,
      overwrite = false)
    def viewOf(dim: org.apache.spark.sql.DataFrame) =
      f.join(dim, col("fk") === col("dk"), "inner")
        .groupBy("seg", "fk")
        .agg(count(lit(1)).as("cnt"), sum("v").as("sum_v"))
    TxnTable.commit(spark, viewOf(TxnTable.read(spark, dimT)), viewT,
      overwrite = false)
    // v2 inserts dk=9; v3 updates it — the key's feed over (1,3] now
    // carries an update_preimage, but its FIRST event is the insert:
    // it did not exist at v1 and the inner view never stored fk=9.
    // The pre-fix guard ("has any old-state event") let this escape.
    TxnTable.commit(spark,
      Seq((1L, "A"), (2L, "A"), (3L, "B"), (9L, "D")).toDF("dk", "seg"),
      dimT, overwrite = true)
    TxnTable.commit(spark,
      Seq((1L, "A"), (2L, "A"), (3L, "B"), (9L, "E")).toDF("dk", "seg"),
      dimT, overwrite = true)
    val e = intercept[IllegalArgumentException] {
      EventsStreaming.dimDeltaStarRefresh(spark, viewT, Seq("seg", "fk"),
        measureCols = Seq("cnt", "sum_v"), leftKey = "fk", dimKey = "dk",
        dimTable = dimT, fromVersion = 1, toVersion = 3, joinType = "inner")
    }
    assert(e.getMessage.contains("rebuild"))
    // WITH the fact (+ sums), the same window FOLDS: the inserted key's
    // contribution comes from one pruned fact pass at its POST image
    // (9→"E", the net of insert-then-update), everything else from the
    // view — equality with the from-scratch recompute proves it
    EventsStreaming.dimDeltaStarRefresh(spark, viewT, Seq("seg", "fk"),
      measureCols = Seq("cnt", "sum_v"), leftKey = "fk", dimKey = "dk",
      dimTable = dimT, fromVersion = 1, toVersion = 3, joinType = "inner",
      fact = Some(f), sums = Map("sum_v" -> "v"))
    val foldGot = TxnTable.read(spark, viewT)
      .select("seg", "fk", "cnt", "sum_v").collect().map(_.toSeq).toSet
    val foldWant = viewOf(TxnTable.read(spark, dimT))
      .select("seg", "fk", "cnt", "sum_v").collect().map(_.toSeq).toSet
    assert(foldGot == foldWant, s"got $foldGot\nwant $foldWant")
    assert(foldGot.contains(Seq("E", 9L, 1L, 1L)),
      "the inserted-then-updated key must appear at its post image")
    // v4 deletes dk=3; v5 reinserts it renamed — first event for dk=3
    // over (3,5] is the DELETE, so it existed at fromVersion and the
    // fold is sound (its fact rows are in the view to retract).
    TxnTable.commit(spark,
      Seq((1L, "A"), (2L, "A"), (9L, "E")).toDF("dk", "seg"),
      dimT, overwrite = true)
    TxnTable.commit(spark,
      Seq((1L, "A"), (2L, "A"), (3L, "Z"), (9L, "E")).toDF("dk", "seg"),
      dimT, overwrite = true)
    EventsStreaming.dimDeltaStarRefresh(spark, viewT, Seq("seg", "fk"),
      measureCols = Seq("cnt", "sum_v"), leftKey = "fk", dimKey = "dk",
      dimTable = dimT, fromVersion = 3, toVersion = 5, joinType = "inner")
    val got = TxnTable.read(spark, viewT)
      .select("seg", "fk", "cnt", "sum_v").collect().map(_.toSeq).toSet
    // full recompute — fk=9 is in the view since the fact-assisted fold
    val recomputed = viewOf(TxnTable.read(spark, dimT))
      .select("seg", "fk", "cnt", "sum_v").collect().map(_.toSeq).toSet
    assert(got == recomputed, s"got $got\nwant $recomputed")
    assert(got.contains(Seq("Z", 3L, 1L, 7L))) // reinserted rename folded
  }

  test("the grain guard: group keys without the fact-side key refuse") {
    val dimT = s"$root/dim_grain"
    val viewT = s"$root/view_grain"
    TxnTable.commit(spark, Seq((1L, "A")).toDF("dk", "seg"), dimT,
      overwrite = false)
    TxnTable.commit(spark, Seq(("A", 1L, 1L)).toDF("seg", "cnt", "sum_v"),
      viewT, overwrite = false)
    TxnTable.commit(spark, Seq((1L, "B")).toDF("dk", "seg"), dimT,
      overwrite = true)
    val e = intercept[IllegalArgumentException] {
      EventsStreaming.dimDeltaStarRefresh(spark, viewT, Seq("seg"),
        measureCols = Seq("cnt", "sum_v"), leftKey = "fk", dimKey = "dk",
        dimTable = dimT, fromVersion = 1, toVersion = 2, joinType = "left")
    }
    assert(e.getMessage.contains("grain"))
  }
}
