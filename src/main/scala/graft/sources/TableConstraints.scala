package graft.sources

import java.io.File
import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, StandardCopyOption}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

/** Declared table constraints (engine-added): UNIQUE/PRIMARY-KEY and
  * FOREIGN-KEY declarations an optimizer may RELY on — the lakehouse
  * informational-constraint surface (Delta/Snowflake `RELY`, Trino's
  * `NOT ENFORCED` keys). At 100 TB the optimizer cannot AFFORD to
  * discover these properties per query (a uniqueness probe is a full
  * shuffle of the dimension; an FK probe is an anti-join of the fact),
  * yet they unlock the rewrites that matter most at that scale: a
  * dimension join the query only uses for existence DISAPPEARS
  * ([[graft.plans.ConstraintRules]]), a `dropDuplicates` on an ingest
  * key becomes a no-op, and the MV advisor orients star edges from
  * metadata instead of probing every candidate dimension.
  *
  * Storage: one `_graft_constraints.json` at the table root — beside
  * `_graft_log` for a [[TxnTable]], directly inside a plain parquet
  * directory otherwise (the underscore prefix keeps it invisible to
  * file-listing scans, like `_SUCCESS`). Writes are tmp + atomic
  * rename; [[TxnTable.cloneShallow]]/[[TxnCatalog.cloneCatalog]] copy
  * the file with the rest of the root, so constraints travel with
  * clones. The file is NOT in the `v*.json` log namespace the CDC
  * streams glob.
  *
  * Semantics: a constraint with `rely = true` is an OPTIMIZER CONTRACT
  * asserted by the declarer — exactly Delta's RELY. `declare*` can
  * optionally validate against the current data first (refusing the
  * declaration on violation), and [[verify]] re-checks every declared
  * constraint on demand, but nothing re-validates at commit time: like
  * every informational-constraint system, a writer that breaks a RELY
  * constraint afterward owns the consequences. `rely = false` records
  * documentation the optimizer must ignore (spec-pinned).
  *
  * Uniqueness here is STRICT: at most one row per full column tuple,
  * null tuples included (stronger than SQL UNIQUE, which admits
  * duplicate nulls) — the form both the dedup-elimination and
  * group-by-elimination rewrites need. The FK form is standard SQL:
  * every fact row whose FK columns are ALL non-null has a match in the
  * referenced table (null-keyed fact rows are unconstrained, which is
  * why the inner-join elimination keeps an `IsNotNull` filter).
  */
object TableConstraints {

  final case class Unique(cols: Seq[String], rely: Boolean)
  final case class ForeignKey(cols: Seq[String], refTable: String,
                              refCols: Seq[String], rely: Boolean)

  private def file(dir: String) = new File(dir, "_graft_constraints.json")

  /** Declarations are a read-modify-write of one JSON file; two threads
    * declaring on one table concurrently (parallel spec suites, two
    * queries healing a shared fixture) must not drop each other's rows.
    * One JVM-wide lock serializes writers — cheap (declarations are
    * rare control-plane events) and honest about scope: cross-PROCESS
    * racing declarations remain the operator's problem, like every
    * other registrar-contract surface here. */
  private val writeLock = new Object

  private def canon(dir: String): String = new File(dir).getCanonicalPath

  /** Parse without a JSON library — we wrote the file ourselves and
    * column/path strings never contain quotes (house rule shared with
    * the txn log parser, [[TxnTable.parseEntry]]). */
  private def parse(dir: String): (Seq[Unique], Seq[ForeignKey]) = {
    val f = file(dir)
    if (!f.isFile) (Nil, Nil)
    else {
      val s = new String(Files.readAllBytes(f.toPath), UTF_8)
      def cols(body: String): Seq[String] =
        "\"([^\"]*)\"".r.findAllMatchIn(body).map(_.group(1)).toSeq
      val uRe =
        """\{"cols":\[([^\]]*)\],"rely":(true|false)\}""".r
      val fkRe =
        """\{"cols":\[([^\]]*)\],"ref":"([^"]*)","refCols":\[([^\]]*)\],"rely":(true|false)\}""".r
      val uSec = s.indexOf("\"unique\":[")
      val fkSec = s.indexOf("\"fk\":[")
      val uBody = if (uSec < 0) "" else s.substring(uSec, if (fkSec > uSec) fkSec else s.length)
      val fkBody = if (fkSec < 0) "" else s.substring(fkSec)
      val us = uRe.findAllMatchIn(uBody)
        .map(m => Unique(cols(m.group(1)), m.group(2) == "true")).toSeq
      val fks = fkRe.findAllMatchIn(fkBody)
        .map(m => ForeignKey(cols(m.group(1)), m.group(2),
          cols(m.group(3)), m.group(4) == "true")).toSeq
      (us, fks)
    }
  }

  private def render(us: Seq[Unique], fks: Seq[ForeignKey]): String = {
    def arr(cs: Seq[String]) = cs.map("\"" + _ + "\"").mkString("[", ",", "]")
    val u = us.map(x => s"""{"cols":${arr(x.cols)},"rely":${x.rely}}""")
      .mkString("[", ",", "]")
    val f = fks.map(x =>
        s"""{"cols":${arr(x.cols)},"ref":"${x.refTable}","refCols":${arr(x.refCols)},"rely":${x.rely}}""")
      .mkString("[", ",", "]")
    s"""{"unique":$u,"fk":$f}"""
  }

  private def write(dir: String, us: Seq[Unique], fks: Seq[ForeignKey]): Unit = {
    val target = file(dir)
    require(target.getParentFile.isDirectory,
      s"constraint target is not a directory: $dir")
    val tmp = new File(dir,
      "._graft_constraints-" + java.util.UUID.randomUUID.toString.take(8) + ".tmp")
    Files.write(tmp.toPath, render(us, fks).getBytes(UTF_8))
    Files.move(tmp.toPath, target.toPath,
      StandardCopyOption.REPLACE_EXISTING, StandardCopyOption.ATOMIC_MOVE)
  }

  private def readDir(spark: SparkSession, dir: String) =
    if (TxnTable.logDir(dir).isDirectory) TxnTable.read(spark, dir)
    else spark.read.parquet(dir)

  /** Validation must NEVER run under the rewrites it validates: with
    * [[graft.plans.ConstraintRules]] active, a (violated) RELY unique
    * declaration would rewrite the validation's own `GROUP BY keys
    * HAVING COUNT > 1` probe into a constant `count = 1` projection —
    * the constraint hiding its own violation. Caught live by
    * q_constraint_verify's oracle before this guard existed. */
  private def withRewriteOff[A](spark: SparkSession)(body: => A): A = {
    val key = "spark.graft.constraintRewrite.enabled"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "false")
    try body
    finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  /** True iff the current data satisfies strict uniqueness on `cols`. */
  def holdsUnique(spark: SparkSession, dir: String, cols: Seq[String]): Boolean =
    withRewriteOff(spark) {
      readDir(spark, dir).groupBy(cols.map(col): _*).count()
        .filter(col("count") > 1).limit(1).count() == 0
    }

  /** True iff every row of `dir` with all-non-null `cols` matches a row
    * of `refDir` on `refCols` (standard SQL FK). */
  def holdsForeignKey(spark: SparkSession, dir: String, cols: Seq[String],
                      refDir: String, refCols: Seq[String]): Boolean =
    withRewriteOff(spark) {
      val fact = readDir(spark, dir).select(cols.map(col): _*).na.drop("any")
      val ref = readDir(spark, refDir)
        .select(refCols.zip(cols).map { case (rc, c) => col(rc).as(c) }: _*)
      fact.join(ref, cols, "left_anti").limit(1).count() == 0
    }

  /** Declare strict uniqueness on `cols`. With `validate`, the current
    * data is checked first and a violation REFUSES the declaration —
    * without it this is a pure RELY assertion. Re-declaring the same
    * column set replaces the prior row (rely flag updates). */
  def declareUnique(dir: String, cols: Seq[String], rely: Boolean = true,
                    validate: Option[SparkSession] = None): Unit = {
    require(cols.nonEmpty, "unique constraint needs at least one column")
    validate.foreach { s =>
      require(holdsUnique(s, dir, cols),
        s"unique(${cols.mkString(",")}) does not hold in $dir — declaration refused")
    }
    writeLock.synchronized {
      val (us, fks) = parse(dir)
      write(dir, us.filterNot(_.cols.sorted == cols.sorted) :+ Unique(cols, rely),
        fks)
    }
  }

  /** Declare an FK from `dir`.`cols` to `refDir`.`refCols` (positional
    * pairing). Paths are stored canonical so the optimizer can match
    * the referenced table by identity. */
  def declareForeignKey(dir: String, cols: Seq[String], refDir: String,
                        refCols: Seq[String], rely: Boolean = true,
                        validate: Option[SparkSession] = None): Unit = {
    require(cols.nonEmpty && cols.size == refCols.size,
      "foreign key needs matching non-empty column lists")
    validate.foreach { s =>
      require(holdsForeignKey(s, dir, cols, refDir, refCols),
        s"fk(${cols.mkString(",")}) -> $refDir(${refCols.mkString(",")}) does not hold — declaration refused")
    }
    writeLock.synchronized {
      val (us, fks) = parse(dir)
      val fk = ForeignKey(cols, canon(refDir), refCols, rely)
      write(dir, us,
        fks.filterNot(x => x.cols == cols && x.refTable == fk.refTable) :+ fk)
    }
  }

  def uniques(dir: String): Seq[Unique] = parse(dir)._1

  def foreignKeys(dir: String): Seq[ForeignKey] = parse(dir)._2

  def clear(dir: String): Unit = { file(dir).delete(); () }

  /** True when some RELY unique constraint's columns are a SUBSET of
    * `cols` — a key unique on fewer columns is unique on more. */
  def isUniqueOn(dir: String, cols: Set[String]): Boolean =
    uniques(dir).exists(u => u.rely && u.cols.forall(cols.contains))

  /** True when a RELY FK exists whose (col → refCol) pairs are EXACTLY
    * `pairs` and whose referenced table is `refDir` (canonical-path
    * identity). Exact cover, not subset: a join on extra column pairs
    * beyond the FK is NOT guaranteed a match per fact row. */
  def fkCovers(dir: String, pairs: Set[(String, String)], refDir: String): Boolean = {
    val refC = canon(refDir)
    foreignKeys(dir).exists(fk => fk.rely && fk.refTable == refC &&
      fk.cols.zip(fk.refCols).toSet == pairs)
  }

  /** Re-check every declared constraint against the CURRENT data — the
    * audit half of RELY: (description, rely, holds) per constraint. */
  def verify(spark: SparkSession, dir: String): Seq[(String, Boolean, Boolean)] = {
    val (us, fks) = parse(dir)
    us.map(u => (s"unique(${u.cols.mkString(",")})", u.rely,
        holdsUnique(spark, dir, u.cols))) ++
      fks.map(fk => (s"fk(${fk.cols.mkString(",")})->${fk.refTable}(${fk.refCols.mkString(",")})",
        fk.rely, holdsForeignKey(spark, dir, fk.cols, fk.refTable, fk.refCols)))
  }
}
