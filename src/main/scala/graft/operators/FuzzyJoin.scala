package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Blocked fuzzy matching (engine-added): the entity-resolution join —
  * "are these two records the same real-world thing?" — over string keys
  * that differ by typos or formatting. The naive form is an all-pairs
  * edit-distance scan, O(n²) and dead at corpus scale; the standard
  * answer is BLOCKING: a cheap deterministic key (token, prefix,
  * phonetic code) buckets candidates so the expensive distance runs only
  * within blocks.
  *
  * Scale shape: the candidate generator is an EQUI-join on the block
  * key (shuffle on a short string, never a cross product); a length-band
  * predicate (|len(a) − len(b)| ≤ maxDist, a provable lower bound on
  * edit distance) prunes before the Levenshtein kernel evaluates. Block
  * sizes bound the quadratic term — the same contract as the LSH band
  * join in [[Dedup]], with blocking recall traded the same way (pairs in
  * different blocks are never compared; the spec measures that loss
  * against the unblocked baseline).
  */
object FuzzyJoin {

  /** Within-block candidate pairs of `left` × `right` whose `textCol`
    * edit distance is ≤ `maxDist`. `blockFn` derives the block key from
    * the text. Self-join callers should pass the same frame twice and
    * keep `dedupPairs = true` to emit each unordered pair once
    * (a < b on the text). Output: (name_a, name_b, dist). */
  def fuzzyPairs(left: DataFrame, right: DataFrame, textCol: String,
                 blockFn: Column => Column, maxDist: Int,
                 dedupPairs: Boolean = true): DataFrame = {
    val l = left.select(col(textCol).as("name_a"),
      blockFn(col(textCol)).as("__blk"))
    val r = right.select(col(textCol).as("name_b"),
      blockFn(col(textCol)).as("__blk"))
    val paired = l.join(r, "__blk")
    val ordered = if (dedupPairs) paired.filter(col("name_a") < col("name_b"))
                  else paired.filter(col("name_a") =!= col("name_b"))
    ordered
      // length band: a difference in length of k forces distance ≥ k,
      // so this prunes WITHOUT touching the O(|a|·|b|) kernel
      .filter(abs(length(col("name_a")) - length(col("name_b"))) <= maxDist)
      .withColumn("dist", levenshtein(col("name_a"), col("name_b")).cast("long"))
      .filter(col("dist") <= maxDist)
      .select("name_a", "name_b", "dist")
  }

  /** Full entity resolution: canonical entity labels from the fuzzy
    * match graph. [[fuzzyPairs]] edges feed the shared union-find
    * ([[Dedup.nearDupClusters]] — driver union-find under the edge cap,
    * distributed min-label propagation above it); each connected
    * component's entity label is its lexicographically smallest member,
    * and unmatched keys are their own singleton entity.
    *
    * Node ids are `xxhash64` of the text — a scan-side projection (no
    * global window / zipWithIndex pass to mint ids), collision odds
    * n²/2⁶⁴; labels travel back to strings by equi-join. Output:
    * (`textCol`, entity). */
  def entities(df: DataFrame, textCol: String,
               blockFn: Column => Column, maxDist: Int): DataFrame = {
    val names = df.select(col(textCol)).distinct()
    val pairs = fuzzyPairs(names, names, textCol, blockFn, maxDist)
    val withId = names.select(col(textCol).as("__name"),
      xxhash64(col(textCol)).as("__id"))
    val edges = pairs
      .join(withId.select(col("__name").as("name_a"), col("__id").as("id_a")), "name_a")
      .join(withId.select(col("__name").as("name_b"), col("__id").as("id_b")), "name_b")
      .select("id_a", "id_b")
    val comps = Dedup.nearDupClusters(edges)
      .withColumnRenamed("doc_id", "__id")
    val labeled = withId.join(comps, Seq("__id"), "left")
      .withColumn("__cluster", coalesce(col("cluster_id"), col("__id")))
    val entityName = labeled.groupBy("__cluster")
      .agg(min("__name").as("entity"))
    labeled.join(entityName, "__cluster")
      .select(col("__name").as(textCol), col("entity"))
  }

  /** Unblocked all-pairs baseline — the correctness reference blocking
    * is measured against. Only ever run on bounded distinct-key sets. */
  def fuzzyPairsBrute(left: DataFrame, right: DataFrame, textCol: String,
                      maxDist: Int): DataFrame = {
    val l = left.select(col(textCol).as("name_a"))
    val r = right.select(col(textCol).as("name_b"))
    l.crossJoin(r)
      .filter(col("name_a") < col("name_b"))
      .withColumn("dist", levenshtein(col("name_a"), col("name_b")).cast("long"))
      .filter(col("dist") <= maxDist)
      .select("name_a", "name_b", "dist")
  }
}
