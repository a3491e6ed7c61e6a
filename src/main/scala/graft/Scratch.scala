package graft

import java.io.File

/** Janitor for per-run lifecycle scratch dirs under `target/tmp` — the
  * txn-table/catalog/MV lifecycle queries each stage a working table per
  * (query, sf) and historically deleted it only at ENTRY, so a long-lived
  * runner accumulated one dead dir per query per sf forever. Queries now
  * register their scratch through [[dir]] (which also does the entry
  * delete), and the Verify/Bench mains call [[sweep]] once every result
  * has been materialized to its own output — never mid-run, because a
  * query's returned frame may lazily read its scratch until the driver
  * writes it out.
  *
  * Deliberately NOT for the DerivedCache dirs (`target/mv`,
  * `target/partitioned`, `target/tmp/stream` stages): those are
  * source-stamped caches whose whole point is surviving runs.
  */
object Scratch {

  private val registered =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  /** Fresh per-run scratch: delete whatever a previous run left, record
    * the path for the end-of-run sweep, return it. */
  def dir(path: String): String = {
    org.apache.commons.io.FileUtils.deleteQuietly(new File(path))
    registered.add(path)
    path
  }

  /** Record a scratch path for the sweep WITHOUT touching it now — for
    * helpers whose callers manage creation/overwrite themselves and may
    * resolve the same path several times mid-query. */
  def register(path: String): String = {
    registered.add(path)
    path
  }

  /** Delete every dir registered this run. Call ONLY after all query
    * results are materialized (end of a Verify/Bench main). */
  def sweep(): Unit = {
    registered.forEach(p =>
      org.apache.commons.io.FileUtils.deleteQuietly(new File(p)))
    registered.clear()
  }
}
