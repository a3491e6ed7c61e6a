package graft.sources

import java.util.concurrent.{Callable, ConcurrentHashMap, ExecutionException, Executors}

/** Bounded-parallel fan-out for replication file copies.
  *
  * [[TxnTable.replicate]] and [[TxnCatalog.replicate]] copy every data
  * file through the same crash-safe primitive (tmp + ATOMIC_MOVE,
  * skip-if-present resume) — but running those copies one at a time on
  * the driver thread is the 100 TB wall for the whole DR family: a
  * sync's wall-clock is Σ(file latencies) instead of Σ/parallelism, and
  * at real file counts the sync simply cannot complete. The copies are
  * trivially parallel — each lands its OWN target path via its own tmp
  * file, so no two tasks ever touch the same destination, and the
  * skip-if-present check is a per-path read — which makes a bounded
  * thread pool sufficient; the ordering that matters for crash safety
  * (all of a version's files BEFORE its publish, all of a txn's data
  * BEFORE its catalog entry) is preserved by the caller joining the
  * whole batch before publishing.
  *
  * Failure contract: the FIRST task failure propagates (its original
  * exception, not the ExecutionException wrapper), remaining tasks are
  * cancelled, and any in-flight copy leaves at most its private tmp
  * file — an ordinary vacuum orphan the resume path never mistakes for
  * a finished copy (the atomic move is what publishes a target). This
  * is exactly the crash window the serial path already had, so the
  * resume semantics are unchanged: re-running the sync skips completed
  * targets and re-copies the rest.
  */
private[graft] object ParallelCopy {

  /** Distinct worker threads used by the LAST batch — spec
    * observability only (pins that a many-file batch actually fanned
    * out instead of degrading to the driver thread). */
  @volatile private[graft] var lastThreads: Int = 0

  /** IO-bound fan-out width: capped well below the shuffle-partition
    * scale (copies contend on disk/network, not CPU) and by the batch
    * size itself. Overridable per call for specs/deployments. */
  private def defaultParallelism: Int =
    math.min(16, math.max(2, Runtime.getRuntime.availableProcessors / 2))

  /** Run `f` over `items` on a bounded pool, joining every task before
    * returning — the caller's next step (a log publish) must only ever
    * see a fully-landed batch. Single-item and empty batches run
    * inline (no pool spin-up for the steady-state O(Δ) sync that ships
    * one file). */
  def foreachPar[A](items: Seq[A], parallelism: Int = 0)(f: A => Unit): Unit = {
    val n = math.min(items.size,
      if (parallelism >= 1) parallelism else defaultParallelism)
    if (items.size <= 1 || n <= 1) {
      items.foreach(f)
      lastThreads = math.min(items.size, 1)
      return
    }
    val pool = Executors.newFixedThreadPool(n)
    val threads = ConcurrentHashMap.newKeySet[String]()
    try {
      val futures = items.map { a =>
        pool.submit(new Callable[Unit] {
          override def call(): Unit = {
            threads.add(Thread.currentThread().getName)
            f(a)
          }
        })
      }
      futures.foreach { fu =>
        try fu.get()
        catch {
          case e: ExecutionException =>
            throw Option(e.getCause).getOrElse(e)
        }
      }
    } finally {
      pool.shutdownNow()
      lastThreads = math.max(1, threads.size)
    }
  }
}
