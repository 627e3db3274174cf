package graft.operators

/** Submit independent Spark actions concurrently from a bounded thread
  * pool (optimization guide §2.6, "overlap independent jobs"): Spark's
  * scheduler happily runs several jobs at once inside one application —
  * actions are only sequential because driver code calls them
  * sequentially. The index lifecycles are the motivating case: a
  * maintenance step writes several SELF-CONTAINED relations (docs /
  * postings / hashes), each a bucket-count-sized job that alone cannot
  * fill the cluster — run sequentially, each job's tail leaves most
  * cores idle; overlapped, the next relation's tasks back-fill them.
  * This is a wall-clock win at every scale (FIFO scheduling gives
  * exactly the back-fill behaviour), not a local-mode tune.
  *
  * Semantics: runs every thunk to completion (so no job leaks past the
  * call), then rethrows the FIRST failure if any — callers' staged
  * crash-safety contracts (marker before, meta after) are unchanged
  * because all relation writes still complete (or the step throws)
  * before the commit step runs. Thread-local Spark properties (job
  * group/description) are inherited by the pool threads from the
  * caller, so UI labels and cancellation behave as before.
  *
  * On CALLER interrupt the outstanding futures are cancelled with
  * interruption (`cancel(true)` + `shutdownNow`) and the pool is drained
  * for a bounded grace period before the interrupt is re-asserted and
  * rethrown — so an interrupt does not silently leave thunks running
  * past the call either. A thunk that ignores thread interruption for
  * longer than the grace period is abandoned (documented escape hatch:
  * Spark actions respond to interrupts at their next job boundary).
  */
private[graft] object JobPar {
  def run(thunks: (() => Unit)*): Unit = {
    if (thunks.size <= 1) { thunks.foreach(_.apply()); return }
    val pool = java.util.concurrent.Executors.newFixedThreadPool(thunks.size)
    try {
      val futs = thunks.map { t =>
        pool.submit(new java.util.concurrent.Callable[Unit] {
          def call(): Unit = t()
        })
      }
      var err: Throwable = null
      var interrupted = false
      futs.foreach { f =>
        if (interrupted) { f.cancel(true); () }
        else try f.get()
        catch {
          case e: java.util.concurrent.ExecutionException =>
            if (err == null) err = e.getCause
          case e: InterruptedException =>
            interrupted = true
            if (err == null) err = e
            f.cancel(true)
        }
      }
      if (interrupted) {
        pool.shutdownNow()
        // drain in-flight thunks (bounded): the interrupt flag is clear
        // here (the catch above consumed it), so awaitTermination waits
        try { pool.awaitTermination(60, java.util.concurrent.TimeUnit.SECONDS); () }
        catch { case _: InterruptedException => () }
        Thread.currentThread().interrupt()
      }
      if (err != null) throw err
    } finally pool.shutdown()
  }
}
