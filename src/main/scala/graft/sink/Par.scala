package graft.sink

/** Ordered map over INDEPENDENT Spark actions through a small fixed pool
  * (opt guide §2.6 "overlap independent jobs"): Spark's scheduler runs
  * concurrent jobs FIFO, so a later action's tasks back-fill executors
  * freed by the current action's tail. 2-4 jobs in flight is plenty —
  * enough to fill the tail, not so many that they fight for cores.
  *
  * Failure contract: the FIRST failure cancels every outstanding action
  * (no orphaned work keeps running after the caller has already thrown)
  * and the ORIGINAL exception propagates — never the pool's
  * ExecutionException wrapper, so callers/tests that match on exception
  * types see exactly what a sequential loop would have thrown. */
private[graft] object Par {
  def map[A, B](xs: Seq[A], maxThreads: Int = 4)(f: A => B): Seq[B] = {
    if (xs.size <= 1) return xs.map(f)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      math.min(maxThreads, xs.size))
    try {
      val futs = xs.map { x =>
        pool.submit(new java.util.concurrent.Callable[B] {
          def call(): B = f(x)
        })
      }
      try futs.map(_.get())
      catch {
        case e: java.util.concurrent.ExecutionException =>
          futs.foreach(_.cancel(true))
          throw Option(e.getCause).getOrElse(e)
      }
    } finally pool.shutdownNow() // interrupts stragglers on failure;
    // a no-op after success (every future already completed)
  }
}
