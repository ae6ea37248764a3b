package graft.util

/** Bounded-parallel driver-side map over IO-bound per-item work (parquet
  * footer reads, sidecar loads, per-directory driver writes) — the ONE
  * pool harness shared by [[graft.sinks.SnapshotLake]]'s metadata walks
  * and the driver-side grouped parquet writes, so the threshold, pool
  * sizing, and exception unwrapping cannot drift between them. Results
  * return in input order, deterministically. Small lists skip the pool
  * (thread spin-up would dominate). Failures propagate with their
  * ORIGINAL exception (un-wrapped from the executor) so callers'
  * fallback semantics are unchanged.
  */
object Par {
  def map[A, B](items: Seq[A], maxThreads: Int = 64)(f: A => B): Seq[B] =
    if (items.lengthCompare(8) < 0) items.map(f)
    else {
      val pool = java.util.concurrent.Executors.newFixedThreadPool(
        math.min(maxThreads, items.size))
      try {
        val futs = items.map { it =>
          pool.submit(new java.util.concurrent.Callable[B] {
            override def call(): B = f(it)
          })
        }
        futs.map { fu =>
          try fu.get()
          catch {
            case e: java.util.concurrent.ExecutionException =>
              throw e.getCause match {
                case c: Exception => c
                case _ => e
              }
          }
        }
      } finally pool.shutdownNow()
    }
}
