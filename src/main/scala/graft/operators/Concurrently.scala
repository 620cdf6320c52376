package graft.operators

/** Shared runner for INDEPENDENT side-effecting Spark actions (staging
  * writes under one atomic commit, disjoint store appends): submit on a
  * fresh pool sized to the task count, await all, and on any failure
  * cancel the siblings and DRAIN the pool before rethrowing — so no
  * write is still in flight against the caller's directories when the
  * error propagates (a streaming retry of the batch must never race a
  * half-dead predecessor). The ORIGINAL cause is rethrown, not the
  * pool's ExecutionException wrapper, so callers and retry logic keep
  * seeing the same exception types the old sequential writes threw.
  *
  * Used by the concurrent-staging call sites (RollupIngest snapshot
  * writes, PreferenceStore state+ledger, CorpusIngest band+signature
  * appends) — one error path instead of three drifting copies. */
private[graft] object Concurrently {

  def run(tasks: Seq[() => Unit]): Unit = {
    if (tasks.isEmpty) return
    if (tasks.sizeIs == 1) { tasks.head.apply(); return }
    val pool = java.util.concurrent.Executors.newFixedThreadPool(tasks.size)
    try {
      val futures = tasks.map { t =>
        pool.submit(new java.util.concurrent.Callable[Unit] {
          def call(): Unit = t()
        })
      }
      try futures.foreach(_.get())
      catch { case t: Throwable =>
        futures.foreach(_.cancel(true))
        pool.shutdown()
        pool.awaitTermination(10, java.util.concurrent.TimeUnit.MINUTES)
        throw (t match {
          case e: java.util.concurrent.ExecutionException
            if e.getCause != null => e.getCause
          case other => other
        })
      }
    } finally pool.shutdown()
  }
}
