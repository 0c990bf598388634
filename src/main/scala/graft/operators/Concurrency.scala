package graft.operators

/** Driver-side fan-out for INDEPENDENT eager stages (collect-backed model
  * training, audit legs): Spark's scheduler is thread-safe and local[n] /
  * a cluster both have far more capacity than one driver thread can keep
  * busy with small sequential jobs, so stages with no data dependency
  * should submit concurrently. Results return positionally — callers see
  * exactly the sequential semantics, just overlapped.
  *
  * Deliberately a bounded fresh pool per call (not the global EC): callers
  * fan out a handful of stages, and a shared pool would let one caller's
  * blocking collects starve another's (pqTrain inside a parallelized q190
  * leg nests two levels of fan-out).
  */
object Concurrency {

  def inParallel[T](thunks: Seq[() => T]): Seq[T] = {
    if (thunks.sizeIs <= 1) return thunks.map(_())
    val pool = java.util.concurrent.Executors.newFixedThreadPool(thunks.size)
    try {
      val futures = thunks.map(t => pool.submit(new java.util.concurrent.Callable[T] {
        def call(): T = t()
      }))
      // get() rethrows the task's exception (wrapped) — unwrap so callers
      // see the same failure they would have seen sequentially.
      futures.map { f =>
        try f.get()
        catch { case e: java.util.concurrent.ExecutionException => throw e.getCause }
      }
    } finally pool.shutdownNow()
  }
}
