package graft.ops

/** Concurrent driver-side job submission (optimization guide §2.6:
  * "overlap independent jobs" — Spark's scheduler happily runs several
  * jobs at once inside one application; actions are only sequential
  * because driver code calls them sequentially). Composite operators
  * use this to materialize INDEPENDENT legs (audit legs, per-store
  * survivor frames, the before/after closures of a re-election delta)
  * concurrently instead of paying one tiny-job tail after another.
  *
  * Scope rules, enforced by the callsites:
  *   - only lease-free work runs off the caller thread ([[Lease]] holds
  *     are thread-local, so store PUBLISHES stay on the holder thread —
  *     a worker-thread publish would silently bypass the usurpation
  *     fence);
  *   - every thunk is deterministic and side-effect-free apart from
  *     Spark job submission, so concurrency cannot reorder results
  *     (results return in thunk order).
  */
object Par {

  /** Runs the thunks concurrently on a short-lived pool and returns
    * their results IN ORDER; the first failure is rethrown (after all
    * threads settle) with its original type, matching the sequential
    * form's error behavior.
    */
  def all[T](thunks: Seq[() => T]): Seq[T] =
    if (thunks.lengthCompare(1) <= 0) thunks.map(_())
    else {
      val pool = java.util.concurrent.Executors.newFixedThreadPool(thunks.size)
      try {
        val futs = thunks.map { t =>
          pool.submit(new java.util.concurrent.Callable[T] {
            def call(): T = t()
          })
        }
        futs.map { f =>
          try f.get()
          catch { // unwrap so callers observe the sequential form's exception
            case e: java.util.concurrent.ExecutionException =>
              throw e.getCause
          }
        }
      } finally pool.shutdownNow()
    }

  /** Starts one thunk on its own thread; [[Handle.get]] joins it. For
    * overlapping a single independent computation with caller-thread
    * work (e.g. the re-election delta with the store publishes).
    */
  def start[T](thunk: () => T): Handle[T] = {
    val pool = java.util.concurrent.Executors.newSingleThreadExecutor()
    val fut = pool.submit(new java.util.concurrent.Callable[T] {
      def call(): T = thunk()
    })
    new Handle[T](fut, pool)
  }

  final class Handle[T](fut: java.util.concurrent.Future[T],
      pool: java.util.concurrent.ExecutorService) {
    def get(): T =
      try fut.get()
      catch {
        case e: java.util.concurrent.ExecutionException => throw e.getCause
      } finally pool.shutdownNow()
  }
}
