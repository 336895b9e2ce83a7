package graft.core

/** Driver-side overlap of INDEPENDENT Spark actions.
  *
  * Several declared measurement faces (LSH tuning/recall sweeps, the
  * trained-dedup validation face) are a handful of independent counts
  * submitted sequentially from the driver; each action's tail leaves most
  * of the cluster idle while the next one waits its turn. Spark's
  * scheduler happily runs several jobs at once inside one application —
  * actions are only sequential because driver code calls them
  * sequentially — so submitting independent actions from a small thread
  * pool lets the next job's tasks back-fill executors freed by the
  * current job's tail (FIFO scheduling gives exactly the back-fill
  * behaviour wanted). This changes WHEN work is scheduled, never what any
  * query computes: callers get results in input order.
  *
  * Threads are created at submit time on the calling thread, so they
  * inherit the caller's inheritable thread-locals — in particular the
  * bench harness's job group, which keeps per-dim cancellation working
  * across the overlapped jobs.
  */
object Par {

  /** Run the tasks concurrently (one thread each — callers pass a handful
    * of coarse actions, never a per-row fan-out) and return their results
    * in input order. Any task failure propagates its ORIGINAL exception
    * after the remaining tasks are cancelled.
    */
  def tasks[A](ts: Seq[() => A]): Seq[A] = {
    if (ts.lengthCompare(2) < 0) ts.map(_())
    else {
      val pool = java.util.concurrent.Executors.newFixedThreadPool(ts.size)
      try {
        val futs = ts.map { t =>
          pool.submit(new java.util.concurrent.Callable[A] {
            override def call(): A = t()
          })
        }
        futs.map { f =>
          try f.get()
          catch {
            case e: java.util.concurrent.ExecutionException =>
              futs.foreach(_.cancel(true))
              throw e.getCause
          }
        }
      } finally pool.shutdownNow()
    }
  }
}
