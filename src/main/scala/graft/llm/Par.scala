package graft.llm

/** Overlap INDEPENDENT Spark jobs from driver threads (optimization
  * guide §2.6): Spark's scheduler happily runs several jobs at once
  * inside one application — index builds that write k independent
  * slices of one persisted aggregate pay k sequential rounds of job
  * scheduling + file-commit latency when the driver submits them one
  * by one, and the cluster idles through each job's tail. Submitting
  * them from a small pool lets the next slice's tasks back-fill
  * executors freed by the previous slice's stragglers; at local-mode
  * bench scale it additionally overlaps the per-write commit protocol
  * (rename storms of bucket-partitioned directories).
  *
  * Results keep their input order; the first failure rethrows (after
  * all tasks settle, so no write is abandoned mid-flight). Job
  * descriptions are thread-local in Spark, so each task may label its
  * own jobs. Callers must pass independent tasks: same-directory
  * writers would violate the single-writer contract of [[GenDir]]. */
private[graft] object Par {

  def run[T](tasks: Seq[() => T], parallelism: Int = 8): Seq[T] = {
    if (tasks.isEmpty) return Seq.empty
    if (tasks.size == 1) return Seq(tasks.head())
    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      math.min(parallelism, tasks.size))
    try {
      val futures = tasks.map { t =>
        pool.submit(new java.util.concurrent.Callable[T] {
          override def call(): T = t()
        })
      }
      // collect every outcome before rethrowing, so a failed slice
      // never leaves a sibling write running into a torn-down caller
      val outcomes = futures.map { f =>
        try Right(f.get())
        catch {
          case e: java.util.concurrent.ExecutionException =>
            Left(Option(e.getCause).getOrElse(e))
          case e: Throwable => Left(e)
        }
      }
      outcomes.collectFirst { case Left(e) => throw e }
      outcomes.collect { case Right(v) => v }
    } finally pool.shutdown()
  }
}
