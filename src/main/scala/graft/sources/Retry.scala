package graft.sources

/** S4 — retry-with-backoff on transient source errors (reference
  * dump-es-parquet:186-194,219-232,296-299,342-350 wraps every network
  * call in an unbounded `while True / except TransportError: sleep(10)`
  * loop — the tool is designed to outlast cluster flaps).
  *
  * In Spark this seam belongs INSIDE the partition reader (a task retried
  * by the scheduler restarts the whole scan; an in-reader retry resumes
  * the scroll), with `spark.task.maxFailures` as the outer layer. The
  * bounded default keeps tests sane; pass `attempts = Int.MaxValue` for
  * the reference's semantics.
  */
object Retry {

  val ReferenceBackoffMs: Long = 10000L // reference :191,229,298,347

  def withBackoff[T](
      attempts: Int = 5,
      backoffMs: Long = ReferenceBackoffMs,
      isTransient: Throwable => Boolean = _ => true,
      sleep: Long => Unit = Thread.sleep,
      onRetry: (Int, Throwable) => Unit = (_, _) => ())(op: => T): T = {
    require(attempts >= 1, "at least one attempt")
    var remaining = attempts
    while (true) {
      try return op
      catch {
        case e: Throwable if remaining > 1 && isTransient(e) =>
          remaining -= 1
          onRetry(remaining, e)
          sleep(backoffMs)
      }
    }
    throw new IllegalStateException("unreachable")
  }
}
