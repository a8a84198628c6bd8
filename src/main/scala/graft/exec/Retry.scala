package graft.exec

/** Transient-failure retry — reference `SmartBulkCopy.cs:33` (whitelist of
  * transient SQL error codes), `:450-607` (max-attempt loop with linearly
  * increasing delay `attempts * delay`, rollback + retry; non-transient
  * errors rethrow), defaults 5 attempts × 10 s
  * (`SmartBulkCopyConfig.cs:110-112`).
  *
  * In Spark, task-level retries are the scheduler's job
  * (`spark.task.maxFailures`); this wrapper covers *job-level* transient
  * failures (source momentarily unreadable, sink commit race) around whole
  * work items, preserving the reference's semantics: retries are safe
  * because every work item is an idempotent read → overwrite-or-append of
  * its own slice.
  */
object Retry {
  /** Exceptions considered transient — the analog of the reference's
    * 19-code whitelist. Anything else rethrows immediately.
    */
  def isTransient(e: Throwable): Boolean = e match {
    case _: java.io.IOException => true
    case e: RuntimeException =>
      val m = Option(e.getMessage).getOrElse("")
      m.contains("transient") || m.contains("Connection reset")
    case _ => false
  }

  final case class RetriesExhausted(attempts: Int, last: Throwable)
      extends RuntimeException(s"failed after $attempts attempts", last)

  def withRetry[T](maxAttempts: Int = 5, delayMs: Long = 0L)(body: => T): T = {
    var attempt = 0
    var lastErr: Throwable = null
    while (attempt < maxAttempts) {
      attempt += 1
      try return body
      catch {
        case e: Throwable if isTransient(e) =>
          lastErr = e
          // linearly increasing backoff: attempts * delay (SmartBulkCopy.cs:571-593)
          if (delayMs > 0 && attempt < maxAttempts) Thread.sleep(attempt * delayMs)
        case e: Throwable => throw e
      }
    }
    throw RetriesExhausted(maxAttempts, lastErr)
  }
}
