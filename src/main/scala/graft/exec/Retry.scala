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
  /** SQL vendor error codes considered transient — the reference's
    * whitelist (`SmartBulkCopy.cs:33`): connection severed (53, 64, 121,
    * 10054, 10051), DNS/net (11001, 10065, 10060), login timeout (258),
    * backup lock (4891), db unavailable (4060), and the Azure SQL
    * throttling/failover family (40197, 40501, 40613, 49918-49920).
    * Matched against `SQLException.getErrorCode`. The reference also
    * lists 0 (SqlClient's "connection severed"), deliberately DROPPED
    * here: JDBC's `getErrorCode` defaults to 0 when the driver sets no
    * vendor code, so keeping it would retry every unclassified error —
    * connection-severed cases are covered by SQLState class 08 instead.
    */
  private val transientVendorCodes: Set[Int] = Set(
    53, 64, 121, 258, 4891, 10054, 4060, 40197, 40501, 40613,
    49918, 49919, 49920, 11001, 10065, 10060, 10051)

  /** SQLState class prefixes considered transient: 08 (connection
    * exception), 40 (transaction rollback — deadlock/serialization), 57
    * (operator intervention — shutdown/cancel), 53 (insufficient
    * resources). These are the standards-level analog of the vendor list
    * above, so non-SQL-Server JDBC drivers classify correctly too.
    */
  private val transientSqlStateClasses = Seq("08", "40", "53", "57")

  /** Exceptions considered transient — the JDBC-faithful analog of the
    * reference's whitelist (`SmartBulkCopy.cs:33`, checked at `:583` and
    * `:745`). Wrapper exceptions (Spark job/write failures) are unwrapped
    * via the cause chain before classifying. Anything else rethrows
    * immediately.
    */
  def isTransient(e: Throwable): Boolean = {
    // walk BOTH linkage kinds: getCause (wrapper exceptions) and, for
    // SQLException, getNextException — JDBC batch failures
    // (BatchUpdateException) chain the real error there, not in the cause
    val seen = scala.collection.mutable.Set.empty[Throwable]
    val queue = scala.collection.mutable.Queue[Throwable](e)
    val chain = scala.collection.mutable.ArrayBuffer.empty[Throwable]
    while (queue.nonEmpty) {
      val cur = queue.dequeue()
      if (cur != null && seen.add(cur)) {
        chain += cur
        queue.enqueue(cur.getCause)
        cur match {
          case s: java.sql.SQLException => queue.enqueue(s.getNextException)
          case _ => ()
        }
      }
    }
    // An EXPLICITLY transient SQL classification anywhere in the chain
    // wins outright: JDBC drivers report severed connections as
    // SQLState-08 / whitelisted-vendor-code exceptions WRAPPING an
    // EOFException (MySQL's CommunicationsException is exactly
    // 'Can not read response' caused by EOFException), and letting the
    // file-error carve-out below dominate would fail-fast the precise
    // connection-severed family the whitelist exists to retry.
    if (chain.exists(isTransientSql)) true
    // Then PERMANENT roots dominate — ALL of them, not just FNF/EOF:
    // Hadoop/Parquet writers routinely wrap a disk-full / AccessDenied /
    // NoSuchFile root in a generic IOException ("error committing
    // file"), and letting the wrapper's default-transient verdict win
    // via chain.exists below would retry maxAttempts full jobs against
    // a disk that never empties or a path that never appears — exactly
    // the burn these carve-outs exist to prevent.
    else if (chain.exists(isPermanentRoot)) false
    else chain.exists(isTransientRoot)
  }

  /** Error classes that never heal by retrying, wherever they sit in
    * the cause chain: missing/truncated files, unwritable or colliding
    * local paths, and disk-full (a bare IOException with a stable
    * message). The one definition both the fail-fast domination above
    * and the per-root classification below consult. */
  private def isPermanentRoot(e: Throwable): Boolean = e match {
    case _: java.io.FileNotFoundException            => true
    case _: java.io.EOFException                     => true
    case _: java.nio.file.AccessDeniedException      => true
    case _: java.nio.file.NoSuchFileException        => true
    case _: java.nio.file.FileAlreadyExistsException => true
    case e: java.io.IOException =>
      Option(e.getMessage).getOrElse("")
        .toLowerCase(java.util.Locale.ROOT).contains("no space left")
    case _ => false
  }

  /** The SQL layer's own "retry may succeed" verdicts — authoritative
    * over file-level carve-outs (see isTransient's ordering). */
  private def isTransientSql(e: Throwable): Boolean = e match {
    case _: java.sql.SQLTransientException   => true
    case _: java.sql.SQLRecoverableException => true
    case e: java.sql.SQLException =>
      val state = Option(e.getSQLState).getOrElse("")
      transientSqlStateClasses.exists(state.startsWith) ||
        transientVendorCodes.contains(e.getErrorCode)
    case _ => false
  }

  private def isTransientRoot(e: Throwable): Boolean = e match {
    // JDBC's own classification: driver says "retry may succeed"
    case s: java.sql.SQLException => isTransientSql(s)
    // permanent roots (files, local paths, disk-full) never heal —
    // the shared isPermanentRoot definition, which the chain-level
    // domination in isTransient also applies to WRAPPED roots
    case e if isPermanentRoot(e) => false
    case _: java.io.IOException  => true // generic IO: retry may succeed
    case e: RuntimeException =>
      // last-resort message heuristic (case-insensitive — a capitalized
      // "Transient network error" must not slip past); typed and
      // SQLState classification above always wins where available.
      // "transient" must not be matched inside its own NEGATION — a
      // message saying "non-transient"/"not transient" declares the
      // retry useless in so many words
      val m = Option(e.getMessage).getOrElse("").toLowerCase(java.util.Locale.ROOT)
      val negated = m.contains("non-transient") || m.contains("nontransient") ||
        m.contains("not transient")
      (m.contains("transient") && !negated) || m.contains("connection reset")
    case _ => false
  }

  final case class RetriesExhausted(attempts: Int, last: Throwable)
      extends RuntimeException(s"failed after $attempts attempts", last)

  def withRetry[T](maxAttempts: Int = 5, delayMs: Long = 0L)(body: => T): T = {
    // maxAttempts <= 0 would skip the body entirely and throw
    // RetriesExhausted(0, null) — a silently-skipped copy with a
    // misleading null-cause error; "no retries" is maxAttempts = 1
    require(maxAttempts >= 1, s"maxAttempts must be >= 1, got $maxAttempts")
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
