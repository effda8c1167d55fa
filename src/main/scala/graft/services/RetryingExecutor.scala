package graft.services

import java.sql.SQLException
import graft.snapshot.CatalogReader

/** Transient-failure retry policy for the shared SQL seam — every service
  * (SlotManager, HeartbeatService, CatalogReader, SnapshotOrchestrator,
  * Publication, SnapshotExport) can wrap its [[CatalogReader.SqlExecutor]]
  * so one flaky connection doesn't fail the job.
  *
  * The transient/non-transient split mirrors the reference's classifier
  * (`pq/snapshot/helpers.go:110-178`, `pq/cdc/connector.go:446-487`):
  * serialization failures, deadlocks, lock/object contention, server
  * restarts, and I/O errors retry with exponential backoff; everything else
  * (syntax errors, permission, constraint violations) fails fast — retrying
  * those only hides bugs.
  */
object RetryingExecutor {

  /** SQLSTATEs worth retrying (reference list, `helpers.go:110-178`):
    * 40001 serialization_failure, 40P01 deadlock_detected,
    * 55006 object_in_use, 55P03 lock_not_available,
    * 57P03 cannot_connect_now, 58000 system_error, 58030 io_error.
    * Class 08 (connection exception) is matched by prefix below.
    */
  val TransientStates: Set[String] =
    Set("40001", "40P01", "55006", "55P03", "57P03", "58000", "58030")

  /** Walk the cause chain for a [[SQLException]] with a transient SQLSTATE
    * (or any class-08 connection failure). A non-SQL exception is treated as
    * non-transient — an unknown failure should surface, not loop.
    */
  @annotation.tailrec
  def isTransient(t: Throwable): Boolean = t match {
    case sql: SQLException =>
      val state = Option(sql.getSQLState).getOrElse("")
      TransientStates.contains(state) || state.startsWith("08") ||
        (sql.getCause != null && sql.getCause != sql && isTransient(sql.getCause))
    case other if other != null && other.getCause != null && other.getCause != other =>
      isTransient(other.getCause)
    case _ => false
  }

  /** Exponential backoff: attempt n (1-based) sleeps
    * min(initial * multiplier^(n-1), max) before retrying — the reference's
    * shape (`connector.go:446-487` doubles up to a cap).
    */
  final case class Policy(
      maxAttempts: Int = 5,
      initialBackoffMillis: Long = 100L,
      maxBackoffMillis: Long = 5000L,
      multiplier: Double = 2.0) {
    require(maxAttempts >= 1, "maxAttempts must be >= 1")
    def backoffFor(attempt: Int): Long =
      math.min(
        maxBackoffMillis,
        (initialBackoffMillis * math.pow(multiplier, (attempt - 1).toDouble)).toLong)
  }

  /** Wrap an executor with the retry policy. `sleep` is injectable so specs
    * run on a fake clock; `onRetry` surfaces attempts to logging/metrics.
    */
  def wrap(
      exec: CatalogReader.SqlExecutor,
      policy: Policy = Policy(),
      sleep: Long => Unit = Thread.sleep,
      onRetry: (Int, Throwable) => Unit = (_, _) => ()): CatalogReader.SqlExecutor = { sql =>
    var attempt = 1
    var result: Seq[Seq[String]] = null
    var done = false
    while (!done) {
      try {
        result = exec(sql)
        done = true
      } catch {
        case t: Throwable if isTransient(t) && attempt < policy.maxAttempts =>
          onRetry(attempt, t)
          sleep(policy.backoffFor(attempt))
          attempt += 1
      }
    }
    result
  }
}
