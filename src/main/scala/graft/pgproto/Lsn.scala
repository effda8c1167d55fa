package graft.pgproto

/** PostgreSQL Log Sequence Number — a 64-bit position in the WAL.
  *
  * The reference models this as `type LSN uint64` with `%X/%X` string form
  * (go-pq-cdc `pq/lsn.go:9-23`). The LSN is the total order over the change
  * stream and the unit of progress acknowledgement; in the Spark rebuild it
  * is also the Structured Streaming offset.
  */
object Lsn {
  val Zero: Long = 0L

  /** Render as PostgreSQL's canonical `%X/%X` (hi32/lo32 hex) form. */
  def format(lsn: Long): String =
    f"${(lsn >>> 32).toInt & 0xffffffffL}%X/${lsn.toInt & 0xffffffffL}%X"

  /** Parse the `%X/%X` form. Mirrors ParseLSN (`pq/lsn.go:15-23`). */
  def parse(s: String): Long = {
    val idx = s.indexOf('/')
    require(idx > 0 && idx < s.length - 1, s"malformed LSN: $s")
    val hi = java.lang.Long.parseLong(s.substring(0, idx), 16)
    val lo = java.lang.Long.parseLong(s.substring(idx + 1), 16)
    (hi << 32) | (lo & 0xffffffffL)
  }

  /** Unsigned comparison — LSNs are uint64 in the protocol. */
  def compare(a: Long, b: Long): Int = java.lang.Long.compareUnsigned(a, b)
}
