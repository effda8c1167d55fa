package graft.pgproto

/** PostgreSQL wire timestamps are microseconds since 2000-01-01 00:00:00 UTC
  * (the "Y2K epoch"), not the Unix epoch. Conversion mirrors the reference's
  * `pq/message/format/time.go:5-10` and `pq/replication/wal.go:36-38`.
  */
object PgEpoch {
  /** Offset between the PostgreSQL epoch (2000-01-01) and Unix epoch, µs. */
  val UnixOffsetMicros: Long = 946684800000000L

  /** pg wire micros → Unix micros (Catalyst TimestampType's physical unit). */
  def toUnixMicros(pgMicros: Long): Long = pgMicros + UnixOffsetMicros

  /** Unix micros → pg wire micros (for standby status updates we send). */
  def fromUnixMicros(unixMicros: Long): Long = unixMicros - UnixOffsetMicros
}
