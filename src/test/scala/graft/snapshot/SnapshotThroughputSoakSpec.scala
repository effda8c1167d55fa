package graft.snapshot

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase
import graft.pgproto.Messages.RelationColumn
import graft.streaming.FakeWalsender

/** Snapshot-throughput soak — the local analogue of the reference's
  * SECOND headline benchmark (`benchmark/benchmark_initial/README.md:
  * 33-43`: 10 M rows bulk-loaded at ≈167 k rows/s on one instance):
  * ONE MILLION rows served as 125 chunked SELECTs over real sockets by
  * [[graft.streaming.FakeWalsender]] and read through
  * [[SnapshotReader.viaWire]] — Spark-partition-parallel wire
  * connections, every chunk pinned to the exported snapshot, text→typed
  * projection, no JDBC driver anywhere. Asserts:
  *
  *  - exactly-once at the row level: 1 M distinct ids, none lost, none
  *    duplicated (sum + count + distinct-count audit);
  *  - every chunk ran inside its own REPEATABLE READ + SET TRANSACTION
  *    SNAPSHOT pin (the consistency the reference's exported-snapshot
  *    workers guarantee);
  *  - a sustained-throughput floor of 80 k rows/s end-to-end (half the
  *    reference's single-instance figure; the real path additionally
  *    pays network + server-side scan cost this in-process fake
  *    doesn't).
  *
  * The measured rate is printed for SURVEY §6.
  */
class SnapshotThroughputSoakSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  private val Rows = 1000000L
  private val Chunk = 8000L // the reference's default chunk size

  private val cols = Seq(
    RelationColumn("id", 20L, -1, 1),   // int8
    RelationColumn("name", 25L, -1, 0)) // text

  private val Range = """id >= (-?\d+) AND id (<=|<) (-?\d+)""".r.unanchored

  private def serve(sql: String): Option[(Seq[String], Seq[Seq[Option[String]]])] =
    if (sql.startsWith("BEGIN ISOLATION LEVEL REPEATABLE READ")) Some((Seq("ok"), Seq.empty))
    else if (sql == "COMMIT") Some((Seq("ok"), Seq.empty))
    else sql match {
      case Range(lo, op, hi) =>
        val last = if (op == "<=") hi.toLong else hi.toLong - 1
        val rows = (math.max(1L, lo.toLong) to math.min(Rows, last)).map(i =>
          Seq(Some(i.toString), Some(s"user-$i")))
        Some((cols.map(_.name), rows))
      case _ => None
    }

  test("1M-row wire snapshot sustains >=80k rows/s, chunk-pinned, exactly-once") {
    val server = new FakeWalsender(Seq.empty, sqlResults = serve)
    try {
      val stats = ChunkPlanner.TableStats(
        rowCount = Rows, intPkColumn = Some("id"), pkMin = 1L, pkMax = Rows)
      def snapshot() = SnapshotReader.viaWire(
        spark, "localhost", server.port, "u", "db", None,
        "public", "firehose", cols,
        stats, SnapshotConfig(chunkSize = Chunk),
        exportedSnapshotId = Some("soak-snap-id"))
      // WARM-UP pass: JIT the decode/cast/codegen path first (BenchOne's
      // discipline) — a long-lived snapshot worker runs warm, and a cold
      // first pass measures the JIT compiler, not the pipe (measured:
      // ~116 k rows/s cold vs ~560 k warm on identical code)
      assert(snapshot().count() == Rows)
      // TIMED pass: pure pipe throughput end-to-end
      val t0 = System.nanoTime
      val n = snapshot().count()
      val elapsedSec = (System.nanoTime - t0) / 1e9
      val rate = n / elapsedSec
      assert(n == Rows, s"rows lost: $n of $Rows")
      // UNTIMED audit pass: exactly-once at the row level
      val audit = snapshot().selectExpr(
        "count(*) AS n", "count(DISTINCT id) AS nd", "sum(id) AS s").head()
      assert(audit.getLong(0) == Rows, s"rows lost: ${audit.getLong(0)} of $Rows")
      assert(audit.getLong(1) == Rows, s"duplicate ids: ${audit.getLong(1)} distinct")
      assert(audit.getLong(2) == Rows * (Rows + 1) / 2, "id sum diverges")

      val qs = server.queries.synchronized(server.queries.toVector)
      val selects = qs.count(_.startsWith("SELECT"))
      val pins = qs.count(s =>
        s.startsWith("BEGIN ISOLATION LEVEL REPEATABLE READ") &&
          s.contains("SET TRANSACTION SNAPSHOT 'soak-snap-id'"))
      val chunksPerPass = math.ceil(Rows.toDouble / Chunk).toInt
      assert(selects == 3 * chunksPerPass,
        s"expected 3 passes x $chunksPerPass chunked SELECTs, got $selects")
      assert(pins == selects,
        s"every chunk must run inside its own snapshot pin ($pins/$selects)")

      info(f"wire snapshot: $n%d rows in $elapsedSec%.1f s = " +
        f"$rate%.0f rows/s over $chunksPerPass chunks (warm)")
      assert(rate >= 80000,
        f"snapshot throughput floor: $rate%.0f rows/s < 80000 " +
          "(reference single-instance: 167k rows/s)")
    } finally server.close()
  }
}
