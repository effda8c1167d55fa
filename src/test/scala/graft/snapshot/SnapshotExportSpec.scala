package graft.snapshot

import org.scalatest.funsuite.AnyFunSuite

/** B2 export-transaction state machine over a fixture executor. */
class SnapshotExportSpec extends AnyFunSuite {

  test("begin opens a repeatable-read txn, exports, attach/release round-trip") {
    val issued = Seq.newBuilder[String]
    val exec: CatalogReader.SqlExecutor = { sql =>
      issued += sql
      if (sql.contains("pg_export_snapshot")) Seq(Seq("00000003-0000001B-1")) else Seq.empty
    }
    val ex = new SnapshotExport(exec)
    val id = ex.begin()
    assert(id == "00000003-0000001B-1")
    assert(ex.attachSql == "SET TRANSACTION SNAPSHOT '00000003-0000001B-1'")
    assert(intercept[IllegalArgumentException](ex.begin())
      .getMessage.contains("already open"), "double begin is loud")
    ex.release()
    assert(issued.result() == Seq(
      "BEGIN",
      "SET TRANSACTION ISOLATION LEVEL REPEATABLE READ",
      "SELECT pg_export_snapshot()",
      "COMMIT"))
    assert(intercept[IllegalArgumentException](ex.release())
      .getMessage.contains("no snapshot export"), "double release is loud")
  }

  test("setup problems map to actionable errors") {
    def failing(msg: String): CatalogReader.SqlExecutor = { sql =>
      if (sql.contains("pg_export_snapshot")) throw new RuntimeException(msg) else Seq.empty
    }
    val perm = intercept[IllegalStateException](
      new SnapshotExport(failing("ERROR: permission denied for function pg_export_snapshot")).begin())
    assert(perm.getMessage.contains("REPLICATION privilege"))
    val wal = intercept[IllegalStateException](
      new SnapshotExport(failing("ERROR: wal_level is not logical")).begin())
    assert(wal.getMessage.contains("wal_level='logical'"))
  }
}
