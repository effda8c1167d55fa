package graft.services

import org.scalatest.funsuite.AnyFunSuite
import graft.pgproto.Lsn
import graft.services.SlotManager.SlotInfo

/** T7 slot lifecycle + T8 heartbeat state machines over fixture executors —
  * the unit-testable halves of `pq/slot/slot.go` and
  * `pq/heartbeat/heartbeat.go` (no PostgreSQL in this environment).
  */
class ServicesSpec extends AnyFunSuite {

  private def slotRow(active: Boolean, confirmed: String = "0/1000"): Seq[String] =
    Seq("graft_slot", "logical", if (active) "t" else "f",
      if (active) "4242" else null, "0/800", confirmed, "reserved", "0/2000")

  test("slot create-if-missing: CREATE then re-introspect; existing slot reused") {
    val issued = Seq.newBuilder[String]
    var exists = false
    val exec: graft.snapshot.CatalogReader.SqlExecutor = { sql =>
      issued += sql
      if (sql.startsWith("CREATE_REPLICATION_SLOT")) { exists = true; Seq.empty }
      else if (exists) Seq(slotRow(active = false)) else Seq.empty
    }
    val m = new SlotManager(exec, "graft_slot")
    val created = m.create()
    assert(created.name == "graft_slot" && !created.active)
    assert(created.confirmedFlushLsn == Lsn.parse("0/1000"))
    assert(issued.result().count(_.startsWith("CREATE_REPLICATION_SLOT graft_slot LOGICAL pgoutput")) == 1)
    // second create: slot exists, no second CREATE
    m.create()
    assert(issued.result().count(_.startsWith("CREATE_REPLICATION_SLOT")) == 1)
  }

  test("create with createIfNotExists=false on a missing slot fails loudly") {
    val m = new SlotManager(_ => Seq.empty, "gone", createIfNotExists = false)
    val ex = intercept[IllegalStateException](m.create())
    assert(ex.getMessage.contains("does not exist"))
  }

  test("non-logical slot of the same name is a loud configuration error") {
    val m = new SlotManager(
      _ => Seq(Seq("graft_slot", "physical", "f", null, "0/800", "0/1000", "reserved", "0/2000")),
      "graft_slot")
    val ex = intercept[IllegalArgumentException](m.info())
    assert(ex.getMessage.contains("must be logical"))
  }

  test("capture polls while active, returns on release, fails after maxPolls") {
    // active, active, then released
    val states = Iterator(true, true, false)
    var sleeps = 0
    val m = new SlotManager(_ => Seq(slotRow(active = states.next())), "graft_slot")
    val info = m.capture(maxPolls = 10, sleep = () => sleeps += 1)
    assert(!info.active && sleeps == 2)

    val alwaysActive = new SlotManager(_ => Seq(slotRow(active = true)), "graft_slot")
    val ex = intercept[IllegalStateException](
      alwaysActive.capture(maxPolls = 3, sleep = () => ()))
    assert(ex.getMessage.contains("still active after 3 polls"))
  }

  test("slot metrics derive retained WAL and lag from LSNs") {
    val m = new SlotManager(_ => Seq(slotRow(active = true)), "graft_slot")
    val Some(met) = m.metricsPoll()
    assert(met.retainedWal == Lsn.parse("0/2000") - Lsn.parse("0/800"))
    assert(met.lag == Lsn.parse("0/2000") - Lsn.parse("0/1000"))
    assert(met.active)
  }

  test("heartbeat ensureTable: creates only when missing, always seeds the row") {
    val issued = Seq.newBuilder[String]
    var exists = false
    val exec: graft.snapshot.CatalogReader.SqlExecutor = { sql =>
      issued += sql
      if (sql.contains("information_schema.tables")) Seq(Seq(if (exists) "t" else "f"))
      else { if (sql.startsWith("CREATE TABLE")) exists = true; Seq.empty }
    }
    val h = new HeartbeatService(exec, "public", "cdc_heartbeat")
    h.ensureTable()
    h.ensureTable()
    val sqls = issued.result()
    assert(sqls.count(_.startsWith("CREATE TABLE")) == 1, "second ensure must not re-create")
    assert(sqls.count(_.contains("ON CONFLICT DO NOTHING")) == 2, "row seed is idempotent, runs every ensure")
    assert(sqls.exists(_.contains("CHECK (id = 1)")), "single-row constraint")
  }

  test("heartbeat beat updates; vanished row is re-seeded; loop survives errors") {
    var rowPresent = true
    var inserts = 0
    val exec: graft.snapshot.CatalogReader.SqlExecutor = { sql =>
      if (sql.startsWith("UPDATE")) {
        if (rowPresent) Seq(Seq("1")) else Seq.empty
      } else if (sql.contains("ON CONFLICT")) { inserts += 1; rowPresent = true; Seq.empty }
      else Seq.empty
    }
    val h = new HeartbeatService(exec)
    assert(h.runOnce())
    rowPresent = false
    assert(!h.runOnce(), "vanished row returns false and re-seeds")
    assert(inserts == 1 && rowPresent)

    // loop: a throwing tick is counted, not fatal
    var n = 0
    val flaky: graft.snapshot.CatalogReader.SqlExecutor = { sql =>
      n += 1
      if (n == 2) throw new RuntimeException("transient")
      if (sql.startsWith("UPDATE")) Seq(Seq("1")) else Seq.empty
    }
    val failures = new HeartbeatService(flaky).run(ticks = 3, sleep = () => ())
    assert(failures == 1)
  }

  test("heartbeat identifier quoting handles reserved words and quotes") {
    assert(HeartbeatService.quoteIdent("table") == "\"table\"")
    assert(HeartbeatService.quoteIdent("we\"ird") == "\"we\"\"ird\"")
    assert(HeartbeatService.updateSql("public", "cdc_heartbeat")
      .startsWith("UPDATE \"public\".\"cdc_heartbeat\" SET last_heartbeat = NOW()"))
  }

  test("slot info decodes NULL confirmed_flush_lsn as Zero (unreserved slot)") {
    val m = new SlotManager(
      _ => Seq(Seq("s", "logical", "f", null, "0/800", null, "", "0/2000")), "s")
    val Some(i: SlotInfo) = m.info()
    assert(i.confirmedFlushLsn == Lsn.Zero)
  }
}
