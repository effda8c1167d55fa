package graft.snapshot

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestBase
import graft.services.SlotManager
import graft.snapshot.SnapshotOrchestrator._

/** B6 lifecycle events + B8 resume/resnapshot flags + the B7 prepare/complete
  * handoff, against the in-memory job store and a fixture slot.
  */
class SnapshotOrchestratorSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  private def store() = new SnapshotJobStore.InMemory

  test("mode flags drive snapshot/stream decisions (B8)") {
    val st = store()
    assert(!shouldTakeSnapshot(SnapshotConfig(mode = "never"), st, "s1"))
    assert(shouldStream(SnapshotConfig(mode = "never")))

    assert(shouldTakeSnapshot(SnapshotConfig(mode = "initial"), st, "s1"), "no job yet → snapshot")

    st.save(SnapshotJob("s1", "snap-1", 100L, completed = true))
    assert(!shouldTakeSnapshot(SnapshotConfig(mode = "initial"), st, "s1"), "completed job → skip")

    // snapshot_only resumes: completed job under its key → skip (reference
    // shouldTakeSnapshotOnly); fresh key → take; resnapshot → wipe + take.
    assert(!shouldTakeSnapshot(SnapshotConfig(mode = "snapshot_only"), st, "s1"),
      "snapshot_only with a completed job must not redo the work")
    assert(shouldTakeSnapshot(SnapshotConfig(mode = "snapshot_only"), st, "fresh_key"))
    assert(shouldTakeSnapshot(
      SnapshotConfig(mode = "snapshot_only", resnapshot = true), st, "s1"))
    assert(st.load("s1").isEmpty, "resnapshot wiped the snapshot-only job")
    assert(!shouldStream(SnapshotConfig(mode = "snapshot_only")), "snapshot_only never streams")
  }

  test("resnapshot wipes this slot's metadata and retakes (B8)") {
    val st = store()
    st.save(SnapshotJob("s1", "snap-1", 100L, completed = true))
    st.save(SnapshotJob("other", "snap-9", 900L, completed = true))
    assert(shouldTakeSnapshot(SnapshotConfig(mode = "initial", resnapshot = true), st, "s1"))
    assert(st.load("s1").isEmpty, "s1 metadata wiped")
    assert(st.load("other").isDefined, "other slots untouched")
  }

  test("incomplete job (mid-snapshot crash) is wiped, not resumed") {
    val st = store()
    st.save(SnapshotJob("s1", "snap-1", 100L, completed = false))
    assert(shouldTakeSnapshot(SnapshotConfig(mode = "initial"), st, "s1"),
      "stale LSN would duplicate data — restart from scratch")
    assert(st.load("s1").isEmpty)
  }

  test("prepare → complete → streamStartLsn carries the CREATE's consistent point (B7)") {
    val st = store()
    // Fixture: slot absent on status query; CREATE returns the
    // (slot_name, consistent_point, snapshot_name, output_plugin) row.
    var created = false
    val slots = new SlotManager({ sql =>
      if (sql.startsWith("CREATE_REPLICATION_SLOT")) {
        created = true
        Seq(Seq("s1", "0/AB00", "00000003-0000001B-1", "pgoutput"))
      } else if (created)
        Seq(Seq("s1", "logical", "f", null, "0/800", "0/AB00", "reserved", "0/F000"))
      else Seq.empty
    }, "s1")
    // createFresh runs before any CREATE: status is empty, then CREATE's row
    // supplies the consistent point AND the exported snapshot name.
    created = false
    val job = prepare(slots, st, "s1")
    val lsn = graft.pgproto.Lsn.parse("0/AB00")
    assert(job.snapshotLsn == lsn)
    assert(job.snapshotId == "00000003-0000001B-1",
      "the snapshot exported BY slot creation is the one the load must read under")
    assert(st.load("s1").exists(j => !j.completed && j.snapshotLsn == lsn))

    // Stream must refuse to start before the snapshot completes.
    val early = intercept[IllegalStateException](streamStartLsn(st, "s1"))
    assert(early.getMessage.contains("not completed"))

    complete(st, "s1")
    assert(streamStartLsn(st, "s1") == lsn)
    assert(intercept[IllegalStateException](streamStartLsn(st, "missing"))
      .getMessage.contains("no snapshot job"))

    // A pre-existing slot cannot be consistent with a new snapshot: loud.
    val existing = new SlotManager(
      _ => Seq(Seq("s1", "logical", "t", "99", "0/800", "0/900", "reserved", "0/F000")), "s1")
    assert(intercept[IllegalStateException](prepare(existing, st, "s1"))
      .getMessage.contains("already exists"))
  }

  test("lifecycle markers wrap the data frame (B6)") {
    val data = spark.read.parquet("/root/testdata/sf0.001/region.parquet")
    val out = withLifecycle(spark, data, "region", snapshotLsn = 4096L, totalRows = 5L)
    val byEvent = out.groupBy("snapshot_event").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byEvent == Map("BEGIN" -> 1L, "DATA" -> 5L, "END" -> 1L))
    val end = out.filter(col("snapshot_event") === "END").head()
    assert(end.getAs[Long]("snapshot_lsn") == 4096L)
    assert(end.getAs[Long]("total_rows") == 5L)
    assert(end.isNullAt(end.fieldIndex("r_name")), "marker rows carry no data columns")
    val dataRows = out.filter(col("snapshot_event") === "DATA")
    assert(dataRows.select(col("r_regionkey").cast("long")).collect()
      .map(_.getLong(0)).sorted.toSeq == (0L to 4L))
  }

  test("sql job store issues reference-shaped statements") {
    val issued = Seq.newBuilder[String]
    var row: Option[Seq[String]] = None
    val exec: CatalogReader.SqlExecutor = { sql =>
      issued += sql
      if (sql.startsWith("SELECT")) row.toSeq else Seq.empty
    }
    val st = new SnapshotJobStore.Sql(exec)
    st.save(SnapshotJob("s1", "snap-1", 0xAB00L, completed = false))
    row = Some(Seq("s1", "snap-1", "0/AB00", "f"))
    assert(st.load("s1").contains(SnapshotJob("s1", "snap-1", 0xAB00L, completed = false)))
    st.markCompleted("s1")
    st.cleanup("s1")
    val sqls = issued.result()
    // statement-position table names are identifier-quoted (reserved
    // words / mixed case must not break DML)
    assert(sqls.exists(s => s.startsWith("INSERT INTO \"cdc_snapshot_job\"") && s.contains("'0/AB00'")))
    assert(sqls.exists(_.startsWith("UPDATE \"cdc_snapshot_job\" SET completed = true")))
    assert(sqls.exists(_.startsWith("DELETE FROM \"cdc_snapshot_job\"")))
  }

  test("Sql store ensureSchema: creates when missing, defaults reference-era NOT-NULL columns") {
    val issued = Seq.newBuilder[String]
    var cols: Seq[Seq[String]] = Seq.empty
    val exec: CatalogReader.SqlExecutor = { sql =>
      issued += sql
      if (sql.contains("pg_attribute")) cols else Seq.empty
    }
    val st = new SnapshotJobStore.Sql(exec)
    // missing table → minimal CREATE; introspection must resolve through
    // to_regclass (search_path-exact — the relation the unqualified DML
    // hits), not a schema-blind information_schema table_name match
    st.ensureSchema()
    val sqls1 = issued.result()
    assert(sqls1.exists(_.contains("to_regclass('\"cdc_snapshot_job\"')")),
      s"introspection resolves via to_regclass on the QUOTED form: $sqls1")
    // domains must arrive resolved to their BASE type (a domain over
    // text gets the text default — DROP NOT NULL would not satisfy a
    // NOT-NULL domain at insert time)
    assert(sqls1.exists(s => s.contains("typtype") && s.contains("typbasetype")),
      s"introspection resolves domains to base types: $sqls1")
    assert(sqls1.exists(_.startsWith("CREATE TABLE \"cdc_snapshot_job\"")))
    // reference-era table: NOT-NULL default-less columns get TYPE-
    // APPROPRIATE defaults (a catch-all '' fails the ALTER itself on
    // uuid/date/jsonb); core and already-defaulted columns stay untouched
    issued.clear()
    cols = Seq(
      Seq("slot_name", "NO", null, "text"),
      Seq("snapshot_id", "NO", null, "text"),
      Seq("snapshot_lsn", "NO", null, "text"),
      Seq("completed", "YES", "false", "boolean"),
      Seq("started_at", "NO", null, "timestamp without time zone"),
      Seq("claim_id", "NO", null, "uuid"),
      Seq("progress_doc", "NO", null, "jsonb"),
      Seq("started_on", "NO", null, "date"),
      Seq("retry_window", "NO", null, "interval(3)"),
      Seq("pod_label", "NO", null, "character varying(64)"),
      Seq("shard_tags", "NO", null, "text[]"),
      Seq("total_chunks", "NO", "0", "integer"),
      Seq("claimed_by", "YES", null, "text"))
    st.ensureSchema()
    val sqls2 = issued.result()
    def altered(c: String, d: String) = sqls2.contains(
      s"""ALTER TABLE "cdc_snapshot_job" ALTER COLUMN "$c" SET DEFAULT $d""")
    assert(altered("started_at", "now()"), s"timestamp default: $sqls2")
    // uuid gets the pre-13 unique idiom: gen_random_uuid() needs PG 13+
    // or pgcrypto (a failing ALTER aborts the migration mid-way), and a
    // constant literal would collide on a UNIQUE era column
    assert(altered("claim_id",
      "md5(random()::text || clock_timestamp()::text)::uuid"),
      s"uuid default: $sqls2")
    assert(altered("progress_doc", "'{}'"), s"jsonb default: $sqls2")
    assert(altered("started_on", "CURRENT_DATE"), s"date default: $sqls2")
    // typmod-carrying renderings (format_type output) still match their
    // base type — these used to fall into the catch-all '' whose ALTER
    // fails at the server
    assert(altered("retry_window", "'0'"), s"interval(3) default: $sqls2")
    assert(altered("pod_label", "''"), s"varchar(64) default: $sqls2")
    assert(altered("shard_tags", "'{}'"), s"text[] default: $sqls2")
    assert(!sqls2.exists(_.contains("total_chunks")),
      "already-defaulted era columns are left alone")
    assert(!sqls2.exists(_.contains("slot_name SET DEFAULT")),
      "core columns are never touched")
    assert(!sqls2.exists(_.startsWith("CREATE TABLE")),
      "an existing table is migrated, not recreated")
  }

  test("Sql store ensureSchema: unknown-typed era columns drop NOT NULL instead of failing the ALTER") {
    val issued = Seq.newBuilder[String]
    val cols = Seq(
      Seq("slot_name", "NO", null, "text"),
      Seq("snapshot_id", "NO", null, "text"),
      Seq("snapshot_lsn", "NO", null, "text"),
      Seq("completed", "YES", "false", "boolean"),
      Seq("phase", "NO", null, "snapshot_phase"), // an enum
      Seq("flags", "NO", null, "bit(8)"))
    val exec: CatalogReader.SqlExecutor = { sql =>
      issued += sql
      if (sql.contains("pg_attribute")) cols else Seq.empty
    }
    new SnapshotJobStore.Sql(exec).ensureSchema()
    val sqls = issued.result()
    // no synthesizable default exists (an enum's labels are unknown;
    // bit(n)'s width is column-specific) — the column must become
    // nullable so this deployment's INSERTs stay valid, never get a
    // DEFAULT whose ALTER the server rejects
    def dropped(c: String) = sqls.contains(
      s"""ALTER TABLE "cdc_snapshot_job" ALTER COLUMN "$c" DROP NOT NULL""")
    assert(dropped("phase"), s"enum column drops NOT NULL: $sqls")
    assert(dropped("flags"), s"bit(8) column drops NOT NULL: $sqls")
    assert(!sqls.exists(s => s.contains("phase SET DEFAULT") ||
      s.contains("flags SET DEFAULT")), "no unassignable DEFAULT is issued")
  }

  test("Sql store: reserved-word / mixed-case / spaced era identifiers are quoted") {
    // the ADVICE scenario: a reference-era column named "Started At" (or
    // a reserved word like "user") would make an unquoted ALTER fail at
    // the server and abort the migration mid-way; a reserved-word TABLE
    // name breaks every statement. quote_ident-style quoting (double-
    // quote, double embedded quotes) must reach both positions.
    val issued = Seq.newBuilder[String]
    val cols = Seq(
      Seq("slot_name", "NO", null, "text"),
      Seq("snapshot_id", "NO", null, "text"),
      Seq("snapshot_lsn", "NO", null, "text"),
      Seq("completed", "YES", "false", "boolean"),
      Seq("Started At", "NO", null, "timestamp without time zone"),
      Seq("user", "NO", null, "text"))
    val exec: CatalogReader.SqlExecutor = { sql =>
      issued += sql
      if (sql.contains("pg_attribute")) cols else Seq.empty
    }
    val st = new SnapshotJobStore.Sql(exec, table = "public.user")
    st.ensureSchema()
    st.save(SnapshotJob("s1", "snap-1", 0xAB00L, completed = false))
    val sqls = issued.result()
    // dotted config splits into per-segment quoted identifiers
    assert(sqls.exists(_.contains(
      """ALTER TABLE "public"."user" ALTER COLUMN "Started At" SET DEFAULT now()""")),
      s"spaced column name is quoted: $sqls")
    assert(sqls.exists(_.contains(
      """ALTER TABLE "public"."user" ALTER COLUMN "user" SET DEFAULT ''""")),
      s"reserved-word column name is quoted: $sqls")
    assert(sqls.exists(_.startsWith("""INSERT INTO "public"."user"""")),
      s"DML table position is quoted: $sqls")
    // to_regclass receives the QUOTED form — regclass input parses
    // embedded double-quoted segments, and the raw literal would resolve
    // a DIFFERENT (case-folded) relation than the quoted DDL/DML target
    assert(sqls.exists(_.contains("to_regclass('\"public\".\"user\"')")),
      s"introspection literal is the quoted form: $sqls")
  }

  test("Sql store: mixed-case config introspects the same relation its DDL creates") {
    // r15 ADVICE: to_regclass('MySchema.MyTable') case-folds to
    // myschema.mytable while CREATE TABLE preserves case via quoting —
    // the second ensureSchema would miss the table and re-issue CREATE
    // into 'relation already exists'. The quoted regclass literal
    // resolves the case-preserved relation.
    val issued = Seq.newBuilder[String]
    val exec: CatalogReader.SqlExecutor = { sql =>
      issued += sql; Seq.empty
    }
    val st = new SnapshotJobStore.Sql(exec, table = "MySchema.MyTable")
    st.ensureSchema()
    val sqls = issued.result()
    assert(sqls.exists(_.contains("to_regclass('\"MySchema\".\"MyTable\"')")),
      s"introspection preserves case through quoting: $sqls")
    assert(sqls.exists(_.startsWith("CREATE TABLE \"MySchema\".\"MyTable\"")),
      s"DDL quotes per segment: $sqls")
  }
}
