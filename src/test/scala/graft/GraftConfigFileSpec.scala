package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.snapshot.ChunkPlanner

/** YAML → GraftConfig: a full file covering every field, the applied
  * defaults, and the validation semantics (all errors in one message, the
  * heartbeat-in-publication check, unknown-key detection, parser rejects).
  */
class GraftConfigFileSpec extends AnyFunSuite {

  private val full =
    """# production CDC config
      |host: db.internal
      |port: 5433
      |username: cdc_user
      |password: "p@ss: w#rd"
      |database: appdb
      |sslmode: require
      |publication:
      |  name: graft_pub
      |  createIfNotExists: false
      |  operations:
      |    - insert
      |    - update
      |    - delete
      |  tables:
      |    - name: users
      |      schema: app
      |      columns:
      |        - id
      |        - email
      |    - name: orders_part
      |      partitioned: true
      |    - name: cdc_heartbeat
      |slot:
      |  name: graft_slot
      |  createIfNotExists: false
      |  protoVersion: 1
      |heartbeat:
      |  table:
      |    name: cdc_heartbeat
      |snapshot:
      |  mode: initial
      |  chunkSize: 4000
      |  partitionStrategy: integer_range
      |  queryCondition: "id > 0"
      |  tableConditions:
      |    users: "id > 100"
      |  resnapshot: true
      |metric:
      |  port: 9187
      |maxTxnsPerTrigger: 500
      |maxFramesPerPartition: 1024
      |""".stripMargin

  test("a full file round-trips every field") {
    val cfg = GraftConfigFile.fromYaml(full)
    assert(cfg.host == "db.internal" && cfg.port == 5433)
    assert(cfg.username == "cdc_user" && cfg.password == "p@ss: w#rd")
    assert(cfg.database == "appdb" && cfg.sslMode == "require")
    assert(cfg.publication.name == "graft_pub" && !cfg.publication.createIfNotExists)
    assert(cfg.publication.operations == Seq("insert", "update", "delete"))
    val Seq(users, parts, hb) = cfg.publication.tables
    assert(users.schema == "app" && users.name == "users" &&
      users.columns == Seq("id", "email") && !users.partitioned)
    assert(parts.schema == "public" && parts.name == "orders_part" && parts.partitioned)
    assert(hb.name == "cdc_heartbeat")
    assert(cfg.slotName == "graft_slot" && !cfg.slotCreateIfNotExists)
    assert(cfg.protoVersion == 1)
    assert(cfg.heartbeatSchema == "public" && cfg.heartbeatTable == "cdc_heartbeat")
    assert(cfg.snapshot.mode == "initial" && cfg.snapshot.chunkSize == 4000L)
    assert(cfg.snapshot.strategy == ChunkPlanner.IntegerRange)
    assert(cfg.snapshot.globalCondition.contains("id > 0"))
    assert(cfg.snapshot.perTableCondition == Map("users" -> "id > 100"))
    assert(cfg.snapshot.resnapshot)
    assert(cfg.metricPort == 9187)
    assert(cfg.maxTxnsPerTrigger == 500L && cfg.maxFramesPerPartition == 1024)
  }

  test("defaults match the reference's SetDefault") {
    val cfg = GraftConfigFile.fromYaml(
      """host: h
        |username: u
        |password: p
        |database: d
        |publication:
        |  name: pub
        |  tables:
        |    - name: t1
        |slot:
        |  name: s1
        |""".stripMargin)
    assert(cfg.port == 5432 && cfg.protoVersion == 2 && cfg.sslMode == "disable")
    assert(cfg.publication.operations == Seq("insert", "update", "delete", "truncate"))
    assert(cfg.publication.tables.head.schema == "public")
    assert(cfg.snapshot.mode == "initial" && cfg.snapshot.chunkSize == 8000L)
    assert(cfg.snapshot.strategy == ChunkPlanner.Auto)
    assert(cfg.metricPort == 8080)
    assert(cfg.heartbeatTable == "cdc_heartbeat")
  }

  test("a full reference-shaped yaml carries over drop-in (config.go:19-33 key surface)") {
    val cfg = GraftConfigFile.fromYaml(
      """logger:
        |  level: info
        |host: db.internal
        |username: u
        |password: p
        |database: appdb
        |debugMode: true
        |metric:
        |  port: 9090
        |extensionSupport:
        |  enableTimescaleDB: true
        |publication:
        |  name: pub
        |  tables:
        |    - name: books
        |      replicaIdentity: FULL
        |slot:
        |  name: s1
        |  slotActivityCheckerInterval: 2500
        |heartbeat:
        |  interval: 10s
        |  table:
        |    name: books
        |snapshot:
        |  mode: initial
        |  instanceId: worker-1
        |  id: snap_42
        |  claimTimeout: 30s
        |  heartbeatInterval: 5s
        |  enabled: true
        |  chunkSize: 2000
        |  tables:
        |    - name: books
        |      schema: public
        |      queryCondition: "id > 0"
        |      snapshotPartitionStrategy: ctid_block
        |    - name: users
        |""".stripMargin)
    assert(cfg.debugMode)
    assert(cfg.metricPort == 9090)
    assert(cfg.enableTimescaleDb)
    assert(cfg.slotActivityCheckerIntervalMs == 2500L, "bare int = milliseconds")
    assert(cfg.heartbeatIntervalMs == 10000L, "Go duration string parses")
    // snapshot.tables[] keys are schema-qualified (default schema public)
    assert(cfg.snapshot.perTableCondition == Map("public.books" -> "id > 0"))
    assert(cfg.snapshot.strategyFor("public", "books") == ChunkPlanner.CtidBlock,
      "per-table strategy override (table.go:38-41)")
    assert(cfg.snapshot.strategyFor("other", "books") == ChunkPlanner.Auto,
      "same-named table in another schema keeps the global strategy")
    assert(cfg.snapshot.strategyFor("public", "users") == ChunkPlanner.Auto)
    assert(cfg.snapshot.chunkSize == 2000L)
    // snapshot.id binds (snapshot-only job key override, connector.go:409-413)
    assert(cfg.snapshot.id.contains("snap_42"))

    // enabled: false forces mode never (config.go:107-110)
    val disabled = GraftConfigFile.fromYaml(
      """host: h
        |username: u
        |password: p
        |database: d
        |publication:
        |  name: pub
        |  tables:
        |    - name: t1
        |slot:
        |  name: s1
        |snapshot:
        |  mode: initial
        |  enabled: false
        |""".stripMargin)
    assert(disabled.snapshot.mode == "never")

    // composite Go durations and bad durations
    val composite = GraftConfigFile.fromYaml(
      """host: h
        |username: u
        |password: p
        |database: d
        |publication:
        |  name: pub
        |  tables:
        |    - name: t1
        |slot:
        |  name: s1
        |heartbeat:
        |  interval: 1m30s
        |""".stripMargin)
    assert(composite.heartbeatIntervalMs == 90000L)
    val bad = intercept[IllegalArgumentException](GraftConfigFile.fromYaml(
      """host: h
        |username: u
        |password: p
        |database: d
        |publication:
        |  name: pub
        |  tables:
        |    - name: t1
        |slot:
        |  name: s1
        |heartbeat:
        |  interval: soon
        |""".stripMargin))
    assert(bad.getMessage.contains("cannot parse duration 'soon'"))
  }

  test("replicaIdentity parses per table like the reference's yaml (table.go:33-46)") {
    val cfg = GraftConfigFile.fromYaml(
      """host: h
        |username: u
        |password: p
        |database: d
        |publication:
        |  name: pub
        |  tables:
        |    - name: books
        |      replicaIdentity: full
        |    - name: users
        |      replicaIdentity: USING INDEX
        |      replicaIdentityIndex: users_email_idx
        |    - name: plain
        |slot:
        |  name: s1
        |""".stripMargin)
    val byName = cfg.publication.tables.map(t => t.name -> t).toMap
    assert(byName("books").replicaIdentity == "FULL", "case-normalized")
    assert(byName("users").replicaIdentity == "USING INDEX")
    assert(byName("users").replicaIdentityIndex == "users_email_idx")
    assert(byName("plain").replicaIdentity == "", "unset = unmanaged")
  }

  test("replicaIdentity config problems are collected, mirroring Table.Validate") {
    val e = intercept[IllegalArgumentException](GraftConfigFile.fromYaml(
      """host: h
        |username: u
        |password: p
        |database: d
        |publication:
        |  name: pub
        |  tables:
        |    - name: t1
        |      replicaIdentity: SOMETIMES
        |    - name: t2
        |      replicaIdentity: USING INDEX
        |    - name: t3
        |      replicaIdentityIndex: idx
        |    - name: t4
        |      replicaIdentity: FULL
        |      columns:
        |        - id
        |slot:
        |  name: s1
        |""".stripMargin))
    assert(e.getMessage.contains("undefined option 'SOMETIMES'"))
    assert(e.getMessage.contains("replicaIdentityIndex required"))
    assert(e.getMessage.contains("can only be set when replicaIdentity is USING INDEX"))
    assert(e.getMessage.contains("cannot specify columns when replicaIdentity is FULL"))
  }

  test("JSON config parses identically to YAML (ReadConfigJSON parity)") {
    val cfg = GraftConfigFile.fromJson(
      """{
        |  "host": "db", "port": 5433, "username": "u", "password": "p",
        |  "database": "d", "debugMode": true,
        |  "publication": {
        |    "name": "pub",
        |    "operations": ["insert", "update"],
        |    "tables": [
        |      {"name": "books", "replicaIdentity": "FULL"},
        |      {"name": "users", "columns": ["id", "email"]}
        |    ]
        |  },
        |  "slot": {"name": "s1", "slotActivityCheckerInterval": 1500},
        |  "snapshot": {"mode": "initial", "chunkSize": 4000,
        |    "tables": [{"name": "books", "snapshotPartitionStrategy": "offset"}]},
        |  "metric": {"port": 9091}
        |}""".stripMargin)
    assert(cfg.port == 5433 && cfg.debugMode && cfg.metricPort == 9091)
    assert(cfg.publication.operations == Seq("insert", "update"))
    assert(cfg.publication.tables.head.replicaIdentity == "FULL")
    assert(cfg.publication.tables(1).columns == Seq("id", "email"))
    assert(cfg.slotActivityCheckerIntervalMs == 1500L)
    assert(cfg.snapshot.chunkSize == 4000L)
    assert(cfg.snapshot.strategyFor("public", "books") == ChunkPlanner.OffsetLimit)

    // identical validation path: unknown keys + every problem joined
    val e = intercept[IllegalArgumentException](GraftConfigFile.fromJson(
      """{"host": "h", "username": "u", "password": "p", "database": "d",
        |  "publication": {"name": "pub", "tables": [{"name": "t", "chunkSiez": 1}]},
        |  "slot": {"name": "s"}}""".stripMargin))
    assert(e.getMessage.contains("unknown key"))
    // malformed json fails loudly, not as a tree of defaults
    val bad = intercept[IllegalArgumentException](GraftConfigFile.fromJson("{"))
    assert(bad.getMessage.contains("json parse"))
  }

  test("validation collects every problem into one message") {
    val e = intercept[IllegalArgumentException](GraftConfigFile.fromYaml(
      """port: 5432
        |publication:
        |  name: pub
        |  tables:
        |    - name: t1
        |""".stripMargin))
    // host, username, password, database, slot.name — all reported at once
    assert(e.getMessage.contains("host cannot be empty"))
    assert(e.getMessage.contains("username cannot be empty"))
    assert(e.getMessage.contains("password cannot be empty"))
    assert(e.getMessage.contains("database cannot be empty"))
    assert(e.getMessage.contains("slot.name cannot be empty"))
    assert(e.getMessage.contains("5 problem(s)"))
  }

  test("non-positive durations are rejected at load time") {
    // A negative interval would otherwise only surface as Thread.sleep
    // throwing inside the heartbeat/capture loop.
    val e = intercept[IllegalArgumentException](GraftConfigFile.fromYaml(
      """host: h
        |username: u
        |password: p
        |database: d
        |publication:
        |  name: pub
        |  tables:
        |    - name: t1
        |slot:
        |  name: s1
        |  slotActivityCheckerInterval: -100
        |heartbeat:
        |  interval: 0ms
        |""".stripMargin))
    assert(e.getMessage.contains(
      "slot.slotActivityCheckerInterval: duration must be positive (got '-100')"))
    assert(e.getMessage.contains(
      "heartbeat.interval: duration must be positive (got '0ms')"))
  }

  test("slot names outside [a-z0-9_]{1,63} are rejected at load time") {
    // Slot names interpolate raw into CREATE_REPLICATION_SLOT — there is no
    // quoting form, so a hyphen would only fail server-side mid-boot.
    val e = intercept[IllegalArgumentException](GraftConfigFile.fromYaml(
      """host: h
        |username: u
        |password: p
        |database: d
        |publication:
        |  name: pub
        |  tables:
        |    - name: t1
        |slot:
        |  name: My-Slot
        |snapshot:
        |  mode: initial
        |  id: snap-42
        |""".stripMargin))
    assert(e.getMessage.contains("slot.name 'My-Slot' must match [a-z0-9_]{1,63}"))
    assert(e.getMessage.contains("snapshot.id 'snap-42' must match [a-z0-9_]{1,63}"))
  }

  test("heartbeat table must be included in the publication") {
    val e = intercept[IllegalArgumentException](GraftConfigFile.fromYaml(
      """host: h
        |username: u
        |password: p
        |database: d
        |publication:
        |  name: pub
        |  tables:
        |    - name: users
        |slot:
        |  name: s1
        |heartbeat:
        |  table:
        |    name: cdc_heartbeat
        |""".stripMargin))
    assert(e.getMessage.contains("heartbeat table public.cdc_heartbeat is not included"))
  }

  test("typos, wrong types, and bad enums are loud") {
    val e = intercept[IllegalArgumentException](GraftConfigFile.fromYaml(
      """host: h
        |username: u
        |password: p
        |database: d
        |prot: 5432
        |publication:
        |  name: pub
        |  tables:
        |    - name: t1
        |      partitioned: yes-please
        |slot:
        |  name: s1
        |  protoVersion: two
        |snapshot:
        |  chunkSiez: 9000
        |  partitionStrategy: sharded
        |""".stripMargin))
    assert(e.getMessage.contains("unknown key 'prot'"))
    assert(e.getMessage.contains("unknown key 'snapshot.chunkSiez'"))
    assert(e.getMessage.contains("'yes-please' is not true/false"))
    assert(e.getMessage.contains("'two' is not an integer"))
    assert(e.getMessage.contains("partitionStrategy 'sharded'"))
  }

  test("the parser rejects what it cannot represent") {
    assert(intercept[IllegalArgumentException](
      GraftConfigFile.fromYaml("host: h\n\tport: 1\n")).getMessage.contains("tabs"))
    assert(intercept[IllegalArgumentException](
      GraftConfigFile.fromYaml("host: &anchor h\n")).getMessage.contains("unsupported YAML"))
    assert(intercept[IllegalArgumentException](
      GraftConfigFile.fromYaml("host: h\nhost: i\n")).getMessage.contains("duplicate key"))
  }

  test("mutated YAML loads or raises IllegalArgumentException — nothing else") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    import org.scalacheck.rng.Seed
    // A config file is operator input: any deletion, flip, splice, or pure
    // garbage must produce a config or the loader's declared error (with
    // every problem joined into the message) — never a parser internal.
    val lines = full.linesIterator.toVector
    val genMutant: Gen[String] = Gen.choose(0, 4).flatMap {
      case 0 => Gen.choose(0, lines.size - 1).map(i => // drop a line
        lines.patch(i, Nil, 1).mkString("\n"))
      case 1 => for { // flip one char
        i <- Gen.choose(0, full.length - 1)
        c <- Gen.oneOf(':', '-', '#', '{', '[', '"', '\'', 'x', ' ')
      } yield full.updated(i, c)
      case 2 => for { // splice a random fragment mid-file
        i <- Gen.choose(0, lines.size - 1)
        frag <- Gen.oneOf("  nonsense: [", "foo", ": bar", "- - -",
          "snapshot: 12", "tables: oops", "   deep:\n     deeper: x")
      } yield lines.patch(i, Seq(frag), 0).mkString("\n")
      case 3 => Gen.listOfN(12, Gen.asciiPrintableChar).map(_.mkString) // garbage
      case _ => for { // duplicate a line elsewhere
        i <- Gen.choose(0, lines.size - 1)
        j <- Gen.choose(0, lines.size - 1)
      } yield lines.patch(j, Seq(lines(i)), 0).mkString("\n")
    }
    val prop = Prop.forAll(genMutant) { yaml =>
      try { GraftConfigFile.fromYaml(yaml); true }
      catch {
        case _: IllegalArgumentException => true
        case e: Throwable =>
          println(s"config loader hole: ${e.getClass.getName}: ${e.getMessage}")
          false
      }
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(500)
        .withInitialSeed(Seed(20260814L)), prop)
    assert(res.passed, res.status.toString)
  }

  test("load() reads from disk") {
    val f = java.nio.file.Files.createTempFile("graft-cfg", ".yaml")
    java.nio.file.Files.writeString(f, full)
    try assert(GraftConfigFile.load(f.toString).host == "db.internal")
    finally java.nio.file.Files.delete(f)
  }
}
