package graft.snapshot

import org.scalatest.funsuite.AnyFunSuite
import graft.snapshot.ChunkPlanner._

/** S5 catalog introspection feeding B3 planning: fixture-backed executors
  * stand in for PostgreSQL (none in this environment); each fixture is shaped
  * like the reference's catalog query results
  * (`pq/snapshot/coordinator.go:971-1059,797-920,1189-1218`).
  */
class CatalogReaderSpec extends AnyFunSuite {

  /** Routes by which catalog relation the query touches — loudly fails on an
    * unexpected query, so the reader can't silently issue the wrong SQL.
    */
  private def executor(
      pkCols: Seq[Seq[String]],
      bounds: Seq[Seq[String]] = Seq(Seq(null, null)),
      count: String = "0",
      pages: String = "0",
      tuples: String = "0"): CatalogReader.SqlExecutor = { sql =>
    val q = sql.replaceAll("\\s+", " ")
    if (q.contains("pg_index") && q.contains("indisprimary")) pkCols
    else if (q.contains("MIN(") && q.contains("MAX(")) bounds
    else if (q.contains("COUNT(*)")) Seq(Seq(count))
    else if (q.contains("pg_relation_size")) Seq(Seq(pages))
    else if (q.contains("reltuples")) Seq(Seq(tuples))
    else if (q.contains("relreplident")) Seq.empty
    else fail(s"unexpected catalog query: $sql")
  }

  test("single integer PK → integer_range with introspected bounds") {
    val cat = new CatalogReader(executor(
      pkCols = Seq(Seq("o_orderkey", "bigint")),
      bounds = Seq(Seq("1", "600000")),
      count = "150000", pages = "2048", tuples = "150000"))
    val stats = cat.tableStats("public", "orders")
    assert(stats.intPkColumn.contains("o_orderkey"))
    assert(stats.pkMin == 1L && stats.pkMax == 600000L)
    assert(choose(stats) == IntegerRange)
    val chunks = plan(stats, chunkSize = 100000)
    assert(chunks.size == 6)
    assert(chunks.head.predicate.get == "o_orderkey >= 1 AND o_orderkey < 100001")
    assert(chunks.last.predicate.get == "o_orderkey >= 500001 AND o_orderkey <= 600000")
  }

  test("composite PK → not integer_range; physical stats → ctid_block") {
    val cat = new CatalogReader(executor(
      pkCols = Seq(Seq("ps_partkey", "bigint"), Seq("ps_suppkey", "bigint")),
      count = "800000", pages = "4000", tuples = "800000"))
    val stats = cat.tableStats("public", "partsupp")
    assert(stats.intPkColumn.isEmpty)
    assert(choose(stats) == CtidBlock)
    val chunks = plan(stats, chunkSize = 100000)
    assert(chunks.head.predicate.get.startsWith("ctid >= '(0,0)'::tid"))
    assert(chunks.last.predicate.get == s"ctid >= '(${chunks.last.index * 500L},0)'::tid",
      "last ctid chunk is unbounded")
  }

  test("text PK and no physical stats → offset fallback") {
    val cat = new CatalogReader(executor(
      pkCols = Seq(Seq("code", "character varying(10)")),
      count = "2500"))
    val stats = cat.tableStats("public", "currencies")
    assert(stats.intPkColumn.isEmpty)
    assert(choose(stats) == OffsetLimit)
    val chunks = plan(stats, chunkSize = 1000)
    assert(chunks.map(_.limitOffset.get) == Seq((1000L, 0L), (1000L, 1000L), (1000L, 2000L)))
  }

  test("empty table with int PK: NULL bounds → no range; offset plans 1 chunk") {
    val cat = new CatalogReader(executor(
      pkCols = Seq(Seq("id", "integer")), count = "0"))
    val stats = cat.tableStats("public", "empty_t")
    assert(stats.intPkColumn.contains("id") && stats.pkMax < stats.pkMin)
    assert(choose(stats) == OffsetLimit)
    assert(plan(stats, 1000).size == 1)
  }

  test("row count honors the P4 query condition") {
    var seen: String = null
    val exec: CatalogReader.SqlExecutor = { sql => seen = sql; Seq(Seq("42")) }
    val n = new CatalogReader(exec).rowCount("public", "orders", Some("o_totalprice > 1000"))
    assert(n == 42L)
    assert(seen.contains("WHERE (o_totalprice > 1000)"))
  }

  test("identifier quoting: a weird\"name table produces valid, exact SQL") {
    val issued = Seq.newBuilder[String]
    val exec: CatalogReader.SqlExecutor = { sql =>
      issued += sql
      val q = sql.replaceAll("\\s+", " ")
      if (q.contains("indisprimary")) Seq(Seq("the pk", "bigint"))
      else if (q.contains("MIN(")) Seq(Seq("1", "10"))
      else if (q.contains("COUNT(*)")) Seq(Seq("10"))
      else if (q.contains("pg_relation_size") || q.contains("reltuples")) Seq(Seq("1"))
      else Seq.empty
    }
    val cat = new CatalogReader(exec)
    cat.tableStats("Sch'ma", """weird"name""")
    val all = issued.result()
    // regclass casts: identifier-quoted name inside a SQL literal, with the
    // embedded double-quote doubled per identifier rules.
    assert(all.exists(_.contains("""'"Sch''ma"."weird""name"'::regclass""")),
      s"regclass literal not quoted correctly:\n${all.mkString("\n")}")
    // FROM clauses: bare quoted identifiers.
    assert(all.exists(_.contains("""FROM "Sch'ma"."weird""name"""")),
      s"FROM clause not quoted correctly:\n${all.mkString("\n")}")
    // pk column spliced into MIN/MAX is quoted (space-containing name).
    assert(all.exists(_.contains("""MIN("the pk")""")),
      s"pk not quoted:\n${all.mkString("\n")}")
  }

  test("tableColumns: pgoutput-shaped descriptors in attribute order, key flag set") {
    val exec: CatalogReader.SqlExecutor = { sql =>
      assert(sql.contains("attisdropped"), s"unexpected query: $sql")
      assert(sql.contains("""'"public"."users"'::regclass"""))
      Seq(
        Seq("id", "23", "-1", "1"),
        Seq("name", "25", "-1", "0"),
        Seq("price", "1700", "393220", "0")) // numeric(6,0): (6<<16|0)+4
    }
    val cols = new CatalogReader(exec).tableColumns("public", "users")
    assert(cols.map(_.name) == Seq("id", "name", "price"))
    assert(cols.map(_.typeOid) == Seq(23L, 25L, 1700L))
    assert(cols.head.isKey && !cols(1).isKey)
    assert(graft.types.PgTypes.numericPrecisionScale(cols(2).typeModifier) == ((6, 0)))
  }

  test("replica identities decode (d/f/i with index name)") {
    val exec: CatalogReader.SqlExecutor = { sql =>
      assert(sql.contains("relreplident"))
      assert(sql.contains("('public', 'users'), ('public', 'events')"))
      Seq(
        Seq("users", "public", "d", null),
        Seq("events", "public", "i", "events_ri_idx"))
    }
    val ri = new CatalogReader(exec)
      .replicaIdentities(Seq(("public", "users"), ("public", "events")))
    assert(ri(("public", "users")) == ("d", None))
    assert(ri(("public", "events")) == ("i", Some("events_ri_idx")))
  }
}
