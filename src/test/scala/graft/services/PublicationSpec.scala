package graft.services

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestBase
import graft.services.Publication._

/** P7 publication DDL + client-side renaming, and the S6 TimescaleDB
  * chunk→hypertable mapper (fixture-backed; no PostgreSQL here).
  */
class PublicationSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  test("createQuery matches the reference shape; partition root set when any table partitioned") {
    val cfg = Config("graft_pub", Seq(
      PubTable("public", "users", columns = Seq("id", "name")),
      PubTable("public", "measurements", partitioned = true)))
    assert(cfg.createQuery ==
      """CREATE PUBLICATION "graft_pub" FOR TABLE "public"."users"("id", "name"), """ +
        """"public"."measurements" WITH (publish = 'insert, update, delete, truncate', """ +
        """publish_via_partition_root = true)""")

    val flat = Config("p2", Seq(PubTable("public", "users")), operations = Seq("insert", "update"))
    assert(flat.createQuery.endsWith("WITH (publish = 'insert, update', publish_via_partition_root = false)"))
    assert(flat.dropQuery == """DROP PUBLICATION IF EXISTS "p2"""")
  }

  test("align issues ADD/DROP TABLE and SET publish only for the actual drift") {
    val cfg = Config("pub", Seq(
      PubTable("public", "a"), PubTable("public", "b")),
      operations = Seq("insert", "update"))
    val issued = scala.collection.mutable.ArrayBuffer.empty[String]
    // live: has a+c (c extra, b missing), publishes insert only
    val exec: graft.snapshot.CatalogReader.SqlExecutor = sql => {
      issued += sql
      if (sql == cfg.infoQuery)
        Seq(Seq("pub", "f", "t", "f", "f", "f", "{public.a,public.c}"))
      else Nil
    }
    val mgr = new PublicationManager(exec, cfg)
    val ddl = mgr.align()
    assert(ddl == Seq(
      """ALTER PUBLICATION "pub" ADD TABLE "public"."b"""",
      """ALTER PUBLICATION "pub" DROP TABLE "public"."c"""",
      """ALTER PUBLICATION "pub" SET (publish = 'insert, update')"""))
    assert(issued.containsSlice(ddl), "every statement actually executed")

    // already aligned: read-only, no DDL
    val aligned: graft.snapshot.CatalogReader.SqlExecutor = sql =>
      if (sql == cfg.infoQuery)
        Seq(Seq("pub", "f", "t", "t", "f", "f", "{public.a,public.b}"))
      else fail(s"unexpected DDL on aligned publication: $sql")
    assert(new PublicationManager(aligned, cfg).align().isEmpty)

    // FOR ALL TABLES: refused with a warning, nothing issued
    val warnings = scala.collection.mutable.ArrayBuffer.empty[String]
    val forAll: graft.snapshot.CatalogReader.SqlExecutor = sql =>
      if (sql == cfg.infoQuery) Seq(Seq("pub", "t", "t", "f", "f", "f", "{}"))
      else fail(s"unexpected DDL on FOR ALL TABLES: $sql")
    assert(new PublicationManager(forAll, cfg, warnings += _).align().isEmpty)
    assert(warnings.exists(_.contains("FOR ALL TABLES")))
  }

  test("operation validation fails loudly on unknown DML kinds") {
    val ex = intercept[IllegalArgumentException](
      Config("p", Seq(PubTable("public", "t")), operations = Seq("insert", "upsert")))
    assert(ex.getMessage.contains("upsert"))
  }

  test("renameTables rewrites partition/chunk names to roots, passes others through") {
    import spark.implicits._
    val events = Seq(
      ("public", "orders_2024_01", 1L),
      ("public", "orders_2024_02", 2L),
      ("_timescaledb_internal", "_hyper_1_3_chunk", 3L),
      ("public", "plain", 4L)).toDF("schema", "table", "lsn")
    val mapping = Map(
      ("public", "orders_2024_01") -> (("public", "orders")),
      ("public", "orders_2024_02") -> (("public", "orders")),
      ("_timescaledb_internal", "_hyper_1_3_chunk") -> (("public", "metrics")))
    val out = renameTables(events, mapping)
      .orderBy("lsn").select("schema", "table").collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq
    assert(out == Seq(
      ("public", "orders"), ("public", "orders"), ("public", "metrics"), ("public", "plain")))
  }

  test("hypertable mapper polls, merges, and stops permanently on 42P01") {
    var calls = 0
    val exec: graft.snapshot.CatalogReader.SqlExecutor = { sql =>
      assert(sql == HypertableMapper.FindHyperTablesSql)
      calls += 1
      if (calls == 1)
        Seq(Seq("public", "metrics", "_timescaledb_internal", "_hyper_1_1_chunk"))
      else
        Seq(Seq("public", "metrics", "_timescaledb_internal", "_hyper_1_2_chunk"))
    }
    val m = new HypertableMapper(exec)
    m.sync(ticks = 2, sleep = () => ())
    assert(m.mapping == Map(
      ("_timescaledb_internal", "_hyper_1_1_chunk") -> (("public", "metrics")),
      ("_timescaledb_internal", "_hyper_1_2_chunk") -> (("public", "metrics"))),
      "polls merge into the cache")

    val notTimescale = new HypertableMapper(
      _ => throw new RuntimeException("""ERROR: relation "timescaledb_information.chunks" does not exist (SQLSTATE 42P01)"""))
    notTimescale.sync(ticks = 5, sleep = () => fail("must stop before first sleep"))
    assert(notTimescale.isStopped && notTimescale.mapping.isEmpty)
  }
}
