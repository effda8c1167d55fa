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
