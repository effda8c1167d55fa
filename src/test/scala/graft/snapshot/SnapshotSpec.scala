package graft.snapshot

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** Planner/query-builder tests — ports of the reference's
  * `snapshot/coordinator_test.go` (query-condition composition) and the
  * chunk-coverage guarantees of `snapshot_ctid_partitioning_test.go` /
  * `snapshot_chunks_test.go`, against parquet + Spark instead of PostgreSQL.
  */
class SnapshotSpec extends AnyFunSuite {
  import ChunkPlanner._

  val sf = "/root/testdata/sf0.001"

  test("auto strategy chain: int PK → range; stats → ctid; else offset") {
    assert(choose(TableStats(100, Some("id"), 1, 99)) == IntegerRange)
    assert(choose(TableStats(100, None, relPages = 10, relTuples = 100)) == CtidBlock)
    assert(choose(TableStats(100, None)) == OffsetLimit)
  }

  test("integer_range chunks: half-open, gap-free, last chunk closed at max") {
    val chunks = integerRange("id", 1, 25, 10)
    assert(chunks.size == 3)
    assert(chunks(0).predicate.contains("id >= 1 AND id < 11"))
    assert(chunks(1).predicate.contains("id >= 11 AND id < 21"))
    assert(chunks(2).predicate.contains("id >= 21 AND id <= 25"))
    assert(chunks.last.isLast)
    // empty table → single never-true chunk
    assert(integerRange("id", 0, -1, 10).head.predicate.contains("1 = 0"))
  }

  test("ctid_block chunks: derived blocksPerChunk, unbounded tail") {
    // 100 pages, ~50 tuples/page, chunk 1000 rows → 20 blocks/chunk → 5 chunks
    val chunks = ctidBlock(relPages = 100, relTuples = 5000, chunkSize = 1000)
    assert(chunks.size == 5)
    assert(chunks.head.predicate.contains("ctid >= '(0,0)'::tid AND ctid < '(20,0)'::tid"))
    assert(chunks.last.predicate.contains("ctid >= '(80,0)'::tid"))
    assert(!chunks.last.predicate.get.contains("AND ctid <"), "tail must be unbounded")
  }

  test("offset chunks cover rowCount") {
    val chunks = offsetLimit(25, 10)
    assert(chunks.map(_.limitOffset.get) == Seq((10L, 0L), (10L, 10L), (10L, 20L)))
  }

  test("chunk SQL shapes match the reference builders") {
    val rangeChunk = integerRange("id", 1, 20, 10).head
    assert(SnapshotQuery.chunkSql("public", "users", Seq("id", "name"), rangeChunk,
      Some("status = 'active'"), None)
      == "SELECT \"id\", \"name\" FROM \"public\".\"users\"" +
        " WHERE id >= 1 AND id < 11 AND (status = 'active')")

    val offChunk = offsetLimit(20, 10)(1)
    assert(SnapshotQuery.chunkSql("public", "t", Nil, offChunk, None, Some("id"))
      == "SELECT * FROM \"public\".\"t\" ORDER BY \"id\" LIMIT 10 OFFSET 10")
  }

  test("query-condition validation rejects injection, accepts predicates") {
    assert(SnapshotQuery.validateCondition("status = 'active' AND age > 10").isRight)
    assert(SnapshotQuery.validateCondition("id IN (SELECT 1)").isRight)
    assert(SnapshotQuery.validateCondition("1=1; DROP TABLE x").isLeft)
    assert(SnapshotQuery.validateCondition("x = 1 -- comment").isLeft)
    assert(SnapshotQuery.validateCondition("delete from t").isLeft)
    assert(SnapshotQuery.validateCondition("x = 1 /* c */").isLeft)
    assert(SnapshotQuery.validateCondition("").isLeft)
    // keyword must match whole word: 'created_at' contains 'create'
    assert(SnapshotQuery.validateCondition("created_at > '2020-01-01'").isRight)
  }

  test("per-table condition overrides global; invalid condition throws") {
    val cfg = SnapshotConfig(
      globalCondition = Some("status = 'active'"),
      perTableCondition = Map("orders" -> "o_totalprice > 0"))
    assert(cfg.conditionFor("orders").contains("o_totalprice > 0"))
    assert(cfg.conditionFor("users").contains("status = 'active'"))
    intercept[IllegalArgumentException] {
      SnapshotConfig(globalCondition = Some("1=1; drop table x")).conditionFor("t")
    }
  }

  test("integer_range chunked parquet scan ≡ full scan (no dup, no loss)") {
    val spark = SparkTestBase.spark
    val full = spark.read.parquet(s"$sf/orders.parquet")
    val Row = full.agg(min("o_orderkey"), max("o_orderkey"), count(lit(1))).head
    val (mn, mx, total) = (Row.getLong(0), Row.getLong(1), Row.getLong(2))

    val stats = TableStats(total, Some("o_orderkey"), mn, mx)
    val cfg = SnapshotConfig(chunkSize = 997) // deliberately non-round
    val chunked = SnapshotReader.parquetChunks(spark, s"$sf/orders.parquet", stats, cfg, "orders")
    assert(chunked.count() == total)
    assert(chunked.select("o_orderkey").distinct().count()
      == full.select("o_orderkey").distinct().count())

    // with a row condition, matches the filtered full scan
    val cfg2 = cfg.copy(globalCondition = Some("o_orderstatus = 'F'"))
    val chunkedF = SnapshotReader.parquetChunks(spark, s"$sf/orders.parquet", stats, cfg2, "orders")
    assert(chunkedF.count() == full.filter(col("o_orderstatus") === "F").count())
  }
}
