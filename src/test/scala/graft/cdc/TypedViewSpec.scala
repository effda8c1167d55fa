package graft.cdc

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase
import graft.pgproto.Messages.{Relation, RelationColumn}

/** ChangeEvent.typedView: envelope → typed per-table frame. Covers the
  * cast families, NULL propagation (explicit null value AND absent key),
  * the unknown-OID string fallback, the delete/before image, and the
  * relation filter.
  */
class TypedViewSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  private val rel = Relation(0L, 60001L, "public", "t", 'd', Array(
    RelationColumn("id", 20L, -1, 1), // int8, key
    RelationColumn("n", 23L, -1, 0), // int4
    RelationColumn("price", 1700L, ((10 << 16) | 2) + 4, 0), // numeric(10,2)
    RelationColumn("ok", 16L, -1, 0), // bool
    RelationColumn("at", 1184L, -1, 0), // timestamptz
    RelationColumn("mystery", 424242L, -1, 0))) // unknown OID

  private def envelope(rows: Seq[Row]) =
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1), ChangeEvent.schema)

  private def row(op: String, table: String,
      before: Map[String, String], after: Map[String, String]) =
    Row(1L, 2L, 3L, op, "public", table,
      java.time.Instant.ofEpochSecond(100), java.time.Instant.ofEpochSecond(200),
      Seq("id"), before, after)

  test("casts, nulls, unknown OIDs, and the delete image") {
    val events = envelope(Seq(
      row("insert", "t", null, Map(
        "id" -> "7", "n" -> "42", "price" -> "12.5", "ok" -> "t",
        "at" -> "2026-01-02 03:04:05", "mystery" -> "raw-text")),
      // explicit SQL NULL value + a column MISSING from the map entirely
      row("insert", "t", null, Map("id" -> "8", "n" -> null, "ok" -> "f")),
      // delete: image must come from before; non-key columns null (RI DEFAULT)
      row("delete", "t",
        Map("id" -> "9", "n" -> null, "price" -> null, "ok" -> null,
          "at" -> null, "mystery" -> null), null),
      // different table: must be filtered out
      row("insert", "other", null, Map("id" -> "99"))))

    val view = ChangeEvent.typedView(events, rel)
    val fields = view.schema.fields.map(f => f.name -> f.dataType).toMap
    assert(fields("id") == LongType)
    assert(fields("n") == IntegerType)
    assert(fields("price") == DecimalType(10, 2))
    assert(fields("ok") == BooleanType)
    assert(fields("at") == TimestampType)
    assert(fields("mystery") == StringType, "unknown OID must fall back to string")

    val rows = view.orderBy("id").collect()
    assert(rows.length == 3, "other-table event must be filtered out")

    val r7 = rows(0)
    assert(r7.getAs[Long]("id") == 7L && r7.getAs[Int]("n") == 42)
    assert(r7.getAs[java.math.BigDecimal]("price") ==
      new java.math.BigDecimal("12.50"))
    assert(r7.getAs[Boolean]("ok"))
    assert(r7.getAs[java.sql.Timestamp]("at").toInstant ==
      java.time.Instant.parse("2026-01-02T03:04:05Z"))
    assert(r7.getAs[String]("mystery") == "raw-text")
    assert(r7.getAs[String]("op") == "insert" && r7.getAs[Long]("lsn") == 1L)

    val r8 = rows(1)
    assert(r8.isNullAt(r8.fieldIndex("n")), "explicit null value stays null")
    assert(r8.isNullAt(r8.fieldIndex("price")), "absent map key reads as null")
    assert(!r8.getAs[Boolean]("ok"))

    val r9 = rows(2)
    assert(r9.getAs[String]("op") == "delete")
    assert(r9.getAs[Long]("id") == 9L, "delete image must come from before")
    assert(r9.isNullAt(r9.fieldIndex("n")) && r9.isNullAt(r9.fieldIndex("at")))
  }
}
