package graft.types

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.types._
import graft.pgproto.Messages.{Relation, RelationColumn}

class PgTypesSpec extends AnyFunSuite {
  import PgTypes._

  test("OID mapping matches SURVEY §1.3 table") {
    assert(catalystType(Oid.Int2) == ShortType)
    assert(catalystType(Oid.Int4) == IntegerType)
    assert(catalystType(Oid.Int8) == LongType)
    assert(catalystType(Oid.Float4) == FloatType)
    assert(catalystType(Oid.Float8) == DoubleType)
    assert(catalystType(Oid.Bool) == BooleanType)
    assert(catalystType(Oid.Bytea) == BinaryType)
    assert(catalystType(Oid.Date) == DateType)
    assert(catalystType(Oid.Timestamp) == TimestampNTZType)
    assert(catalystType(Oid.Timestamptz) == TimestampType)
    assert(catalystType(Oid.Text) == StringType)
    assert(catalystType(Oid.Uuid) == StringType)
    assert(catalystType(Oid.Jsonb) == StringType)
    assert(catalystType(Oid.Int4Arr) == ArrayType(IntegerType))
    assert(catalystType(999999L) == StringType) // unknown → string fallback
  }

  test("numeric typmod decodes precision/scale: numeric(10,2) typmod=655366") {
    assert(numericPrecisionScale(655366) == ((10, 2)))
    assert(catalystType(Oid.Numeric, 655366) == DecimalType(10, 2))
    assert(catalystType(Oid.Numeric, -1) == DecimalType(38, 18)) // unconstrained
  }

  test("structTypeFor carries key/oid metadata") {
    val rel = Relation(0, 16384L, "public", "books", 'd', Array(
      RelationColumn("id", Oid.Int4, -1, 1),
      RelationColumn("price", Oid.Numeric, 655366, 0)))
    val st = structTypeFor(rel)
    assert(st.fieldNames.toSeq == Seq("id", "price"))
    assert(st("id").dataType == IntegerType)
    assert(st("id").metadata.getBoolean("pgKey"))
    assert(!st("price").metadata.getBoolean("pgKey"))
    assert(st("price").dataType == DecimalType(10, 2))
    assert(st("price").metadata.getLong("pgTypeOid") == Oid.Numeric)
  }
}
