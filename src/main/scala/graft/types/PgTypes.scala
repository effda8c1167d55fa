package graft.types

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.pgproto.Messages.{Relation, RelationColumn}

/** PostgreSQL type-OID → Catalyst bridge.
  *
  * The reference delegates all value typing to pgx's `pgtype.Map` keyed by
  * type OID, with unknown OIDs falling back to string
  * (`pq/message/tuple/data.go:97-102`). We do the analogous thing against
  * Catalyst types, per the mapping in SURVEY.md §1.3. Values always arrive
  * in PostgreSQL *text* format (the reference never requests binary,
  * `data.go:99`), so the conversion layer is text → typed — and we express
  * it as Catalyst cast/conversion *expressions* so it runs inside
  * whole-stage codegen rather than a JVM-side row loop.
  */
object PgTypes {

  // Well-known PostgreSQL type OIDs (pg_catalog.pg_type; public knowledge).
  object Oid {
    val Bool = 16L; val Bytea = 17L; val Char = 18L; val Name = 19L
    val Int8 = 20L; val Int2 = 21L; val Int4 = 23L; val Text = 25L
    val OidT = 26L; val Json = 114L; val Xml = 142L
    val Float4 = 700L; val Float8 = 701L
    val BpChar = 1042L; val Varchar = 1043L
    val Date = 1082L; val Time = 1083L
    val Timestamp = 1114L; val Timestamptz = 1184L; val Interval = 1186L
    val Numeric = 1700L; val Uuid = 2950L; val Jsonb = 3802L
    // array element OIDs
    val BoolArr = 1000L; val Int2Arr = 1005L; val Int4Arr = 1007L
    val TextArr = 1009L; val VarcharArr = 1015L; val Int8Arr = 1016L
    val Float4Arr = 1021L; val Float8Arr = 1022L; val NumericArr = 1231L
  }
  import Oid._

  /** numeric typmod → (precision, scale); typmod = ((p<<16)|s) + 4 (VARHDRSZ). */
  def numericPrecisionScale(typmod: Int): (Int, Int) =
    if (typmod < 4) (38, 18) // unconstrained NUMERIC: Spark's widest default
    else (((typmod - 4) >> 16) & 0xffff, (typmod - 4) & 0xffff)

  private val arrayElem: Map[Long, Long] = Map(
    BoolArr -> Bool, Int2Arr -> Int2, Int4Arr -> Int4, TextArr -> Text,
    VarcharArr -> Varchar, Int8Arr -> Int8, Float4Arr -> Float4,
    Float8Arr -> Float8, NumericArr -> Numeric)

  /** Element OID for a known array OID ([[PgBinary]] uses this to route
    * binary array payloads before trusting the header's element OID).
    */
  def arrayElementOid(oid: Long): Option[Long] = arrayElem.get(oid)

  /** OID (+typmod) → Catalyst type; unknown OIDs → StringType, same fallback
    * stance as the reference (`data.go:100-101`).
    */
  def catalystType(oid: Long, typmod: Int = -1): DataType = oid match {
    case Bool => BooleanType
    case Bytea => BinaryType
    case Int2 => ShortType
    case Int4 => IntegerType
    case Int8 | OidT => LongType
    case Float4 => FloatType
    case Float8 => DoubleType
    case Numeric =>
      val (p, s) = numericPrecisionScale(typmod)
      DecimalType(math.min(p, 38), math.min(s, 38))
    case Date => DateType
    case Timestamp => TimestampNTZType
    case Timestamptz => TimestampType
    case a if arrayElem.contains(a) => ArrayType(catalystType(arrayElem(a)))
    case _ => StringType // text/varchar/char/uuid/json/jsonb/interval/unknown
  }

  /** Build the typed StructType for a pgoutput Relation message; field
    * metadata records the pg OID, typmod and replica-identity-key flag
    * (analogue of the reference's relation cache entries,
    * `pq/message/message.go:64-69`).
    */
  def structTypeFor(rel: Relation): StructType =
    StructType(rel.columns.map { c =>
      StructField(
        c.name,
        catalystType(c.typeOid, c.typeModifier),
        nullable = true,
        metadata = new MetadataBuilder()
          .putLong("pgTypeOid", c.typeOid)
          .putLong("pgTypeMod", c.typeModifier.toLong)
          .putBoolean("pgKey", c.isKey)
          .build())
    }.toArray)

  /** Convert a text-format value column to its Catalyst type with pure
    * Catalyst expressions (codegen-friendly; no UDF). `col` is the string
    * value pulled out of the envelope's before/after map.
    */
  def fromText(col: Column, oid: Long, typmod: Int = -1): Column = oid match {
    case Bool => when(col.isNull, lit(null).cast(BooleanType)).otherwise(col === lit("t"))
    case Bytea => byteaFromText(col)
    case a if arrayElem.contains(a) =>
      textArrayFromText(col).cast(ArrayType(catalystType(arrayElem(a))))
    case _ => col.cast(catalystType(oid, typmod))
  }

  /** bytea text form `\xDEADBEEF` → BinaryType. */
  def byteaFromText(col: Column): Column = unhex(regexp_replace(col, "^\\\\x", ""))

  /** pg array text form `{a,b,NULL,"c,d"}` → ArrayType(StringType), via the
    * quote/escape-aware [[graft.functions.PgTextArray]] parser (unquoted
    * NULL is SQL NULL; quoted "NULL" is the string).
    */
  def textArrayFromText(col: Column): Column =
    when(col.isNull, lit(null).cast(ArrayType(StringType)))
      .otherwise(graft.functions.PgTextArray.column(col))

  /** Typed-value extraction for one relation column out of an envelope map
    * column (`before`/`after`).
    */
  def typedField(mapCol: Column, c: RelationColumn): Column = {
    val raw = element_at(mapCol, c.name)
    val v = c.typeOid match {
      case Bool => when(raw.isNull, lit(null).cast(BooleanType)).otherwise(raw === lit("t"))
      case Bytea => byteaFromText(raw)
      case a if arrayElem.contains(a) =>
        textArrayFromText(raw).cast(ArrayType(catalystType(arrayElem(a))))
      case oid => raw.cast(catalystType(oid, c.typeModifier))
    }
    v.as(c.name)
  }

  /** Project a CDC envelope DataFrame's `after` (or `before`) map into the
    * relation's typed columns — the per-table typed view of SURVEY.md §1.2.
    */
  def typedColumns(rel: Relation, mapCol: Column): Seq[Column] =
    rel.columns.toSeq.map(c => typedField(mapCol, c))
}
