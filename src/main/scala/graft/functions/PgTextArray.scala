package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Full parser for PostgreSQL's 1-D array text form — `{a,b,NULL,"c,d",
  * "he said \"hi\""}` — including double-quoted elements with embedded
  * commas/braces, backslash escapes, and the unquoted-NULL vs quoted-"NULL"
  * distinction (the former is SQL NULL, the latter the 4-char string).
  * The reference delegates this to pgx's array codec
  * (`pq/message/tuple/data.go:97-102`); Spark's `split(…, ",")` cannot
  * express quote-awareness, hence a custom expression (CodegenFallback:
  * per-row string parsing, no hot arithmetic to fuse).
  */
case class PgTextArray(child: Expression) extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(StringType)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"pg_text_array requires string, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    val vals = PgTextArray.parse(s)
    new GenericArrayData(vals.map(v => if (v == null) null else UTF8String.fromString(v)))
  }

  override protected def withNewChildInternal(newChild: Expression): PgTextArray = copy(newChild)
  override def prettyName: String = "pg_text_array"
}

object PgTextArray {

  def column(c: Column): Column =
    ColumnBridge.column(PgTextArray(ColumnBridge.expression(c)))

  /** Parse the text form into values (null = SQL NULL element). Malformed
    * input fails loudly — silent truncation of a CDC value is worse than an
    * error.
    */
  def parse(s: String): Array[String] = {
    require(s.length >= 2 && s.charAt(0) == '{' && s.charAt(s.length - 1) == '}',
      s"malformed pg array literal: '$s'")
    val body = s.substring(1, s.length - 1)
    if (body.isEmpty) return Array.empty
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    val sb = new java.lang.StringBuilder()
    var i = 0
    var quoted = false // the CURRENT element was quoted (so "NULL" stays a string)
    def flush(): Unit = {
      val v = sb.toString
      out += (if (!quoted && v == "NULL") null else v)
      sb.setLength(0)
      quoted = false
    }
    while (i < body.length) {
      body.charAt(i) match {
        case '"' =>
          quoted = true
          i += 1
          var closed = false
          while (i < body.length && !closed) {
            body.charAt(i) match {
              case '\\' =>
                require(i + 1 < body.length, s"dangling escape in pg array literal: '$s'")
                sb.append(body.charAt(i + 1)); i += 2
              case '"' => closed = true; i += 1
              case c => sb.append(c); i += 1
            }
          }
          require(closed, s"unterminated quote in pg array literal: '$s'")
        case ',' =>
          flush(); i += 1
        case c =>
          sb.append(c); i += 1
      }
    }
    flush()
    out.toArray
  }
}
