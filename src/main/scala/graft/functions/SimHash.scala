package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Deterministic 60-bit hash of a string: the first 15 hex digits of its MD5,
  * read as a base-16 integer. Chosen because it is reproducible in ANSI SQL
  * (`('0x' || substr(md5(x),1,15))::BIGINT`), so every operator built on it
  * (minhash, simhash) has an exact cross-engine oracle.
  */
object Hash60 {
  def apply(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val d = md.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    // first 15 hex digits = 7.5 bytes: take high 60 bits of the first 8 bytes
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    v >>> 4 // drop the low 4 bits (16th hex digit)
  }
}

/** SimHash over a document's token array: per token, hash to 60 bits; each
  * bit votes ±1; the signature bit is the vote's sign. Documents with small
  * Hamming distance between signatures are near-duplicates.
  *
  * Implemented as a Catalyst `Expression` (single pass over the token array,
  * no 60× row explosion) — the (b) tier of the custom-operator preference
  * order. CodegenFallback: the MD5 loop dominates cost, codegen wouldn't
  * change the profile.
  */
case class SimHash(child: Expression) extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override def checkInputDataTypes() = {
    child.dataType match {
      case ArrayType(StringType, _) => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"simhash requires array<string>, got ${other.catalogString}")
    }
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val votes = new Array[Int](60)
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val h = Hash60(arr.getUTF8String(i).toString)
        var b = 0
        while (b < 60) {
          votes(b) += ((((h >>> b) & 1L) << 1) - 1L).toInt
          b += 1
        }
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < 60) { if (votes(b) > 0) sig |= 1L << b; b += 1 }
    java.lang.Long.valueOf(sig)
  }

  override protected def withNewChildInternal(newChild: Expression): SimHash = copy(newChild)
  override def prettyName: String = "simhash"
}

object SimHash {
  /** Column API: simhash of an array<string> column. Spark 4.x removed
    * `Column.expr` / `new Column(Expression)`, so we go through the
    * `classic.ExpressionUtils` bridge.
    */
  def simhash(tokens: Column): Column =
    org.apache.spark.sql.graftbridge.ColumnBridge.column(
      SimHash(org.apache.spark.sql.graftbridge.ColumnBridge.expression(tokens)))
}
