package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** All ordered pairs `(a[i], a[j]), i < j` of a long array, as
  * `array<struct<d1,d2>>` — the row-local pair-emission kernel of the
  * inverted-index dedup path (`DedupQueries.ngramJaccard`): each shingle's
  * doc list emits its candidate pairs in place, replacing an index
  * self-join. Input lists are df-capped upstream, so output size is
  * bounded at df·(df-1)/2 per row by construction.
  *
  * A native Catalyst expression with `doGenCode` — the equivalent
  * `transform`/`slice`/`flatten` higher-order chain evaluates interpreted
  * with per-step array materialization (the same 24×-slower shape the
  * shingle scan hit); this is one compiled double loop.
  */
case class OrderedPairs(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("d1", LongType, nullable = false),
      StructField("d2", LongType, nullable = false))),
    containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"ordered_pairs requires array<bigint> input, got ${other.catalogString}")
  }

  // Null slots are SKIPPED (pairs are over the non-null elements): a null
  // slot read through getLong returns garbage, which would fabricate pair
  // ids — so the elements compact into a dense buffer first.
  override def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val n = a.numElements()
    val vals = new Array[Long](n)
    var m = 0
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i)) { vals(m) = a.getLong(i); m += 1 }
      i += 1
    }
    val out = new Array[Any](OrderedPairs.javaOutSize(m))
    var k = 0
    i = 0
    while (i < m) {
      val d1 = vals(i)
      var j = i + 1
      while (j < m) {
        out(k) = new GenericInternalRow(Array[Any](d1, vals(j)))
        k += 1
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val vals = ctx.freshName("vals")
      val m = ctx.freshName("m")
      val out = ctx.freshName("out")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val k = ctx.freshName("k")
      val d1 = ctx.freshName("d1")
      s"""
         |int $n = $a.numElements();
         |long[] $vals = new long[$n];
         |int $m = 0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i)) { $vals[$m++] = $a.getLong($i); }
         |}
         |Object[] $out = new Object[
         |  graft.functions.OrderedPairs$$.MODULE$$.javaOutSize($m)];
         |int $k = 0;
         |for (int $i = 0; $i < $m; $i++) {
         |  long $d1 = $vals[$i];
         |  for (int $j = $i + 1; $j < $m; $j++) {
         |    $out[$k++] = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
         |      new Object[] { $d1, $vals[$j] });
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
         |""".stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): OrderedPairs =
    copy(child = newChild)
  override def prettyName: String = "ordered_pairs"
}

object OrderedPairs {
  /** n·(n-1)/2 in long arithmetic — 46_341 elements already overflows the
    * int form into a negative allocation size. Called from generated code.
    */
  def javaOutSize(n: Int): Int = {
    val m = n.toLong * (n - 1L) / 2L
    if (m > Int.MaxValue)
      throw new IllegalArgumentException(
        s"ordered_pairs input of $n elements would emit $m pairs — cap the " +
          "list upstream (the dedup path df-caps it)")
    m.toInt
  }
}

/** Count of common elements between two ASCENDING-sorted long arrays, each
  * element-distinct — `size(array_intersect(a, b))` as one compiled merge
  * loop: no per-row hash set, no interpreted array passes, no allocation.
  * The candidate-verification stage of the dedup operators runs it once
  * per candidate pair over sorted shingle-hash sets.
  */
case class SortedIntersectCount(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"sorted_intersect_count requires array<bigint> inputs, got " +
          s"${l.catalogString} and ${r.catalogString}")
    }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    var n = 0L
    var i = 0
    var j = 0
    while (i < a.numElements() && j < b.numElements()) {
      val x = a.getLong(i)
      val y = b.getLong(j)
      if (x == y) { n += 1L; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    java.lang.Long.valueOf(n)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val n = ctx.freshName("n")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      s"""
         |long $n = 0L;
         |int $i = 0;
         |int $j = 0;
         |while ($i < $a.numElements() && $j < $b.numElements()) {
         |  long $x = $a.getLong($i);
         |  long $y = $b.getLong($j);
         |  if ($x == $y) { $n++; $i++; $j++; }
         |  else if ($x < $y) { $i++; } else { $j++; }
         |}
         |${ev.value} = $n;
         |""".stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): SortedIntersectCount =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "sorted_intersect_count"
}

object PairOps {
  def orderedPairs(a: Column): Column =
    ColumnBridge.column(OrderedPairs(ColumnBridge.expression(a)))
  def sortedIntersectCount(a: Column, b: Column): Column =
    ColumnBridge.column(SortedIntersectCount(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
