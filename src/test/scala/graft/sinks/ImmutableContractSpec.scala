package graft.sinks

import org.apache.spark.sql.Row
import org.apache.spark.sql.catalyst.expressions.{EqualNullSafe, EqualTo}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase
import graft.cdc.ChangeEvent

/** Unit pins for [[ImmutableContract.violation]] — the one shared spelling
  * of the declared-immutable-column contract.
  */
class ImmutableContractSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  private def envelope(rows: Seq[Row]) =
    spark.createDataFrame(
      new java.util.ArrayList[Row](
        scala.jdk.CollectionConverters.SeqHasAsJava(rows).asJava),
      ChangeEvent.schema)

  private val T = new java.sql.Timestamp(1700000000000L)
  private def ev(op: String, before: Map[String, String],
      after: Map[String, String]): Row =
    Row(1L, 1L, 7L, op, "public", "users", T, T, Seq("id"), before, after)

  private def violations(rows: Row*): Long = {
    val c = ImmutableContract.violation(
      lit(true), im => element_at(im, "grp"), "grp")
    envelope(rows).filter(c).count()
  }

  test("identity extractor builds no trivially-true equals predicate") {
    // the misdeclared-column disjunct compares the extractor against
    // element_at of the declared column; for the common verbatim-
    // element_at extractor that comparison is vacuously true and Spark
    // logs a "Constructing trivially true equals predicate" WARN per
    // span scan — a storm that previously sat directly above the bench
    // stdout JSON. The contract must skip the disjunct instead.
    val c = ImmutableContract.violation(
      lit(true), im => element_at(im, "grp"), "grp")
    val trivial = ColumnBridge.expression(c).collect {
      case e: EqualNullSafe if e.left.semanticEquals(e.right) => e
      case e: EqualTo if e.left.semanticEquals(e.right) => e
    }
    assert(trivial.isEmpty,
      s"vacuous self-comparison survives in the contract predicate: $trivial")
  }

  test("identity extractor still flags the real violations") {
    // skipping the vacuous misdeclared disjunct must not weaken the rest
    assert(violations(
      ev("update", Map("id" -> "1", "grp" -> "a"), Map("id" -> "1", "grp" -> "b"))) == 1,
      "value-changing update flags")
    assert(violations(
      ev("delete", Map("id" -> "1"), null)) == 1,
      "column-less delete image flags")
    assert(violations(
      ev("insert", null, Map("id" -> "1", "grp" -> "a")),
      ev("update", Map("id" -> "1", "grp" -> "a"), Map("id" -> "1", "grp" -> "a")),
      ev("delete", Map("id" -> "1", "grp" -> "a"), null)) == 0,
      "a clean history is violation-free")
  }

  test("update after image lacking the declared column flags (TOAST omission)") {
    // under REPLICA IDENTITY DEFAULT an update carries no before image;
    // if its after image also omits the declared column (unchanged-TOAST
    // omission) the restricted fold would silently drop that version and
    // serve the stale older image — the contract fails loud instead,
    // like the delete case
    assert(violations(
      ev("update", null, Map("id" -> "1", "v" -> "9"))) == 1,
      "after image missing the column flags")
    // present-with-NULL stays benign (nullable column, genuinely NULL)
    assert(violations(
      ev("update", null, Map("id" -> "1", "grp" -> null, "v" -> "9"))) == 0,
      "after image carrying the column with NULL is benign")
  }

  test("misdeclared non-identity extractor still flags") {
    // an extractor reading a DIFFERENT column than declared would make
    // the delete check vacuous — the mismatch itself must flag wherever
    // an image carries the declared column
    val c = ImmutableContract.violation(
      lit(true), im => element_at(im, "v"), "grp")
    val n = envelope(Seq(
      ev("insert", null, Map("id" -> "1", "grp" -> "a", "v" -> "3"))))
      .filter(c).count()
    assert(n == 1, "extractor/declaration mismatch flags")
  }
}
