package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** Quote/escape-aware pg array text parsing — the previously-TODO'd cases. */
class PgTextArraySpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  test("parser handles quotes, escapes, embedded commas, NULL vs \"NULL\"") {
    assert(PgTextArray.parse("{a,b,c}").toSeq == Seq("a", "b", "c"))
    assert(PgTextArray.parse("{}").isEmpty)
    assert(PgTextArray.parse("{a,NULL,b}").toSeq == Seq("a", null, "b"))
    assert(PgTextArray.parse("""{"NULL"}""").toSeq == Seq("NULL"), "quoted NULL is the string")
    assert(PgTextArray.parse("""{"c,d",e}""").toSeq == Seq("c,d", "e"))
    assert(PgTextArray.parse("""{"he said \"hi\"","back\\slash"}""").toSeq ==
      Seq("""he said "hi"""", """back\slash"""))
    assert(PgTextArray.parse("""{"{not,nested}"}""").toSeq == Seq("{not,nested}"))
    assert(PgTextArray.parse("{\"\",x}").toSeq == Seq("", "x"), "quoted empty string element")
    assert(intercept[IllegalArgumentException](PgTextArray.parse("not-an-array"))
      .getMessage.contains("malformed"))
    assert(intercept[IllegalArgumentException](PgTextArray.parse("""{"unterminated}"""))
      .getMessage.contains("unterminated"))
  }

  test("expression evaluates inside a query with typed casting downstream") {
    import spark.implicits._
    val df = Seq("""{1,2,NULL}""", """{7}""", null).toDF("raw")
    val out = df.select(
      graft.types.PgTypes.textArrayFromText(col("raw")).cast("array<int>").as("a"))
      .collect()
    assert(out(0).getSeq[Any](0) == Seq(1, 2, null))
    assert(out(1).getSeq[Any](0) == Seq(7))
    assert(out(2).isNullAt(0))
  }
}
