package graft.functions

import graft.SparkTestBase
import org.scalatest.funsuite.AnyFunSuite

class GraftFunctionsSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  test("custom expressions are callable from SQL after registration") {
    GraftFunctions.register(spark)
    assert(spark.sql("SELECT graft_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d")
      .head().getDouble(0) == 11.0)
    val arr = spark.sql("""SELECT pg_text_array('{a,NULL,"c,d"}') AS a""")
      .head().getSeq[String](0)
    assert(arr == Seq("a", null, "c,d"))
    val sig = spark.sql("SELECT graft_simhash(array('spark', 'join', 'spark')) AS s")
      .head().getLong(0)
    // deterministic and equal to the DataFrame-API expression path
    import org.apache.spark.sql.graftbridge.ColumnBridge
    import org.apache.spark.sql.functions._
    val viaApi = spark.range(1)
      .select(ColumnBridge.column(SimHash(ColumnBridge.expression(
        array(lit("spark"), lit("join"), lit("spark"))))).as("s"))
      .head().getLong(0)
    assert(sig == viaApi && (sig >>> 60) == 0L)
  }

  test("arity errors surface at analysis time") {
    GraftFunctions.register(spark)
    val e = intercept[Exception](spark.sql("SELECT graft_dot(array(1.0d))").collect())
    assert(e.getMessage.contains("2 arguments") || e.getMessage.contains("graft_dot"))
  }
}
