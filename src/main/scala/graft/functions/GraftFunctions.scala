package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.graftbridge.PlanBridge

/** SQL surface for graft's custom Catalyst expressions: `graft_simhash`,
  * `graft_dot`, `pg_text_array` become callable from `spark.sql(...)` —
  * injected session-wide by [[graft.plans.GraftExtensions]], or per-session
  * via [[GraftFunctions.register]]. The builders hand the raw child
  * expressions straight to the native nodes, so SQL callers get the same
  * codegen'd single-pass kernels as the DataFrame API (no UDF wrapping,
  * no serialization boundary).
  */
object GraftFunctions {

  private def info(clazz: Class[_], name: String, usage: String) =
    new ExpressionInfo(clazz.getName, null, name, usage, "", "", "", "", "", "", "built-in")

  private def one(name: String)(f: Expression => Expression): Seq[Expression] => Expression = {
    case Seq(c) => f(c)
    case args => throw new IllegalArgumentException(
      s"$name expects 1 argument, got ${args.size}")
  }

  val all: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("graft_simhash"),
      info(classOf[SimHash], "graft_simhash",
        "graft_simhash(array<string>) - 60-bit SimHash signature of a token array"),
      one("graft_simhash")(SimHash(_))),
    (FunctionIdentifier("pg_text_array"),
      info(classOf[PgTextArray], "pg_text_array",
        "pg_text_array(string) - parse a PostgreSQL text-array literal into array<string>"),
      one("pg_text_array")(PgTextArray(_))),
    (FunctionIdentifier("graft_dot"),
      info(classOf[DotProduct], "graft_dot",
        "graft_dot(array<double>, array<double>) - dot product of two vectors"),
      {
        case Seq(a, b) => DotProduct(a, b)
        case args => throw new IllegalArgumentException(
          s"graft_dot expects 2 arguments, got ${args.size}")
      }))

  /** Idempotent (registerFunction overwrites) per-session registration. */
  def register(s: SparkSession): Unit =
    all.foreach { case (id, inf, builder) => PlanBridge.registerFunction(s, id, inf, builder) }
}
