package graft.sinks

import org.apache.spark.sql.Row
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
    // the r15 probe bug slipped through a Catalyst-tree walk: pre-analysis
    // the bridged expression is one lazy ColumnNodeExpression leaf (and
    // semanticEquals is always false on unresolved trees), so both the
    // probe and the old assertion were vacuous. The COLUMN-NODE walk sees
    // the real shape — the same one Spark's checkTrivialPredicate warns on.
    val trivial = ColumnBridge.trivialEqualities(c)
    assert(trivial.isEmpty,
      s"vacuous self-comparison survives in the contract predicate: $trivial")
  }

  test("a groupIsImmutable refresh with a verbatim extractor logs ZERO trivially-true WARNs") {
    // end-to-end storm check: capture WARNs through a log4j2 appender
    // while a real groupIsImmutable MaintainedView (verbatim element_at
    // extractor — the common declaration) refreshes over churn that
    // takes the dirty-group recompute path. Spark's Column.===/<=> logs
    // "Constructing trivially true equals predicate" whenever both sides
    // compare node-equal; one WARN here means the skip probe regressed
    // and every span scan at scale re-emits the storm that previously
    // threatened the bench stdout capture.
    import org.apache.logging.log4j.{Level, LogManager}
    import org.apache.logging.log4j.core.LoggerContext
    import org.apache.logging.log4j.core.appender.AbstractAppender
    import org.apache.logging.log4j.core.config.Property
    val captured = java.util.Collections.synchronizedList(
      new java.util.ArrayList[String]())
    val app = new AbstractAppender(
      "graft-warn-capture", null, null, false, Property.EMPTY_ARRAY) {
      override def append(e: org.apache.logging.log4j.core.LogEvent): Unit = {
        captured.add(e.getMessage.getFormattedMessage); ()
      }
    }
    app.start()
    val ctx = LogManager.getContext(false).asInstanceOf[LoggerContext]
    val cfg = ctx.getConfiguration
    cfg.getRootLogger.addAppender(app, Level.WARN, null)
    ctx.updateLoggers()
    val dir = java.nio.file.Files.createTempDirectory("lake-warncap").toString
    try {
      val sink = new LakeSink(dir, baseBuckets = 4)
      val vEx: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
        im => element_at(im, "v").cast("long")
      val mv = new MaintainedView(sink,
        new graft.operators.IncrementalAgg(
          group = Seq("grp" -> (im => element_at(im, "grp"))),
          sums = Nil, mins = Seq("v" -> vEx)),
        "public", "users", "warncap",
        stateBuckets = 4, groupIsImmutable = true, groupCol = Some("grp"))
      def im(id: String, grp: String, v: String) =
        Map("id" -> id, "grp" -> grp, "v" -> v)
      sink.appendBatch(envelope(Seq(
        ev("insert", null, im("1", "a", "1")),
        ev("insert", null, im("2", "a", "5")))), 0L)
      assert(mv.refresh(spark) == 1)
      // min retraction → dirty group → the restricted recompute span scan
      sink.appendBatch(envelope(Seq(
        ev("delete", im("1", "a", "1"), null))), 1L)
      assert(mv.refresh(spark) == 1)
    } finally {
      cfg.getRootLogger.removeAppender("graft-warn-capture")
      ctx.updateLoggers()
      app.stop()
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
    val storms = scala.jdk.CollectionConverters.ListHasAsScala(captured)
      .asScala.filter(_.contains("trivially true"))
    assert(storms.isEmpty,
      s"trivially-true WARN storm regressed (${storms.size} WARNs): ${storms.headOption}")
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
