package graft.sinks

import java.nio.file.Files
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase
import graft.cdc.ChangeEvent

/** The signed-delta maintained inner join — Δout = ΔL⋈R_new + L_new⋈ΔR
  * − ΔL⋈ΔR applied to a pair-refcount state: every refresh checked
  * against a direct latestState-join recompute, including the shapes
  * the algebra must get right with no flags (join-key-changing
  * updates, BOTH sides churning the same key in ONE span, telescoped
  * multi-update spans), plus replay idempotence, truncate/seed
  * rebuilds through BASE, the REPLICA IDENTITY FULL refusal, and the
  * hot-key write pin the whole class exists for.
  */
class MaintainedDeltaJoinSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  private def envelope(rows: Seq[Row]) =
    spark.createDataFrame(
      new java.util.ArrayList[Row](
        scala.jdk.CollectionConverters.SeqHasAsJava(rows).asJava),
      ChangeEvent.schema)

  private val T = new java.sql.Timestamp(1700000000000L)
  private def ev(lsn: Long, op: String, table: String, keys: Seq[String],
      before: Map[String, String], after: Map[String, String]): Row =
    Row(lsn, lsn, 7L, op, "public", table, T, T, keys, before, after)

  private def user(id: String, name: String): Map[String, String] =
    Map("id" -> id, "name" -> name)
  private def order(oid: String, uid: String, amt: String): Map[String, String] =
    Map("oid" -> oid, "uid" -> uid, "amt" -> amt)

  private def withJoin(subs: Int = 1, rowKeyFlag: Boolean = false,
      immFlag: Boolean = false)(
      body: (LakeSink, MaintainedDeltaJoin) => Unit): Unit = {
    val dir = Files.createTempDirectory("lake-dj").toString
    try {
      val sink = new LakeSink(dir)
      val dj = new MaintainedDeltaJoin(sink,
        ("public", "u"), ("public", "o"),
        im => element_at(im, "id"), im => element_at(im, "uid"),
        "dj_orders", stateBuckets = 4, subBuckets = subs,
        leftKeyIsRowKey = rowKeyFlag,
        rightKeyImmutable = immFlag, rightKeyCol = Some("uid"))
      body(sink, dj)
    } finally org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
  }

  private def joinSet(dj: MaintainedDeltaJoin): Set[(String, String, String)] =
    dj.read(spark).collect().map { r =>
      val l = r.getMap[String, String](1)
      val rr = r.getMap[String, String](2)
      (rr("oid"), l("name"), rr("amt"))
    }.toSet

  /** Direct recompute: latestState ⋈ latestState — the oracle. */
  private def expected(sink: LakeSink): Set[(String, String, String)] = {
    val u = sink.latestState(spark, "public", "u")
      .select(element_at(col("after"), "id").as("jk"),
        element_at(col("after"), "name").as("name"))
    val o = sink.latestState(spark, "public", "o")
      .select(element_at(col("after"), "uid").as("jk"),
        element_at(col("after"), "oid").as("oid"),
        element_at(col("after"), "amt").as("amt"))
    u.join(o, "jk").collect()
      .map(r => (r.getString(2), r.getString(1), r.getString(3))).toSet
  }

  test("delta algebra maintains the join through churn, key moves, and same-span both-side churn") {
    withJoin() { (sink, dj) =>
      assert(joinSet(dj).isEmpty)
      sink.appendBatch(envelope(Seq(
        ev(1, "insert", "u", Seq("id"), null, user("1", "alice")),
        ev(2, "insert", "u", Seq("id"), null, user("2", "bo")),
        ev(3, "insert", "o", Seq("oid"), null, order("a", "1", "10")),
        ev(4, "insert", "o", Seq("oid"), null, order("b", "1", "20")),
        ev(5, "insert", "o", Seq("oid"), null, order("c", "2", "30")))), 0L)
      assert(dj.refresh(spark) == 1)
      assert(joinSet(dj) == Set(
        ("a", "alice", "10"), ("b", "alice", "20"), ("c", "bo", "30")))
      assert(joinSet(dj) == expected(sink))
      assert(dj.refresh(spark) == 0, "replay: nothing new, nothing applied")

      // the no-flag shapes: left image update, order moving users
      // (JOIN-KEY-CHANGING update), and BOTH sides of user 2 churning in
      // the SAME span (the ΔL⋈ΔR cross-term's reason to exist)
      sink.appendBatch(envelope(Seq(
        ev(6, "update", "u", Seq("id"), user("1", "alice"), user("1", "alix")),
        ev(7, "update", "o", Seq("oid"), order("c", "2", "30"),
          order("c", "1", "30")),
        ev(8, "update", "u", Seq("id"), user("2", "bo"), user("2", "beau")),
        ev(9, "insert", "o", Seq("oid"), null, order("d", "2", "40")))), 1L)
      assert(dj.refresh(spark) == 1)
      assert(joinSet(dj) == Set(
        ("a", "alix", "10"), ("b", "alix", "20"), ("c", "alix", "30"),
        ("d", "beau", "40")))
      assert(joinSet(dj) == expected(sink))

      // telescoped multi-update of one row inside ONE span, plus deletes
      sink.appendBatch(envelope(Seq(
        ev(10, "update", "o", Seq("oid"), order("d", "2", "40"),
          order("d", "2", "41")),
        ev(11, "update", "o", Seq("oid"), order("d", "2", "41"),
          order("d", "2", "42")),
        ev(12, "delete", "o", Seq("oid"), order("b", "1", "20"), null),
        ev(13, "delete", "u", Seq("id"), user("1", "alix"), null))), 2L)
      assert(dj.refresh(spark) == 1)
      assert(joinSet(dj) == Set(("d", "beau", "42")))
      assert(joinSet(dj) == expected(sink))
    }
  }

  test("row-key-restricted fold tier gives the same answers; a wrong flag fails loud") {
    withJoin(rowKeyFlag = true) { (sink, dj) =>
      // leftKey (id) IS u's replica key — the restricted tier serves
      sink.appendBatch(envelope(Seq(
        ev(1, "insert", "u", Seq("id"), null, user("1", "ann")),
        ev(2, "insert", "o", Seq("oid"), null, order("a", "1", "5")))), 0L)
      assert(dj.refresh(spark) == 1)
      sink.appendBatch(envelope(Seq(
        ev(3, "insert", "o", Seq("oid"), null, order("b", "1", "6")),
        ev(4, "update", "u", Seq("id"), user("1", "ann"), user("1", "anne")))), 1L)
      assert(dj.refresh(spark) == 1)
      assert(joinSet(dj) == Set(("a", "anne", "5"), ("b", "anne", "6")))
      assert(joinSet(dj) == expected(sink))
      // a span whose u events carry a DIFFERENT identity shape trips the
      // flag validation before any state advances
      sink.appendBatch(envelope(Seq(
        ev(5, "insert", "u", Seq("id", "name"), null, user("9", "zed")))), 2L)
      val e = intercept[IllegalStateException] { dj.refresh(spark) }
      assert(e.getMessage.contains("KeyIsRowKey"), e.getMessage)
    }
  }

  test("immutable-tier pruned fold gives the same answers; a key-changing update under the flag refuses") {
    withJoin(immFlag = true) { (sink, dj) =>
      sink.appendBatch(envelope(Seq(
        ev(1, "insert", "u", Seq("id"), null, user("1", "ann")),
        ev(2, "insert", "u", Seq("id"), null, user("2", "bob")),
        ev(3, "insert", "o", Seq("oid"), null, order("a", "1", "5")),
        ev(4, "insert", "o", Seq("oid"), null, order("b", "2", "6")))), 0L)
      assert(dj.refresh(spark) == 1)
      // a LEFT-side churn routes the right side through the
      // immutable-restricted fold (pruned to the churned jk)
      sink.appendBatch(envelope(Seq(
        ev(5, "update", "u", Seq("id"), user("1", "ann"), user("1", "anne")))), 1L)
      assert(dj.refresh(spark) == 1)
      assert(joinSet(dj) == Set(("a", "anne", "5"), ("b", "bob", "6")))
      assert(joinSet(dj) == expected(sink))
      // the tier's price: a uid-CHANGING order update violates the
      // declared immutability and refuses (the flagless join handles
      // key moves natively — drop the flag where keys move)
      sink.appendBatch(envelope(Seq(
        ev(6, "update", "o", Seq("oid"), order("b", "2", "6"),
          order("b", "1", "6")))), 2L)
      val e = intercept[IllegalStateException] { dj.refresh(spark) }
      assert(e.getMessage.contains("KeyImmutable"), e.getMessage)
    }
  }

  test("REPLICA IDENTITY FULL is enforced: a before-less update refuses") {
    withJoin() { (sink, dj) =>
      sink.appendBatch(envelope(Seq(
        ev(1, "insert", "u", Seq("id"), null, user("1", "ann")))), 0L)
      assert(dj.refresh(spark) == 1)
      sink.appendBatch(envelope(Seq(
        ev(2, "update", "u", Seq("id"), null, user("1", "anna")))), 1L)
      val e = intercept[IllegalStateException] { dj.refresh(spark) }
      assert(e.getMessage.contains("REPLICA IDENTITY FULL"), e.getMessage)
    }
  }

  test("truncate rebuilds at the boundary; seed reads through BASE after compact+vacuum") {
    withJoin() { (sink, dj) =>
      sink.appendBatch(envelope(Seq(
        ev(1, "insert", "u", Seq("id"), null, user("1", "ann")),
        ev(2, "insert", "o", Seq("oid"), null, order("a", "1", "5")),
        ev(3, "insert", "o", Seq("oid"), null, order("b", "1", "6")))), 0L)
      // compact + vacuum BEFORE the first refresh: the consumer must
      // re-bootstrap (seedCursor) and the seed then folds through BASE —
      // no surviving changelog row mentions these rows
      sink.compact(spark)
      sink.vacuum(spark)
      sink.seedCursor(spark, "djoin_dj_orders")
      sink.appendBatch(envelope(Seq(
        ev(4, "insert", "o", Seq("oid"), null, order("c", "1", "9")))), 1L)
      assert(dj.refresh(spark) == 1)
      assert(joinSet(dj) == Set(
        ("a", "ann", "5"), ("b", "ann", "6"), ("c", "ann", "9")))
      // truncate the orders side mid-stream → rebuild at the boundary
      sink.appendBatch(envelope(Seq(
        Row(10L, 10L, 7L, "truncate", "public", "o", T, T, null, null, null),
        ev(11, "insert", "o", Seq("oid"), null, order("z", "1", "7")))), 2L)
      assert(dj.refresh(spark) == 1)
      assert(joinSet(dj) == Set(("z", "ann", "7")))
      assert(joinSet(dj) == expected(sink))
    }
  }

  test("hot join key: refresh write and merge input are delta-proportional, sub-slice-bounded") {
    withJoin(subs = 8) { (sink, dj) =>
      val FACTS = 120
      // ONE user with 120 orders — every pair lives in hash(jk)'s bucket
      sink.appendBatch(envelope(
        Seq(ev(0, "insert", "u", Seq("id"), null, user("1", "hot"))) ++
          (1 to FACTS).map(i => ev(i.toLong, "insert", "o", Seq("oid"), null,
            order(s"o$i", "1", i.toString)))), 0L)
      assert(dj.refresh(spark) == 1)
      // churn ONE fact row
      sink.appendBatch(envelope(Seq(
        ev(1000, "update", "o", Seq("oid"), order("o5", "1", "5"),
          order("o5", "1", "999")))), 1L)
      assert(dj.refresh(spark) == 1)
      assert(joinSet(dj).size == FACTS)
      assert(joinSet(dj) == expected(sink))
      // the churn version's own slices hold only the dirty sub-slices'
      // merged pairs — NOT the hot key's 120 pairs
      val states = dj.stateLog
      val f = states.fs(spark)
      val churnKey = dj.latestKey(spark).get
      val vName = s"v${IntervalKeys.name(churnKey)}"
      val (written, carried) =
        states.entries(f, churnKey).partition(_._2.startsWith(vName))
      assert(carried.nonEmpty, "clean sub-slices of the hot bucket must carry")
      val writtenRows = written.values.toSeq match {
        case Nil => 0L
        case rels => spark.read
          .schema(dj.stateSchema)
          .parquet(rels.map(r => new org.apache.hadoop.fs.Path(
            new org.apache.hadoop.fs.Path(sink.root, "_graft_djoins/dj_orders"),
            r).toString): _*).count()
      }
      assert(writtenRows > 0 && writtenRows <= FACTS / 4,
        s"hot-key churn must rewrite ~1/8 of the bucket, wrote " +
          s"$writtenRows of $FACTS pairs")
    }
  }
}
