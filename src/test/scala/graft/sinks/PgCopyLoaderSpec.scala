package graft.sinks

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase
import graft.streaming.FakeWalsender

/** COPY FROM STDIN over a real socket to the fake server: the loader's
  * per-partition bulk channel, the text-format escaping contract, and the
  * confirmed row count.
  */
class PgCopyLoaderSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  test("copyIn streams escaped text rows and returns the server's count") {
    val server = new FakeWalsender(Seq.empty)
    try {
      val conn = new graft.pgproto.PgConnection(
        "127.0.0.1", server.port, "u", "db", None)
      try {
        val rows = Iterator(
          Seq(Some("1"), Some("plain")),
          Seq(Some("2"), None), // SQL NULL -> \N
          Seq(Some("3"), Some("tab\there, line\nbreak, back\\slash")))
        val n = conn.copyIn(
          """COPY "public"."t" ("id", "v") FROM STDIN""", rows)
        assert(n == 3L, "server-confirmed count")
      } finally conn.close()
      val got = server.copiedRows.synchronized(server.copiedRows.toVector)
      assert(got.map(_._2) == Vector(
        Seq(Some("1"), Some("plain")),
        Seq(Some("2"), None),
        Seq(Some("3"), Some("tab\there, line\nbreak, back\\slash"))),
        s"escaping must round-trip: $got")
      assert(got.forall(_._1.startsWith("""COPY "public"."t"""")))
    } finally server.close()
  }

  test("load() bulk-loads a typed frame partition-parallel") {
    val server = new FakeWalsender(Seq.empty, sqlResults = { sql =>
      if (sql == "BEGIN" || sql == "COMMIT")
        Some((Seq("ok"), Seq.empty[Seq[Option[String]]]))
      else None
    })
    try {
      import spark.implicits._
      val df = (1 to 100).map(i =>
        (i.toLong, s"name$i", if (i % 7 == 0) null else s"v$i"))
        .toDF("id", "name", "v").repartition(4)
      val n = PgCopyLoader.load(df, "public", "users",
        "127.0.0.1", server.port, "u", "db", None)
      assert(n == 100L, "all partitions' counts summed")
      val got = server.copiedRows.synchronized(server.copiedRows.toVector)
      assert(got.size == 100)
      val byId = got.map(_._2).map(r => r.head.get.toLong -> r).toMap
      assert(byId(7L)(2).isEmpty, "null column travels as SQL NULL")
      assert(byId(42L)(1).contains("name42"))
      // each non-empty partition used its own COPY channel
      assert(got.map(_._1).distinct.head.contains("\"users\""))
      // every partition's COPY ran inside a transaction bracket, so a
      // failed task's partial rows roll back before Spark retries it
      val qs = server.queries.synchronized(server.queries.toVector)
      assert(qs.count(_ == "BEGIN") == qs.count(_ == "COMMIT"),
        s"unbalanced transaction brackets: $qs")
      assert(qs.count(_ == "BEGIN") >= 1 && qs.count(_ == "BEGIN") <= 4,
        "one bracket per non-empty partition")
    } finally server.close()
  }
}
