package graft.services

import org.scalatest.funsuite.AnyFunSuite
import graft.services.Publication._
import graft.snapshot.CatalogReader.SqlExecutor

/** The replica-identity WRITE path and publication read-back/reconciliation
  * (`pq/publication/replica_identity.go:33-97`, `publication.go:30-81`,
  * `table.go:112-127`), driven over a scripted SqlExecutor so the spec can
  * prove DDL is issued exactly on drift — mirroring the reference's
  * `integration_test/system_identity_full_test.go:19-352` cases without a
  * live server.
  */
class ReplicaIdentitySpec extends AnyFunSuite {

  /** Scripted executor: returns catalog rows for the identity read, records
    * everything issued.
    */
  private def scripted(
      identities: Map[(String, String), (String, Option[String])]): (SqlExecutor, () => Seq[String]) = {
    val issued = scala.collection.mutable.ArrayBuffer.empty[String]
    val exec: SqlExecutor = { sql =>
      issued += sql
      if (sql.contains("relreplident"))
        identities.toSeq.map { case ((s, t), (ident, idx)) =>
          Seq(t, s, ident, idx.orNull)
        }
      else Nil
    }
    (exec, () => issued.toSeq)
  }

  private def cfg(tables: PubTable*)(ops: Seq[String] = Publication.ValidOperations) =
    Config("pub", tables.toSeq, operations = ops)

  test("matching identities issue no DDL (TestReplicaIdentityDefault parity)") {
    val (exec, issued) = scripted(Map(("public", "books") -> (("d", None))))
    val mgr = new PublicationManager(exec,
      cfg(PubTable("public", "books", replicaIdentity = ReplicaIdentity.Default))())
    assert(mgr.setReplicaIdentities() == Nil)
    assert(issued().count(_.startsWith("ALTER TABLE")) == 0)
  }

  test("drift d→FULL issues exactly one ALTER (TestReplicaIdentityFull parity)") {
    val (exec, issued) = scripted(Map(("public", "books") -> (("d", None))))
    val mgr = new PublicationManager(exec,
      cfg(PubTable("public", "books", replicaIdentity = ReplicaIdentity.Full))())
    assert(mgr.setReplicaIdentities() ==
      Seq("""ALTER TABLE "public"."books" REPLICA IDENTITY FULL"""))
    assert(issued().count(_.startsWith("ALTER TABLE")) == 1)
  }

  test("NOTHING with update/delete ops warns but still applies (TestReplicaIdentityNothing parity)") {
    val warnings = scala.collection.mutable.ArrayBuffer.empty[String]
    val (exec, _) = scripted(Map(("public", "books") -> (("d", None))))
    val mgr = new PublicationManager(exec,
      cfg(PubTable("public", "books", replicaIdentity = ReplicaIdentity.Nothing))(),
      warn = warnings += _)
    assert(mgr.setReplicaIdentities() ==
      Seq("""ALTER TABLE "public"."books" REPLICA IDENTITY NOTHING"""))
    assert(warnings.exists(_.contains("REPLICA IDENTITY NOTHING")))

    // Insert-only publications don't warn.
    warnings.clear()
    val (exec2, _) = scripted(Map(("public", "books") -> (("n", None))))
    val insertOnly = new PublicationManager(exec2,
      cfg(PubTable("public", "books", replicaIdentity = ReplicaIdentity.Nothing))(Seq("insert")),
      warn = warnings += _)
    assert(insertOnly.setReplicaIdentities() == Nil, "already NOTHING: no DDL")
    assert(warnings.isEmpty)
  }

  test("USING INDEX drifts on identity kind AND on index name (TestReplicaIdentityUsingIndex parity)") {
    val want = PubTable("public", "books",
      replicaIdentity = ReplicaIdentity.UsingIndex,
      replicaIdentityIndex = "books_name_unique_idx")
    // Currently default → ALTER.
    val (e1, _) = scripted(Map(("public", "books") -> (("d", None))))
    assert(new PublicationManager(e1, cfg(want)()).setReplicaIdentities() ==
      Seq("""ALTER TABLE "public"."books" REPLICA IDENTITY USING INDEX "books_name_unique_idx""""))
    // Currently index, but a DIFFERENT index → ALTER.
    val (e2, _) = scripted(Map(("public", "books") -> (("i", Some("other_idx")))))
    assert(new PublicationManager(e2, cfg(want)()).setReplicaIdentities().size == 1)
    // Currently the SAME index → no DDL.
    val (e3, issued3) = scripted(Map(("public", "books") -> (("i", Some("books_name_unique_idx")))))
    assert(new PublicationManager(e3, cfg(want)()).setReplicaIdentities() == Nil)
    assert(issued3().count(_.startsWith("ALTER TABLE")) == 0)
  }

  test("missing table is an error, mirroring ErrorTablesNotExists") {
    val (exec, _) = scripted(Map.empty)
    val mgr = new PublicationManager(exec,
      cfg(PubTable("public", "ghost", replicaIdentity = ReplicaIdentity.Full))())
    val ex = intercept[IllegalStateException](mgr.setReplicaIdentities())
    assert(ex.getMessage.contains("table does not exists"))
  }

  test("tables without a configured identity are untouched — not even read") {
    var catalogReads = 0
    val exec: SqlExecutor = { sql =>
      if (sql.contains("relreplident")) catalogReads += 1
      Nil
    }
    val mgr = new PublicationManager(exec, cfg(PubTable("public", "books"))())
    assert(mgr.setReplicaIdentities() == Nil)
    assert(catalogReads == 0, "no identity configured: the catalog is not queried")
  }

  test("PubTable validation mirrors table.go:48-76") {
    intercept[IllegalArgumentException](
      PubTable("public", "t", replicaIdentity = "SOMETHING"))
    intercept[IllegalArgumentException]( // FULL excludes column lists
      PubTable("public", "t", columns = Seq("id"), replicaIdentity = ReplicaIdentity.Full))
    intercept[IllegalArgumentException]( // USING INDEX requires the index name
      PubTable("public", "t", replicaIdentity = ReplicaIdentity.UsingIndex))
    intercept[IllegalArgumentException]( // index name only valid with USING INDEX
      PubTable("public", "t", replicaIdentity = ReplicaIdentity.Full,
        replicaIdentityIndex = "idx"))
    // DEFAULT identity with a column list is the supported combination.
    PubTable("public", "t", columns = Seq("id"), replicaIdentity = ReplicaIdentity.Default)
  }
}

/** Publication read-back + reconciliation (`publication.go:56-81` Info,
  * `Create` tolerance at `publication.go:30-54`, `Tables.Diff` at
  * `table.go:112-127`).
  */
class PublicationInfoSpec extends AnyFunSuite {
  import Publication._

  private val conf = Config("graft_pub",
    Seq(PubTable("public", "users"), PubTable("public", "orders")),
    operations = Seq("insert", "update"))

  private def infoRow(
      ops: (Boolean, Boolean, Boolean, Boolean),
      tables: String): Seq[Seq[String]] = {
    def b(v: Boolean) = if (v) "t" else "f"
    Seq(Seq("graft_pub", "f", b(ops._1), b(ops._2), b(ops._3), b(ops._4), tables))
  }

  test("info decodes pubname, operation flags, and the tables array") {
    val exec: SqlExecutor = { sql =>
      assert(sql.contains("pg_publication_tables"))
      infoRow((true, true, false, false), "{public.users,\"public.Order Items\"}")
    }
    val live = new PublicationManager(exec, conf).info().get
    assert(live.name == "graft_pub")
    assert(!live.allTables)
    assert(live.operations == Seq("insert", "update"))
    assert(live.tables == Seq(("public", "users"), ("public", "Order Items")))
  }

  test("info: zero rows or SQLSTATE 42703 → publication does not exist") {
    assert(new PublicationManager(_ => Nil, conf).info().isEmpty)
    val err: SqlExecutor =
      _ => throw new java.sql.SQLException("column does not exist", "42703")
    assert(new PublicationManager(err, conf).info().isEmpty)
  }

  test("create is idempotent: existing publication → warn + live info, no CREATE issued") {
    val issued = scala.collection.mutable.ArrayBuffer.empty[String]
    val warnings = scala.collection.mutable.ArrayBuffer.empty[String]
    val exec: SqlExecutor = { sql =>
      issued += sql
      if (sql.contains("pg_publication_tables"))
        infoRow((true, true, true, true), "{public.users}")
      else Nil
    }
    val live = new PublicationManager(exec, conf, warn = warnings += _).create()
    assert(live.tables == Seq(("public", "users")))
    assert(warnings.exists(_.contains("already exists")))
    assert(!issued.exists(_.startsWith("CREATE PUBLICATION")))
  }

  test("create issues DDL when missing; errors when createIfNotExists=false") {
    val issued = scala.collection.mutable.ArrayBuffer.empty[String]
    val exec: SqlExecutor = { sql => issued += sql; Nil }
    val live = new PublicationManager(exec, conf).create()
    assert(issued.exists(_.startsWith("CREATE PUBLICATION")))
    assert(live.tables == Seq(("public", "users"), ("public", "orders")))

    val strict = conf.copy(createIfNotExists = false)
    val ex = intercept[IllegalStateException](
      new PublicationManager(_ => Nil, strict).create())
    assert(ex.getMessage.contains("not exists"))
  }

  test("drift reports table and operation divergence both ways") {
    val exec: SqlExecutor = { _ =>
      infoRow((true, false, true, false), "{public.users,public.legacy}")
    }
    val d = new PublicationManager(exec, conf).drift().get
    assert(d.missingTables == Seq(("public", "orders")))
    assert(d.extraTables == Seq(("public", "legacy")))
    assert(d.missingOperations == Seq("update"))
    assert(d.extraOperations == Seq("delete"))
    assert(!d.isEmpty)

    val clean: SqlExecutor = { _ =>
      infoRow((true, true, false, false), "{public.users,public.orders}")
    }
    assert(new PublicationManager(clean, conf).drift().get.isEmpty)
  }
}
