package graft.services

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.snapshot.CatalogReader.SqlExecutor

/** Publication configuration + DDL (P1/P2/P3/P7 control plane — reference
  * `pq/publication/config.go:40-61`, `operation.go`): which tables and DML
  * kinds the server publishes, optional column lists, and
  * `publish_via_partition_root` so partitioned tables' events arrive under
  * the ROOT table name (P7).
  */
object Publication {

  val ValidOperations = Seq("insert", "update", "delete", "truncate")

  /** Replica-identity settings a table can request — the reference's word
    * constants (`pq/publication/replica_identity.go:15-20`) plus the
    * `relreplident` char mapping (`replica_identity.go:25-30`).
    */
  object ReplicaIdentity {
    val Default = "DEFAULT"
    val Full = "FULL"
    val Nothing = "NOTHING"
    val UsingIndex = "USING INDEX"
    val Options: Seq[String] = Seq(Default, Full, Nothing, UsingIndex)
    val FromChar: Map[String, String] =
      Map("d" -> Default, "f" -> Full, "n" -> Nothing, "i" -> UsingIndex)
  }

  final case class PubTable(
      schema: String,
      name: String,
      columns: Seq[String] = Nil,
      partitioned: Boolean = false,
      /** Desired replica identity (`ReplicaIdentity.Options`); empty = leave
        * the table's current setting alone (`replica_identity.go:36-38`).
        */
      replicaIdentity: String = "",
      /** Index name, required iff replicaIdentity is USING INDEX
        * (`publication/table.go:61-67`).
        */
      replicaIdentityIndex: String = "") {
    require(replicaIdentity.isEmpty || ReplicaIdentity.Options.contains(replicaIdentity),
      s"undefined replica identity '$replicaIdentity' " +
        s"(valid: ${ReplicaIdentity.Options.mkString(", ")})")
    require(!(replicaIdentity == ReplicaIdentity.Full && columns.nonEmpty),
      "cannot specify columns when replica identity is FULL (publication column " +
        "lists require DEFAULT identity)")
    require(replicaIdentity != ReplicaIdentity.UsingIndex || replicaIdentityIndex.trim.nonEmpty,
      "replicaIdentityIndex required when replicaIdentity is USING INDEX")
    require(replicaIdentity == ReplicaIdentity.UsingIndex || replicaIdentityIndex.trim.isEmpty,
      "replicaIdentityIndex can only be set when replicaIdentity is USING INDEX")
  }

  final case class Config(
      name: String,
      tables: Seq[PubTable],
      operations: Seq[String] = ValidOperations,
      createIfNotExists: Boolean = true) {
    require(name.nonEmpty, "publication name required")
    require(tables.nonEmpty, "publication needs at least one table")
    private val bad = operations.filterNot(ValidOperations.contains)
    require(bad.isEmpty, s"invalid publication operations: ${bad.mkString(",")} " +
      s"(valid: ${ValidOperations.mkString(",")})")
    require(operations.nonEmpty, "publication needs at least one operation")

    /** `CREATE PUBLICATION … FOR TABLE … WITH (publish, publish_via_partition_root)`
      * (`config.go:40-61`): the partition-root flag is set when ANY published
      * table is partitioned — the server then emits partition rows under the
      * root relation.
      */
    def createQuery: String = {
      val quoted = tables.map { t =>
        val base = s"${quoteIdent(t.schema)}.${quoteIdent(t.name)}"
        if (t.columns.nonEmpty)
          s"$base(${t.columns.map(quoteIdent).mkString(", ")})"
        else base
      }
      s"CREATE PUBLICATION ${quoteIdent(name)} FOR TABLE ${quoted.mkString(", ")}" +
        s" WITH (publish = '${operations.mkString(", ")}', " +
        s"publish_via_partition_root = ${tables.exists(_.partitioned)})"
    }

    def dropQuery: String = s"DROP PUBLICATION IF EXISTS ${quoteIdent(name)}"

    /** Live-publication read-back (`pq/publication/config.go:63-93`): the
      * pg_publication row joined with an array_agg of its
      * pg_publication_tables entries — one row, or zero when the publication
      * doesn't exist.
      */
    def infoQuery: String = {
      val lit = graft.snapshot.CatalogReader.sqlLiteral(name)
      s"""WITH publication_details AS (
         |  SELECT p.oid AS pubid, p.pubname, p.puballtables,
         |         p.pubinsert, p.pubupdate, p.pubdelete, p.pubtruncate
         |  FROM pg_publication p WHERE p.pubname = $lit
         |), expanded_tables AS (
         |  SELECT pubname, array_agg(schemaname || '.' || tablename) AS tables
         |  FROM pg_publication_tables WHERE pubname = $lit GROUP BY pubname
         |)
         |SELECT pd.pubname, pd.puballtables, pd.pubinsert, pd.pubupdate,
         |       pd.pubdelete, pd.pubtruncate,
         |       COALESCE(et.tables, ARRAY[]::text[]) AS pubtables
         |FROM publication_details pd
         |LEFT JOIN expanded_tables et ON pd.pubname = et.pubname""".stripMargin
    }
  }

  /** What the server currently publishes — decoded `infoQuery` output
    * (`publication.go:83-134`). Tables carry (schema, name) only;
    * pg_publication_tables doesn't expose column lists or the
    * partition-root flag.
    */
  final case class LiveInfo(
      name: String,
      allTables: Boolean,
      operations: Seq[String],
      tables: Seq[(String, String)])

  /** Drift between the configured publication and the live one — the
    * `Tables.Diff` idea (`publication/table.go:112-127`) surfaced as a
    * report the operator can act on.
    */
  final case class Drift(
      missingTables: Seq[(String, String)],
      extraTables: Seq[(String, String)],
      missingOperations: Seq[String],
      extraOperations: Seq[String]) {
    def isEmpty: Boolean =
      missingTables.isEmpty && extraTables.isEmpty &&
        missingOperations.isEmpty && extraOperations.isEmpty
  }

  def quoteIdent(s: String): String = graft.snapshot.CatalogReader.quoteIdent(s)

  /** Client-side table renaming — the consumer half of P7/S6: rewrite a
    * change-event frame's (schema, table) through a physical→logical mapping
    * (partition → root, or TimescaleDB chunk → hypertable). A literal-map
    * lookup with fallthrough, fully codegen'd; the mapping is small (one
    * entry per physical partition/chunk), so it rides in the plan.
    */
  def renameTables(df: DataFrame, mapping: Map[(String, String), (String, String)]): DataFrame = {
    if (mapping.isEmpty) return df
    // Both rewrites key on the ORIGINAL (schema, table) pair, so they must be
    // computed in one projection (sequential withColumn would key the table
    // lookup on the already-rewritten schema).
    val key = concat(col("schema"), lit("."), col("table"))
    def lookup(pick: ((String, String)) => String): Column =
      map(mapping.toSeq.flatMap { case (k, v) =>
        Seq(lit(k._1 + "." + k._2), lit(pick(v)))
      }: _*)(key)
    df.select(df.columns.map {
      case "schema" => coalesce(lookup(_._1), col("schema")).as("schema")
      case "table" => coalesce(lookup(_._2), col("table")).as("table")
      case c => col(c)
    }.toSeq: _*)
  }
}

/** Publication control plane over the SqlExecutor seam — the reference's
  * `publication.Publication` struct (`pq/publication/publication.go:21-54`):
  * read-back of the live publication, drift reporting against the configured
  * one, create-if-not-exists tolerance, and the replica-identity WRITE path
  * (`pq/publication/replica_identity.go:33-97`) that diffs desired vs
  * `pg_class.relreplident` and issues `ALTER TABLE … REPLICA IDENTITY …`
  * only on drift.
  *
  * @param warn sink for operator warnings (mirrors `logger.Warn`); injectable
  *             so specs can assert on them.
  */
final class PublicationManager(
    exec: SqlExecutor,
    cfg: Publication.Config,
    warn: String => Unit = _ => ()) {
  import Publication._
  import graft.snapshot.CatalogReader

  /** Decode the live publication; None when it doesn't exist. SQLSTATE 42703
    * (undefined column — pre-v11 servers without pubtruncate) is mapped to
    * not-exists like the reference (`publication.go:60-63`).
    */
  def info(): Option[LiveInfo] = {
    val rows =
      try exec(cfg.infoQuery)
      catch {
        case e: java.sql.SQLException if e.getSQLState == "42703" => return None
        case e: Exception if Option(e.getMessage).exists(_.contains("42703")) => return None
      }
    rows.headOption.map { r =>
      val Seq(pubname, allTables, ins, upd, del, trunc, tablesArr) = r: @unchecked
      val ops = Seq(
        "insert" -> ins, "update" -> upd, "delete" -> del, "truncate" -> trunc)
        .collect { case (op, flag) if isTrue(flag) => op }
      LiveInfo(pubname, isTrue(allTables), ops, parseNameArray(tablesArr))
    }
  }

  /** Ensure the publication exists (`publication.go:30-54`): if it already
    * does, warn and return its live shape untouched; otherwise create it —
    * unless createIfNotExists is false, in which case a missing publication
    * is an error.
    */
  def create(): LiveInfo =
    info() match {
      case Some(live) =>
        warn(s"publication already exists: ${live.name}")
        live
      case None if cfg.createIfNotExists =>
        exec(cfg.createQuery)
        LiveInfo(cfg.name, allTables = false, cfg.operations,
          cfg.tables.map(t => (t.schema, t.name)))
      case None =>
        throw new IllegalStateException(
          s"publication is not exists: ${cfg.name} (createIfNotExists=false)")
    }

  /** Config-vs-live drift report; None when the publication doesn't exist. */
  def drift(): Option[Drift] = info().map(driftFrom)

  /** Pure drift computation against an already-fetched live shape — boot
    * paths that just ran [[create]] use this instead of re-querying, so the
    * report reflects the same server state the create decision saw.
    */
  def driftFrom(live: LiveInfo): Drift = {
    val want = cfg.tables.map(t => (t.schema, t.name))
    val have = live.tables
    Drift(
      missingTables = want.filterNot(have.contains),
      extraTables = have.filterNot(want.contains),
      missingOperations = cfg.operations.filterNot(live.operations.contains),
      extraOperations = live.operations.filterNot(cfg.operations.contains))
  }

  /** Opt-in drift remediation — one step BEYOND the reference, which only
    * reports (`publication.go` never ALTERs a publication): issue
    * `ALTER PUBLICATION … ADD/DROP TABLE` and `SET (publish = …)` until the
    * live publication matches the config. Returns the DDL actually issued
    * (empty = no drift). FOR ALL TABLES publications are refused with a
    * warning — their table list is server-derived and not alterable.
    */
  def align(): Seq[String] = info() match {
    case None => Nil // nothing live to align; create() is the path for that
    case Some(live) => alignFrom(live)
  }

  /** [[align]] against an already-fetched live shape (boot paths reuse the
    * create()-time read, like [[driftFrom]]).
    */
  def alignFrom(live: LiveInfo): Seq[String] = {
    if (live.allTables) {
      warn(s"publication ${cfg.name} is FOR ALL TABLES — table list not alterable, skipping align")
      return Nil
    }
    val d = driftFrom(live)
    if (d.isEmpty) return Nil
    def tableList(ts: Seq[(String, String)]) =
      ts.map { case (s, t) => s"${quoteIdent(s)}.${quoteIdent(t)}" }.mkString(", ")
    val pub = quoteIdent(cfg.name)
    val ddl = Seq.newBuilder[String]
    if (d.missingTables.nonEmpty)
      ddl += s"ALTER PUBLICATION $pub ADD TABLE ${tableList(d.missingTables)}"
    if (d.extraTables.nonEmpty)
      ddl += s"ALTER PUBLICATION $pub DROP TABLE ${tableList(d.extraTables)}"
    if (d.missingOperations.nonEmpty || d.extraOperations.nonEmpty)
      ddl += s"ALTER PUBLICATION $pub SET (publish = '${cfg.operations.mkString(", ")}')"
    val out = ddl.result()
    out.foreach(exec(_))
    out
  }

  /** The replica-identity write path (`replica_identity.go:33-58`): read
    * current identities for every table that configures one, diff, and
    * ALTER only the drifted ones. Returns the DDL actually issued (empty =
    * everything already matched). Missing tables are an error, mirroring
    * `ErrorTablesNotExists` (`replica_identity.go:127-129`).
    */
  def setReplicaIdentities(): Seq[String] = {
    val configured = cfg.tables.filter(_.replicaIdentity.nonEmpty)
    if (configured.isEmpty) return Nil

    // NOTHING suppresses UPDATE/DELETE before-images entirely — warn when the
    // publication also subscribes to those ops (`replica_identity.go:60-75`).
    if (cfg.operations.exists(op => op == "update" || op == "delete"))
      configured.filter(_.replicaIdentity == ReplicaIdentity.Nothing).foreach { t =>
        warn(s"table ${t.schema}.${t.name} uses REPLICA IDENTITY NOTHING with " +
          "UPDATE/DELETE publication operations (NOTHING suits insert-only)")
      }

    val current = new CatalogReader(exec)
      .replicaIdentities(configured.map(t => (t.schema, t.name)))
    if (current.isEmpty)
      throw new IllegalStateException(
        s"table does not exists: ${configured.map(t => s"${t.schema}.${t.name}").mkString(", ")}")

    val drifted = configured.filter { t =>
      current.get((t.schema, t.name)) match {
        case None => throw new IllegalStateException(s"table does not exists: ${t.schema}.${t.name}")
        case Some((identChar, idxName)) =>
          val currentWord = ReplicaIdentity.FromChar.getOrElse(identChar, identChar)
          currentWord != t.replicaIdentity ||
            (t.replicaIdentity == ReplicaIdentity.UsingIndex &&
              !idxName.contains(t.replicaIdentityIndex))
      }
    }

    drifted.map { t =>
      val qualified = s"${quoteIdent(t.schema)}.${quoteIdent(t.name)}"
      val ddl =
        if (t.replicaIdentity == ReplicaIdentity.UsingIndex)
          s"ALTER TABLE $qualified REPLICA IDENTITY USING INDEX ${quoteIdent(t.replicaIdentityIndex)}"
        else
          s"ALTER TABLE $qualified REPLICA IDENTITY ${t.replicaIdentity}"
      exec(ddl)
      ddl
    }
  }

  private def isTrue(v: String): Boolean =
    v != null && (v == "t" || v == "true" || v == "TRUE")

  /** Parse a one-dimensional PostgreSQL text array of schema.table names
    * (`{public.users,"public.Order Items"}`) into (schema, name) pairs —
    * split on the FIRST dot like the reference (`publication.go:125-131`).
    */
  private def parseNameArray(raw: String): Seq[(String, String)] = {
    if (raw == null) return Nil
    val body = raw.stripPrefix("{").stripSuffix("}")
    if (body.isEmpty) return Nil
    val out = Seq.newBuilder[String]
    val cur = new StringBuilder
    var inQuotes = false
    var i = 0
    while (i < body.length) {
      val c = body.charAt(i)
      if (inQuotes) {
        if (c == '\\' && i + 1 < body.length) { cur += body.charAt(i + 1); i += 1 }
        else if (c == '"' ) inQuotes = false
        else cur += c
      } else c match {
        case '"' => inQuotes = true
        case ',' => out += cur.result(); cur.clear()
        case other => cur += other
      }
      i += 1
    }
    out += cur.result()
    out.result().filter(_.nonEmpty).map { full =>
      val dot = full.indexOf('.')
      if (dot < 0) ("public", full) else (full.substring(0, dot), full.substring(dot + 1))
    }
  }
}

/** S6 TimescaleDB hypertable map (`pq/timescaledb/hypertable.go:26-123`):
  * polls `timescaledb_information.chunks` to maintain the physical-chunk →
  * hypertable mapping, feeding [[Publication.renameTables]] so downstream
  * consumers see hypertable names instead of `_hyper_N_M_chunk`.
  */
final class HypertableMapper(exec: SqlExecutor) {
  import HypertableMapper._

  @volatile private var cache = Map.empty[(String, String), (String, String)]
  @volatile private var stopped = false

  def mapping: Map[(String, String), (String, String)] = cache

  /** One poll (`FindHyperTables`): merge results into the cache. A missing
    * `timescaledb_information` relation (SQLSTATE 42P01 — not a TimescaleDB)
    * permanently stops the sync loop, mirroring the ticker stop at
    * `hypertable.go:52-58`. Detection covers the JDBC path (SQLState on the
    * SQLException, NOT in its message) as well as message-carried forms.
    */
  def poll(): Map[(String, String), (String, String)] = {
    if (stopped) return cache
    def undefinedTable(e: Throwable): Boolean = e match {
      case sql: java.sql.SQLException if sql.getSQLState == "42P01" => true
      case _ =>
        val m = Option(e.getMessage).getOrElse("")
        m.contains("42P01") || m.matches("(?s).*relation .* does not exist.*")
    }
    val rows =
      try exec(FindHyperTablesSql)
      catch {
        case e: Exception if undefinedTable(e) =>
          stopped = true
          return cache
      }
    val found = rows.collect {
      case Seq(hSchema, hName, cSchema, cName) => (cSchema, cName) -> (hSchema, hName)
    }.toMap
    cache = cache ++ found
    cache
  }

  def isStopped: Boolean = stopped

  /** SyncHyperTables loop for `ticks` iterations with injectable sleep. */
  def sync(ticks: Int, sleep: () => Unit = () => Thread.sleep(1000)): Unit = {
    var i = 0
    while (i < ticks && !stopped) {
      try poll() catch { case _: Exception => () } // errors: log-and-continue
      i += 1
      if (i < ticks && !stopped) sleep()
    }
  }
}

object HypertableMapper {
  val FindHyperTablesSql: String =
    "SELECT h.hypertable_schema, h.hypertable_name, c.chunk_schema, c.chunk_name " +
      "FROM timescaledb_information.chunks c " +
      "JOIN timescaledb_information.hypertables h " +
      "ON c.hypertable_schema = h.hypertable_schema AND c.hypertable_name = h.hypertable_name"
}
