package graft

import graft.services.Publication
import graft.snapshot.{ChunkPlanner, SnapshotConfig}

/** YAML config file → [[GraftConfig]], mirroring the reference's loader
  * semantics (`config/config.go:69-129` defaults, `:230-278` validation):
  * field names follow the reference's yaml tags (`host`, `username`,
  * `publication.tables[].name`, `slot.name`, `heartbeat.table`,
  * `snapshot.*`, `metric.port`), defaults are applied before validation
  * (port 5432, proto version 2, schema "public", snapshot chunk 8000,
  * metric port 8080), and validation collects EVERY problem into one
  * error like Go's `errors.Join` — an ops file with three mistakes reports
  * all three.
  *
  * The parser is a deliberate YAML subset (the whole format the reference's
  * config files use): nested mappings by indentation, block lists (`- x`
  * and `- key: value` items), scalars with optional single/double quotes,
  * full-line comments. Anchors, flow style, multi-line strings, and tabs
  * are rejected loudly rather than misparsed. Unknown keys are ERRORS, not
  * silently dropped — a typo'd `chunkSiez` must not quietly become the
  * default.
  */
object GraftConfigFile {

  /** Reads YAML or (by `.json` extension) JSON — the reference ships both
    * loaders (`config/read.go:11-41`) over one schema.
    */
  def load(path: String): GraftConfig = {
    val text = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(path)), java.nio.charset.StandardCharsets.UTF_8)
    if (path.endsWith(".json")) fromJson(text) else fromYaml(text)
  }

  def fromYaml(text: String): GraftConfig = fromTree(MiniYaml.parse(text))

  /** JSON form of the same schema (`config/read.go:28-41` ReadConfigJSON),
    * parsed with the Jackson shipped in Spark's own jars and lowered to the
    * YAML loader's tree shape (all scalars as strings) so validation,
    * defaults, and unknown-key detection are IDENTICAL across both formats.
    */
  def fromJson(text: String): GraftConfig = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val root =
      try mapper.readTree(text)
      catch {
        case e: com.fasterxml.jackson.core.JacksonException =>
          throw new IllegalArgumentException(
            s"config: json parse: ${e.getOriginalMessage}")
      }
    def toPlain(n: com.fasterxml.jackson.databind.JsonNode): Any =
      if (n.isObject) {
        val it = n.properties().iterator()
        val b = scala.collection.immutable.Map.newBuilder[String, Any]
        while (it.hasNext) {
          val e = it.next()
          if (!e.getValue.isNull) b += e.getKey -> toPlain(e.getValue)
        }
        b.result()
      } else if (n.isArray)
        (0 until n.size()).map(i => toPlain(n.get(i)))
      else n.asText() // numbers/bools/strings all land as text, like MiniYaml
    toPlain(root) match {
      case m: Map[_, _] => fromTree(m.asInstanceOf[Map[String, Any]])
      case _ => throw new IllegalArgumentException(
        "config: json root must be an object")
    }
  }

  private def fromTree(root: Map[String, Any]): GraftConfig = {
    val errs = scala.collection.mutable.ArrayBuffer.empty[String]
    val m = new Section("", root, errs)

    val host = m.str("host").getOrElse("")
    val port = m.int("port").getOrElse(5432)
    val username = m.str("username").getOrElse("")
    val password = m.str("password").getOrElse("")
    val database = m.str("database").getOrElse("")
    val sslMode = m.str("sslmode").getOrElse("disable")
    val sslRootCert = m.str("sslrootcert")
    val sslCert = m.str("sslcert")
    val sslKey = m.str("sslkey")
    val sslPassword = m.str("sslpassword")
    if (sslCert.isDefined != sslKey.isDefined)
      errs += "sslcert and sslkey must be configured together"

    val pub = m.section("publication")
    val pubTables = pub.list("tables").map { item =>
      val t = item.asSection("publication.tables[]")
      // Reference table config carries replicaIdentity/replicaIdentityIndex
      // (`pq/publication/table.go:33-46`); values validate like
      // `Table.Validate` (`table.go:48-76`), collected into errs rather than
      // thrown so the user sees every config problem at once.
      val ri = t.str("replicaIdentity").map(_.trim.toUpperCase).getOrElse("")
      val riIdx = t.str("replicaIdentityIndex").map(_.trim).getOrElse("")
      val riOk = ri.isEmpty || Publication.ReplicaIdentity.Options.contains(ri)
      if (!riOk)
        errs += s"publication.tables[].replicaIdentity: undefined option '$ri' " +
          s"(valid: ${Publication.ReplicaIdentity.Options.mkString(", ")})"
      if (ri == Publication.ReplicaIdentity.UsingIndex && riIdx.isEmpty)
        errs += "publication.tables[].replicaIdentityIndex required when replicaIdentity is USING INDEX"
      if (ri != Publication.ReplicaIdentity.UsingIndex && riIdx.nonEmpty)
        errs += "publication.tables[].replicaIdentityIndex can only be set when replicaIdentity is USING INDEX"
      val cols = t.list("columns").flatMap(_.asStr("publication.tables[].columns[]"))
      if (ri == Publication.ReplicaIdentity.Full && cols.nonEmpty)
        errs += "publication.tables[]: cannot specify columns when replicaIdentity is FULL"
      val valid = riOk &&
        !(ri == Publication.ReplicaIdentity.UsingIndex && riIdx.isEmpty) &&
        !(ri != Publication.ReplicaIdentity.UsingIndex && riIdx.nonEmpty) &&
        !(ri == Publication.ReplicaIdentity.Full && cols.nonEmpty)
      val pt = Publication.PubTable(
        schema = t.str("schema").getOrElse("public"), // defaultSchema fill-in
        name = t.str("name").getOrElse { errs += "publication.tables[].name cannot be empty"; "" },
        columns = cols,
        partitioned = t.bool("partitioned").getOrElse(false),
        replicaIdentity = if (valid) ri else "",
        replicaIdentityIndex = if (valid) riIdx else "")
      t.finish()
      pt
    }
    val pubName = pub.str("name").getOrElse("")
    val pubOps = {
      val ops = pub.list("operations").flatMap(_.asStr("publication.operations[]"))
      if (ops.isEmpty) Publication.ValidOperations else ops
    }
    val pubCreate = pub.bool("createIfNotExists").getOrElse(true)
    pub.finish()

    val slot = m.section("slot")
    val slotName = slot.str("name").getOrElse("")
    val slotCreate = slot.bool("createIfNotExists").getOrElse(true)
    val protoVersion = slot.int("protoVersion").getOrElse(2)

    // Go duration strings ("100ms", "10s", "1m30s") or bare integers
    // (milliseconds) — the two spellings a reference yaml carries.
    def durationMs(v: Option[String], key: String): Option[Long] = v.map { s =>
      val t = s.trim
      // None = parse error (already recorded; skip the range check)
      val parsed: Option[Long] =
        if (t.matches("-?\\d+")) Some(t.toLong)
        else {
          val re = "(\\d+(?:\\.\\d+)?)(ns|us|µs|ms|s|m|h)".r
          val parts = re.findAllMatchIn(t).toSeq
          val consumed = parts.map(_.matched).mkString
          if (parts.isEmpty || consumed != t.replace(" ", "")) {
            errs += s"$key: cannot parse duration '$s'"
            None
          } else {
            val exact = parts.map { p =>
              val n = p.group(1).toDouble
              p.group(2) match {
                case "ns" => n / 1e6
                case "us" | "µs" => n / 1e3
                case "ms" => n
                case "s" => n * 1000
                case "m" => n * 60000
                case "h" => n * 3600000
              }
            }.sum
            // positive sub-millisecond ("500us") rounds UP to 1 ms rather
            // than truncating to 0 and tripping the positivity check below
            Some(if (exact > 0) math.max(1L, math.ceil(exact).toLong)
            else exact.toLong)
          }
        }
      // Every duration here is a loop interval: a non-positive value only
      // surfaces later as Thread.sleep throwing mid-heartbeat/capture —
      // reject it at load time with the other validations instead.
      parsed.filter(_ <= 0).foreach { ms =>
        errs += s"$key: duration must be positive (got '$s')"
      }
      parsed.getOrElse(0L)
    }

    val slotActivityMs = durationMs(slot.str("slotActivityCheckerInterval"),
      "slot.slotActivityCheckerInterval").getOrElse(1000L)
    slot.finish()

    val hb = m.section("heartbeat")
    val hbTable = hb.section("table")
    val hbSchema = hbTable.str("schema").getOrElse("public")
    val hbName = hbTable.str("name").getOrElse("")
    hbTable.finish()
    val hbIntervalMs = durationMs(hb.str("interval"), "heartbeat.interval").getOrElse(100L)
    hb.finish()

    def parseStrategy(raw: String, key: String): ChunkPlanner.Strategy = raw match {
      case "auto" | "" => ChunkPlanner.Auto
      case "integer_range" => ChunkPlanner.IntegerRange
      case "ctid_block" => ChunkPlanner.CtidBlock
      case "offset" => ChunkPlanner.OffsetLimit
      case other =>
        errs += s"$key '$other' is not one of auto|integer_range|ctid_block|offset"
        ChunkPlanner.Auto
    }

    val snap = m.section("snapshot")
    // Reference-shaped snapshot.tables entries (`config.go:319-328`,
    // `publication/table.go:33-46`): per-table queryCondition and
    // snapshotPartitionStrategy bind; pure coordination keys (multi-instance
    // chunk claiming) are accepted for yaml compatibility and have no Spark
    // binding — Spark's scheduler is the chunk queue (SURVEY B1/B4).
    val snapTableInfo: Seq[(String, Option[String], Option[String])] =
      snap.list("tables").map { item =>
        val t = item.asSection("snapshot.tables[]")
        val name = t.str("name").getOrElse {
          errs += "snapshot.tables[].name cannot be empty"; ""
        }
        // Per-table settings key on the schema-QUALIFIED name (like the
        // reference's schema-aware table config) so same-named tables in
        // different schemas get their own condition/strategy.
        val schema = t.str("schema").getOrElse("public")
        val cond = t.str("queryCondition")
        val strat = t.str("snapshotPartitionStrategy")
        Seq("columns", "partitioned", "replicaIdentity",
          "replicaIdentityIndex").foreach(t.accept)
        t.finish()
        (s"$schema.$name", cond, strat)
      }
    // coordination-only keys: accepted, no binding
    Seq("instanceId", "claimTimeout", "heartbeatInterval").foreach(snap.accept)
    val snapEnabled = snap.bool("enabled").getOrElse(true)
    val snapMode = snap.str("mode").getOrElse("initial")
    val snapshot = SnapshotConfig(
      // Enabled=false forces never (`config.go:107-110`).
      mode = if (!snapEnabled) "never" else snapMode,
      chunkSize = snap.int("chunkSize").map(_.toLong).getOrElse(8000L),
      strategy = parseStrategy(snap.str("partitionStrategy").getOrElse("auto"),
        "snapshot.partitionStrategy"),
      globalCondition = snap.str("queryCondition"),
      perTableCondition = snap.section("tableConditions").all.map {
        case (k, v) => k -> v.asStr(s"snapshot.tableConditions.$k").getOrElse("")
      } ++ snapTableInfo.flatMap { case (n, c, _) => c.map(n -> _) }.toMap,
      resnapshot = snap.bool("resnapshot").getOrElse(false),
      perTableStrategy = snapTableInfo.flatMap { case (n, _, st) =>
        st.map(v => n ->
          parseStrategy(v, "snapshot.tables[].snapshotPartitionStrategy"))
      }.toMap,
      // Snapshot.ID: the snapshot-only slot/job key override so
      // multi-instance snapshot_only deployments share one job. It names a
      // replication slot, so it must satisfy slot-name rules.
      id = snap.str("id"))
    snapshot.id.filter(_.nonEmpty).foreach { id =>
      if (!GraftConfig.isValidSlotName(id))
        errs += s"snapshot.id '$id' must match [a-z0-9_]{1,63} " +
          "(it names the snapshot-only replication slot)"
    }
    snap.finish()

    val metric = m.section("metric")
    val metricPort = metric.int("port").getOrElse(8080)
    metric.finish()

    // Logger config (`config.go:39-42`): Spark owns logging; the section is
    // accepted so a reference yaml carries over untouched.
    val logger = m.section("logger")
    logger.accept("level")
    logger.finish()
    val debugMode = m.bool("debugMode").getOrElse(false)
    val ext = m.section("extensionSupport")
    val enableTimescale =
      ext.bool("enableTimescaleDB").orElse(ext.bool("enableTimeScaleDB")).getOrElse(false)
    ext.finish()

    val maxTxns = m.int("maxTxnsPerTrigger").map(_.toLong).getOrElse(Long.MaxValue)
    val maxFrames = m.int("maxFramesPerPartition").getOrElse(8192)
    m.finish()

    // Reference Validate(): required connection fields, all errors joined.
    if (host.trim.isEmpty) errs += "host cannot be empty"
    if (username.trim.isEmpty) errs += "username cannot be empty"
    if (password.trim.isEmpty) errs += "password cannot be empty"
    if (database.trim.isEmpty) errs += "database cannot be empty"
    val snapshotOnly = snapshot.mode == "snapshot_only"
    if (!snapshotOnly) {
      if (pubName.trim.isEmpty) errs += "publication.name cannot be empty"
      if (pubTables.isEmpty) errs += "publication.tables cannot be empty"
      if (slotName.trim.isEmpty) errs += "slot.name cannot be empty"
      // Slot names interpolate raw into CREATE_REPLICATION_SLOT: reject a
      // bad one here, not as a server parse error mid-boot.
      else if (!GraftConfig.isValidSlotName(slotName))
        errs += s"slot.name '$slotName' must match [a-z0-9_]{1,63}"
      val badOps = pubOps.filterNot(Publication.ValidOperations.contains)
      if (badOps.nonEmpty)
        errs += s"invalid publication operations: ${badOps.mkString(",")}"
    }
    // The heartbeat-in-publication check (`config.go:206-228`): heartbeat
    // rows must flow through the slot, so the table has to be published.
    if (hbName.nonEmpty && !snapshotOnly && pubTables.nonEmpty &&
        !pubTables.exists(t => t.schema == hbSchema && t.name == hbName))
      errs += s"heartbeat table $hbSchema.$hbName is not included in " +
        s"publication '$pubName'; add it to publication.tables so heartbeat " +
        "changes reach the replication slot"

    if (errs.nonEmpty)
      throw new IllegalArgumentException(
        s"config: ${errs.size} problem(s): ${errs.mkString("; ")}")

    try GraftConfig(
      host = host, port = port, username = username, password = password,
      database = database,
      publication = Publication.Config(pubName, pubTables, pubOps, pubCreate),
      slotName = slotName, slotCreateIfNotExists = slotCreate,
      snapshot = snapshot,
      heartbeatSchema = hbSchema,
      heartbeatTable = if (hbName.nonEmpty) hbName else "cdc_heartbeat",
      protoVersion = protoVersion,
      maxTxnsPerTrigger = maxTxns,
      maxFramesPerPartition = maxFrames,
      sslMode = sslMode,
      sslRootCert = sslRootCert,
      sslCert = sslCert,
      sslKey = sslKey,
      sslPassword = sslPassword,
      metricPort = metricPort,
      heartbeatIntervalMs = hbIntervalMs,
      slotActivityCheckerIntervalMs = slotActivityMs,
      enableTimescaleDb = enableTimescale,
      debugMode = debugMode)
    catch {
      case e: IllegalArgumentException =>
        throw new IllegalArgumentException(s"config: ${e.getMessage}", e)
    }
  }

  // ---- typed extraction over the parsed tree, with error accumulation ----

  private[graft] final class Value(val raw: Any,
      errs: scala.collection.mutable.ArrayBuffer[String]) {
    def asStr(at: String): Option[String] = raw match {
      case s: String => Some(s)
      case other =>
        if (errs != null) errs += s"$at: expected a scalar"
        None
    }
    def asSection(at: String): Section = raw match {
      case m: Map[_, _] =>
        new Section(at + ".", m.asInstanceOf[Map[String, Any]], errs)
      case _ =>
        if (errs != null) errs += s"$at: expected a mapping"
        new Section(at + ".", Map.empty, errs)
    }
  }

  /** One mapping level: typed getters that record problems instead of
    * throwing, plus unknown-key detection via [[finish]].
    */
  private[graft] class Section(
      prefix: String, map: Map[String, Any],
      errs: scala.collection.mutable.ArrayBuffer[String]) {
    private val seen = scala.collection.mutable.Set.empty[String]
    private def record(msg: String): Unit = if (errs != null) errs += msg

    def all: Map[String, Value] = {
      map.keys.foreach(seen += _)
      map.map { case (k, v) => k -> new Value(v, errs) }
    }
    def str(key: String): Option[String] = {
      seen += key
      map.get(key).flatMap {
        case s: String => Some(s)
        case other => record(s"$prefix$key: expected a scalar, got ${kind(other)}"); None
      }
    }
    def int(key: String): Option[Int] = str(key).flatMap { s =>
      try Some(s.toInt)
      catch { case _: NumberFormatException =>
        record(s"$prefix$key: '$s' is not an integer"); None }
    }
    def bool(key: String): Option[Boolean] = str(key).flatMap {
      case "true" => Some(true)
      case "false" => Some(false)
      case s => record(s"$prefix$key: '$s' is not true/false"); None
    }
    def list(key: String): Seq[Value] = {
      seen += key
      map.get(key) match {
        case None => Nil
        case Some(l: Seq[_]) => l.map(new Value(_, errs))
        case Some(other) =>
          record(s"$prefix$key: expected a list, got ${kind(other)}"); Nil
      }
    }
    def section(key: String): Section = {
      seen += key
      map.get(key) match {
        case None => new Section(prefix + key + ".", Map.empty, errs)
        case Some(mm: Map[_, _]) =>
          new Section(prefix + key + ".", mm.asInstanceOf[Map[String, Any]], errs)
        case Some(other) =>
          record(s"$prefix$key: expected a mapping, got ${kind(other)}")
          new Section(prefix + key + ".", Map.empty, errs)
      }
    }
    /** Mark a key as consumed without binding it — reference-yaml keys that
      * have no Spark-side meaning (accepted for drop-in compatibility, not
      * silently ignored: callers list them explicitly).
      */
    def accept(key: String): Unit = seen += key

    /** Report any keys never consumed — typos must not become defaults. */
    def finish(): Unit =
      (map.keySet -- seen).toSeq.sorted.foreach(k => record(s"unknown key '$prefix$k'"))

    private def kind(v: Any): String = v match {
      case _: Map[_, _] => "a mapping"
      case _: Seq[_] => "a list"
      case _ => "a scalar"
    }
  }
}

/** Line-based parser for the YAML subset described on [[GraftConfigFile]].
  * Produces Map[String, Any] / Seq[Any] / String trees.
  */
private[graft] object MiniYaml {

  def parse(text: String): Map[String, Any] = {
    val lines = text.split("\n", -1).zipWithIndex.flatMap { case (raw, i) =>
      if (raw.contains('\t'))
        fail(i + 1, "tabs are not allowed in indentation; use spaces")
      val noComment = if (raw.trim.startsWith("#")) "" else raw
      val line = noComment.replaceAll("\\s+$", "")
      if (line.isEmpty) None
      else Some(Line(i + 1, line.takeWhile(_ == ' ').length, line.trim, line))
    }
    if (lines.isEmpty) Map.empty
    else {
      val (v, next) = parseBlock(lines, 0, lines(0).indent)
      if (next < lines.length)
        fail(lines(next).no, s"unexpected de-indent/content '${lines(next).content}'")
      v match {
        case m: Map[_, _] => m.asInstanceOf[Map[String, Any]]
        case _ => fail(lines(0).no, "top level must be a mapping")
      }
    }
  }

  private final case class Line(no: Int, indent: Int, content: String, raw: String)

  private def fail(lineNo: Int, msg: String): Nothing =
    throw new IllegalArgumentException(s"config: line $lineNo: $msg")

  private def parseBlock(lines: Array[Line], start: Int, indent: Int): (Any, Int) =
    if (lines(start).content.startsWith("- ") || lines(start).content == "-")
      parseList(lines, start, indent)
    else parseMapping(lines, start, indent)

  private def parseList(lines: Array[Line], start: Int, indent: Int): (Any, Int) = {
    val out = Seq.newBuilder[Any]
    var i = start
    while (i < lines.length && lines(i).indent == indent &&
        (lines(i).content.startsWith("- ") || lines(i).content == "-")) {
      val l = lines(i)
      val rest = l.content.drop(1).trim
      if (rest.isEmpty) fail(l.no, "empty list item")
      else if (isMappingEntry(rest)) {
        // `- key: value` — the dash acts as 2 spaces of indentation for an
        // inline mapping whose further keys sit at indent+2.
        val synthetic = l.copy(indent = indent + 2,
          content = rest, raw = " " * (indent + 2) + rest)
        val patched = lines.updated(i, synthetic)
        val (m, next) = parseMapping(patched, i, indent + 2)
        out += m
        i = next
      } else {
        out += scalar(rest, l.no)
        i += 1
      }
    }
    if (i < lines.length && lines(i).indent > indent)
      fail(lines(i).no, s"unexpected indent under list item")
    (out.result(), i)
  }

  private def parseMapping(lines: Array[Line], start: Int, indent: Int): (Map[String, Any], Int) = {
    val out = scala.collection.mutable.LinkedHashMap.empty[String, Any]
    var i = start
    while (i < lines.length && lines(i).indent == indent &&
        !lines(i).content.startsWith("- ")) {
      val l = lines(i)
      val colon = colonIndex(l.content, l.no)
      val key = stripQuotes(l.content.take(colon).trim, l.no)
      if (out.contains(key)) fail(l.no, s"duplicate key '$key'")
      val after = l.content.drop(colon + 1).trim
      if (after.nonEmpty) {
        out(key) = scalar(after, l.no)
        i += 1
      } else {
        i += 1
        if (i < lines.length && lines(i).indent > indent) {
          val (v, next) = parseBlock(lines, i, lines(i).indent)
          out(key) = v
          i = next
        } else out(key) = "" // `key:` with no value → empty scalar
      }
    }
    if (i < lines.length && lines(i).indent > indent)
      fail(lines(i).no, s"unexpected indent '${lines(i).content}'")
    (out.toMap, i)
  }

  private def isMappingEntry(s: String): Boolean =
    try { colonIndex(s, 0); true } catch { case _: IllegalArgumentException => false }

  /** Index of the key/value colon: first `:` at end-of-string or followed by
    * a space, outside quotes.
    */
  private def colonIndex(s: String, lineNo: Int): Int = {
    var i = 0
    var quote: Char = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (quote != 0) { if (c == quote) quote = 0 }
      else if (c == '"' || c == '\'') quote = c
      else if (c == ':' && (i + 1 == s.length || s.charAt(i + 1) == ' ')) return i
      i += 1
    }
    fail(lineNo, s"expected 'key: value' or 'key:', got '$s'")
  }

  private def scalar(s: String, lineNo: Int): String = stripQuotes(s, lineNo)

  private def stripQuotes(s: String, lineNo: Int): String =
    if (s.length >= 2 && (s.head == '"' || s.head == '\'')) {
      if (s.last != s.head) fail(lineNo, s"unterminated quote in '$s'")
      s.substring(1, s.length - 1)
    } else if (s.startsWith("&") || s.startsWith("*") || s.startsWith("{") ||
        s.startsWith("[") || s.startsWith("|") || s.startsWith(">")) {
      fail(lineNo, s"unsupported YAML feature in '$s' (anchors/flow/block scalars)")
    } else s
}
