package graft.streaming

import scala.collection.concurrent.TrieMap
import org.apache.spark.sql.DataFrame
import graft.pgproto.Messages

/** The relation cache (T5) surfaced to users — SURVEY §1.2 (b)'s last seam.
  *
  * The micro-batch stream already maintains the authoritative oid → Relation
  * frame cache while grouping transactions; this registry publishes each
  * DECODED relation under the stream's registry key (the `slot` / `path` /
  * explicit `relationRegistryKey` option), so a driver program can build
  * typed per-table views without hand-assembling a
  * [[graft.pgproto.Messages.Relation]]:
  *
  * {{{
  * val envelope = spark.readStream.format("pgcdc").options(cfg.sourceOptions()).load()
  * // ... after the stream has processed batches:
  * val orders = PgCdcRelations.typedViews(cfg.slotName, envelope)("public.orders")
  * }}}
  *
  * Registry contents are driver-side schema metadata only (a few KB per
  * table); views are lazily-planned frames over the SAME envelope, so no
  * data is duplicated. Entries reflect the latest Relation frame seen —
  * PostgreSQL re-sends 'R' after DDL, and the registry follows.
  */
object PgCdcRelations {

  private val registry = TrieMap.empty[String, TrieMap[String, Messages.Relation]]

  private[streaming] def publish(key: String, rel: Messages.Relation): Unit =
    registry.getOrElseUpdate(key, TrieMap.empty)
      .put(s"${rel.namespace}.${rel.name}", rel)

  /** Every relation the keyed stream has seen so far, as
    * `"namespace.table"` → decoded schema.
    */
  def relations(key: String): Map[String, Messages.Relation] =
    registry.get(key).map(_.toMap).getOrElse(Map.empty)

  /** Typed per-table views over the envelope frame for every known relation
    * — [[graft.cdc.ChangeEvent.typedView]] composed with the live cache.
    */
  def typedViews(key: String, envelope: DataFrame): Map[String, DataFrame] =
    relations(key).map { case (name, rel) =>
      name -> graft.cdc.ChangeEvent.typedView(envelope, rel)
    }

  /** Drop a stream's registry entries (test hygiene / slot teardown). */
  def clear(key: String): Unit = registry.remove(key)
}
