package graft.cdc

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.{col, lit, when}
import org.apache.spark.sql.types._

/** The generic CDC envelope — one row per change event, SURVEY.md §1.2 (a).
  *
  * A fixed schema that every table's events fit into: identity of the change
  * (LSN/xid/op), provenance (schema/table), the two protocol times
  * (XLogData server time and transaction commit time, SURVEY §1.5), and the
  * before/after row images as text-format maps. Typed per-table views are
  * projected from `after`/`before` with [[graft.types.PgTypes.typedColumns]].
  */
final case class ChangeEvent(
    lsn: Long,            // WAL position; last event of a txn carries txn-end LSN (T1)
    commitLsn: Long,      // the transaction's commit LSN
    xid: Long,
    op: String,           // insert | update | delete | truncate | message
    schema: String,
    table: String,
    messageTimeMicros: Long, // server send time (Unix µs)
    commitTimeMicros: Long,  // transaction commit time (Unix µs)
    keyNames: Seq[String],   // replica-identity key columns of the relation
    before: Map[String, String], // old image (null unless K/O tuple present)
    after: Map[String, String])  // new image (null for delete/truncate)

object ChangeEvent {
  final val Ops = Seq("insert", "update", "delete", "truncate", "message")

  /** The typed per-table view (SURVEY §1.2 plan (b)): filter the envelope
    * to one relation and project its text-format row image through the
    * relation's column types ([[graft.types.PgTypes.typedColumns]] — pure
    * Catalyst casts, codegen-friendly, unknown OIDs fall back to string
    * exactly like the reference's pgtype map). The image column is `after`
    * except for deletes, whose only image is `before` (the replica-identity
    * columns; non-key columns come back NULL under REPLICA IDENTITY
    * DEFAULT). Identity columns (lsn/commit_lsn/xid/op/commit_time) ride
    * along so downstream latest-state / sessionization logic keeps working
    * on the typed frame.
    */
  def typedView(events: DataFrame, rel: graft.pgproto.Messages.Relation): DataFrame = {
    val image: Column = when(col("op") === lit("delete"), col("before"))
      .otherwise(col("after"))
    events
      .filter(col("schema") === lit(rel.namespace) && col("table") === lit(rel.name))
      .select(Seq(col("lsn"), col("commit_lsn"), col("xid"), col("op"),
        col("commit_time")) ++ graft.types.PgTypes.typedColumns(rel, image): _*)
  }

  /** Envelope schema as seen by Spark (map values nullable: SQL NULL columns). */
  val schema: StructType = StructType(Seq(
    StructField("lsn", LongType, nullable = false),
    StructField("commit_lsn", LongType, nullable = false),
    StructField("xid", LongType, nullable = false),
    StructField("op", StringType, nullable = false),
    StructField("schema", StringType, nullable = false),
    StructField("table", StringType, nullable = false),
    StructField("message_time", TimestampType, nullable = false),
    StructField("commit_time", TimestampType, nullable = false),
    StructField("key_names", ArrayType(StringType, containsNull = false), nullable = true),
    StructField("before", MapType(StringType, StringType, valueContainsNull = true), nullable = true),
    StructField("after", MapType(StringType, StringType, valueContainsNull = true), nullable = true)))
}
