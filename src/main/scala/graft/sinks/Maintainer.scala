package graft.sinks

import org.apache.spark.sql.SparkSession

/** The refresh face every maintained state shares — views, joins,
  * distincts, and the three index families all poll newly committed lake
  * batches through their own durable cursor and advance their state by
  * one span. `within`, when set, bounds the poll to batch ids inside the
  * given closed interval (see [[LakeSink.poll]]): the seam
  * [[Maintainer.refreshCoherent]] builds its barrier on.
  */
trait Maintainer {

  /** Apply newly committed lake batches to this maintainer's state —
    * bounded to `within` when set (excluded batches stay undelivered for
    * a later refresh; they are never absorbed). Returns the number of
    * batches applied (0 = already current). Implementations default
    * `within` to None — the plain catch-up refresh.
    */
  def refresh(spark: SparkSession, within: Option[(Long, Long)]): Int

  /** Stable identity of the cursor/state this maintainer writes (lake
    * root + cursor name; composites report their PRIMARY state) —
    * [[Maintainer.refreshCoherent]] refuses two members sharing one,
    * however they were constructed: two instances over one state dir are
    * two concurrent writers on one crash protocol.
    */
  def stateId: String

  /** EVERY cursor/state identity this maintainer writes — composites
    * override to include their companions (a BM25 index owns postings
    * AND its stats/df views), so [[Maintainer.refreshCoherent]] can
    * refuse a standalone maintainer whose name happens to collide with
    * a composite's DERIVED companion (two concurrent writers on one
    * companion state dir, invisible to a primary-only check).
    */
  def ownedStateIds: Seq[String] = Seq(stateId)
}

/** The coherence barrier over a group of maintainers: several maintained
  * states ride INDEPENDENT cursors over one changelog, so plain
  * back-to-back refreshes can come out one span apart whenever the writer
  * lands a batch in between — exactly the torn-sides caveat a hybrid
  * read ([[HybridRetrieval]]) or any cross-state comparison carries.
  * [[refreshCoherent]] closes it: pin the lake's committed hull ONCE,
  * then drive every maintainer to exactly that bound.
  */
object Maintainer {

  /** Refresh every maintainer to ONE pinned bound — the lake's
    * [[LakeSink.committedHull]] read once, before any refresh — so each
    * ends having applied exactly the batches committed at the pin,
    * whatever the writer lands while they run. Maintainers that were
    * already current simply no-op; ones that were behind catch up to the
    * pin and no further. Refreshes run concurrently
    * (they own disjoint cursors and state dirs — the same independence
    * [[MaintainerOps.inParallel]] already exploits inside the composite
    * BM25 index), and a failure in any aborts the barrier loudly.
    *
    * Returns the pinned bound, which is also every maintainer's applied
    * high edge afterwards — thread it into version-pinned reads or the
    * next barrier for an audit trail.
    *
    * Scope stated honestly: the barrier makes the group's APPLIED BATCH
    * SETS identical; it does not freeze the lake (a batch landing after
    * the pin is simply outside every member's state until the next
    * barrier), and it assumes the group's members consume the SAME lake —
    * maintainers over different [[LakeSink]] roots have unrelated id
    * spaces and need one barrier per lake. The concurrent-writer shapes
    * covered are ordinary appends (new epochs above the pin, late
    * snapshot batches below it); a REUSED batch id — `clearSnapshot`
    * followed by a re-export can commit a fresh batch under an id inside
    * the pinned hull — is a re-bootstrap-class operation, not a
    * concurrent writer: like vacuum, run it only when no barrier (or any
    * other consumer mid-poll) is in flight.
    */
  def refreshCoherent(spark: SparkSession, lake: LakeSink,
      maintainers: Maintainer*): (Long, Long) = {
    require(maintainers.nonEmpty, "refreshCoherent needs at least one maintainer")
    // two members writing ONE cursor/state dir (the same instance twice,
    // two instances constructed over the same lake + name, or a
    // standalone maintainer colliding with a composite's DERIVED
    // companion) would run two CONCURRENT refreshes of it — the
    // single-writer contract every maintainer's crash protocol assumes.
    // Checked over EVERY owned state id, pairwise.
    val dup = maintainers.flatMap(m => m.ownedStateIds.map(_ -> m))
      .groupBy(_._1).collect {
        case (id, ms) if ms.size > 1 => id
      }
    require(dup.isEmpty,
      s"refreshCoherent was passed more than one maintainer writing " +
        s"${dup.mkString(", ")} — one writer per state (companion states " +
        "included), construct the group from shared instances")
    val bound = lake.committedHull(spark)
    MaintainerOps.inParallel(
      maintainers.map(m => () => { m.refresh(spark, Some(bound)); () }): _*)
    bound
  }
}
