package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.TestGroupState
import graft.SparkTestBase
import graft.pgproto.{Messages, MessageEncoder}

/** Ingest-time MinHash near-dup suppression over a live CDC stream — the
  * streaming counterpart of the batch `q_dedup_minhash` pipeline: state
  * carries across micro-batches (a dup of a batch-1 document arriving in
  * batch 3 still flags), per-bucket state is capped, and flag direction is
  * deterministic.
  */
class StreamingDedupSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  private val T0 = 1700000000000000L

  private val RelOid = 16800L
  private val Cols = Seq(
    Messages.RelationColumn("id", 20L, -1, 1), // int8
    Messages.RelationColumn("body", 25L, -1, 0)) // text

  private def insertTxn(lsnBase: Long, id: Long, body: String): Seq[Array[Byte]] = Seq(
    MessageEncoder.xlogData(lsnBase, lsnBase, T0,
      MessageEncoder.begin(lsnBase + 3, T0, 900L + lsnBase)),
    MessageEncoder.xlogData(lsnBase + 1, lsnBase + 1, T0,
      MessageEncoder.insert(RelOid, Seq(Some(id.toString), Some(body)))),
    MessageEncoder.xlogData(lsnBase + 2, lsnBase + 2, T0,
      MessageEncoder.commit(lsnBase + 2, lsnBase + 3, T0)))

  test("near-dups flag across micro-batches; distinct docs pass") {
    val base = "the quick brown fox jumps over the lazy dog beside a very quiet river bank " +
      "while morning light settles gently on the tall wet grass near the old stone bridge"
    val nearDup = base + " today" // shares almost every 5-shingle
    val distinct = "entirely different words compose this second document about compilers " +
      "register allocation garbage collection and the finer points of query planning in " +
      "distributed analytical engines running on very large clusters"

    val frames =
      MessageEncoder.xlogData(1, 1, T0,
        MessageEncoder.relation(RelOid, "public", "docs", Cols)) +:
        (insertTxn(100, 1L, base) ++ insertTxn(200, 2L, distinct) ++
          insertTxn(300, 3L, nearDup)) // arrives two micro-batches later

    PgCdcTestHook.register("sdedup", new InMemoryWalSource(frames))
    PgCdcRelations.clear("sdedup")
    val envelope = spark.readStream.format("pgcdc")
      .option("testSourceKey", "sdedup")
      .option("relationRegistryKey", "sdedup")
      .option("maxTxnsPerTrigger", "1") // one doc per micro-batch
      .load()
    val docs = envelope
      .filter(col("op") === "insert")
      .select(
        element_at(col("after"), "id").cast("long").as("doc_id"),
        element_at(col("after"), "body").as("text"))
    val q = StreamingDedup.nearDupFlags(spark, docs, minEstJaccard = 0.5)
      .writeStream.format("memory").queryName("dedup_flags")
      .outputMode("append").start()
    q.processAllAvailable()
    q.stop()

    val flags = spark.table("dedup_flags").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(3)))
    assert(flags.nonEmpty, "the planted near-dup must flag")
    assert(flags.forall { case (d, of, _) => d == 3L && of == 1L },
      s"only doc 3 flags, against the EARLIER doc 1 (state crossed batches): ${flags.toSeq}")
    assert(flags.forall(_._3 >= 0.5))
    assert(!flags.exists(_._1 == 2L), "the distinct doc must pass unflagged")
  }

  test("bucket transition: same-batch dup flags, cap evicts oldest, timeout clears") {
    val sigA = Seq(1L, 2L, 3L, 4L, 5L, 6L, 7L, 8L)
    val sigB = Seq(1L, 2L, 3L, 4L, 5L, 6L, 99L, 98L) // 6/8 agree
    val sigC = Seq(90L, 91L, 92L, 93L, 94L, 95L, 96L, 97L)
    def row(id: Long, sig: Seq[Long]) = (0, "bkey", id, sig)
    val fn = StreamingDedup.updateBucket(8, 0.5, 2, None) _

    // Both in ONE batch: the later doc flags against the earlier.
    import org.apache.spark.api.java.Optional
    import org.apache.spark.sql.streaming.GroupStateTimeout
    val s1 = TestGroupState.create[StreamingDedup.BucketState](
      Optional.empty[StreamingDedup.BucketState](), GroupStateTimeout.NoTimeout,
      1000L, Optional.empty[Long](), hasTimedOut = false)
    val flags = fn((0, "bkey"), Iterator(row(10, sigA), row(11, sigB)), s1).toList
    assert(flags == List(StreamingDedup.DupFlag(11, 10, 0, 0.75)))

    // Cap = 2: adding a third distinct doc evicts the OLDEST (10); a new
    // copy of sigA then matches nothing older than the cap window... but
    // sigB (6/8 vs sigA) is still in state and clears the 0.5 bar.
    val s2 = TestGroupState.create[StreamingDedup.BucketState](
      Optional.of(s1.get), GroupStateTimeout.NoTimeout,
      1000L, Optional.empty[Long](), hasTimedOut = false)
    assert(fn((0, "bkey"), Iterator(row(12, sigC)), s2).isEmpty)
    assert(s2.get.docs.map(_._1) == List(11, 12), "oldest evicted at the cap")

    // Timeout: state removed, nothing emitted.
    val s3 = TestGroupState.create[StreamingDedup.BucketState](
      Optional.of(s2.get), GroupStateTimeout.ProcessingTimeTimeout,
      1000L, Optional.empty[Long](), hasTimedOut = true)
    assert(StreamingDedup.updateBucket(8, 0.5, 2, Some(60000L))(
      (0, "bkey"), Iterator.empty, s3).isEmpty)
    assert(s3.isRemoved)
  }
}
