package graft.snapshot

/** Parallel-snapshot partition planning — the Spark-side equivalent of the
  * reference's chunk coordinator (B3, `pq/snapshot/coordinator.go:652-969`).
  *
  * The reference picks, per table: (1) integer_range when a single integer PK
  * exists, (2) ctid_block from physical block stats, (3) LIMIT/OFFSET as the
  * fallback — and we reproduce that auto-selection chain
  * (`coordinator.go:707-729`) plus the chunk SQL shapes
  * (`coordinator.go:492-575`). In Spark these chunks become the
  * `predicates: Array[String]` of a partitioned JDBC read: one Spark input
  * partition per chunk, so the scheduler replaces the reference's SKIP LOCKED
  * work-stealing queue (B4) and speculative execution replaces stale-claim
  * reclaim.
  *
  * Scale note: chunk count = rows/chunkSize; at 100 TB the planner emits tens
  * of thousands of chunks, which is exactly what a 1000-executor cluster
  * wants — small, uniform, independently retryable scan units with no
  * coordination state beyond the immutable plan.
  */
object ChunkPlanner {

  sealed trait Strategy { def name: String }
  case object IntegerRange extends Strategy { val name = "integer_range" }
  case object CtidBlock extends Strategy { val name = "ctid_block" }
  case object OffsetLimit extends Strategy { val name = "offset" }
  case object Auto extends Strategy { val name = "auto" }

  /** Catalog stats the planner needs (gathered via S5-style queries at plan
    * time: pg_index/pg_attribute for the PK, MIN/MAX bounds, pg_relation_size
    * and reltuples/relpages — `coordinator.go:971-1059,797-920,1189-1218`).
    */
  final case class TableStats(
      rowCount: Long,
      intPkColumn: Option[String], // single integer-typed PK column, if any
      pkMin: Long = 0L,
      pkMax: Long = -1L,
      relPages: Long = 0L,
      relTuples: Double = 0.0)

  /** One planned chunk. Exactly one of `predicate` (WHERE-fragment chunks) or
    * `limitOffset` (fallback strategy) is set.
    */
  final case class Chunk(
      index: Int,
      strategy: Strategy,
      predicate: Option[String],
      limitOffset: Option[(Long, Long)], // (limit, offset)
      isLast: Boolean)

  /** Auto-selection chain, mirroring `coordinator.go:707-729`: integer PK →
    * integer_range; else physical stats available → ctid_block; else offset.
    */
  def choose(stats: TableStats): Strategy =
    if (stats.intPkColumn.isDefined && stats.pkMax >= stats.pkMin) IntegerRange
    else if (stats.relPages > 0 && stats.relTuples > 0) CtidBlock
    else OffsetLimit

  def plan(stats: TableStats, chunkSize: Long, strategy: Strategy = Auto): Seq[Chunk] = {
    require(chunkSize > 0, "chunkSize must be positive")
    val s = if (strategy == Auto) choose(stats) else strategy
    s match {
      case IntegerRange => integerRange(stats.intPkColumn.get, stats.pkMin, stats.pkMax, chunkSize)
      case CtidBlock => ctidBlock(stats.relPages, stats.relTuples, chunkSize)
      case OffsetLimit => offsetLimit(stats.rowCount, chunkSize)
      case Auto => throw new IllegalStateException("unreachable")
    }
  }

  /** `[min + i*size, min + (i+1)*size)` half-open ranges over the PK
    * (`coordinator.go:731-794`). The last chunk's upper bound is inclusive of
    * pkMax (closed via `<= max`) — rows inserted after planning are the CDC
    * stream's job, not the snapshot's.
    */
  def integerRange(pk: String, min: Long, max: Long, chunkSize: Long): Seq[Chunk] = {
    if (max < min) return Seq(Chunk(0, IntegerRange, Some("1 = 0"), None, isLast = true))
    // Compute in Long and fail loudly: a sparse 63-bit PK range would
    // otherwise overflow Int into a negative count ⇒ silent zero-row snapshot.
    // Subtraction itself can overflow for min<0, max>0 — use the unsigned gap.
    val span = max - min // correct as unsigned when it overflows signed
    val nL = java.lang.Long.divideUnsigned(span, chunkSize) + 1
    require(nL > 0 && nL <= Int.MaxValue,
      s"integer_range would need $nL chunks (pk span ${java.lang.Long.toUnsignedString(span)}, " +
        s"chunkSize $chunkSize); raise chunkSize")
    val n = nL.toInt
    (0 until n).map { i =>
      val lo = min + i.toLong * chunkSize
      val hi = lo + chunkSize
      val last = i == n - 1
      val pred = if (last) s"$pk >= $lo AND $pk <= $max" else s"$pk >= $lo AND $pk < $hi"
      Chunk(i, IntegerRange, Some(pred), None, last)
    }
  }

  /** Physical block ranges: `blocksPerChunk = chunkSize / (reltuples/relpages)`
    * with the final chunk unbounded to catch blocks appended between stat
    * collection and scan (`coordinator.go:797-892`).
    */
  def ctidBlock(relPages: Long, relTuples: Double, chunkSize: Long): Seq[Chunk] = {
    val rowsPerBlock = math.max(1.0, relTuples / math.max(1L, relPages))
    val blocksPerChunk = math.max(1L, (chunkSize / rowsPerBlock).toLong)
    val nL = math.max(1L, (relPages + blocksPerChunk - 1) / blocksPerChunk)
    require(nL <= Int.MaxValue, s"ctid_block would need $nL chunks; raise chunkSize")
    val n = nL.toInt
    (0 until n).map { i =>
      val lo = i.toLong * blocksPerChunk
      val hi = lo + blocksPerChunk
      val last = i == n - 1
      val pred =
        if (last) s"ctid >= '($lo,0)'::tid" // unbounded tail
        else s"ctid >= '($lo,0)'::tid AND ctid < '($hi,0)'::tid"
      Chunk(i, CtidBlock, Some(pred), None, last)
    }
  }

  /** `ORDER BY pk LIMIT n OFFSET m` fallback (`coordinator.go:922-969`). */
  def offsetLimit(rowCount: Long, chunkSize: Long): Seq[Chunk] = {
    val nL = math.max(1L, (rowCount + chunkSize - 1) / chunkSize)
    require(nL <= Int.MaxValue, s"offset strategy would need $nL chunks; raise chunkSize")
    val n = nL.toInt
    (0 until n).map { i =>
      Chunk(i, OffsetLimit, None, Some((chunkSize, i.toLong * chunkSize)), i == n - 1)
    }
  }
}
