package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders, Row, SparkSession}
import org.apache.spark.sql.types._

/** Per-document distinct n-token shingle sets — the shared scan every dedup
  * operator (and the fingerprinter) builds on.
  *
  * This is one of the two places the engine drops to imperative
  * `mapPartitions` (the other is the wire codec): Spark's higher-order array
  * functions (`transform`/`slice`/`array_join`/`array_distinct`) are
  * interpreted, not whole-stage-codegen'd, and this expression chain measured
  * **24× slower** than the loop below (7.7s vs 0.32s for the sf0.1 corpus) —
  * it dominated every dedup query's scan. Semantics are byte-identical to
  * `array_distinct(wordShingles(tokens(text), n))`: `split("\\s+", -1)`
  * (Spark's split semantics — leading/trailing empty tokens preserved),
  * single-space joins, first-occurrence-ordered distinct, and documents with
  * fewer than n tokens dropped — so the DuckDB oracles are unchanged.
  *
  * The frame is `persist()`ed: every dedup query references it from several
  * differently-aliased plan branches (signature build, self-join sides,
  * verification), which defeats ReuseExchange — without persistence each
  * branch re-runs the scan. Queries over the same (dir, n) share the cache
  * (canonical-plan keyed), e.g. minhash and the fingerprinter both use n=5.
  * At true 100-TB scale the same role is played by writing the shingle-set
  * table once and reading it per stage.
  */
object ShingleSets {

  private val schema = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("shs", ArrayType(StringType, containsNull = false), nullable = false)))

  // Memoized per (session, dir, n): CacheManager keys on the canonical plan,
  // and each mapPartitions call would embed a fresh closure instance — two
  // calls would build two independent caches instead of sharing one.
  private val memo =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String, Int), DataFrame]

  def apply(s: SparkSession, dir: String, n: Int): DataFrame =
    memo.getOrElseUpdate((s, dir, n), build(s, dir, n))

  /** Unpersist and forget every cached frame for `dir` in this session —
    * the cache-lifecycle release for long-lived sessions that move between
    * corpora (a one-shot Verify/Bench main never needs it). Blocking, so a
    * follow-up apply() rebuilds rather than racing the eviction.
    */
  def release(s: SparkSession, dir: String): Unit =
    memo.keys.toSeq.filter(k => k._1 eq s).filter(_._2 == dir).foreach { k =>
      memo.remove(k).foreach(_.unpersist(blocking = true))
    }

  /** Release every cached frame owned by `s` (session shutdown hook). */
  def releaseAll(s: SparkSession): Unit =
    memo.keys.toSeq.filter(k => k._1 eq s).foreach { k =>
      memo.remove(k).foreach(_.unpersist(blocking = true))
    }

  /** Number of live cached frames for a session — test/metrics visibility. */
  private[graft] def cachedCount(s: SparkSession): Int =
    memo.keys.count(_._1 eq s)

  private def build(s: SparkSession, dir: String, n: Int): DataFrame =
    // fanned out (Tables.fanOut): documents is one unsplittable row group,
    // and the shingling loop below is exactly the per-row CPU a single
    // scan task would serialize across every dedup consumer. costFactor:
    // shingling re-hashes every n-gram of every token — roughly an order
    // of magnitude more CPU per input byte than the wire-codec class the
    // fan-out target is calibrated for (r21 A/B: width 8 beat both 1 and
    // 32 for every consumer of this cache).
    Tables.fanOut(Tables.documents(s, dir).select("doc_id", "text"), costFactor = 8)
      .mapPartitions { it =>
      it.flatMap { r =>
        val toks = r.getString(1).split("\\s+", -1)
        if (toks.length < n) Iterator.empty
        else {
          val set = new java.util.LinkedHashSet[String](math.max(16, toks.length * 2))
          val sb = new java.lang.StringBuilder(64)
          var i = 0
          while (i + n <= toks.length) {
            sb.setLength(0)
            var k = 0
            while (k < n) {
              if (k > 0) sb.append(' ')
              sb.append(toks(i + k))
              k += 1
            }
            set.add(sb.toString)
            i += 1
          }
          Iterator.single(Row(r.getLong(0), set.toArray(new Array[String](set.size)).toSeq))
        }
      }
    }(Encoders.row(schema)).persist()
}
