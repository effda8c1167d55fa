package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** Corpus-curation operators: duplicate-cluster resolution invariants,
  * deterministic sampling membership, heavy-hitter ordering, and the
  * pseudonymization/k-anonymity report.
  */
class CurationSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  val dir = "/root/testdata/sf0.01"

  /** Reference 60-bit hash (first 15 hex chars of md5) for spot checks. */
  private def hash60(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.substring(0, 15), 16)
  }

  test("dedupClusters: labels are component minima over the pair graph") {
    val pairs = DedupQueries.minhashLsh(spark, dir)
      .select("d1", "d2").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty, "sf0.01 corpus must contain near-dup pairs")

    val out = DedupQueries.dedupClusters(spark, dir).collect()
    val cluster = out.map(r => r.getLong(0) -> r.getLong(1)).toMap
    val size = out.map(r => r.getLong(1) -> r.getLong(2)).toMap

    // Exactly the docs that appear in >=1 pair are labeled.
    assert(cluster.keySet == pairs.flatMap(p => Seq(p._1, p._2)).toSet)
    // Both endpoints of every edge land in the same cluster.
    pairs.foreach { case (a, b) =>
      assert(cluster(a) == cluster(b), s"edge ($a,$b) split across clusters")
    }
    // The cluster id is the minimum member id, and it is a member.
    cluster.groupBy(_._2).foreach { case (cid, members) =>
      assert(members.keys.min == cid)
      assert(size(cid) == members.size)
    }
    // is_kept marks exactly one doc per cluster: the minimum.
    val kept = out.filter(_.getBoolean(3)).map(_.getLong(0)).toSet
    assert(kept == cluster.values.toSet)

    // Union-find ground truth: component assignment matches exactly.
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    cluster.foreach { case (doc, cid) => assert(find(doc) == cid) }

    DedupQueries.releaseClusterLabels(spark)
  }

  test("stratifiedSample: hash-gated membership is exact and deterministic") {
    val docs = Tables.documents(spark, dir)
      .select("doc_id", "lang").collect().map(r => (r.getLong(0), r.getString(1)))
    val expected = docs.groupBy(_._2).map { case (lang, rows) =>
      val rate = if (lang == "en") 300 else 600
      val keptIds = rows.collect {
        case (id, _) if hash60(s"sample-$id") % 1000 < rate => id
      }
      lang -> ((rows.size.toLong, keptIds.length.toLong, keptIds.sum))
    }
    val out = CurationQueries.stratifiedSample(spark, dir).collect()
    assert(out.map(_.getString(0)).toSet == expected.keySet)
    out.foreach { r =>
      val (nTotal, nKept, keptSum) = expected(r.getString(0))
      assert(r.getInt(1) == (if (r.getString(0) == "en") 300 else 600))
      assert(r.getLong(2) == nTotal)
      assert(r.getLong(3) == nKept)
      assert(r.getLong(4) == keptSum)
      // The sample is a real downsample, not all-or-nothing.
      assert(nKept > 0 && nKept < nTotal)
    }
  }

  test("heavyHitters: per-language top-5 with total tie ordering") {
    val out = CurationQueries.heavyHitters(spark, dir)
      .orderBy("lang", "rnk").collect()
    val byLang = out.groupBy(_.getString(0))
    assert(byLang.nonEmpty)
    byLang.foreach { case (_, rows) =>
      assert(rows.map(_.getInt(3)).toSeq == (1 to rows.length))
      assert(rows.length <= 5)
      // Counts non-increasing with rank; ties broken by token ascending.
      rows.sliding(2).foreach {
        case Array(hi, lo) =>
          val (nh, nl) = (hi.getLong(2), lo.getLong(2))
          assert(nh > nl || (nh == nl && hi.getString(1) < lo.getString(1)))
        case _ =>
      }
    }
    // Tokens are the lowercase-alpha alphabet only.
    assert(out.forall(_.getString(1).matches("[a-z]+")))
  }

  test("decontaminate: finds exactly the train docs sharing repeated shingles with the benchmark slice") {
    val out = CurationQueries.decontaminate(spark, dir).collect()
    assert(out.nonEmpty, "sf0.01 must surface contamination at the 3-gram/2 threshold")
    // No benchmark doc may appear as a flagged training doc.
    assert(out.forall(_.getLong(0) % 97 != 0))
    // Ground truth for one flagged doc: recompute its shingle overlap
    // against every benchmark doc directly from the text.
    def shingles(text: String): Set[String] = {
      val toks = text.split("\\s+", -1)
      if (toks.length < 3) Set.empty
      else toks.sliding(3).map(_.mkString(" ")).toSet
    }
    val docs = Tables.documents(spark, dir).select("doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val bench = docs.filter(_._1 % 97 == 0)
    val flagged = out.head
    val mine = shingles(docs(flagged.getLong(0)))
    val overlaps = bench.map { case (bid, t) => bid -> (mine & shingles(t)).size }
      .filter(_._2 >= 2)
    assert(flagged.getLong(1) == overlaps.size, "n_bench_hits must match ground truth")
    assert(flagged.getLong(2) == overlaps.values.max, "max_overlap must match ground truth")
    assert(flagged.getLong(3) == overlaps.keys.sum, "bench_id_sum must pin the exact hit set")
  }

  test("tokenBudgetMix: hash-priority prefix per source, budget as target not cap") {
    val out = CurationQueries.tokenBudgetMix(spark, dir).collect()
    assert(out.nonEmpty)
    val docs = Tables.documents(spark, dir).select("source", "doc_id", "text").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2).split("\\s+", -1).length.toLong))
    out.foreach { r =>
      val source = r.getString(0)
      val mine = docs.filter(_._1 == source)
        .map { case (_, id, toks) => (hash60(s"mix-$id"), id, toks) }
        .sortBy(t => (t._1, t._2))
      // Replay the cumulative-sum gate driver-side.
      var cum = 0L
      val kept = mine.takeWhile { case (_, _, toks) =>
        val in = cum < 20000L; cum += toks; in
      }
      assert(r.getLong(1) == mine.length)
      assert(r.getLong(3) == kept.length, s"$source n_kept")
      assert(r.getLong(4) == kept.map(_._3).sum, s"$source tokens_kept")
      assert(r.getLong(5) == kept.map(_._2).sum, s"$source kept_id_sum")
      // Budget semantics: the kept set crosses the line by at most one doc.
      assert(kept.map(_._3).sum >= math.min(20000L, mine.map(_._3).sum))
    }
  }

  test("sequencePacking: window math matches a driver-side replay of the packed stream") {
    val out = CurationQueries.sequencePacking(spark, dir).collect()
    assert(out.nonEmpty)
    val docs = Tables.documents(spark, dir).select("source", "doc_id", "text").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2).split("\\s+", -1).length.toLong))
    out.foreach { r =>
      val source = r.getString(0)
      val mine = docs.filter(_._1 == source)
        .map { case (_, id, toks) => (hash60(s"mix-$id"), id, toks) }
        .sortBy(t => (t._1, t._2))
      var off = 0L
      var straddling = 0L
      mine.foreach { case (_, _, toks) =>
        if (off / 512 != (off + toks - 1) / 512) straddling += 1
        off += toks
      }
      assert(r.getLong(1) == mine.length)
      assert(r.getLong(2) == off, s"$source tokens_total")
      assert(r.getLong(3) == (off + 511) / 512, s"$source n_windows")
      assert(r.getLong(4) == straddling, s"$source n_straddling")
      assert(r.getLong(5) == (512 - off % 512) % 512, s"$source tail_waste")
      // Packing invariant: window capacity covers the stream with < one
      // window of slack.
      assert(r.getLong(3) * 512 - r.getLong(5) == off)
    }
  }

  test("cmsTokenCounts: count-min never underestimates and stays within the eps bound") {
    val out = CurationQueries.cmsTokenCounts(spark, dir).collect()
    assert(out.length == 5)
    val totalTokens = Tables.documents(spark, dir)
      .select(explode(split(lower(col("text")), "[^a-z]+")).as("t"))
      .filter(col("t") =!= "").count()
    out.foreach { r =>
      val (est, exact) = (r.getLong(1), r.getLong(2))
      assert(est >= exact, s"${r.getString(0)}: CMS must never underestimate")
      // eps = e / width: overshoot bounded by eps * totalTokens whp (the
      // 4-row min makes the bound hold with prob 1 - e^-4 per probe).
      assert(est - exact <= math.ceil(math.E / 1024.0 * totalTokens).toLong * 4,
        s"${r.getString(0)}: overshoot ${est - exact} beyond the CMS bound")
    }
  }

  test("hllDistinctUsers: estimate lands within 10% of exact at this cardinality") {
    val out = CurationQueries.hllDistinctUsers(spark, dir).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val exact = r.getLong(1).toDouble
      val est = r.getDouble(2)
      assert(r.getLong(3) + r.getLong(4) == 512L, "used + empty must cover all registers")
      assert(math.abs(est - exact) / exact <= 0.10,
        s"${r.getString(0)}: |$est - $exact| beyond 10%")
    }
  }

  test("pseudonymize: k-anonymity report with exact keyed tokens") {
    val out = CurationQueries.pseudonymizedSegments(spark, dir).collect()
    val total = Tables.customer(spark, dir).count()
    assert(out.map(_.getLong(2)).sum == total, "every customer lands in one class")
    out.foreach { r =>
      assert(r.getLong(3) <= r.getLong(2), "distinct pseudonyms <= class size")
    }
    // Spot-check the keyed token for one real customer against the report.
    val one = Tables.customer(spark, dir)
      .select("c_name", "c_mktsegment", "c_acctbal").limit(1).collect().head
    val pid = hash60(s"pseud-v1-${one.getString(0)}")
    val bucket = math.floor(one.getDouble(2) / 1000).toLong
    val row = out.find(r => r.getString(0) == one.getString(1) && r.getLong(1) == bucket).get
    assert(row.getLong(4) >= pid % 1000000007L,
      "class checksum must include the member's token residue")
  }

  test("bloomDecon: per-source probe stats match a brute-force Bloom simulation") {
    // Ground truth: simulate the m=2^20/k=3 Bloom over the train split's
    // 5-gram shingles and probe the test split, entirely in local Scala.
    val docs = Tables.documents(spark, dir)
      .select("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val shinglesOf = (text: String) => {
      val toks = text.split("\\s+", -1)
      (0 to toks.length - 5).map(i => toks.slice(i, i + 5).mkString(" ")).distinct
    }
    val nibOf = (id: Long) => hash60(s"split-$id") % 16
    val bitsOf = (sh: String) => (0 until 3).map(j => hash60(s"bloom$j-$sh") % (1L << 20))
    val train = docs.filter(d => nibOf(d._1) < 12).flatMap(d => shinglesOf(d._3)).toSet
    val setBits = train.flatMap(bitsOf)
    val expected = docs.filter(d => nibOf(d._1) >= 14)
      .map { case (id, src, text) => (id, src, shinglesOf(text)) }
      .filter(_._3.nonEmpty)
      .groupBy(_._2)
      .map { case (src, ds) =>
        val shs = ds.flatMap(_._3)
        src -> ((ds.length.toLong, shs.length.toLong,
          shs.count(sh => bitsOf(sh).forall(setBits)).toLong,
          shs.count(train).toLong))
      }

    val out = CurationQueries.bloomDecon(spark, dir).collect()
    assert(out.map(_.getString(0)).toSet == expected.keySet)
    out.foreach { r =>
      val (nDocs, nSh, bloomHits, exactHits) = expected(r.getString(0))
      assert(r.getLong(1) == nDocs && r.getLong(2) == nSh,
        s"probe totals mismatch for ${r.getString(0)}")
      assert(r.getLong(3) == bloomHits, s"bloom_hits mismatch for ${r.getString(0)}")
      assert(r.getLong(4) == exactHits, s"exact_hits mismatch for ${r.getString(0)}")
      // The defining Bloom guarantee: no false negatives, only false positives.
      assert(r.getLong(3) >= r.getLong(4),
        s"bloom_hits < exact_hits for ${r.getString(0)} — impossible for a Bloom filter")
    }
    // Non-vacuity: the split boundary must actually cut through near-dup text.
    assert(out.map(_.getLong(4)).sum > 0, "corpus must contain cross-split leakage")

    val plan = org.apache.spark.sql.graftbridge.PlanBridge
      .executedPlan(CurationQueries.bloomDecon(spark, dir)).toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"),
      s"bloom probe must stay keyed joins:\n$plan")
  }

  test("spanDedup: per-source stats match a brute-force span count") {
    // Ground truth: brute-force the 10-token segment occurrence counts on
    // the collected corpus and re-derive every per-source aggregate.
    val docs = Tables.documents(spark, dir)
      .select("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val expected = SpanBrute(docs.toSeq)

    val out = DedupQueries.spanDedup(spark, dir).collect()
    assert(out.map(_.getString(0)).toSet == expected.keySet)
    out.foreach { r =>
      val (nSegs, dupSegs, dupChars) = expected(r.getString(0))
      assert(r.getLong(1) == nSegs, s"n_segs mismatch for ${r.getString(0)}")
      assert(r.getLong(2) == dupSegs, s"dup_segs mismatch for ${r.getString(0)}")
      assert(r.getLong(3) == dupChars, s"dup_chars mismatch for ${r.getString(0)}")
    }
    // Non-vacuity: the corpus contains injected duplicate passages.
    assert(out.map(_.getLong(2)).sum > 0, "corpus must contain duplicated spans")

    // Scale shape: the mark-back join must be keyed (no cartesian/BNLJ) and
    // nothing corpus-sized may broadcast — the count side aggregates on the
    // 16-byte digest, so the join is a shuffle/SMJ on seg_h at scale.
    val plan = org.apache.spark.sql.graftbridge.PlanBridge
      .executedPlan(DedupQueries.spanDedup(spark, dir)).toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"),
      s"span mark-back must be an equi-join on seg_h:\n$plan")
  }
}
