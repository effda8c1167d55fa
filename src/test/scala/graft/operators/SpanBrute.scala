package graft.operators

/** The ONE local brute-force reference for the duplicate-passage scan,
  * shared by the fixed-corpus spec (`CurationSpec`) and the randomized
  * property spec so the two can never assert divergent ground truths.
  * Mirrors [[DedupQueries.spanDedupFrame]]'s semantics exactly:
  * whitespace-split tokens, empty tokens dropped, non-overlapping 10-token
  * segments, a segment is duplicated when it appears in more than one
  * DISTINCT document.
  */
object SpanBrute {

  /** Per-source (n_segs, dup_segs, dup_chars) over (doc_id, source, text)
    * rows; sources whose docs yield no segments are absent, matching the
    * operator's empty-explode behavior.
    */
  def apply(corpus: Seq[(Long, String, String)]): Map[String, (Long, Long, Long)] = {
    val segsOf = (text: String) => {
      val toks = text.split("\\s+").filter(_.nonEmpty)
      (0 until toks.length / 10).map(i => toks.slice(10 * i, 10 * i + 10).mkString(" "))
    }
    val perDoc = corpus.map { case (id, src, text) => (id, src, segsOf(text)) }
    val docsPerSeg = perDoc
      .flatMap { case (id, _, segs) => segs.map(sg => (sg, id)) }
      .groupBy(_._1).map { case (sg, xs) => sg -> xs.map(_._2).distinct.size }
    perDoc
      .flatMap { case (_, src, segs) => segs.map(sg => (src, sg)) }
      .groupBy(_._1)
      .map { case (src, xs) =>
        val dups = xs.map(_._2).filter(sg => docsPerSeg(sg) > 1)
        src -> ((xs.size.toLong, dups.size.toLong, dups.map(_.length.toLong).sum))
      }
  }
}
