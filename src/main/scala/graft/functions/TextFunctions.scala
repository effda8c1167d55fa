package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-pipeline column builders, composed entirely from codegen'd Spark
  * built-ins (no UDFs) so they stay inside whole-stage codegen and are
  * reproducible in ANSI SQL for the DuckDB oracle.
  */
object TextFunctions {

  /** Whitespace tokenization — `regexp_split_to_array(text, '\s+')` in the
    * oracle.
    */
  def tokens(text: Column): Column = split(text, "\\s+")

  /** 60-bit deterministic string hash: first 15 hex digits of MD5 as a long.
    * Identical to [[Hash60]] (the imperative form used inside the SimHash
    * Catalyst expression) and to DuckDB's
    * `('0x' || substr(md5(x), 1, 15))::BIGINT` — one hash, three engines.
    */
  def hash60(s: Column): Column =
    conv(substring(md5(s), 1, 15), 16, 10).cast("long")

  /** Overlapping n-token shingles joined by single spaces; empty array for
    * documents shorter than n tokens. `toks[i:i+n-1]` slices in the oracle.
    * (Measured: slice+array_join beats per-element `element_at`+`concat_ws`
    * by ~4× here — element_at pays per-call bounds/null handling.)
    */
  def wordShingles(toks: Column, n: Int): Column =
    when(size(toks) >= n,
      transform(sequence(lit(1), size(toks) - (n - 1)),
        i => array_join(slice(toks, i, lit(n)), " ")))
      .otherwise(array().cast("array<string>"))
}
