package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale patterns as first-class, testable operators: salting for skewed
  * aggregation and partitioned corpus export. (Bucketed co-located joins are
  * exercised in `BucketingSpec` — they need a catalog table, not a frame.)
  */
object ScaleOps {

  /** Two-phase salted aggregation. A straight `groupBy(key)` over a key with
    * a hot value (think: `lang='en'` on a web corpus — 60% of 100 TB) sends
    * the hot key's entire volume to ONE reducer; AQE can split post-shuffle
    * partitions but the map output is already built. Salting fixes it at the
    * source: phase 1 groups by (key, salt) where salt = hash(whole row,
    * row position) mod `salts`, spreading the hot key over `salts` reducers;
    * phase 2 re-groups the `salts`-sized partials by key. Phase 2's input is
    * |keys|·salts rows — negligible. Results are EXACTLY the plain
    * aggregation's (sum/count are associative-commutative); the oracle
    * (`q_salted_agg`) proves it.
    *
    * The salt mixes `monotonically_increasing_id()` in with the row hash:
    * a hash of the row CONTENT alone sends fully-duplicate rows of a hot
    * key to one salt bucket — the mitigation would degenerate exactly when
    * the hot key's rows are identical (common for low-cardinality event
    * rows). Position is unique per row, so duplicates spread; the final
    * re-group by key erases any run-to-run assignment difference.
    */
  def saltedAgg(df: DataFrame, key: String, salts: Int,
      countAs: String, sumCol: String, sumAs: String): DataFrame =
    df
      .withColumn("_salt", pmod(
        xxhash64(struct(df.columns.toIndexedSeq.map(col): _*), monotonically_increasing_id()),
        lit(salts)))
      .groupBy(col(key), col("_salt"))
      .agg(count(lit(1)).as("_n"), sum(sumCol).as("_s"))
      .groupBy(col(key))
      .agg(sum("_n").as(countAs), sum("_s").as(sumAs))

  /** Curated-corpus export: the output layout that makes a 100-TB corpus
    * consumable. `partitionBy` buckets files by the query predicate users
    * filter on (partition pruning on read), `maxRecordsPerFile` bounds file
    * size so downstream loaders parallelize, and `sortWithinPartitions`
    * makes row order deterministic per file.
    */
  def writeCorpus(df: DataFrame, outDir: String, partitionCols: Seq[String],
      sortCols: Seq[String], maxRecordsPerFile: Int): Unit =
    df
      .repartition(partitionCols.map(col): _*)
      .sortWithinPartitions((partitionCols ++ sortCols).map(col): _*)
      .write
      .partitionBy(partitionCols: _*)
      .option("maxRecordsPerFile", maxRecordsPerFile.toLong)
      .mode("overwrite")
      .parquet(outDir)
}
