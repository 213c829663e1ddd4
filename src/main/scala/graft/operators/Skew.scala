package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot keys.
  *
  * AQE's skew-join handling covers joins at runtime; this covers the
  * aggregation side: an exact two-phase distinct count where the salt
  * is derived from the VALUE hash, so equal values land on the same
  * salt and per-salt partial distincts sum to the exact answer — a hot
  * key's work spreads over `numSalts` reducers instead of one.
  */
object Skew {

  /** Exact distinct-count per key, skew-spread over value-hash salts.
    *
    * Phase 1 groups on (key, salt = hash(value) % numSalts) and counts
    * distinct values inside each salt; phase 2 sums the partials per
    * key. Identical values always share a salt, so no distinct value
    * is double-counted — the result equals countDistinct exactly.
    */
  def saltedDistinctCount(df: DataFrame, keyCol: String, valueCol: String,
      numSalts: Int = 16): DataFrame = {
    val salt: Column = pmod(xxhash64(col(valueCol)), lit(numSalts.toLong))
    df.select(col(keyCol), col(valueCol))
      .withColumn("_salt", salt)
      .groupBy(col(keyCol), col("_salt"))
      .agg(countDistinct(col(valueCol)).as("_partial"))
      .groupBy(col(keyCol))
      .agg(sum("_partial").as("n_distinct"))
  }
}
