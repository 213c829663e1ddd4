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

  /** Skew-proof equi-join for when the small side is too big to
    * broadcast whole but a hot key would melt one reducer: salt the
    * big side's rows uniformly over `numSalts` sub-keys and replicate
    * each small-side row once per salt, so a hot key's probe rows
    * spread over `numSalts` reducers. Result equals
    * `big.join(small, keys)` exactly (inner).
    *
    * Replication multiplies the small side by `numSalts` — keep it for
    * the "hot key × medium dim" regime; AQE's runtime skew split
    * covers sort-merge joins, this covers the planned-shuffle case.
    */
  def saltedJoin(big: DataFrame, small: DataFrame, keys: Seq[String],
      numSalts: Int = 8): DataFrame = {
    require(numSalts > 0, s"numSalts must be positive: $numSalts")
    val saltsLit = array((0 until numSalts).map(lit): _*)
    // salt from the row CONTENT, not monotonically_increasing_id():
    // a stage retry recomputes ids differently, which would re-salt
    // rows and duplicate/lose pairs; a content hash is stable under
    // recomputation. CAVEAT: fully-identical rows share a salt, so
    // the big side needs a distinguishing column (an event id — every
    // table here has one) for a hot key to actually spread; dedup
    // first if the input genuinely contains byte-identical rows.
    val bigS = big.withColumn("_salt",
      pmod(xxhash64(big.columns.map(col): _*), lit(numSalts.toLong)).cast("int"))
    val smallS = small.withColumn("_salt", explode(saltsLit))
    bigS.join(smallS, keys :+ "_salt").drop("_salt")
  }
}
