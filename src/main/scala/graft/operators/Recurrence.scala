package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.DoubleType

/** Single-pass per-key recurrences — the 100 TB execution path for
  * EMA/MACD (technical_indicators.py:117-130, 163-179).
  *
  * EMA is an inherently sequential per-symbol fold, so the distributed
  * shape is: hash-partition by key, sort runs by (key, ts, event_id),
  * then ONE streaming pass per partition with O(1) state per key — no
  * per-group materialization, no O(history²) window lists. Arithmetic
  * is the exact reference fold (`x*k + acc*(1-k)` seeded with the
  * first price), bit-identical to the declarative [[Indicators.ema]]
  * and to the DuckDB `list_reduce` oracle.
  */
object Recurrence {

  private val K12 = 2.0 / 13.0
  private val K26 = 2.0 / 27.0

  /** Appends ema_12_raw / ema_26_raw / macd_raw / macd_signal_raw /
    * macd_histogram_raw to a tick DataFrame containing
    * (user_id, ts, event_id, value, ...), via the custom
    * [[graft.plans.EmaAppend]] operator.
    *
    * The physical node declares its required distribution/ordering,
    * so Catalyst's EnsureRequirements adds an exchange + sort only
    * when the child isn't already clustered by user_id and sorted —
    * after a same-spec Window pass it runs with zero extra shuffle
    * and no Row deserialization.
    */
  def withEmaMacd(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    org.apache.spark.sql.GraftShim.addStrategy(spark, graft.plans.EmaStrategy)
    org.apache.spark.sql.GraftShim.ofRows(spark,
      graft.plans.EmaAppend(df.queryExecution.analyzed))
  }

  /** RDD-based fallback implementation of the same recurrence; kept as
    * a plain-Spark reference path and cross-checked against the custom
    * operator in RecurrenceSpec.
    *
    * @param assumePartitionedSorted set true when the input is already
    *   hash-partitioned by user_id with runs sorted by
    *   (user_id, ts, event_id) to append with no additional shuffle.
    */
  def withEmaMacdRdd(df: DataFrame, assumePartitionedSorted: Boolean = false): DataFrame = {
    val spark = df.sparkSession
    val in =
      if (assumePartitionedSorted) df
      else df.repartition(col("user_id"))
        .sortWithinPartitions("user_id", "ts", "event_id")
    val outSchema = in.schema
      .add("ema_12_raw", DoubleType).add("ema_26_raw", DoubleType)
      .add("macd_raw", DoubleType).add("macd_signal_raw", DoubleType)
      .add("macd_histogram_raw", DoubleType)
    val userIdx = in.schema.fieldIndex("user_id")
    val valueIdx = in.schema.fieldIndex("value")
    val rdd = in.rdd.mapPartitions { it =>
      var cur = 0L
      var started = false
      var n = 0
      var e12 = 0.0
      var e26 = 0.0
      it.map { r =>
        val u = r.getLong(userIdx)
        val v = r.getDouble(valueIdx)
        if (!started || u != cur) { cur = u; started = true; n = 0 }
        n += 1
        if (n == 1) { e12 = v; e26 = v }
        else {
          e12 = v * K12 + e12 * (1.0 - K12)
          e26 = v * K26 + e26 * (1.0 - K26)
        }
        val ema12 = if (n >= 12) java.lang.Double.valueOf(e12) else null
        val ema26 = if (n >= 26) java.lang.Double.valueOf(e26) else null
        val macd = if (n >= 35) java.lang.Double.valueOf(e12 - e26) else null
        val hist = if (n >= 35) java.lang.Double.valueOf(0.0) else null
        Row.fromSeq(r.toSeq ++ Seq(ema12, ema26, macd, macd, hist))
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }
}
