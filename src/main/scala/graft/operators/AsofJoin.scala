package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed as-of join: attach to each left row the latest right
  * row with the same key and `tsCol` at-or-before the left row's.
  *
  * This is the tick-data primitive behind the reference's
  * latest-before-timestamp lookups (producer.py:222-238 latest trade
  * date; db/current_schema.sql:134-162 latest row per day) generalized
  * to an arbitrary right-hand table.
  *
  * Spark has no ASOF JOIN operator, and an inequality join would
  * explode to a range scan per row (O(|L|·|R|) within a key). The
  * scalable shape is union + single hash shuffle on the key + one
  * sort: interleave both sides ordered by (ts, side), carry the right
  * side's payload forward with a running `last(ignoreNulls)` window,
  * then keep only left rows. One exchange, sorted runs stream, no
  * per-row scan — the same plan holds at 100 TB.
  */
object AsofJoin {

  /** As-of join `left` to `right` on equal `keys` and
    * right.ts ≤ left.ts (inclusive). The right payload columns arrive
    * prefixed (`prefix` + name, also `prefix` + tsCol for the matched
    * timestamp); unmatched left rows keep nulls.
    *
    * For deterministic results the right side must be unique per
    * (keys, tsCol) — pre-aggregate duplicates (e.g. max_by) first.
    * A genuinely-null right payload value is carried over by an older
    * non-null one (running last ignores nulls).
    */
  def asofJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
      tsCol: String, rightCols: Seq[String], prefix: String = "r_"): DataFrame = {
    val rSchema = right.schema
    val lSchema = left.schema
    val carried = (tsCol +: rightCols).map(prefix + _)

    val lPrep = rightCols.foldLeft(
      left.withColumn("_src", lit(1))
        .withColumn(prefix + tsCol, lit(null).cast(rSchema(tsCol).dataType))
    )((d, c) => d.withColumn(prefix + c, lit(null).cast(rSchema(c).dataType)))

    val leftOnly = left.columns.filterNot(c => keys.contains(c) || c == tsCol)
    val rPrep = leftOnly.foldLeft(
      right.select((keys :+ tsCol).map(col) ++
        rightCols.map(c => col(c).as(prefix + c)): _*)
        .withColumn(prefix + tsCol, col(tsCol))
        .withColumn("_src", lit(0))
    )((d, c) => d.withColumn(c, lit(null).cast(lSchema(c).dataType)))

    // at equal ts the right row sorts first (_src 0 < 1) → inclusive
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(tsCol), col("_src"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    lPrep.unionByName(rPrep.select(lPrep.columns.map(col): _*))
      .select(left.columns.map(col) ++
        carried.map(c => last(col(c), ignoreNulls = true).over(w).as(c)) :+
        col("_src"): _*)
      .filter(col("_src") === 1)
      .drop("_src")
  }

  /** Driver query: each valid 'view' tick joined as-of to the user's
    * latest at-or-before 'purchase' (purchases deduped per (user, ts)
    * keeping the highest event_id). Oracle: DuckDB ASOF LEFT JOIN.
    */
  def viewToPurchase(spark: SparkSession, dir: String): DataFrame = {
    val ev = Warehouse.validTicks(spark, dir)
    val views = ev.filter(col("event_type") === "view").drop("event_type")
    val purchases = ev.filter(col("event_type") === "purchase")
      .groupBy("user_id", "ts")
      .agg(max("event_id").as("event_id"),
        max_by(col("value"), col("event_id")).as("value"))
    asofJoin(views, purchases, Seq("user_id"), "ts",
      Seq("event_id", "value"), prefix = "p_")
      .select(col("user_id"), col("event_id"), col("ts"), col("value"),
        col("p_event_id"), col("p_ts"), col("p_value"),
        // µs-granular double diff: 6 decimals is the exact width, so
        // rounding is identity on both engines
        round(col("ts").cast("double") - col("p_ts").cast("double"), 6)
          .as("secs_since_purchase"))
  }

  def viewToPurchaseSql: String =
    """WITH p AS (
      |  SELECT user_id, ts, max(event_id) AS p_event_id,
      |         arg_max(value, event_id) AS p_value
      |  FROM events
      |  WHERE event_type = 'purchase' AND value IS NOT NULL AND value > 0
      |    AND NOT isnan(value) AND user_id IS NOT NULL
      |  GROUP BY user_id, ts),
      |v AS (
      |  SELECT event_id, ts, user_id, value FROM events
      |  WHERE event_type = 'view' AND value IS NOT NULL AND value > 0
      |    AND NOT isnan(value) AND user_id IS NOT NULL)
      |SELECT v.user_id, v.event_id, v.ts, v.value,
      |  p.p_event_id, p.ts AS p_ts, p.p_value,
      |  round(epoch(v.ts) - epoch(p.ts), 6) AS secs_since_purchase
      |FROM v ASOF LEFT JOIN p ON v.user_id = p.user_id AND v.ts >= p.ts
      |ORDER BY v.user_id, v.event_id""".stripMargin
}
