package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed range (interval) join: pair each left row with the
  * right rows of the same key whose timestamp falls in
  * [left.ts, left.ts + windowSec] — "what happened in the N minutes
  * after each event".
  *
  * A naive inequality join plans as a nested-loop (O(|L|·|R|) per
  * key). The scalable shape is the banded join: bucket time into
  * windowSec-wide bands, give each right row its band, explode each
  * left row to the ≤2 bands its window can touch, equi-join on
  * (key, band), then post-filter the exact interval. Both sides
  * shuffle once on (key, band); every candidate pair appears exactly
  * once because a right row lives in exactly one band.
  */
object RangeJoin {

  /** Band-join `left` to `right` on equal `keys` with
    * right.ts ∈ [left.ts, left.ts + windowSec]. Right payload arrives
    * as `prefix` + name (and `prefix` + tsCol).
    */
  def rangeJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
      tsCol: String, windowSec: Double, rightCols: Seq[String],
      prefix: String = "r_"): DataFrame = {
    require(windowSec > 0, s"windowSec must be positive: $windowSec")
    val band = (c: org.apache.spark.sql.Column) =>
      floor(c.cast("double") / windowSec).cast("long")
    val lExp = left.withColumn("_band",
      explode(array(band(col(tsCol)), band(col(tsCol)) + 1)))
    val rPrep = right.select(
      (keys.map(col) :+ col(tsCol).as(prefix + tsCol)) ++
        rightCols.map(c => col(c).as(prefix + c)): _*)
      .withColumn("_band", band(col(prefix + tsCol)))
    lExp.join(rPrep, keys :+ "_band")
      .filter(col(prefix + tsCol).cast("double") >= col(tsCol).cast("double") &&
        col(prefix + tsCol).cast("double") <= col(tsCol).cast("double") + windowSec)
      .drop("_band")
  }

  /** Driver query: every error event within 4 hours after each
    * purchase of the same user — the incident-correlation scan of an
    * operations dashboard. Oracle: plain DuckDB inequality join (fine
    * at oracle scale; the Spark side is the banded plan).
    */
  def purchaseErrors(spark: SparkSession, dir: String): DataFrame = {
    val ev = graft.Tables.events(spark, dir)
      .select("event_id", "ts", "user_id", "event_type")
    val purchases = ev.filter(col("event_type") === "purchase").drop("event_type")
    val errors = ev.filter(col("event_type") === "error").drop("event_type")
    rangeJoin(purchases, errors, Seq("user_id"), "ts", 14400.0,
      Seq("event_id"), prefix = "e_")
      .select(col("user_id"), col("event_id"), col("ts"),
        col("e_event_id"), col("e_ts"),
        round(col("e_ts").cast("double") - col("ts").cast("double"), 6)
          .as("secs_after"))
  }

  def purchaseErrorsSql: String =
    """SELECT l.user_id, l.event_id, l.ts,
      |  r.event_id AS e_event_id, r.ts AS e_ts,
      |  round(epoch(r.ts) - epoch(l.ts), 6) AS secs_after
      |FROM events l JOIN events r
      |  ON l.user_id = r.user_id
      |  AND l.event_type = 'purchase' AND r.event_type = 'error'
      |  AND epoch(r.ts) >= epoch(l.ts)
      |  AND epoch(r.ts) <= epoch(l.ts) + 14400
      |ORDER BY l.user_id, l.event_id, e_event_id""".stripMargin
}
