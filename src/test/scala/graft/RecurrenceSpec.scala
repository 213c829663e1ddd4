package graft

import graft.operators.{Recurrence, Warehouse}
import org.apache.spark.sql.functions._

class RecurrenceSpec extends SparkSuite {

  // no global orderBy here: validateTicks' ORDER BY would add a range
  // exchange and muddy the exchange-count assertions
  private def ticks = Tables.events(spark, sfDir)
    .filter("value IS NOT NULL AND value > 0 AND user_id IS NOT NULL")
    .select("user_id", "ts", "event_id", "value")

  test("custom EmaAppend operator equals the RDD reference path") {
    val plan = Recurrence.withEmaMacd(ticks)
      .select("user_id", "event_id", "ema_12_raw", "ema_26_raw", "macd_raw")
    val rdd = Recurrence.withEmaMacdRdd(ticks)
      .select("user_id", "event_id", "ema_12_raw", "ema_26_raw", "macd_raw")
    assert(plan.count() == rdd.count())
    assert(plan.exceptAll(rdd).count() == 0)
    assert(rdd.exceptAll(plan).count() == 0)
  }

  test("EmaAppend inserts exactly one exchange on unpartitioned input") {
    val df = Recurrence.withEmaMacd(ticks)
    val exchanges = "Exchange".r
      .findAllIn(df.queryExecution.executedPlan.toString).length
    assert(exchanges == 1, s"expected 1 exchange, got $exchanges")
  }

  test("EmaAppend adds no exchange after a same-spec window pass") {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val windowed = ticks.withColumn("rn", row_number().over(w))
    val before = "Exchange".r
      .findAllIn(windowed.queryExecution.executedPlan.toString).length
    val after = "Exchange".r
      .findAllIn(Recurrence.withEmaMacd(windowed)
        .queryExecution.executedPlan.toString).length
    assert(after == before, s"EmaAppend added exchanges: $before -> $after")
  }

  test("withEmaMacd output supports direct actions (UnsafeRow contract)") {
    // regression: the physical node must emit UnsafeRows — a raw
    // JoinedRow made collect() without an intervening Project throw
    val rows = Recurrence.withEmaMacd(ticks).collect()
    assert(rows.length == ticks.count())
    // and buffering consumers must not see shared mutable state
    val distinctEma = rows.flatMap(r =>
      Option(r.getAs[java.lang.Double]("ema_12_raw"))).distinct
    assert(distinctEma.length > 1)
  }

  test("guards: ema null before period, macd null before 35 ticks") {
    val df = Recurrence.withEmaMacd(ticks)
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("user_id")
          .orderBy(col("ts"), col("event_id"))))
    assert(df.filter("rn < 12 AND ema_12_raw IS NOT NULL").count() == 0)
    assert(df.filter("rn >= 12 AND ema_12_raw IS NULL").count() == 0)
    assert(df.filter("rn < 35 AND macd_raw IS NOT NULL").count() == 0)
    assert(df.filter("rn >= 35 AND macd_raw IS NULL").count() == 0)
  }
}
