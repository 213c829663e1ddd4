package graft

import graft.operators.{Indicators, Recurrence, Warehouse}
import org.apache.spark.sql.functions._

class IndicatorsSpec extends SparkSuite {

  test("sma null until window full, then equals mean of last N") {
    val rows = Indicators.sma(spark, sfDir)
      .filter("user_id = 1").orderBy("event_id").collect()
    assert(rows.take(19).forall(_.isNullAt(rows.head.fieldIndex("sma_20"))))
    val values = rows.map(_.getAs[Double]("value"))
    val i = 25 // arbitrary row past warmup
    if (rows.length > i) {
      val expected = values.slice(i - 19, i + 1).sum / 20.0
      val got = rows(i).getAs[Double]("sma_20")
      assert(math.abs(got - expected) < 1e-3, s"got $got expected $expected")
    }
  }

  test("rsi bounded in [0, 100] and null before 15 ticks") {
    val df = Indicators.rsi(spark, sfDir)
    assert(df.filter("rsi_14 < 0 OR rsi_14 > 100").count() == 0)
    val first = df.filter("user_id = 1").orderBy("event_id").limit(14)
    assert(first.filter("rsi_14 IS NOT NULL").count() == 0)
  }

  test("bollinger band ordering upper >= middle >= lower") {
    val bad = Indicators.bollinger(spark, sfDir)
      .filter("bb_upper < bb_middle OR bb_middle < bb_lower")
    assert(bad.count() == 0)
  }

  test("volatility non-negative, null before 21 ticks") {
    val df = Indicators.volatility(spark, sfDir)
    assert(df.filter("volatility < 0").count() == 0)
    assert(df.filter("volatility IS NOT NULL").count() > 0)
  }

  test("recurrence-backed ema matches the declarative expanding fold exactly") {
    // independent O(history²) formulation of the same fold — the shape
    // the DuckDB list_reduce oracle uses; bit-identical, no tolerance
    import org.apache.spark.sql.expressions.Window
    val byUser = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val expanding = byUser.rowsBetween(Window.unboundedPreceding, 0)
    def fold(k: Double) = aggregate(
      slice(col("lvals"), lit(2), greatest(size(col("lvals")) - 1, lit(0))),
      element_at(col("lvals"), 1),
      (acc, x) => x * lit(k) + acc * lit(1.0 - k))
    val decl = Warehouse.validateTicks(spark, sfDir)
      .withColumn("rn", row_number().over(byUser))
      .withColumn("lvals", collect_list("value").over(expanding))
      .select(col("user_id"), col("event_id"),
        round(when(col("rn") >= 12, fold(2.0 / 13.0)), 6).as("ema_12"),
        round(when(col("rn") >= 26, fold(2.0 / 27.0)), 6).as("ema_26"))
    val sp = Indicators.ema(spark, sfDir)
      .select("user_id", "event_id", "ema_12", "ema_26")
    assert(decl.exceptAll(sp).count() == 0)
    assert(sp.exceptAll(decl).count() == 0)
  }

  test("macd = ema12 - ema26, signal equals macd, histogram zero") {
    val df = Indicators.macd(spark, sfDir)
    assert(df.filter("macd IS NOT NULL").count() > 0)
    assert(df.filter("macd != macd_signal").count() == 0)
    assert(df.filter("macd_histogram != 0.0").count() == 0)
  }

  test("analyticsFull covers every tick with all indicator columns") {
    val df = Indicators.analyticsFull(spark, sfDir)
    assert(df.count() == Warehouse.validateTicks(spark, sfDir).count())
    val cols = df.columns.toSet
    Seq("rsi_14", "sma_20", "sma_50", "ema_12", "ema_26", "bb_upper",
      "bb_middle", "bb_lower", "macd", "macd_signal", "macd_histogram",
      "volatility", "price_change_percent").foreach(c => assert(cols(c), c))
    // warm rows have everything populated
    assert(df.filter("sma_50 IS NOT NULL AND rsi_14 IS NOT NULL AND " +
      "macd IS NOT NULL AND volatility IS NOT NULL").count() > 0)
  }

  test("alerts only fire beyond thresholds") {
    val df = Indicators.alerts(spark, sfDir)
    assert(df.filter("alert_type = 'RSI_OVERBOUGHT' AND indicator_value <= 70").count() == 0)
    assert(df.filter("alert_type = 'RSI_OVERSOLD' AND indicator_value >= 30").count() == 0)
    assert(df.filter("alert_type = 'HIGH_VOLATILITY' AND indicator_value <= 0.05").count() == 0)
  }

  test("analyticsWindow is a bounded newest-first feed with the dim join") {
    val df = Indicators.analyticsWindow(spark, sfDir)
    val rows = df.collect()
    assert(rows.nonEmpty && rows.length <= 1000)
    val tsIdx = rows.head.fieldIndex("ts")
    val ts = rows.map(_.getTimestamp(tsIdx).getTime)
    assert(ts.zip(ts.tail).forall { case (a, b) => a >= b }, "newest first")
    assert(rows.forall(_.getAs[String]("symbol_name") != null))
    assert(df.queryExecution.executedPlan.toString.contains("TakeOrderedAndProject"))
  }

  test("recentAlerts is the newest-N slice of alerts with symbol names") {
    val rows = Indicators.recentAlerts(spark, sfDir).collect()
    assert(rows.nonEmpty && rows.length <= 50)
    val tsIdx = rows.head.fieldIndex("ts")
    val ts = rows.map(_.getTimestamp(tsIdx).getTime)
    assert(ts.zip(ts.tail).forall { case (a, b) => a >= b }, "newest first")
    assert(rows.forall(_.getAs[String]("symbol_name") != null))
    // the feed is a top-N, not a full sort-then-collect
    val plan = Indicators.recentAlerts(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), "expected top-N physical op")
  }
}
