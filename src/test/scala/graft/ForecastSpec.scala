package graft

import graft.operators.Forecast

class ForecastSpec extends SparkSuite {

  test("olsFit recovers exact linear relationship") {
    val xs = Array(Array(1.0, 2.0), Array(2.0, 1.0), Array(3.0, 5.0), Array(4.0, 0.0))
    val ys = xs.map(x => 3.0 + 2.0 * x(0) - 0.5 * x(1))
    val w = Forecast.olsFit(xs, ys).get
    assert(math.abs(w(0) - 3.0) < 1e-9 && math.abs(w(1) - 2.0) < 1e-9
      && math.abs(w(2) + 0.5) < 1e-9)
  }

  test("solve handles singular matrix gracefully") {
    val a = Array(Array(1.0, 2.0), Array(2.0, 4.0))
    assert(Forecast.solve(a, Array(1.0, 2.0)).isEmpty)
  }

  test("linregTrend yields one fit per key with finite slope") {
    val df = Forecast.linregTrend(spark, sfDir)
    assert(df.count() == Tables.events(spark, sfDir).select("user_id").distinct().count())
    assert(df.filter("slope_per_day IS NULL OR isnan(slope_per_day)").count() == 0)
  }

  test("linregAutoreg emits per-window predictions for keys with data") {
    val df = Forecast.linregAutoreg(spark, sfDir)
    assert(df.count() > 0)
    assert(df.filter("predicted_price IS NULL OR isnan(predicted_price)").count() == 0)
    assert(df.filter("train_mse < 0").count() == 0)
  }

  test("predictions emits ARIMA + LinearRegression rows with bounded confidence") {
    val rows = Forecast.predictions(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val types = rows.map(_.getAs[String]("model_type")).toSet
    assert(types == Set("ARIMA", "LinearRegression"))
    assert(rows.forall { r =>
      val c = r.getAs[Double]("confidence_score"); c >= 0.0 && c <= 1.0
    })
  }

  test("ADF test: stationary series accepted, random walk rejected") {
    val rnd = new scala.util.Random(7L)
    // AR(1) with phi=0.3 — strongly stationary
    var x = 0.0
    val ar1 = Array.fill(300) { x = 0.3 * x + rnd.nextGaussian(); x }
    assert(Forecast.isStationaryAdf(ar1), "AR(1) phi=0.3 must test stationary")
    // pure random walk — unit root, must NOT test stationary
    var w = 0.0
    val walk = Array.fill(300) { w += rnd.nextGaussian(); w }
    assert(!Forecast.isStationaryAdf(walk), "random walk must test non-stationary")
    // first difference of the walk is white noise → stationary
    val dwalk = walk.sliding(2).map(p => p(1) - p(0)).toArray
    assert(Forecast.isStationaryAdf(dwalk), "differenced walk must be stationary")
  }

  test("adfStat is strongly negative for white noise") {
    val rnd = new scala.util.Random(11L)
    val noise = Array.fill(200)(rnd.nextGaussian())
    val stat = Forecast.adfStat(noise, 0).get
    assert(stat < -5.0, s"white-noise ADF stat should be very negative, got $stat")
  }

  test("arimaForecast selects an order and produces a finite forecast") {
    val df = Forecast.arimaForecast(spark, sfDir).collect()
    assert(df.nonEmpty)
    df.foreach { r =>
      assert(r.getInt(r.fieldIndex("p")) >= 0 && r.getInt(r.fieldIndex("p")) <= 3)
      assert(r.getInt(r.fieldIndex("d")) >= 0 && r.getInt(r.fieldIndex("d")) <= 2)
      val f = r.getDouble(r.fieldIndex("forecast_1"))
      assert(!f.isNaN && !f.isInfinite)
      // forecast should be in a sane band around the last price
      val last = r.getDouble(r.fieldIndex("last_price"))
      assert(math.abs(f - last) < math.max(10 * last, 1000.0))
    }
  }
}
