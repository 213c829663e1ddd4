package graft

import graft.operators.Forecast
import org.apache.spark.sql.functions.col

class ForecastSpec extends SparkSuite {

  test("holtForecast equals a driver-side level/trend walk") {
    def srd(x: Double) = BigDecimal(x * 1e6)
      .setScale(0, BigDecimal.RoundingMode.HALF_UP).toDouble / 1e6
    val closes = graft.operators.Warehouse.validDailyOhlc(spark, sfDir)
      .select("user_id", "trade_date", "close_price").collect()
      .map(r => (r.getLong(0), r.getAs[java.sql.Date](1), r.getDouble(2)))
      .groupBy(_._1)
      .map { case (u, g) => u -> g.sortBy(_._2.getTime) }
    val got = Forecast.holtForecast(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getAs[java.sql.Date](1)) -> r).toMap
    assert(got.size == closes.values.map(_.size).sum)
    closes.foreach { case (uid, days) =>
      var (l, b) = (0.0, 0.0)
      days.zipWithIndex.foreach { case ((_, d, y), i) =>
        val r = got((uid, d))
        if (i == 0) assert(r.isNullAt(r.fieldIndex("level")), s"$uid/$d seed")
        else {
          if (i == 1) { l = y; b = y - days(0)._3 }
          else {
            val nl = 0.5 * y + 0.5 * (l + b)
            b = 0.3 * (nl - l) + 0.7 * b
            l = nl
          }
          assert(r.getAs[Double]("level") == srd(l), s"$uid/$d level")
          assert(r.getAs[Double]("trend") == srd(b), s"$uid/$d trend")
          assert(r.getAs[Double]("fcst_next") == srd(l + b), s"$uid/$d fcst")
        }
      }
    }
  }

  test("holtWinters equals a driver level/trend/seasonal walk") {
    def srd(x: Double) = BigDecimal(x * 1e6)
      .setScale(0, BigDecimal.RoundingMode.HALF_UP).toDouble / 1e6
    val closes = graft.operators.Warehouse.validDailyOhlc(spark, sfDir)
      .select("user_id", "trade_date", "close_price").collect()
      .map(r => (r.getLong(0), r.getAs[java.sql.Date](1), r.getDouble(2)))
      .groupBy(_._1)
      .map { case (u, g) => u -> g.sortBy(_._2.getTime) }
    val got = Forecast.holtWinters(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getAs[java.sql.Date](1)) -> r).toMap
    assert(got.size == closes.values.map(_.size).sum)
    var seasonal = 0 // symbols where the seasonal state actually runs
    closes.foreach { case (uid, days) =>
      val ys = days.map(_._3)
      val n = ys.length
      days.zipWithIndex.foreach { case ((_, d, _), i) =>
        val r = got((uid, d))
        if (n < 10 || i < 4)
          assert(r.isNullAt(r.fieldIndex("level")), s"$uid/$d null shape")
      }
      if (n >= 10) {
        seasonal += 1
        val l5 = ((((ys(0) + ys(1)) + ys(2)) + ys(3)) + ys(4)) / 5.0
        val b5 = (((((ys(5) - ys(0)) + (ys(6) - ys(1))) + (ys(7) - ys(2)))
          + (ys(8) - ys(3))) + (ys(9) - ys(4))) / 25.0
        var (l, b) = (l5, b5)
        var u = (0 to 4).map(ys(_) - l5).toVector // next-use rotation
        (4 until n).foreach { i =>
          if (i > 4) {
            val y = ys(i)
            val nl = 0.5 * (y - u(0)) + 0.5 * (l + b)
            b = 0.3 * (nl - l) + 0.7 * b
            val s = 0.2 * (y - nl) + 0.8 * u(0)
            l = nl
            u = u.tail :+ s
          }
          val r = got((uid, days(i)._2))
          assert(r.getAs[Double]("level") == srd(l), s"$uid@$i level")
          assert(r.getAs[Double]("trend") == srd(b), s"$uid@$i trend")
          assert(r.getAs[Double]("season") == srd(u(4)), s"$uid@$i season")
          assert(r.getAs[Double]("fcst_next") == srd(l + b + u(0)),
            s"$uid@$i fcst")
        }
      }
    }
    assert(seasonal > 0, "no symbol reached the 10-session seed floor")
  }

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

  test("linregCheck: every eligible key fits at the normal-equation optimum") {
    val eligible = graft.operators.Warehouse.validTicks(spark, sfDir)
      .groupBy("user_id").count().filter("count >= 7")
      .collect().map(r => r.getLong(0) -> (r.getLong(1) - 6)).toMap
    val rows = Forecast.linregCheck(spark, sfDir).collect()
    assert(rows.map(_.getAs[Long]("user_id")).toSet == eligible.keySet,
      "one check row per eligible key, no losses")
    rows.foreach { r =>
      assert(r.getAs[Long]("n_train") == eligible(r.getAs[Long]("user_id")))
      assert(r.getAs[Boolean]("normal_eq_ok"),
        s"key ${r.getAs[Long]("user_id")}: gradient not zero at the fit")
    }
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

  test("arimaForecast selects an order and produces finite multi-step forecasts") {
    val df = Forecast.arimaForecast(spark, sfDir).collect()
    assert(df.nonEmpty)
    df.foreach { r =>
      assert(r.getInt(r.fieldIndex("p")) >= 0 && r.getInt(r.fieldIndex("p")) <= 5)
      assert(r.getInt(r.fieldIndex("q")) >= 0 && r.getInt(r.fieldIndex("q")) <= 5)
      assert(r.getInt(r.fieldIndex("d")) >= 0 && r.getInt(r.fieldIndex("d")) <= 2)
      val last = r.getDouble(r.fieldIndex("last_price"))
      var prevWidth = 0.0
      for (h <- 1 to 5) {
        val f = r.getDouble(r.fieldIndex(s"forecast_$h"))
        val lo = r.getDouble(r.fieldIndex(s"ci_lower_$h"))
        val hi = r.getDouble(r.fieldIndex(s"ci_upper_$h"))
        assert(!f.isNaN && !f.isInfinite)
        assert(lo <= f && f <= hi, s"step $h: interval must bracket the forecast")
        // forecast-error variance accumulates with horizon
        assert(hi - lo >= prevWidth - 1e-9, s"step $h: interval must not shrink")
        prevWidth = hi - lo
        assert(math.abs(f - last) < math.max(10 * last, 1000.0))
      }
    }
  }

  test("95% interval covers the actual on simulated AR(1) series") {
    val rnd = new scala.util.Random(19L)
    val trials = 60
    var covered = 0
    for (_ <- 0 until trials) {
      var x = 0.0
      val series = Array.fill(220) { x = 50.0 + 0.6 * (x - 50.0) + rnd.nextGaussian(); x }
      val res = Forecast.arimaFitSeries(series.dropRight(1), steps = 1).get
      val actual = series.last
      if (res.lower(0) <= actual && actual <= res.upper(0)) covered += 1
    }
    // expected ~0.95; conditional-OLS sigma2 and order selection noise
    // justify a generous floor, but far above chance
    assert(covered.toDouble / trials >= 0.8,
      s"coverage ${covered.toDouble / trials} below 0.8")
  }

  test("fixed-order (0,1,0) forecast is last + mean(diff), interval from pop-variance") {
    // ARIMA(0,1,0): differenced series is white noise around its mean,
    // so the 1-step forecast and interval are hand-computable
    val prices = Array(100.0, 101.5, 101.0, 103.0, 102.5, 104.0, 105.5,
      104.5, 106.0, 107.5, 107.0, 108.5, 110.0, 109.0, 111.0, 112.5)
    val res = Forecast.arimaFixedOrder(prices, 0, 1, 0, steps = 1).get
    val diffs = prices.sliding(2).map(p => p(1) - p(0)).toArray
    val drift = diffs.sum / diffs.length
    val expected = prices.last + drift
    assert(math.abs(res.forecasts(0) - expected) < 1e-9)
    val popVar = diffs.map(d => (d - drift) * (d - drift)).sum / diffs.length
    val halfWidth = 1.959963984540054 * math.sqrt(popVar)
    assert(math.abs((res.upper(0) - res.lower(0)) / 2.0 - halfWidth) < 1e-9)
  }

  test("forecastAccuracy reports consistent error metrics per key") {
    val rows = Forecast.forecastAccuracy(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val mae = r.getDouble(r.fieldIndex("mae"))
      val rmse = r.getDouble(r.fieldIndex("rmse"))
      val mape = r.getDouble(r.fieldIndex("mape"))
      assert(mae >= 0 && mape >= 0)
      // RMSE dominates MAE (Jensen); 1e-4 slack for output rounding
      assert(rmse >= mae - 1e-4, s"rmse $rmse < mae $mae")
      assert(r.getLong(r.fieldIndex("n_backtest")) >= 5)
    }
  }

  test("model registry: saved+loaded serve equals the fresh forecast exactly") {
    val reg = Forecast.modelRegistry(spark, sfDir)
    val path = java.nio.file.Files.createTempDirectory("arima_reg").toString
    Forecast.saveModelRegistry(reg, path)
    val served = Forecast.arimaForecastFromRegistry(
        Forecast.loadModelRegistry(spark, path))
      .orderBy("user_id").collect().map(_.toString).toSeq
    val fresh = Forecast.arimaForecast(spark, sfDir)
      .collect().map(_.toString).toSeq
    // bit-identical rows: AIC, every forecast step and CI bound — the
    // registry's tail state loses nothing vs the full history (content
    // compared sorted; the serve surface is unordered)
    assert(served.nonEmpty && served.sorted == fresh.sorted)
    // one model per trainable symbol, and serve never refits: a
    // corrupted registry must fail loudly at load, not serve garbage
    assert(reg.count() == fresh.length)
    val bad = java.nio.file.Files.createTempDirectory("arima_reg_bad").toString
    Tables.events(spark, sfDir).limit(5).write.mode("overwrite").parquet(bad)
    intercept[IllegalArgumentException] {
      Forecast.loadModelRegistry(spark, bad)
    }: Unit
  }

  test("registry refresh refits only stale symbols, keeps the rest verbatim") {
    import spark.implicits._
    // hourly ticks; price pattern fits cleanly at 60+ points
    def mk(user: Long, hours: Range): Seq[(Long, java.sql.Timestamp, Long, String, Double)] =
      hours.map(h => (user * 100000L + h,
        new java.sql.Timestamp(1700000000000L + 3600000L * h), user, "tick",
        100.0 + user + 5.0 * math.sin(h * 0.7) + 0.01 * h))
    def df(rows: Seq[(Long, java.sql.Timestamp, Long, String, Double)]) =
      rows.toDF("event_id", "ts", "user_id", "event_type", "value")
    val base = df(mk(1, 0 until 60) ++ mk(2, 0 until 60))
    val registry = Forecast.modelRegistryTicks(base)
    def rows(d: org.apache.spark.sql.DataFrame) =
      d.collect().sortBy(_.getLong(0)).map(_.toString).toSeq
    assert(registry.count() == 2)

    // nothing new → nothing stale, refresh is the identity
    assert(Forecast.staleModels(registry, base).count() == 0)
    assert(rows(Forecast.refreshModelRegistryTicks(registry, base))
      == rows(registry))

    // +12 ticks for symbol 2 (≥ minNewObs) and a brand-new symbol 3:
    // both stale; symbol 1 untouched and carried verbatim
    val grown = df(mk(1, 0 until 60) ++ mk(2, 0 until 72) ++ mk(3, 0 until 60))
    val stale = Forecast.staleModels(registry, grown)
      .collect().map(_.getLong(0)).toSet
    assert(stale == Set(2L, 3L), s"stale = $stale")
    val refreshed = Forecast.refreshModelRegistryTicks(registry, grown)
    val byUser = refreshed.collect().map(r => r.getLong(0) -> r.toString).toMap
    assert(byUser.keySet == Set(1L, 2L, 3L))
    assert(byUser(1L) == rows(registry.filter(col("user_id") === 1L)).head,
      "unchanged symbol must carry its old registry row bit-identically")
    val fresh = Forecast.modelRegistryTicks(grown)
    val freshBy = fresh.collect().map(r => r.getLong(0) -> r.toString).toMap
    assert(byUser(2L) == freshBy(2L) && byUser(3L) == freshBy(3L),
      "stale symbols must equal a from-scratch fit on the full history")

    // a trickle below minNewObs still goes stale once it lags > 7 days
    val lagged = df(mk(1, 0 until 60) ++ mk(1, 252 until 254) ++ mk(2, 0 until 60))
    val staleLag = Forecast.staleModels(registry, lagged)
      .collect().map(_.getLong(0)).toSet
    assert(staleLag == Set(1L), s"staleLag = $staleLag")

    // a stale symbol whose history cannot fit keeps its previous model
    // (serve never loses a model to an in-flight refresh)
    val trimmed = df(mk(1, 0 until 20) ++ mk(2, 0 until 60))
    val kept = Forecast.refreshModelRegistryTicks(registry, trimmed,
      minNewObs = -1000L)
    assert(rows(kept) == rows(registry),
      "failed refits must carry the previous rows verbatim")
  }

  test("predictions served from a loaded registry equal the inline fit path") {
    val path = java.nio.file.Files.createTempDirectory("arima_reg2").toString
    Forecast.saveModelRegistry(Forecast.modelRegistry(spark, sfDir), path)
    val fromDisk = Forecast.predictionsFrom(spark, sfDir,
        Forecast.loadModelRegistry(spark, path))
      .collect().map(_.toString).toSeq
    val inline = Forecast.predictions(spark, sfDir)
      .collect().map(_.toString).toSeq
    assert(fromDisk.nonEmpty && fromDisk.sorted == inline.sorted)
  }

  test("linreg registry: saved+loaded serve is bit-identical to the latest autoreg row") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions.row_number
    val reg = Forecast.linregRegistry(spark, sfDir)
    val path = java.nio.file.Files.createTempDirectory("linreg_reg").toString
    Forecast.saveLinregRegistry(reg, path)
    val served = Forecast.linregServeSurface(
        Forecast.loadLinregRegistry(spark, path))
      .orderBy("user_id").collect()
      .map(r => r.getLong(0) -> r.getDouble(1))
    // independent dual: the temporally-last prediction row per symbol
    // from the full autoreg surface — the exact leg predictions used
    // to compute inline
    val w = Window.partitionBy("user_id").orderBy(col("ts").desc, col("event_id").desc)
    val latest = Forecast.linregAutoreg(spark, sfDir)
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .orderBy("user_id").collect()
      .map(r => r.getAs[Long]("user_id") -> r.getAs[Double]("predicted_price"))
    // BIT-identical doubles (the serve projection folds lag products
    // in predictRow's left-to-right association), not approximate
    assert(served.nonEmpty && served.sameElements(latest))
    // one model per symbol that clears the trainable bar; corrupted
    // registries fail loudly at load
    assert(reg.count() == latest.length)
    val bad = java.nio.file.Files.createTempDirectory("linreg_reg_bad").toString
    Tables.events(spark, sfDir).limit(5).write.mode("overwrite").parquet(bad)
    intercept[IllegalArgumentException] {
      Forecast.loadLinregRegistry(spark, bad)
    }: Unit
  }

  test("linreg registry refresh refits only stale symbols, keeps the rest verbatim") {
    import spark.implicits._
    def mk(user: Long, hours: Range): Seq[(Long, java.sql.Timestamp, Long, String, Double)] =
      hours.map(h => (user * 100000L + h,
        new java.sql.Timestamp(1700000000000L + 3600000L * h), user, "tick",
        100.0 + user + 5.0 * math.sin(h * 0.7) + 0.01 * h))
    def df(rows: Seq[(Long, java.sql.Timestamp, Long, String, Double)]) =
      rows.toDF("event_id", "ts", "user_id", "event_type", "value")
    def rows(d: org.apache.spark.sql.DataFrame) =
      d.collect().sortBy(_.getLong(0)).map(_.toString).toSeq
    val base = df(mk(1, 0 until 60) ++ mk(2, 0 until 60))
    val registry = Forecast.linregRegistryTicks(base)
    assert(registry.count() == 2)
    // nothing new → identity; growth → refit only the grown + new
    assert(rows(Forecast.refreshLinregRegistryTicks(registry, base))
      == rows(registry))
    val grown = df(mk(1, 0 until 60) ++ mk(2, 0 until 72) ++ mk(3, 0 until 60))
    val refreshed = Forecast.refreshLinregRegistryTicks(registry, grown)
    val byUser = refreshed.collect().map(r => r.getLong(0) -> r.toString).toMap
    val freshBy = Forecast.linregRegistryTicks(grown)
      .collect().map(r => r.getLong(0) -> r.toString).toMap
    assert(byUser.keySet == Set(1L, 2L, 3L))
    assert(byUser(1L) == rows(registry.filter(col("user_id") === 1L)).head,
      "unchanged symbol must carry its old registry row bit-identically")
    assert(byUser(2L) == freshBy(2L) && byUser(3L) == freshBy(3L),
      "stale symbols must equal a from-scratch fit on the full history")
  }

  test("halfUpDiv equals BigDecimal HALF_UP over a randomized sweep") {
    val rnd = new scala.util.Random(13)
    val cases = Seq((0L, 1L), (1L, 2L), (-1L, 2L), (3L, 2L), (-3L, 2L),
      (5L, 10L), (-5L, 10L), (Long.MaxValue / 3, 7L)) ++
      Seq.fill(5000)((rnd.nextLong() % 1000000000000L,
        math.abs(rnd.nextLong() % 99999L) + 1L))
    cases.foreach { case (a, b) =>
      val want = BigDecimal(a)./(BigDecimal(b))
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLongExact
      assert(Forecast.halfUpDiv(a, b) == want, s"halfUpDiv($a, $b)")
    }
  }

  test("arimaCheck: white-noise cells match a driver recompute; winner at the optimum") {
    val series = graft.operators.Warehouse.validTicks(spark, sfDir)
      .select("user_id", "ts", "event_id", "value").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).getTime, r.getLong(2), r.getDouble(3)))
      .groupBy(_._1)
      .map { case (u, g) => u -> g.sortBy(t => (t._2, t._3)).map(_._4) }
    val eligible = series.filter(_._2.length >= 50)
    val rows = Forecast.arimaCheck(spark, sfDir).collect()
    assert(rows.nonEmpty && rows.length == eligible.size,
      s"one row per eligible symbol: got ${rows.length}, want ${eligible.size}")
    rows.foreach { r =>
      val prices = eligible(r.getLong(0))
      assert(r.getLong(1) == prices.length)
      assert(r.getBoolean(r.fieldIndex("normal_eq_ok")),
        s"symbol ${r.getLong(0)} winner not at the normal-equation optimum")
      assert(r.getBoolean(r.fieldIndex("wn_band_ok")),
        s"symbol ${r.getLong(0)} pipeline diverged from the closed form")
      // exact closed forms recomputed independently in plain doubles:
      // the emitted scaled-integer values must sit within the 6-dp
      // rounding unit of them
      val m0 = prices.sum / prices.length
      assert(math.abs(r.getDouble(r.fieldIndex("wn_f_d0")) - m0) < 1e-5)
      val diffs = prices.sliding(2).map(p => p(1) - p(0)).toArray
      val drift = diffs.sum / diffs.length
      val f1 = prices.last + drift
      assert(math.abs(r.getDouble(r.fieldIndex("wn_f_d1")) - f1) < 1e-5)
      val d2 = diffs.sliding(2).map(p => p(1) - p(0)).toArray
      val m2 = d2.sum / d2.length
      val f2 = m2 + 2 * prices.last - prices(prices.length - 2)
      assert(math.abs(r.getDouble(r.fieldIndex("wn_f_d2")) - f2) < 1e-5)
    }
  }
}
