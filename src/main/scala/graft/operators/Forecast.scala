package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import scala.collection.mutable.ArrayBuffer

/** ML / forecasting operators mirroring the reference's ml/ package,
  * re-expressed as distributed per-key fits.
  *
  * - [[linregTrend]]: per-symbol OLS price-vs-time trend via the
  *   codegen'd regr_slope/regr_intercept aggregates (SQL-oracled).
  * - [[linregAutoreg]]: the window-5 autoregressive next-price model
  *   of ml/train_linear_regression.py:36-57 +
  *   ml/batch_predict_linear_regression.py:33-40 — features are the 5
  *   preceding prices, label is prices[i+1], OLS with intercept solved
  *   in closed form (normal equations), fit per symbol.
  * - [[arimaForecast]]: ARIMA-style per-symbol forecast following
  *   ml/arima_forecasting.py:97-230 — differencing order d chosen by
  *   a stationarity heuristic, (p, q) selected by AIC grid search,
  *   AR fit by conditional OLS and MA terms via Hannan-Rissanen
  *   two-stage OLS (statsmodels' exact MLE optimizer is intentionally
  *   NOT reproduced — the order-selection/forecast surface is).
  *
  * Scale design: both custom fits run as ONE hash-partition by key +
  * per-partition streaming pass (the [[Recurrence]] pattern) — per-key
  * state is the price buffer only, and no driver-side loops exist.
  * min_observations = 50 matches arima_forecasting.py:45.
  */
object Forecast {

  /** Per-key OLS trend: slope/intercept of price vs days-since-first-
    * tick. The time axis is rescaled per key so slopes are O(1) and
    * survive rounding.
    */
  def linregTrend(spark: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy("user_id")
    Warehouse.validTicks(spark, dir)
      .withColumn("t_days",
        (col("ts").cast("double") - min(col("ts").cast("double")).over(byUser)) / 86400.0)
      .groupBy("user_id")
      .agg(
        count(lit(1)).as("n"),
        round(regr_slope(col("value"), col("t_days")), 6).as("slope_per_day"),
        round(regr_intercept(col("value"), col("t_days")), 6).as("intercept"),
        round(regr_r2(col("value"), col("t_days")), 6).as("r2"))
      .orderBy("user_id")
  }

  def linregTrendSql: String =
    """SELECT user_id, count(*) AS n,
      |  round(regr_slope(value, t_days), 6) AS slope_per_day,
      |  round(regr_intercept(value, t_days), 6) AS intercept,
      |  round(regr_r2(value, t_days), 6) AS r2
      |FROM (
      |  SELECT user_id, value,
      |    (epoch(ts) - min(epoch(ts)) OVER (PARTITION BY user_id)) / 86400.0 AS t_days
      |  FROM events
      |  WHERE value IS NOT NULL AND value > 0 AND NOT isnan(value)
      |    AND user_id IS NOT NULL)
      |GROUP BY user_id ORDER BY user_id""".stripMargin

  // ------------------------------------------------------------ helpers

  /** Solve A·x = b (small dense system) by Gaussian elimination with
    * partial pivoting. Returns null-safe empty array on singularity.
    */
  private[graft] def solve(a: Array[Array[Double]], b: Array[Double]): Option[Array[Double]] = {
    val n = b.length
    val m = Array.tabulate(n)(i => a(i) :+ b(i))
    for (c <- 0 until n) {
      var piv = c
      for (r <- c + 1 until n) if (math.abs(m(r)(c)) > math.abs(m(piv)(c))) piv = r
      if (math.abs(m(piv)(c)) < 1e-12) return None
      val tmp = m(c); m(c) = m(piv); m(piv) = tmp
      for (r <- 0 until n if r != c) {
        val f = m(r)(c) / m(c)(c)
        for (k <- c to n) m(r)(k) -= f * m(c)(k)
      }
    }
    Some(Array.tabulate(n)(i => m(i)(n) / m(i)(i)))
  }

  /** OLS fit with intercept: X rows are feature vectors; returns
    * weights (bias first) or None if X'X is singular.
    */
  private[graft] def olsFit(xs: Array[Array[Double]], ys: Array[Double]): Option[Array[Double]] = {
    val k = xs.head.length + 1
    val xtx = Array.ofDim[Double](k, k)
    val xty = Array.ofDim[Double](k)
    var i = 0
    while (i < xs.length) {
      val row = new Array[Double](k)
      row(0) = 1.0
      System.arraycopy(xs(i), 0, row, 1, k - 1)
      var a = 0
      while (a < k) {
        xty(a) += row(a) * ys(i)
        var b = 0
        while (b < k) { xtx(a)(b) += row(a) * row(b); b += 1 }
        a += 1
      }
      i += 1
    }
    solve(xtx, xty)
  }

  private def predictRow(w: Array[Double], x: Array[Double]): Double = {
    var s = w(0); var i = 0
    while (i < x.length) { s += w(i + 1) * x(i); i += 1 }
    s
  }

  /** Streams (key, sorted price run) groups through `fn` with one pass
    * per partition — the distributed per-key fit harness.
    */
  private def perKey(spark: SparkSession, dir: String, schema: StructType)(
      fn: (Long, ArrayBuffer[(Long, java.sql.Timestamp, Double)]) => Iterator[Row]): DataFrame = {
    val in = Warehouse.validTicks(spark, dir)
      .select("user_id", "event_id", "ts", "value")
      .repartition(col("user_id"))
      .sortWithinPartitions("user_id", "ts", "event_id")
    val rdd = in.rdd.mapPartitions { it =>
      new Iterator[Row] {
        private var out: Iterator[Row] = Iterator.empty
        private var curKey = 0L
        private var started = false
        private val buf = ArrayBuffer.empty[(Long, java.sql.Timestamp, Double)]
        private def flush(): Iterator[Row] = {
          // snapshot: fn's result may be lazy over the buffer, which is
          // about to be refilled with the next key's rows
          val r = if (started && buf.nonEmpty) fn(curKey, buf.clone()) else Iterator.empty
          buf.clear(); r
        }
        private def advance(): Unit = {
          while (!out.hasNext && it.hasNext) {
            val r = it.next()
            val u = r.getLong(0)
            if (!started) { curKey = u; started = true }
            if (u != curKey) { out = flush(); curKey = u }
            buf += ((r.getLong(1), r.getTimestamp(2), r.getDouble(3)))
          }
          if (!out.hasNext && !it.hasNext) out = flush()
        }
        def hasNext: Boolean = { advance(); out.hasNext }
        def next(): Row = { advance(); out.next() }
      }
    }
    spark.createDataFrame(rdd, schema)
  }

  private val WindowSize = 5 // ML_WINDOW_SIZE default, shared/config.py:146

  private val autoregSchema = StructType(Seq(
    StructField("user_id", LongType), StructField("event_id", LongType),
    StructField("ts", TimestampType), StructField("predicted_price", DoubleType),
    StructField("n_train", LongType), StructField("train_mse", DoubleType)))

  /** Per-key autoregressive OLS: X_i = prices[i-5..i-1], y_i =
    * prices[i+1] (the reference's off-by-one label is reproduced
    * verbatim, train_linear_regression.py:39-41); fit on all samples,
    * then emit a prediction per window like batch_predict.
    */
  def linregAutoreg(spark: SparkSession, dir: String): DataFrame =
    linregAutoregBase(spark, dir).orderBy("user_id", "event_id")

  /** Unordered internal variant (no driver-output ORDER BY). */
  private[operators] def linregAutoregBase(spark: SparkSession, dir: String): DataFrame =
    perKey(spark, dir, autoregSchema) { (user, ticks) =>
      val prices = ticks.map(_._3).toArray
      if (prices.length < WindowSize + 2) Iterator.empty
      else {
        val xs = ArrayBuffer.empty[Array[Double]]
        val ys = ArrayBuffer.empty[Double]
        var i = WindowSize
        while (i < prices.length - 1) {
          xs += prices.slice(i - WindowSize, i)
          ys += prices(i + 1)
          i += 1
        }
        olsFit(xs.toArray, ys.toArray) match {
          case None => Iterator.empty
          case Some(w) =>
            val mse = xs.indices.map { j =>
              val d = predictRow(w, xs(j)) - ys(j); d * d
            }.sum / xs.length
            (WindowSize until prices.length).iterator.map { j =>
              val x = prices.slice(j - WindowSize, j)
              val (eid, ts, _) = ticks(j)
              Row(user, eid, ts, predictRow(w, x), xs.length.toLong, mse)
            }
        }
      }
    }

  /** The `predictions` table surface (enhanced_schema.sql:186-203,
    * dashboard fetch_predictions app.py:145-175): one next-price row
    * per (symbol, model). ARIMA confidence is the reference's AIC
    * transform max(0, min(1, 1/(1+|aic|/100)))
    * (analytics_consumer.py:374-377); the linear-regression row uses
    * the fixed 0.8 of batch_predict_linear_regression.py:76.
    */
  def predictions(spark: SparkSession, dir: String): DataFrame = {
    // consume the UNSORTED internal variants — the driver queries'
    // trailing ORDER BYs would each cost a global range sort that the
    // union + final sort here immediately discards
    val arima = arimaForecastBase(spark, dir)
      .select(
        col("user_id"),
        col("forecast_1").as("predicted_price"),
        greatest(lit(0.0), least(lit(1.0),
          lit(1.0) / (lit(1.0) + abs(col("aic")) / 100.0))).as("confidence_score"),
        lit("ARIMA").as("model_type"))
    val latestAutoreg = {
      // temporally last window: (ts, event_id) desc, matching the
      // repo-wide latest-row convention (event_id alone is not
      // guaranteed monotone with time)
      val w = Window.partitionBy("user_id").orderBy(col("ts").desc, col("event_id").desc)
      linregAutoregBase(spark, dir)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("user_id"), col("predicted_price"),
          lit(0.8).as("confidence_score"),
          lit("LinearRegression").as("model_type"))
    }
    arima.unionByName(latestAutoreg).orderBy("user_id", "model_type")
  }

  private val arimaSchema = StructType(Seq(
    StructField("user_id", LongType), StructField("n_obs", LongType),
    StructField("p", IntegerType), StructField("d", IntegerType),
    StructField("q", IntegerType), StructField("aic", DoubleType),
    StructField("last_price", DoubleType), StructField("forecast_1", DoubleType)))

  private val MinObservations = 50 // arima_forecasting.py:45

  private def diff(xs: Array[Double]): Array[Double] =
    Array.tabulate(xs.length - 1)(i => xs(i + 1) - xs(i))

  private def variance(xs: Array[Double]): Double = {
    val m = xs.sum / xs.length
    xs.map(x => (x - m) * (x - m)).sum / xs.length
  }

  /** OLS via normal equations with explicit (X'X)⁻¹ (Gauss-Jordan) —
    * needed for coefficient standard errors in the ADF test. Returns
    * (betas, inverse, rss). Sizes are tiny (m ≤ 6).
    */
  private def olsWithInverse(xs: Array[Array[Double]], ys: Array[Double])
      : Option[(Array[Double], Array[Array[Double]], Double)] = {
    val n = xs.length
    val m = xs(0).length
    val a = Array.ofDim[Double](m, 2 * m)
    for (i <- 0 until m; j <- 0 until m)
      a(i)(j) = (0 until n).map(r => xs(r)(i) * xs(r)(j)).sum
    for (i <- 0 until m) a(i)(m + i) = 1.0
    for (col <- 0 until m) {
      var piv = col
      for (r <- col + 1 until m) if (math.abs(a(r)(col)) > math.abs(a(piv)(col))) piv = r
      if (math.abs(a(piv)(col)) < 1e-12) return None
      val t = a(col); a(col) = a(piv); a(piv) = t
      val d = a(col)(col)
      for (j <- 0 until 2 * m) a(col)(j) /= d
      for (r <- 0 until m if r != col) {
        val f = a(r)(col)
        if (f != 0.0) for (j <- 0 until 2 * m) a(r)(j) -= f * a(col)(j)
      }
    }
    val inv = Array.tabulate(m, m)((i, j) => a(i)(m + j))
    val xty = Array.tabulate(m)(i => (0 until n).map(r => xs(r)(i) * ys(r)).sum)
    val beta = Array.tabulate(m)(i => (0 until m).map(j => inv(i)(j) * xty(j)).sum)
    val rss = (0 until n).map { r =>
      val e = ys(r) - (0 until m).map(j => beta(j) * xs(r)(j)).sum; e * e
    }.sum
    Some((beta, inv, rss))
  }

  /** One ADF regression Δy_t = α + β·y_{t−1} + Σγ_j·Δy_{t−j} + ε,
    * evaluated on observations t ∈ [startLag, dy.length) so candidate
    * lags can share a COMMON sample (AIC values are only comparable
    * at equal n — statsmodels' autolag trims the same way). Returns
    * (aic, t-statistic of β̂).
    */
  private def adfRegression(y: Array[Double], k: Int, startLag: Int)
      : Option[(Double, Double)] = {
    val dy = diff(y)
    val n = dy.length - startLag
    val m = k + 2
    if (n < m + 8) return None
    val xs = Array.tabulate(n) { i =>
      val t = i + startLag
      Array(1.0, y(t)) ++ Array.tabulate(k)(j => dy(t - 1 - j))
    }
    val ys = Array.tabulate(n)(i => dy(i + startLag))
    olsWithInverse(xs, ys).flatMap { case (beta, inv, rss) =>
      val aic = n * math.log(math.max(rss / n, 1e-300)) + 2.0 * m
      val s2 = rss / (n - m)
      val seBeta = math.sqrt(math.max(s2 * inv(1)(1), 0.0))
      if (seBeta <= 0 || seBeta.isNaN) None else Some((aic, beta(1) / seBeta))
    }
  }

  /** Augmented Dickey-Fuller t-statistic with constant and `k` lagged
    * differences. More negative = more stationary.
    */
  private[graft] def adfStat(y: Array[Double], k: Int): Option[Double] =
    adfRegression(y, k, k).map(_._2)

  /** ADF stationarity verdict at the 5% level, lag chosen by AIC over
    * k ∈ [0, 4] on a common sample (the reference calls statsmodels
    * adfuller with autolag='AIC' and tests p-value < 0.05,
    * arima_forecasting.py:97-117; −2.86 is the 5% critical value of
    * the constant-only DF distribution for large n). A (near-)constant
    * series is trivially stationary — the regression would be singular
    * there, which must not read as a unit root.
    */
  private[graft] def isStationaryAdf(y: Array[Double]): Boolean = {
    if (variance(y) < 1e-12) return true
    val maxLag = 4
    val cands = (0 to maxLag).flatMap(k =>
      adfRegression(y, k, maxLag).map { case (aic, stat) => (aic, stat) })
    cands.nonEmpty && cands.minBy(_._1)._2 < -2.86
  }

  /** Fit ARMA(p, q) on a (differenced) series by conditional OLS /
    * Hannan-Rissanen; returns (aic, one-step forecast).
    */
  private def fitArma(z: Array[Double], p: Int, q: Int): Option[(Double, Double)] = {
    val mean = z.sum / z.length
    val zc = z.map(_ - mean)
    // Stage 1: long-AR residuals for MA terms
    val resid: Array[Double] =
      if (q == 0) null
      else {
        val pLong = math.min(math.max(p + q + 2, 4), zc.length / 3)
        if (zc.length <= pLong + 1) return None
        val xs = (pLong until zc.length).map(i =>
          Array.tabulate(pLong)(j => zc(i - 1 - j))).toArray
        val ys = (pLong until zc.length).map(zc).toArray
        olsFit(xs, ys) match {
          case None => return None
          case Some(w) =>
            val r = new Array[Double](zc.length)
            for (i <- pLong until zc.length)
              r(i) = zc(i) - predictRow(w, Array.tabulate(pLong)(j => zc(i - 1 - j)))
            r
        }
      }
    val start = math.max(p, q) + (if (q > 0) math.min(math.max(p + q + 2, 4), zc.length / 3) else 0)
    if (zc.length <= start + p + q + 2) return None
    val xs = (start until zc.length).map { i =>
      Array.tabulate(p)(j => zc(i - 1 - j)) ++
        (if (q == 0) Array.empty[Double] else Array.tabulate(q)(j => resid(i - 1 - j)))
    }.toArray
    val ys = (start until zc.length).map(zc).toArray
    if (p + q == 0) {
      val rss = ys.map(y => y * y).sum
      val n = ys.length
      val aic = n * math.log(math.max(rss / n, 1e-300)) + 2.0
      return Some((aic, mean))
    }
    olsFit(xs, ys).map { w =>
      val rss = xs.indices.map { j =>
        val d = predictRow(w, xs(j)) - ys(j); d * d
      }.sum
      val n = xs.length
      val k = p + q + 1
      val aic = n * math.log(math.max(rss / n, 1e-300)) + 2.0 * k
      // one-step forecast from the tail of the series
      val lastResid = if (q == 0) Array.empty[Double]
        else Array.tabulate(q)(j => resid(zc.length - 1 - j))
      val x1 = Array.tabulate(p)(j => zc(zc.length - 1 - j)) ++ lastResid
      (aic, predictRow(w, x1) + mean)
    }
  }

  /** Per-key ARIMA-style forecast: d by ADF stationarity test
    * (difference until stationary at 5%, max d=2 as
    * arima_forecasting.py:97-130), AIC grid over p≤3, q≤1,
    * one-step forecast integrated back to price level.
    */
  def arimaForecast(spark: SparkSession, dir: String): DataFrame =
    arimaForecastBase(spark, dir).orderBy("user_id")

  /** Unordered internal variant (no driver-output ORDER BY). */
  private[operators] def arimaForecastBase(spark: SparkSession, dir: String): DataFrame =
    perKey(spark, dir, arimaSchema) { (user, ticks) =>
      val prices = ticks.map(_._3).toArray
      if (prices.length < MinObservations) Iterator.empty
      else {
        // choose d by ADF test exactly like the reference (difference
        // until stationary at the 5% level, max d=2,
        // arima_forecasting.py:97-130); fall back to the variance
        // heuristic when the series is too short for the regression
        var d = 0
        var series = prices
        def nonStationary(s: Array[Double]): Boolean =
          if (s.length >= 20) !isStationaryAdf(s)
          else {
            val ds = diff(s)
            ds.length > 10 && variance(ds) < variance(s) * 0.9
          }
        while (d < 2 && nonStationary(series)) { series = diff(series); d += 1 }

        val fits = for {
          p <- 0 to 3; q <- 0 to 1
          fit <- fitArma(series, p, q)
        } yield (p, q, fit._1, fit._2)
        if (fits.isEmpty) Iterator.empty
        else {
          val (p, q, aic, zHat) = fits.minBy(f => (f._3, f._1, f._2))
          // integrate the differenced forecast back to price level using
          // the last value of each differencing level
          val levels = ArrayBuffer(prices)
          while (levels.length <= d) levels += diff(levels.last)
          var acc = zHat
          for (lvl <- (0 until d).reverse) acc += levels(lvl).last
          Iterator.single(Row(user, prices.length.toLong, p, d, q,
            math.rint(aic * 1e4) / 1e4, prices.last, math.rint(acc * 1e4) / 1e4))
        }
      }
    }
}
