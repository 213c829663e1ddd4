package graft

import graft.operators.Indicators
import org.apache.spark.sql.functions._

/** Cross-checks the windowed indicator queries against a direct naive
  * implementation of the reference semantics
  * (analytics/technical_indicators.py) on random and adversarial
  * series — coverage the fixed test corpus can't give (constant
  * prices, monotone runs, single-tick keys).
  */
class IndicatorPropertySpec extends SparkSuite {
  import spark.implicits._

  private def naiveRsi(prices: Seq[Double], period: Int = 14): Option[Double] = {
    if (prices.length < period + 1) return None
    val deltas = prices.sliding(2).map(p => p(1) - p(0)).toSeq.takeRight(period)
    val g = deltas.map(d => math.max(d, 0.0)).sum / period
    val l = deltas.map(d => math.max(-d, 0.0)).sum / period
    Some(if (l == 0.0) 100.0 else 100.0 - 100.0 / (1.0 + g / l))
  }

  private def naiveSma(prices: Seq[Double], period: Int): Option[Double] =
    if (prices.length < period) None else Some(prices.takeRight(period).sum / period)

  private def naiveVol(prices: Seq[Double], period: Int = 20): Option[Double] = {
    if (prices.length < period + 1) return None
    val rets = prices.sliding(2).map(p => (p(1) - p(0)) / p(0)).toSeq
    val m = rets.sum / rets.length
    Some(math.sqrt(rets.map(r => (r - m) * (r - m)).sum / rets.length) * math.sqrt(252.0))
  }

  private def series(seed: Long, n: Int): Seq[Double] = {
    val rnd = new scala.util.Random(seed)
    var p = 100.0
    (0 until n).map { _ => p = math.max(0.01, p * (1.0 + (rnd.nextDouble() - 0.5) * 0.04)); p }
  }

  private def runCase(prices: Map[Long, Seq[Double]]): Unit = {
    val tmp = java.nio.file.Files.createTempDirectory("prop_events").toString
    val rows = prices.toSeq.flatMap { case (user, ps) =>
      ps.zipWithIndex.map { case (p, i) =>
        (user * 100000L + i, new java.sql.Timestamp(1700000000000L + i * 60000L),
          user, "tick", p, "{}")
      }
    }
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(s"$tmp/events.parquet")

    val got = Indicators.analyticsFull(spark, tmp)
      .select("user_id", "event_id", "rsi_14", "sma_20", "volatility")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r).toMap

    prices.foreach { case (user, ps) =>
      ps.indices.foreach { i =>
        val row = got((user, user * 100000L + i))
        val hist = ps.take(i + 1)
        def check(colName: String, expected: Option[Double], scale: Int): Unit = {
          val idx = row.fieldIndex(colName)
          expected match {
            case None => assert(row.isNullAt(idx), s"$colName@$user/$i should be null")
            case Some(e) =>
              val g = row.getDouble(idx)
              assert(math.abs(g - math.rint(e * math.pow(10, scale)) / math.pow(10, scale)) < 2e-4,
                s"$colName@$user/$i: got $g expected ~$e")
          }
        }
        check("rsi_14", naiveRsi(hist), 4)
        check("sma_20", naiveSma(hist, 20), 4)
        check("volatility", naiveVol(hist), 4)
      }
    }
  }

  test("random walks match naive reference implementation") {
    runCase(Map(1L -> series(7L, 60), 2L -> series(11L, 25), 3L -> series(13L, 80)))
  }

  test("edge cases: constant series, monotone run, single tick") {
    runCase(Map(
      1L -> Seq.fill(40)(50.0), // constant: RSI=100 (no losses), vol=0
      2L -> (1 to 40).map(_.toDouble), // strictly rising: RSI=100
      3L -> Seq(42.0), // single tick: everything null
      4L -> (40 to 1 by -1).map(_.toDouble))) // strictly falling: RSI=0
  }
}
