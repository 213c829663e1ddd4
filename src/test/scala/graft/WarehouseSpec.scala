package graft

import graft.operators.Warehouse

class WarehouseSpec extends SparkSuite {

  test("validateTicks keeps only positive finite prices") {
    val df = Warehouse.validateTicks(spark, sfDir)
    val n = df.count()
    assert(n > 0 && n <= Tables.events(spark, sfDir).count())
    assert(df.filter("value <= 0 OR value IS NULL").count() == 0)
  }

  test("tradingHours keeps exactly the weekday 9-16h validated ticks") {
    import org.apache.spark.sql.functions._
    val valid = Warehouse.validateTicks(spark, sfDir)
    val gated = Warehouse.tradingHours(spark, sfDir)
    val n = gated.count()
    // strict subset of the validated stream (the synthetic feed spans
    // all hours, so the gate must actually drop something)
    assert(n > 0 && n < valid.count())
    assert(gated.filter(!dayofweek(col("ts")).between(2, 6) ||
      !hour(col("ts")).between(9, 16)).count() == 0)
    // complement check: everything dropped is off-session, not lost
    val offSession = valid.filter(!(dayofweek(col("ts")).between(2, 6) &&
      hour(col("ts")).between(9, 16))).count()
    assert(n + offSession == valid.count())
  }

  test("dedupTicks yields unique (user_id, ts)") {
    val df = Warehouse.dedupTicks(spark, sfDir)
    assert(df.groupBy("user_id", "ts").count().filter("count > 1").count() == 0)
  }

  test("latestPerKey has one row per user") {
    val df = Warehouse.latestPerKey(spark, sfDir)
    assert(df.count() == Tables.events(spark, sfDir).select("user_id").distinct().count())
  }

  test("latestPerDay keeps one row per (user, day)") {
    val df = Warehouse.latestPerDay(spark, sfDir)
    assert(df.groupBy("user_id", "trade_date").count().filter("count > 1").count() == 0)
  }

  test("dailyOhlc bounds hold: low <= open/close <= high") {
    val bad = Warehouse.dailyOhlc(spark, sfDir)
      .filter("open_price > high_price OR close_price > high_price OR " +
        "open_price < low_price OR close_price < low_price")
    assert(bad.count() == 0)
  }

  test("candles tick counts reconcile with total") {
    val total = Warehouse.candles(spark, sfDir)
      .agg(org.apache.spark.sql.functions.sum("n_ticks")).head.getLong(0)
    assert(total == Tables.events(spark, sfDir).count())
  }

  test("monthly candles reconcile with the daily rollup") {
    import org.apache.spark.sql.functions._
    val monthly = Warehouse.monthlyCandles(spark, sfDir)
    // tick conservation (unvalidated kernel, like hourly candles)
    assert(monthly.agg(sum("n_ticks")).head.getLong(0) ==
      Tables.events(spark, sfDir).count())
    // extremes bracket the dashboard daily rollup's extremes
    val daily = Warehouse.dailyOhlc(spark, sfDir)
      .withColumn("month", trunc(col("trade_date"), "month"))
      .groupBy("user_id", "month")
      .agg(max("high_price").as("dh"), min("low_price").as("dl"))
    val joined = monthly.join(daily, Seq("user_id", "month")).collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      assert(r.getAs[Double]("high_price") >= r.getAs[Double]("dh") - 1e-9)
      assert(r.getAs[Double]("low_price") <= r.getAs[Double]("dl") + 1e-9)
    }
  }

  test("activityHeatmap covers the grid with exact micro-average prices") {
    val rows = Warehouse.activityHeatmap(spark, sfDir).collect()
    assert(rows.nonEmpty && rows.length <= 7 * 24)
    assert(rows.map(_.getAs[Long]("n_ticks")).sum ==
      Warehouse.validateTicks(spark, sfDir).count())
    rows.foreach { r =>
      val wd = r.getAs[Int]("weekday"); val h = r.getAs[Int]("hour")
      assert(wd >= 1 && wd <= 7 && h >= 0 && h <= 23)
      assert(r.getAs[Double]("avg_price") > 0)
    }
  }

  test("timeWindowScan enriches with dim and respects limit") {
    val rows = Warehouse.timeWindowScan(spark, sfDir).collect()
    assert(rows.nonEmpty && rows.length <= 1000)
    assert(rows.forall(_.getAs[String]("c_name") != null))
  }

  test("industryStats covers every industry and counts are consistent") {
    val df = Warehouse.industryStats(spark, sfDir).collect()
    assert(df.length == Tables.nation(spark, sfDir).count())
    assert(df.map(_.getAs[Long]("company_count")).sum ==
      Tables.customer(spark, sfDir).count())
    df.foreach(r => assert(r.getAs[Long]("sector_count") <=
      r.getAs[Long]("company_count").max(1L)))
  }

  test("priceHistory keeps at most 7 latest days per company") {
    val df = Warehouse.priceHistory(spark, sfDir)
    val perKey = df.groupBy("user_id").count().filter("count > 7")
    assert(perKey.count() == 0)
    // the kept days are each key's LATEST days
    val maxKept = df.groupBy("user_id")
      .agg(org.apache.spark.sql.functions.max("trade_date").as("kept"))
    val maxAll = Warehouse.dailyOhlc(spark, sfDir).groupBy("user_id")
      .agg(org.apache.spark.sql.functions.max("trade_date").as("all"))
    val joined = maxKept.join(maxAll, "user_id").filter("kept <> all")
    assert(joined.count() == 0, "latest day missing from history window")
  }

  test("sessionize: sessions within a user do not overlap") {
    val df = Warehouse.sessionize(spark, sfDir).collect()
    val byUser = df.groupBy(_.getAs[Long]("user_id"))
    byUser.values.foreach { rows =>
      val sorted = rows.sortBy(_.getAs[Long]("session_id"))
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(!a.getAs[java.sql.Timestamp]("session_end")
            .after(b.getAs[java.sql.Timestamp]("session_start")))
        case _ =>
      }
    }
  }

  test("orphanTicks is empty when all keys resolve in the dim") {
    assert(Warehouse.orphanTicks(spark, sfDir).count() == 0)
  }

  test("rollup grand total equals event count") {
    val grand = Warehouse.rollupAgg(spark, sfDir)
      .filter("event_type IS NULL AND day IS NULL").collect()
    assert(grand.length == 1)
    assert(grand.head.getAs[Long]("n") == Tables.events(spark, sfDir).count())
  }

  test("pivot yields one row per user with the five type columns") {
    val df = Warehouse.pivotTypes(spark, sfDir)
    assert(df.columns.toSeq == Seq("user_id", "click", "error", "purchase", "signup", "view"))
    assert(df.count() == Tables.events(spark, sfDir).select("user_id").distinct().count())
  }

  test("topMovers keeps at most 3 ranked movers per day") {
    val rows = Warehouse.topMovers(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val byDay = rows.groupBy(_.getAs[java.sql.Date]("trade_date"))
    byDay.values.foreach { day =>
      assert(day.length <= 3)
      val changes = day.sortBy(_.getAs[Int]("mover_rank")).map(_.getAs[Double]("change_pct"))
      assert(changes.sameElements(changes.sortBy(-_)), "ranked by change desc")
    }
  }

  test("windowAgg counts reconcile") {
    val total = Warehouse.windowAgg(spark, sfDir)
      .agg(org.apache.spark.sql.functions.sum("n")).head.getLong(0)
    assert(total == Tables.events(spark, sfDir).count())
  }

  test("error ledger and valid ticks exactly partition a dirty input") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val dirty = Seq(
      (1L, "2024-01-01 10:00:00", Option(7L), "click", Option(101.5)),
      (2L, "2024-01-01 10:01:00", Option.empty[Long], "click", Option(5.0)),
      (3L, "2024-01-01 10:02:00", Option(7L), "click", Option.empty[Double]),
      (4L, "2024-01-01 10:03:00", Option(7L), "click", Option(Double.NaN)),
      (5L, "2024-01-01 10:04:00", Option(8L), "click", Option(0.0)),
      (6L, "2024-01-01 10:05:00", Option(8L), "click", Option(-3.2)),
      // missing company AND missing price: required-field check wins,
      // matching the reference validator's check order
      (7L, "2024-01-01 10:06:00", Option.empty[Long], "click", Option.empty[Double]))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
      .withColumn("ts", to_timestamp(col("ts")))
    val valid = Warehouse.validTicksOf(dirty)
    val ledger = graft.operators.ErrorLedger.ingestionErrorsOf(dirty)
    assert(valid.select("event_id").as[Long].collect().toSet == Set(1L))
    val classes = ledger.collect()
      .map(r => r.getAs[Long]("event_id") -> r.getAs[String]("error_type")).toMap
    assert(classes == Map(2L -> "missing_company", 3L -> "null_price",
      4L -> "nan_price", 5L -> "nonpositive_price",
      6L -> "nonpositive_price", 7L -> "missing_company"))
    // partition: every input row in exactly one leg
    assert(valid.count() + ledger.count() == dirty.count())
    assert(ledger.select("component_name").distinct().as[String]
      .collect().toSeq == Seq(graft.operators.ErrorLedger.Component))
  }

  test("sessionGaps reports exactly the tickless weekdays inside each span") {
    import org.apache.spark.sql.functions._
    val gaps = Warehouse.sessionGaps(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("user_id"),
        r.getAs[java.sql.Date]("gap_date").toLocalDate)).toSet
    val tickDays = Warehouse.validTicks(spark, sfDir)
      .select(col("user_id"), to_date(col("ts")).as("d")).distinct()
      .collect()
      .map(r => (r.getLong(0), r.getAs[java.sql.Date]("d").toLocalDate))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    // driver-side recount: for every symbol, walk its own span and
    // collect weekdays with no tick — must equal the query exactly
    val expect = tickDays.iterator.flatMap { case (uid, days) =>
      Iterator.iterate(days.min)(_.plusDays(1))
        .takeWhile(!_.isAfter(days.max))
        .filter(d => d.getDayOfWeek.getValue <= 5 && !days.contains(d))
        .map(uid -> _)
    }.toSet
    assert(gaps == expect,
      s"${gaps.size} reported vs ${expect.size} recounted")
  }

  test("priceFfill: contiguous calendar grid, carried closes, exact flags") {
    import org.apache.spark.sql.functions._
    val rows = Warehouse.priceFfill(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[Long]("user_id")).values.foreach { rs =>
      val sorted = rs.sortBy(_.getAs[java.sql.Date]("trade_date").getTime)
      // every calendar day between first and last session, no holes
      sorted.map(_.getAs[java.sql.Date]("trade_date").toLocalDate)
        .sliding(2).foreach {
          case Array(a, b) => assert(b == a.plusDays(1), s"gap after $a")
          case _ =>
        }
      // the first grid day is a real session; gap days carry the last
      // observed close verbatim
      assert(sorted.head.getAs[Boolean]("is_observed"))
      var lastObs = Double.NaN
      sorted.foreach { r =>
        val c = r.getAs[Double]("close_price")
        if (r.getAs[Boolean]("is_observed")) lastObs = c
        else assert(c == lastObs, "gap day does not carry the last close")
      }
    }
    // observed rows are exactly the validated (symbol, day) sessions
    val sessions = Warehouse.validTicks(spark, sfDir)
      .select(col("user_id"), to_date(col("ts"))).distinct().count()
    assert(rows.count(_.getAs[Boolean]("is_observed")).toLong == sessions)
  }

  test("ledger replay re-validates corrections; bad fixes requeue") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val dirty = Seq(
      (1L, "2024-01-01 10:00:00", Option(7L), "click", Option(101.5)),
      (2L, "2024-01-01 10:01:00", Option.empty[Long], "click", Option(5.0)),
      (3L, "2024-01-01 10:02:00", Option(7L), "click", Option.empty[Double]),
      (4L, "2024-01-01 10:03:00", Option(7L), "click", Option(Double.NaN)),
      (5L, "2024-01-01 10:04:00", Option(8L), "click", Option(0.0)),
      (6L, "2024-01-01 10:05:00", Option(8L), "click", Option(-3.2)))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
      .withColumn("ts", to_timestamp(col("ts")))
    val fixes = Seq(
      (2L, Option(9L), Option.empty[Double]),   // key fix, price was fine
      (3L, Option.empty[Long], Option(77.0)),   // price fix
      (4L, Option.empty[Long], Option(-1.0)),   // BAD fix: still nonpositive
      (5L, Option.empty[Long], Option(55.5)))   // price fix; 6 has no fix
      .toDF("event_id", "user_id", "value")
    val r = graft.operators.ErrorLedger.replayResolved(dirty, fixes)
    // good fixes re-enter ingest with the corrected payload...
    val acc = r.accepted.collect()
      .map(x => x.getAs[Long]("event_id") ->
        (x.getAs[Long]("user_id"), x.getAs[Double]("value"))).toMap
    assert(acc == Map(2L -> (9L, 5.0), 3L -> (7L, 77.0), 5L -> (8L, 55.5)))
    assert(graft.operators.Warehouse.validTicksOf(r.accepted).count() == 3)
    // ...the bad fix cycles back reclassified under its NEW failure
    val requeued = r.requeued.collect()
      .map(x => x.getAs[Long]("event_id") -> x.getAs[String]("error_type"))
    assert(requeued.toSeq == Seq(4L -> "nonpositive_price"))
    // unfixed rejects (6) are untouched: not accepted, not requeued —
    // they simply stay on the standing ledger
    assert(!acc.contains(6L) && !requeued.exists(_._1 == 6L))
    // idempotent: replaying the union of first-pass valids and the
    // accepted rows produces nothing (they are no longer rejects)
    val again = graft.operators.ErrorLedger.replayResolved(
      graft.operators.Warehouse.validTicksOf(dirty)
        .select(dirty.columns.map(col): _*)
        .unionByName(r.accepted), fixes)
    assert(again.accepted.count() == 0 && again.requeued.count() == 0)
    // resolved flag derives from replay outcome, not fix presence:
    // 4 has a fix but stays unresolved
    val resolved = graft.operators.ErrorLedger.resolvedLedger(dirty, fixes)
      .collect().map(x => x.getAs[Long]("event_id")
        -> x.getAs[Boolean]("resolved")).toMap
    assert(resolved == Map(2L -> true, 3L -> true, 4L -> false,
      5L -> true, 6L -> false))
  }

  test("pair_corr matches the builtin corr aggregate on the common overlap") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // two sparse series sharing 17 of their sessions, with private
    // sessions interleaved on BOTH sides (the merge must skip them)
    val aPts = (0 until 40).map(i => (i, math.sin(i) + 0.1 * i))
    val bPts = (0 until 25).map(i => (i * 2, math.cos(i) - 0.05 * i))
    val common = aPts.map(_._1).toSet intersect bPts.map(_._1).toSet
    assert(common.size >= 15, s"fixture needs >=15 overlap, got ${common.size}")
    val expected = common.toSeq.sorted
      .map(d => (aPts.toMap.apply(d), bPts.toMap.apply(d)))
      .toDF("x", "y").agg(corr(col("x"), col("y"))).head.getDouble(0)
    val got = Seq((aPts.map(_._1).toArray, aPts.map(_._2).toArray,
        bPts.map(_._1).toArray, bPts.map(_._2).toArray))
      .toDF("ai", "av", "bi", "bv")
      .select(graft.functions.PairCorr.pair_corr(
        col("ai"), col("av"), col("bi"), col("bv"), 15).as("pc"))
      .select(col("pc")(0).as("n"), col("pc")(1).as("r")).head
    assert(got.getDouble(0) == common.size.toDouble)
    assert(math.abs(got.getDouble(1) - expected) < 1e-12,
      s"corr ${got.getDouble(1)} vs builtin $expected")
  }

  test("pair_corr returns NULL on short overlap and zero variance") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    def pc(ai: Seq[Int], av: Seq[Double], bi: Seq[Int], bv: Seq[Double],
        minDays: Int) =
      Seq((ai.toArray, av.toArray, bi.toArray, bv.toArray))
        .toDF("ai", "av", "bi", "bv")
        .select(graft.functions.PairCorr.pair_corr(
          col("ai"), col("av"), col("bi"), col("bv"), minDays).as("pc"))
        .head
    // 3 common sessions < minDays=4 → NULL
    assert(pc(Seq(1, 2, 3), Seq(1.0, 2.0, 3.0),
      Seq(1, 2, 3), Seq(3.0, 1.0, 2.0), 4).isNullAt(0))
    // constant side over the overlap (variance 0, corr undefined) → NULL
    assert(pc(Seq(1, 2, 3), Seq(5.0, 5.0, 5.0),
      Seq(1, 2, 3), Seq(3.0, 1.0, 2.0), 3).isNullAt(0))
    // same inputs above the thresholds → defined
    assert(!pc(Seq(1, 2, 3), Seq(1.0, 2.0, 3.0),
      Seq(1, 2, 3), Seq(3.0, 1.0, 2.0), 3).isNullAt(0))
  }

  test("returnCorrOf matches a naive all-pairs sweep on random sparse universes") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // independent end-to-end cross-check (the DuckDB oracle is the
    // other one): random symbols with gappy calendars, all pairs
    // computed driver-side with the same moment formulas, same
    // 6-dp rounding, same (|r| desc, a, b) cut
    val rnd = new scala.util.Random(8L)
    val minDays = 5
    val universe: Map[Long, Seq[(Int, Double)]] = (1L to 30L).map { id =>
      val days = (0 until 40).filter(_ => rnd.nextDouble() < 0.4 + rnd.nextDouble() * 0.5)
      id -> days.map(d => d -> (rnd.nextDouble() - 0.5) * 0.1)
    }.toMap
    val rets = universe.toSeq.flatMap { case (id, pts) =>
      pts.map { case (d, r) =>
        (id, java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(d.toLong)), r)
      }
    }.toDF("user_id", "trade_date", "ret")
    val got = graft.operators.Warehouse.returnCorrOf(rets, minDays)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val expected = (for {
      a <- universe.keys.toSeq.sorted; b <- universe.keys.toSeq.sorted
      if a < b
    } yield {
      val am = universe(a).toMap; val bm = universe(b).toMap
      val common = am.keySet.intersect(bm.keySet).toSeq.sorted
      var n = 0.0; var sx = 0.0; var sy = 0.0
      var sxx = 0.0; var syy = 0.0; var sxy = 0.0
      common.foreach { d =>
        val x = am(d); val y = bm(d)
        n += 1.0; sx += x; sy += y
        sxx += x * x; syy += y * y; sxy += x * y
      }
      if (n < minDays) None
      else {
        val cden = math.sqrt((sxx - sx * sx / n) * (syy - sy * sy / n))
        if (!(cden > 0)) None
        else Some((a, b, n.toLong,
          BigDecimal((sxy - sx * sy / n) / cden)
            .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble))
      }
    }).flatten
      .sortBy { case (a, b, _, r) => (-math.abs(r), a, b) }
      .take(50)
    assert(got.length == expected.length)
    assert(got.toSeq == expected,
      s"first mismatch: ${got.toSeq.zip(expected).find(p => p._1 != p._2)}")
  }

  test("pair_corr codegen and interpreted paths agree") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.{ArrayType, DoubleType, IntegerType}
    import spark.implicits._
    val ai = (0 until 30).map(_ * 2).toArray
    val av = (0 until 30).map(i => math.sin(i * 1.7)).toArray
    val bi = (0 until 40).toArray
    val bv = (0 until 40).map(i => math.cos(i * 0.9)).toArray
    // interpreted: direct expression eval on literals
    val expr = graft.functions.PairCorr(
      Literal.create(ai, ArrayType(IntegerType)),
      Literal.create(av, ArrayType(DoubleType)),
      Literal.create(bi, ArrayType(IntegerType)),
      Literal.create(bv, ArrayType(DoubleType)), 5)
    val interp = expr.eval(null).asInstanceOf[ArrayData].toDoubleArray()
    // codegen: the same call through a projection over a real plan
    val gen = Seq((ai, av, bi, bv)).toDF("ai", "av", "bi", "bv")
      .select(graft.functions.PairCorr.pair_corr(
        col("ai"), col("av"), col("bi"), col("bv"), 5).as("pc"))
      .head.getSeq[Double](0).toArray
    assert(interp.toSeq == gen.toSeq,
      s"interpreted ${interp.toSeq} != codegen ${gen.toSeq}")
  }

  test("anomalyTicks flags planted outliers and nothing on flat symbols") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val ts0 = java.sql.Timestamp.valueOf("2024-01-01 10:00:00")
    def t(m: Int) = new java.sql.Timestamp(ts0.getTime + m * 60000L)
    // symbol 1: tight cluster around 100 plus one wild print;
    // symbol 2: perfectly flat (MAD = 0 → nothing can flag);
    // symbol 3: structurally invalid rows only (never reaches stats)
    val rows =
      (0 until 20).map(i => (i.toLong, t(i), 1L, "trade",
        100.0 + (i % 5) * 0.1)) ++
      Seq((100L, t(30), 1L, "trade", 500.0)) ++
      (0 until 10).map(i => (200L + i, t(i), 2L, "trade", 42.0)) ++
      Seq((300L, t(1), 3L, "trade", -5.0), (301L, t(2), 3L, "trade", Double.NaN))
    val events = rows.toDF("event_id", "ts", "user_id", "event_type", "value")
      .withColumn("props", lit("{}"))
    val got = Warehouse.anomalyTicksOf(events).collect()
    assert(got.length == 1, s"expected exactly the wild print, got ${got.length}")
    assert(got.head.getAs[Long]("event_id") == 100L)
    assert(math.abs(got.head.getAs[Double]("z")) > 3.5)
    // driver recount on the real corpus: the flagged set is exactly
    // the |z| > 3.5 rows under the same round-6 median/MAD pipeline
    val v = Warehouse.validateTicks(spark, sfDir)
      .select("event_id", "user_id", "value").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    def med(xs: Seq[Double]): Double = {
      val s = xs.sorted; val n = s.length
      val pos = 0.5 * (n - 1); val lo = s(pos.toInt)
      val hi = s(math.min(pos.toInt + 1, n - 1))
      lo + (hi - lo) * (pos - pos.toInt)
    }
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val expected = v.groupBy(_._2).flatMap { case (uid, g) =>
      val m = r6(med(g.map(_._3).toSeq))
      val d = r6(med(g.map(x => math.abs(x._3 - m)).toSeq))
      if (d <= 0) Seq.empty[Long]
      else g.filter(x => math.abs(r6(0.6745 * (x._3 - m) / d)) > 3.5)
        .map(x => x._1).toSeq
    }.toSet
    val gotReal = Warehouse.anomalyTicks(spark, sfDir).collect()
      .map(_.getAs[Long]("event_id")).toSet
    assert(gotReal == expected,
      s"flag sets differ: extra=${gotReal -- expected} missing=${expected -- gotReal}")
  }

  test("drawdown equals a driver-side running-peak walk per symbol") {
    import org.apache.spark.sql.functions._
    val closes = Warehouse.validateTicks(spark, sfDir)
      .groupBy(col("user_id"), to_date(col("ts")).as("d"))
      .agg(max_by(col("value"), struct(col("ts"), col("event_id"))).as("c"))
      .collect()
      .map(r => (r.getLong(0), r.getDate(1), r.getDouble(2)))
    def r8(x: Double) = BigDecimal(x)
      .setScale(8, BigDecimal.RoundingMode.HALF_UP).toDouble
    val expected = closes.groupBy(_._1).map { case (uid, g) =>
      val days = g.sortBy(_._2.getTime)
      var peak = Double.MinValue
      val walk = days.map { case (_, d, c) =>
        peak = math.max(peak, c); (d, c, peak, r8(c / peak - 1.0))
      }
      val best = walk.minBy(w => (w._4, w._1.getTime))
      uid -> (days.length.toLong, best._4, best._1, best._2, best._3)
    }
    val got = Warehouse.drawdown(spark, sfDir).collect()
    assert(got.length == expected.size)
    got.foreach { r =>
      val uid = r.getLong(0)
      val (nDays, dd, day, close, peak) = expected(uid)
      assert(r.getAs[Long]("n_days") == nDays, s"symbol $uid n_days")
      assert(r.getAs[Double]("max_drawdown") == dd, s"symbol $uid dd")
      assert(r.getAs[java.sql.Date]("trough_day") == day, s"symbol $uid day")
      assert(r.getAs[Double]("trough_close") == close, s"symbol $uid close")
      assert(r.getAs[Double]("peak_close") == peak, s"symbol $uid peak")
      assert(dd <= 0.0)
    }
  }

  /** Driver-side validated daily OHLC (high/low rounded 4, close =
    * last by (ts, event_id)) — the reconciliation base the stochastic
    * and ATR walks share.
    */
  private def driverDailyOhlc: Map[Long, Array[(java.sql.Date, Double, Double, Double)]] = {
    def r4(x: Double) = BigDecimal(x)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    Warehouse.validateTicks(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("user_id"),
        java.sql.Date.valueOf(r.getAs[java.sql.Timestamp]("ts")
          .toLocalDateTime.toLocalDate),
        r.getAs[java.sql.Timestamp]("ts").getTime,
        r.getAs[Long]("event_id"), r.getAs[Double]("value")))
      .groupBy(t => (t._1, t._2)).toSeq
      .map { case ((uid, d), g) =>
        val close = g.maxBy(t => (t._3, t._4))._5
        (uid, (d, r4(g.map(_._5).max), r4(g.map(_._5).min), close))
      }
      .groupBy(_._1)
      .map { case (uid, m) =>
        uid -> m.map(_._2).toArray.sortBy(_._1.getTime)
      }
  }

  private def r6(x: Double) = BigDecimal(x)
    .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("stochastic %K/%D equal a driver-side window walk") {
    val daily = driverDailyOhlc
    val got = Warehouse.stochastic(spark, sfDir).collect()
    assert(got.length == daily.values.map(_.length).sum)
    val byKey = got.map(r => (r.getLong(0), r.getAs[java.sql.Date](1)) -> r).toMap
    daily.foreach { case (uid, days) =>
      val ks = new Array[java.lang.Double](days.length)
      days.zipWithIndex.foreach { case ((d, _, _, close), i) =>
        val hi14 = days.slice(math.max(0, i - 13), i + 1).map(_._2).max
        val lo14 = days.slice(math.max(0, i - 13), i + 1).map(_._3).min
        ks(i) = if (i >= 13 && hi14 > lo14)
          r6((close - lo14) / (hi14 - lo14) * 100.0) else null
        val r = byKey((uid, d))
        assert(r.getAs[Double]("hi14") == hi14, s"$uid/$d hi14")
        assert(r.getAs[Double]("lo14") == lo14, s"$uid/$d lo14")
        assert(Option(r.getAs[java.lang.Double]("pct_k")) ==
          Option(ks(i)), s"$uid/$d pct_k")
        val dExp: Option[Double] = if (i >= 15) {
          val win = (i - 2 to i).flatMap(j => Option(ks(j)).map(_.doubleValue))
          if (win.nonEmpty) Some(r6(win.sum / win.length)) else None
        } else None
        val dGot = Option(r.getAs[java.lang.Double]("pct_d")).map(_.doubleValue)
        (dExp, dGot) match {
          case (Some(e), Some(g)) =>
            assert(math.abs(e - g) <= 1e-6, s"$uid/$d pct_d $e vs $g")
          case (e, g) => assert(e == g, s"$uid/$d pct_d null-ness")
        }
      }
    }
    // the guard actually bites: early-session rows carry NULLs
    assert(got.count(_.isNullAt(5)) >= 13 * daily.size)
  }

  test("atr equals a driver-side true-range walk") {
    val daily = driverDailyOhlc
    val got = Warehouse.atr(spark, sfDir).collect()
    val byKey = got.map(r => (r.getLong(0), r.getAs[java.sql.Date](1)) -> r).toMap
    daily.foreach { case (uid, days) =>
      val trs = new Array[Double](days.length)
      days.zipWithIndex.foreach { case ((d, hi, lo, close), i) =>
        trs(i) =
          if (i == 0) r6(hi - lo)
          else {
            val pc = days(i - 1)._4
            r6(math.max(hi - lo, math.max(math.abs(hi - pc), math.abs(lo - pc))))
          }
        val r = byKey((uid, d))
        assert(r.getAs[Double]("tr") == trs(i), s"$uid/$d tr")
        val aGot = Option(r.getAs[java.lang.Double]("atr_14")).map(_.doubleValue)
        if (i >= 13) {
          val e = r6(trs.slice(i - 13, i + 1).sum / 14.0)
          assert(aGot.isDefined && math.abs(aGot.get - e) <= 1e-6,
            s"$uid/$d atr $e vs $aGot")
        } else assert(aGot.isEmpty, s"$uid/$d atr must be null at rn ${i + 1}")
      }
    }
  }

  test("vortex VI± equal a driver-side window walk; null till session 15") {
    val daily = driverDailyOhlc
    val got = Warehouse.vortex(spark, sfDir).collect()
    val byKey = got.map(r => (r.getLong(0), r.getAs[java.sql.Date](1)) -> r).toMap
    daily.foreach { case (uid, days) =>
      val trs = new Array[Double](days.length)
      val vps = new Array[java.lang.Double](days.length)
      val vms = new Array[java.lang.Double](days.length)
      days.zipWithIndex.foreach { case ((d, hi, lo, close), i) =>
        if (i == 0) { trs(i) = r6(hi - lo); vps(i) = null; vms(i) = null }
        else {
          val (_, ph, pl, pc) = days(i - 1)
          trs(i) =
            r6(math.max(hi - lo, math.max(math.abs(hi - pc), math.abs(lo - pc))))
          vps(i) = r6(math.abs(hi - pl))
          vms(i) = r6(math.abs(lo - ph))
        }
        val r = byKey((uid, d))
        assert(r.getAs[Double]("tr") == trs(i), s"$uid/$d tr")
        assert(Option(r.getAs[java.lang.Double]("vm_plus")) ==
          Option(vps(i)), s"$uid/$d vm_plus")
        val (pGot, mGot) = (
          Option(r.getAs[java.lang.Double]("vi_plus")).map(_.doubleValue),
          Option(r.getAs[java.lang.Double]("vi_minus")).map(_.doubleValue))
        val sTr = r6(trs.slice(math.max(0, i - 13), i + 1).sum)
        if (i >= 14 && sTr > 0) {
          def rat(a: Array[java.lang.Double]) = r6(
            r6(a.slice(i - 13, i + 1).map(_.doubleValue).sum) / sTr)
          assert(pGot.isDefined && math.abs(pGot.get - rat(vps)) <= 1e-6,
            s"$uid/$d vi_plus")
          assert(mGot.isDefined && math.abs(mGot.get - rat(vms)) <= 1e-6,
            s"$uid/$d vi_minus")
        } else assert(pGot.isEmpty && mGot.isEmpty,
          s"$uid/$d VI must be null at rn ${i + 1}")
      }
    }
    // warmup nulls actually occur, and live values straddle 1.0
    assert(got.count(_.isNullAt(5)) >= 14 * daily.size)
    val live = got.flatMap(r =>
      Option(r.getAs[java.lang.Double]("vi_plus")).map(_.doubleValue))
    assert(live.exists(_ > 1.0) && live.exists(_ < 1.0))
  }

  test("ultimate oscillator equals the driver-side three-horizon blend") {
    val daily = driverDailyOhlc
    val got = Warehouse.ultimate(spark, sfDir).collect()
    val byKey = got.map(r => (r.getLong(0), r.getAs[java.sql.Date](1)) -> r).toMap
    daily.foreach { case (uid, days) =>
      val bps = new Array[Double](days.length)
      val tru = new Array[Double](days.length)
      days.zipWithIndex.foreach { case ((d, hi, lo, close), i) =>
        val pc = if (i == 0) None else Some(days(i - 1)._4)
        val loTc = math.min(lo, pc.getOrElse(lo))
        val hiTc = math.max(hi, pc.getOrElse(hi))
        bps(i) = r6(close - loTc)
        tru(i) = r6(hiTc - loTc)
        val r = byKey((uid, d))
        assert(r.getAs[Double]("bp") == bps(i), s"$uid/$d bp")
        assert(r.getAs[Double]("tr_u") == tru(i), s"$uid/$d tr_u")
        val uoGot = Option(r.getAs[java.lang.Double]("uo")).map(_.doubleValue)
        def hs(a: Array[Double], n: Int) = r6(a.slice(i - n + 1, i + 1).sum)
        val (st7, st14, st28) =
          if (i >= 27) (hs(tru, 7), hs(tru, 14), hs(tru, 28))
          else (0.0, 0.0, 0.0)
        if (i >= 27 && st7 > 0 && st14 > 0 && st28 > 0) {
          val e = r6((hs(bps, 7) / st7 * 4.0 + hs(bps, 14) / st14 * 2.0 +
            hs(bps, 28) / st28) * 100.0 / 7.0)
          assert(uoGot.isDefined && math.abs(uoGot.get - e) <= 1e-6,
            s"$uid/$d uo $e vs $uoGot")
          assert(uoGot.get >= 0.0 && uoGot.get <= 100.0, s"$uid/$d uo range")
        } else assert(uoGot.isEmpty, s"$uid/$d uo must be null at rn ${i + 1}")
      }
    }
  }

  test("cmo equals a driver-side gain/loss walk and stays in [-100, 100]") {
    val daily = driverDailyOhlc
    val got = Warehouse.cmo(spark, sfDir).collect()
    val byKey = got.map(r => (r.getLong(0), r.getAs[java.sql.Date](1)) -> r).toMap
    daily.foreach { case (uid, days) =>
      val diffs = new Array[java.lang.Double](days.length)
      days.zipWithIndex.foreach { case ((d, _, _, close), i) =>
        diffs(i) = if (i == 0) null else r6(close - days(i - 1)._4)
        val r = byKey((uid, d))
        assert(Option(r.getAs[java.lang.Double]("diff")) ==
          Option(diffs(i)), s"$uid/$d diff")
        val cGot = Option(r.getAs[java.lang.Double]("cmo")).map(_.doubleValue)
        val win = diffs.slice(math.max(0, i - 13), i + 1)
          .flatMap(Option(_)).map(_.doubleValue)
        val su = r6(win.filter(_ > 0).sum)
        val sd = r6(win.filter(_ < 0).map(-_).sum)
        if (i >= 14 && su + sd > 0) {
          val e = r6((su - sd) / (su + sd) * 100.0)
          assert(cGot.isDefined && math.abs(cGot.get - e) <= 1e-6,
            s"$uid/$d cmo $e vs $cGot")
          assert(math.abs(cGot.get) <= 100.0, s"$uid/$d cmo range")
        } else assert(cGot.isEmpty, s"$uid/$d cmo must be null at rn ${i + 1}")
      }
    }
  }

  test("vwap equals the driver-side weighted mean over parsed volumes") {
    val kRe = """"k"\s*:\s*(\d+)""".r
    val ticks = Tables.events(spark, sfDir)
      .filter("value IS NOT NULL AND value > 0 AND NOT isnan(value)" +
        " AND user_id IS NOT NULL").collect()
      .flatMap { r =>
        val vol = Option(r.getAs[String]("props"))
          .flatMap(p => kRe.findFirstMatchIn(p)).map(_.group(1).toLong)
        vol.filter(_ > 0).map(v => (r.getAs[Long]("user_id"),
          java.sql.Date.valueOf(r.getAs[java.sql.Timestamp]("ts")
            .toLocalDateTime.toLocalDate),
          r.getAs[Double]("value"), v))
      }
    val expected = ticks.groupBy(t => (t._1, t._2)).map { case (k, g) =>
      k -> (g.map(t => t._3 * t._4).sum / g.map(_._4).sum,
        g.map(_._4).sum, g.length.toLong)
    }
    val got = Warehouse.vwap(spark, sfDir).collect()
    assert(got.length == expected.size && got.nonEmpty)
    got.foreach { r =>
      val (vwap, vol, n) = expected((r.getLong(0), r.getAs[java.sql.Date](1)))
      assert(math.abs(r.getAs[Double]("vwap") - vwap) <= 1e-6)
      assert(r.getAs[Long]("volume") == vol)
      assert(r.getAs[Long]("n_ticks") == n)
      // VWAP is bracketed by the session's price range by construction
    }
  }

  test("atrWilder replays the driver-side IIR fold bit-exactly") {
    val daily = driverDailyOhlc
    val got = Warehouse.atrWilder(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getAs[java.sql.Date](1)) -> r).toMap
    assert(got.size == daily.values.map(_.length).sum)
    daily.foreach { case (uid, days) =>
      val trs = days.zipWithIndex.map { case ((_, hi, lo, _), i) =>
        if (i == 0) r6(hi - lo)
        else {
          val pc = days(i - 1)._4
          r6(math.max(hi - lo, math.max(math.abs(hi - pc), math.abs(lo - pc))))
        }
      }
      var state = 0.0
      days.zipWithIndex.foreach { case ((d, _, _, _), i) =>
        val r = got((uid, d))
        assert(r.getAs[Double]("tr") == trs(i), s"$uid/$d tr")
        val aw = Option(r.getAs[java.lang.Double]("atr_wilder"))
        if (i < 13) assert(aw.isEmpty, s"$uid/$d must be null at ${i + 1}")
        else {
          state =
            if (i == 13) trs.take(14).foldLeft(0.0)(_ + _) / 14.0
            else (state * 13.0 + trs(i)) / 14.0
          // same float-op order as the query's fold → bit equality
          // (display round = the scaled-double algorithm, see
          // Warehouse.atrWilder)
          val disp = BigDecimal.valueOf(state * 1000000.0)
            .setScale(0, BigDecimal.RoundingMode.HALF_UP).toDouble / 1000000.0
          assert(aw.contains(disp), s"$uid/$d wilder $state vs $aw")
        }
      }
    }
    // Wilder and SMA smoothing genuinely differ past the seed window
    val sma = Warehouse.atr(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getAs[java.sql.Date](1)) ->
        Option(r.getAs[java.lang.Double]("atr_14"))).toMap
    val diverged = got.count { case (k, r) =>
      val aw = Option(r.getAs[java.lang.Double]("atr_wilder"))
      aw.isDefined && sma(k).isDefined && aw != sma(k)
    }
    assert(diverged > 0, "Wilder must not collapse to the SMA variant")
  }

  test("keltner replays both driver-side folds and nests its bands") {
    def rScaled(x: Double): Double = BigDecimal.valueOf(x * 1000000.0)
      .setScale(0, BigDecimal.RoundingMode.HALF_UP).toDouble / 1000000.0
    val daily = driverDailyOhlc
    val got = Warehouse.keltner(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getAs[java.sql.Date](1)) -> r).toMap
    assert(got.size == daily.values.map(_.length).sum)
    daily.foreach { case (uid, days) =>
      val closes = days.map(_._4)
      val trs = days.zipWithIndex.map { case ((_, hi, lo, _), i) =>
        if (i == 0) r6(hi - lo)
        else {
          val pc = days(i - 1)._4
          r6(math.max(hi - lo, math.max(math.abs(hi - pc), math.abs(lo - pc))))
        }
      }
      val k = 2.0 / 21.0
      var ema = 0.0
      var atr = 0.0
      days.zipWithIndex.foreach { case ((d, _, _, close), i) =>
        ema = if (i == 0) close else closes(i) * k + ema * (1.0 - k)
        if (i == 9) atr = trs.take(10).foldLeft(0.0)(_ + _) / 10.0
        else if (i > 9) atr = (atr * 9.0 + trs(i)) / 10.0
        val r = got((uid, d))
        assert(r.getAs[Double]("close_price") == close, s"$uid/$d close")
        val e = Option(r.getAs[java.lang.Double]("ema_20"))
        val a = Option(r.getAs[java.lang.Double]("atr_10"))
        val up = Option(r.getAs[java.lang.Double]("kc_upper"))
        val lo = Option(r.getAs[java.lang.Double]("kc_lower"))
        if (i < 19) assert(e.isEmpty && up.isEmpty && lo.isEmpty,
          s"$uid/$d warmup must be null")
        else {
          assert(e.contains(rScaled(ema)), s"$uid/$d ema")
          assert(up.contains(rScaled(ema + 2.0 * atr)), s"$uid/$d upper")
          assert(lo.contains(rScaled(ema - 2.0 * atr)), s"$uid/$d lower")
          assert(up.get > e.get && e.get > lo.get, s"$uid/$d band order")
        }
        if (i < 9) assert(a.isEmpty, s"$uid/$d atr10 warmup")
        else assert(a.contains(rScaled(atr)), s"$uid/$d atr10")
      }
    }
  }

  test("adx replays the four-fold driver walk on a crafted 50-session series") {
    import spark.implicits._
    def rScaled(x: Double): Double = BigDecimal.valueOf(x * 1000000.0)
      .setScale(0, BigDecimal.RoundingMode.HALF_UP).toDouble / 1000000.0
    // two symbols: a strong uptrend (higher highs/lows every session,
    // deterministic wobble) and a flat band (hi == lo, TR 0 → DIs 0)
    val days = (0 until 50).map { i =>
      val d = java.sql.Date.valueOf(java.time.LocalDate.of(2024, 1, 1).plusDays(i.toLong))
      val wob = (i % 7) * 0.13
      (1L, d, 100.0 + 2.0 * i + wob, 98.0 + 2.0 * i - wob, 99.0 + 2.0 * i)
    } ++ (0 until 50).map { i =>
      val d = java.sql.Date.valueOf(java.time.LocalDate.of(2024, 1, 1).plusDays(i.toLong))
      (2L, d, 50.0, 50.0, 50.0)
    }
    val daily = days.toDF("user_id", "trade_date", "high_price",
      "low_price", "close_price")
    val got = Warehouse.adxOfDaily(daily).collect()
      .map(r => (r.getLong(0), r.getAs[java.sql.Date](1)) -> r).toMap
    assert(got.size == 100)
    def r6x(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    days.groupBy(_._1).foreach { case (uid, g) =>
      val s = g.sortBy(_._2.getTime)
      // session-2+ series, rounded like the query
      val (dps, dms, trs) = s.sliding(2).map { case Seq(p, c) =>
        val up = c._3 - p._3
        val dn = p._4 - c._4
        (r6x(if (up > dn && up > 0) up else 0.0),
          r6x(if (dn > up && dn > 0) dn else 0.0),
          r6x(math.max(c._3 - c._4,
            math.max(math.abs(c._3 - p._5), math.abs(c._4 - p._5)))))
      }.toSeq.unzip3
      def wilder(xs: Seq[Double]): Seq[Option[Double]] = {
        var st = 0.0
        xs.zipWithIndex.map { case (x, i) =>
          if (i < 13) { None }
          else {
            st = if (i == 13) xs.take(14).foldLeft(0.0)(_ + _) / 14.0
            else (st * 13.0 + x) / 14.0
            Some(st)
          }
        }
      }
      val (sp, sm, st) = (wilder(dps), wilder(dms), wilder(trs))
      val dip = sp.zip(st).map {
        case (Some(p), Some(t)) => Some(if (t == 0.0) 0.0 else 100.0 * p / t)
        case _ => None
      }
      val dim = sm.zip(st).map {
        case (Some(m), Some(t)) => Some(if (t == 0.0) 0.0 else 100.0 * m / t)
        case _ => None
      }
      val dx = dip.zip(dim).map {
        case (Some(p), Some(m)) =>
          Some(if (p + m == 0.0) 0.0 else 100.0 * math.abs(p - m) / (p + m))
        case _ => None
      }
      val adxSeries = wilder(dx.flatten)
      s.zipWithIndex.foreach { case ((_, d, _, _, _), t0) =>
        val t = t0 + 1 // 1-based session
        val r = got((uid, d))
        def chk(name: String, e: Option[Double]) = {
          val gv = Option(r.getAs[java.lang.Double](name)).map(_.doubleValue)
          assert(gv == e.map(rScaled), s"$uid/$d $name: $gv vs $e")
        }
        chk("di_plus", if (t >= 15) dip(t - 2) else None)
        chk("di_minus", if (t >= 15) dim(t - 2) else None)
        chk("dx", if (t >= 15) dx(t - 2) else None)
        chk("adx", if (t >= 28) adxSeries(t - 15) else None)
      }
    }
    // semantics: the uptrend reads as one — +DI dominates and ADX is high
    val up50 = got((1L, days(49)._2))
    assert(up50.getAs[Double]("di_plus") > up50.getAs[Double]("di_minus"))
    assert(up50.getAs[Double]("adx") > 25.0, "a clean trend must read strong")
    // the flat band never produces a directional reading
    val flat50 = got((2L, days(49)._2))
    assert(flat50.getAs[Double]("di_plus") == 0.0 &&
      flat50.getAs[Double]("di_minus") == 0.0 &&
      flat50.getAs[Double]("dx") == 0.0 && flat50.getAs[Double]("adx") == 0.0)
  }

  test("donchian channels bracket closes and breakouts match the prior channel") {
    val daily = driverDailyOhlc
    val got = Warehouse.donchian(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getAs[java.sql.Date](1)) -> r).toMap
    assert(got.size == daily.values.map(_.length).sum)
    daily.foreach { case (uid, days) =>
      days.zipWithIndex.foreach { case ((d, _, _, close), i) =>
        val r = got((uid, d))
        val up = Option(r.getAs[java.lang.Double]("dc_upper"))
        val lo = Option(r.getAs[java.lang.Double]("dc_lower"))
        if (i < 19) assert(up.isEmpty && lo.isEmpty, s"$uid/$d warmup")
        else {
          val win = days.slice(i - 19, i + 1)
          assert(up.contains(win.map(_._2).max), s"$uid/$d upper")
          assert(lo.contains(win.map(_._3).min), s"$uid/$d lower")
          // the channel brackets every close inside its own window
          assert(close <= up.get + 1e-9 && close >= lo.get - 1e-9)
        }
        val bu = Option(r.getAs[java.lang.Boolean]("brk_up"))
        if (i >= 20) {
          val prevUp = days.slice(i - 20, i).map(_._2).max
          assert(bu.contains(close > prevUp), s"$uid/$d breakout")
        } else assert(bu.isEmpty, s"$uid/$d breakout must be null")
      }
    }
  }

  test("cci-20 equals a driver-side mean-deviation walk") {
    // the operator's scaled display round (round(x*1e6, 0)/1e6)
    def srd(x: Double) = BigDecimal(x * 1e6)
      .setScale(0, BigDecimal.RoundingMode.HALF_UP).toDouble / 1e6
    val daily = driverDailyOhlc
    val got = Warehouse.cci(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getAs[java.sql.Date](1)) -> r).toMap
    assert(got.size == daily.values.map(_.length).sum)
    daily.foreach { case (uid, days) =>
      val tps = days.map { case (_, hi, lo, close) => r6((hi + lo + close) / 3.0) }
      days.zipWithIndex.foreach { case ((d, _, _, _), i) =>
        val r = got((uid, d))
        assert(r.getAs[Double]("tp") == tps(i), s"$uid/$d tp")
        val sma = Option(r.getAs[java.lang.Double]("sma_tp"))
        val md = Option(r.getAs[java.lang.Double]("mean_dev"))
        val cci = Option(r.getAs[java.lang.Double]("cci"))
        if (i < 19) assert(sma.isEmpty && md.isEmpty && cci.isEmpty,
          s"$uid/$d warmup")
        else {
          val win = tps.slice(i - 19, i + 1)
          val expSma = srd(win.sum / 20.0)
          assert(sma.contains(expSma), s"$uid/$d sma")
          val expMd = srd(win.foldLeft(0.0)((a, x) => a + math.abs(x - expSma)) / 20.0)
          assert(md.contains(expMd), s"$uid/$d meanDev")
          if (expMd > 0)
            assert(cci.contains(srd((tps(i) - expSma) / (0.015 * expMd))),
              s"$uid/$d cci")
          else assert(cci.isEmpty, s"$uid/$d flat-window cci must be null")
        }
      }
    }
  }

  test("aroon-25 equals a driver-side argmax walk with latest-tie extremes") {
    val daily = driverDailyOhlc
    val got = Warehouse.aroon(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getAs[java.sql.Date](1)) -> r).toMap
    assert(got.size == daily.values.map(_.length).sum)
    daily.foreach { case (uid, days) =>
      days.zipWithIndex.foreach { case ((d, _, _, _), i) =>
        val r = got((uid, d))
        val up = Option(r.getAs[java.lang.Double]("aroon_up"))
        val dn = Option(r.getAs[java.lang.Double]("aroon_down"))
        val osc = Option(r.getAs[java.lang.Double]("aroon_osc"))
        if (i < 25) assert(up.isEmpty && dn.isEmpty && osc.isEmpty,
          s"$uid/$d warmup")
        else {
          val win = days.slice(i - 25, i + 1)
          val hi = win.map(_._2).max
          val lo = win.map(_._3).min
          // latest occurrence of the extreme (the pinned tiebreak)
          val sinceHi = win.length - 1 - win.lastIndexWhere(_._2 == hi)
          val sinceLo = win.length - 1 - win.lastIndexWhere(_._3 == lo)
          assert(up.contains((25 - sinceHi) * 4.0), s"$uid/$d up")
          assert(dn.contains((25 - sinceLo) * 4.0), s"$uid/$d down")
          assert(osc.contains((sinceLo - sinceHi) * 4.0), s"$uid/$d osc")
          assert(up.get >= 0 && up.get <= 100 && dn.get >= 0 && dn.get <= 100)
        }
      }
    }
  }

  test("momentum pack equals a driver-side lag/extreme walk") {
    def srd(x: Double) = BigDecimal(x * 1e6)
      .setScale(0, BigDecimal.RoundingMode.HALF_UP).toDouble / 1e6
    val daily = driverDailyOhlc
    val got = Warehouse.momentum(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getAs[java.sql.Date](1)) -> r).toMap
    assert(got.size == daily.values.map(_.length).sum)
    daily.foreach { case (uid, days) =>
      days.zipWithIndex.foreach { case ((d, _, _, close), i) =>
        val r = got((uid, d))
        val willr = Option(r.getAs[java.lang.Double]("willr"))
        val roc = Option(r.getAs[java.lang.Double]("roc_12"))
        val mom = Option(r.getAs[java.lang.Double]("mom_10"))
        if (i < 13) assert(willr.isEmpty, s"$uid/$d willr warmup")
        else {
          val win = days.slice(i - 13, i + 1)
          val hi = win.map(_._2).max; val lo = win.map(_._3).min
          if (hi > lo) {
            assert(willr.contains(srd(-100.0 * (hi - close) / (hi - lo))),
              s"$uid/$d willr")
            assert(willr.get <= 1e-9 && willr.get >= -100.0 - 1e-9)
          } else assert(willr.isEmpty, s"$uid/$d flat-band willr")
        }
        if (i < 12) assert(roc.isEmpty, s"$uid/$d roc warmup")
        else assert(roc.contains(
          srd(100.0 * (close - days(i - 12)._4) / days(i - 12)._4)),
          s"$uid/$d roc")
        if (i < 10) assert(mom.isEmpty, s"$uid/$d mom warmup")
        else assert(mom.contains(close - days(i - 10)._4), s"$uid/$d mom")
      }
    }
  }

  test("ichimoku components equal a driver-side midline/displacement walk") {
    val daily = driverDailyOhlc
    val got = Warehouse.ichimoku(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getAs[java.sql.Date](1)) -> r).toMap
    assert(got.size == daily.values.map(_.length).sum)
    daily.foreach { case (uid, days) =>
      def mid(i: Int, n: Int): Option[Double] =
        if (i < n - 1) None
        else {
          val w = days.slice(i - n + 1, i + 1)
          Some((w.map(_._2).max + w.map(_._3).min) / 2.0)
        }
      days.zipWithIndex.foreach { case ((d, _, _, _), i) =>
        val r = got((uid, d))
        def g(c: String) = Option(r.getAs[java.lang.Double](c)).map(_.toDouble)
        assert(g("tenkan") == mid(i, 3), s"$uid/$d tenkan")
        assert(g("kijun") == mid(i, 6), s"$uid/$d kijun")
        val expA = if (i < 6) None
          else for (t <- mid(i - 6, 3); k <- mid(i - 6, 6)) yield (t + k) / 2.0
        assert(g("senkou_a") == expA, s"$uid/$d senkou_a")
        val expB = if (i < 6) None else mid(i - 6, 12)
        assert(g("senkou_b") == expB, s"$uid/$d senkou_b")
        val expC = if (i + 6 < days.length) Some(days(i + 6)._4) else None
        assert(g("chikou") == expC, s"$uid/$d chikou")
      }
    }
  }

  test("psar equals a driver-side stop-and-reverse state machine") {
    def srd(x: Double) = BigDecimal(x * 1e6)
      .setScale(0, BigDecimal.RoundingMode.HALF_UP).toDouble / 1e6
    val daily = driverDailyOhlc
    val got = Warehouse.psar(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getAs[java.sql.Date](1)) -> r).toMap
    assert(got.size == daily.values.map(_.length).sum)
    var reversals = 0
    daily.foreach { case (uid, days) =>
      // state: (up, sar, ep, af, ph, pl)
      var st: Option[(Boolean, Double, Double, Double)] = None
      var (ph, pl, pc) = (days(0)._2, days(0)._3, days(0)._4)
      days.zipWithIndex.foreach { case ((d, hi, lo, cls), i) =>
        val r = got((uid, d))
        if (i == 0)
          assert(r.isNullAt(r.fieldIndex("psar")) &&
            r.isNullAt(r.fieldIndex("trend_up")), s"$uid/$d session-1 state")
        else {
          val (up, sar, ep, af, rv) = st match {
            case None =>
              val up0 = cls >= pc
              (up0,
                if (up0) math.min(pl, lo) else math.max(ph, hi),
                if (up0) math.max(ph, hi) else math.min(pl, lo),
                0.02, false)
            case Some((u, s0, e0, a0)) =>
              val nsr = s0 + a0 * (e0 - s0)
              val nsc = if (u) math.min(nsr, pl) else math.max(nsr, ph)
              val rev = if (u) lo < nsc else hi > nsc
              if (rev) (!u, e0, if (u) lo else hi, 0.02, true)
              else if (u && hi > e0) (u, nsc, hi, math.min(a0 + 0.02, 0.2), false)
              else if (!u && lo < e0) (u, nsc, lo, math.min(a0 + 0.02, 0.2), false)
              else (u, nsc, e0, a0, false)
          }
          st = Some((up, sar, ep, af))
          assert(r.getAs[Double]("psar") == srd(sar), s"$uid/$d sar")
          assert(r.getAs[Boolean]("trend_up") == up, s"$uid/$d trend")
          assert(r.getAs[Boolean]("reversal") == rv, s"$uid/$d reversal")
          if (rv) reversals += 1
          ph = hi; pl = lo; pc = cls
        }
      }
    }
    assert(reversals > 0, "corpus must exercise the reversal branch")
  }

  test("signalConfluence agrees with every component surface") {
    val conf = Warehouse.signalConfluence(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getAs[java.sql.Date](1)) -> r).toMap
    assert(conf.nonEmpty)
    def opt(r: org.apache.spark.sql.Row, c: String): Option[Int] =
      Option(r.getAs[java.lang.Integer](c)).map(_.toInt)
    // per-row score reconciliation + range
    conf.values.foreach { r =>
      val bulls = Seq("sma_bull", "boll_up", "stoch_hot", "cci_hot",
        "aroon_bull", "brk_up", "psar_bull").flatMap(opt(r, _)).sum
      val bears = Seq("boll_dn", "stoch_cold", "cci_cold", "aroon_bear",
        "brk_dn", "psar_bear").flatMap(opt(r, _)).sum +
        opt(r, "sma_bull").map(1 - _).getOrElse(0)
      assert(r.getAs[Int]("bull_score") == bulls, "bull score recount")
      assert(r.getAs[Int]("bear_score") == bears, "bear score recount")
      assert(r.getAs[Int]("net_score") == bulls - bears)
      assert(bulls >= 0 && bulls <= 7 && bears >= 0 && bears <= 7)
    }
    // component agreement: the screener's votes match the standalone
    // surfaces (rounded-display boundaries excluded where a surface
    // rounds and the screener compares raw)
    Warehouse.psar(spark, sfDir).collect().foreach { p =>
      val r = conf((p.getLong(0), p.getAs[java.sql.Date](1)))
      val up = Option(p.getAs[java.lang.Boolean]("trend_up")).map(b => if (b) 1 else 0)
      assert(opt(r, "psar_bull") == up, "psar vote")
    }
    Warehouse.aroon(spark, sfDir).collect().foreach { a =>
      val r = conf((a.getLong(0), a.getAs[java.sql.Date](1)))
      (Option(a.getAs[java.lang.Double]("aroon_up")),
        Option(a.getAs[java.lang.Double]("aroon_down"))) match {
        case (Some(u), Some(d)) =>
          assert(opt(r, "aroon_bull").contains(if (u > d) 1 else 0), "aroon vote")
        case _ => assert(opt(r, "aroon_bull").isEmpty)
      }
    }
    Warehouse.donchian(spark, sfDir).collect().foreach { d =>
      val r = conf((d.getLong(0), d.getAs[java.sql.Date](1)))
      val bu = Option(d.getAs[java.lang.Boolean]("brk_up")).map(b => if (b) 1 else 0)
      assert(opt(r, "brk_up") == bu, "donchian vote")
    }
    var cciChecked = 0
    Warehouse.cci(spark, sfDir).collect().foreach { c =>
      val r = conf((c.getLong(0), c.getAs[java.sql.Date](1)))
      Option(c.getAs[java.lang.Double]("cci")).foreach { v =>
        if (math.abs(math.abs(v) - 100.0) > 1e-3) {
          assert(opt(r, "cci_hot").contains(if (v > 100.0) 1 else 0), s"cci vote $v")
          cciChecked += 1
        }
      }
    }
    assert(cciChecked > 0, "cci agreement must cover live rows")
  }

  test("rsiWilder equals a driver-side two-fold walk and stays in [0,100]") {
    def srd(x: Double) = BigDecimal(x * 1e6)
      .setScale(0, BigDecimal.RoundingMode.HALF_UP).toDouble / 1e6
    val daily = driverDailyOhlc
    val got = Warehouse.rsiWilder(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getAs[java.sql.Date](1)) -> r).toMap
    assert(got.size == daily.values.map(_.length).sum)
    var live = 0
    daily.foreach { case (uid, days) =>
      val cls = days.map(_._4)
      val gains = cls.indices.drop(1).map(i =>
        r6(math.max(cls(i) - cls(i - 1), 0.0)))
      val losses = cls.indices.drop(1).map(i =>
        r6(math.max(cls(i - 1) - cls(i), 0.0)))
      def wilder(xs: Seq[Double], upto: Int): Double = {
        val seed = xs.take(14).sum / 14.0
        xs.slice(14, upto).foldLeft(seed)((a, x) => (a * 13.0 + x) / 14.0)
      }
      days.zipWithIndex.foreach { case ((d, _, _, _), i) =>
        val r = got((uid, d))
        val rsi = Option(r.getAs[java.lang.Double]("rsi_14")).map(_.toDouble)
        if (i < 14) assert(rsi.isEmpty, s"$uid/$d warmup")
        else {
          val g = wilder(gains, i)
          val l = wilder(losses, i)
          val exp = if (g + l == 0.0) 50.0 else srd(100.0 * g / (g + l))
          assert(rsi.contains(exp), s"$uid/$d rsi")
          assert(exp >= 0.0 && exp <= 100.0)
          live += 1
        }
      }
    }
    assert(live > 0)
  }

  test("stochRsi equals a driver window walk over the proven RSI frame") {
    def rd6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val rsiRows = Warehouse.rsiWilder(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getAs[java.sql.Date](1),
        Option(r.getAs[java.lang.Double]("rsi_14")).map(_.toDouble)))
    val got = Warehouse.stochRsi(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getAs[java.sql.Date](1)) -> r).toMap
    assert(got.size == rsiRows.length)
    var liveS = 0
    var liveD = 0
    rsiRows.groupBy(_._1).foreach { case (uid, rows) =>
      val sorted = rows.sortBy(_._2.getTime)
      val rsis = sorted.map(_._3).toIndexedSeq
      val stoch = rsis.indices.map { i =>
        val w = rsis.slice(math.max(0, i - 6), i + 1).flatten
        if (i >= 6 && w.length == 7 && w.max > w.min)
          Some(rd6((rsis(i).get - w.min) / (w.max - w.min) * 100.0))
        else None
      }
      def sma3(xs: IndexedSeq[Option[Double]]) = xs.indices.map { i =>
        val w = xs.slice(math.max(0, i - 2), i + 1).flatten
        if (i >= 2 && w.length == 3)
          Some(rd6(w.reduceLeft(_ + _) / 3.0))
        else None
      }
      val k = sma3(stoch)
      val d = sma3(k)
      sorted.zipWithIndex.foreach { case ((_, dt, _), i) =>
        val r = got((uid, dt))
        def gd(c: String) =
          Option(r.getAs[java.lang.Double](c)).map(_.toDouble)
        assert(gd("stoch_rsi") == stoch(i), s"$uid/$dt stoch")
        assert(gd("pct_k") == k(i), s"$uid/$dt %K")
        assert(gd("pct_d") == d(i), s"$uid/$dt %D")
        // null-shape: nothing fires before 7 live RSIs exist (session
        // 21 = 14 warmup + 7), and every live value is a percentage
        if (i < 20) assert(stoch(i).isEmpty, s"$uid/$dt early stoch")
        stoch(i).foreach(v => assert(v >= 0.0 && v <= 100.0))
        if (stoch(i).isDefined) liveS += 1
        if (d(i).isDefined) liveD += 1
      }
    }
    assert(liveS > 0, "no live stoch values — corpus shape changed")
    assert(liveD > 0, "no live %D values — corpus shape changed")
  }

  // daily bars WITH the open leg — the heikin-ashi/gap specs' base
  private def driverDailyOhlcFull
      : Map[Long, Array[(java.sql.Date, Double, Double, Double, Double)]] = {
    def r4(x: Double) = BigDecimal(x)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    Warehouse.validateTicks(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("user_id"),
        java.sql.Date.valueOf(r.getAs[java.sql.Timestamp]("ts")
          .toLocalDateTime.toLocalDate),
        r.getAs[java.sql.Timestamp]("ts").getTime,
        r.getAs[Long]("event_id"), r.getAs[Double]("value")))
      .groupBy(t => (t._1, t._2)).toSeq
      .map { case ((uid, d), g) =>
        (uid, (d, g.minBy(t => (t._3, t._4))._5,
          r4(g.map(_._5).max), r4(g.map(_._5).min),
          g.maxBy(t => (t._3, t._4))._5))
      }
      .groupBy(_._1)
      .map { case (uid, m) => uid -> m.map(_._2).toArray.sortBy(_._1.getTime) }
  }

  test("heikinAshi equals a driver-side body-midpoint recursion") {
    val daily = driverDailyOhlcFull
    val got = Warehouse.heikinAshi(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getAs[java.sql.Date](1)) -> r).toMap
    assert(got.size == daily.values.map(_.length).sum)
    daily.foreach { case (uid, days) =>
      var hao = 0.0
      var prevHac = 0.0
      days.zipWithIndex.foreach { case ((d, o, hi, lo, c), i) =>
        val hac = (o + hi + lo + c) / 4.0
        hao = if (i == 0) (o + c) / 2.0 else (hao + prevHac) / 2.0
        prevHac = hac
        val r = got((uid, d))
        assert(r.getAs[Double]("ha_open") == hao, s"$uid/$d haOpen")
        assert(r.getAs[Double]("ha_close") == hac, s"$uid/$d haClose")
        assert(r.getAs[Double]("ha_high") == math.max(hi, math.max(hao, hac)))
        assert(r.getAs[Double]("ha_low") == math.min(lo, math.min(hao, hac)))
      }
    }
  }

  test("pivotPoints and gapStats equal driver-side lag walks") {
    val daily = driverDailyOhlcFull
    val piv = Warehouse.pivotPoints(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getAs[java.sql.Date](1)) -> r).toMap
    val gap = Warehouse.gapStats(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getAs[java.sql.Date](1)) -> r).toMap
    assert(piv.size == daily.values.map(_.length).sum)
    assert(gap.size == piv.size)
    var fills = 0
    daily.foreach { case (uid, days) =>
      days.zipWithIndex.foreach { case ((d, o, hi, lo, c), i) =>
        val rp = piv((uid, d)); val rg = gap((uid, d))
        if (i == 0) {
          assert(rp.isNullAt(rp.fieldIndex("pivot_pt")), s"$uid/$d first pivot")
          assert(rg.isNullAt(rg.fieldIndex("gap")), s"$uid/$d first gap")
          assert(rg.isNullAt(rg.fieldIndex("gap_filled")),
            s"$uid/$d first gap_filled must be NULL, not a phantom fill")
        } else {
          val (_, _, ph, pl, pc) = days(i - 1)
          val p = (ph + pl + pc) / 3.0
          assert(rp.getAs[Double]("pivot_pt") == p, s"$uid/$d pivot")
          assert(rp.getAs[Double]("r1") == 2.0 * p - pl)
          assert(rp.getAs[Double]("s1") == 2.0 * p - ph)
          assert(rp.getAs[Double]("r2") == p + (ph - pl))
          assert(rp.getAs[Double]("s2") == p - (ph - pl))
          assert(rp.getAs[Boolean]("above_pivot") == (c > p))
          val g = o - pc
          assert(rg.getAs[Double]("gap") == g, s"$uid/$d gap")
          val gm = BigDecimal(g * 1e6)
            .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
          val pm = BigDecimal(pc * 1e6)
            .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
          assert(rg.getAs[Long]("gap_ppm") ==
            gm / pm * 1000L + gm % pm * 1000L / pm, s"$uid/$d ppm")
          val filled =
            if (g > 0) lo <= pc else if (g < 0) hi >= pc else true
          assert(rg.getAs[Boolean]("gap_filled") == filled, s"$uid/$d fill")
          if (filled) fills += 1
        }
      }
    }
    assert(fills > 0)
  }

  test("volumeProfile buckets volume exactly and pins one POC per symbol") {
    val kRe = """"k"\s*:\s*(\d+)""".r
    val ticks = Tables.events(spark, sfDir)
      .filter("value IS NOT NULL AND value > 0 AND NOT isnan(value)" +
        " AND user_id IS NOT NULL").collect()
      .map { r =>
        val vol = Option(r.getAs[String]("props"))
          .flatMap(p => kRe.findFirstMatchIn(p)).map(_.group(1).toLong)
          .getOrElse(0L)
        (r.getAs[Long]("user_id"),
          math.min(math.max(math.floor(r.getAs[Double]("value") / 50.0).toLong, 0L), 9L),
          vol)
      }
    val exp = ticks.groupBy(t => (t._1, t._2)).map { case (k, g) =>
      k -> (g.map(_._3).sum, g.length.toLong) }
    val got = Warehouse.volumeProfile(spark, sfDir).collect()
    assert(got.length == exp.size)
    got.foreach { r =>
      val k = (r.getLong(0), r.getLong(1))
      assert((r.getAs[Long]("volume"), r.getAs[Long]("n_ticks")) == exp(k), s"$k")
      assert(r.getAs[Long]("bucket_lo") == r.getLong(1) * 50L)
    }
    got.groupBy(_.getLong(0)).foreach { case (uid, rows) =>
      val pocs = rows.filter(_.getAs[Boolean]("poc"))
      assert(pocs.length == 1, s"$uid poc count")
      val best = rows.map(r => (r.getAs[Long]("volume"), -r.getLong(1))).max
      assert((pocs.head.getAs[Long]("volume"), -pocs.head.getLong(1)) == best,
        s"$uid poc pick")
    }
  }

  test("ewmaVol equals a driver-side RiskMetrics walk") {
    def srd(x: Double) = BigDecimal(x * 1e6)
      .setScale(0, BigDecimal.RoundingMode.HALF_UP).toDouble / 1e6
    val daily = driverDailyOhlc
    val got = Warehouse.ewmaVol(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getAs[java.sql.Date](1)) -> r).toMap
    assert(got.size == daily.values.map(_.length).sum)
    daily.foreach { case (uid, days) =>
      val cls = days.map(_._4)
      val rets = cls.indices.drop(1).map(i => r6(math.log(cls(i) / cls(i - 1))))
      var v = 0.0
      days.zipWithIndex.foreach { case ((d, _, _, _), i) =>
        val r = got((uid, d))
        val vol = Option(r.getAs[java.lang.Double]("ewma_vol")).map(_.toDouble)
        if (i == 0) assert(vol.isEmpty, s"$uid/$d seed")
        else {
          v = if (i == 1) rets(0) * rets(0)
              else 0.94 * v + 0.06 * rets(i - 1) * rets(i - 1)
          assert(vol.contains(srd(math.sqrt(v * 252.0))), s"$uid/$d vol")
          assert(vol.get >= 0.0)
        }
      }
    }
  }

  test("supertrend equals a driver-side band-carry walk") {
    def srd(x: Double) = BigDecimal(x * 1e6)
      .setScale(0, BigDecimal.RoundingMode.HALF_UP).toDouble / 1e6
    val daily = driverDailyOhlc
    val got = Warehouse.supertrend(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getAs[java.sql.Date](1)) -> r).toMap
    assert(got.size == daily.values.map(_.length).sum)
    var flips = 0
    daily.foreach { case (uid, days) =>
      // TR series (session 1 = plain range), Wilder ATR-10
      val trs = days.zipWithIndex.map { case ((_, hi, lo, _), i) =>
        if (i == 0) r6(hi - lo)
        else r6(math.max(hi - lo, math.max(
          math.abs(hi - days(i - 1)._4), math.abs(lo - days(i - 1)._4))))
      }
      var atr = 0.0
      var (fub, flb, st0, pc) = (0.0, 0.0, 0.0, 0.0)
      var prevUp = false
      days.zipWithIndex.foreach { case ((d, hi, lo, cls), i) =>
        val r = got((uid, d))
        if (i < 9) assert(r.isNullAt(r.fieldIndex("supertrend")), s"$uid/$d warmup")
        else {
          atr =
            if (i == 9) trs.take(10).sum / 10.0
            else (atr * 9.0 + trs(i)) / 10.0
          val hl2 = (hi + lo) / 2.0
          val (ub, lb) = (hl2 + 3.0 * atr, hl2 - 3.0 * atr)
          if (i == 9) { fub = ub; flb = lb; st0 = fub; pc = cls }
          else {
            val nfub = if (ub < fub || pc > fub) ub else fub
            val nflb = if (lb > flb || pc < flb) lb else flb
            st0 =
              if (st0 == fub) { if (cls <= nfub) nfub else nflb }
              else { if (cls >= nflb) nflb else nfub }
            fub = nfub; flb = nflb; pc = cls
          }
          val up = st0 == flb
          assert(r.getAs[Double]("supertrend") == srd(st0), s"$uid/$d st")
          assert(r.getAs[Boolean]("trend_up") == up, s"$uid/$d side")
          assert(r.getAs[Double]("upper_band") == srd(fub))
          assert(r.getAs[Double]("lower_band") == srd(flb))
          if (i > 9 && up != prevUp) flips += 1
          prevUp = up
        }
      }
    }
    // the 3xATR bands never get crossed inside this corpus' short,
    // hyper-volatile sessions — flip coverage comes from the crafted
    // series below
    assert(flips >= 0)
  }

  test("supertrend flips on crafted band crossings, both directions") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // 12 calm rising sessions, a surge through the upper band, two
    // calm sessions, then a crash through the lower band
    val closes = (1 to 12).map(i => 100.0 + i) ++
      Seq(200.0, 201.0, 202.0, 80.0, 79.0)
    val rows = closes.zipWithIndex.map { case (c, i) =>
      (7L, java.sql.Date.valueOf(f"2024-02-${i + 1}%02d"),
        c + 1.0, c - 1.0, c)
    }
    val daily = rows.toDF("user_id", "trade_date", "high_price",
      "low_price", "close_price")
    val wRn = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("trade_date")
    val trBase = daily
      .withColumn("prev_close", lag("close_price", 1).over(wRn))
      .withColumn("tr", round(
        when(col("prev_close").isNull, col("high_price") - col("low_price"))
          .otherwise(greatest(
            col("high_price") - col("low_price"),
            abs(col("high_price") - col("prev_close")),
            abs(col("low_price") - col("prev_close")))), 6))
    val got = Warehouse.supertrendOfTr(trBase).collect()
      .sortBy(_.getAs[java.sql.Date]("trade_date").getTime)
    val ups = got.drop(9).map(_.getAs[Boolean]("trend_up")).toSeq
    assert(!ups.head, "seeds on the upper band (down)")
    assert(ups.exists(identity), "the surge must flip the stop up")
    val firstUp = ups.indexOf(true)
    assert(ups.drop(firstUp).contains(false), "the crash must flip it back")
    // the stop brackets price on the correct side throughout
    got.drop(9).foreach { r =>
      val st = r.getAs[Double]("supertrend")
      val c = r.getAs[Double]("close_price")
      if (r.getAs[Boolean]("trend_up")) assert(st <= c + 1e-6, s"up stop below $c")
      else assert(st >= c - 1e-6, s"down stop above $c")
    }
  }

  test("tema/trix chained folds replay a driver-side triple-EMA walk") {
    import spark.implicits._
    def srd(x: Double) = BigDecimal(x * 1e6)
      .setScale(0, BigDecimal.RoundingMode.HALF_UP).toDouble / 1e6
    // 100 sessions — enough to light every warmup tier (EMA 20, DEMA
    // 39, TEMA 58, TRIX 44) that the small-SF corpora never reach;
    // the 42-session sine survives the triple smoothing (a faster
    // oscillation would be filtered flat and TRIX would never dip)
    val closes = (0 until 100).map(i =>
      100.0 + i * 0.2 + 15.0 * math.sin(i * 0.15)).toArray
    val daily = closes.zipWithIndex.map { case (c, i) =>
      (9L, java.sql.Date.valueOf(
        java.time.LocalDate.of(2024, 1, 1).plusDays(i)), c)
    }.toSeq.toDF("user_id", "trade_date", "close_price")
    def ema(xs: Array[Double], p: Int): Array[Double] = {
      val k = 2.0 / (p + 1.0)
      val out = new Array[Double](xs.length)
      xs.zipWithIndex.foreach { case (x, i) =>
        out(i) = if (i == 0) x else x * k + out(i - 1) * (1.0 - k) }
      out
    }
    val gotT = Warehouse.temaOfDaily(daily).collect()
      .sortBy(_.getAs[java.sql.Date]("trade_date").getTime)
    val (t1, t2) = (ema(closes, 20), ema(ema(closes, 20), 20))
    val t3 = ema(t2, 20)
    gotT.zipWithIndex.foreach { case (r, i) =>
      def at(c: String) = Option(r.getAs[java.lang.Double](c)).map(_.doubleValue)
      assert(at("ema_20") == (if (i >= 19) Some(srd(t1(i))) else None), s"e1@$i")
      assert(at("dema_20") ==
        (if (i >= 38) Some(srd(2.0 * t1(i) - t2(i))) else None), s"dema@$i")
      assert(at("tema_20") ==
        (if (i >= 57) Some(srd(3.0 * t1(i) - 3.0 * t2(i) + t3(i))) else None),
        s"tema@$i")
    }
    assert(gotT.count(!_.isNullAt(4)) == 100 - 38, "dema live span")
    assert(gotT.count(!_.isNullAt(5)) == 100 - 57, "tema live span")
    val (x1, x2) = (ema(closes, 15), ema(ema(closes, 15), 15))
    val x3 = ema(x2, 15)
    val gotX = Warehouse.trixOfDaily(daily).collect()
      .sortBy(_.getAs[java.sql.Date]("trade_date").getTime)
    gotX.zipWithIndex.foreach { case (r, i) =>
      assert(r.getAs[Double]("e3") == srd(x3(i)), s"trix e3@$i")
      val tGot = Option(r.getAs[java.lang.Double]("trix")).map(_.doubleValue)
      assert(tGot == (if (i >= 43)
        Some(srd((x3(i) / x3(i - 1) - 1.0) * 100.0)) else None), s"trix@$i")
    }
    // the sine component means TRIX actually changes sign while live
    val live = gotX.flatMap(r =>
      Option(r.getAs[java.lang.Double]("trix")).map(_.doubleValue))
    assert(live.exists(_ > 0) && live.exists(_ < 0), "trix sign coverage")
  }

  test("forceIndex EMA-13 replays a driver-side fold on a crafted series") {
    import spark.implicits._
    def srd(x: Double) = BigDecimal(x * 1e6)
      .setScale(0, BigDecimal.RoundingMode.HALF_UP).toDouble / 1e6
    val closes = (0 until 30).map(i =>
      50.0 + 4.0 * math.sin(i * 0.9) + i * 0.3).toArray
    val vols = (0 until 30).map(i => 1000L + 137L * (i % 7)).toArray
    val daily = (0 until 30).map(i =>
      (3L, java.sql.Date.valueOf(
        java.time.LocalDate.of(2024, 3, 1).plusDays(i)), closes(i), vols(i)))
      .toDF("user_id", "trade_date", "close_price", "volume")
    val got = Warehouse.forceIndexOfDaily(daily).collect()
      .sortBy(_.getAs[java.sql.Date]("trade_date").getTime)
    val fis = (1 until 30).map(i =>
      (closes(i) - closes(i - 1)) * vols(i).toDouble).toArray
    val k = 2.0 / 14.0
    val ema = new Array[Double](fis.length)
    fis.zipWithIndex.foreach { case (x, i) =>
      ema(i) = if (i == 0) x else x * k + ema(i - 1) * (1.0 - k) }
    got.zipWithIndex.foreach { case (r, i) =>
      def at(c: String) = Option(r.getAs[java.lang.Double](c)).map(_.doubleValue)
      assert(r.getAs[Long]("volume") == vols(i), s"vol@$i")
      assert(at("fi") == (if (i >= 1) Some(srd(fis(i - 1))) else None), s"fi@$i")
      assert(at("fi_ema13") ==
        (if (i >= 13) Some(srd(ema(i - 1))) else None), s"ema@$i")
    }
    // the sine dominates the drift early: smoothed force flips sign
    val live = got.flatMap(r =>
      Option(r.getAs[java.lang.Double]("fi_ema13")).map(_.doubleValue))
    assert(live.length == 30 - 13 && live.exists(_ > 0) && live.exists(_ < 0))
  }

  test("massIndex and kst replay driver walks on a crafted 120-session series") {
    import spark.implicits._
    def srd(x: Double) = BigDecimal(x * 1e6)
      .setScale(0, BigDecimal.RoundingMode.HALF_UP).toDouble / 1e6
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val n = 120
    val closes = (0 until n).map(i =>
      100.0 + i * 0.1 + 12.0 * math.sin(i * 0.12)).toArray
    val ranges = (0 until n).map(i =>
      0.5 + 0.4 * math.abs(math.sin(i * 0.7))).toArray
    val daily = (0 until n).map { i =>
      (5L, java.sql.Date.valueOf(
        java.time.LocalDate.of(2024, 1, 1).plusDays(i)),
        closes(i) + ranges(i) / 2.0, closes(i) - ranges(i) / 2.0, closes(i))
    }.toDF("user_id", "trade_date", "high_price", "low_price", "close_price")

    // --- mass index: double EMA-9 on the range, 25-session ratio sum
    val k9 = 2.0 / 10.0
    def emaArr(xs: Array[Double]): Array[Double] = {
      val o = new Array[Double](xs.length)
      xs.zipWithIndex.foreach { case (x, i) =>
        o(i) = if (i == 0) x else x * k9 + o(i - 1) * (1.0 - k9) }
      o
    }
    val rng = (0 until n).map(i =>
      (closes(i) + ranges(i) / 2.0) - (closes(i) - ranges(i) / 2.0)).toArray
    val (e1, e2) = (emaArr(rng), emaArr(emaArr(rng)))
    val ratios = (0 until n).map(i =>
      if (i >= 16 && e2(i) > 0) Some(srd(e1(i) / e2(i))) else None).toArray
    val gotM = Warehouse.massIndexOfDaily(daily).collect()
      .sortBy(_.getAs[java.sql.Date]("trade_date").getTime)
    gotM.zipWithIndex.foreach { case (r, i) =>
      def at(c: String) = Option(r.getAs[java.lang.Double](c)).map(_.doubleValue)
      assert(at("ratio") == ratios(i), s"ratio@$i")
      val mExp = if (i >= 40)
        Some(r6(ratios.slice(i - 24, i + 1).flatten.sum)) else None
      (at("mass_25"), mExp) match {
        case (Some(g), Some(e)) => assert(math.abs(g - e) <= 1e-6, s"mass@$i")
        case (g, e) => assert(g == e, s"mass null-ness@$i")
      }
    }
    assert(gotM.count(!_.isNullAt(gotM.head.fieldIndex("mass_25"))) == n - 40)

    // --- kst: integer-micros ROC/SMA blend
    def rocM(i: Int, h: Int): Option[Long] =
      if (i >= h) Some(BigDecimal((closes(i) / closes(i - h) - 1.0) * 100.0 * 1e6)
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong)
      else None
    def smaM(xs: IndexedSeq[Long], w: Int): Long =
      BigDecimal(xs.takeRight(w).sum.toDouble / w)
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    val gotK = Warehouse.kstOfDaily(daily).collect()
      .sortBy(_.getAs[java.sql.Date]("trade_date").getTime)
    val kstsM = new Array[Option[Long]](n)
    (0 until n).foreach { i =>
      def rc(h: Int, sw: Int, guard: Int): Option[Long] =
        if (i + 1 >= guard)
          Some(smaM((i - sw + 1 to i).map(j => rocM(j, h).get), sw))
        else None
      val (r1, r2, r3, r4) =
        (rc(10, 10, 20), rc(15, 10, 25), rc(20, 10, 30), rc(30, 15, 45))
      kstsM(i) = for (a <- r1; b <- r2; c <- r3; d <- r4)
        yield a + 2 * b + 3 * c + 4 * d
      val r = gotK(i)
      def at(c: String) = Option(r.getAs[java.lang.Double](c)).map(_.doubleValue)
      assert(at("rcma1") == r1.map(_.toDouble / 1e6), s"rcma1@$i")
      assert(at("rcma4") == r4.map(_.toDouble / 1e6), s"rcma4@$i")
      assert(at("kst") == kstsM(i).map(_.toDouble / 1e6), s"kst@$i")
      val sigExp = if (i + 1 >= 53)
        Some(smaM((i - 8 to i).map(j => kstsM(j).get), 9).toDouble / 1e6)
      else None
      assert(at("kst_signal") == sigExp, s"signal@$i")
    }
    // live coverage plus both signs on the oscillating series
    val liveK = gotK.flatMap(r =>
      Option(r.getAs[java.lang.Double]("kst")).map(_.doubleValue))
    assert(liveK.length == n - 44)
    assert(liveK.exists(_ > 0) && liveK.exists(_ < 0), "kst sign coverage")
  }

  test("coppock replays a driver walk on the crafted oscillating series") {
    import spark.implicits._
    val n = 120
    val closes = (0 until n).map(i =>
      100.0 + i * 0.1 + 12.0 * math.sin(i * 0.12)).toArray
    val daily = (0 until n).map { i =>
      (5L, java.sql.Date.valueOf(
        java.time.LocalDate.of(2024, 1, 1).plusDays(i)), closes(i))
    }.toDF("user_id", "trade_date", "close_price")
    def rocM(i: Int, h: Int): Option[Long] =
      if (i >= h) Some(BigDecimal((closes(i) / closes(i - h) - 1.0) * 100.0 * 1e6)
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong)
      else None
    val sm = (0 until n).map(i =>
      for (a <- rocM(i, 7); b <- rocM(i, 5)) yield a + b)
    val got = Warehouse.coppockOfDaily(daily).collect()
      .sortBy(_.getAs[java.sql.Date]("trade_date").getTime)
    assert(got.length == n)
    got.zipWithIndex.foreach { case (r, i) =>
      def at(c: String) = Option(r.getAs[java.lang.Double](c)).map(_.doubleValue)
      assert(at("roc_sum") == sm(i).map(_.toDouble / 1e6), s"roc_sum@$i")
      val exp = if (i + 1 >= 12)
        Some((0 to 4).map(j => (5 - j) * sm(i - j).get).sum.toDouble / 15e6)
      else None
      assert(at("coppock") == exp, s"coppock@$i")
    }
    // live coverage plus both signs on the oscillating series
    val live = got.flatMap(r =>
      Option(r.getAs[java.lang.Double]("coppock")).map(_.doubleValue))
    assert(live.length == n - 11)
    assert(live.exists(_ > 0) && live.exists(_ < 0), "coppock sign coverage")
  }

  test("sharpe equals a driver integer-micros moment walk") {
    val daily = driverDailyOhlc
    val got = Warehouse.sharpe(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r).toMap
    def sr6(x: Double) = BigDecimal(x * 1e6)
      .setScale(0, BigDecimal.RoundingMode.HALF_UP).toDouble / 1e6
    var kept = 0
    daily.foreach { case (uid, days) =>
      val cls = days.map(_._4)
      val rms = cls.indices.drop(1).map(i =>
        BigDecimal((cls(i) / cls(i - 1) - 1.0) * 1e6)
          .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong)
      if (rms.length < 15) assert(!got.contains(uid), s"$uid below floor")
      else {
        kept += 1
        val r = got(uid)
        val n = rms.length.toDouble
        val sr = rms.map(BigInt(_)).sum.toDouble
        val sr2 = rms.map(x => BigInt(x) * BigInt(x)).sum.toDouble
        val sn2 = rms.filter(_ < 0).map(x => BigInt(x) * BigInt(x))
          .sum.toDouble
        val mean = sr / n
        val varP = sr2 / n - mean * mean
        val ann = math.sqrt(252.0)
        def gd(c: String) =
          Option(r.getAs[java.lang.Double](c)).map(_.doubleValue)
        assert(r.getAs[Long]("n_days") == rms.length)
        assert(gd("ann_return").contains(sr6(mean * 252.0 / 1e6)), s"$uid ret")
        assert(gd("ann_vol").contains(sr6(math.sqrt(varP) * ann / 1e6)),
          s"$uid vol")
        val shExp = if (varP > 0.0) Some(sr6(ann * mean / math.sqrt(varP)))
          else None
        assert(gd("sharpe") == shExp, s"$uid sharpe")
        val soExp = if (sn2 > 0.0)
          Some(sr6(ann * mean / math.sqrt(sn2 / n))) else None
        assert(gd("sortino") == soExp, s"$uid sortino")
        // sortino >= sharpe in magnitude direction: downside-only
        // deviation can't exceed total deviation
        for (sh <- shExp; so <- soExp if mean > 0)
          assert(so >= sh, s"$uid sortino < sharpe on positive drift")
      }
    }
    assert(kept > 0 && kept == got.size)
  }

  test("choppiness equals a driver regime walk and stays in [0,100]") {
    val daily = driverDailyOhlc
    val got = Warehouse.choppiness(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getAs[java.sql.Date](1)) -> r).toMap
    assert(got.size == daily.values.map(_.length).sum)
    var live = 0
    daily.foreach { case (uid, days) =>
      val trs = days.indices.map { i =>
        val (_, hi, lo, _) = days(i)
        if (i == 0) r6(hi - lo)
        else {
          val pc = days(i - 1)._4
          r6(math.max(hi - lo, math.max(math.abs(hi - pc),
            math.abs(lo - pc))))
        }
      }
      days.zipWithIndex.foreach { case ((d, _, _, _), i) =>
        val r = got((uid, d))
        val chop = Option(r.getAs[java.lang.Double]("chop_14"))
          .map(_.doubleValue)
        if (i < 13) assert(chop.isEmpty, s"$uid/$d warmup")
        else {
          val sumTr = r6(trs.slice(i - 13, i + 1).sum)
          val rng = days.slice(i - 13, i + 1).map(_._2).max -
            days.slice(i - 13, i + 1).map(_._3).min
          val exp = if (rng > 0.0 && sumTr > 0.0)
            Some(r6(100.0 * math.log10(sumTr / rng) / math.log10(14.0)))
          else None
          assert(chop == exp, s"$uid/$d chop")
          // sum TR >= range by the triangle structure -> chop >= 0
          chop.foreach(c => assert(c >= 0.0 && c <= 100.0 + 1e-9))
          if (chop.isDefined) live += 1
        }
      }
    }
    assert(live > 0)
  }

  test("balanceOfPower equals a driver integer-micros walk") {
    def toM(x: Double) = BigDecimal(x * 1e6)
      .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    val daily = driverDailyOhlcFull
    val got = Warehouse.balanceOfPower(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getAs[java.sql.Date](1)) -> r).toMap
    assert(got.size == daily.values.map(_.length).sum)
    var live = 0
    daily.foreach { case (uid, days) =>
      val bopms = days.map { case (_, o, hi, lo, c) =>
        if (hi > lo) toM((c - o) / (hi - lo)) else 0L
      }
      days.zipWithIndex.foreach { case ((d, _, _, _, _), i) =>
        val r = got((uid, d))
        assert(r.getAs[Double]("bop") == bopms(i).toDouble / 1e6,
          s"$uid/$d bop")
        assert(math.abs(r.getAs[Double]("bop")) <= 1.0 + 1e-9)
        val sma = Option(r.getAs[java.lang.Double]("bop_sma_14"))
          .map(_.doubleValue)
        if (i < 13) assert(sma.isEmpty, s"$uid/$d warmup")
        else {
          val s = bopms.slice(i - 13, i + 1).sum
          val exp = BigDecimal(s.toDouble / 14.0)
            .setScale(0, BigDecimal.RoundingMode.HALF_UP).toDouble / 1e6
          assert(sma.contains(exp), s"$uid/$d sma")
          live += 1
        }
      }
    }
    assert(live > 0)
  }

  test("varEs reconciles with a driver tail walk; ES bounds VaR") {
    def toM(x: Double) = BigDecimal(x * 1e6)
      .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    val daily = driverDailyOhlc
    val got = Warehouse.varEs(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r).toMap
    var kept = 0
    daily.foreach { case (uid, days) =>
      val cls = days.map(_._4)
      val rms = cls.indices.drop(1).map(i => toM(cls(i) / cls(i - 1) - 1.0))
      if (rms.length < 15) assert(!got.contains(uid), s"$uid floor")
      else {
        kept += 1
        val r = got(uid)
        // interpolated 5% quantile over the exact micros
        val xs = rms.sorted.map(_.toDouble)
        val h = (xs.length - 1) * 0.05
        val qm = xs(h.toInt) + (h - h.toInt) *
          (xs(math.ceil(h).toInt) - xs(h.toInt))
        def r0(x: Double) = BigDecimal(x)
          .setScale(0, BigDecimal.RoundingMode.HALF_UP).toDouble / 1e6
        assert(r.getAs[Long]("n_days") == rms.length)
        assert(r.getAs[Double]("var_5") == r0(qm), s"$uid var")
        val tail = rms.filter(_.toDouble <= qm)
        assert(r.getAs[Long]("n_tail") == tail.length, s"$uid tail n")
        assert(tail.nonEmpty, s"$uid empty tail")
        assert(r.getAs[Double]("es_5") ==
          r0(tail.sum.toDouble / tail.length), s"$uid es")
        // coherence: the tail mean cannot beat the tail threshold
        assert(r.getAs[Double]("es_5") <= r.getAs[Double]("var_5") + 1e-9,
          s"$uid ES above VaR")
      }
    }
    assert(kept > 0 && kept == got.size)
  }

  test("streaks reconcile with a driver run-length walk") {
    def toM(x: Double) = BigDecimal(x * 1e6)
      .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    val daily = driverDailyOhlc
    val got = Warehouse.streaks(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r).toMap
    daily.foreach { case (uid, days) =>
      val cls = days.map(_._4)
      val sgs = cls.indices.drop(1)
        .map(i => math.signum(toM(cls(i) / cls(i - 1) - 1.0).toDouble).toInt)
      if (sgs.isEmpty) assert(!got.contains(uid))
      else {
        // driver run-length decomposition
        val runs = sgs.foldLeft(List.empty[(Int, Int)]) {
          case ((s, l) :: t, x) if s == x => (s, l + 1) :: t
          case (acc, x) => (x, 1) :: acc
        }
        val r = got(uid)
        def mx(s: Int) =
          runs.filter(_._1 == s).map(_._2).maxOption.getOrElse(0).toLong
        assert(r.getAs[Long]("max_up_streak") == mx(1), s"$uid up")
        assert(r.getAs[Long]("max_down_streak") == mx(-1), s"$uid down")
        assert(r.getAs[Long]("n_up_runs") == runs.count(_._1 == 1))
        assert(r.getAs[Long]("n_down_runs") == runs.count(_._1 == -1))
        assert(r.getAs[Long]("n_runs") == runs.length)
        assert(r.getAs[Long]("n_sessions") == sgs.length)
        val exp = BigDecimal(sgs.length.toDouble / runs.length * 1e6)
          .setScale(0, BigDecimal.RoundingMode.HALF_UP).toDouble / 1e6
        assert(r.getAs[Double]("mean_run_len") == exp, s"$uid mean")
        // islands partition the sessions: run masses reconcile
        assert(runs.map(_._2).sum == sgs.length)
      }
    }
    assert(got.nonEmpty)
  }

  test("amihud reconciles with a driver impact-per-dollar recount") {
    def toM(x: Double) = BigDecimal(x * 1e6)
      .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    val kRe = """"k"\s*:\s*(\d+)""".r
    // per (symbol, day): exact dollar volume from positive-volume ticks
    val dv = Tables.events(spark, sfDir)
      .filter("value IS NOT NULL AND value > 0 AND NOT isnan(value)" +
        " AND user_id IS NOT NULL").collect()
      .flatMap { r =>
        val vol = Option(r.getAs[String]("props"))
          .flatMap(p => kRe.findFirstMatchIn(p)).map(_.group(1).toLong)
          .getOrElse(0L)
        if (vol <= 0) None
        else Some(((r.getAs[Long]("user_id"),
          java.sql.Date.valueOf(r.getAs[java.sql.Timestamp]("ts")
            .toLocalDateTime.toLocalDate)),
          BigInt(toM(r.getAs[Double]("value"))) * vol))
      }
      .groupBy(_._1).map { case (k, g) => k -> g.map(_._2).sum }
    val daily = driverDailyOhlc
    val got = Warehouse.amihud(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r).toMap
    var kept = 0
    daily.foreach { case (uid, days) =>
      val cls = days.map(_._4)
      val ratios = days.indices.drop(1).flatMap { i =>
        val rm = toM(cls(i) / cls(i - 1) - 1.0)
        dv.get((uid, days(i)._1)).filter(_ > 0).map { m =>
          val dollars = m.toDouble / 1e6
          (math.abs(rm).toDouble / 1e6 / dollars, dollars)
        }
      }
      if (ratios.length < 5) assert(!got.contains(uid), s"$uid floor")
      else {
        kept += 1
        val r = got(uid)
        assert(r.getAs[Long]("n_days") == ratios.length)
        assert(math.abs(r.getAs[Double]("illiq") -
          ratios.map(_._1).sum / ratios.length * 1e6) <= 1e-5,
          s"$uid illiq")
        assert(r.getAs[Double]("illiq") >= 0.0)
        assert(math.abs(r.getAs[Double]("avg_dollar_vol") -
          ratios.map(_._2).sum / ratios.length) <= 1e-4, s"$uid advol")
      }
    }
    assert(kept > 0 && kept == got.size)
  }

  test("weekdayReturns reconciles with a driver seasonality recount") {
    def toM(x: Double) = BigDecimal(x * 1e6)
      .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    val daily = driverDailyOhlc
    val got = Warehouse.weekdayReturns(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getAs[Long]("weekday")) -> r).toMap
    var totalSessions = 0L
    daily.foreach { case (uid, days) =>
      val byWd = days.indices.drop(1).map { i =>
        val wd = ((days(i)._1.toLocalDate.toEpochDay + 3) % 7) + 1
        (wd, toM(days(i)._4 / days(i - 1)._4 - 1.0))
      }.groupBy(_._1)
      byWd.foreach { case (wd, rs) =>
        val r = got((uid, wd))
        assert(r.getAs[Long]("n_days") == rs.length, s"$uid/$wd n")
        assert(r.getAs[Long]("up_days") == rs.count(_._2 > 0), s"$uid/$wd up")
        val exp = BigDecimal(rs.map(_._2).sum.toDouble / rs.length)
          .setScale(0, BigDecimal.RoundingMode.HALF_UP).toDouble / 1e6
        assert(r.getAs[Double]("avg_ret") == exp, s"$uid/$wd avg")
        totalSessions += rs.length
        // the epoch arithmetic lands on real weekdays
        assert(wd >= 1 && wd <= 7)
      }
    }
    // coverage: every (symbol, weekday) group is present exactly once
    assert(got.size == daily.map { case (_, days) =>
      days.indices.drop(1)
        .map(i => ((days(i)._1.toLocalDate.toEpochDay + 3) % 7) + 1)
        .distinct.size
    }.sum)
    assert(totalSessions == got.values.map(_.getAs[Long]("n_days")).sum)
  }

  test("kama equals a driver adaptive-smoothing walk") {
    def srd(x: Double) = BigDecimal(x * 1e6)
      .setScale(0, BigDecimal.RoundingMode.HALF_UP).toDouble / 1e6
    val daily = driverDailyOhlc
    val got = Warehouse.kama(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getAs[java.sql.Date](1)) -> r).toMap
    assert(got.size == daily.values.map(_.length).sum)
    var live = 0
    daily.foreach { case (uid, days) =>
      val cls = days.map(_._4)
      val deltas = cls.indices.map(i =>
        if (i == 0) Double.NaN else r6(math.abs(cls(i) - cls(i - 1))))
      val ers = cls.indices.map { i =>
        if (i < 10) None
        else {
          val vol = r6(deltas.slice(i - 9, i + 1).sum)
          val chg = r6(math.abs(cls(i) - cls(i - 10)))
          Some(if (vol > 0.0) r6(chg / vol) else 0.0)
        }
      }
      var kama = 0.0
      days.zipWithIndex.foreach { case ((d, _, _, _), i) =>
        val r = got((uid, d))
        def gd(c: String) =
          Option(r.getAs[java.lang.Double](c)).map(_.doubleValue)
        assert(gd("er") == ers(i), s"$uid/$d er")
        ers(i).foreach(e => assert(e >= 0.0 && e <= 1.0 + 1e-9))
        if (i < 10 || cls.length < 11)
          assert(gd("kama").isEmpty, s"$uid/$d warmup")
        else {
          if (i == 10) kama = cls(10)
          else {
            val x = ers(i).get * (2.0 / 3.0 - 2.0 / 31.0) + 2.0 / 31.0
            kama = kama + x * x * (cls(i) - kama)
          }
          assert(gd("kama").contains(srd(kama)), s"$uid/$d kama")
          live += 1
        }
      }
    }
    assert(live > 0)
  }

  test("ulcerIndex equals a driver windowed-drawdown walk") {
    val daily = driverDailyOhlc
    val got = Warehouse.ulcerIndex(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getAs[java.sql.Date](1)) -> r).toMap
    assert(got.size == daily.values.map(_.length).sum)
    var live = 0
    daily.foreach { case (uid, days) =>
      val cls = days.map(_._4)
      val ddms = cls.indices.map { i =>
        val mx = cls.slice(math.max(0, i - 13), i + 1).max
        BigDecimal((cls(i) / mx - 1.0) * 100.0 * 1e6)
          .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
      }
      days.zipWithIndex.foreach { case ((d, _, _, _), i) =>
        val r = got((uid, d))
        val dd = r.getAs[Double]("pct_dd")
        assert(dd == ddms(i).toDouble / 1e6, s"$uid/$d dd")
        assert(dd <= 0.0 && dd >= -100.0, s"$uid/$d dd bounds")
        val u = Option(r.getAs[java.lang.Double]("ulcer_14"))
          .map(_.doubleValue)
        if (i < 13) assert(u.isEmpty, s"$uid/$d warmup")
        else {
          val s2 = ddms.slice(i - 13, i + 1).map(x => x * x).sum
          assert(u.contains(math.sqrt(s2.toDouble / 14.0) / 1e6),
            s"$uid/$d ulcer")
          assert(u.get >= 0.0)
          live += 1
        }
      }
    }
    assert(live > 0)
  }

  test("moneyFlow equals a driver-side integer-micros walk") {
    def srd(x: Double) = BigDecimal(x * 1e6)
      .setScale(0, BigDecimal.RoundingMode.HALF_UP).toDouble / 1e6
    def toMicros(x: Double) = BigDecimal(x)
      .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    def r4(x: Double) = BigDecimal(x)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val kRe = """"k"\s*:\s*(\d+)""".r
    val daily = Tables.events(spark, sfDir)
      .filter("value IS NOT NULL AND value > 0 AND NOT isnan(value)" +
        " AND user_id IS NOT NULL").collect()
      .map { r =>
        val vol = Option(r.getAs[String]("props"))
          .flatMap(p => kRe.findFirstMatchIn(p)).map(_.group(1).toLong)
          .getOrElse(0L)
        (r.getAs[Long]("user_id"),
          java.sql.Date.valueOf(r.getAs[java.sql.Timestamp]("ts")
            .toLocalDateTime.toLocalDate),
          r.getAs[java.sql.Timestamp]("ts").getTime,
          r.getAs[Long]("event_id"), r.getAs[Double]("value"), vol)
      }
      .groupBy(t => (t._1, t._2)).toSeq
      .map { case ((uid, d), g) =>
        (uid, d, r4(g.map(_._5).max), r4(g.map(_._5).min),
          g.maxBy(t => (t._3, t._4))._5, g.map(_._6).sum)
      }
    val got = Warehouse.moneyFlow(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getAs[java.sql.Date](1)) -> r).toMap
    assert(got.size == daily.size)
    var mfiSeen = 0
    daily.groupBy(_._1).foreach { case (uid, g) =>
      val days = g.sortBy(_._2.getTime)
      val tpms = days.map { case (_, _, hi, lo, cls, _) =>
        toMicros((hi + lo + cls) / 3.0 * 1e6) }
      val flows = days.indices.map { i =>
        val mf = tpms(i) * days(i)._6
        if (i == 0) (0L, 0L)
        else if (tpms(i) > tpms(i - 1)) (mf, 0L)
        else if (tpms(i) < tpms(i - 1)) (0L, mf)
        else (0L, 0L)
      }
      var adm = 0L
      days.zipWithIndex.foreach { case ((_, d, hi, lo, cls, vol), i) =>
        val r = got((uid, d))
        assert(r.getAs[Long]("volume") == vol, s"$uid/$d vol")
        val win = flows.slice(math.max(0, i - 13), i + 1)
        val (pos, neg) = (win.map(_._1).sum, win.map(_._2).sum)
        val expMfi =
          if (i >= 14 && pos + neg > 0) Some(srd(100.0 * pos / (pos + neg)))
          else None
        assert(Option(r.getAs[java.lang.Double]("mfi")).map(_.toDouble)
          == expMfi, s"$uid/$d mfi")
        if (expMfi.isDefined) mfiSeen += 1
        val multm =
          if (hi > lo) toMicros(((cls - lo) - (hi - cls)) / (hi - lo) * 1e6)
          else 0L
        adm += multm * vol
        assert(r.getAs[Double]("ad_line") == adm / 1e6, s"$uid/$d ad")
      }
    }
    assert(mfiSeen > 0, "corpus must exercise live MFI rows")
  }

  test("obv equals a driver-side signed-volume walk") {
    val kRe = """"k"\s*:\s*(\d+)""".r
    val daily = Tables.events(spark, sfDir)
      .filter("value IS NOT NULL AND value > 0 AND NOT isnan(value)" +
        " AND user_id IS NOT NULL").collect()
      .map { r =>
        val vol = Option(r.getAs[String]("props"))
          .flatMap(p => kRe.findFirstMatchIn(p)).map(_.group(1).toLong)
          .getOrElse(0L)
        (r.getAs[Long]("user_id"),
          java.sql.Date.valueOf(r.getAs[java.sql.Timestamp]("ts")
            .toLocalDateTime.toLocalDate),
          r.getAs[java.sql.Timestamp]("ts").getTime,
          r.getAs[Long]("event_id"), r.getAs[Double]("value"), vol)
      }
      .groupBy(t => (t._1, t._2)).toSeq
      .map { case ((uid, d), g) =>
        (uid, d, g.maxBy(t => (t._3, t._4))._5, g.map(_._6).sum)
      }
    val got = Warehouse.obv(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getAs[java.sql.Date](1)) -> r).toMap
    assert(got.size == daily.size)
    daily.groupBy(_._1).foreach { case (uid, g) =>
      val days = g.sortBy(_._2.getTime)
      var run = 0L
      days.zipWithIndex.foreach { case ((_, d, close, vol), i) =>
        val signed =
          if (i == 0) 0L
          else if (close > days(i - 1)._3) vol
          else if (close < days(i - 1)._3) -vol
          else 0L
        run += signed
        val r = got((uid, d))
        assert(r.getAs[Double]("close_price") == close, s"$uid/$d close")
        assert(r.getAs[Long]("volume") == vol, s"$uid/$d volume")
        assert(r.getAs[Long]("signed_vol") == signed, s"$uid/$d signed")
        assert(r.getAs[Long]("obv") == run, s"$uid/$d obv")
      }
    }
  }

  test("beta: equal-weight market recovers cov/var driver-side; corr bounded") {
    import org.apache.spark.sql.functions._
    val rets = Warehouse.validateTicks(spark, sfDir)
      .groupBy(col("user_id"), to_date(col("ts")).as("d"))
      .agg(max_by(col("value"), struct(col("ts"), col("event_id"))).as("c"))
      .collect().map(r => (r.getLong(0), r.getDate(1), r.getDouble(2)))
      .groupBy(_._1).toSeq.flatMap { case (uid, g) =>
        val days = g.sortBy(_._2.getTime)
        days.sliding(2).collect { case Array((_, _, p), (_, d, c)) =>
          (uid, d, c / p - 1.0)
        }
      }
    def r12(x: Double) = BigDecimal(x)
      .setScale(12, BigDecimal.RoundingMode.HALF_UP).toDouble
    val mret = rets.groupBy(_._2).map { case (d, g) =>
      d -> r12(g.map(_._3).sum / g.length)
    }
    val expected = rets.groupBy(_._1).collect {
      case (uid, g) if g.length >= 15 =>
        val xs = g.map(_._3); val ys = g.map(t => mret(t._2))
        val mx = xs.sum / xs.length; val my = ys.sum / ys.length
        val cov = xs.zip(ys).map { case (x, y) => (x - mx) * (y - my) }.sum / xs.length
        val vy = ys.map(y => (y - my) * (y - my)).sum / ys.length
        uid -> (g.length.toLong, cov / vy)
    }
    val got = Warehouse.beta(spark, sfDir).collect()
    assert(got.length == expected.size && got.nonEmpty)
    got.foreach { r =>
      val (n, beta) = expected(r.getLong(0))
      assert(r.getAs[Long]("n_days") == n)
      assert(math.abs(r.getAs[Double]("beta") - beta) <= 2e-6,
        s"symbol ${r.getLong(0)} beta")
      val c = r.getAs[Double]("corr_mkt")
      assert(c >= -1.0 && c <= 1.0)
    }
  }
}
