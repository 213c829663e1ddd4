package graft

import graft.operators.{Forecast, Indicators, Relational, TextOps}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FormattedMode

/** Physical-plan assertions: the properties that make these plans
  * survive a 100 TB / 1000-executor scale-up must hold structurally,
  * not just by luck of the current data size.
  */
class PlanSpec extends SparkSuite {

  private def formatted(df: DataFrame): String =
    df.queryExecution.explainString(FormattedMode)

  private def exchanges(df: DataFrame): Int =
    "Exchange".r.findAllIn(df.queryExecution.executedPlan.toString).length

  test("q1_agg pushes the shipdate filter and prunes columns at the scan") {
    val plan = formatted(Relational.q1Agg(spark, sfDir))
    assert(plan.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"),
      "filter not pushed to parquet")
    assert(!plan.contains("l_orderkey"), "unused columns not pruned from scan")
  }

  test("q5_multijoin broadcasts every dimension side") {
    val plan = formatted(Relational.q5MultiJoin(spark, sfDir))
    val broadcasts = "BroadcastHashJoin".r.findAllIn(plan).length
    assert(broadcasts >= 3, s"expected >=3 broadcast joins, got $broadcasts")
  }

  test("analyticsFull computes all indicators with a single key shuffle") {
    // one Exchange for the user_id window partitioning; the EMA/MACD
    // recurrence and final sort must not re-shuffle the data
    val n = exchanges(Indicators.analyticsFull(spark, sfDir))
    assert(n <= 2, s"expected <=2 exchanges before AQE, got $n")
  }

  test("alerts is single-pass (no union recompute of the window stage)") {
    // one key shuffle + one output-determinism sort; a union of filters
    // would double the window stage (measured 3+ exchanges)
    val n = exchanges(Indicators.alerts(spark, sfDir))
    assert(n <= 2, s"expected <=2 exchanges, got $n")
  }

  test("date-partitioned layout prunes partitions at the scan") {
    import org.apache.spark.sql.functions._
    val tmp = java.nio.file.Files.createTempDirectory("part_events").toString
    Tables.events(spark, sfDir)
      .withColumn("trade_date", to_date(col("ts")))
      .write.partitionBy("trade_date").parquet(s"$tmp/events_by_day")
    val oneDay = spark.read.parquet(s"$tmp/events_by_day")
      .filter(col("trade_date") === "2024-01-05")
    val scan = formatted(oneDay)
    assert(scan.contains("PartitionFilters") &&
      scan.contains("trade_date"), "partition filter not recognized")
    // only one partition directory is actually read
    val allDays = Tables.events(spark, sfDir)
      .select(to_date(col("ts"))).distinct().count()
    val prunedFiles = oneDay.queryExecution.executedPlan.collectLeaves()
      .head.metrics.get("numFiles")
    oneDay.count() // materialize to populate metrics
    prunedFiles.foreach(m => assert(m.value < allDays,
      s"expected pruning to < $allDays partitions, read ${m.value} files"))
  }

  test("compute-heavy exchanges keep the session parallelism under AQE") {
    // round-13 optimization pin: the indicator window stage and the
    // per-key fit harness repartition with an EXPLICIT count (session
    // shuffle parallelism) so AQE's byte-based coalescing cannot fold
    // ~1500 CPU-heavy per-symbol runs into a handful of tasks. The
    // output partition count survives to the final plan exactly when
    // the pin is in place — a regression to keyless/implicit
    // repartitioning re-coalesces and fails here.
    val parts = spark.conf.get("spark.sql.shuffle.partitions").toInt
      .max(spark.sparkContext.defaultParallelism)
    assert(Indicators.analyticsFull(spark, sfDir).rdd.getNumPartitions
      == parts, "indicator window exchange lost its explicit width")
    assert(Forecast.arimaForecast(spark, sfDir).rdd.getNumPartitions
      == parts, "perKeyTicks fit exchange lost its explicit width")
  }

  test("text operators are shuffle-free narrow scans") {
    assert(exchanges(TextOps.tokenCount(spark, sfDir).limit(10)) == 0)
    // the KERNEL is the streamable narrow surface; the dir-based batch
    // entry adds exactly one round-robin balancing exchange because the
    // test corpus is a single-row-group (unsplittable) parquet file
    assert(exchanges(TextOps.qualityScoreDocs(
      Tables.documents(spark, sfDir)).limit(10)) == 0)
    assert(exchanges(TextOps.qualityScore(spark, sfDir).limit(10)) == 1)
  }

  test("full gopher chain is a shuffle-free narrow projection") {
    val chain = graft.operators.Curation
      .gopherChainDocs(Tables.documents(spark, sfDir))
    assert(exchanges(chain) == 0, "chain must stay narrow (streamable)")
  }

  test("returnCorr pair join is keyed on the bucket tiles, not dates") {
    // a date-keyed pair join caps the stage at #distinct dates tasks
    // (30 here) and materializes symbols²-row pair-date blocks — the
    // tile bucketing must reach the shuffle as the join key, and the
    // pair-date blow-up must not appear anywhere in the plan. At test
    // SF the symbol side is broadcast-sized, which would hide the
    // shuffle: disable auto-broadcast to see the at-scale join plan.
    val thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val plan = formatted(graft.operators.Warehouse.returnCorr(spark, sfDir))
      val part = "hashpartitioning\\(([^)]*)\\)".r
        .findAllMatchIn(plan).map(_.group(1)).toSeq
      assert(part.exists(k => k.contains("ab") && k.contains("bb")
          && !k.contains("trade_date")),
        s"pair shuffle not keyed by the symbol-bucket tiles: $part")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thresh)
  }

  test("returnCorr keeps the pair merge out of join conditions and filters") {
    // the expensive per-pair sorted-merge (PairCorr) must live ONLY in
    // the projection: a .filter() on any value derived from it gets
    // pushed into the tile-join CONDITION with the expression inlined
    // per conjunct term, and join-condition codegen does no common-
    // subexpression elimination — measured at sf0.1 as NINE merge
    // evaluations per candidate row (6.4 s of an 8 s query). The
    // NULL-fold + post-limit cut shape this pins is what keeps it to
    // one evaluation.
    val thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val plan = graft.operators.Warehouse.returnCorr(spark, sfDir)
        .queryExecution.executedPlan.toString
      val offending = plan.linesIterator.filter(l =>
        (l.contains("Join") || l.contains("Filter")) &&
          l.toLowerCase.contains("paircorr")).toSeq
      assert(offending.isEmpty,
        s"pair merge leaked into join/filter nodes:\n${offending.mkString("\n")}")
      assert(plan.toLowerCase.contains("paircorr"),
        "pair merge missing from the plan entirely — did the query change?")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thresh)
  }

  test("returnCorr tile count tunes parallelism, never values") {
    // the adaptive default must agree with ANY explicit bucket count:
    // every pair meets in exactly one tile regardless, so the knob is
    // free to scale ∝ symbols at a 100× universe
    val rets = graft.operators.Warehouse.dailyReturnsOf(
      graft.operators.Warehouse.validTicks(spark, sfDir))
    val auto = graft.operators.Warehouse.returnCorrOf(rets)
      .collect().map(_.toString).toSeq
    for (b <- Seq(1, 3, 8)) {
      val explicit = graft.operators.Warehouse.returnCorrOf(rets, bucketsIn = b)
        .collect().map(_.toString).toSeq
      assert(explicit == auto, s"buckets=$b changed the result")
    }
  }

  test("annLsh candidate lookup is a hash join on the bucket code") {
    // the multiprobe expansion must reach the corpus as an equi-join
    // key — a BroadcastNestedLoopJoin here is the scan-per-probe
    // regression the round-3 rewrite removed
    val plan = formatted(graft.operators.Similarity.annLsh(spark, sfDir))
    assert(plan.contains("BroadcastHashJoin"), "expected a code-key hash join")
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      "probe lookup degraded to a nested-loop corpus scan")
  }

  test("modelReadiness pushes tick validation to the parquet scan") {
    val plan = formatted(graft.operators.Forecast.modelReadiness(spark, sfDir))
    assert(plan.contains("PushedFilters") && plan.contains("GreaterThan(value,0.0)"),
      "validity predicate not pushed to the scan")
  }

  test("incremental fold: broadcast relabel, standing tables never reshuffled") {
    // updateComponents / updateCanonical's scale contract, pinned so a
    // refactor that reintroduces an O(corpus) exchange on a standing
    // artifact (caught by hand in round 7, commit 59e69c8) fails here
    // instead: the relabel join is a BROADCAST of the batch-bounded
    // mapping, the standing labels feed the output exactly once (the
    // batch lookup is checkpointed away), and no shuffle exchange sits
    // above either standing table's scan. Standing tables are staged
    // as parquet so their scans are identifiable in the plan; AQE is
    // disabled so the planned tree is the asserted tree.
    import graft.operators.Dedup
    import spark.implicits._
    val aqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val tmp = java.nio.file.Files.createTempDirectory("incrplan").toString
      Seq.tabulate(1000)(i => (i.toLong, (i % 100).toLong)).toDF("id", "label")
        .write.parquet(s"$tmp/standing_labels")
      Seq.tabulate(1000)(i =>
          (i.toLong, (i % 100).toLong, (i % 100).toLong, i < 100))
        .toDF("doc_id", "cluster_id", "canonical_id", "is_canonical")
        .write.parquet(s"$tmp/standing_canon")
      val standing = spark.read.parquet(s"$tmp/standing_labels")
      val standingCanon = spark.read.parquet(s"$tmp/standing_canon")
      val scores = Seq.tabulate(1100)(i => (i.toLong, i.toDouble))
        .toDF("doc_id", "score")
      val (labels, touched) = Dedup.updateComponentsDetailed(standing,
        Seq(2000L, 2001L).toDF("id"),
        Seq((2000L, 1L), (2000L, 2001L)).toDF("src", "dst"))
      val canon = Dedup.updateCanonical(standingCanon, labels, touched, scores)
      def shufflesOver(df: DataFrame, marker: String): Int =
        df.queryExecution.executedPlan.collect {
          case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
            if e.child.toString.contains(marker) => e
        }.size
      val labelsPlan = labels.queryExecution.executedPlan.toString
      assert("standing_labels".r.findAllIn(labelsPlan).length == 1,
        "standing labels must feed the fold output exactly once")
      assert(labelsPlan.contains("BroadcastHashJoin"),
        "relabel must be a broadcast join of the mapping")
      assert(shufflesOver(labels, "standing_labels") == 0,
        "fold must not reshuffle the standing labels")
      assert(shufflesOver(canon, "standing_canon") == 0,
        "canonical fold must not reshuffle the standing canonical " +
          "(the round-7 regression class)")
      assert(canon.queryExecution.executedPlan.toString
          .contains("BroadcastHashJoin"),
        "carried leg must consult the standing canonical via broadcast")
    } finally spark.conf.set("spark.sql.adaptive.enabled", aqe)
  }

  test("tfidf scans the corpus once (df from the tf table, no self-join)") {
    // df comes from a window over the tf aggregate, not a rescan per
    // join side (the join formulation measured 4 corpus scans)
    val plan = TextOps.tfidf(spark, sfDir).queryExecution.executedPlan.toString
    val scans = "Scan parquet".r.findAllIn(plan).length
    assert(scans == 1, s"expected one documents scan in the scored plan, got $scans")
  }

  test("shardOrder ranks inside shard partitions, never a global window") {
    // the epoch-order window must exchange on hashpartitioning(shard)
    // — a SinglePartition window here would serialize the corpus
    // through one task at 100 TB (the ntile-style global-rank trap
    // the scaladoc warns about)
    val df = graft.operators.Curation.shardOrder(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString
    val windowParts = "Window ".r.findAllIn(plan).length
    assert(windowParts >= 1, "expected a window node")
    assert(plan.contains("hashpartitioning(shard"),
      "rank window is not hash-partitioned on shard")
    assert(!plan.contains("SinglePartition"),
      "a single-partition exchange reached the shard-order plan")
  }

  test("dsirResample selects via distributed top-k, never a global sort") {
    // the Gumbel draw must be TakeOrderedAndProject (per-partition
    // k-row heaps + driver merge); a global Sort feeding a Limit (or
    // a SinglePartition rank window) would serialize the corpus
    // through one task at 100 TB
    val plan = graft.operators.Curation.dsirResample(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"expected TakeOrderedAndProject in:\n$plan")
    assert(!plan.contains("SinglePartition"),
      "a single-partition exchange reached the resample plan")
  }

  test("data splits are projections; the cluster variant adds one keyed join") {
    // q_data_split: pure per-row work — zero exchanges besides the
    // oracle-determinism sort
    val split = graft.operators.Curation.dataSplit(spark, sfDir)
    val n = exchanges(split.limit(1))
    assert(n <= 1, s"dataSplit should not shuffle (got $n exchanges)")
    // q_data_split_cluster: the rep-bucket leg joins on the canonical
    // key; the standing canonical side must NOT be re-sorted through
    // a single partition
    val plan = graft.operators.Curation.dataSplitCluster(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!plan.replaceAll("(?s)TakeOrderedAndProject.*", "")
      .contains("SinglePartition"),
      "a single-partition exchange reached the cluster-split plan")
  }

  test("histogram-style reports aggregate partially and broadcast totals") {
    // q_doc_length_hist: the corpus collapses map-side into a ~60-cell
    // agg; the corpus-total denominator is a window over the
    // AGGREGATED hist, so the plan scans the corpus EXACTLY once and
    // joins nothing (the old agg+broadcast-join shape re-evaluated
    // the hist subtree — two parquet scans unless AQE reused the
    // exchange)
    val hplan = TextOps.docLengthHist(spark, sfDir)
      .queryExecution.executedPlan.toString
    val hscans = "Scan parquet".r.findAllIn(hplan).length
    assert(hscans == 1,
      s"doc-length hist must scan the corpus exactly once (got $hscans scans)")
    assert(!hplan.contains("Join"), "doc-length hist must not join")
    // q_embedding_quality: zero joins — the countDistinct(dim) costs
    // a (label, dim) → label re-agg round on top of the keyed agg and
    // the output sort, but every exchange sits ABOVE a map-side
    // partial agg: what shuffles is labels×dims cells, never vectors
    val eq = graft.operators.Similarity.embeddingQuality(spark, sfDir)
    val n = exchanges(eq)
    assert(n <= 3, s"embeddingQuality grew extra exchanges (got $n)")
    assert(!eq.queryExecution.executedPlan.toString.contains("Join"),
      "embeddingQuality must not join")
  }

  test("daily-series analytics reuse one symbol partitioning; beta broadcasts") {
    import graft.operators.Warehouse
    // stochastic / ATR: the OHLC base is a partial AGGREGATE (map-
    // side combine — shuffles (symbol, day) partials, never ticks;
    // no tick-level open/close window), then the day rows re-key on
    // user_id for the indicator windows — two bounded hash exchanges,
    // both moving day-sized rows, no join
    for ((name, df) <- Seq(
        "stochastic" -> Warehouse.stochastic(spark, sfDir),
        "atr" -> Warehouse.atr(spark, sfDir),
        "vortex" -> Warehouse.vortex(spark, sfDir),
        "ultimate" -> Warehouse.ultimate(spark, sfDir),
        "cmo" -> Warehouse.cmo(spark, sfDir))) {
      val plan = df.queryExecution.executedPlan.toString
      val hashEx = "hashpartitioning".r.findAllIn(plan).length
      assert(hashEx <= 2, s"$name must keep two bounded shuffles, got $hashEx")
      // (min_by/open is column-pruned away here — these consumers
      // only read high/low/close, and the kernel lets Catalyst prune)
      assert(plan.contains("partial_max_by"),
        s"$name OHLC base must combine map-side (max_by partials)")
      assert(!plan.contains("unboundedfollowing"),
        s"$name must not window-sort ticks for open/close")
      assert(!plan.contains("Join"), s"$name must not join")
    }
    // vwap: one partial aggregate — map-side combine, no join, and
    // the validation predicate reaches the parquet scan
    val vw = Warehouse.vwap(spark, sfDir)
    val vwf = formatted(vw)
    assert(exchanges(vw) <= 2,
      s"vwap must be one agg exchange + range sort, got ${exchanges(vw)}")
    assert(!vwf.contains("Join"), "vwap must not join")
    assert(vwf.contains("PushedFilters: [IsNotNull(value)"),
      "tick validation not pushed to the vwap scan")
    // beta: the dates-sized market factor joins back as a broadcast —
    // the returns table must never sort-merge against it
    val bplan = Warehouse.beta(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(bplan.contains("BroadcastHashJoin"),
      "market factor must broadcast")
    assert(!bplan.contains("SortMergeJoin"),
      "beta must not sort-merge-join the returns")
  }

  test("round-9 reports keep their scale shapes") {
    // q_decontaminate_frac: the eval-membership probe must broadcast
    // (the corpus-scale gram stream never shuffles for the test) and
    // the gram stream must not sort-merge-join anything
    val frac = graft.operators.Curation.decontaminateFrac(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(frac.contains("BroadcastHashJoin"),
      "eval-gram membership must be a broadcast join")
    // q_c4_filters: a pure per-row projection — no hash exchange at
    // all, only the output-determinism range sort
    val c4 = graft.operators.Curation.c4Filters(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!c4.contains("hashpartitioning"),
      "c4Filters must not shuffle (pure projection)")
    assert(!c4.contains("Join"), "c4Filters must not join")
    // q_vocab_stats: the persisted vocab-sized count table serves all
    // three consumers (masses, top word, zipf fold) — each must read
    // the cache, not rebuild the corpus scan (the parquet child
    // printed INSIDE the InMemoryRelation is build-once)
    val vs = TextOps.vocabStats(spark, sfDir)
      .queryExecution.executedPlan.toString
    val cacheReads = "InMemoryTableScan".r.findAllIn(vs).length
    assert(cacheReads >= 3,
      s"vocabStats consumers must share the cached count table, got $cacheReads")
    // q_token_drift: single lineage — exactly one corpus scan feeds
    // the stacked vocab-table windows. Another suite's persisted
    // vocab table can substitute into this plan as an
    // InMemoryRelation whose PRINTED body carries its own parquet
    // scan line (a build-once cache, not a second scan) — clear the
    // shared-session cache so the assertion sees tokenDrift's own
    // lineage regardless of suite order.
    spark.catalog.clearCache()
    val td = TextOps.tokenDrift(spark, sfDir)
      .queryExecution.executedPlan.toString
    val tdScans = "Scan parquet".r.findAllIn(td).length
    assert(tdScans == 1,
      s"tokenDrift must scan the corpus exactly once, got $tdScans")
    // q_anomaly_ticks: the symbol-sized median/MAD models join back
    // as broadcasts — the tick stream itself never shuffles
    val anom = graft.operators.Warehouse.anomalyTicks(spark, sfDir)
      .queryExecution.executedPlan.toString
    val bcasts = "BroadcastHashJoin".r.findAllIn(anom).length
    assert(bcasts >= 2, s"expected med+mad broadcast joins, got $bcasts")
    assert(!anom.contains("SortMergeJoin"),
      "anomalyTicks must not sort-merge-join the tick stream")
    // q_drawdown: everything above the daily-close aggregate moves
    // symbol×days rows — bounded exchange count, no join at all
    val dd = graft.operators.Warehouse.drawdown(spark, sfDir)
    assert(exchanges(dd) <= 4,
      s"drawdown grew extra exchanges (got ${exchanges(dd)})")
    assert(!dd.queryExecution.executedPlan.toString.contains("Join"),
      "drawdown must not join")
  }

  test("late-round indicators keep the daily-tier shapes") {
    import graft.operators.Warehouse
    // window tier (cci/aroon/momentum/ichimoku): the partial OHLC
    // aggregate + one symbol re-key for the windows — two bounded
    // day-row exchanges, map-side combine at the base, no join
    for ((name, df) <- Seq(
        "cci" -> Warehouse.cci(spark, sfDir),
        "aroon" -> Warehouse.aroon(spark, sfDir),
        "momentum" -> Warehouse.momentum(spark, sfDir),
        "ichimoku" -> Warehouse.ichimoku(spark, sfDir))) {
      val plan = df.queryExecution.executedPlan.toString
      val hashEx = "hashpartitioning".r.findAllIn(plan).length
      assert(hashEx <= 2, s"$name must keep two bounded shuffles, got $hashEx")
      // aroon reads only high/low, so the open/close max_by partials
      // prune away entirely — partial_max covers both shapes
      assert(plan.contains("partial_max"),
        s"$name OHLC base must combine map-side")
      assert(!plan.contains("Join"), s"$name must not join")
    }
    // fold tier (psar): the OHLC partial aggregate + the symbol
    // re-key into the sorted bar array (the atrWilder pair), then
    // the state machine folds in place — no windows beyond the
    // base, no join
    val ps = Warehouse.psar(spark, sfDir)
    val psPlan = ps.queryExecution.executedPlan.toString
    assert("hashpartitioning".r.findAllIn(psPlan).length <= 2,
      "psar must fold after the two bounded day-row shuffles")
    assert(!psPlan.contains("Join"), "psar must not join")
    // cluster labeling: centroids and per-cell stats ride broadcasts;
    // the corpus-token stream must never sort-merge-join
    val cl = graft.operators.Curation.clusterLabels(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(cl.contains("BroadcastHashJoin"),
      "clusterLabels stats/centroids must broadcast")
    assert(!cl.contains("SortMergeJoin"),
      "clusterLabels must not sort-merge-join the token stream")
  }

  test("volume-tier and screener queries keep their scale shapes") {
    import graft.operators.Warehouse
    // moneyFlow / volumeProfile / activityHeatmap: ONE partial
    // aggregate off the tick scan (map-side combine), windows only
    // over the bounded aggregate, no join
    for ((name, df, maxEx) <- Seq(
        ("moneyFlow", Warehouse.moneyFlow(spark, sfDir), 3),
        ("volumeProfile", Warehouse.volumeProfile(spark, sfDir), 3),
        ("activityHeatmap", Warehouse.activityHeatmap(spark, sfDir), 3))) {
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("partial_"),
        s"$name aggregate must combine map-side")
      assert(!plan.contains("Join"), s"$name must not join")
      val hashEx = "hashpartitioning".r.findAllIn(plan).length
      assert(hashEx <= maxEx, s"$name exchanges: $hashEx > $maxEx")
    }
    // the screener: one window pass + ONE day-row join to the SAR
    // fold — the join must be day-row-sized on both sides (a
    // SortMergeJoin on day rows is acceptable; what must NOT happen
    // is a second scan-side shuffle of ticks beyond the two OHLC
    // aggregates per branch)
    val sc = Warehouse.signalConfluence(spark, sfDir)
    val scPlan = sc.queryExecution.executedPlan.toString
    val scans = "Scan parquet".r.findAllIn(scPlan).length
    assert(scans <= 2, s"screener must scan ticks at most twice, got $scans")
  }

  test("candle family rolls up as ONE partial aggregate, never a tick window") {
    import graft.operators.Warehouse
    // the round-9 ohlcBy rework: open/close are min_by/max_by partial
    // aggregates with map-side combine, so shuffle volume is
    // (symbol, bucket) partials per map task — pinned here so a
    // refactor reintroducing the all-ticks first/last_value window
    // (every tick crossing the wire, 100× the shuffle at 100 TB)
    // fails a spec, not a bench
    for ((name, df) <- Seq(
        "dailyOhlc" -> Warehouse.dailyOhlc(spark, sfDir),
        "candles" -> Warehouse.candles(spark, sfDir),
        "weeklyCandles" -> Warehouse.weeklyCandles(spark, sfDir),
        "monthlyCandles" -> Warehouse.monthlyCandles(spark, sfDir))) {
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("partial_min_by") && plan.contains("partial_max_by"),
        s"$name open/close must be min_by/max_by partials (map-side combine)")
      assert(!plan.contains("unboundedfollowing") && !plan.contains("Window"),
        s"$name must not window-sort ticks for open/close")
      assert(!plan.contains("Join"), s"$name must not join")
      val hashEx = "hashpartitioning".r.findAllIn(plan).length
      assert(hashEx <= 1, s"$name must shuffle once (got $hashEx)")
    }
  }

  test("heapsFit derives the tokenized perDoc table exactly once") {
    // BOTH the bucket-offset branch and the curve consume perDoc; the
    // localCheckpoint pin means the final plan reads the materialized
    // RDD — zero parquet re-scans of the corpus (the unpinned plan
    // re-derived the whole tokenize → toks ⋈ news subtree under the
    // broadcast: 4 corpus scans for a one-row answer)
    val plan = graft.operators.TextOps.heapsFit(spark, sfDir)
      .queryExecution.executedPlan.toString
    val scans = "Scan parquet".r.findAllIn(plan).length
    assert(scans == 0,
      s"heapsFit result must read the pinned perDoc, got $scans corpus scans")
    assert("Scan ExistingRDD".r.findAllIn(plan).length >= 2 ||
      "LocalTableScan|ExistingRDD".r.findAllIn(plan).nonEmpty,
      s"expected the checkpointed perDoc feeding both branches:\n$plan")
  }

  test("ngramNovelty shuffles the corpus-scale gram set exactly once") {
    // the explicit repartition on gram must serve BOTH the
    // (doc_id, gram) distinct and the first-seen window — without it
    // the planner exchanges the full gram set twice, once per
    // required clustering (the shape review caught)
    val plan = graft.operators.Curation.ngramNovelty(spark, sfDir)
      .queryExecution.executedPlan.toString
    val gramExchanges = "hashpartitioning\\(gram".r.findAllIn(plan).length
    assert(gramExchanges == 1,
      s"expected exactly one gram-keyed exchange, got $gramExchanges")
  }

  test("knnClassify broadcasts probes and pushes the rank before the exchange") {
    val plan = graft.operators.Similarity.knnClassify(spark, sfDir)
      .queryExecution.executedPlan.toString
    // probes and labels ride broadcast joins; the corpus is never the
    // build side of anything
    assert("BroadcastHashJoin|BroadcastNestedLoopJoin".r
      .findAllIn(plan).nonEmpty, "probes not broadcast")
    // the top-k rank is pre-limited map-side (WindowGroupLimit) so
    // only candidate rows reach the probe_id exchange
    assert(plan.contains("WindowGroupLimit"),
      s"rank not pushed below the exchange:\n$plan")
  }

  test("no registered query plans a cartesian product") {
    // fleet-wide structural net: a CartesianProductExec anywhere in
    // the 216-query surface is corpus² work at 100 TB. The legitimate
    // unkeyed joins in this codebase are all BroadcastNestedLoop with
    // a 1-row-aggregate or probe-sized build side — those pass; a
    // refactor that drops a broadcast hint or grows a literal-true
    // join onto two large sides fails here, not in a round bench.
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        try {
          val plan = fn(spark, sfDir).queryExecution.executedPlan.toString
          if (plan.contains("CartesianProduct")) Some(name) else None
        } catch { case e: Throwable => Some(s"$name (failed to plan: ${e.getMessage})") }
    }
    assert(offenders.isEmpty,
      s"cartesian products planned in: ${offenders.mkString(", ")}")
  }

  test("curriculum reads the pinned scored table, broadcasts vocab and totals") {
    // three consumers (offsets, doc count, final join) read scored;
    // the localCheckpoint pin means the FINAL plan reads the
    // materialized RDD — zero parquet re-scans (unpinned: 6 corpus
    // scans for a doc-count-sized intermediate). The scoring job
    // itself (runs at construction) joins the corpus against the
    // BROADCAST vocab-sized count table.
    val plan = graft.operators.Curation.curriculum(spark, sfDir)
      .queryExecution.executedPlan.toString
    val scans = "Scan parquet".r.findAllIn(plan).length
    assert(scans == 0,
      s"curriculum result must read the pinned scored table, got $scans scans")
    assert("BroadcastHashJoin|BroadcastNestedLoopJoin".r
      .findAllIn(plan).nonEmpty, "offsets/doc-count not broadcast")
    // per-bucket ranks only: every window carries a partition key
    // (the single-task unpartitioned window is the shape this
    // decomposition exists to avoid) — except the offsets window,
    // which runs over the bucket-count-sized aggregate
    assert(!plan.contains("CartesianProduct"))
  }

  test("boilerplate shuffles the corpus-scale gram set exactly once") {
    // the explicit repartition on (source, gram) serves BOTH the
    // distinct and the doc-frequency window (the ngramNovelty
    // single-exchange discipline); source doc counts broadcast
    val plan = graft.operators.Curation.boilerplate(spark, sfDir)
      .queryExecution.executedPlan.toString
    val gramExchanges = "hashpartitioning\\(source[^)]*, gram".r
      .findAllIn(plan).length
    assert(gramExchanges == 1,
      s"expected exactly one (source, gram)-keyed exchange, got $gramExchanges")
    assert("BroadcastHashJoin".r.findAllIn(plan).nonEmpty,
      "source sizes not broadcast")
  }

  test("evalContamination broadcasts the benchmark grams, never the corpus") {
    // the eval gram table is benchmark-sized and must be the BUILD
    // side; the training gram stream probes it without shuffling for
    // the membership test
    val plan = graft.operators.Curation.evalContamination(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert("BroadcastHashJoin".r.findAllIn(plan).nonEmpty,
      s"eval grams not broadcast:\n${plan.take(2000)}")
    // no gram-keyed exchange anywhere: the broadcast probe replaces
    // it, and the only shuffle is the eval-bounded hit set into the
    // per-eval-doc collapse (a pre-join distinct would reintroduce a
    // corpus-scale (train_id, gram) exchange — caught in review)
    assert(!plan.contains("hashpartitioning(gram") &&
      !plan.contains("hashpartitioning(train_id"),
      s"corpus-scale gram exchange reintroduced:\n${plan.take(3000)}")
    assert(!plan.contains("CartesianProduct"))
  }

  test("syndication shuffles the corpus-scale gram set exactly once") {
    // the explicit repartition on gram serves BOTH the distinct and
    // the per-gram source-spread window (the ngramNovelty discipline)
    val plan = graft.operators.Curation.syndication(spark, sfDir)
      .queryExecution.executedPlan.toString
    val gramExchanges = "hashpartitioning\\(gram".r.findAllIn(plan).length
    assert(gramExchanges == 1,
      s"expected exactly one gram-keyed exchange, got $gramExchanges")
  }

  test("langIdEval windows over aggregated cells, not the corpus") {
    val df = graft.operators.TextOps.langIdEval(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString
    // the gold-total window must consume the (lang, predicted)
    // AGGREGATE's languages²-row output, not per-doc rows: in the
    // top-down plan print the Window node has to sit ABOVE the
    // HashAggregate (a corpus-sized window would print below it,
    // feeding the aggregate instead)
    val win = plan.indexOf("Window")
    val agg = plan.indexOf("HashAggregate")
    assert(win >= 0 && agg >= 0 && win < agg,
      s"window does not run over the aggregated cells:\n$plan")
  }
}
