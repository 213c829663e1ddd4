package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §2 + §7. */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Indicators.analyticsFull(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_agg" -> (Relational.q1Agg _),
    "q3_join" -> (Relational.q3Join _),
    "q5_multijoin" -> (Relational.q5MultiJoin _),
    "q_validate_ticks" -> (Warehouse.validateTicks _),
    "q_dedup_ticks" -> (Warehouse.dedupTicks _),
    "q_latest_per_key" -> (Warehouse.latestPerKey _),
    "q_latest_per_day" -> (Warehouse.latestPerDay _),
    "q_daily_ohlc" -> (Warehouse.dailyOhlc _),
    "q_candles" -> (Warehouse.candles _),
    "q_time_window_scan" -> (Warehouse.timeWindowScan _),
    "q_distinct_keys" -> (Warehouse.distinctKeys _),
    "q_window_agg" -> (Warehouse.windowAgg _),
    "q_sessionize" -> (Warehouse.sessionize _),
    "q_sma" -> (Indicators.sma _),
    "q_rsi" -> (Indicators.rsi _),
    "q_bollinger" -> (Indicators.bollinger _),
    "q_volatility" -> (Indicators.volatility _),
    "q_ema" -> (Indicators.ema _),
    "q_macd" -> (Indicators.macd _),
    "q_price_change" -> (Indicators.priceChange _),
    "q_analytics_full" -> (Indicators.analyticsFull _),
    "q_filter_extremes" -> (Indicators.filterExtremes _),
    "q_alerts" -> (Indicators.alerts _),
    "q_latest_analytics" -> (Indicators.latestAnalytics _),
    "q_daily_summary" -> (Indicators.dailySummary _),
    "q_json_extract" -> (Warehouse.jsonExtract _),
    "q_percentiles" -> (Warehouse.percentiles _),
    "q_orphan_ticks" -> (Warehouse.orphanTicks _),
    "q_top_movers" -> (Warehouse.topMovers _),
    "q_rollup" -> (Warehouse.rollupAgg _),
    "q_pivot" -> (Warehouse.pivotTypes _),
    "q_asof_join" -> (AsofJoin.viewToPurchase _),
    "q_token_count" -> (TextOps.tokenCount _),
    "q_quality_score" -> (TextOps.qualityScore _),
    "q_lang_id" -> (TextOps.langId _),
    "q_fingerprint" -> (TextOps.fingerprint _),
    "q_chunk_docs" -> (TextOps.chunkDocs _),
    "q_clean_text" -> (TextOps.cleanText _),
    "q_word_freq" -> (TextOps.wordFreq _),
    "q_bpe_tokens" -> ((s, d) => Bpe.tokenizeDocs(s, d)),
    "q_dedup_exact" -> (Dedup.exact _),
    "q_ngram_jaccard" -> (Dedup.ngramJaccard _),
    "q_dedup_minhash" -> (Dedup.minhashLsh _),
    "q_dedup_simhash" -> (Dedup.simhashDedup _),
    "q_dedup_embedding" -> (Dedup.embeddingDedup _),
    "q_ann_bruteforce" -> (Similarity.annBruteForce _),
    "q_ann_lsh" -> (Similarity.annLsh _),
    "q_ann_ivf" -> (Similarity.annIvf _),
    "q_linreg_trend" -> (Forecast.linregTrend _),
    "q_linreg_autoreg" -> (Forecast.linregAutoreg _),
    "q_arima_forecast" -> (Forecast.arimaForecast _),
    "q_predictions" -> (Forecast.predictions _),
    "q_multimodal_meta" -> (Multimodal.multimodalMeta _)
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] = Map(
    "q1_agg" -> Relational.q1AggSql,
    "q3_join" -> Relational.q3JoinSql,
    "q5_multijoin" -> Relational.q5MultiJoinSql,
    "q_validate_ticks" -> Warehouse.validateTicksSql,
    "q_dedup_ticks" -> Warehouse.dedupTicksSql,
    "q_latest_per_key" -> Warehouse.latestPerKeySql,
    "q_latest_per_day" -> Warehouse.latestPerDaySql,
    "q_daily_ohlc" -> Warehouse.dailyOhlcSql,
    "q_candles" -> Warehouse.candlesSql,
    "q_time_window_scan" -> Warehouse.timeWindowScanSql,
    "q_distinct_keys" -> Warehouse.distinctKeysSql,
    "q_window_agg" -> Warehouse.windowAggSql,
    "q_sessionize" -> Warehouse.sessionizeSql,
    "q_sma" -> Indicators.smaSql,
    "q_rsi" -> Indicators.rsiSql,
    "q_bollinger" -> Indicators.bollingerSql,
    "q_volatility" -> Indicators.volatilitySql,
    "q_ema" -> Indicators.emaSql,
    "q_macd" -> Indicators.macdSql,
    "q_price_change" -> Indicators.priceChangeSql,
    "q_analytics_full" -> Indicators.analyticsFullSql,
    "q_filter_extremes" -> Indicators.filterExtremesSql,
    "q_alerts" -> Indicators.alertsSql,
    "q_latest_analytics" -> Indicators.latestAnalyticsSql,
    "q_daily_summary" -> Indicators.dailySummarySql,
    "q_json_extract" -> Warehouse.jsonExtractSql,
    "q_percentiles" -> Warehouse.percentilesSql,
    "q_orphan_ticks" -> Warehouse.orphanTicksSql,
    "q_top_movers" -> Warehouse.topMoversSql,
    "q_rollup" -> Warehouse.rollupAggSql,
    "q_pivot" -> Warehouse.pivotTypesSql,
    "q_asof_join" -> AsofJoin.viewToPurchaseSql,
    "q_token_count" -> TextOps.tokenCountSql,
    "q_quality_score" -> TextOps.qualityScoreSql,
    "q_lang_id" -> TextOps.langIdSql,
    "q_fingerprint" -> TextOps.fingerprintSql,
    "q_chunk_docs" -> TextOps.chunkDocsSql,
    "q_clean_text" -> TextOps.cleanTextSql,
    "q_word_freq" -> TextOps.wordFreqSql,
    "q_dedup_exact" -> Dedup.exactSql,
    "q_ngram_jaccard" -> Dedup.ngramJaccardSql,
    "q_dedup_embedding" -> Dedup.embeddingDedupSql,
    "q_ann_bruteforce" -> Similarity.annBruteForceSql,
    "q_linreg_trend" -> Forecast.linregTrendSql,
    "q_multimodal_meta" -> Multimodal.multimodalMetaSql
  )
}
