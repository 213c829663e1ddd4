package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.FormattedMode
object PlanDump {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions","4").config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.001"
    val sb = new StringBuilder
    sb.append("# PLANS — formatted physical plans of representative queries\n\n")
    sb.append("Regenerate: `sbt \"runMain graft.PlanDump\"` (writes this file).\n")
    sb.append("Evidence the scale properties hold: pushed filters + pruned\n")
    sb.append("schemas at the scans, broadcast dimension joins, a single hash\n")
    sb.append("exchange feeding all indicator windows and the EmaAppend\n")
    sb.append("recurrence, bucket-key-only shuffles in the LSH dedup, q_ema\n")
    sb.append("through the O(n) EmaAppend node (no expanding collect_list),\n")
    sb.append("and the ANN-LSH probe lookup as a BroadcastHashJoin on the\n")
    sb.append("bucket code (no nested-loop scan).\n")
    def dump(name: String, df: org.apache.spark.sql.DataFrame): Unit = {
      sb.append(s"\n## $name\n\n```\n")
      sb.append(df.queryExecution.explainString(FormattedMode).take(6000))
      sb.append("\n```\n")
    }
    dump("q1_agg", operators.Relational.q1Agg(spark, dir))
    dump("q5_multijoin", operators.Relational.q5MultiJoin(spark, dir))
    dump("q_analytics_full", operators.Indicators.analyticsFull(spark, dir))
    dump("q_ema", operators.Indicators.ema(spark, dir))
    dump("q_dedup_minhash", operators.Dedup.minhashLsh(spark, dir))
    dump("q_ann_bruteforce", operators.Similarity.annBruteForce(spark, dir))
    dump("q_ann_lsh", operators.Similarity.annLsh(spark, dir))
    dump("q_recent_alerts", operators.Indicators.recentAlerts(spark, dir))
    dump("q_asof_join", operators.AsofJoin.viewToPurchase(spark, dir))
    dump("q_range_join", operators.RangeJoin.purchaseErrors(spark, dir))
    dump("q_span_dedup", operators.Curation.spanDedup(spark, dir))
    dump("q_bm25", operators.TextOps.bm25(spark, dir))
    dump("q_ann_sq8", operators.Similarity.annSq8(spark, dir))
    dump("q_mixture_sample", operators.Curation.mixtureSample(spark, dir))
    dump("q_tfidf", operators.TextOps.tfidf(spark, dir))
    dump("q_gopher_chain", operators.Curation.gopherChain(spark, dir))
    dump("q_curation_pipeline", operators.Curation.curationPipeline(spark, dir))
    dump("q_ann_pq", operators.Similarity.annPq(spark, dir))
    dump("q_perplexity", operators.TextOps.perplexity(spark, dir))
    dump("q_quality_prune", operators.TextOps.qualityPrune(spark, dir))
    dump("q_ann_opq", operators.Similarity.annOpq(spark, dir))
    dump("q_model_readiness", operators.Forecast.modelReadiness(spark, dir))
    dump("q_hybrid_search", operators.TextOps.hybridSearch(spark, dir))
    dump("q_bloom_gate", operators.Dedup.bloomGate(spark, dir))
    dump("q_return_corr", operators.Warehouse.returnCorr(spark, dir))
    dump("q_substring_dedup", operators.Curation.substringDedup(spark, dir))
    dump("q_ingest_errors", operators.ErrorLedger.ingestionErrors(spark, dir))
    dump("q_companies_by_industry", operators.Warehouse.companiesByIndustry(spark, dir))
    dump("q_price_ffill", operators.Warehouse.priceFfill(spark, dir))
    dump("q_gopher_ngram_rep", operators.Curation.gopherNgramRep(spark, dir))
    dump("q_gate_resolve", operators.Dedup.gateResolve(spark, dir))
    dump("q_trading_hours", operators.Warehouse.tradingHours(spark, dir))
    dump("q_linreg_registry", operators.Forecast.linregRegistryQuery(spark, dir))
    dump("q_dedup_clusters_incr",
      operators.Dedup.embeddingClustersIncremental(spark, dir, split = 25L))
    dump("q_dedup_canonical_incr",
      operators.Dedup.dedupCanonicalIncremental(spark, dir, split = 25L))
    dump("q_dedup_canonical_quality_incr",
      operators.Dedup.dedupCanonicalQualityIncremental(spark, dir, split = 25L))
    dump("q_clf_dsir_agreement",
      operators.Classifier.clfDsirAgreement(spark, dir))
    dump("q_shard_order", operators.Curation.shardOrder(spark, dir))
    dump("q_source_overlap", operators.Dedup.sourceOverlap(spark, dir))
    dump("q_curation_funnel", operators.Curation.curationFunnel(spark, dir))
    dump("q_dsir_resample", operators.Curation.dsirResample(spark, dir))
    dump("q_knn_classify", operators.Similarity.knnClassify(spark, dir))
    dump("q_lang_id_eval", operators.TextOps.langIdEval(spark, dir))
    dump("q_session_gaps", operators.Warehouse.sessionGaps(spark, dir))
    dump("q_data_split", operators.Curation.dataSplit(spark, dir))
    dump("q_data_split_cluster", operators.Curation.dataSplitCluster(spark, dir))
    java.nio.file.Files.writeString(java.nio.file.Paths.get("/root/repo/PLANS.md"), sb.toString)
    println("[plandump] wrote PLANS.md")
    spark.stop()
  }
}
