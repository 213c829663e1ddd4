package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Floor-calibration harness for the round-11 gate queries: prints
  * the MEASURED quantities the gates threshold (near-dup LSH /
  * SemDeDup recall, filtered-IVF recall, hard-triplet coverage,
  * exact-vs-hashed DSIR correlation, PCA explained fraction) so the
  * regression floors baked into the gate literals can be audited
  * against real numbers per scale factor instead of guessed.
  *
  * Usage: sbt "runMain graft.GateProbe [sfDir ...]"
  */
object GateProbe {
  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01",
        "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import operators.{Classifier, Curation, Dedup, Forecast, Similarity}

    for (dir <- dirs) {
      def pairSet(df: org.apache.spark.sql.DataFrame,
          a: String, b: String): Set[(Long, Long)] =
        df.select(a, b).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val exactPairs = pairSet(Dedup.embeddingDedup(spark, dir), "a_id", "b_id")
      def recall(s: Set[(Long, Long)]): Double =
        if (exactPairs.isEmpty) 1.0
        else (exactPairs & s).size.toDouble / exactPairs.size
      val lsh = recall(pairSet(Dedup.embeddingDedupLsh(spark, dir), "a_id", "b_id"))
      val sem = recall(pairSet(Dedup.semDedup(spark, dir), "a_id", "b_id"))
      val bExact = pairSet(Similarity.annBruteForce(spark, dir),
        "probe_id", "neighbor_id")
      val ivfpq = pairSet(Similarity.annIvfPq(spark, dir),
        "probe_id", "neighbor_id")
      val ivfpqRecall = if (bExact.isEmpty) 1.0
        else (bExact & ivfpq).size.toDouble / bExact.size
      val fExact = pairSet(Similarity.annFiltered(spark, dir),
        "probe_id", "neighbor_id")
      val fIvf = pairSet(Similarity.annFilteredIvf(spark, dir),
        "probe_id", "neighbor_id")
      val fRecall = if (fExact.isEmpty) 1.0
        else (fExact & fIvf).size.toDouble / fExact.size
      val nEasy = Dedup.tripletMine(spark, dir).count()
      val nHard = Dedup.tripletMineHard(spark, dir).count()
      val coverage = if (nEasy == 0) 1.0 else nHard.toDouble / nEasy
      val docs = Tables.documents(spark, dir)
      val corrV = Curation.importanceWeightsDocs(docs)
        .select(col("doc_id"), col("log_weight").as("le"))
        .join(Curation.importanceWeightsHashed(spark, dir)
          .select(col("doc_id"), col("log_weight").as("lh")), Seq("doc_id"))
        .agg(corr(col("le"), col("lh"))).head.getDouble(0)
      val clf = Classifier.qualityClassifier(spark, dir)
        .agg(avg(when(col("is_target"), col("prob"))),
          avg(when(!col("is_target"), col("prob")))).head
      val sep = clf.getDouble(0) - clf.getDouble(1)
      val gap = Classifier.clfDsirAgreement(spark, dir)
        .agg(avg(col("pctile_gap"))).head.getDouble(0)
      val fg = Forecast.forecastGate(spark, dir).head
      val ng = Dedup.nearDupGateCheck(spark, dir).head
      val gate = Similarity.embedPcaGate(spark, dir).head
      println(f"GATEPROBE dir=$dir lsh_recall=$lsh%.4f sem_recall=$sem%.4f " +
        f"filtered_ivf_recall=$fRecall%.4f triplet_coverage=$coverage%.4f " +
        f"dsir_corr=$corrV%.4f ivfpq_recall=$ivfpqRecall%.4f " +
        f"clf_sep=$sep%.4f clf_gap=$gap%.4f " +
        f"forecast_gate=${fg.toString} neardup_check=${ng.toString} " +
        f"pca_gate=${gate.toString}")
      // the nine-family recall gate at this scale — the floors are
      // regression floors on the SERVE paths (adaptive-cands PCA,
      // size-routed graph), so this is the per-scale green/red board
      Similarity.annRecallGate(spark, dir).collect().foreach { r =>
        println(s"GATEPROBE dir=$dir recall_gate variant=${r.getString(0)} " +
          s"floor=${r.getDouble(2)} ok=${r.getBoolean(3)}")
      }
    }
    spark.stop()
  }
}
