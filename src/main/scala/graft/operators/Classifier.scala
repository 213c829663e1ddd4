package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** fastText-style supervised quality classifier (Joulin et al. 2016,
  * "Bag of Tricks for Efficient Text Classification"): logistic
  * regression over HASHED unigram∪bigram bag-of-features — the
  * learned tier above the heuristic quality scores
  * ([[TextOps.qualityScore]], [[Curation.gopherFiltersDocs]]) and the
  * discriminative dual of the generative DSIR importance model
  * ([[Curation.importanceWeightsHashed]]): DSIR asks "how much more
  * likely is this text under the target domain's LM", the classifier
  * asks "does a trained separator call this text target-like". This
  * is the CCNet/LLaMA-style page-quality filter shape (a linear
  * model over hashed n-grams scoring "seed-corpus-like" pages).
  *
  * Both tiers share ONE feature definition —
  * [[Curation.dsirFeatures]] hashed into [[Curation.HashBuckets]]
  * buckets — so the two models are comparable feature-for-feature
  * and train/serve cannot drift.
  *
  * Scale shape: documents featurize ONCE into cached sparse
  * unit-ℓ₂ presence vectors — one narrow shuffle on
  * (doc_id, bucket); each of the `iters` full-batch GD steps is then
  * one map-side gradient pass (B+1 doubles per partition, the model
  * broadcast per step), so the loop never shuffles the corpus and
  * the driver holds only O(B) state. At
  * 100 TB you fit on a sampled slice (the model saturates long
  * before the corpus ends) and serve everywhere — serving is a pure
  * per-row projection ([[classifierScore]]) that runs unchanged in
  * the streaming tier. Full-batch GD (not SGD) keeps the fit
  * DETERMINISTIC: zero init, fixed step, partition-stable sums — the
  * property every registry/save-load spec in this repo leans on.
  */
object Classifier {

  /** The shared hash-table size ([[Curation.HashBuckets]]), exposed
    * for the measurement harness.
    */
  private[graft] def defaultBuckets: Int = Curation.HashBuckets

  /** One featurized training document: `idx` ascending distinct
    * bucket ids, `v` the matching presence weights (each 1/√k), `y`
    * the label.
    */
  private[graft] case class FeatDoc(doc_id: Long, y: Double,
      idx: Array[Int], v: Array[Double])

  /** Featurize for training: normalized words bound FIRST (one regex
    * pass per row — see [[Curation.dsirFeatures]]'s contract), the
    * unigram∪bigram features hashed, and each document reduced to its
    * DISTINCT bucket set with weight 1/√k (binary presence,
    * ℓ₂-normalized — ‖x‖₂ = 1 EXACTLY, which both pins the loss's
    * smoothness bound for the monotone-step guarantee in [[fit]] and
    * keeps per-feature gradients at err/√k instead of a tf/n
    * average's err/k, the difference between converging in tens of
    * full-batch steps and never leaving the bias). Buckets sort
    * ascending so downstream float folds are order-stable. Docs with
    * no features carry nothing a linear model can use and are
    * dropped here; serving still scores them (bias only).
    */
  private[graft] def featurize(docs: DataFrame,
      buckets: Int = Curation.HashBuckets): Dataset[FeatDoc] = {
    import docs.sparkSession.implicits._
    docs
      .select(col("doc_id"),
        (col("source") === Curation.DsirTarget).cast("double").as("y"),
        filter(TextOps.normalizedWords, w => w =!= lit("")).as("ws"))
      .select(col("doc_id"), col("y"),
        explode(Curation.dsirFeatures(col("ws"))).as("f"))
      .groupBy(col("doc_id"), col("y"),
        pmod(xxhash64(col("f")), lit(buckets.toLong)).cast("int").as("b"))
      .agg(count(lit(1)).as("tf")) // collapse repeats: presence only
      .groupBy("doc_id", "y")
      .agg(sort_array(collect_list(col("b"))).as("idx"))
      .select(col("doc_id"), col("y"), col("idx"),
        transform(col("idx"),
          _ => lit(1.0) / sqrt(size(col("idx")))).as("v"))
      .as[FeatDoc]
  }

  /** Fit by deterministic full-batch gradient descent on the mean
    * log-loss with ℓ₂ regularization. Returns (weights of length
    * buckets+1 — last slot the bias, per-iteration mean losses).
    * Each step: broadcast w, one map-side pass producing
    * per-partition (gradient, loss) partials combined on the driver
    * in partition order, an O(B) update — no corpus shuffle anywhere
    * in the loop. Unit-ℓ₂ features (‖x‖₂ = 1, [[featurize]]) bound the mean
    * log-loss's smoothness at L ≤ ¼ + λ — so the default step
    * 3 < 1/L guarantees MONOTONE descent (the spec pins it); raising
    * lr past ~4 forfeits that guarantee before it buys speed.
    */
  private[graft] def fit(feats: Dataset[FeatDoc],
      buckets: Int = Curation.HashBuckets, iters: Int = 150,
      lr: Double = 3.0, l2: Double = 1e-6): (Array[Double], Array[Double]) = {
    // pin the aggregation layout BEFORE caching: an explicit
    // partition count + in-partition sort makes every float sum's
    // order a function of the data alone, so the same corpus fits to
    // bit-identical weights in ANY execution context (a streaming
    // microbatch refit runs with different AQE/partition settings
    // than a batch session — the maintenance spec compares the two)
    val cached = feats.repartition(32, col("doc_id"))
      .sortWithinPartitions("doc_id").persist()
    val n = cached.count().toDouble
    // inverse-frequency CLASS WEIGHTS (positives are the seed domain,
    // typically a few % of the corpus): each class carries half the
    // weighted loss, so the minority's gradient isn't drowned — and
    // because the weights average to exactly 1 over the corpus, the
    // smoothness bound (and the monotone-step guarantee) is unchanged
    val nPos = cached.filter(_.y > 0.5).count().toDouble
    val (wPos, wNeg) =
      if (nPos == 0.0 || nPos == n) (1.0, 1.0)
      else (n / (2.0 * nPos), n / (2.0 * (n - nPos)))
    val sc = cached.sparkSession.sparkContext
    var w = new Array[Double](buckets + 1)
    val losses = new Array[Double](iters)
    var it = 0
    while (it < iters) {
      val bw = sc.broadcast(w)
      // per-partition partials, combined on the driver in PARTITION
      // INDEX order — a treeAggregate would combine in task-arrival
      // order, making two fits of the same corpus differ by ulps
      // (this is the one place bit-determinism is bought, at
      // partitions × (B+1) doubles per step of driver traffic; a
      // fit that doesn't need bit-equality can tree-combine instead)
      val partials = cached.rdd.mapPartitionsWithIndex { (pid, rows) =>
        val ww = bw.value
        val g = new Array[Double](ww.length)
        var l = 0.0
        rows.foreach { d =>
          var z = ww(buckets)
          var i = 0
          while (i < d.idx.length) { z += ww(d.idx(i)) * d.v(i); i += 1 }
          val p = 1.0 / (1.0 + math.exp(-z))
          val cw = if (d.y > 0.5) wPos else wNeg
          val err = cw * (p - d.y)
          i = 0
          while (i < d.idx.length) { g(d.idx(i)) += err * d.v(i); i += 1 }
          g(buckets) += err
          val py = if (d.y > 0.5) p else 1.0 - p
          l -= cw * math.log(math.max(py, 1e-12))
        }
        Iterator((pid, (g, l)))
      }.collect().sortBy(_._1)
      val grad = new Array[Double](buckets + 1)
      var loss = 0.0
      partials.foreach { case (_, (g, l)) =>
        var i = 0
        while (i < grad.length) { grad(i) += g(i); i += 1 }
        loss += l
      }
      bw.destroy()
      val w2 = new Array[Double](buckets + 1)
      var i = 0
      while (i < w2.length) {
        w2(i) = w(i) - lr * (grad(i) / n + l2 * w(i))
        i += 1
      }
      w = w2
      losses(it) = loss / n
      it += 1
    }
    cached.unpersist()
    (w, losses)
  }

  /** Score documents against a trained model — a PURE projection (the
    * model rides in the plan as a literal, same serve shape as
    * [[Curation.hashedImportanceScore]]), so it runs unchanged inside
    * the streaming tier with zero state and zero shuffle. `prob` is
    * σ(Σ_present w_b/√k + bias) — exactly the training feature
    * vector; featureless docs score the bias alone.
    */
  private[graft] def classifierScore(docs: DataFrame,
      model: Array[Double]): DataFrame = {
    val buckets = model.length - 1
    docs
      .select(col("doc_id"),
        (col("source") === Curation.DsirTarget).as("is_target"),
        filter(TextOps.normalizedWords, w => w =!= lit("")).as("ws"))
      // the distinct bucket set is BOUND before the fold, so the
      // hash+distinct chain evaluates once per row and the weight
      // fold walks k ≤ B ints — the same presence/√k vector training
      // used, rebuilt without a shuffle
      .withColumn("bs", array_distinct(transform(
        Curation.dsirFeatures(col("ws")),
        f => pmod(xxhash64(f), lit(buckets.toLong)).cast("int"))))
      .withColumn("z",
        when(size(col("bs")) > 0,
          aggregate(col("bs"), lit(0.0),
            (acc, b) => acc + element_at(typedLit(model.toSeq), b + 1))
            / sqrt(size(col("bs"))))
          .otherwise(lit(0.0)) + lit(model(buckets)))
      .select(col("doc_id"),
        round(lit(1.0) / (lit(1.0) + exp(-col("z"))), 6).as("prob"),
        (col("z") > 0).as("pred_target"), col("is_target"))
  }

  /** Persist a fitted model as (slot, weight) rows — slot `buckets`
    * is the bias — the registry discipline every fitted artifact here
    * follows (ANN codebooks, the ARIMA registry): fit once, serve
    * from disk; the spec pins load == fresh bit-identically.
    */
  def saveModel(spark: SparkSession, model: Array[Double],
      path: String): Unit = {
    spark.createDataFrame(model.zipWithIndex.toIndexedSeq.map {
      case (wi, i) => (i, wi)
    }).toDF("slot", "w").write.mode("overwrite").parquet(path)
    IndexManifest.write(spark, path, "quality_classifier", Seq("."),
      Map("buckets" -> (model.length - 1).toString))
  }

  def loadModel(spark: SparkSession, path: String): Array[Double] = {
    IndexManifest.validate(spark, path, "quality_classifier", Seq(".")): Unit
    val rows = spark.read.parquet(path).select("slot", "w").collect()
      .map(r => r.getInt(0) -> r.getDouble(1))
    require(rows.nonEmpty &&
      rows.map(_._1).toSet == (0 until rows.length).toSet,
      s"invalid classifier model at $path: slots do not cover " +
        s"0..${rows.length - 1}")
    val out = new Array[Double](rows.length)
    rows.foreach { case (i, wi) => out(i) = wi }
    out
  }

  /** AGREEMENT surface between the two learned quality tiers — the
    * cross-validation a data-curation user actually runs before
    * trusting either filter: the discriminative classifier and the
    * generative DSIR importance model share ONE feature definition
    * ([[Curation.dsirFeatures]] hashed into the same bucket space), so
    * per-document disagreement is model disagreement, not feature
    * skew. One row per document: both raw scores plus each score's
    * corpus PERCENTILE (shared quantile boundaries, so the two scales
    * become comparable rank space) and the percentile gap — sort by
    * `pctile_gap` descending and you are reading the documents the two
    * tiers fight over.
    *
    * Scale shape: both scorers are plan-literal projections over one
    * corpus scan (the joined frame is checkpointed once and feeds the
    * two boundary computations + the output); percentiles come from
    * 99 approxQuantile boundaries at a 1e-3 error budget (bounded
    * summaries, model-sized driver state — the same machinery
    * q_percentiles_approx trusts at scale) folded per row as a
    * broadcast literal — no global rank window, no corpus sort. Not
    * SQL-expressible (classifier fit) — rows + spec (Spearman rank
    * agreement, percentile monotonicity, gap quantiles).
    */
  def clfDsirAgreement(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val (model, _) = fit(featurize(
      docs.filter(pmod(xxhash64(col("doc_id")), lit(5L)) =!= 0L)))
    val clf = classifierScore(docs, model)
      .select(col("doc_id"), col("prob").as("clf_prob"))
    // rank DSIR on the PER-TOKEN log-ratio: the raw Σ log-ratio scales
    // with document length while the classifier's unit-ℓ₂ features
    // make its score length-invariant, so ranking the raw sum against
    // prob would measure length skew, not model agreement (raw rho
    // 0.35 vs 0.59 per-token, measured @ sf0.001). Both surfaces kept.
    val dsir = Curation.hashedImportanceScore(docs,
        Curation.hashedImportanceModel(docs))
      .select(col("doc_id"), col("log_weight").as("dsir_logw"),
        when(col("n_tokens") > 0, col("log_weight") / col("n_tokens"))
          .otherwise(lit(0.0)).as("dsir_lpt"))
    // materialized once: the scores feed two quantile actions plus the
    // output (localCheckpoint, not persist — released with the plan,
    // the returnCorrOf discipline)
    val joined = clf.join(dsir, "doc_id").localCheckpoint(true)
    val ps = (1 to 99).map(_ / 100.0).toArray
    // nonzero error budget: epsilon=0 would make the Greenwald-Khanna
    // summaries retain every value (O(corpus) driver state); at 1e-3
    // the summary is bounded and the boundary error (≤ 0.1% of rank
    // space) is far below the percentile granularity being assigned.
    // Still deterministic for a fixed corpus + partitioning.
    val qClf = joined.stat.approxQuantile("clf_prob", ps, 0.001)
    val qDsir = joined.stat.approxQuantile("dsir_lpt", ps, 0.001)
    def pctile(c: Column, bounds: Array[Double]): Column =
      aggregate(typedLit(bounds.toSeq), lit(0),
        (acc, b) => acc + when(c >= b, 1).otherwise(0))
    joined
      .withColumn("clf_pctile", pctile(col("clf_prob"), qClf))
      .withColumn("dsir_pctile", pctile(col("dsir_lpt"), qDsir))
      .withColumn("pctile_gap",
        abs(col("clf_pctile") - col("dsir_pctile")))
  }

  /** The registered query: fit on the 4/5 hash split, score EVERY
    * document, carry the split flag so held-out quality is auditable
    * downstream. Iterative training is not SQL-expressible — rows +
    * spec (loss monotone, train AND held-out accuracy bars, stream
    * parity).
    */
  def qualityClassifier(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val (model, _) = fit(featurize(
      docs.filter(pmod(xxhash64(col("doc_id")), lit(5L)) =!= 0L)))
    classifierScore(docs, model)
      .withColumn("is_holdout",
        pmod(xxhash64(col("doc_id")), lit(5L)) === 0L)
  }

  /** Separation floor for [[clfGate]] — mean target prob minus mean
    * non-target prob over the full scored corpus (GateProbe-measured
    * 0.39 / 0.36 / 0.069 at sf0.001/0.01/0.1 — the fixed GD epoch
    * budget separates less as the corpus grows, so the floor sits
    * under the weakest measured point); a classifier that stops
    * learning or diverges reads ~0 or negative.
    */
  private[graft] val ClfSeparationFloor = 0.02

  /** Ceiling for the mean |clf − DSIR| percentile gap (uniform-
    * random rankings read ~33; GateProbe-measured 19.8 / 19.8 /
    * 17.0 — agreement well above chance but honest about the two
    * scorers' different geometry).
    */
  private[graft] val ClfAgreementGapCeiling = 28.0

  /** TRAINING GATE over the quality classifier (round-11
    * partial-oracle tier): the GD weights aren't SQL-expressible,
    * but the corpus masses are (total docs, target-source docs —
    * the label column is raw SQL), and three behavioral booleans
    * pin the model against TRUE literals: probabilities bounded in
    * [0, 1], class separation ≥ [[ClfSeparationFloor]] (a model
    * that diverges or dies reads ~0), and the DSIR agreement gap ≤
    * [[ClfAgreementGapCeiling]] (two independent quality scorers
    * must rank the corpus more alike than chance). Deterministic:
    * full-batch GD from zeros, fixed split hash.
    */
  def clfGate(spark: SparkSession, dir: String): DataFrame = {
    val scored = qualityClassifier(spark, dir)
    val flags = scored.agg(
      count(lit(1)).as("n_docs"),
      coalesce(sum(when(col("is_target"), 1L).otherwise(0L)), lit(0L))
        .as("n_target"),
      coalesce(expr("bool_and(prob >= 0.0 AND prob <= 1.0)"), lit(true))
        .as("prob_bounded_ok"),
      (coalesce(avg(when(col("is_target"), col("prob"))), lit(0.0))
        - coalesce(avg(when(!col("is_target"), col("prob"))), lit(0.0)))
        .as("sep"))
    val gap = clfDsirAgreement(spark, dir)
      .agg(coalesce(avg(col("pctile_gap")), lit(0.0)).as("gap"))
    flags.crossJoin(broadcast(gap))
      .select(col("n_docs"), col("n_target"), col("prob_bounded_ok"),
        (col("sep") >= ClfSeparationFloor).as("separation_ok"),
        (col("gap") <= ClfAgreementGapCeiling).as("agreement_ok"))
  }

  def clfGateSql: String =
    s"""SELECT count(*)::BIGINT AS n_docs,
      |  coalesce(sum(CASE WHEN source = '${Curation.DsirTarget}'
      |    THEN 1 ELSE 0 END), 0)::BIGINT AS n_target,
      |  true AS prob_bounded_ok, true AS separation_ok,
      |  true AS agreement_ok
      |FROM documents""".stripMargin
}
