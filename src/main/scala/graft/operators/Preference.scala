package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Preference-pair construction for DPO/RLHF-style training data —
  * the (chosen, rejected) pair-mining step between a scored corpus
  * and a preference-optimization run (Rafailov et al. 2023, DPO;
  * the same shape RLHF reward-model data takes). The reference has
  * no preference surface (beyond-reference tier, round 12); the
  * quality signal is the repo's own [[TextOps.qualityScore]] so the
  * whole tier composes with the curation stack, and in production
  * the score column swaps for a reward-model output without touching
  * the pairing plan.
  *
  * PAIRING is quality-ranked MEDIAN-OFFSET, not all-pairs: within
  * each source (the prompt-group proxy; production keys on prompt
  * id), docs rank by (quality desc, doc_id), and rank i pairs with
  * rank i + ⌊n/2⌋ — every doc appears at most once on each side,
  * pair count is n − ⌊n/2⌋ per group, and the contrast is the widest
  * one that still yields O(n) pairs (top-vs-bottom-half, the
  * "max-margin without the O(n²) blowup" schedule). A margin floor
  * [[PrefMinMargin]] then gates acceptance — near-tie pairs teach a
  * preference model nothing and inject label noise (the DPO paper's
  * own filtering concern).
  *
  * Scale shape: ONE corpus scan into the scored projection, one
  * shuffle on the source key for the rank window (the
  * [[TextOps.qualityPrune]] idiom — sources are few and fat; AQE's
  * skew split handles the imbalance, and a prompt-keyed production
  * corpus has millions of small groups, the benign regime), then a
  * role-explode + (source, pair-key) agg in place of the rank
  * self-join a SQL engine would write — Spark would re-scan and
  * re-window the whole corpus for the join's second side (see
  * [[prefPairsDocs]]). Cross-engine exactness: quality
  * scores are already rounded to 8 (identical doubles both engines),
  * the margin is round(chosen−rejected, 8) of those identical
  * doubles, and every window ties break on doc_id.
  */
object Preference {

  /** Acceptance floor on the round-8 quality margin — pairs whose
    * contrast is under 0.05 quality points are near-ties (label
    * noise for a preference model) and carry accepted=false.
    */
  private[graft] val PrefMinMargin = 0.05

  def prefPairs(spark: SparkSession, dir: String): DataFrame =
    prefPairsDocs(Tables.documents(spark, dir))

  private[graft] def prefPairsDocs(docs: DataFrame): DataFrame = {
    // score inline on the one scan — joining a scored projection back
    // would broadcast a corpus-sized table (or re-scan the corpus)
    val scored = docs.select(col("doc_id"), col("source"), col("n_chars"),
      TextOps.qualityScoreCol(col("text"), col("n_chars")).as("quality_score"))
    val wr = Window.partitionBy("source")
      .orderBy(col("quality_score").desc, col("doc_id"))
    val ranked = scored
      .withColumn("n_source", count(lit(1)).over(Window.partitionBy("source")))
      .withColumn("rnk", row_number().over(wr).cast("long"))
      .withColumn("half", floor(col("n_source") / lit(2)))
      // singleton groups have ⌊n/2⌋ = 0 — rank i would "pair" with
      // itself; a one-candidate prompt yields no preference signal
      .filter(col("n_source") >= 2)
    // a naive rank self-join re-scans and re-windows the corpus for
    // the rejected side (Spark duplicates the unmaterialized subtree);
    // instead each ranked row PLAYS BOTH ROLES — chosen at pair key
    // rnk (iff a partner exists ⌊n/2⌋ below: rnk + half ≤ n) and
    // rejected at pair key rnk − ⌊n/2⌋ (iff rnk > half) — and one
    // (source, key) agg zips the two roles: every group holds exactly
    // one of each by construction. One corpus scan, one window
    // shuffle, one pair-key agg.
    val side = explode(array(
      when(col("rnk") + col("half") <= col("n_source"),
        struct(col("rnk").as("k"), lit("c").as("role"), col("doc_id"),
          col("quality_score"), col("n_chars"))),
      when(col("rnk") > col("half"),
        struct((col("rnk") - col("half")).as("k"), lit("r").as("role"),
          col("doc_id"), col("quality_score"), col("n_chars")))))
    ranked.select(col("source"), side.as("s"))
      .filter(col("s").isNotNull)
      .groupBy(col("source"), col("s.k"))
      .agg(
        max(when(col("s.role") === "c", col("s.doc_id"))).as("chosen_id"),
        max(when(col("s.role") === "c", col("s.quality_score"))).as("chosen_q"),
        max(when(col("s.role") === "c", col("s.n_chars"))).as("chosen_chars"),
        max(when(col("s.role") === "r", col("s.doc_id"))).as("rejected_id"),
        max(when(col("s.role") === "r", col("s.quality_score"))).as("rejected_q"),
        max(when(col("s.role") === "r", col("s.n_chars"))).as("rejected_chars"))
      .withColumn("margin", round(col("chosen_q") - col("rejected_q"), 8))
      .withColumn("accepted", col("margin") >= PrefMinMargin)
      .select("source", "chosen_id", "rejected_id", "chosen_q", "rejected_q",
        "margin", "chosen_chars", "rejected_chars", "accepted")
  }

  /** The pair SELECT without its driver-determinism ORDER BY —
    * shared by [[prefPairsSql]] and [[prefStatsSql]]'s CTE so the
    * duals cannot drift.
    */
  private val prefPairsSelect: String =
    s"""WITH qs AS (
       |${TextOps.qualityScoreSelect}
       |), r AS (
       |  SELECT qs.doc_id, d.source, d.n_chars, qs.quality_score,
       |    count(*) OVER (PARTITION BY d.source) AS n_source,
       |    row_number() OVER (PARTITION BY d.source
       |      ORDER BY qs.quality_score DESC, qs.doc_id) AS rnk
       |  FROM qs JOIN documents d ON d.doc_id = qs.doc_id
       |)
       |SELECT c.source, c.doc_id AS chosen_id, j.doc_id AS rejected_id,
       |  c.quality_score AS chosen_q, j.quality_score AS rejected_q,
       |  round(c.quality_score - j.quality_score, 8) AS margin,
       |  c.n_chars AS chosen_chars, j.n_chars AS rejected_chars,
       |  (round(c.quality_score - j.quality_score, 8) >= $PrefMinMargin)
       |    AS accepted
       |FROM r c JOIN r j
       |  ON c.source = j.source AND j.rnk = c.rnk + c.n_source // 2
       |WHERE c.n_source >= 2""".stripMargin

  // chosen_id is unique across the pair set (each doc is chosen at
  // most once), and a bare `source` in the outer ORDER BY binds
  // ambiguously in DuckDB with both join sides in scope
  def prefPairsSql: String =
    prefPairsSelect + "\nORDER BY chosen_id"

  /** PREFERENCE-SET AUDIT: per-source pair count, mean accepted
    * margin, and the LENGTH-BIAS rate — the fraction of accepted
    * pairs whose chosen side is simply the longer document. Length
    * bias is the canonical preference-data pathology (a model trained
    * on length-confounded pairs learns verbosity, not quality —
    * Singhal et al. 2023); a rate near 1.0 tells the pipeline owner
    * the margin is acting as a length proxy and the scorer needs a
    * length-normalized term. The mean margin runs in scaled-integer
    * arithmetic (Σ round(margin·10⁸) with an explicit HALF_UP
    * integer division — see [[bestOfNDocs]] for the round-tie
    * rationale) and every ratio is integer-count arithmetic, so the
    * audit is cross-engine exact.
    * Scale: pairs-sized input (already O(corpus)), one hash agg on
    * the sources-sized key.
    */
  def prefStats(spark: SparkSession, dir: String): DataFrame =
    prefStatsPairs(prefPairs(spark, dir))

  private[graft] def prefStatsPairs(pairs: DataFrame): DataFrame =
    // mean_margin takes the scaled-integer HALF_UP division (see
    // bestOfNDocs: 8-dp sums over small counts terminate at the 9th
    // decimal often enough to hit the engines' round-tie divergence);
    // the char means divide integer sums by counts — quotients
    // terminate at ≤ log₂(n) decimals, outside the tie zone
    pairs.filter(col("accepted"))
      .groupBy("source")
      .agg(
        count(lit(1)).as("n_pairs"),
        sum(round(col("margin") * 1e8, 0).cast("long")).as("m8"),
        round(sum(when(col("chosen_chars") > col("rejected_chars"), 1L)
          .otherwise(0L)).cast("double") / count(lit(1)), 8)
          .as("len_bias_rate"),
        round(sum(col("chosen_chars")).cast("double") / count(lit(1)), 8)
          .as("mean_chosen_chars"),
        round(sum(col("rejected_chars")).cast("double") / count(lit(1)), 8)
          .as("mean_rejected_chars"))
      .withColumn("mean_margin",
        expr("(2 * m8 + n_pairs) DIV (2 * n_pairs)").cast("double") / 1e8)
      .select("source", "n_pairs", "mean_margin", "len_bias_rate",
        "mean_chosen_chars", "mean_rejected_chars")

  def prefStatsSql: String =
    s"""WITH p AS (
       |$prefPairsSelect
       |)
       |SELECT source, count(*)::BIGINT AS n_pairs,
       |  ((2 * sum(round(margin * 1e8)::BIGINT) + count(*))
       |    // (2 * count(*)))::DOUBLE / 1e8 AS mean_margin,
       |  round(sum(CASE WHEN chosen_chars > rejected_chars THEN 1
       |    ELSE 0 END)::DOUBLE / count(*), 8) AS len_bias_rate,
       |  round(sum(chosen_chars)::DOUBLE / count(*), 8)
       |    AS mean_chosen_chars,
       |  round(sum(rejected_chars)::DOUBLE / count(*), 8)
       |    AS mean_rejected_chars
       |FROM p WHERE accepted GROUP BY source ORDER BY source""".stripMargin

  /** Length-band width for [[prefPairsMatched]] — pure integer
    * banding (n_chars DIV 256), no log boundaries to ulp-diverge on.
    */
  private[graft] val PrefLenBand = 256L

  /** LENGTH-MATCHED preference pairing — the fix for the confound
    * [[prefStats]]' length-bias audit measures: when quality
    * correlates with length (it does here by construction — the
    * length term is 40% of the score), median-offset pairs teach a
    * preference model that LONGER IS BETTER. This variant runs the
    * same quality-ranked median-offset pairing WITHIN (source,
    * length-band) groups (fixed 256-char integer bands), so every
    * chosen/rejected pair differs by < 256 chars and the margin can
    * only come from the non-length quality terms — the standard
    * confound-control move (match on the nuisance variable, rank on
    * the treatment). Same plan shape as [[prefPairs]] (one corpus
    * scan, one window shuffle on the now-finer group key — MORE
    * groups, i.e. the benign direction — one role-explode pair agg);
    * the audit run over these pairs ([[prefStatsPairs]]) is how a
    * pipeline owner proves the bias dropped.
    */
  def prefPairsMatched(spark: SparkSession, dir: String): DataFrame =
    prefPairsMatchedDocs(Tables.documents(spark, dir))

  private[graft] def prefPairsMatchedDocs(docs: DataFrame): DataFrame = {
    val scored = docs.select(col("doc_id"), col("source"), col("n_chars"),
      expr(s"n_chars DIV $PrefLenBand").as("len_bucket"),
      TextOps.qualityScoreCol(col("text"), col("n_chars")).as("quality_score"))
    val wr = Window.partitionBy("source", "len_bucket")
      .orderBy(col("quality_score").desc, col("doc_id"))
    val ranked = scored
      .withColumn("n_grp", count(lit(1))
        .over(Window.partitionBy("source", "len_bucket")))
      .withColumn("rnk", row_number().over(wr).cast("long"))
      .withColumn("half", floor(col("n_grp") / lit(2)))
      .filter(col("n_grp") >= 2)
    val side = explode(array(
      when(col("rnk") + col("half") <= col("n_grp"),
        struct(col("rnk").as("k"), lit("c").as("role"), col("doc_id"),
          col("quality_score"), col("n_chars"))),
      when(col("rnk") > col("half"),
        struct((col("rnk") - col("half")).as("k"), lit("r").as("role"),
          col("doc_id"), col("quality_score"), col("n_chars")))))
    ranked.select(col("source"), col("len_bucket"), side.as("s"))
      .filter(col("s").isNotNull)
      .groupBy(col("source"), col("len_bucket"), col("s.k"))
      .agg(
        max(when(col("s.role") === "c", col("s.doc_id"))).as("chosen_id"),
        max(when(col("s.role") === "c", col("s.quality_score"))).as("chosen_q"),
        max(when(col("s.role") === "c", col("s.n_chars"))).as("chosen_chars"),
        max(when(col("s.role") === "r", col("s.doc_id"))).as("rejected_id"),
        max(when(col("s.role") === "r", col("s.quality_score"))).as("rejected_q"),
        max(when(col("s.role") === "r", col("s.n_chars"))).as("rejected_chars"))
      .withColumn("margin", round(col("chosen_q") - col("rejected_q"), 8))
      .withColumn("accepted", col("margin") >= PrefMinMargin)
      .select("source", "len_bucket", "chosen_id", "rejected_id",
        "chosen_q", "rejected_q", "margin", "chosen_chars",
        "rejected_chars", "accepted")
  }

  private val prefPairsMatchedSelect: String =
    s"""WITH qs AS (
       |${TextOps.qualityScoreSelect}
       |), r AS (
       |  SELECT qs.doc_id, d.source, d.n_chars,
       |    d.n_chars // $PrefLenBand AS len_bucket, qs.quality_score,
       |    count(*) OVER (PARTITION BY d.source, d.n_chars // $PrefLenBand)
       |      AS n_grp,
       |    row_number() OVER (
       |      PARTITION BY d.source, d.n_chars // $PrefLenBand
       |      ORDER BY qs.quality_score DESC, qs.doc_id) AS rnk
       |  FROM qs JOIN documents d ON d.doc_id = qs.doc_id
       |)
       |SELECT c.source, c.len_bucket, c.doc_id AS chosen_id,
       |  j.doc_id AS rejected_id,
       |  c.quality_score AS chosen_q, j.quality_score AS rejected_q,
       |  round(c.quality_score - j.quality_score, 8) AS margin,
       |  c.n_chars AS chosen_chars, j.n_chars AS rejected_chars,
       |  (round(c.quality_score - j.quality_score, 8) >= $PrefMinMargin)
       |    AS accepted
       |FROM r c JOIN r j
       |  ON c.source = j.source AND c.len_bucket = j.len_bucket
       |  AND j.rnk = c.rnk + c.n_grp // 2
       |WHERE c.n_grp >= 2""".stripMargin

  def prefPairsMatchedSql: String =
    prefPairsMatchedSelect + "\nORDER BY chosen_id"

  /** [[prefStats]] over the LENGTH-MATCHED pairs — the before/after
    * reading of the bias fix: len_bias_rate here vs q_pref_stats'
    * unmatched rate is the audit pair a pipeline owner compares.
    */
  def prefStatsMatched(spark: SparkSession, dir: String): DataFrame =
    prefStatsPairs(prefPairsMatched(spark, dir))

  def prefStatsMatchedSql: String =
    s"""WITH p AS (
       |$prefPairsMatchedSelect
       |)
       |SELECT source, count(*)::BIGINT AS n_pairs,
       |  ((2 * sum(round(margin * 1e8)::BIGINT) + count(*))
       |    // (2 * count(*)))::DOUBLE / 1e8 AS mean_margin,
       |  round(sum(CASE WHEN chosen_chars > rejected_chars THEN 1
       |    ELSE 0 END)::DOUBLE / count(*), 8) AS len_bias_rate,
       |  round(sum(chosen_chars)::DOUBLE / count(*), 8)
       |    AS mean_chosen_chars,
       |  round(sum(rejected_chars)::DOUBLE / count(*), 8)
       |    AS mean_rejected_chars
       |FROM p WHERE accepted GROUP BY source ORDER BY source""".stripMargin

  /** Candidates per synthetic prompt group — production keys on the
    * real prompt id; 4 is the common best-of-n sampling budget.
    */
  private[graft] val BestOfNGroup = 4L

  /** BEST-OF-N SELECTION (rejection sampling) — the RFT-style sibling
    * of [[prefPairs]]: instead of pairing, each prompt group keeps its
    * single best candidate (quality desc, doc_id tiebreak) and reports
    * the SELECTION MARGIN over the runner-up — a near-zero margin
    * flags groups where the "best" is a coin flip and the kept sample
    * is as noisy as a rejected one (the filtering signal an RFT
    * pipeline thresholds on). Groups are doc_id DIV 4 here (production
    * swaps in the prompt id; the score column swaps for a reward
    * model / verifier pass rate).
    *
    * Scale: one corpus scan, one shuffle on the group key — millions
    * of tiny groups, the benign window regime (contrast the few-fat
    * [[prefPairs]] source windows); the rank + conditional-agg pair
    * collapses to a single exchange since the agg reuses the window's
    * clustering. All selection logic is integer/rounded-double
    * arithmetic — cross-engine exact.
    */
  def bestOfN(spark: SparkSession, dir: String): DataFrame =
    bestOfNDocs(Tables.documents(spark, dir))

  private[graft] def bestOfNDocs(docs: DataFrame): DataFrame = {
    val scored = docs.select(col("doc_id"),
      floor(col("doc_id") / lit(BestOfNGroup)).as("group_id"),
      TextOps.qualityScoreCol(col("text"), col("n_chars")).as("q"))
    val wr = Window.partitionBy("group_id")
      .orderBy(col("q").desc, col("doc_id"))
    // the mean divides an 8-dp sum by a small group count — a shape
    // that TERMINATES at the 9th decimal often enough to hit the
    // engines' round-tie divergence (Spark HALF_UP on the shortest
    // repr vs DuckDB on the binary value), so the mean runs in
    // scaled-INTEGER arithmetic end to end: S = Σ round(q·10⁸),
    // HALF_UP(S/n) = (2S + n) DIV (2n), back to an 8-dp double
    scored.withColumn("rn", row_number().over(wr))
      .groupBy("group_id")
      .agg(
        count(lit(1)).as("n_cands"),
        max(when(col("rn") === 1, col("doc_id"))).as("best_id"),
        max(when(col("rn") === 1, col("q"))).as("best_q"),
        max(when(col("rn") === 2, col("q"))).as("second_q"),
        sum(round(col("q") * 1e8, 0).cast("long")).as("s8"))
      .withColumn("mean_q",
        expr("(2 * s8 + n_cands) DIV (2 * n_cands)").cast("double") / 1e8)
      .withColumn("sel_margin",
        when(col("second_q").isNotNull,
          round(col("best_q") - col("second_q"), 8)))
      .select("group_id", "n_cands", "best_id", "best_q", "second_q",
        "sel_margin", "mean_q")
  }

  def bestOfNSql: String =
    s"""WITH s AS (
       |  SELECT doc_id, doc_id // $BestOfNGroup AS group_id, quality_score AS q
       |  FROM (${TextOps.qualityScoreSelect.replace("\n", "\n  ")})
       |), r AS (
       |  SELECT *, row_number() OVER (PARTITION BY group_id
       |    ORDER BY q DESC, doc_id) AS rn
       |  FROM s
       |)
       |SELECT group_id, count(*)::BIGINT AS n_cands,
       |  max(CASE WHEN rn = 1 THEN doc_id END) AS best_id,
       |  max(CASE WHEN rn = 1 THEN q END) AS best_q,
       |  max(CASE WHEN rn = 2 THEN q END) AS second_q,
       |  round(max(CASE WHEN rn = 1 THEN q END)
       |    - max(CASE WHEN rn = 2 THEN q END), 8) AS sel_margin,
       |  ((2 * sum(round(q * 1e8)::BIGINT) + count(*))
       |    // (2 * count(*)))::DOUBLE / 1e8 AS mean_q
       |FROM r GROUP BY group_id ORDER BY group_id""".stripMargin
}
