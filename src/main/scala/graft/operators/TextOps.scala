package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Text-analysis operators for a large-scale training-data pipeline,
  * run over the `documents` table. All fully declarative (codegen'd
  * built-ins only — no UDFs), so they scan-prune, pushdown, and
  * whole-stage-codegen at 100 TB: each query is a single narrow
  * map over the parquet scan with no shuffle at all (ORDER BY at the
  * end is for oracle determinism and is a driver-side nicety at
  * verify scale; drop it for pipeline use).
  */
object TextOps {

  /** Whitespace class equal to RE2's `\s` (space, \t, \n, \f, \r).
    * Java's `\s` ALSO matches vertical tab (\x0B), which DuckDB's
    * regex engine does not — using the explicit class on the Spark
    * side keeps tokenization identical to the oracle on any input,
    * not just the \x0B-free synthetic corpus.
    */
  private[graft] val Ws = " \\t\\n\\f\\r"

  private def words(c: Column): Column = split(trim(c), s"[$Ws]+")

  private val stopEn = Seq("the", "and", "of", "to", "a", "in", "is")
  private val stopFr = Seq("le", "la", "et", "les", "des", "un", "une")
  private val stopEs = Seq("el", "y", "de", "los", "un", "una")
  private val stopDe = Seq("der", "die", "und", "das", "ein", "nicht")

  private def stopHits(ws: Column, stops: Seq[String]): Column =
    size(filter(ws, w => array_contains(lit(stops.toArray), w)))

  /** Shared pre-tokenize normalization (lowercase, strip
    * non-alphanumerics, collapse whitespace, split) — used by both
    * [[cleanText]] and [[Bpe]] so their vocabularies can't diverge.
    */
  private[operators] def normalizedWords: Column =
    split(trim(regexp_replace(regexp_replace(lower(trim(col("text"))),
      s"[^a-z0-9$Ws]", " "), s"[$Ws]+", " ")), " ")

  private def sqlStopHits(stops: Seq[String]): String =
    s"len(list_filter(ws, w -> w IN (${stops.map("'" + _ + "'").mkString(", ")})))"

  /** Token counting: whitespace tokens, BPE-ish regex tokens
    * (letter runs / single digits / single symbols), and the
    * chars/4 approximation.
    */
  def tokenCount(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(
        col("doc_id"),
        col("n_chars"),
        size(words(col("text"))).as("n_ws_tokens"),
        regexp_count(col("text"), lit("[a-z]+|[0-9]|[^a-z0-9 \\t\\n]")).as("n_bpe_tokens"),
        ceil(col("n_chars") / 4.0).cast("long").as("n_approx_tokens"))

  def tokenCountSql: String =
    """SELECT doc_id, n_chars,
      |  len(string_split_regex(trim(text), '\s+')) AS n_ws_tokens,
      |  len(regexp_extract_all(text, '[a-z]+|[0-9]|[^a-z0-9 \t\n]')) AS n_bpe_tokens,
      |  CAST(ceil(n_chars / 4.0) AS BIGINT) AS n_approx_tokens
      |FROM documents ORDER BY doc_id""".stripMargin

  /** TOKENIZER FERTILITY REPORT — tokens-per-word and chars-per-token
    * by (lang, source): the table a tokenizer owner reads to spot
    * segments the vocabulary serves poorly (high fertility = more
    * compute per word of signal; the multilingual-tokenizer audit).
    * Rides [[tokenCount]]'s exact integer counts — the three ratios
    * are each ONE division of exact Long sums (scaled display round),
    * so hash parity is free.
    *
    * Scale shape: per-doc narrow counts collapse into a
    * (lang × source)-sized partial aggregate — map-side combine, one
    * tiny shuffle.
    */
  def tokenFertility(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("lang"), col("source"), col("n_chars"),
        size(words(col("text"))).as("ws"),
        regexp_count(col("text"),
          lit("[a-z]+|[0-9]|[^a-z0-9 \\t\\n]")).as("bpe"))
      .groupBy("lang", "source")
      .agg(count(lit(1)).as("n_docs"),
        sum("ws").as("ws_tokens"), sum("bpe").as("bpe_tokens"),
        sum("n_chars").as("chars"))
      .withColumn("fertility", expr(
        "round(CAST(bpe_tokens AS DOUBLE) / ws_tokens" +
          " * 1000000.0D, 0) / 1000000.0D"))
      .withColumn("chars_per_token", expr(
        "round(CAST(chars AS DOUBLE) / bpe_tokens" +
          " * 1000000.0D, 0) / 1000000.0D"))
      .withColumn("tokens_per_doc", expr(
        "round(CAST(bpe_tokens AS DOUBLE) / n_docs" +
          " * 1000000.0D, 0) / 1000000.0D"))
      .select("lang", "source", "n_docs", "ws_tokens", "bpe_tokens",
        "chars", "fertility", "chars_per_token", "tokens_per_doc")

  def tokenFertilitySql: String =
    """WITH c AS (
      |  SELECT lang, source, n_chars,
      |    len(string_split_regex(trim(text), '\s+')) AS ws,
      |    len(regexp_extract_all(text, '[a-z]+|[0-9]|[^a-z0-9 \t\n]')) AS bpe
      |  FROM documents
      |), g AS (
      |  SELECT lang, source, count(*) AS n_docs,
      |    sum(ws)::BIGINT AS ws_tokens, sum(bpe)::BIGINT AS bpe_tokens,
      |    sum(n_chars)::BIGINT AS chars
      |  FROM c GROUP BY 1, 2
      |)
      |SELECT lang, source, n_docs, ws_tokens, bpe_tokens, chars,
      |  round(bpe_tokens::DOUBLE / ws_tokens * 1000000.0, 0) / 1000000.0
      |    AS fertility,
      |  round(chars::DOUBLE / bpe_tokens * 1000000.0, 0) / 1000000.0
      |    AS chars_per_token,
      |  round(bpe_tokens::DOUBLE / n_docs * 1000000.0, 0) / 1000000.0
      |    AS tokens_per_doc
      |FROM g ORDER BY lang, source""".stripMargin

  /** Document token-LENGTH DISTRIBUTION in power-of-two buckets — the
    * sequence-length profile that sizes packing budgets, batch
    * shapes, and length-based curricula before a training run. The
    * bucket is the bit width of the whitespace token count (an exact
    * integer on both engines — `length(bin(n))`, no float log), with
    * its [lo, hi] range, doc and token mass, and the doc share in
    * ppm.
    *
    * Scale shape: one narrow projection into a ~60-cell partial agg;
    * the corpus-total denominator is a sum over the AGGREGATED hist
    * (an unpartitioned window over ~60 cells — never a second corpus
    * scan and never a window over the corpus; the earlier
    * agg+broadcast-join formulation re-evaluated the hist subtree,
    * i.e. two parquet scans unless AQE happened to reuse the
    * exchange).
    */
  def docLengthHist(spark: SparkSession, dir: String): DataFrame =
    docLengthHistDocs(Tables.documents(spark, dir))

  private[graft] def docLengthHistDocs(docs: DataFrame): DataFrame = {
    val hist = docs
      .select(size(words(col("text"))).cast("long").as("n_tok"))
      .select((length(bin(col("n_tok"))) - 1).cast("long").as("bucket"),
        col("n_tok"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_docs"), sum("n_tok").as("sum_tokens"))
    val all = Window.partitionBy()
    hist
      .withColumn("total_docs", sum("n_docs").over(all))
      .select(col("bucket"),
        expr("CAST(power(2, bucket) AS BIGINT)").as("lo_tokens"),
        (expr("CAST(power(2, bucket + 1) AS BIGINT)") - 1).as("hi_tokens"),
        col("n_docs"), col("sum_tokens"),
        expr("n_docs * 1000000 DIV total_docs").as("doc_ppm"))
  }

  /** DuckDB dual of [[docLengthHist]]: same bit-width bucket off the
    * same whitespace token count.
    */
  def docLengthHistSql: String =
    """WITH t AS (
      |  SELECT len(string_split_regex(trim(text), '\s+'))::BIGINT AS n_tok
      |  FROM documents
      |), b AS (
      |  SELECT (length(bin(n_tok)) - 1)::BIGINT AS bucket, n_tok FROM t
      |), h AS (
      |  SELECT bucket, count(*)::BIGINT AS n_docs,
      |    sum(n_tok)::BIGINT AS sum_tokens
      |  FROM b GROUP BY bucket
      |), tt AS (SELECT sum(n_docs)::BIGINT AS total_docs FROM h)
      |SELECT bucket, CAST(power(2, bucket) AS BIGINT) AS lo_tokens,
      |  CAST(power(2, bucket + 1) AS BIGINT) - 1 AS hi_tokens,
      |  n_docs, sum_tokens,
      |  (n_docs * 1000000 // total_docs)::BIGINT AS doc_ppm
      |FROM h, tt ORDER BY bucket""".stripMargin

  /** Quality scoring: length, punctuation ratio, stopword ratio,
    * mean word length → bounded [0,1] composite score.
    */
  def qualityScore(spark: SparkSession, dir: String): DataFrame =
    qualityScoreDocs(Curation.fanDocs(Tables.documents(spark, dir)))

  /** The round-8 composite quality score as ONE column expression
    * over (text, n_chars) — the single-scan composition surface:
    * [[Preference.prefPairsDocs]] computes it inline next to the
    * pairing columns (a join back to the scored frame would either
    * broadcast a corpus-sized table or re-scan), and
    * [[qualityScoreDocs]] builds its report from the same definition
    * so the two can never drift.
    */
  private[graft] def qualityScoreCol(text: Column, nChars: Column): Column = {
    val ws = words(text)
    val nWords = size(ws).cast("double")
    val punctChars = length(regexp_replace(text, "[a-z0-9 \\t\\n]", "")).cast("double")
    val stopRatio = stopHits(ws, stopEn).cast("double") / nWords
    val punctRatio = punctChars / nChars.cast("double")
    val lengthScore = least(nWords / 100.0, lit(1.0))
    round(lit(0.4) * lengthScore + lit(0.3) * least(stopRatio * 5.0, lit(1.0))
      + lit(0.3) * (lit(1.0) - least(punctRatio * 10.0, lit(1.0))), 8)
  }

  /** [[qualityScore]] over an explicit `documents`-shaped frame —
    * the composition surface the specs score arbitrary corpora
    * through.
    */
  private[graft] def qualityScoreDocs(docs: DataFrame): DataFrame = {
    val ws = words(col("text"))
    val nWords = size(ws).cast("double")
    val alphaChars = length(regexp_replace(col("text"), "[^a-z]", "")).cast("double")
    val punctChars = length(regexp_replace(col("text"), "[a-z0-9 \\t\\n]", "")).cast("double")
    val stopRatio = stopHits(ws, stopEn).cast("double") / nWords
    val punctRatio = punctChars / col("n_chars").cast("double")
    docs
      .select(
        col("doc_id"),
        size(ws).as("n_words"),
        round(alphaChars / nWords, 8).as("mean_word_len"),
        round(stopRatio, 8).as("stopword_ratio"),
        round(punctRatio, 8).as("punct_ratio"),
        qualityScoreCol(col("text"), col("n_chars")).as("quality_score"))
  }

  /** The score SELECT without its driver-determinism ORDER BY —
    * shared by [[qualityScoreSql]], [[qualityPruneSql]]'s CTE, and
    * Dedup's quality-weighted canonical oracle.
    */
  private[operators] val qualityScoreSelect: String =
    """SELECT doc_id,
      |  len(ws) AS n_words,
      |  round(alpha_chars / n_words_d, 8) AS mean_word_len,
      |  round(stop_ratio, 8) AS stopword_ratio,
      |  round(punct_ratio, 8) AS punct_ratio,
      |  round(0.4 * least(n_words_d / 100.0, 1.0)
      |    + 0.3 * least(stop_ratio * 5.0, 1.0)
      |    + 0.3 * (1.0 - least(punct_ratio * 10.0, 1.0)), 8) AS quality_score
      |FROM (
      |  SELECT doc_id, ws,
      |    len(ws)::DOUBLE AS n_words_d,
      |    length(regexp_replace(text, '[^a-z]', '', 'g'))::DOUBLE AS alpha_chars,
      |    len(list_filter(ws, w -> w IN ('the', 'and', 'of', 'to', 'a', 'in', 'is')))::DOUBLE
      |      / len(ws) AS stop_ratio,
      |    length(regexp_replace(text, '[a-z0-9 \t\n]', '', 'g'))::DOUBLE
      |      / n_chars AS punct_ratio
      |  FROM (SELECT doc_id, text, n_chars,
      |          string_split_regex(trim(text), '\s+') AS ws
      |        FROM documents))""".stripMargin

  def qualityScoreSql: String =
    qualityScoreSelect + "\nORDER BY doc_id"

  /** Per-domain quality PRUNING: keep each source's top half by
    * quality score — the mixture-level quality gate (a global cutoff
    * would empty weak domains entirely; per-domain ranks preserve the
    * mixture while dropping each domain's worst mass).
    *
    * Deliberately RANK-based, not threshold-based: keep = rank ≤
    * ⌈n/2⌉ under the deterministic (score desc, doc_id) order — all
    * integer logic, so the verdict is cross-engine exact, where an
    * interpolated percentile cutoff would sit at ulp-divergent
    * midpoints. One shuffle on the source key for both windows.
    */
  def qualityPrune(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val scored = qualityScore(spark, dir).select("doc_id", "quality_score")
    val src = Tables.documents(spark, dir).select("doc_id", "source")
    val w = Window.partitionBy("source")
    val wr = Window.partitionBy("source")
      .orderBy(col("quality_score").desc, col("doc_id"))
    scored.join(src, "doc_id")
      .withColumn("n_source", count(lit(1)).over(w))
      .withColumn("rank_in_source", row_number().over(wr))
      .withColumn("keep_doc", col("rank_in_source") * 2 <= col("n_source") + 1)
      .select("doc_id", "source", "quality_score", "n_source",
        "rank_in_source", "keep_doc")
  }

  def qualityPruneSql: String =
    s"""WITH qs AS (
      |$qualityScoreSelect
      |)
      |SELECT doc_id, source, quality_score, n_source, rank_in_source,
      |  (rank_in_source * 2 <= n_source + 1) AS keep_doc
      |FROM (
      |  SELECT qs.doc_id, d.source, qs.quality_score,
      |    count(*) OVER (PARTITION BY d.source) AS n_source,
      |    row_number() OVER (PARTITION BY d.source
      |      ORDER BY qs.quality_score DESC, qs.doc_id) AS rank_in_source
      |  FROM qs JOIN documents d ON d.doc_id = qs.doc_id)
      |ORDER BY doc_id""".stripMargin

  /** Heuristic language ID: CJK charset test, then stopword-hit
    * argmax with deterministic tiebreak order en > fr > es > de.
    */
  def langId(spark: SparkSession, dir: String): DataFrame = {
    val ws = words(col("text"))
    val sEn = stopHits(ws, stopEn)
    val sFr = stopHits(ws, stopFr)
    val sEs = stopHits(ws, stopEs)
    val sDe = stopHits(ws, stopDe)
    val cjk = regexp_count(col("text"), lit("[一-龥]"))
    val predicted = when(cjk > 0, lit("zh"))
      .when(sEn >= sFr && sEn >= sEs && sEn >= sDe, lit("en"))
      .when(sFr >= sEs && sFr >= sDe, lit("fr"))
      .when(sEs >= sDe, lit("es"))
      .otherwise(lit("de"))
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"),
        sEn.as("hits_en"), sFr.as("hits_fr"), sEs.as("hits_es"), sDe.as("hits_de"),
        predicted.as("predicted_lang"))
      .withColumn("is_match", col("predicted_lang") === col("lang"))
  }

  def langIdSql: String =
    s"""SELECT doc_id, lang, hits_en, hits_fr, hits_es, hits_de,
       |  CASE WHEN cjk > 0 THEN 'zh'
       |       WHEN hits_en >= hits_fr AND hits_en >= hits_es AND hits_en >= hits_de THEN 'en'
       |       WHEN hits_fr >= hits_es AND hits_fr >= hits_de THEN 'fr'
       |       WHEN hits_es >= hits_de THEN 'es'
       |       ELSE 'de' END AS predicted_lang,
       |  (CASE WHEN cjk > 0 THEN 'zh'
       |       WHEN hits_en >= hits_fr AND hits_en >= hits_es AND hits_en >= hits_de THEN 'en'
       |       WHEN hits_fr >= hits_es AND hits_fr >= hits_de THEN 'fr'
       |       WHEN hits_es >= hits_de THEN 'es'
       |       ELSE 'de' END) = lang AS is_match
       |FROM (
       |  SELECT doc_id, lang,
       |    ${sqlStopHits(stopEn)} AS hits_en,
       |    ${sqlStopHits(stopFr)} AS hits_fr,
       |    ${sqlStopHits(stopEs)} AS hits_es,
       |    ${sqlStopHits(stopDe)} AS hits_de,
       |    len(regexp_extract_all(text, '[一-龥]')) AS cjk
       |  FROM (SELECT doc_id, lang, text,
       |          string_split_regex(trim(text), '\\s+') AS ws
       |        FROM documents))
       |ORDER BY doc_id""".stripMargin

  /** Language-ID EVALUATION — the confusion matrix of [[langId]]
    * against the corpus' gold `lang` labels, the report that decides
    * whether the heuristic is good enough to route documents: per
    * (gold, predicted) cell count, the gold class total, and recall
    * in ppm (integer arithmetic — `DIV` here, `//` in the oracle — so
    * the ratio is hash-exact, the same trick the samplers use).
    *
    * Scale shape: one aggregation over the classifier projection to a
    * languages² sized result; the window runs on the aggregated
    * cells, not the corpus.
    */
  def langIdEval(spark: SparkSession, dir: String): DataFrame =
    langId(spark, dir)
      .groupBy("lang", "predicted_lang")
      .agg(count(lit(1)).as("n_docs"))
      .withColumn("n_gold",
        sum("n_docs").over(Window.partitionBy("lang")))
      .withColumn("recall_ppm", expr("n_docs * 1000000 DIV n_gold"))

  def langIdEvalSql: String =
    s"""WITH li AS (${langIdSql.replace("ORDER BY doc_id", "")}
       |)
       |SELECT lang, predicted_lang, count(*)::BIGINT AS n_docs,
       |  sum(count(*)) OVER (PARTITION BY lang)::BIGINT AS n_gold,
       |  ((count(*) * 1000000) // (sum(count(*)) OVER (PARTITION BY lang)))::BIGINT
       |    AS recall_ppm
       |FROM li GROUP BY lang, predicted_lang
       |ORDER BY lang, predicted_lang""".stripMargin

  /** MIXED-LANGUAGE DETECTION — the CCNet-class curation gate
    * [[langId]] cannot express: a document whose 20-word blocks
    * classify to DIFFERENT languages is usually navigation chrome,
    * parallel-text scrape, or template spam glued to content, and
    * language-routed pipelines want it flagged before a single-label
    * router misfiles it. Per doc: words split into 20-word blocks,
    * each block classified by the SAME stopword-argmax chain as
    * [[langId]] (CJK test per block via a char-class match), then the
    * per-language block counts roll up to the dominant language, its
    * block share (ppm — integer DIV, hash-exact), the distinct
    * language count, and the verdict `is_mixed` (≥2 languages AND
    * dominant share < 80%).
    *
    * Scale shape: the [[lexicalDiversity]] family's ZERO-shuffle
    * narrow scan — blocks, per-block classification, and the rollup
    * all run as HOF folds inside the row; nothing leaves its
    * partition but the final ~12-column projection. All integer
    * logic → the oracle replays the identical block partitioning
    * with DuckDB list lambdas and hashes exactly.
    */
  def langMix(spark: SparkSession, dir: String): DataFrame =
    langMixDocs(Curation.fanDocs(Tables.documents(spark, dir)))

  /** Unordered kernel — the streaming dual serves THIS (stateless
    * per-row folds; the dir-level wrapper adds only the oracle
    * determinism sort).
    */
  private[graft] def langMixDocs(docs: DataFrame): DataFrame = {
    val bsz = 20
    def hitsIn(b: String, stops: Seq[String]): String =
      s"size(filter($b, w -> w IN (${stops.map("'" + _ + "'").mkString(", ")})))"
    val predBlock =
      s"""CASE WHEN exists(b, w -> w rlike '[一-龥]') THEN 'zh'
         |  WHEN ${hitsIn("b", stopEn)} >= ${hitsIn("b", stopFr)}
         |   AND ${hitsIn("b", stopEn)} >= ${hitsIn("b", stopEs)}
         |   AND ${hitsIn("b", stopEn)} >= ${hitsIn("b", stopDe)} THEN 'en'
         |  WHEN ${hitsIn("b", stopFr)} >= ${hitsIn("b", stopEs)}
         |   AND ${hitsIn("b", stopFr)} >= ${hitsIn("b", stopDe)} THEN 'fr'
         |  WHEN ${hitsIn("b", stopEs)} >= ${hitsIn("b", stopDe)} THEN 'es'
         |  ELSE 'de' END""".stripMargin
    def nOf(lang: String): Column =
      expr(s"size(filter(preds, p -> p = '$lang'))").cast("long")
    val langs = Seq("en", "fr", "es", "de", "zh")
    val counts = langs.map(l => nOf(l).as(s"n_$l"))
    val dom = expr(
      """CASE
        |  WHEN n_en >= n_fr AND n_en >= n_es AND n_en >= n_de AND n_en >= n_zh THEN 'en'
        |  WHEN n_fr >= n_es AND n_fr >= n_de AND n_fr >= n_zh THEN 'fr'
        |  WHEN n_es >= n_de AND n_es >= n_zh THEN 'es'
        |  WHEN n_de >= n_zh THEN 'de'
        |  ELSE 'zh' END""".stripMargin)
    val domCount = expr("greatest(n_en, n_fr, n_es, n_de, n_zh)")
    val nLangs = langs.map(l => when(col(s"n_$l") > 0, 1).otherwise(0))
      .reduce(_ + _)
    docs
      .select(col("doc_id"), col("lang"), words(col("text")).as("ws"))
      .withColumn("blocks", expr(
        s"transform(sequence(0, CAST(ceil(size(ws) / $bsz.0) AS INT) - 1)," +
          s" i -> slice(ws, i * $bsz + 1, $bsz))"))
      .withColumn("preds", expr(
        s"transform(blocks, b -> $predBlock)"))
      .select(Seq(col("doc_id"), col("lang"),
        size(col("preds")).cast("long").as("n_blocks")) ++ counts: _*)
      .withColumn("dom_lang", dom)
      .withColumn("dom_share_ppm",
        expr("greatest(n_en, n_fr, n_es, n_de, n_zh) * 1000000 DIV n_blocks"))
      .withColumn("n_langs", nLangs.cast("long"))
      .withColumn("is_mixed",
        col("n_langs") >= 2 && col("dom_share_ppm") < 800000)
  }

  def langMixSql: String = {
    def hitsIn(stops: Seq[String]): String =
      s"len(list_filter(b, w -> w IN (${stops.map("'" + _ + "'").mkString(", ")})))"
    val predBlock =
      s"""CASE WHEN len(list_filter(b, w -> regexp_matches(w, '[一-龥]'))) > 0 THEN 'zh'
         |  WHEN ${hitsIn(stopEn)} >= ${hitsIn(stopFr)}
         |   AND ${hitsIn(stopEn)} >= ${hitsIn(stopEs)}
         |   AND ${hitsIn(stopEn)} >= ${hitsIn(stopDe)} THEN 'en'
         |  WHEN ${hitsIn(stopFr)} >= ${hitsIn(stopEs)}
         |   AND ${hitsIn(stopFr)} >= ${hitsIn(stopDe)} THEN 'fr'
         |  WHEN ${hitsIn(stopEs)} >= ${hitsIn(stopDe)} THEN 'es'
         |  ELSE 'de' END""".stripMargin
    s"""WITH w AS (
       |  SELECT doc_id, lang,
       |    string_split_regex(trim(text), '\\s+') AS ws
       |  FROM documents
       |), blocked AS (
       |  SELECT doc_id, lang,
       |    list_transform(
       |      generate_series(0, CAST(ceil(len(ws) / 20.0) AS INT) - 1),
       |      i -> ws[i * 20 + 1 : i * 20 + 20]) AS blocks
       |  FROM w
       |), preds AS (
       |  SELECT doc_id, lang,
       |    list_transform(blocks, b -> $predBlock) AS preds
       |  FROM blocked
       |), counted AS (
       |  SELECT doc_id, lang, len(preds)::BIGINT AS n_blocks,
       |    len(list_filter(preds, p -> p = 'en'))::BIGINT AS n_en,
       |    len(list_filter(preds, p -> p = 'fr'))::BIGINT AS n_fr,
       |    len(list_filter(preds, p -> p = 'es'))::BIGINT AS n_es,
       |    len(list_filter(preds, p -> p = 'de'))::BIGINT AS n_de,
       |    len(list_filter(preds, p -> p = 'zh'))::BIGINT AS n_zh
       |  FROM preds
       |)
       |SELECT doc_id, lang, n_blocks, n_en, n_fr, n_es, n_de, n_zh,
       |  CASE
       |    WHEN n_en >= n_fr AND n_en >= n_es AND n_en >= n_de AND n_en >= n_zh THEN 'en'
       |    WHEN n_fr >= n_es AND n_fr >= n_de AND n_fr >= n_zh THEN 'fr'
       |    WHEN n_es >= n_de AND n_es >= n_zh THEN 'es'
       |    WHEN n_de >= n_zh THEN 'de'
       |    ELSE 'zh' END AS dom_lang,
       |  (greatest(n_en, n_fr, n_es, n_de, n_zh) * 1000000 // n_blocks)::BIGINT
       |    AS dom_share_ppm,
       |  ((n_en > 0)::INT + (n_fr > 0)::INT + (n_es > 0)::INT
       |    + (n_de > 0)::INT + (n_zh > 0)::INT)::BIGINT AS n_langs,
       |  ((n_en > 0)::INT + (n_fr > 0)::INT + (n_es > 0)::INT
       |      + (n_de > 0)::INT + (n_zh > 0)::INT >= 2
       |    AND (greatest(n_en, n_fr, n_es, n_de, n_zh) * 1000000 // n_blocks) < 800000)
       |    AS is_mixed
       |FROM counted ORDER BY doc_id""".stripMargin
  }

  /** Fixed-size document chunking with overlap — the
    * context-window-preparation op of a training pipeline: each doc
    * becomes ⌈n/stride⌉ character chunks of `size` chars advancing by
    * `stride` (= size − overlap). Narrow, shuffle-free explode.
    */
  def chunkDocs(spark: SparkSession, dir: String): DataFrame = {
    val size = 200
    val stride = 150 // 50-char overlap
    Tables.documents(spark, dir)
      .select(col("doc_id"), posexplode(expr(
        s"transform(sequence(0, CAST(ceil(greatest(n_chars - $size, 0) / $stride.0) AS INT)), " +
          s"i -> substring(text, i * $stride + 1, $size))"))
        .as(Seq("chunk_idx", "chunk")))
      .withColumn("chunk_len", length(col("chunk")))
      .filter(col("chunk_len") > 0)
  }

  def chunkDocsSql: String =
    """SELECT doc_id, i AS chunk_idx, chunk, length(chunk) AS chunk_len
      |FROM (
      |  SELECT doc_id, i,
      |    substr(text, (i * 150 + 1)::INT, 200) AS chunk
      |  FROM (
      |    SELECT doc_id, text, unnest(range(0,
      |      CAST(ceil(greatest(n_chars - 200, 0) / 150.0) AS INT) + 1)) AS i
      |    FROM documents))
      |WHERE length(chunk) > 0
      |ORDER BY doc_id, chunk_idx""".stripMargin

  /** Corpus-likelihood quality proxy: score each document by the
    * share of its character bigrams that are COMMON in the corpus
    * (corpus count ≥ total/200) — a perplexity-style fluency signal
    * without a language model. Gibberish and wrong-charset text score
    * low; fluent text scores high.
    *
    * Shape: one corpus pass trains the bigram count model (explode →
    * map-side-combined groupBy); scoring joins each doc's bigrams to
    * the model (model is vocab-sized → broadcast at scale). All
    * arithmetic until the final ratio is INTEGER (count·200 vs
    * total), so Spark and DuckDB agree bit-exactly.
    */
  def bigramQuality(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), lower(col("text")).as("t"))
    // native single-pass n-gram expression; the interpreted HOF
    // formulation measures ~1.3× slower here (explode dominates on
    // short docs) and degrades further with document length
    val grams = docs.select(col("doc_id"),
      explode(graft.functions.CharNgrams.char_ngrams(col("t"), 2)).as("g"))
    // cache the vocab-sized model so the total action below and the
    // broadcast join probe reuse one corpus aggregation pass instead
    // of re-scanning and re-exploding the documents per consumer
    val counts = grams.groupBy("g").agg(count(lit(1)).as("cnt")).cache()
    val total = Option(counts.agg(sum("cnt")).head.get(0))
      .map(_.asInstanceOf[Long]).getOrElse(0L) // empty corpus → 0
    grams.join(broadcast(counts), "g")
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_bigrams"),
        count(when(col("cnt") * 200L >= total, 1)).as("n_common"),
        (count(when(col("cnt") * 200L >= total, 1)).cast("double") /
          count(lit(1))).as("common_ratio"))
  }

  def bigramQualitySql: String =
    """WITH docs AS (SELECT doc_id, lower(text) AS t FROM documents),
      |grams AS (
      |  SELECT doc_id, substr(t, i::INT, 2) AS g
      |  FROM (SELECT doc_id, t,
      |          unnest(range(1, greatest(length(t) - 1, 0) + 1)) AS i
      |        FROM docs)),
      |counts AS (SELECT g, count(*) AS cnt FROM grams GROUP BY g),
      |total AS (SELECT count(*) AS n FROM grams)
      |SELECT doc_id, count(*) AS n_bigrams,
      |  (count(*) FILTER (WHERE cnt * 200 >= n))::BIGINT AS n_common,
      |  (count(*) FILTER (WHERE cnt * 200 >= n))::DOUBLE / count(*)
      |    AS common_ratio
      |FROM grams JOIN counts USING (g) CROSS JOIN total
      |GROUP BY doc_id ORDER BY doc_id""".stripMargin

  /** Text cleaning: lowercase, strip non-alphanumerics, collapse
    * whitespace, drop english stopwords — the standard pre-tokenize
    * normalization pass.
    */
  def cleanText(spark: SparkSession, dir: String): DataFrame = {
    val kept = filter(normalizedWords,
      w => !array_contains(lit(stopEn.toArray), w) && w =!= "")
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        array_join(kept, " ").as("clean_text"),
        size(kept).as("n_clean_tokens"))
  }

  def cleanTextSql: String =
    s"""SELECT doc_id,
       |  array_to_string(kept, ' ') AS clean_text,
       |  len(kept) AS n_clean_tokens
       |FROM (
       |  SELECT doc_id, list_filter(
       |    string_split(trim(regexp_replace(regexp_replace(lower(trim(text)),
       |      '[^a-z0-9\\s]', ' ', 'g'), '\\s+', ' ', 'g')), ' '),
       |    w -> NOT w IN (${stopEn.map("'" + _ + "'").mkString(", ")}) AND w <> '') AS kept
       |  FROM documents)
       |ORDER BY doc_id""".stripMargin

  /** Corpus word-frequency profile: explode → count, top 100 by
    * frequency. The one text op that genuinely shuffles (on the word),
    * with map-side partial aggregation doing most of the work.
    */
  def wordFreq(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(explode(split(trim(col("text")), s"[$Ws]+")).as("word"))
      .groupBy("word")
      .agg(count(lit(1)).as("freq"))
      .orderBy(col("freq").desc, col("word"))
      .limit(100)

  def wordFreqSql: String =
    """SELECT word, count(*) AS freq
      |FROM (SELECT unnest(string_split_regex(trim(text), '\s+')) AS word
      |      FROM documents)
      |GROUP BY word
      |ORDER BY freq DESC, word
      |LIMIT 100""".stripMargin

  /** LEXICAL DIVERSITY — the per-document dual of the corpus-level
    * [[zipfFit]]: token count, TYPE count (distinct words), hapax
    * count (words occurring once in the doc), type-token ratio, and
    * hapax share of the vocabulary — the lexical-richness signals a
    * quality pipeline thresholds next to [[qualityScore]]'s surface
    * ratios (template/boilerplate text shows low TTR; keyword-stuffed
    * spam shows low hapax share at high TTR). Same whitespace
    * tokenizer as [[wordFreq]] — one definition across the text tier.
    *
    * Cross-engine exactness: all masses are exact integers; the two
    * ratios are ONE correctly-rounded IEEE division each, scale-0
    * display round.
    *
    * Scale shape: a pure PER-ROW projection — tokens sort inside the
    * row and hapaxes count as sorted positions that differ from both
    * neighbors, so the doc-bounded token explosion NEVER leaves its
    * row and the query carries zero exchanges (the explode +
    * two-aggregate formulation it replaces shuffled the tokenized
    * corpus by (doc_id, word) — at 100 TB that is the whole corpus
    * re-keyed for a per-doc statistic). Streaming-legal for free.
    */
  def lexicalDiversity(spark: SparkSession, dir: String): DataFrame =
    lexicalDiversityDocs(Tables.documents(spark, dir))

  private[graft] def lexicalDiversityDocs(docs: DataFrame): DataFrame = {
    def sr6(c: Column): Column = round(c * 1e6, 0) / 1e6
    docs
      .withColumn("toks", split(trim(col("text")), s"[$Ws]+"))
      .withColumn("srt", array_sort(col("toks")))
      .select(col("doc_id"),
        size(col("toks")).cast("long").as("n_tokens"),
        size(array_distinct(col("toks"))).cast("long").as("n_types"),
        expr("""aggregate(sequence(1, size(srt)), 0L, (acc, i) ->
          acc + IF((i = 1 OR srt[i - 1] != srt[i - 2])
                AND (i = size(srt) OR srt[i - 1] != srt[i]), 1L, 0L))""")
          .as("n_hapax"))
      .select(col("doc_id"), col("n_tokens"), col("n_types"),
        col("n_hapax"),
        sr6(col("n_types").cast("double") / col("n_tokens")).as("ttr"),
        sr6(col("n_hapax").cast("double") / col("n_types"))
          .as("hapax_ratio"))
  }

  def lexicalDiversitySql: String =
    s"""WITH w AS (
       |  SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS word
       |  FROM documents
       |), c AS (
       |  SELECT doc_id, word, count(*) AS f FROM w GROUP BY 1, 2
       |), a AS (
       |  SELECT doc_id, sum(f)::BIGINT AS n_tokens, count(*) AS n_types,
       |    sum(CASE WHEN f = 1 THEN 1 ELSE 0 END)::BIGINT AS n_hapax
       |  FROM c GROUP BY 1
       |)
       |SELECT doc_id, n_tokens, n_types, n_hapax,
       |  round(n_types::DOUBLE / n_tokens * 1e6, 0) / 1e6 AS ttr,
       |  round(n_hapax::DOUBLE / n_types * 1e6, 0) / 1e6 AS hapax_ratio
       |FROM a ORDER BY doc_id""".stripMargin

  /** ZIPF FIT — the corpus-statistics health check a training-data
    * pipeline runs per language: natural text follows Zipf's law
    * (freq ∝ rank^s with s ≈ −1), and a corpus whose fitted slope
    * drifts (template spam flattens it, dedup failures steepen it)
    * merits a look before training. Per language: rank the
    * [[wordFreq]] word surface by (freq desc, word), OLS-fit
    * y = ln(freq) on x = ln(rank), and emit slope, intercept, and r²
    * alongside the type/token masses.
    *
    * Cross-engine exactness: x and y round to 12 decimals so both
    * engines' moment sums consume IDENTICAL doubles (also absorbing
    * any libm ln ulp drift — the [[beta]] idiom); the closed-form
    * slope/intercept/r² are the identical op sequence on both sides,
    * scale-0 display round. The accumulation-order residual sits ~8
    * orders below the rounding point (the beta envelope).
    *
    * Scale shape: one (lang, word) aggregate (map-side combined —
    * token explosion never crosses the wire), a vocabulary-sized rank
    * window per language, then one lang-keyed moment collapse. The
    * corpus is touched once; everything downstream is vocab-sized.
    */
  def zipfFit(spark: SparkSession, dir: String): DataFrame =
    zipfFitDocs(Tables.documents(spark, dir))

  private[graft] def zipfFitDocs(docs: DataFrame): DataFrame = {
    def sr6(c: Column): Column = round(c * 1e6, 0) / 1e6
    val wr = Window.partitionBy("lang")
      .orderBy(col("freq").desc, col("word"))
    val n = col("n_types").cast("double")
    val sxxC = col("sxx") - col("sx") * col("sx") / n
    val sxyC = col("sxy") - col("sx") * col("sy") / n
    val syyC = col("syy") - col("sy") * col("sy") / n
    val slope = sxyC / sxxC
    docs
      .select(col("lang"),
        explode(split(trim(col("text")), s"[$Ws]+")).as("word"))
      .groupBy("lang", "word")
      .agg(count(lit(1)).as("freq"))
      .withColumn("x", round(log(row_number().over(wr)
        .cast("double")), 12))
      .withColumn("y", round(log(col("freq").cast("double")), 12))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_types"), sum("freq").as("n_tokens"),
        sum("x").as("sx"), sum("y").as("sy"),
        sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("y") * col("y")).as("syy"))
      .filter(col("n_types") >= 3)
      .select(col("lang"), col("n_types"), col("n_tokens"),
        sr6(slope).as("zipf_slope"),
        sr6((col("sy") - slope * col("sx")) / n).as("intercept"),
        sr6(when(syyC > 0.0, sxyC * sxyC / (sxxC * syyC))).as("r2"))
  }

  def zipfFitSql: String = {
    val n = "n_types::DOUBLE"
    val sxxC = s"(sxx - sx * sx / $n)"
    val sxyC = s"(sxy - sx * sy / $n)"
    val syyC = s"(syy - sy * sy / $n)"
    val slope = s"$sxyC / $sxxC"
    s"""WITH w AS (
       |  SELECT lang, unnest(string_split_regex(trim(text), '\\s+')) AS word
       |  FROM documents
       |), c AS (
       |  SELECT lang, word, count(*) AS freq FROM w GROUP BY 1, 2
       |), r AS (
       |  SELECT lang, freq,
       |    round(ln((row_number() OVER (PARTITION BY lang
       |      ORDER BY freq DESC, word))::DOUBLE), 12) AS x,
       |    round(ln(freq::DOUBLE), 12) AS y
       |  FROM c
       |), a AS (
       |  SELECT lang, count(*) AS n_types, sum(freq)::BIGINT AS n_tokens,
       |    sum(x) AS sx, sum(y) AS sy, sum(x * y) AS sxy,
       |    sum(x * x) AS sxx, sum(y * y) AS syy
       |  FROM r GROUP BY 1 HAVING count(*) >= 3
       |)
       |SELECT lang, n_types, n_tokens,
       |  round(($slope) * 1e6, 0) / 1e6 AS zipf_slope,
       |  round((sy - ($slope) * sx) / $n * 1e6, 0) / 1e6 AS intercept,
       |  round(CASE WHEN $syyC > 0.0
       |    THEN $sxyC * $sxyC / ($sxxC * $syyC) END * 1e6, 0) / 1e6 AS r2
       |FROM a ORDER BY lang""".stripMargin
  }

  /** CHARACTER-BIGRAM ENTROPY — the information-theoretic quality
    * signal next to [[lexicalDiversity]]'s combinatorial one: the
    * Shannon entropy (nats) of each document's character-bigram
    * distribution. Natural text sits in a band; repeated padding or
    * single-character spam collapses toward 0, and uniform random
    * bytes push toward ln(n_bigrams) — both worth a gate before
    * training. Emits the bigram mass, the distinct-bigram count, the
    * entropy, and the NORMALIZED entropy (÷ ln(distinct), 1 = uniform
    * — scale-free across doc lengths; 1.0 by convention for a
    * single-bigram doc, whose distribution IS uniform).
    *
    * Scale shape: [[lexicalDiversity]]'s zero-shuffle idiom — bigrams
    * sort INSIDE the row and the entropy accumulates over run-length
    * boundaries in one HOF fold (run ends → add p·ln p), so the
    * character explosion never leaves its row. The oracle runs the
    * classic explode/group-by formulation — the hash match proves the
    * run-length rewrite.
    *
    * Cross-engine exactness: every p = run/n is an exact rational of
    * masses both engines agree on; the Σ p·ln p association order
    * differs (sorted-run order vs hash order), leaving residuals ~9
    * orders below the display round.
    */
  def charEntropy(spark: SparkSession, dir: String): DataFrame =
    charEntropyDocs(Tables.documents(spark, dir))

  private[graft] def charEntropyDocs(docs: DataFrame): DataFrame = {
    def sr6(c: Column): Column = round(c * 1e6, 0) / 1e6
    docs
      .withColumn("srt", expr(
        """array_sort(transform(sequence(1, length(text) - 1),
          |  i -> substring(text, i, 2)))""".stripMargin))
      .filter(size(col("srt")) >= 1)
      .withColumn("n", size(col("srt")).cast("double"))
      .withColumn("ent", expr(
        """-aggregate(sequence(2, size(srt) + 1),
          |  named_struct('run', 1.0D, 'acc', 0.0D),
          |  (a, i) -> IF(i <= size(srt) AND srt[i - 1] = srt[i - 2],
          |    named_struct('run', a.run + 1.0D, 'acc', a.acc),
          |    named_struct('run', 1.0D,
          |      'acc', a.acc + (a.run / n) * ln(a.run / n))),
          |  a -> a.acc)""".stripMargin))
      .withColumn("n_distinct", size(array_distinct(col("srt"))).cast("long"))
      .select(col("doc_id"), col("n").cast("long").as("n_bigrams"),
        col("n_distinct"),
        sr6(col("ent")).as("entropy"),
        sr6(when(col("n_distinct") > 1,
          col("ent") / log(col("n_distinct").cast("double")))
          .otherwise(1.0)).as("norm_entropy"))
  }

  def charEntropySql: String =
    s"""WITH b AS (
       |  SELECT doc_id, substring(text, i, 2) AS bg
       |  FROM documents, unnest(generate_series(1, length(text) - 1)) AS t(i)
       |), c AS (
       |  SELECT doc_id, bg, count(*)::DOUBLE AS f FROM b GROUP BY 1, 2
       |), a0 AS (
       |  SELECT doc_id, sum(f) AS n, count(*) AS n_distinct
       |  FROM c GROUP BY doc_id
       |), a AS (
       |  SELECT c.doc_id, n, n_distinct,
       |    -sum((f / n) * ln(f / n)) AS ent
       |  FROM c JOIN a0 USING (doc_id)
       |  GROUP BY c.doc_id, n, n_distinct
       |)
       |SELECT doc_id, n::BIGINT AS n_bigrams, n_distinct,
       |  round(ent * 1e6, 0) / 1e6 AS entropy,
       |  round(CASE WHEN n_distinct > 1 THEN ent / ln(n_distinct::DOUBLE)
       |    ELSE 1.0 END * 1e6, 0) / 1e6 AS norm_entropy
       |FROM a ORDER BY doc_id""".stripMargin

  /** QUALITY CONFLUENCE — the curation tier's capstone, the doc-side
    * sibling of the daily tier's signal screener: five independent
    * quality families each cast one KEEP vote per document —
    * Gopher's repetition rules (keep_rep), the surface-ratio quality
    * score ≥ 0.5, CCNet bigram perplexity at or below the CORPUS
    * MEDIAN (self-calibrating — no magic constant to drift), the
    * n-gram language identifier agreeing with the labeled language,
    * and lexical diversity (TTR ≥ 0.35) — and a document keeps when
    * ≥ 4 of 5 families agree. Each vote CONSUMES its standalone
    * query's output frame verbatim (one definition per family), so
    * the confluence can never silently diverge from the surfaces it
    * composes; a document missing from a constituent surface (e.g.
    * no bigram for the perplexity leg) drops from the report —
    * no-signal is not a vote.
    *
    * Cross-engine exactness: every vote is a COMPARISON over doubles
    * the constituent oracles already hash-prove identical (the
    * signal-confluence trick — only integers and booleans are
    * emitted, no display rounding anywhere); the median is an exact
    * interpolated percentile of hash-proven doubles broadcast as a
    * one-row model (at 100 TB the documented swap is the
    * approx_percentile sketch — the q_anomaly_ticks convention; same
    * plan, bounded memory).
    *
    * Scale shape: five doc-keyed frames equi-join on doc_id (AQE
    * coalesces the co-keyed exchanges; each side is doc-sized, not
    * token-sized) plus one scalar broadcast.
    */
  def qualityConfluence(spark: SparkSession, dir: String): DataFrame = {
    val g = graft.operators.Curation.gopherChain(spark, dir)
      .select(col("doc_id"), col("keep_rep"))
    val q = qualityScore(spark, dir).select(col("doc_id"),
      col("quality_score"))
    val p = perplexity(spark, dir).select(col("doc_id"), col("perplexity"))
    val medP = p.agg(percentile(col("perplexity"), lit(0.5)).as("medp"))
    val l = langId(spark, dir).select(col("doc_id"), col("is_match"))
    val x = lexicalDiversity(spark, dir).select(col("doc_id"), col("ttr"))
    val votes = g.join(q, Seq("doc_id")).join(p, Seq("doc_id"))
      .join(l, Seq("doc_id")).join(x, Seq("doc_id"))
      .join(broadcast(medP), lit(true))
      .select(col("doc_id"),
        col("keep_rep").cast("int").as("v_rep"),
        (col("quality_score") >= 0.5).cast("int").as("v_quality"),
        (col("perplexity") <= col("medp")).cast("int").as("v_ppl"),
        col("is_match").cast("int").as("v_lang"),
        (col("ttr") >= 0.35).cast("int").as("v_lex"))
    votes
      .withColumn("score", col("v_rep") + col("v_quality") + col("v_ppl")
        + col("v_lang") + col("v_lex"))
      .withColumn("keep", col("score") >= 4)
  }

  def qualityConfluenceSql: String =
    s"""WITH g AS (
       |${graft.operators.Curation.gopherChainSql}
       |), q AS (
       |${qualityScoreSql}
       |), p AS (
       |${perplexitySql}
       |), l AS (
       |${langIdSql}
       |), x AS (
       |${lexicalDiversitySql}
       |), m AS (
       |  SELECT quantile_cont(perplexity, 0.5) AS medp FROM p
       |)
       |SELECT g.doc_id,
       |  g.keep_rep::INT AS v_rep,
       |  (q.quality_score >= 0.5)::INT AS v_quality,
       |  (p.perplexity <= m.medp)::INT AS v_ppl,
       |  l.is_match::INT AS v_lang,
       |  (x.ttr >= 0.35)::INT AS v_lex,
       |  g.keep_rep::INT + (q.quality_score >= 0.5)::INT
       |    + (p.perplexity <= m.medp)::INT + l.is_match::INT
       |    + (x.ttr >= 0.35)::INT AS score,
       |  (g.keep_rep::INT + (q.quality_score >= 0.5)::INT
       |    + (p.perplexity <= m.medp)::INT + l.is_match::INT
       |    + (x.ttr >= 0.35)::INT >= 4) AS keep
       |FROM g
       |JOIN q ON q.doc_id = g.doc_id
       |JOIN p ON p.doc_id = g.doc_id
       |JOIN l ON l.doc_id = g.doc_id
       |JOIN x ON x.doc_id = g.doc_id
       |CROSS JOIN m
       |ORDER BY g.doc_id""".stripMargin

  /** HEAPS' LAW FIT — [[zipfFit]]'s growth-curve companion: as a
    * corpus is read in doc_id order, vocabulary grows as
    * V(n) ≈ K·n^β (β ≈ 0.4-0.6 for natural text; template spam
    * plateaus early, OCR noise pushes β toward 1). Per doc:
    * token mass and NEW-type mass (words whose min doc_id is this
    * doc), prefix-summed into the (cum_tokens, cum_types) growth
    * curve, then one log-log OLS row: β (slope), K = e^intercept, r²,
    * plus the corpus totals.
    *
    * The prefix scan is the operator Spark lacks natively at scale —
    * a bare ORDER BY window collapses the corpus to ONE partition. It
    * runs here as the classic two-pass decomposition, fully
    * declarative: doc_ids split into RANGE BUCKETS of 65536 (the
    * √N-balancing point — intra-bucket window groups stay 64K-row
    * bounded while the offset table is corpus/64K rows, ~1.5M at a
    * 10¹¹-doc corpus); intra-bucket running sums ride a window
    * PARTITIONED by bucket (parallel); bucket totals collapse to the
    * small offset table whose own prefix window is trivial; offsets
    * broadcast-join back. Every mass is an exact integer, so the
    * decomposition is bit-equal to the single-partition form the
    * DuckDB oracle runs — the oracle hash-proves the scan rewrite
    * itself.
    *
    * Cross-engine exactness: [[zipfFit]]'s discipline — ln inputs
    * round to 12, the closed-form fit is the identical op sequence,
    * scale-0 display round.
    */
  def heapsFit(spark: SparkSession, dir: String): DataFrame =
    heapsFitDocs(Tables.documents(spark, dir))

  private[graft] def heapsFitDocs(docs: DataFrame): DataFrame = {
    def sr6(c: Column): Column = round(c * 1e6, 0) / 1e6
    val words = docs.select(col("doc_id"),
      explode(split(trim(col("text")), s"[$Ws]+")).as("word"))
    val toks = words.groupBy("doc_id").agg(count(lit(1)).as("n_tokens"))
    val news = words.groupBy("word").agg(min("doc_id").as("fdoc"))
      .groupBy("fdoc").agg(count(lit(1)).as("n_new"))
    // materialized once: BOTH the offsets branch and the curve read
    // perDoc, and without pinning, Catalyst re-derives the whole
    // tokenize → toks ⋈ news subtree under the broadcast — 2× the
    // corpus tokenization work for a one-row answer at 100 TB
    // (localCheckpoint, not persist — released with the plan, the
    // returnCorrOf discipline). perDoc itself is doc-count-sized.
    // CONTRACT NOTE: the EAGER checkpoint means merely CONSTRUCTING
    // this DataFrame runs the tokenize⋈min-doc job (plan-dump tooling
    // pays it too), and checkpointing truncates lineage — an executor
    // loss replays from the checkpoint blocks, not the parquet scan.
    // Accepted deliberately: the lazy alternative re-tokenizes the
    // corpus twice on every action, which is the worse trade at scale.
    val perDoc = toks
      .join(news, toks("doc_id") === news("fdoc"), "left")
      .select(col("doc_id"), col("n_tokens"),
        coalesce(col("n_new"), lit(0L)).as("n_new"))
      .withColumn("bkt", expr("doc_id DIV 65536"))
      .localCheckpoint(true)
    val wIn = Window.partitionBy("bkt").orderBy("doc_id")
    val wOff = Window.orderBy("bkt")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = perDoc.groupBy("bkt")
      .agg(sum("n_tokens").as("bt"), sum("n_new").as("bn"))
      .select(col("bkt"),
        coalesce(sum("bt").over(wOff), lit(0L)).as("tok_off"),
        coalesce(sum("bn").over(wOff), lit(0L)).as("typ_off"))
    val curve = perDoc.join(broadcast(offsets), Seq("bkt"))
      .select(col("doc_id"), col("n_tokens"), col("n_new"),
        (col("tok_off") + sum("n_tokens").over(wIn)).as("cum_tokens"),
        (col("typ_off") + sum("n_new").over(wIn)).as("cum_types"))
    val n = col("n_docs").cast("double")
    val sxxC = col("sxx") - col("sx") * col("sx") / n
    val sxyC = col("sxy") - col("sx") * col("sy") / n
    val syyC = col("syy") - col("sy") * col("sy") / n
    val slope = sxyC / sxxC
    curve
      .select(col("cum_tokens"), col("cum_types"),
        round(log(col("cum_tokens").cast("double")), 12).as("x"),
        round(log(col("cum_types").cast("double")), 12).as("y"))
      .agg(count(lit(1)).as("n_docs"),
        max("cum_tokens").as("total_tokens"),
        max("cum_types").as("total_types"),
        sum("x").as("sx"), sum("y").as("sy"),
        sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("y") * col("y")).as("syy"))
      .select(col("n_docs"), col("total_tokens"), col("total_types"),
        sr6(slope).as("heaps_beta"),
        sr6(exp((col("sy") - slope * col("sx")) / n)).as("heaps_k"),
        sr6(when(syyC > 0.0, sxyC * sxyC / (sxxC * syyC))).as("r2"))
  }

  def heapsFitSql: String = {
    val n = "n_docs::DOUBLE"
    val sxxC = s"(sxx - sx * sx / $n)"
    val sxyC = s"(sxy - sx * sy / $n)"
    val syyC = s"(syy - sy * sy / $n)"
    val slope = s"$sxyC / $sxxC"
    s"""WITH w AS (
       |  SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS word
       |  FROM documents
       |), toks AS (
       |  SELECT doc_id, count(*) AS n_tokens FROM w GROUP BY 1
       |), news AS (
       |  SELECT fdoc, count(*) AS n_new FROM (
       |    SELECT word, min(doc_id) AS fdoc FROM w GROUP BY 1
       |  ) GROUP BY 1
       |), curve AS (
       |  SELECT sum(n_tokens) OVER (ORDER BY t.doc_id
       |      ROWS UNBOUNDED PRECEDING) AS cum_tokens,
       |    sum(coalesce(n_new, 0)) OVER (ORDER BY t.doc_id
       |      ROWS UNBOUNDED PRECEDING) AS cum_types
       |  FROM toks t LEFT JOIN news ON t.doc_id = news.fdoc
       |), r AS (
       |  SELECT cum_tokens, cum_types,
       |    round(ln(cum_tokens::DOUBLE), 12) AS x,
       |    round(ln(cum_types::DOUBLE), 12) AS y
       |  FROM curve
       |), a AS (
       |  SELECT count(*) AS n_docs,
       |    max(cum_tokens)::BIGINT AS total_tokens,
       |    max(cum_types)::BIGINT AS total_types,
       |    sum(x) AS sx, sum(y) AS sy, sum(x * y) AS sxy,
       |    sum(x * x) AS sxx, sum(y * y) AS syy
       |  FROM r
       |)
       |SELECT n_docs, total_tokens, total_types,
       |  round(($slope) * 1e6, 0) / 1e6 AS heaps_beta,
       |  round(exp((sy - ($slope) * sx) / $n) * 1e6, 0) / 1e6 AS heaps_k,
       |  round(CASE WHEN $syyC > 0.0
       |    THEN $sxyC * $sxyC / ($sxxC * $syyC) END * 1e6, 0) / 1e6 AS r2
       |FROM a""".stripMargin
  }

  /** HEAVY HITTERS via a Count-Min sketch — the 100 TB dual of
    * [[wordFreq]], completing the sketch tier next to HLL
    * (q_approx_distinct) and approx percentiles: at corpus scale the
    * exact word groupBy shuffles a vocabulary-sized key set, while
    * the CMS is a FIXED ⌈e/ε⌉×⌈ln(1/δ)⌉ counter grid that aggregates
    * with map-side combine and MERGES associatively (Cormode &
    * Muthukrishnan 2005) — the per-partition sketches meet in one
    * tiny reduce, and a standing-corpus deployment keeps the sketch
    * as a mergeable artifact the same way the Bloom gate keeps its
    * filter. The report joins the exact top-`k` words (the verifier
    * tier at test scale; at 100 TB the candidate set comes from a
    * per-partition top-k pre-filter instead) with their sketch
    * estimates and the overestimate in ppm of the token mass.
    *
    * CMS guarantees, both spec-asserted: estimate ≥ exact count
    * (never an undercount), and estimate ≤ exact + ε·N with
    * probability 1−δ. Deterministic: fixed seed, fixed grid.
    */
  def heavyHitters(spark: SparkSession, dir: String, k: Int = 50,
      eps: Double = 1e-4, confidence: Double = 0.99): DataFrame =
    heavyHittersDocs(Tables.documents(spark, dir), k, eps, confidence)

  private[graft] def heavyHittersDocs(docs: DataFrame, k: Int = 50,
      eps: Double = 1e-4, confidence: Double = 0.99): DataFrame = {
    val spark = docs.sparkSession
    val words = docs
      .select(explode(split(trim(col("text")), s"[$Ws]+")).as("word"))
    // one distributed pass: mergeable sketch + token mass together
    val skRow = words
      .agg(expr(s"count_min_sketch(word, ${eps}d, ${confidence}d, 42)")
        .as("sk"), count(lit(1)).as("n"))
      .head()
    val sketch = org.apache.spark.util.sketch.CountMinSketch.readFrom(
      new java.io.ByteArrayInputStream(skRow.getAs[Array[Byte]]("sk")))
    val total = skRow.getAs[Long]("n")
    val top = words.groupBy("word").agg(count(lit(1)).as("freq"))
      .orderBy(col("freq").desc, col("word")).limit(k)
      .collect()
    import spark.implicits._
    top.toSeq
      .map(r => (r.getString(0), r.getLong(1),
        sketch.estimateCount(r.getString(0)), total))
      .toDF("word", "freq", "cms_estimate", "n_words")
      .withColumn("over_ppm",
        expr("(cms_estimate - freq) * 1000000 DIV n_words"))
  }

  /** MISRA-GRIES heavy hitters — the DETERMINISTIC mergeable summary
    * next to [[heavyHitters]]' probabilistic CMS (Misra & Gries 1982;
    * mergeability per Agarwal et al. 2012): each partition keeps ≤ k
    * counters (resident word +1; free slot admits at 1; full summary
    * decrements EVERY counter and drops zeros — total decrement work
    * O(n), since each event burns k+1 mass), the per-partition
    * summaries MERGE by adding counts and re-trimming at the
    * (k+1)-largest count. The merged summary guarantees, both
    * spec-asserted: estimate ≤ true count, and true − estimate ≤
    * (N − M)/(k+1) where M is the summary's retained mass — so EVERY
    * word with frequency > (N − M)/(k+1) survives, with NO
    * probability caveat (the CMS trades that certainty for a smaller
    * grid). The report joins the survivors' exact counts (the
    * verifier tier, as in the CMS dual); N and the summaries come
    * from ONE pass.
    *
    * Deterministic: counter values never depend on map iteration
    * order (decrements hit every counter; zeros drop regardless),
    * admission order is the partition's row order, and the merge is
    * value-arithmetic — same input, same summary.
    */
  def heavyHittersMg(spark: SparkSession, dir: String,
      k: Int = 64): DataFrame =
    heavyHittersMgDocs(Tables.documents(spark, dir), k)

  private[graft] def heavyHittersMgDocs(docs: DataFrame,
      k: Int = 64): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val words = docs
      .select(explode(split(trim(col("text")), s"[$Ws]+")).as("word"))
    // one pass: per-partition MG summary + the partition's word count
    val partials: Array[(Map[String, Long], Long)] =
      words.as[String].rdd.mapPartitions { it =>
        val m = scala.collection.mutable.Map.empty[String, Long]
        var n = 0L
        it.foreach { w =>
          n += 1
          if (m.contains(w)) m(w) += 1L
          else if (m.size < k) m(w) = 1L
          else m.keysIterator.toArray.foreach { key =>
            val c = m(key) - 1L
            if (c == 0L) m.remove(key) else m(key) = c
          }
        }
        Iterator((m.toMap, n))
      }.collect()
    val total = partials.map(_._2).sum
    val merged = scala.collection.mutable.Map.empty[String, Long]
    partials.foreach(_._1.foreach { case (w, c) =>
      merged(w) = merged.getOrElse(w, 0L) + c
    })
    if (merged.size > k) {
      val cut = merged.values.toSeq.sortBy(-_).apply(k) // (k+1)-largest
      merged.mapValuesInPlace((_, c) => c - cut)
        .filterInPlace((_, c) => c > 0L): Unit
    }
    val retained = merged.values.sum
    val bound = (total - retained) / (k + 1).toLong // floor of the real bound
    val summary = merged.toSeq.toDF("word", "mg_estimate")
    // verifier tier: exact counts for the survivors only
    words.join(broadcast(summary), Seq("word"), "right")
      .groupBy("word", "mg_estimate")
      .agg(count(col("word")).as("freq"))
      .select(col("word"), col("freq"), col("mg_estimate"),
        (col("freq") - col("mg_estimate")).as("est_gap"),
        lit(total).as("n_words"), lit(bound).as("gap_bound"))
  }

  /** EXACT top-k word counts — the VERIFIER tier of [[heavyHitters]]
    * and [[heavyHittersMg]] registered as its own SQL-oracled query:
    * the sketches' guarantees are spec-pinned against exactly this
    * table, so hash-grading it closes the only unverified input of
    * the heavy-hitter tier (the sketch grids themselves are not
    * SQL-expressible by design). Total order (freq desc, word) makes
    * the LIMIT deterministic across engines.
    *
    * Scale shape: one map-side-combined word aggregate + a TakeOrdered
    * top-k (never a full sort); at 100 TB the same per-partition
    * top-k pre-filter documented on [[heavyHitters]] bounds the
    * candidate set first.
    */
  def heavyHittersExact(spark: SparkSession, dir: String,
      k: Int = 50): DataFrame =
    Tables.documents(spark, dir)
      .select(explode(split(trim(col("text")), s"[$Ws]+")).as("word"))
      .groupBy("word").agg(count(lit(1)).as("freq"))
      .orderBy(col("freq").desc, col("word")).limit(k)

  def heavyHittersExactSql: String =
    """WITH w AS (
      |  SELECT unnest(string_split_regex(trim(text), '\s+')) AS word
      |  FROM documents
      |)
      |SELECT word, count(*)::BIGINT AS freq FROM w GROUP BY word
      |ORDER BY freq DESC, word LIMIT 50""".stripMargin

  /** Top-rank count feeding the Zipf-slope fit in [[vocabStats]]. */
  private[graft] val ZipfK = 100

  /** Per-source VOCABULARY profile — the corpus-statistics report a
    * tokenizer or mixing decision reads first: token mass, vocabulary
    * size, hapax legomena (words seen once — the long-tail/noise
    * share), type-token ratio, the top word, and the fitted ZIPF
    * slope (OLS of ln freq vs ln rank over the top [[ZipfK]] words —
    * natural text sits near −1; templated or synthetic text drifts
    * flat). Sources with zero normalized words don't appear (there is
    * no vocabulary to profile).
    *
    * Cross-engine exactness: the counts and ppm ratios are integer
    * arithmetic; the slope's four reductions run as LEFT FOLDS over
    * rank-ordered lists (the `list_reduce` oracle idiom — identical
    * summation order on both engines, so the only divergence is the
    * sub-ulp ln difference absorbed by round 6).
    *
    * Scale shape: ONE corpus scan into the (source, word) partial
    * agg; everything above it is vocab-sized — the rank window, the
    * top-[[ZipfK]] fold arrays, and the three source-keyed joins all
    * run over per-source vocabularies, never documents.
    */
  def vocabStats(spark: SparkSession, dir: String): DataFrame =
    vocabStatsDocs(Tables.documents(spark, dir))

  /** Shared (source, word, n) count kernel — ONE definition for
    * [[vocabStats]] and [[tokenDrift]] (and one SQL CTE,
    * [[sourceWordCtes]]), so the vocabulary profile and the drift
    * report can never tokenize differently.
    */
  private def sourceWordCounts(docs: DataFrame): DataFrame =
    docs
      .select(col("source"), explode(normalizedWords).as("word"))
      .filter(col("word") =!= "")
      .groupBy("source", "word").agg(count(lit(1)).as("n"))

  /** DuckDB dual of [[sourceWordCounts]] — the `wf` CTE composed by
    * [[vocabStatsSql]] and [[tokenDriftSql]].
    */
  private val sourceWordCtes: String =
    """w AS (
      |  SELECT source,
      |    unnest(list_filter(string_split(trim(regexp_replace(regexp_replace(
      |      lower(trim(text)), '[^a-z0-9\s]', ' ', 'g'), '\s+', ' ', 'g')), ' '),
      |      x -> x <> '')) AS word
      |  FROM documents
      |), wf AS (
      |  SELECT source, word, count(*)::BIGINT AS n FROM w GROUP BY 1, 2
      |)""".stripMargin

  private[graft] def vocabStatsDocs(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // persisted: the vocab-sized (source, word, n) table feeds the
    // mass aggregate AND the rank window — without it the corpus
    // scan + explode replays once per consumer
    val wf = sourceWordCounts(docs)
      .persist()
    val masses = wf.groupBy("source").agg(
      sum("n").as("n_tokens"), count(lit(1)).as("vocab"),
      sum(when(col("n") === 1, 1L).otherwise(0L)).as("hapax"))
    val rk = wf.withColumn("rank",
      row_number().over(
        Window.partitionBy("source").orderBy(col("n").desc, col("word"))))
    val top = rk.filter(col("rank") === 1)
      .select(col("source"), col("word").as("top_word"), col("n").as("top_n"))
    val lnRank = (e: Column) => log(e("rank").cast("double"))
    val lnN = (e: Column) => log(e("n").cast("double"))
    val foldSum = (c: Column) => aggregate(c, lit(0.0), _ + _)
    val zipf = rk.filter(col("rank") <= ZipfK)
      .groupBy("source")
      .agg(sort_array(collect_list(struct(col("rank"), col("n")))).as("arr"))
      .select(col("source"),
        size(col("arr")).cast("long").as("zipf_k"),
        foldSum(transform(col("arr"), lnRank)).as("sx"),
        foldSum(transform(col("arr"), lnN)).as("sy"),
        foldSum(transform(col("arr"), e => lnRank(e) * lnN(e))).as("sxy"),
        foldSum(transform(col("arr"), e => lnRank(e) * lnRank(e))).as("sxx"))
      .select(col("source"), col("zipf_k"),
        when(col("zipf_k") >= 2 &&
            (col("zipf_k") * col("sxx") - col("sx") * col("sx")) =!= 0.0,
          round((col("zipf_k") * col("sxy") - col("sx") * col("sy")) /
            (col("zipf_k") * col("sxx") - col("sx") * col("sx")), 6))
          .as("zipf_slope"))
    masses.join(top, Seq("source")).join(zipf, Seq("source"))
      .select(col("source"), col("n_tokens"), col("vocab"), col("hapax"),
        expr("hapax * 1000000 DIV vocab").as("hapax_ppm"),
        expr("vocab * 1000000 DIV n_tokens").as("ttr_ppm"),
        col("top_word"), col("top_n"), col("zipf_k"), col("zipf_slope"))
  }

  /** DuckDB dual of [[vocabStats]]: same normalization, same rank
    * order, the same rank-ordered `list_reduce` left folds.
    */
  def vocabStatsSql: String =
    s"""WITH $sourceWordCtes, m AS (
       |  SELECT source, sum(n)::BIGINT AS n_tokens, count(*)::BIGINT AS vocab,
       |    sum(CASE WHEN n = 1 THEN 1 ELSE 0 END)::BIGINT AS hapax
       |  FROM wf GROUP BY 1
       |), rk AS (
       |  SELECT source, word, n,
       |    row_number() OVER (PARTITION BY source ORDER BY n DESC, word) AS rank
       |  FROM wf
       |), t1 AS (
       |  SELECT source, word AS top_word, n AS top_n FROM rk WHERE rank = 1
       |), z AS (
       |  SELECT source, count(*)::BIGINT AS zipf_k,
       |    list(ln(rank::DOUBLE) ORDER BY rank) AS xs,
       |    list(ln(n::DOUBLE) ORDER BY rank) AS ys,
       |    list(ln(rank::DOUBLE) * ln(n::DOUBLE) ORDER BY rank) AS xys,
       |    list(ln(rank::DOUBLE) * ln(rank::DOUBLE) ORDER BY rank) AS xxs
       |  FROM rk WHERE rank <= $ZipfK GROUP BY source
       |), zs AS (
       |  SELECT source, zipf_k,
       |    list_reduce(xs, (a, b) -> a + b) AS sx,
       |    list_reduce(ys, (a, b) -> a + b) AS sy,
       |    list_reduce(xys, (a, b) -> a + b) AS sxy,
       |    list_reduce(xxs, (a, b) -> a + b) AS sxx
       |  FROM z
       |)
       |SELECT m.source, n_tokens, vocab, hapax,
       |  (hapax * 1000000 // vocab)::BIGINT AS hapax_ppm,
       |  (vocab * 1000000 // n_tokens)::BIGINT AS ttr_ppm,
       |  top_word, top_n, zipf_k,
       |  (CASE WHEN zipf_k >= 2 AND zipf_k * sxx - sx * sx <> 0
       |        THEN round((zipf_k * sxy - sx * sy) / (zipf_k * sxx - sx * sx), 6)
       |   END) AS zipf_slope
       |FROM m JOIN t1 USING (source) JOIN zs USING (source)
       |ORDER BY source""".stripMargin

  /** Per-source token-distribution DRIFT — KL(source ‖ corpus) over
    * unigram frequencies, the observability a mixing stage reads to
    * see which feed's language has moved away from the blend (and,
    * run snapshot-over-snapshot, how a crawl drifts release to
    * release): for each source, its token mass, vocabulary, and the
    * exact KL divergence in nats of its word distribution against
    * the whole corpus'. No smoothing is needed — the corpus marginal
    * dominates every source, so p_corpus > 0 wherever p_source > 0.
    *
    * Cross-engine exactness without ordered folds: each word's
    * contribution `p_s·ln(p_s/p_c)` rounds to 12 decimals and sums
    * as DECIMAL(28,14) — exact decimal addition is ORDER-INDEPENDENT,
    * so the corpus-scale reduction needs no sort and no fold, and the
    * two guard digits beyond the rounding point make the double →
    * decimal cast unambiguous on both engines (double ulp ≤ 9e-16 at
    * the ≤20-nat term magnitude, under the 5e-15 decimal boundary).
    * The final nats value is the decimal sum cast back to double,
    * rounded to 8.
    *
    * Scale shape: ONE corpus scan into the shared
    * [[sourceWordCounts]] partial agg; the corpus marginal, source
    * masses, and grand total are windows OVER THE VOCAB-SIZED count
    * table (word-keyed, source-keyed, unpartitioned — each moves
    * vocabulary rows, never tokens); the KL collapse is a
    * sources-sized aggregate.
    */
  def tokenDrift(spark: SparkSession, dir: String): DataFrame =
    tokenDriftDocs(Tables.documents(spark, dir))

  private[graft] def tokenDriftDocs(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val wf = sourceWordCounts(docs)
      .withColumn("n_corpus_w", sum("n").over(Window.partitionBy("word")))
      .withColumn("n_source", sum("n").over(Window.partitionBy("source")))
      .withColumn("n_total", sum("n").over(Window.partitionBy()))
    // both ratio legs multiply as DOUBLE — a BIGINT product would
    // overflow at 100 TB token masses (and DuckDB would silently
    // promote to HUGEINT where Spark's ANSI mode errors)
    val term = (col("n").cast("double") / col("n_source").cast("double")) *
      log((col("n").cast("double") * col("n_total").cast("double")) /
        (col("n_source").cast("double") * col("n_corpus_w").cast("double")))
    wf.groupBy("source")
      .agg(max("n_source").as("n_tokens"),
        count(lit(1)).as("vocab"),
        sum(round(term, 12).cast("decimal(28,14)")).as("kl_dec"))
      .select(col("source"), col("n_tokens"), col("vocab"),
        round(col("kl_dec").cast("double"), 8).as("kl_nats"))
  }

  /** DuckDB dual of [[tokenDrift]]: the shared count CTE, the same
    * vocab-table windows and the same DECIMAL(28,14) exact reduction.
    */
  def tokenDriftSql: String =
    s"""WITH $sourceWordCtes, t AS (
       |  SELECT source, word, n,
       |    sum(n) OVER (PARTITION BY word) AS n_corpus_w,
       |    sum(n) OVER (PARTITION BY source) AS n_source,
       |    sum(n) OVER () AS n_total
       |  FROM wf
       |)
       |SELECT source, max(n_source)::BIGINT AS n_tokens,
       |  count(*)::BIGINT AS vocab,
       |  round((sum(round((n::DOUBLE / n_source::DOUBLE) *
       |    ln((n::DOUBLE * n_total::DOUBLE) / (n_source::DOUBLE * n_corpus_w::DOUBLE)), 12)
       |    ::DECIMAL(28,14)))::DOUBLE, 8) AS kl_nats
       |FROM t GROUP BY source ORDER BY source""".stripMargin

  /** TF-IDF keyword extraction: the top-3 terms per document by
    * tf·ln(N/df) over the normalized vocabulary — the per-document
    * topical summary feeding search/labeling stages downstream of
    * curation.
    *
    * Scale shape: ONE corpus scan into the (doc_id, word) tf
    * aggregation; df is a count window over the word key of THAT
    * table (a tf-sized shuffle — a self-join would rescan the corpus
    * per side, 4 scans measured before this shape); top-3 is a
    * per-doc window. Ordering is on the ROUNDED score so the
    * cross-engine tie-break is exact. N lands driver-side as one
    * scalar (at scale: a cheap metadata count).
    */
  def tfidf(spark: SparkSession, dir: String): DataFrame =
    tfidfDocs(Tables.documents(spark, dir))

  private[graft] def tfidfDocs(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val words = docs
      .select(col("doc_id"), explode(normalizedWords).as("word"))
      .filter(col("word") =!= "")
    val tf = words.groupBy("doc_id", "word").agg(count(lit(1)).as("tf"))
    val nDocs = docs.count()
    val scored = tf
      .withColumn("df", count(lit(1)).over(Window.partitionBy("word")))
      .withColumn("tfidf",
        round(col("tf") * log(lit(nDocs.toDouble) / col("df")), 6))
    val w = Window.partitionBy("doc_id").orderBy(col("tfidf").desc, col("word"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 3)
      .select("doc_id", "rank", "word", "tfidf")
  }

  def tfidfSql: String =
    """WITH w AS (
      |  SELECT doc_id,
      |    unnest(list_filter(string_split(trim(regexp_replace(regexp_replace(
      |      lower(trim(text)), '[^a-z0-9\s]', ' ', 'g'), '\s+', ' ', 'g')), ' '),
      |      x -> x <> '')) AS word
      |  FROM documents
      |), tf AS (
      |  SELECT doc_id, word, count(*) AS tf FROM w GROUP BY 1, 2
      |), dfq AS (
      |  SELECT word, count(*) AS df FROM tf GROUP BY 1
      |), n AS (
      |  SELECT count(*) AS n_docs FROM documents
      |), scored AS (
      |  SELECT doc_id, word,
      |    round(tf * ln(n_docs::DOUBLE / df), 6) AS tfidf
      |  FROM tf JOIN dfq USING (word) CROSS JOIN n
      |), ranked AS (
      |  SELECT doc_id, word, tfidf,
      |    row_number() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, word) AS rank
      |  FROM scored
      |)
      |SELECT doc_id, rank, word, tfidf
      |FROM ranked WHERE rank <= 3 ORDER BY doc_id, rank""".stripMargin

  /** CCNet-style LM perplexity scoring (Wenzek et al. 2020): per-doc
    * cross-entropy and perplexity under an add-1-smoothed word-bigram
    * LM trained on the corpus itself — the fluency gate that drops
    * gibberish the rule filters miss. P(w2|w1) = (c12+1)/(c1+V) with
    * V = predecessor vocabulary size; docs under 2 words carry no
    * bigram and drop out (nothing to score).
    *
    * Scale shape: ONE corpus scan into a cached (doc_id, w1, w2, n)
    * table; global bigram/left-context masses come from windows over
    * THAT table (the (w1,w2) window's shuffle also serves the w1
    * window via partial reuse); V is one action on the cached table.
    * The cache lives for the session (like [[bigramQuality]]'s model
    * cache) — a production LM build would persist the counts table to
    * storage instead.
    * Parity: integer ratios into ln (cf. [[bm25]]), Σ n·lp at the
    * same granularity both engines, ÷ and exp on the rounded-free
    * path guarded by the 6-decimal output rounding.
    */
  def perplexity(spark: SparkSession, dir: String): DataFrame =
    perplexityDocs(Tables.documents(spark, dir))

  private[graft] def perplexityDocs(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ws = filter(normalizedWords, w => w =!= lit(""))
    val pairs = docs
      .select(col("doc_id"), ws.as("ws"))
      .select(col("doc_id"), explode(zip_with(
        slice(col("ws"), lit(1), greatest(size(col("ws")) - 1, lit(0))),
        slice(col("ws"), lit(2), greatest(size(col("ws")) - 1, lit(0))),
        (a, b) => struct(a.as("w1"), b.as("w2")))).as("p"))
      .select(col("doc_id"), col("p.w1").as("w1"), col("p.w2").as("w2"))
    val tf = pairs.groupBy("doc_id", "w1", "w2")
      .agg(count(lit(1)).as("n")).persist()
    val v = tf.agg(countDistinct("w1")).head.getLong(0)
    val w12 = Window.partitionBy("w1", "w2")
    val w1w = Window.partitionBy("w1")
    tf
      .withColumn("c12", sum("n").over(w12))
      .withColumn("c1", sum("n").over(w1w))
      .withColumn("lp", log((col("c12") + 1).cast("double")
        / (col("c1") + lit(v)).cast("double")))
      .groupBy("doc_id")
      .agg(sum(col("n") * col("lp")).as("lp_sum"), sum("n").as("n_bigrams"))
      .select(col("doc_id"), col("n_bigrams"),
        round(-col("lp_sum") / col("n_bigrams"), 6).as("cross_entropy"),
        round(exp(-col("lp_sum") / col("n_bigrams")), 6).as("perplexity"))
  }

  def perplexitySql: String =
    """WITH ws0 AS (
      |  SELECT doc_id,
      |    list_filter(string_split(trim(regexp_replace(regexp_replace(
      |      lower(trim(text)), '[^a-z0-9\s]', ' ', 'g'), '\s+', ' ', 'g')), ' '),
      |      x -> x <> '') AS ws
      |  FROM documents
      |), bg AS (
      |  SELECT doc_id, ws[i] AS w1, ws[i + 1] AS w2
      |  FROM (SELECT doc_id, ws,
      |          unnest(range(1, greatest(len(ws) - 1, 0) + 1)) AS i
      |        FROM ws0)
      |), tf AS (
      |  SELECT doc_id, w1, w2, count(*)::BIGINT AS n
      |  FROM bg GROUP BY 1, 2, 3
      |), vv AS (SELECT count(DISTINCT w1)::BIGINT AS v FROM tf),
      |m AS (
      |  SELECT doc_id, n,
      |    ln((c12 + 1)::DOUBLE / ((c1 + v)::DOUBLE)) AS lp
      |  FROM (SELECT doc_id, n,
      |          sum(n) OVER (PARTITION BY w1, w2) AS c12,
      |          sum(n) OVER (PARTITION BY w1) AS c1
      |        FROM tf), vv
      |)
      |SELECT doc_id, sum(n)::BIGINT AS n_bigrams,
      |  round(-sum(n * lp) / sum(n), 6) AS cross_entropy,
      |  round(exp(-sum(n * lp) / sum(n)), 6) AS perplexity
      |FROM m GROUP BY doc_id ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------- BM25

  /** Seed-query terms for the relevance-scoring query (fixed, from
    * the corpus vocabulary so the signal is live on the test data).
    */
  private val Bm25Terms = Seq("data", "stream", "window")
  private val Bm25K1 = 1.2
  private val Bm25B = 0.75

  /** BM25 relevance of every document against a seed-term query —
    * retrieval-based curation (score a web-scale corpus against seed
    * queries that define a target domain, keep the top mass; the
    * importance-weighting cousin of [[Curation.decontaminate]]'s
    * membership test). Emits the top 20 with ranks.
    *
    * Scale shape: term frequencies are per-row narrow work (the term
    * list is a handful of columns, no explode); the corpus stats
    * (N, avgdl, per-term document frequencies) aggregate to ONE row
    * broadcast back — so the whole query is one narrow pass plus a
    * top-k. All aggregates are exact integers; the only
    * transcendental is ln (same libm double rounding on both
    * engines, guarded by the 6-decimal output rounding).
    */
  def bm25(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), words(col("text")).as("ws"))
      .withColumn("dl", size(col("ws")))
    val withTf = Bm25Terms.zipWithIndex.foldLeft(docs) { case (df, (t, i)) =>
      df.withColumn(s"tf_$i", size(filter(col("ws"), w => w === t)))
    }.drop("ws")
    val statCols = count(lit(1)).cast("double").as("n_docs") +:
      sum("dl").cast("double").as("sum_dl") +:
      Bm25Terms.indices.map(i =>
        sum(when(col(s"tf_$i") > 0, 1).otherwise(0)).cast("double").as(s"df_$i"))
    val stats = withTf.agg(statCols.head, statCols.tail: _*)
    val scored = withTf.crossJoin(broadcast(stats))
    val avgdl = col("sum_dl") / col("n_docs")
    val score = Bm25Terms.indices.map { i =>
      val idf = log((col("n_docs") - col(s"df_$i") + 0.5) / (col(s"df_$i") + 0.5) + 1.0)
      val tf = col(s"tf_$i").cast("double")
      idf * (tf * (Bm25K1 + 1.0)) /
        (tf + lit(Bm25K1) * (lit(1.0 - Bm25B) + lit(Bm25B) * col("dl").cast("double") / avgdl))
    }.reduce(_ + _)
    scored.select(col("doc_id"), round(score, 6).as("bm25"))
      .orderBy(col("bm25").desc, col("doc_id"))
      .limit(20)
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("bm25").desc, col("doc_id"))))
      .select("rank", "doc_id", "bm25")
  }

  def bm25Sql: String = {
    val tfDefs = Bm25Terms.zipWithIndex.map { case (t, i) =>
      s"len(list_filter(ws, w -> w = '$t')) AS tf_$i"
    }.mkString(",\n      |    ")
    val dfDefs = Bm25Terms.indices.map(i =>
      s"sum(CASE WHEN tf_$i > 0 THEN 1 ELSE 0 END)::DOUBLE AS df_$i")
      .mkString(",\n      |    ")
    // (k1+1) multiplies an INTEGER tf: without the ::DOUBLE cast DuckDB
    // would evaluate it in exact DECIMAL while Spark works in binary
    // double — a 1-ulp divergence the 6-decimal rounding can't absorb
    // on boundaries. The other literals always meet a DOUBLE operand.
    val scoreTerms = Bm25Terms.indices.map(i =>
      s"""ln((n_docs - df_$i + 0.5) / (df_$i + 0.5) + 1.0)
      |      * (tf_$i * ${Bm25K1 + 1.0}::DOUBLE)
      |      / (tf_$i + ${Bm25K1} * (1.0 - ${Bm25B} + ${Bm25B} * dl / (sum_dl / n_docs)))""")
      .mkString("\n      |    + ")
    s"""WITH d AS (
      |  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS ws
      |  FROM documents
      |), t AS (
      |  SELECT doc_id, len(ws) AS dl,
      |    $tfDefs
      |  FROM d
      |), s AS (
      |  SELECT count(*)::DOUBLE AS n_docs, sum(dl)::DOUBLE AS sum_dl,
      |    $dfDefs
      |  FROM t
      |)
      |SELECT row_number() OVER (ORDER BY bm25 DESC, doc_id) AS rank, doc_id, bm25
      |FROM (
      |  SELECT doc_id, round(
      |    $scoreTerms, 6) AS bm25
      |  FROM t, s
      |  ORDER BY bm25 DESC, doc_id LIMIT 20)
      |ORDER BY rank""".stripMargin
  }

  /** Content fingerprint of a text column (md5 of the
    * whitespace-normalized bytes) — shared by the batch fingerprint
    * query and the streaming doc dedup so their keys can't diverge.
    */
  private[graft] def fingerprintCol(c: Column): Column =
    md5(regexp_replace(lower(trim(c)), s"[$Ws]+", " ").cast("binary"))

  /** Document fingerprinting: md5 of whitespace-normalized text —
    * the join key for exact-dedup across shards.
    */
  def fingerprint(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), fingerprintCol(col("text")).as("fingerprint"))

  def fingerprintSql: String =
    """SELECT doc_id,
      |  md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fingerprint
      |FROM documents ORDER BY doc_id""".stripMargin

  // --------------------------------------------------- hybrid search

  private val RrfK = 60 // the standard reciprocal-rank-fusion constant

  /** HYBRID retrieval — reciprocal-rank fusion (Cormack et al. 2009)
    * of a lexical and a semantic ranking, the standard shape of
    * retrieval-based curation when neither signal alone suffices:
    *
    *  - lexical list: the [[bm25]] top-20 for the seed query terms;
    *  - semantic list: exact-cosine top-20 of the corpus against the
    *    query vector (vec_id 0; doc_id ≡ vec_id), the brute-force
    *    kernel every ANN variant reranks with — at scale this leg
    *    swaps to any of the ANN indexes unchanged (fusion only reads
    *    ranks);
    *  - fusion: rrf(d) = Σ_lists 1/(K + rank_d), K = 60; docs missing
    *    from a list contribute 0. Ordering is on the ROUNDED score +
    *    doc_id in both engines, so the oracle comparison is exact.
    *
    * Both input rankings already hash-match DuckDB (q_bm25,
    * q_ann_bruteforce), which is what makes the fused surface fully
    * SQL-oracled rather than rows-only. Scale shape: each leg is its
    * own top-20 (broadcastable), fusion joins two 20-row lists.
    */
  def hybridSearch(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val lex = bm25(spark, dir).select(col("doc_id"), col("rank").as("rank_lex"))
    val corpus = Similarity.vecs(spark, dir).toDF("vec_id", "v", "norm")
    val probe = corpus.filter(col("vec_id") === 0).toDF("probe_id", "p_v", "p_norm")
    val sem = Similarity.cosineScores(corpus, probe)
      .orderBy(col("cos").desc, col("vec_id")).limit(20)
      .withColumn("rank_sem", row_number().over(
        Window.orderBy(col("cos").desc, col("vec_id"))))
      .select(col("vec_id").as("doc_id"), col("rank_sem"))
    lex.join(sem, Seq("doc_id"), "full_outer")
      .withColumn("rrf", round(
        when(col("rank_lex").isNotNull,
          lit(1.0) / (lit(RrfK) + col("rank_lex"))).otherwise(lit(0.0)) +
        when(col("rank_sem").isNotNull,
          lit(1.0) / (lit(RrfK) + col("rank_sem"))).otherwise(lit(0.0)), 6))
      .withColumn("rank_lex", coalesce(col("rank_lex"), lit(0)))
      .withColumn("rank_sem", coalesce(col("rank_sem"), lit(0)))
      .orderBy(col("rrf").desc, col("doc_id")).limit(20)
      .withColumn("rank", row_number().over(
        Window.orderBy(col("rrf").desc, col("doc_id"))))
      .select("rank", "doc_id", "rrf", "rank_lex", "rank_sem")
  }

  def hybridSearchSql: String =
    s"""WITH lex AS (
      |  SELECT doc_id, rank AS rank_lex FROM (
      |${bm25Sql.linesIterator.map("    " + _).mkString("\n")}
      |  )
      |), ${Similarity.embNormCteSql}, sem AS (
      |  SELECT vec_id AS doc_id,
      |    row_number() OVER (ORDER BY cos DESC, vec_id) AS rank_sem
      |  FROM (
      |    SELECT c.vec_id,
      |      list_sum(list_transform(list_zip(c.v, p.v), z -> z[1] * z[2]))
      |        / (c.norm * p.norm) AS cos
      |    FROM e c JOIN e p ON p.vec_id = 0 AND c.vec_id <> 0
      |    ORDER BY cos DESC, c.vec_id LIMIT 20
      |  )
      |)
      |SELECT row_number() OVER (ORDER BY rrf DESC, doc_id) AS rank,
      |  doc_id, rrf, rank_lex, rank_sem
      |FROM (
      |  SELECT coalesce(l.doc_id, s.doc_id) AS doc_id,
      |    round(
      |      (CASE WHEN l.rank_lex IS NOT NULL
      |        THEN 1.0::DOUBLE / ($RrfK + l.rank_lex) ELSE 0.0::DOUBLE END)
      |      + (CASE WHEN s.rank_sem IS NOT NULL
      |        THEN 1.0::DOUBLE / ($RrfK + s.rank_sem) ELSE 0.0::DOUBLE END),
      |      6) AS rrf,
      |    coalesce(l.rank_lex, 0) AS rank_lex,
      |    coalesce(s.rank_sem, 0) AS rank_sem
      |  FROM lex l FULL OUTER JOIN sem s ON l.doc_id = s.doc_id
      |  ORDER BY rrf DESC, doc_id LIMIT 20
      |)
      |ORDER BY rank""".stripMargin
}
