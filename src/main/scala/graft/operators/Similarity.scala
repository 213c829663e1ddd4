package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over the `embeddings` table
  * (64-dim float vectors).
  *
  * Scale design: the probe set is tiny and BROADCAST, so the corpus
  * never shuffles for scoring; ranking is a per-probe top-k window
  * (partial top-k per partition before the final shuffle would be the
  * next refinement via AQE/limit pushdown). The LSH variant buckets
  * the corpus by an 8-bit random-hyperplane signature so each probe
  * only scores its probed buckets — the 100 TB path.
  */
object Similarity {

  private val TopK = 10
  private val NumProbes = 5
  // Legacy single-table signature width (embeddingDedupLsh still uses
  // it: 256 buckets + radius-3 multiprobe suit a SELF-join where both
  // sides expand). The SEARCH default below is 16 planes (65k buckets).
  private val NumPlanes = 8
  // Production search defaults (annLsh): 16 hyperplanes → 65 536
  // buckets per table; radius-2 multiprobe → Σ C(16,k), k ≤ 2 = 137
  // codes per probe per table ≈ 0.2% of each table's bucket space;
  // 4 independent tables for recall (standard E2LSH layout — recall
  // compounds as 1-(1-p_table)^L while the probed fraction only adds).
  private val SearchPlanes = 16
  private val SearchRadius = 2
  private val SearchTables = 4

  private[graft] def vecs(spark: SparkSession, dir: String): DataFrame =
    vecsOf(Tables.embeddings(spark, dir))

  /** (vec_id, v, norm) corpus from any (vec_id, embedding) table. */
  private[graft] def vecsOf(emb: DataFrame): DataFrame =
    emb.select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .withColumn("norm", sqrt(Dedup.dot(col("v"), col("v"))))

  /** [[vecsOf]] carrying extra source columns through the projection
    * — metadata-filtered search needs `label` NEXT to the vector, and
    * re-attaching it via a corpus⋈corpus 1:1 self-join (the shape this
    * replaces) is a full corpus shuffle at 100 TB for a column that
    * sits in the same parquet row.
    */
  private[graft] def vecsWithOf(emb: DataFrame, extra: String*): DataFrame =
    emb.select(Seq(col("vec_id"),
        col("embedding").cast("array<double>").as("v")) ++
      extra.map(col): _*)
      .withColumn("norm", sqrt(Dedup.dot(col("v"), col("v"))))

  /** Brute-force cosine top-k for probe vectors (vec_id < 5):
    * exact baseline the approximate variant is measured against.
    */
  /** Exact cosine of every corpus row against the broadcast probe
    * rows, self-excluded — the ONE brute-force scoring kernel
    * ([[annBruteForce]] and the hybrid fusion's semantic leg share
    * it, which is what keeps their oracle hash matches coupled).
    */
  private[graft] def cosineScores(corpus: DataFrame,
      probes: DataFrame): DataFrame =
    corpus.join(broadcast(probes), col("vec_id") =!= col("probe_id"))
      .withColumn("cos", Dedup.dot(col("v"), col("p_v")) / (col("norm") * col("p_norm")))

  def annBruteForce(spark: SparkSession, dir: String): DataFrame = {
    val corpus = vecs(spark, dir).toDF("vec_id", "v", "norm")
    annBruteForceOn(corpus, corpus.filter(col("vec_id") < NumProbes)
      .toDF("probe_id", "p_v", "p_norm"))
  }

  /** [[annBruteForce]] over an explicit corpus/probe pair — the exact
    * ground truth the synthetic-corpus recall harnesses compare
    * against (same shape contract as [[annLshOn]]).
    */
  private[graft] def annBruteForceOn(corpus: DataFrame,
      probes: DataFrame): DataFrame = {
    val scored = cosineScores(corpus, probes)
    val w = Window.partitionBy("probe_id").orderBy(col("cos").desc, col("vec_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= TopK)
      .select(col("probe_id"), col("rank"), col("vec_id").as("neighbor_id"),
        round(col("cos"), 6).as("cosine"))
  }

  /** kNN LABEL CLASSIFICATION — similarity search put to work: a
    * deterministic quarter of the corpus (vec_id % 4 = 0) is
    * classified by majority vote over its [[TopK]] exact-cosine
    * neighbors' `label`s (ties: larger vote count, then smaller
    * label), scored against the vector's own gold label. The eval
    * surface that says whether the embedding space separates the
    * classes well enough for retrieval-based labeling.
    *
    * Scale shape: the probe sample rides broadcast through the ONE
    * shared brute-force kernel ([[cosineScores]]), corpus scanned
    * once, then all work is on the top-k rows (probes × k). At
    * production scale the exact kernel swaps for any ANN serve with
    * the identical (probe_id, neighbor_id) surface — the recall
    * probes quantify exactly what that substitution costs.
    */
  def knnClassify(spark: SparkSession, dir: String): DataFrame =
    knnClassifyOn(vecs(spark, dir).toDF("vec_id", "v", "norm"),
      Tables.embeddings(spark, dir).select("vec_id", "label"))

  /** [[knnClassify]] over an explicit corpus/label pair — the spec
    * plants label-pure blobs through this to prove the vote mechanics
    * (the testdata's `label` column is independent of the embedding
    * geometry, so accuracy there is chance by construction).
    */
  private[graft] def knnClassifyOn(corpus: DataFrame,
      labels: DataFrame): DataFrame = {
    val probes = corpus.filter(col("vec_id") % 4 === 0)
      .toDF("probe_id", "p_v", "p_norm")
    val w = Window.partitionBy("probe_id")
      .orderBy(col("cos").desc, col("vec_id"))
    val topk = cosineScores(corpus, probes)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= TopK)
      .join(labels, "vec_id")
    // nulls_last matches DuckDB's default ASC null ordering: a NULL
    // neighbor label that ties on votes must lose to a real label on
    // both engines
    val wv = Window.partitionBy("probe_id")
      .orderBy(col("votes").desc, col("label").asc_nulls_last)
    topk.groupBy("probe_id", "label")
      .agg(count(lit(1)).as("votes"))
      .withColumn("vr", row_number().over(wv))
      .filter(col("vr") === 1)
      .select(col("probe_id"), col("label").as("predicted_label"),
        col("votes"))
      .join(labels.toDF("probe_id", "label"), "probe_id")
      .select(col("probe_id"), col("label"), col("predicted_label"),
        col("votes"),
        (col("label") === col("predicted_label")).as("is_match"))
  }

  def knnClassifySql: String =
    s"""WITH $embNormCteSql, scored AS (
       |  SELECT p.vec_id AS probe_id, c.vec_id AS neighbor_id,
       |    list_sum(list_transform(list_zip(c.v, p.v), z -> z[1] * z[2]))
       |      / (c.norm * p.norm) AS cos
       |  FROM e c JOIN e p ON p.vec_id % 4 = 0 AND c.vec_id <> p.vec_id
       |), ranked AS (
       |  SELECT probe_id, neighbor_id,
       |    row_number() OVER (PARTITION BY probe_id
       |      ORDER BY cos DESC, neighbor_id) AS rank
       |  FROM scored
       |), votes AS (
       |  SELECT t.probe_id, l.label, count(*)::BIGINT AS votes
       |  FROM ranked t JOIN embeddings l ON l.vec_id = t.neighbor_id
       |  WHERE t.rank <= $TopK
       |  GROUP BY t.probe_id, l.label
       |), pred AS (
       |  SELECT probe_id, label AS predicted_label, votes,
       |    row_number() OVER (PARTITION BY probe_id
       |      ORDER BY votes DESC, label) AS vr
       |  FROM votes
       |)
       |SELECT p.probe_id, g.label, p.predicted_label, p.votes,
       |  (g.label = p.predicted_label) AS is_match
       |FROM pred p JOIN embeddings g ON g.vec_id = p.probe_id
       |WHERE p.vr = 1
       |ORDER BY p.probe_id""".stripMargin

  /** Margin-criterion candidate-list depth for [[bitextMargin]]
    * (k in Artetxe & Schwenk 2019's ratio margin).
    */
  private[graft] val BitextK = 4

  /** Acceptance threshold on the ratio margin — pairs whose best
    * margin clears it AND are mutual best are mined. 1.05 keeps a
    * non-trivial accepted subset on the synthetic corpus; production
    * tunes it on held-out gold pairs like any mining run.
    */
  private[graft] val BitextThreshold = "1.05"

  /** MARGIN-BASED BITEXT MINING (Artetxe & Schwenk 2019, the
    * parallel-pair mining step behind CCMatrix/NLLB-scale translation
    * training data) — beyond-reference tier: given two embedding
    * sides (the harness maps even vec_ids to side X, odd to side Y;
    * production swaps in language-keyed tables), each X sentence
    * scores its top-[[BitextK]] Y candidates with the RATIO margin —
    * cos(x,y) normalized by the mean of both ends' k-NN cosines, the
    * correction that kills the hubness failure of raw cosine
    * thresholds (a generically-central "hub" sentence has high
    * cosine to everything, but also a high k-NN denominator) — and
    * emits its best-margin candidate with the MUTUAL-best flag; a
    * pair is mined (`accepted`) when it is mutual AND clears
    * [[BitextThreshold]].
    *
    * Cross-engine exactness: cosines round to 12 decimals (the raw
    * double agrees bit-for-bit — the q_ann_bruteforce discipline);
    * k-NN denominators sum those as DECIMAL(28,14) (order-independent
    * exact addition), margins divide identically-ordered doubles and
    * round to 8; every rank ties on (value, id).
    *
    * Scale shape: this registered surface scores X×Y EXACTLY — the
    * verify-scale baseline, like q_dedup_embedding (its oracle is
    * quadratic, so it joins the replica-sweep exclusion tier). The
    * margin itself is a per-candidate-list POST-PROCESS: the
    * production path feeds it from any of the nine gated ANN
    * families (IVF cells / LSH buckets / HNSW beams bound the
    * candidate sets) — the denominators and ranks then run on
    * k-sized lists per sentence, one corpus-keyed shuffle each way.
    */
  def bitextMargin(spark: SparkSession, dir: String): DataFrame =
    bitextMarginOn(vecs(spark, dir))

  private[graft] def bitextMarginOn(e: DataFrame): DataFrame = {
    val x = e.filter(col("vec_id") % 2 === 0).toDF("x_id", "x_v", "x_norm")
    val y = e.filter(col("vec_id") % 2 === 1).toDF("y_id", "y_v", "y_norm")
    val pairs = x.join(y, col("x_id") =!= col("y_id"))
      .select(col("x_id"), col("y_id"),
        round(Dedup.dot(col("x_v"), col("y_v"))
          / (col("x_norm") * col("y_norm")), 12).as("cos"))
    val wf = Window.partitionBy("x_id").orderBy(col("cos").desc, col("y_id"))
    val wb = Window.partitionBy("y_id").orderBy(col("cos").desc, col("x_id"))
    marginMine(pairs
      .withColumn("fr", row_number().over(wf))
      .withColumn("br", row_number().over(wb)))
  }

  /** The margin post-process both miners share: given scored pairs
    * with per-direction candidate ranks (`fr` within x's list, `br`
    * within y's — NULL when a pair is not in that direction's
    * candidate set, as the ANN-bounded variant produces), compute
    * k-NN denominators as exact decimal sums, the ratio margin, each
    * side's best-margin choice, and the mutual/accepted verdicts.
    * ONE definition, so the exact baseline and the candidate-bounded
    * production path cannot drift in the math — only in who the
    * candidates are.
    */
  private def marginMine(rankedPairs: DataFrame): DataFrame = {
    val ranked = rankedPairs
      .filter(col("fr") <= BitextK || col("br") <= BitextK)
    val dx = ranked.filter(col("fr") <= BitextK).groupBy("x_id")
      .agg(sum(col("cos").cast("decimal(28,14)")).as("sx"),
        count(lit(1)).as("kx"))
    val dy = ranked.filter(col("br") <= BitextK).groupBy("y_id")
      .agg(sum(col("cos").cast("decimal(28,14)")).as("sy"),
        count(lit(1)).as("ky"))
    val margins = ranked
      .join(dx, Seq("x_id")).join(dy, Seq("y_id"))
      .withColumn("margin", round(col("cos")
        / ((col("sx").cast("double") / col("kx")
          + col("sy").cast("double") / col("ky")) / 2), 8))
    val bestX = margins.filter(col("fr") <= BitextK)
      .withColumn("rx", row_number().over(Window.partitionBy("x_id")
        .orderBy(col("margin").desc, col("y_id"))))
      .filter(col("rx") === 1)
    val bestY = margins.filter(col("br") <= BitextK)
      .withColumn("ry", row_number().over(Window.partitionBy("y_id")
        .orderBy(col("margin").desc, col("x_id"))))
      .filter(col("ry") === 1)
      .select(col("y_id"), col("x_id").as("y_best_x"))
    bestX.join(bestY, Seq("y_id"), "left")
      .withColumn("mutual",
        coalesce(col("y_best_x") === col("x_id"), lit(false)))
      .select(col("x_id"), col("y_id"), col("cos"), col("margin"),
        col("mutual"),
        (col("mutual") && col("margin") >= expr(BitextThreshold))
          .as("accepted"))
  }

  /** The PRODUCTION bitext miner: the same [[marginMine]] math over
    * IVF-BOUNDED candidates — each vector probes its `nProbe`
    * nearest cells of the shared seeded quantizer (the q_ann_ivf /
    * q_semdedup / q_topic_mix one), a pair is a candidate when
    * either end's probe set covers the other's cell, and ranks
    * within each direction run over that candidate set only. One
    * cell-keyed equi-join per direction replaces the X×Y score —
    * the shuffle is bounded by cells × occupancy, the 100 TB shape;
    * candidate truncation can only LOSE pairs vs the exact
    * baseline, never invent them, and the recall it costs is
    * hash-graded by [[bitextGate]].
    */
  def bitextMarginIvf(spark: SparkSession, dir: String,
      nProbe: Int = 8): DataFrame =
    bitextMarginIvfOn(ivfIndex(spark, dir), nProbe)

  private[graft] def bitextMarginIvfOn(idx: IvfIndex,
      nProbe: Int): DataFrame = {
    val probeCells = idx.assigned.crossJoin(broadcast(idx.centers))
      .withColumn("d2", Dedup.dot(col("center"), col("center"))
        - lit(2.0) * Dedup.dot(col("v"), col("center")))
      .withColumn("cr", row_number().over(Window.partitionBy("vec_id")
        .orderBy(col("d2"), col("center_cell"))))
      .filter(col("cr") <= nProbe)
      .select(col("vec_id"), col("center_cell").as("pcell"))
    val x = idx.assigned.filter(col("vec_id") % 2 === 0)
      .toDF("x_id", "x_v", "x_norm", "x_cell")
    val y = idx.assigned.filter(col("vec_id") % 2 === 1)
      .toDF("y_id", "y_v", "y_norm", "y_cell")
    val px = probeCells.filter(col("vec_id") % 2 === 0)
      .toDF("x_id", "pcell")
    val py = probeCells.filter(col("vec_id") % 2 === 1)
      .toDF("y_id", "pcell")
    // candidate id pairs per direction (each y sits in ONE cell, so a
    // probe-set join cannot duplicate a pair within a direction)
    val candX = x.select("x_id").join(px, Seq("x_id"))
      .join(y.select(col("y_id"), col("y_cell").as("pcell")), Seq("pcell"))
      .select(col("x_id"), col("y_id"), lit(true).as("dir_x"),
        lit(false).as("dir_y"))
    val candY = y.select("y_id").join(py, Seq("y_id"))
      .join(x.select(col("x_id"), col("x_cell").as("pcell")), Seq("pcell"))
      .select(col("x_id"), col("y_id"), lit(false).as("dir_x"),
        lit(true).as("dir_y"))
    val cand = candX.unionByName(candY)
      .groupBy("x_id", "y_id")
      .agg(max("dir_x").as("dir_x"), max("dir_y").as("dir_y"))
    val scored = cand
      .join(x.select("x_id", "x_v", "x_norm"), Seq("x_id"))
      .join(y.select("y_id", "y_v", "y_norm"), Seq("y_id"))
      .select(col("x_id"), col("y_id"), col("dir_x"), col("dir_y"),
        round(Dedup.dot(col("x_v"), col("y_v"))
          / (col("x_norm") * col("y_norm")), 12).as("cos"))
    // per-direction ranks over the candidate subsets; a pair outside
    // a direction's set carries NULL there (marginMine's contract)
    val wf = Window.partitionBy("x_id").orderBy(col("cos").desc, col("y_id"))
    val wb = Window.partitionBy("y_id").orderBy(col("cos").desc, col("x_id"))
    val fr = scored.filter(col("dir_x"))
      .withColumn("fr", row_number().over(wf))
      .select("x_id", "y_id", "fr")
    val br = scored.filter(col("dir_y"))
      .withColumn("br", row_number().over(wb))
      .select("x_id", "y_id", "br")
    marginMine(scored
      .join(fr, Seq("x_id", "y_id"), "left")
      .join(br, Seq("x_id", "y_id"), "left")
      .select("x_id", "y_id", "cos", "fr", "br"))
  }

  /** Recall floor for [[bitextGate]] — the fraction of the EXACT
    * miner's accepted pairs the IVF-bounded production path must
    * retain. The driver corpus is UNIFORM random — the documented
    * hard instance for every locality method here (true neighbors at
    * cos ≈ 0.3 spread across cells like everything else) — so the
    * default nProbe=8 of 16 cells measures recall 0.78 / 0.85 at
    * sf0.001 / sf0.01 (nProbe sweep: 4 → ~0.50, 12 → ~0.97); the
    * CLUSTERED regime real parallel text lives in (translation pairs
    * at cos ≈ 0.9) holds near-1.0 recall at small nProbe
    * (spec-pinned on the SynthData corpus). 0.6 is the loose
    * regression tier: the gate catches outright candidate-generation
    * breakage, not the envelope.
    */
  private[graft] val BitextRecallFloor = 0.6

  /** BITEXT PRODUCTION-PATH GATE: recall of [[bitextMarginIvf]]'s
    * accepted pairs against the exact [[bitextMargin]] baseline —
    * `n_exact_accepted` is recomputed by the oracle's own full
    * margin SQL, and `recall_ok` must equal the TRUE literal, so a
    * broken quantizer, probe-set join, or rank-partition regression
    * in the bounded miner breaks the driver hash. (Both sides'
    * oracles are X×Y-quadratic → replica-sweep exclusion tier, like
    * every verify-scale embedding baseline.)
    */
  def bitextGate(spark: SparkSession, dir: String): DataFrame = {
    val exact = bitextMargin(spark, dir).filter(col("accepted"))
      .select("x_id", "y_id")
    val ann = bitextMarginIvf(spark, dir).filter(col("accepted"))
      .select(col("x_id"), col("y_id"), lit(1).as("hit"))
    exact.join(ann, Seq("x_id", "y_id"), "left")
      .agg(count(lit(1)).as("n_exact_accepted"),
        coalesce(sum(coalesce(col("hit"), lit(0))).cast("double")
          / count(lit(1)).cast("double") >= BitextRecallFloor,
          lit(true)).as("recall_ok"))
  }

  def bitextGateSql: String =
    s"""SELECT count(*)::BIGINT AS n_exact_accepted, true AS recall_ok
       |FROM ($bitextMarginSql) WHERE accepted""".stripMargin

  def bitextMarginSql: String =
    s"""WITH $embNormCteSql, p AS (
       |  SELECT a.vec_id AS x_id, b.vec_id AS y_id,
       |    round(list_sum(list_transform(list_zip(a.v, b.v),
       |      z -> z[1] * z[2])) / (a.norm * b.norm), 12) AS cos
       |  FROM e a JOIN e b
       |    ON a.vec_id % 2 = 0 AND b.vec_id % 2 = 1
       |), r AS (
       |  SELECT *,
       |    row_number() OVER (PARTITION BY x_id ORDER BY cos DESC, y_id) AS fr,
       |    row_number() OVER (PARTITION BY y_id ORDER BY cos DESC, x_id) AS br
       |  FROM p
       |), rk AS (SELECT * FROM r WHERE fr <= $BitextK OR br <= $BitextK),
       |dx AS (
       |  SELECT x_id, sum(cos::DECIMAL(28,14)) AS sx, count(*)::BIGINT AS kx
       |  FROM rk WHERE fr <= $BitextK GROUP BY 1
       |), dy AS (
       |  SELECT y_id, sum(cos::DECIMAL(28,14)) AS sy, count(*)::BIGINT AS ky
       |  FROM rk WHERE br <= $BitextK GROUP BY 1
       |), m AS (
       |  SELECT rk.*, round(cos
       |    / ((sx::DOUBLE / kx + sy::DOUBLE / ky) / 2), 8) AS margin
       |  FROM rk JOIN dx USING (x_id) JOIN dy USING (y_id)
       |), bx AS (
       |  SELECT *, row_number() OVER (PARTITION BY x_id
       |    ORDER BY margin DESC, y_id) AS rx
       |  FROM m WHERE fr <= $BitextK
       |), byb AS (
       |  SELECT y_id, x_id AS y_best_x FROM (
       |    SELECT y_id, x_id, row_number() OVER (PARTITION BY y_id
       |      ORDER BY margin DESC, x_id) AS ry
       |    FROM m WHERE br <= $BitextK) WHERE ry = 1
       |)
       |SELECT bx.x_id, bx.y_id, bx.cos, bx.margin,
       |  coalesce(byb.y_best_x = bx.x_id, false) AS mutual,
       |  (coalesce(byb.y_best_x = bx.x_id, false)
       |    AND bx.margin >= $BitextThreshold) AS accepted
       |FROM bx LEFT JOIN byb USING (y_id)
       |WHERE bx.rx = 1
       |ORDER BY bx.x_id""".stripMargin

  /** The embeddings-with-norm CTE body shared by every SQL dual that
    * scores exact cosines (annBruteForceSql, hybridSearchSql) — one
    * definition so the duals cannot drift.
    */
  private[graft] val embNormCteSql: String =
    """e AS (
       |  SELECT vec_id, embedding::DOUBLE[] AS v,
       |    sqrt(list_sum(list_transform(list_zip(embedding::DOUBLE[], embedding::DOUBLE[]),
       |      z -> z[1] * z[2]))) AS norm
       |  FROM embeddings
       |)""".stripMargin

  def annBruteForceSql: String =
    s"""WITH $embNormCteSql, scored AS (
       |  SELECT p.vec_id AS probe_id, c.vec_id AS neighbor_id,
       |    list_sum(list_transform(list_zip(c.v, p.v), z -> z[1] * z[2]))
       |      / (c.norm * p.norm) AS cos
       |  FROM e c JOIN e p ON p.vec_id < $NumProbes AND c.vec_id <> p.vec_id
       |), ranked AS (
       |  SELECT probe_id, neighbor_id, cos,
       |    row_number() OVER (PARTITION BY probe_id ORDER BY cos DESC, neighbor_id) AS rank
       |  FROM scored
       |)
       |SELECT probe_id, rank, neighbor_id, round(cos, 6) AS cosine
       |FROM ranked WHERE rank <= $TopK
       |ORDER BY probe_id, rank""".stripMargin

  /** FILTERED ANN — metadata-predicate vector search, the production
    * retrieval shape plain top-k misses (RAG over one tenant's
    * documents, same-class retrieval, date-scoped search): each probe
    * retrieves its exact cosine top-[[TopK]] among only the corpus
    * vectors whose `label` matches the probe's own. PRE-filtering —
    * the predicate lives in the JOIN condition, so non-matching
    * vectors are dropped before any dot product is spent and the
    * result can never come up short the way post-filtering a plain
    * top-k does (the classic filtered-search failure: filter after
    * rank and a selective predicate leaves < k survivors).
    *
    * Scale shape: identical to [[annBruteForceOn]] — probes
    * broadcast, one corpus scan, work on top-k rows; the label
    * filter prunes the scored set to the predicate's selectivity.
    * [[annFilteredIvf]] is the indexed dual.
    */
  def annFiltered(spark: SparkSession, dir: String): DataFrame =
    annFilteredOn(vecsWithOf(Tables.embeddings(spark, dir), "label"))

  private[graft] def annFilteredOn(corpus: DataFrame): DataFrame = {
    val probes = corpus.filter(col("vec_id") < NumProbes)
      .select(col("vec_id").as("probe_id"), col("v").as("p_v"),
        col("norm").as("p_norm"), col("label").as("p_label"))
    val scored = corpus
      .join(broadcast(probes),
        col("label") === col("p_label") && col("vec_id") =!= col("probe_id"))
      .withColumn("cos",
        Dedup.dot(col("v"), col("p_v")) / (col("norm") * col("p_norm")))
    val w = Window.partitionBy("probe_id").orderBy(col("cos").desc, col("vec_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= TopK)
      .select(col("probe_id"), col("p_label").as("label"), col("rank"),
        col("vec_id").as("neighbor_id"), round(col("cos"), 6).as("cosine"))
  }

  def annFilteredSql: String =
    s"""WITH $embNormCteSql, el AS (
       |  SELECT e.vec_id, e.v, e.norm, l.label
       |  FROM e JOIN embeddings l ON l.vec_id = e.vec_id
       |), scored AS (
       |  SELECT p.vec_id AS probe_id, p.label AS label,
       |    c.vec_id AS neighbor_id,
       |    list_sum(list_transform(list_zip(c.v, p.v), z -> z[1] * z[2]))
       |      / (c.norm * p.norm) AS cos
       |  FROM el c JOIN el p ON p.vec_id < $NumProbes
       |    AND c.label = p.label AND c.vec_id <> p.vec_id
       |), ranked AS (
       |  SELECT probe_id, label, neighbor_id, cos,
       |    row_number() OVER (PARTITION BY probe_id
       |      ORDER BY cos DESC, neighbor_id) AS rank
       |  FROM scored
       |)
       |SELECT probe_id, label, rank, neighbor_id, round(cos, 6) AS cosine
       |FROM ranked WHERE rank <= $TopK
       |ORDER BY probe_id, rank""".stripMargin

  /** Filtered search through the IVF index — the predicate pushes
    * into the probed cells (scored candidates = matching-label
    * vectors of the nProbe nearest cells; the filter sits in the
    * join condition, before any dot product). At nProbe = k (all
    * cells probed) the result is spec-proven EQUAL to the exact
    * [[annFiltered]] — the machinery is lossless, nProbe only trades
    * candidate coverage, exactly as in the unfiltered family.
    */
  def annFilteredIvf(spark: SparkSession, dir: String,
      nProbe: Int = 3): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    annFilteredIvfSearch(ivfIndex(spark, dir),
      emb.select("vec_id", "label"), nProbe)
  }

  private[graft] def annFilteredIvfSearch(idx: IvfIndex, labels: DataFrame,
      nProbe: Int): DataFrame = {
    val labeled = idx.assigned.join(labels, Seq("vec_id"))
    val probes = labeled.filter(col("vec_id") < NumProbes)
      .select(col("vec_id").as("probe_id"), col("v").as("p_v"),
        col("norm").as("p_norm"), col("label").as("p_label"))
    val probeCells = probes.crossJoin(broadcast(idx.centers))
      .withColumn("d2", Dedup.dot(col("center"), col("center"))
        - lit(2.0) * Dedup.dot(col("p_v"), col("center")))
      .withColumn("cell_rank", row_number().over(
        Window.partitionBy("probe_id").orderBy(col("d2"), col("center_cell"))))
      .filter(col("cell_rank") <= nProbe)
      .select(col("probe_id"), col("p_v"), col("p_norm"), col("p_label"),
        col("center_cell").as("cell"))
    val scored = labeled.join(broadcast(probeCells),
      labeled("cell") === probeCells("cell") &&
        col("label") === col("p_label") && col("vec_id") =!= col("probe_id"))
      .withColumn("cos",
        Dedup.dot(col("v"), col("p_v")) / (col("norm") * col("p_norm")))
    val w = Window.partitionBy("probe_id").orderBy(col("cos").desc, col("vec_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= TopK)
      .select(col("probe_id"), col("p_label").as("label"), col("rank"),
        col("vec_id").as("neighbor_id"), round(col("cos"), 6).as("cosine"))
  }

  /** IVF (inverted-file) approximate top-k — the trained-partition
    * scale path: KMeans coarse quantizer (k=16, seeded) over the
    * corpus, probes scan only their nProbe=3 nearest cells. At 100 TB
    * the assignment is a narrow map (centroids broadcast with the
    * model) and search shuffles only the probed cells, ~k/nProbe of
    * the corpus.
    */
  /** A fitted IVF index: cell-assigned corpus + the coarse-quantizer
    * centroids. Built once, searched many times (RecallProbe sweeps
    * nProbe against one index instead of refitting per point).
    */
  case class IvfIndex(assigned: DataFrame, centers: DataFrame)

  def ivfIndex(spark: SparkSession, dir: String): IvfIndex =
    fitIvf(vecs(spark, dir).toDF("vec_id", "v", "norm"))

  /** Persist a fitted IVF index (cell-assigned corpus + centroids) as
    * parquet — build once, serve many: at scale the assignment pass
    * over the corpus dominates, so query jobs load the index instead
    * of re-clustering. Loading back and searching returns the same
    * results as a fresh build (seeded KMeans; spec-asserted).
    */
  def saveIvfIndex(idx: IvfIndex, path: String): Unit = {
    idx.assigned.write.mode("overwrite").parquet(s"$path/assigned")
    idx.centers.write.mode("overwrite").parquet(s"$path/centers")
    IndexManifest.write(idx.assigned.sparkSession, path, "ann_ivf",
      Seq("assigned", "centers"))
  }

  def loadIvfIndex(spark: SparkSession, path: String): IvfIndex = {
    IndexManifest.validate(spark, path, "ann_ivf", Seq("assigned", "centers")): Unit
    val assigned = spark.read.parquet(s"$path/assigned")
    val centers = spark.read.parquet(s"$path/centers")
    // validate + re-project to canonical order: the search path renames
    // positionally, so a column-reordered dir must fail HERE, loudly,
    // not mislabel norms as cells deep inside the join
    require(assigned.columns.toSet == Set("vec_id", "v", "norm", "cell"),
      s"invalid IVF index at $path/assigned: ${assigned.columns.mkString(",")}")
    require(centers.columns.toSet == Set("center_cell", "center"),
      s"invalid IVF index at $path/centers: ${centers.columns.mkString(",")}")
    IvfIndex(assigned.select("vec_id", "v", "norm", "cell"),
      centers.select("center_cell", "center"))
  }

  def annIvf(spark: SparkSession, dir: String, nProbe: Int = 3): DataFrame =
    annIvfSearch(ivfIndex(spark, dir), nProbe)

  /** Mean nearest-centroid L2 distance of an assigned corpus — the
    * quantization error the drift test compares against. One narrow
    * pass (centroids broadcast); a production index would persist this
    * scalar at build time instead of recomputing it.
    */
  private[operators] def meanAssignedDistance(idx: IvfIndex): Double =
    idx.assigned
      .join(broadcast(idx.centers), col("cell") === col("center_cell"))
      // d2 can round to ~-1e-16 for a vector sitting on its centroid
      // (near-dup embeddings do) — unguarded sqrt would NaN the mean
      // and permanently disable the drift-recluster comparison
      .select(avg(sqrt(greatest(Dedup.dot(col("v"), col("v"))
        - lit(2.0) * Dedup.dot(col("v"), col("center"))
        + Dedup.dot(col("center"), col("center")), lit(0.0)))).as("d"))
      .head.getDouble(0)

  /** INCREMENTAL index maintenance — how a 100 TB deployment absorbs
    * a new ingest batch without refitting the coarse quantizer on
    * every write:
    *
    *  - APPEND path (no drift): new vectors are assigned to their
    *    nearest EXISTING centroid — a narrow broadcast map over the
    *    batch only; the corpus is untouched.
    *  - RECLUSTER path (drift): when the batch's mean
    *    nearest-centroid distance exceeds `driftFactor ×` the index's
    *    own mean quantization error — i.e. the new data lives where
    *    the trained cells aren't — the quantizer is refit over
    *    corpus + batch and everything is reassigned. Refit cost is
    *    amortized: it triggers on distribution SHIFT, not on volume.
    *
    * Returns the updated index and whether a recluster happened.
    */
  def updateIvfIndex(idx: IvfIndex, newVecs: DataFrame,
      driftFactor: Double = 1.5): (IvfIndex, Boolean) = {
    val batch = newVecs
      .select(col("vec_id"), col("v").cast("array<double>").as("v"))
      .withColumn("norm", sqrt(Dedup.dot(col("v"), col("v"))))
    // nearest existing centroid per new vector (argmin over a
    // broadcast crossJoin — centers are k rows)
    val w = Window.partitionBy("vec_id").orderBy(col("d2"), col("center_cell"))
    val assignedBatch = batch.crossJoin(broadcast(idx.centers))
      .withColumn("d2", Dedup.dot(col("v"), col("v"))
        - lit(2.0) * Dedup.dot(col("v"), col("center"))
        + Dedup.dot(col("center"), col("center")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
    val batchDist = assignedBatch
      .select(avg(sqrt(greatest(col("d2"), lit(0.0)))).as("d")).head.getDouble(0)
    val drifted = batchDist > driftFactor * meanAssignedDistance(idx)
    val union = idx.assigned.select("vec_id", "v", "norm")
      .unionByName(batch.select("vec_id", "v", "norm"))
    if (!drifted) {
      val appended = idx.assigned.unionByName(
        assignedBatch.select(col("vec_id"), col("v"), col("norm"),
          col("center_cell").as("cell")))
      (IvfIndex(appended, idx.centers), false)
    } else {
      (fitIvf(union), true)
    }
  }

  /** Fit the coarse quantizer over an arbitrary (vec_id, v, norm)
    * corpus — shared by [[ivfIndex]] and the drift recluster path.
    */
  private[graft] def fitIvf(corpus: DataFrame): IvfIndex = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val feats = corpus.withColumn("features", array_to_vector(col("v")))
    val model = new KMeans().setK(16).setSeed(42L).setMaxIter(5)
      .fit(feats.select("features"))
    val assigned = model.transform(feats)
      .select(col("vec_id"), col("v"), col("norm"), col("prediction").as("cell"))
    val centers = corpus.sparkSession.createDataFrame(
      model.clusterCenters.zipWithIndex.toIndexedSeq
        .map { case (c, i) => (i, c.toArray) })
      .toDF("center_cell", "center")
    IvfIndex(assigned, centers)
  }

  def annIvfSearch(idx: IvfIndex, nProbe: Int): DataFrame = {
    val assigned = idx.assigned
    val centers = idx.centers
    // nProbe nearest cells per probe by L2 (rank via -2·p·c + c·c;
    // the p·p term is constant per probe)
    val probes = assigned.filter(col("vec_id") < NumProbes)
      .toDF("probe_id", "p_v", "p_norm", "p_cell")
    val probeCells = probes.crossJoin(broadcast(centers))
      .withColumn("d2", Dedup.dot(col("center"), col("center"))
        - lit(2.0) * Dedup.dot(col("p_v"), col("center")))
      .withColumn("cell_rank", row_number().over(
        Window.partitionBy("probe_id").orderBy(col("d2"), col("center_cell"))))
      .filter(col("cell_rank") <= nProbe)
      .select(col("probe_id"), col("p_v"), col("p_norm"), col("center_cell").as("cell"))
    val scored = assigned.join(broadcast(probeCells), Seq("cell"))
      .filter(col("vec_id") =!= col("probe_id"))
      .withColumn("cos", Dedup.dot(col("v"), col("p_v")) / (col("norm") * col("p_norm")))
    val w = Window.partitionBy("probe_id").orderBy(col("cos").desc, col("vec_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= TopK)
      .select(col("probe_id"), col("rank"), col("vec_id").as("neighbor_id"),
        round(col("cos"), 6).as("cosine"))
  }

  /** Deterministic ±1 random hyperplanes (seeded, stable across
    * runs/JVMs since java.util.Random's algorithm is specified).
    * `table` selects an independent plane set per LSH table; table 0
    * at k=8 reproduces the original single-table planes bit-for-bit.
    */
  private[operators] def planesFor(table: Int, k: Int): Seq[Array[Double]] = {
    val rnd = new java.util.Random(42L + table * 7919L)
    Seq.fill(k)(Array.fill(64)(if (rnd.nextBoolean()) 1.0 else -1.0))
  }

  private[operators] def lshCode(v: Column, table: Int = 0,
      k: Int = NumPlanes): Column =
    planesFor(table, k).zipWithIndex.map { case (p, j) =>
      when(Dedup.dot(v, typedLit(p)) > 0, lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** All k-bit XOR masks of popcount ≤ radius — the multiprobe
    * expansion set (k=8, radius 3 → Σ C(8,j), j ≤ 3 = 93 codes;
    * k=16, radius 2 → 137 codes over 65 536 buckets).
    */
  private[graft] def hammingMasks(radius: Int,
      k: Int = NumPlanes): Seq[Long] =
    (0 until (1 << k)).filter(Integer.bitCount(_) <= radius).map(_.toLong)

  /** Int8 scalar-quantized approximate top-k with exact reranking —
    * the memory-bound scale path (the index stores 1 byte/dim, 8×
    * smaller than float64 and 4× smaller than float32, so 8× more
    * corpus fits per executor page-cache byte):
    *
    *  1. TRAIN: per-dimension [min, max] over the corpus (one narrow
    *     agg, 64 rows to the driver, broadcast back).
    *  2. QUANTIZE: each dimension to `round((x-lo)/(hi-lo)·255)` —
    *     the stored representation is the int8 code array.
    *  3. SEARCH (asymmetric, ADC-style): probes stay FULL precision;
    *     candidates are scored against the DEQUANTIZED codes only —
    *     the full-precision corpus vector is never touched.
    *  4. RERANK: the top `rerank` candidates per probe fetch their
    *     true vectors by vec_id (the only random access) and are
    *     re-scored exactly; final top-k comes from exact cosines.
    *
    * The dequantize-and-dot runs as array HOFs here (64 dims at test
    * scale); the production hot path would fuse them into one codegen
    * expression like [[graft.functions.VectorDot]].
    */
  def annSq8(spark: SparkSession, dir: String, rerank: Int = 32): DataFrame = {
    val corpus = vecs(spark, dir).toDF("vec_id", "v", "norm")
    val stats = corpus
      .select(posexplode(col("v")).as(Seq("dim", "x")))
      .groupBy("dim").agg(min("x").as("lo"), max("x").as("hi"))
      .collect().map(r => (r.getInt(0), r.getDouble(1), r.getDouble(2)))
      .sortBy(_._1)
    val lo = stats.map(_._2)
    // zero-span dims (constant column) dequantize exactly to lo
    val span = stats.map(s => math.max(s._3 - s._2, Double.MinPositiveValue))
    val codes = transform(col("v"), (x, i) =>
      least(greatest(round((x - element_at(typedLit(lo), i + 1))
        / element_at(typedLit(span), i + 1) * 255, 0), lit(0.0)), lit(255.0))
        .cast("int"))
    val dequant = transform(col("codes"), (c, i) =>
      element_at(typedLit(lo), i + 1) +
        c.cast("double") / 255 * element_at(typedLit(span), i + 1))
    // the index: vec_id + int8 codes (what a 100 TB deployment stores)
    val index = corpus.select(col("vec_id"), codes.as("codes"))
      .withColumn("dq", dequant)
      .withColumn("dq_norm", sqrt(Dedup.dot(col("dq"), col("dq"))))
    val probes = corpus.filter(col("vec_id") < NumProbes)
      .toDF("probe_id", "p_v", "p_norm")
    val approx = index.join(broadcast(probes), col("vec_id") =!= col("probe_id"))
      .withColumn("approx_cos",
        Dedup.dot(col("dq"), col("p_v")) / (col("dq_norm") * col("p_norm")))
    val wa = Window.partitionBy("probe_id").orderBy(col("approx_cos").desc, col("vec_id"))
    val cands = approx.withColumn("arank", row_number().over(wa))
      .filter(col("arank") <= rerank)
      .select("probe_id", "p_v", "p_norm", "vec_id")
    exactRerankTopK(cands, corpus)
  }

  // ------------------------------------------------- product quantization

  private val PqM = 8 // subspaces over the 64 dims
  private val PqSub = 8 // dims per subspace
  private val PqK = 16 // centroids per subspace → 4-bit codes

  /** Codebook-fit sample cap: PQ codebook quality saturates far below
    * corpus size — 16k samples is 1k per centroid per subspace, an
    * order of magnitude past saturation for PqK=16 — so the fit draws
    * at most ~this many vectors and the KMeans cost stays FLAT in
    * corpus size (ScaleProbe: the fit dominates the index build, so an
    * uncapped fit would scale the build linearly for zero recall).
    * Corpora at or under the cap fit on every vector (bit-identical
    * to uncapped).
    */
  private[graft] val PqFitSampleCap = 16384L

  /** Deterministic hash sample of ~`cap` corpus rows: keep iff
    * xxhash64(vec_id) ≡ 0 mod ⌈n/cap⌉ — reproducible across runs and
    * cluster layouts, no RNG state. Corpora at or under the cap pass
    * through whole (bit-identical to no sampling).
    */
  private def hashSample(corpus: DataFrame, cap: Long): DataFrame = {
    val n = corpus.count()
    val every = math.max(1L, (n + cap - 1) / cap)
    if (every == 1L) corpus
    else corpus.filter(pmod(xxhash64(col("vec_id")), lit(every)) === 0)
  }

  /** Fit the per-subspace PQ codebooks (`[m][c][dim]`): PqM seeded
    * KMeans fits over a deterministic [[hashSample]] of at most
    * ~`sampleCap` vectors. The sample is CACHED across the PqM fits,
    * so at 100 TB the fit costs O(sample × PqM) instead of PqM
    * full-corpus scans; the encode pass is the only full scan left.
    */
  private[graft] def fitPqCodebooks(corpus: DataFrame,
      sampleCap: Long = PqFitSampleCap): Array[Array[Array[Double]]] = {
    val sample = hashSample(corpus, sampleCap).select(col("v")).persist()
    try fitPqCodebooksOnSample(sample)
    finally sample.unpersist()
  }

  /** The PqM KMeans fits over an ALREADY-sampled (and ideally cached)
    * `v` projection — split out so [[opqIndexOf]] can reuse one
    * sample for both the rotation and the codebooks.
    */
  private def fitPqCodebooksOnSample(
      sample: DataFrame): Array[Array[Array[Double]]] = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    import scala.collection.parallel.CollectionConverters._
    // The PqM fits are independent seeded trainings over the shared
    // (cached) sample, and each one is ~20 tiny driver-blocking jobs
    // (k-means|| init passes + 5 Lloyd iterations on ≤16k rows) —
    // sequential, the stage-scheduling overhead dominates the whole
    // PQ/OPQ fit (measured: q_ann_opq_np = 545 near-empty stages).
    // Submitting them from a bounded pool overlaps the jobs (guide
    // §2.6); each fit stays seeded per subspace, so the codebooks are
    // bit-identical to the sequential loop's.
    val pool = new java.util.concurrent.ForkJoinPool(PqM)
    try {
      val par = (0 until PqM).par
      par.tasksupport = new scala.collection.parallel.ForkJoinTaskSupport(pool)
      par.map { m =>
        val feats = sample.select(
          array_to_vector(slice(col("v"), m * PqSub + 1, PqSub)).as("features"))
        new KMeans().setK(PqK).setSeed(42L + m).setMaxIter(5)
          .fit(feats).clusterCenters.map(_.toArray)
      }.toArray
    } finally pool.shutdown()
  }

  /** Per-subspace argmin code columns for vector column `vcol` (first
    * min wins — deterministic) — the ONE encode definition shared by
    * the raw-vector and residual (IVF-PQ) paths.
    */
  private def pqCodeCols(books: Array[Array[Array[Double]]],
      vcol: Column): Seq[Column] =
    (0 until PqM).map { m =>
      val sub = slice(vcol, m * PqSub + 1, PqSub)
      val d2s = transform(typedLit(books(m).map(_.toSeq).toSeq), c =>
        aggregate(zip_with(c, sub, (a, b) => (a - b) * (a - b)), lit(0.0), _ + _))
      (array_position(d2s, array_min(d2s)) - 1).cast("int")
    }

  /** ADC distance table for a probe vector column:
    * tab[m][c] = ⟨probe_m, book_m[c]⟩ — computed once per probe,
    * BEFORE any join fan-out.
    */
  private def pqTable(books: Array[Array[Array[Double]]], pv: Column): Column =
    transform(typedLit(books.map(_.map(_.toSeq).toSeq).toSeq), (cents, m) =>
      transform(cents, c =>
        Dedup.dot(c, slice(pv, m * PqSub + lit(1), lit(PqSub)))))

  /** Decode a codes column back to its reconstruction vector — the
    * ONE definition of the code→centroid gather (encode, the OPQ-NP
    * alternation, IVF-PQ, and MseProbe all reconstruct with it; a
    * drifted copy would make them silently decode differently).
    */
  private[graft] def pqReconstruct(books: Array[Array[Array[Double]]],
      codes: Column): Column = {
    val booksLit = typedLit(books.map(_.map(_.toSeq).toSeq).toSeq)
    flatten(transform(codes,
      (c, m) => element_at(element_at(booksLit, m + 1), c + 1)))
  }

  /** Σ over subspaces of the table lookup for a candidate's codes —
    * the per-candidate ADC score (no float math).
    */
  private def pqAdcSum(tab: Column, codes: Column): Column =
    aggregate(transform(codes, (c, m) =>
      element_at(element_at(tab, m + 1), c + 1)), lit(0.0), _ + _)

  /** The shared exact-rerank tail of every quantized variant: the
    * candidates (probe_id, p_v, p_norm, vec_id) fetch true vectors by
    * id, re-score exactly, and emit the ranked top-k.
    */
  private def exactRerankTopK(cands: DataFrame, corpus: DataFrame): DataFrame = {
    val rescored = cands.join(corpus, Seq("vec_id"))
      .withColumn("cos", Dedup.dot(col("v"), col("p_v")) / (col("norm") * col("p_norm")))
    val w = Window.partitionBy("probe_id").orderBy(col("cos").desc, col("vec_id"))
    rescored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= TopK)
      .select(col("probe_id"), col("rank"), col("vec_id").as("neighbor_id"),
        round(col("cos"), 6).as("cosine"))
  }

  /** Product-quantized approximate top-k with exact reranking — the
    * codebook-compressed scale path (4 bits/dim here → 4 bytes +
    * one norm per 64-dim vector, 64× smaller than the float64 corpus,
    * so the whole index rides in executor memory at corpus sizes where
    * even [[annSq8]]'s int8 codes spill):
    *
    *  1. TRAIN: PqM=8 per-subspace codebooks of PqK=16 centroids
    *     (seeded KMeans per 8-dim slice → deterministic).
    *  2. ENCODE: each vector stores only its per-subspace nearest-
    *     centroid ids (the PQ code) plus its reconstruction norm —
    *     the float vector never enters the index.
    *  3. SEARCH (ADC, asymmetric): each probe precomputes a distance
    *     TABLE tab[m][c] = ⟨probe_m, codebook_m[c]⟩ once (PqM·PqK
    *     dots); scoring a candidate is then PqM table LOOKUPS summed —
    *     no per-candidate float math. Probes carry their tables in the
    *     broadcast; the index side streams codes.
    *  4. RERANK: the top `rerank` candidates per probe fetch their
    *     true vectors by vec_id (the only random access) and are
    *     re-scored exactly; final cosines are exact.
    *
    * The lookups run as array HOFs here; the production hot path would
    * fuse the code-gather into one codegen expression like
    * [[graft.functions.VectorDot]].
    */
  /** A fitted PQ index: the encoded corpus (vec_id, codes, recon
    * norm — the ONLY per-vector state a deployment stores) plus the
    * per-subspace codebooks. Built once, searched many times;
    * persistable via [[savePqIndex]]/[[loadPqIndex]] like the IVF
    * index.
    */
  case class PqIndex(encoded: DataFrame, books: Array[Array[Array[Double]]])

  def pqIndex(spark: SparkSession, dir: String): PqIndex = {
    val corpus = vecs(spark, dir).toDF("vec_id", "v", "norm")
    val books = fitPqCodebooks(corpus)
    PqIndex(encodePq(corpus, books), books)
  }

  /** ENCODE: argmin centroid per subspace (first min wins —
    * deterministic) + the reconstruction norm the cosine needs.
    */
  private[graft] def encodePq(corpus: DataFrame,
      books: Array[Array[Array[Double]]]): DataFrame =
    corpus
      .select(col("vec_id"), array(pqCodeCols(books, col("v")): _*).as("codes"))
      .withColumn("dq", pqReconstruct(books, col("codes")))
      .withColumn("dq_norm", sqrt(Dedup.dot(col("dq"), col("dq"))))
      .select("vec_id", "codes", "dq_norm")

  /** Persist a fitted PQ index: the encoded corpus plus the codebooks
    * (flattened to (m, c, center) rows). Build once, serve many —
    * at scale the encode pass over the corpus dominates, so query
    * jobs load instead of refitting.
    */
  def savePqIndex(idx: PqIndex, path: String): Unit = {
    idx.encoded.write.mode("overwrite").parquet(s"$path/encoded")
    saveBooks(idx.encoded.sparkSession, idx.books, s"$path/books")
    IndexManifest.write(idx.encoded.sparkSession, path, "ann_pq",
      Seq("encoded", "books"))
  }

  def loadPqIndex(spark: SparkSession, path: String): PqIndex = {
    IndexManifest.validate(spark, path, "ann_pq", Seq("encoded", "books")): Unit
    val encoded = spark.read.parquet(s"$path/encoded")
    require(encoded.columns.toSet == Set("vec_id", "codes", "dq_norm"),
      s"invalid PQ index at $path/encoded: ${encoded.columns.mkString(",")}")
    PqIndex(encoded.select("vec_id", "codes", "dq_norm"),
      loadBooks(spark, s"$path/books"))
  }

  /** Codebook persistence shared by the PQ and IVF-PQ indexes:
    * flattened to (m, c, center) rows on save; on load the keys must
    * cover the full PqM × PqK grid exactly — a row-count check alone
    * would admit duplicated/missing rows and silently misalign
    * centroid positions vs ids.
    */
  private def saveBooks(spark: SparkSession,
      books: Array[Array[Array[Double]]], path: String): Unit = {
    val rows = for {
      (cents, m) <- books.zipWithIndex
      (center, c) <- cents.zipWithIndex
    } yield (m, c, center.toSeq)
    spark.createDataFrame(rows.toIndexedSeq).toDF("m", "c", "center")
      .write.mode("overwrite").parquet(path)
  }

  private def loadBooks(spark: SparkSession,
      path: String): Array[Array[Array[Double]]] = {
    val bookRows = spark.read.parquet(path)
      .select("m", "c", "center").collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getSeq[Double](2).toArray))
    val keys = bookRows.map(r => (r._1, r._2))
    val expected = for (m <- 0 until PqM; c <- 0 until PqK) yield (m, c)
    require(keys.length == expected.length && keys.toSet == expected.toSet,
      s"invalid PQ codebooks at $path: keys do not cover " +
        s"${PqM}x$PqK (got ${keys.length} rows, ${keys.toSet.size} distinct)")
    val byKey = bookRows.map(r => (r._1, r._2) -> r._3).toMap
    Array.tabulate(PqM, PqK)((m, c) => byKey((m, c)))
  }

  def annPq(spark: SparkSession, dir: String, rerank: Int = 32): DataFrame = {
    val corpus = vecs(spark, dir).toDF("vec_id", "v", "norm")
    val books = fitPqCodebooks(corpus)
    annPqSearch(PqIndex(encodePq(corpus, books), books), corpus, rerank)
  }

  /** The shared ADC scan + rerank tail of the flat quantized variants:
    * probes (carrying their precomputed `tab`) broadcast against the
    * encoded corpus, approximate rank, exact rerank of the top
    * `rerank`.
    */
  private def adcScanRerank(encoded: DataFrame, probes: DataFrame,
      corpus: DataFrame, rerank: Int, excludeSelf: Boolean): DataFrame = {
    // excludeSelf only for EVAL paths whose probes ARE corpus rows —
    // an online query's probe_id lives in its own id space, and
    // filtering on it would silently drop the corpus vector that
    // happens to share the number
    val joined = encoded.crossJoin(broadcast(probes))
    val approx = (if (excludeSelf)
        joined.filter(col("vec_id") =!= col("probe_id"))
      else joined)
      .withColumn("approx_cos",
        pqAdcSum(col("tab"), col("codes")) / (col("dq_norm") * col("p_norm")))
    val wa = Window.partitionBy("probe_id").orderBy(col("approx_cos").desc, col("vec_id"))
    val cands = approx.withColumn("arank", row_number().over(wa))
      .filter(col("arank") <= rerank)
      .select("probe_id", "p_v", "p_norm", "vec_id")
    exactRerankTopK(cands, corpus)
  }

  /** SEARCH (ADC) + exact rerank against a fitted index; `corpus`
    * supplies the probe vectors and the rerank fetch — the index side
    * never touches a float vector.
    */
  def annPqSearch(idx: PqIndex, corpus: DataFrame, rerank: Int): DataFrame = {
    val probes = corpus.filter(col("vec_id") < NumProbes)
      .toDF("probe_id", "p_v", "p_norm")
      .withColumn("tab", pqTable(idx.books, col("p_v")))
    adcScanRerank(idx.encoded, probes, corpus, rerank, excludeSelf = true)
  }

  /** SEARCH against an EXPLICIT probe batch (probe_id, p_v, p_norm) —
    * the serve-path entry: any probe set (an online query batch, a
    * probe microbatch from a stream) searches the same fitted index;
    * per-probe results are independent, so batching is pure
    * throughput. `corpus` still backs the exact rerank fetch.
    */
  def annPqSearchProbes(idx: PqIndex, probes: DataFrame, corpus: DataFrame,
      rerank: Int): DataFrame = {
    val p = probes.toDF("probe_id", "p_v", "p_norm")
      .withColumn("tab", pqTable(idx.books, col("p_v")))
    // NO self-exclusion: external probes use their own id space
    adcScanRerank(idx.encoded, p, corpus, rerank, excludeSelf = false)
  }

  // ------------------------------------------------ optimized PQ (OPQ)

  /** Parametric OPQ rotation (Ge et al. 2013, "Optimized Product
    * Quantization", the closed-form variant): PQ quantizes each 8-dim
    * slice independently, so its error is worst when variance is
    * concentrated in a few dims that share a slice. The fix is an
    * ORTHOGONAL rotation applied before encoding:
    *
    *  1. Second-moment matrix E[v·vᵀ] over the fit sample (uncentered —
    *     centering would break ⟨p,v⟩ preservation; one distributed
    *     Gramian pass, 64×64 to the driver).
    *  2. Driver-side symmetric eigendecomposition (64×64 — trivial).
    *  3. Eigenvalue-BALANCED allocation: eigenvectors are dealt in
    *     descending-λ order to the subspace with the smallest
    *     log-product of assigned λ so far — equalizing per-subspace
    *     variance products, the free-rotation objective's closed-form
    *     proxy for Gaussian data.
    *
    * The resulting R (rows = reordered eigenvectors) is orthogonal, so
    * ⟨Rp, Rv⟩ = ⟨p, v⟩ and norms are unchanged: searching rotated
    * codes against rotated probes approximates the ORIGINAL cosines,
    * and the exact rerank stays in original space.
    */
  private[graft] def fitOpqRotation(corpus: DataFrame,
      sampleCap: Long = PqFitSampleCap): Array[Array[Double]] =
    fitOpqRotationOnSample(hashSample(corpus, sampleCap).select("v"))

  /** Rotation fit over an already-sampled `v` projection (see
    * [[fitPqCodebooksOnSample]] for why the sample is shared).
    */
  private def fitOpqRotationOnSample(
      sampleDf: DataFrame): Array[Array[Double]] = {
    import org.apache.spark.mllib.linalg.{Vectors => OldVectors}
    import org.apache.spark.mllib.linalg.distributed.RowMatrix
    val sample = sampleDf.select("v")
      .rdd.map(r => OldVectors.dense(r.getSeq[Double](0).toArray))
    val dim = PqM * PqSub
    val gram = new RowMatrix(sample).computeGramianMatrix()
    val es = breeze.linalg.eigSym(
      new breeze.linalg.DenseMatrix(dim, dim, gram.toArray))
    val order = (0 until dim).sortBy(i => -es.eigenvalues(i))
    val logSum = Array.fill(PqM)(0.0)
    val counts = Array.fill(PqM)(0)
    val assign = Array.fill(PqM)(List.newBuilder[Int])
    for (i <- order) {
      val m = (0 until PqM).filter(counts(_) < PqSub)
        .minBy(j => (logSum(j), j))
      assign(m) += i
      counts(m) += 1
      logSum(m) += math.log(math.max(es.eigenvalues(i), 1e-12))
    }
    assign.flatMap(_.result())
      .map(i => Array.tabulate(dim)(j => es.eigenvectors(j, i)))
  }

  /** v′ = R·v as a column: one codegen'd dot per output dim (64 dots
    * of 64 here; a production hot path would fuse the matmul into one
    * expression like [[graft.functions.VectorDot]]).
    */
  private def rotate(rot: Array[Array[Double]], vcol: Column): Column =
    array(rot.toIndexedSeq.map(r => Dedup.dot(typedLit(r.toSeq), vcol)): _*)

  /** NON-parametric OPQ refinement (Ge et al. 2013, the OPQ-NP
    * alternation), seeded from the parametric rotation: repeat
    *
    *  1. fit codebooks on the rotated sample;
    *  2. reconstruct the rotated sample from its codes (X̂);
    *  3. orthogonal-Procrustes update — min_S ||X·S − X̂||_F over
    *     orthogonal S is S = U·Vᵀ from svd(Xᵀ·X̂), and our
    *     row-convention rotation is its transpose R = V·Uᵀ.
    *
    * The alternation lives ENTIRELY on the cached fit sample (rows
    * aligned by vec_id; Xᵀ·X̂ is 64×64 driver flops bounded by the
    * sample cap) — the corpus sees only the final rotation at encode
    * time, so index-build cost is unchanged. Returns (rotation,
    * codebooks) ready for [[encodePq]].
    *
    * MseProbe verifies the alternation: reconstruction MSE drops
    * monotonically (0.515 → 0.485 → 0.464 over 0/1/3 iterations @
    * sf0.01). Recall@10 on the tiny probe sweep is a noisier proxy
    * and can locally disagree — rerank width remains the recall knob.
    */
  private[graft] def fitOpqNp(corpus: DataFrame, iters: Int = 3,
      sampleCap: Long = PqFitSampleCap): (Array[Array[Double]], Array[Array[Array[Double]]]) = {
    val dim = PqM * PqSub
    val sampleDf = hashSample(corpus, sampleCap)
      .select("vec_id", "v").persist()
    try {
      val X = sampleDf.select("vec_id", "v").collect()
        .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
        .sortBy(_._1).map(_._2)
      var rot = fitOpqRotationOnSample(sampleDf)
      var books: Array[Array[Array[Double]]] = null
      for (_ <- 0 until iters) {
        // cache the rotated sample per iteration (see opqIndexOf — the
        // KMeans fits would otherwise replay the rotation per pass)
        val rotated = sampleDf.withColumn("v", rotate(rot, col("v"))).persist()
        try {
        books = fitPqCodebooksOnSample(rotated)
        val recon = rotated
          .select(col("vec_id"), array(pqCodeCols(books, col("v")): _*).as("codes"))
          .withColumn("dq", pqReconstruct(books, col("codes")))
          .select("vec_id", "dq").collect()
          .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
          .sortBy(_._1).map(_._2)
        val m = breeze.linalg.DenseMatrix.zeros[Double](dim, dim)
        var i = 0
        while (i < X.length) { // Xᵀ·X̂ in tight loops: cap² driver flops
          val xi = X(i)
          val ri = recon(i)
          var a = 0
          while (a < dim) {
            val xa = xi(a)
            var b = 0
            while (b < dim) { m(a, b) += xa * ri(b); b += 1 }
            a += 1
          }
          i += 1
        }
        val svd = breeze.linalg.svd(m)
        val s = svd.U * svd.Vt // column-convention optimum
        rot = Array.tabulate(dim, dim)((r, c) => s(c, r)) // R = Sᵀ
        } finally rotated.unpersist(): Unit
      }
      if (books == null) { // iters = 0: the parametric seed, no alternation
        val rotated = sampleDf.withColumn("v", rotate(rot, col("v"))).persist()
        try books = fitPqCodebooksOnSample(rotated)
        finally rotated.unpersist(): Unit
      }
      (rot, books)
    } finally sampleDf.unpersist(): Unit
  }

  def opqIndexNp(spark: SparkSession, dir: String, iters: Int = 3): OpqIndex =
    opqIndexNpOf(vecs(spark, dir).toDF("vec_id", "v", "norm"), iters)

  /** The explicit-corpus entry for the non-parametric fit — the
    * synthetic-corpus recall harnesses drive it directly.
    */
  private[graft] def opqIndexNpOf(corpus: DataFrame,
      iters: Int = 3): OpqIndex = {
    val (rot, books) = fitOpqNp(corpus, iters)
    opqIndexFromFit(corpus, rot, books)
  }

  /** Assemble an OpqIndex from an existing (rotation, codebooks) fit —
    * lets callers (and the spec) reuse one alternation for both
    * rotation checks and the search index.
    */
  private[graft] def opqIndexFromFit(corpus: DataFrame,
      rot: Array[Array[Double]],
      books: Array[Array[Array[Double]]]): OpqIndex =
    OpqIndex(encodePq(corpus.withColumn("v", rotate(rot, col("v"))), books),
      rot, books)

  /** OPQ with the non-parametric alternation — same index/search
    * shape as [[annOpq]] (OpqIndex is rotation-agnostic), tighter
    * rotation.
    */
  def annOpqNp(spark: SparkSession, dir: String, rerank: Int = 32,
      iters: Int = 3): DataFrame = {
    val corpus = vecs(spark, dir).toDF("vec_id", "v", "norm")
    annOpqSearch(opqIndexNp(spark, dir, iters), corpus, rerank)
  }

  /** A fitted OPQ index: the PQ-encoded ROTATED corpus, the rotation,
    * and the rotated-space codebooks. Same build-once/serve-many and
    * persistence contract as [[PqIndex]].
    */
  case class OpqIndex(encoded: DataFrame, rot: Array[Array[Double]],
      books: Array[Array[Array[Double]]])

  def opqIndex(spark: SparkSession, dir: String): OpqIndex =
    opqIndexOf(vecs(spark, dir).toDF("vec_id", "v", "norm"))

  private[graft] def opqIndexOf(corpus: DataFrame): OpqIndex = {
    // ONE hash sample, cached, feeds both fits: the rotation's Gramian
    // and the (rotated) codebook KMeans — sampling inside each fit
    // would scan the corpus twice for identical rows. Same rows, same
    // seeds → results are identical to the two-pass formulation.
    val sample = hashSample(corpus, PqFitSampleCap).select("v").persist()
    val (rot, books) = try {
      val r = fitOpqRotationOnSample(sample)
      // materialize the ROTATED sample: the 8 KMeans fits scan their
      // input repeatedly, and a lazy rotation over the cached raw
      // sample would replay the 64x64 matmul on every pass (measured 2.6x
      // the whole index-build time at the 20x ScaleProbe replica)
      val rotSample = sample.withColumn("v", rotate(r, col("v"))).persist()
      try (r, fitPqCodebooksOnSample(rotSample))
      finally rotSample.unpersist(): Unit
    } finally sample.unpersist()
    // |Rv| = |v|: the stored norm column stays valid after rotation
    val rotated = corpus.withColumn("v", rotate(rot, col("v")))
    OpqIndex(encodePq(rotated, books), rot, books)
  }

  def annOpq(spark: SparkSession, dir: String, rerank: Int = 32): DataFrame = {
    val corpus = vecs(spark, dir).toDF("vec_id", "v", "norm")
    annOpqSearch(opqIndex(spark, dir), corpus, rerank)
  }

  /** SEARCH: probes rotate into code space for the ADC tables; the
    * exact rerank fetches ORIGINAL vectors, so final cosines are exact
    * original-space cosines like every other quantized variant.
    */
  def annOpqSearch(idx: OpqIndex, corpus: DataFrame, rerank: Int): DataFrame = {
    val probes = corpus.filter(col("vec_id") < NumProbes)
      .toDF("probe_id", "p_v", "p_norm")
      .withColumn("tab", pqTable(idx.books, rotate(idx.rot, col("p_v"))))
    adcScanRerank(idx.encoded, probes, corpus, rerank, excludeSelf = true)
  }

  /** Persist / reload a fitted OPQ index — the PQ layout plus the
    * rotation as (i, row) parquet; loaded search == fresh (spec).
    */
  def saveOpqIndex(idx: OpqIndex, path: String): Unit = {
    idx.encoded.write.mode("overwrite").parquet(s"$path/encoded")
    saveBooks(idx.encoded.sparkSession, idx.books, s"$path/books")
    idx.encoded.sparkSession.createDataFrame(
      idx.rot.zipWithIndex.toIndexedSeq.map { case (r, i) => (i, r.toSeq) })
      .toDF("i", "row").write.mode("overwrite").parquet(s"$path/rot")
    IndexManifest.write(idx.encoded.sparkSession, path, "ann_opq",
      Seq("encoded", "books", "rot"))
  }

  def loadOpqIndex(spark: SparkSession, path: String): OpqIndex = {
    IndexManifest.validate(spark, path, "ann_opq",
      Seq("encoded", "books", "rot")): Unit
    val encoded = spark.read.parquet(s"$path/encoded")
    require(encoded.columns.toSet == Set("vec_id", "codes", "dq_norm"),
      s"invalid OPQ index at $path/encoded: ${encoded.columns.mkString(",")}")
    val dim = PqM * PqSub
    val rotRows = spark.read.parquet(s"$path/rot").select("i", "row")
      .collect().map(r => (r.getInt(0), r.getSeq[Double](1).toArray))
    require(rotRows.length == dim && rotRows.map(_._1).toSet == (0 until dim).toSet
      && rotRows.forall(_._2.length == dim),
      s"invalid OPQ rotation at $path/rot: ${rotRows.length} rows")
    val rot = rotRows.sortBy(_._1).map(_._2)
    OpqIndex(encoded.select("vec_id", "codes", "dq_norm"), rot,
      loadBooks(spark, s"$path/books"))
  }

  /** IVF-PQ — the composition of both index families, and the
    * standard production ANN layout: the IVF coarse quantizer prunes
    * the search to nProbe cells, and within a cell candidates are
    * scored from PQ codes of their RESIDUAL (v − center), which the
    * codebooks fit far better than raw vectors (residuals are
    * centered, so the 4-bit budget spends on local structure).
    *
    *  - INDEX: (vec_id, cell, codes, recon_norm) — 1 int + 8 codes +
    *    1 norm per vector; no float vectors.
    *  - SEARCH: probes expand to their nProbe nearest cells
    *    ([[annIvfSearch]]'s pruning); a candidate's approximate score
    *    is ⟨p, center_cell⟩ (one dot per (probe, cell) — computed
    *    once on the broadcast side) plus the PqM residual table
    *    lookups; exact rerank on the top `rerank`.
    *
    * Reconstruction view: center + dq(residual codes) ≈ v, so
    * ⟨p, recon⟩ = ⟨p, center⟩ + ⟨p, dq⟩ — the two terms this search
    * sums without ever touching v.
    */
  /** A fitted IVF-PQ index: cell id + residual codes + recon norm per
    * vector, the coarse centroids, and the residual codebooks. Built
    * once, searched many (RecallProbe sweeps nProbe × rerank against
    * one fit, mirroring [[IvfIndex]]/[[PqIndex]]).
    */
  case class IvfPqIndex(encoded: DataFrame, centers: DataFrame,
      books: Array[Array[Array[Double]]])

  def ivfPqIndex(spark: SparkSession, dir: String): IvfPqIndex = {
    val ivf = ivfIndex(spark, dir)
    // residual per vector vs its assigned center
    val resid = ivf.assigned
      .join(broadcast(ivf.centers), col("cell") === col("center_cell"))
      .withColumn("r", zip_with(col("v"), col("center"), (a, b) => a - b))
    val books = fitPqCodebooks(resid.select(col("vec_id"), col("r").as("v"),
      col("norm")))
    // recon = center + dq(codes); its norm is stored, v is discarded
    val encoded = resid
      .select(col("vec_id"), col("cell"), col("center"),
        array(pqCodeCols(books, col("r")): _*).as("codes"))
      .withColumn("dq", pqReconstruct(books, col("codes")))
      .withColumn("recon", zip_with(col("center"), col("dq"), (a, b) => a + b))
      .withColumn("recon_norm", sqrt(Dedup.dot(col("recon"), col("recon"))))
      .select("vec_id", "cell", "codes", "recon_norm")
    IvfPqIndex(encoded, ivf.centers, books)
  }

  /** Persist / reload a fitted IVF-PQ index (encoded corpus + coarse
    * centroids + residual codebooks) — same build-once/serve-many
    * contract as [[saveIvfIndex]] and [[savePqIndex]]; loaded search
    * equals a fresh build (spec-asserted).
    */
  def saveIvfPqIndex(idx: IvfPqIndex, path: String): Unit = {
    idx.encoded.write.mode("overwrite").parquet(s"$path/encoded")
    idx.centers.write.mode("overwrite").parquet(s"$path/centers")
    saveBooks(idx.encoded.sparkSession, idx.books, s"$path/books")
    IndexManifest.write(idx.encoded.sparkSession, path, "ann_ivfpq",
      Seq("encoded", "centers", "books"))
  }

  def loadIvfPqIndex(spark: SparkSession, path: String): IvfPqIndex = {
    IndexManifest.validate(spark, path, "ann_ivfpq",
      Seq("encoded", "centers", "books")): Unit
    val encoded = spark.read.parquet(s"$path/encoded")
    require(encoded.columns.toSet == Set("vec_id", "cell", "codes", "recon_norm"),
      s"invalid IVF-PQ index at $path/encoded: ${encoded.columns.mkString(",")}")
    val centers = spark.read.parquet(s"$path/centers")
    require(centers.columns.toSet == Set("center_cell", "center"),
      s"invalid IVF-PQ centers at $path/centers: ${centers.columns.mkString(",")}")
    IvfPqIndex(encoded.select("vec_id", "cell", "codes", "recon_norm"),
      centers.select("center_cell", "center"), loadBooks(spark, s"$path/books"))
  }

  def annIvfPq(spark: SparkSession, dir: String, nProbe: Int = 4,
      rerank: Int = 32): DataFrame = {
    val corpus = vecs(spark, dir).toDF("vec_id", "v", "norm")
    annIvfPqSearch(ivfPqIndex(spark, dir), corpus, nProbe, rerank)
  }

  def annIvfPqSearch(idx: IvfPqIndex, corpus: DataFrame, nProbe: Int,
      rerank: Int): DataFrame = {
    // the ADC table is cell-independent: computed ONCE per probe,
    // before the cell fan-out duplicates the row nProbe times
    val probes = corpus.filter(col("vec_id") < NumProbes)
      .toDF("probe_id", "p_v", "p_norm")
      .withColumn("tab", pqTable(idx.books, col("p_v")))
    val probeCells = probes.crossJoin(broadcast(idx.centers))
      .withColumn("d2", Dedup.dot(col("center"), col("center"))
        - lit(2.0) * Dedup.dot(col("p_v"), col("center")))
      .withColumn("cell_rank", row_number().over(
        Window.partitionBy("probe_id").orderBy(col("d2"), col("center_cell"))))
      .filter(col("cell_rank") <= nProbe)
      .withColumn("p_dot_center", Dedup.dot(col("p_v"), col("center")))
      .select(col("probe_id"), col("p_v"), col("p_norm"),
        col("center_cell").as("cell"), col("p_dot_center"), col("tab"))
    val approx = idx.encoded.join(broadcast(probeCells), Seq("cell"))
      .filter(col("vec_id") =!= col("probe_id"))
      .withColumn("approx_cos",
        (col("p_dot_center") + pqAdcSum(col("tab"), col("codes")))
          / (col("recon_norm") * col("p_norm")))
    val wa = Window.partitionBy("probe_id").orderBy(col("approx_cos").desc, col("vec_id"))
    val cands = approx.withColumn("arank", row_number().over(wa))
      .filter(col("arank") <= rerank)
      .select("probe_id", "p_v", "p_norm", "vec_id")
    exactRerankTopK(cands, corpus)
  }

  // ------------------------------------------------------- graph ANN

  /** Graph-based ANN (NSW — the single-layer core of HNSW, Malkov &
    * Yashunin 2016) as the LOW-LATENCY serve path: per-PARTITION
    * navigable-small-world graphs + a global top-k merge.
    *
    *  - BUILD (mapPartitions, no shuffle past the initial hash
    *    partitioning): vectors insert in id order; each new node beam-
    *    searches the graph built so far (`efConstruction` beam) for its
    *    `maxDeg` nearest and links bidirectionally; adjacency lists
    *    prune back to `maxDeg` keeping the highest-cosine edges. A
    *    deployment persists each shard's adjacency next to its
    *    vectors and reuses it across probe batches.
    *  - SEARCH: probes broadcast; each shard beam-searches its own
    *    graph (`efSearch` beam, greedy best-first with a visited set,
    *    ties on id) and emits its local top-k; a window takes the
    *    global top-k per probe — the standard shard-and-merge layout,
    *    O(log n)-ish hops per shard instead of a shard scan.
    *
    * Cosines are computed EXACTLY during the walk (the graph only
    * decides which vectors get scored), so emitted values match the
    * brute-force kernel bit-for-bit; only the candidate set is
    * approximate. Recall vs beam width is swept by RecallProbe.
    */
  /** (vec_id, vector, norm) — a shard-local graph node. */
  private type NswNode = (Long, Array[Double], Double)

  private def nswCos(nodes: Array[NswNode], q: Array[Double], qn: Double,
      i: Int): Double = {
    val v = nodes(i)._2
    var s = 0.0
    var d = 0
    while (d < v.length) { s += q(d) * v(d); d += 1 }
    s / (qn * nodes(i)._3)
  }

  /** Greedy best-first beam over the first `built` nodes: expand the
    * best unexpanded candidate until the beam's worst member beats
    * every frontier node. Ties break on node index (deterministic).
    * `start` is the walk's seed (node 0 for the flat NSW graph; the
    * descent's hand-off for the layered HNSW walk).
    */
  private def nswBeam(nodes: Array[NswNode], adj: Int => Iterator[Int],
      q: Array[Double], qn: Double, ef: Int,
      built: Int, start: Int = 0): Array[(Double, Int)] = {
    val visited = new java.util.BitSet(built)
    // frontier: best cos first; results: worst cos first
    val frontier = scala.collection.mutable.PriorityQueue
      .empty[(Double, Int)](Ordering.by(t => (t._1, -t._2)))
    val results = scala.collection.mutable.PriorityQueue
      .empty[(Double, Int)](Ordering.by(t => (-t._1, t._2)))
    val c0 = nswCos(nodes, q, qn, start)
    visited.set(start)
    frontier.enqueue((c0, start))
    results.enqueue((c0, start))
    while (frontier.nonEmpty &&
        (results.size < ef || frontier.head._1 > results.head._1)) {
      val (_, node) = frontier.dequeue()
      adj(node).foreach { nb =>
        if (nb < built && !visited.get(nb)) {
          visited.set(nb)
          val c = nswCos(nodes, q, qn, nb)
          if (results.size < ef || c > results.head._1) {
            frontier.enqueue((c, nb))
            results.enqueue((c, nb))
            if (results.size > ef) results.dequeue(): Unit
          }
        }
      }
    }
    results.dequeueAll.toArray.sortBy(t => (-t._1, t._2))
  }

  /** NSW construction over id-sorted shard nodes: insert in order,
    * beam-search the graph built so far, link bidirectionally, prune
    * adjacency back to `maxDeg` keeping the highest-cosine edges.
    */
  private def nswBuild(nodes: Array[NswNode], maxDeg: Int,
      efConstruction: Int): Array[Array[Int]] =
    nswExtend(nodes,
      Array.fill(nodes.length)(scala.collection.mutable.ArrayBuffer.empty[Int]),
      1, maxDeg, efConstruction)

  /** Insert nodes `from` until the end into a graph whose first
    * `from` nodes already carry adjacency — the one insertion loop
    * behind both the fresh build (`from = 1`, empty adjacency) and
    * incremental appends ([[updateGraphIndex]]).
    */
  private def nswExtend(nodes: Array[NswNode],
      adj: Array[scala.collection.mutable.ArrayBuffer[Int]], from: Int,
      maxDeg: Int, efConstruction: Int): Array[Array[Int]] = {
    def prune(i: Int): Unit =
      if (adj(i).length > maxDeg) {
        val kept = adj(i)
          .map(j => (nswCos(nodes, nodes(i)._2, nodes(i)._3, j), j))
          .sortBy(t => (-t._1, t._2)).take(maxDeg).map(_._2)
        adj(i).clear()
        adj(i) ++= kept
      }
    var i = math.max(from, 1) // node 0 seeds the graph edge-free
    while (i < nodes.length) {
      nswBeam(nodes, adj(_).iterator, nodes(i)._2, nodes(i)._3,
        efConstruction, i)
        .take(maxDeg).foreach { case (_, j) =>
          adj(i) += j
          adj(j) += i
          prune(j)
        }
      i += 1
    }
    adj.map(_.toArray)
  }

  /** Probe vectors as a driver array (id asc) for the graph walks. */
  private def probeArray(corpus: DataFrame): Array[NswNode] =
    probeArrayOf(corpus.filter(col("vec_id") < NumProbes)
      .toDF("probe_id", "p_v", "p_norm"))

  /** Any explicit (probe_id, p_v, p_norm) batch as a driver array —
    * probe batches stay serve-request-sized, never corpus-sized.
    */
  private def probeArrayOf(probes: DataFrame): Array[NswNode] = {
    import probes.sparkSession.implicits._
    probes.toDF("probe_id", "p_v", "p_norm")
      .as[(Long, Seq[Double], Double)].collect()
      .sortBy(_._1).map { case (id, v, n) => (id, v.toArray, n) }
  }

  /** Per-shard (probe_id, neighbor_id, cos) candidates → global
    * top-k per probe in the query result shape.
    */
  private def mergeShardTopK(local: DataFrame): DataFrame = {
    val w = Window.partitionBy("probe_id").orderBy(col("cos").desc, col("neighbor_id"))
    local.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= TopK)
      .select(col("probe_id"), col("rank"), col("neighbor_id"),
        round(col("cos"), 6).as("cosine"))
  }

  def annGraph(spark: SparkSession, dir: String, efSearch: Int = 32,
      maxDeg: Int = 8, efConstruction: Int = 32, numShards: Int = 4): DataFrame =
    annGraphOf(vecs(spark, dir).toDF("vec_id", "v", "norm"),
      efSearch, maxDeg, efConstruction, numShards)

  /** Corpus-size ceiling for serving FLAT NSW (round 12): the single
    * layer navigates fine at small scale (recall@10 at efSearch=32:
    * 1.00 at N=500, 0.88 at N=2000) but its greedy entry degrades
    * with graph diameter — the 10×-replica sweep measured the
    * textbook NAVIGABILITY COLLAPSE at N=20k (0.26 at efSearch=16 vs
    * HNSW's 1.00 on the same corpus; the hierarchy exists precisely
    * to keep entry hops O(log N)). 4096 sits between the measured
    * healthy (2k) and collapsed (20k) regimes with ~2× margin.
    */
  private[graft] val NswServeCap = 4096L

  /** The graph-family SERVE path (registered as q_ann_graph): flat
    * NSW up to [[NswServeCap]] vectors, the layered [[annHnsw]]
    * hierarchy above it. Flat NSW stays available directly via
    * [[annGraph]] as the teaching/verify-scale baseline — it is never
    * the index a production corpus is served from, because its
    * single-layer recall collapses with graph diameter (see
    * [[NswServeCap]]). Both branches share the beam kernel, the exact
    * cosine rerank, and the result contract, so the routed surface is
    * drop-in either way; the route is decided by ONE corpus count
    * (parquet metadata — no data scan).
    */
  def annGraphAuto(spark: SparkSession, dir: String,
      efSearch: Int = 32): DataFrame =
    if (vecs(spark, dir).count() <= NswServeCap)
      annGraph(spark, dir, efSearch)
    else annHnsw(spark, dir, efSearch)

  private[graft] def annGraphOf(corpus: DataFrame, efSearch: Int = 32,
      maxDeg: Int = 8, efConstruction: Int = 32,
      numShards: Int = 4): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val bProbes = spark.sparkContext.broadcast(probeArray(corpus))
    val local = corpus.repartition(numShards, col("vec_id"))
      .as[(Long, Seq[Double], Double)]
      .mapPartitions { iter =>
        val nodes = iter.map { case (id, v, n) => (id, v.toArray, n) }
          .toArray.sortBy(_._1)
        if (nodes.isEmpty) Iterator.empty
        else {
          val adj = nswBuild(nodes, maxDeg, efConstruction)
          bProbes.value.iterator.flatMap { case (pid, pv, pn) =>
            nswBeam(nodes, adj(_).iterator, pv, pn, efSearch, nodes.length)
              .filter { case (_, j) => nodes(j)._1 != pid }
              .take(TopK)
              .map { case (c, j) => (pid, nodes(j)._1, c) }
          }
        }
      }.toDF("probe_id", "neighbor_id", "cos")
    mergeShardTopK(local)
  }

  /** A fitted per-shard NSW graph: one row per vector carrying its
    * shard id, float vector, norm, and neighbor VEC ids. Build once,
    * serve many probe batches; persistable like the quantized indexes.
    * Graphs are identical to the fused [[annGraph]] build (same hash
    * sharding, same id-ordered insertion), so searches agree exactly
    * (spec-asserted). `numShards` is carried IN the index (not
    * re-derived as max(shard)+1, which NPEs on an empty standing
    * index and undercounts when the top-numbered shard happens to be
    * empty — an undercount silently changes append hash routing, so a
    * re-delivered vec_id could land in a different shard and bypass
    * the per-shard duplicate-id check).
    */
  case class GraphIndex(nodes: DataFrame, numShards: Int)

  def graphIndex(spark: SparkSession, dir: String, maxDeg: Int = 8,
      efConstruction: Int = 32, numShards: Int = 4): GraphIndex =
    graphIndexOf(vecs(spark, dir).toDF("vec_id", "v", "norm"),
      maxDeg, efConstruction, numShards)

  private[graft] def graphIndexOf(corpus: DataFrame, maxDeg: Int = 8,
      efConstruction: Int = 32, numShards: Int = 4): GraphIndex = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val nodesDf = corpus.repartition(numShards, col("vec_id"))
      .as[(Long, Seq[Double], Double)]
      .mapPartitions { iter =>
        val shard = org.apache.spark.TaskContext.getPartitionId()
        val nodes = iter.map { case (id, v, n) => (id, v.toArray, n) }
          .toArray.sortBy(_._1)
        if (nodes.isEmpty) Iterator.empty
        else {
          val adj = nswBuild(nodes, maxDeg, efConstruction)
          nodes.indices.iterator.map { i =>
            (shard, nodes(i)._1, nodes(i)._2.toSeq, nodes(i)._3,
              adj(i).map(j => nodes(j)._1).toSeq)
          }
        }
      }.toDF("shard", "vec_id", "v", "norm", "nbrs")
    GraphIndex(nodesDf, numShards)
  }

  /** Serve a probe batch from a fitted graph: shards regroup (one
    * shuffle of the index, none of any corpus), rebuild their local
    * id maps, and beam-search; the shard top-ks merge globally.
    * Probes here ARE corpus rows (the eval surface), so self-matches
    * are excluded.
    */
  def annGraphSearch(idx: GraphIndex, corpus: DataFrame,
      efSearch: Int = 32): DataFrame =
    annGraphSearchProbes(idx,
      corpus.filter(col("vec_id") < NumProbes).toDF("probe_id", "p_v", "p_norm"),
      efSearch, excludeSelf = true)

  /** Graph search against an EXPLICIT probe batch — the serve-path
    * entry (see [[annPqSearchProbes]] for the excludeSelf contract:
    * external probe ids live in their own space and never filter the
    * corpus).
    */
  def annGraphSearchProbes(idx: GraphIndex, probes: DataFrame,
      efSearch: Int = 32, excludeSelf: Boolean = false): DataFrame = {
    val spark = idx.nodes.sparkSession
    import spark.implicits._
    val bProbes = spark.sparkContext.broadcast(probeArrayOf(probes))
    val local = idx.nodes.as[(Int, Long, Seq[Double], Double, Seq[Long])]
      .groupByKey(_._1)
      .flatMapGroups { (_, rows) =>
        val rs = rows.toArray.sortBy(_._2)
        val nodes: Array[NswNode] = rs.map(r => (r._2, r._3.toArray, r._4))
        val idToIdx = nodes.iterator.map(_._1).zipWithIndex.toMap
        val adj = rs.map(_._5.iterator.map(idToIdx).toArray)
        bProbes.value.iterator.flatMap { case (pid, pv, pn) =>
          nswBeam(nodes, adj(_).iterator, pv, pn, efSearch, nodes.length)
            .filter { case (_, j) => !excludeSelf || nodes(j)._1 != pid }
            .take(TopK)
            .map { case (c, j) => (pid, nodes(j)._1, c) }
        }
      }.toDF("probe_id", "neighbor_id", "cos")
    mergeShardTopK(local)
  }

  /** INCREMENTAL graph maintenance — append an ingest batch to a
    * fitted [[GraphIndex]] without rebuilding: new vectors hash to
    * their shard with the SAME partitioner as the build (so routing
    * matches a from-scratch shard layout), and each shard inserts its
    * arrivals into the EXISTING graph via the same id-ordered
    * insertion loop the build uses — existing adjacency is untouched
    * except where pruning rewires a neighbor toward a closer new
    * node. INSERTION work is O(batch · ef · deg) per shard and the
    * standing corpus is never re-LINKED — but as an immutable-
    * DataFrame index the append still rewrites the index rows (one
    * shuffle of index + batch; amortize by micro-batching appends,
    * and persist/save the result before serving repeatedly — the
    * returned frame is lazy). A mutable shard store (e.g. RocksDB
    * per executor) would make the rewrite in-place. (Unlike the IVF
    * path there is no model to drift: the graph IS the data
    * structure, so appends never force a refit.)
    *
    * Shard count comes from the index itself (see [[GraphIndex]]) —
    * routing stays identical to the build's partitioner even on an
    * empty or unevenly-occupied standing index.
    */
  def updateGraphIndex(idx: GraphIndex, newVecs: DataFrame,
      maxDeg: Int = 8, efConstruction: Int = 32): GraphIndex = {
    val spark = idx.nodes.sparkSession
    import spark.implicits._
    val numShards = idx.numShards
    val batch = newVecs
      .select(col("vec_id"), col("v").cast("array<double>").as("v"))
      .withColumn("norm", sqrt(Dedup.dot(col("v"), col("v"))))
      .repartition(numShards, col("vec_id"))
      .as[(Long, Seq[Double], Double)]
      .mapPartitions { iter =>
        val shard = org.apache.spark.TaskContext.getPartitionId()
        iter.map { case (id, v, n) =>
          (shard, id, v, n, null: Seq[Long])
        }
      }.toDF("shard", "vec_id", "v", "norm", "nbrs")
    val merged = idx.nodes.unionByName(batch)
      .as[(Int, Long, Seq[Double], Double, Seq[Long])]
      .groupByKey(_._1)
      .flatMapGroups { (shard, rows) =>
        val (oldRows, newRows) = rows.toArray.partition(_._5 != null)
        val olds = oldRows.sortBy(_._2)
        val news = newRows.sortBy(_._2)
        val nodes: Array[NswNode] =
          (olds ++ news).map(r => (r._2, r._3.toArray, r._4))
        if (nodes.isEmpty) Iterator.empty
        else {
          val idToIdx = nodes.iterator.map(_._1).zipWithIndex.toMap
          // a re-delivered id would silently rewire in-links to the
          // newest copy and strand the old node — fail loudly instead
          // (duplicates always land in the same shard: same hash)
          require(idToIdx.size == nodes.length,
            s"duplicate vec_ids appended into shard $shard")
          val adj = Array.fill(nodes.length)(
            scala.collection.mutable.ArrayBuffer.empty[Int])
          olds.zipWithIndex.foreach { case (r, i) =>
            adj(i) ++= r._5.iterator.map(idToIdx)
          }
          val full = nswExtend(nodes, adj, olds.length, maxDeg, efConstruction)
          nodes.indices.iterator.map { i =>
            (shard, nodes(i)._1, nodes(i)._2.toSeq, nodes(i)._3,
              full(i).map(j => nodes(j)._1).toSeq)
          }
        }
      }.toDF("shard", "vec_id", "v", "norm", "nbrs")
    GraphIndex(merged, numShards)
  }

  /** Persist / reload a fitted NSW graph index; loaded search == fresh
    * (spec-asserted). The shard count rides in a tiny sidecar file
    * next to the parquet (written AFTER the overwrite so the mode
    * doesn't delete it); pre-sidecar saves fall back to the old
    * max(shard)+1 derivation, which is only wrong in the
    * empty-top-shard corner the sidecar now closes.
    */
  def saveGraphIndex(idx: GraphIndex, path: String): Unit = {
    idx.nodes.write.mode("overwrite").parquet(path)
    writeShardMeta(idx.nodes.sparkSession, path, idx.numShards)
    IndexManifest.write(idx.nodes.sparkSession, path, "ann_nsw", Seq("."),
      Map("num_shards" -> idx.numShards.toString))
  }

  def loadGraphIndex(spark: SparkSession, path: String): GraphIndex = {
    IndexManifest.validate(spark, path, "ann_nsw", Seq(".")): Unit
    val nodes = spark.read.parquet(path)
    require(nodes.columns.toSet == Set("shard", "vec_id", "v", "norm", "nbrs"),
      s"invalid graph index at $path: ${nodes.columns.mkString(",")}")
    val ns = readShardMeta(spark, path).getOrElse(
      nodes.agg(coalesce(max("shard") + 1, lit(1))).head.getInt(0))
    GraphIndex(nodes.select("shard", "vec_id", "v", "norm", "nbrs"), ns)
  }

  /** Shared WRITE leg of the two segmented-tier artifacts: all open
    * segments flatten into ONE `seg_id`-tagged parquet (they are
    * single-shard by construction — callers assert it), so an
    * overwrite with a different segment count can never orphan a
    * stale per-segment directory. One definition so the HNSW and
    * flat-NSW duals cannot drift.
    */
  private def writeSegmentsPart(segNodes: List[DataFrame],
      emptyLike: DataFrame, path: String): Unit =
    segNodes.zipWithIndex
      .map { case (n, i) => n.withColumn("seg_id", lit(i)) }
      .reduceOption(_ unionByName _)
      .getOrElse(emptyLike.filter(lit(false)).withColumn("seg_id", lit(0)))
      .write.mode("overwrite").parquet(s"$path/segments")

  /** Shared READ leg: validate the family manifest, split the flat
    * segments part back into per-segment node frames (callers wrap
    * them in their index type).
    */
  private def readSegmentsPart(spark: SparkSession, path: String,
      family: String, cols: Seq[String]): List[DataFrame] = {
    val params = IndexManifest
      .validate(spark, path, family, Seq("main", "segments"))
      .getOrElse(throw new IllegalArgumentException(
        s"no segmented-index manifest at $path"))
    val segNodes = spark.read.parquet(s"$path/segments")
    (0 until params("num_segments").toInt).toList.map { i =>
      segNodes.filter(col("seg_id") === i).drop("seg_id")
        .select(cols.map(col): _*)
    }
  }

  /** [[saveHnswSegmented]]'s flat-NSW dual — same two-part layout,
    * same single-shard segment contract, own family name so the two
    * segmented tiers cannot load each other's artifacts.
    */
  def saveNswSegmented(seg: NswSegmented, path: String): Unit = {
    require(seg.segments.forall(_.numShards == 1),
      "segment tier persists single-shard segments only (appendSegment builds them)")
    saveGraphIndex(seg.main, s"$path/main")
    writeSegmentsPart(seg.segments.map(_.nodes), seg.main.nodes, path)
    IndexManifest.write(seg.main.nodes.sparkSession, path,
      "ann_nsw_segmented", Seq("main", "segments"),
      Map("num_segments" -> seg.segments.length.toString))
  }

  def loadNswSegmented(spark: SparkSession, path: String): NswSegmented = {
    // the OUTER family manifest validates first — a cross-family load
    // must fail naming the segmented families, not deep inside the
    // nested main artifact
    val segs = readSegmentsPart(spark, path, "ann_nsw_segmented",
      Seq("shard", "vec_id", "v", "norm", "nbrs")).map(GraphIndex(_, 1))
    NswSegmented(loadGraphIndex(spark, s"$path/main"), segs)
  }

  private[graft] def writeShardMeta(spark: SparkSession, path: String,
      numShards: Int): Unit = {
    val p = new org.apache.hadoop.fs.Path(path, "_graft_shards")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    try out.write(numShards.toString.getBytes("UTF-8")) finally out.close()
  }

  private[graft] def readShardMeta(spark: SparkSession,
      path: String): Option[Int] = {
    val p = new org.apache.hadoop.fs.Path(path, "_graft_shards")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      try Some(scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim.toInt)
      finally in.close()
    }
  }

  // ------------------------------------------------------ HNSW layers

  /** HIERARCHICAL NSW (the full Malkov & Yashunin 2016 layout): the
    * flat per-shard NSW graph above gains a layer hierarchy — node i
    * appears in layers 0..level(i), where level is geometric with
    * ratio 1/maxDeg, so layer L+1 holds ~1/maxDeg of layer L. A
    * search GREEDY-DESCENDS from the top layer's entry point (one
    * closest-neighbor hop per layer, ef=1) and only runs the wide
    * `efSearch` beam on layer 0, entering it next to the answer
    * instead of at an arbitrary seed — the upper layers are the
    * express lanes that make per-shard entry O(log n) hops even when
    * the shard no longer fits the beam's locality, which is what the
    * flat NSW walk loses at 100 TB shard sizes.
    *
    * Everything the flat graph pins still holds here: cosines are
    * computed exactly during the walk (bit-equal to the brute-force
    * kernel on whatever the walk scores), ties break on node index,
    * and the build is deterministic — levels derive from a splitmix64
    * hash of the VECTOR id (not a driver RNG), so the same corpus
    * always builds the same hierarchy on any cluster layout, and an
    * appended batch assigns the same levels it would have been built
    * with. Layer-0 degree is 2·maxDeg (the standard M0 = 2M), upper
    * layers maxDeg. Links are chosen by the [[selectNeighbors]]
    * diversity heuristic (alg. 4) by default — on clustered corpora
    * closest-k wires each node into its own cluster only, while the
    * heuristic keeps the bridges (RecallProbe ablates both).
    */
  private def hnswLevel(id: Long, maxDeg: Int): Int = {
    var h = id * 0x9E3779B97F4A7C15L
    h ^= (h >>> 30); h *= 0xBF58476D1CE4E5B9L
    h ^= (h >>> 27); h *= 0x94D049BB133111EBL
    h ^= (h >>> 31)
    val u = ((h >>> 11) + 1).toDouble / (1L << 53).toDouble // (0, 1]
    val mL = 1.0 / math.log(math.max(maxDeg, 2).toDouble)
    math.min(12, (-math.log(u) * mL).toInt)
  }

  /** One greedy ef=1 hop sequence at `layer`: move to the strictly
    * best neighbor until local maximum (strict improvement only, so
    * termination is guaranteed and the path deterministic).
    */
  private def hnswGreedy(nodes: Array[NswNode],
      adj: Array[Array[scala.collection.mutable.ArrayBuffer[Int]]],
      layer: Int, start: Int, q: Array[Double], qn: Double,
      built: Int): Int = {
    var cur = start
    var curCos = nswCos(nodes, q, qn, cur)
    var improved = true
    while (improved) {
      improved = false
      adj(cur)(layer).foreach { nb =>
        if (nb < built) {
          val c = nswCos(nodes, q, qn, nb)
          if (c > curCos) { cur = nb; curCos = c; improved = true }
        }
      }
    }
    cur
  }

  /** Select-neighbors HEURISTIC (Malkov & Yashunin alg. 4): scan
    * candidates best-first and keep one only if it is closer to the
    * query node than to every neighbor already kept. Closest-k links
    * a clustered node entirely inside its own cluster; the diversity
    * test prunes that redundancy and preserves the BRIDGE edges
    * navigability depends on — the difference shows exactly on
    * clustered corpora (RecallProbe sweeps both selectors there).
    * Deterministic: candidates arrive sorted by (-cos, idx) and the
    * scan order decides ties.
    */
  private def selectNeighbors(nodes: Array[NswNode],
      cands: Array[(Double, Int)], deg: Int): Seq[Int] = {
    val kept = scala.collection.mutable.ArrayBuffer.empty[Int]
    var i = 0
    while (i < cands.length && kept.length < deg) {
      val (cq, c) = cands(i)
      val dominated = kept.exists(r =>
        nswCos(nodes, nodes(c)._2, nodes(c)._3, r) > cq)
      if (!dominated) kept += c
      i += 1
    }
    kept.toSeq
  }

  /** Insert nodes `from` until the end into a layered graph whose
    * first `from` nodes already carry adjacency — the HNSW analogue
    * of [[nswExtend]], shared by fresh builds (`from = 1`) and
    * incremental appends. `adj(i)(l)` is node i's layer-l neighbor
    * list (length level(i)+1). Returns the final entry node.
    * `heuristic` picks the link selector: alg. 4 diversity pruning
    * (default) or plain closest-k (the flat graph's rule).
    */
  private def hnswExtend(nodes: Array[NswNode], levels: Array[Int],
      adj: Array[Array[scala.collection.mutable.ArrayBuffer[Int]]],
      from: Int, maxDeg: Int, efConstruction: Int,
      heuristic: Boolean = true): Int = {
    def layerAdj(l: Int)(j: Int): Iterator[Int] =
      if (l <= levels(j)) adj(j)(l).iterator else Iterator.empty
    def select(cands: Array[(Double, Int)], deg: Int): Seq[Int] =
      if (heuristic) selectNeighbors(nodes, cands, deg)
      else cands.take(deg).map(_._2).toSeq
    def prune(j: Int, l: Int, deg: Int): Unit =
      if (adj(j)(l).length > deg) {
        val cands = adj(j)(l)
          .map(k => (nswCos(nodes, nodes(j)._2, nodes(j)._3, k), k))
          .sortBy(t => (-t._1, t._2)).toArray
        val kept = select(cands, deg)
        adj(j)(l).clear()
        adj(j)(l) ++= kept
      }
    // entry among the first `from` nodes: first (insertion-order) node
    // of maximal level — exactly what the build below maintains
    var entry = 0
    var e = 1
    while (e < from) { if (levels(e) > levels(entry)) entry = e; e += 1 }
    var i = math.max(from, 1) // node 0 seeds the hierarchy edge-free
    while (i < nodes.length) {
      val (q, qn) = (nodes(i)._2, nodes(i)._3)
      var ep = entry
      var l = levels(entry)
      while (l > levels(i)) { // express descent above the new node
        ep = hnswGreedy(nodes, adj, l, ep, q, qn, i)
        l -= 1
      }
      while (l >= 0) { // link layers the new node participates in
        val found = nswBeam(nodes, layerAdj(l), q, qn, efConstruction, i, ep)
        val deg = if (l == 0) maxDeg * 2 else maxDeg
        select(found, deg).foreach { j =>
          adj(i)(l) += j
          adj(j)(l) += i
          prune(j, l, deg)
        }
        ep = found.head._2
        l -= 1
      }
      if (levels(i) > levels(entry)) entry = i
      i += 1
    }
    entry
  }

  private def hnswBuild(nodes: Array[NswNode], maxDeg: Int,
      efConstruction: Int, heuristic: Boolean = true): (Array[Int],
      Array[Array[scala.collection.mutable.ArrayBuffer[Int]]], Int) = {
    val levels = Array.tabulate(nodes.length)(i => hnswLevel(nodes(i)._1, maxDeg))
    val adj = Array.tabulate(nodes.length)(i =>
      Array.fill(levels(i) + 1)(scala.collection.mutable.ArrayBuffer.empty[Int]))
    val entry = hnswExtend(nodes, levels, adj, 1, maxDeg, efConstruction, heuristic)
    (levels, adj, entry)
  }

  /** Full layered search on one shard: descend layers top..1 with
    * ef=1 greedy hops, then the usual `efSearch` beam on layer 0
    * seeded at the descent's hand-off.
    */
  private def hnswSearchLocal(nodes: Array[NswNode], levels: Array[Int],
      adj: Array[Array[scala.collection.mutable.ArrayBuffer[Int]]],
      entry: Int, q: Array[Double], qn: Double,
      ef: Int): Array[(Double, Int)] = {
    var ep = entry
    var l = levels(entry)
    while (l > 0) { ep = hnswGreedy(nodes, adj, l, ep, q, qn, nodes.length); l -= 1 }
    nswBeam(nodes, adj(_)(0).iterator, q, qn, ef, nodes.length, ep)
  }

  def annHnsw(spark: SparkSession, dir: String, efSearch: Int = 32,
      maxDeg: Int = 8, efConstruction: Int = 32, numShards: Int = 4): DataFrame =
    annHnswOf(vecs(spark, dir).toDF("vec_id", "v", "norm"),
      efSearch, maxDeg, efConstruction, numShards)

  private[graft] def annHnswOf(corpus: DataFrame, efSearch: Int = 32,
      maxDeg: Int = 8, efConstruction: Int = 32,
      numShards: Int = 4): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val bProbes = spark.sparkContext.broadcast(probeArray(corpus))
    val local = corpus.repartition(numShards, col("vec_id"))
      .as[(Long, Seq[Double], Double)]
      .mapPartitions { iter =>
        val nodes = iter.map { case (id, v, n) => (id, v.toArray, n) }
          .toArray.sortBy(_._1)
        if (nodes.isEmpty) Iterator.empty
        else {
          val (levels, adj, entry) = hnswBuild(nodes, maxDeg, efConstruction)
          bProbes.value.iterator.flatMap { case (pid, pv, pn) =>
            hnswSearchLocal(nodes, levels, adj, entry, pv, pn, efSearch)
              .filter { case (_, j) => nodes(j)._1 != pid }
              .take(TopK)
              .map { case (c, j) => (pid, nodes(j)._1, c) }
          }
        }
      }.toDF("probe_id", "neighbor_id", "cos")
    mergeShardTopK(local)
  }

  /** A fitted per-shard HNSW hierarchy: one row per vector carrying
    * its layered neighbor lists (`lnbrs(l)` = layer-l neighbor VEC
    * ids; `lnbrs.size - 1` IS the node's level, so the hierarchy
    * round-trips through parquet with no extra column). The entry
    * point is derived, not stored: the lowest-id node of maximal
    * level — the same node the id-ordered build promotes last.
    * `numShards` is carried in the index for the same append-routing
    * reason as [[GraphIndex]].
    */
  case class HnswIndex(nodes: DataFrame, numShards: Int)

  def hnswIndex(spark: SparkSession, dir: String, maxDeg: Int = 8,
      efConstruction: Int = 32, numShards: Int = 4): HnswIndex =
    hnswIndexOf(vecs(spark, dir).toDF("vec_id", "v", "norm"),
      maxDeg, efConstruction, numShards)

  private[graft] def hnswIndexOf(corpus: DataFrame, maxDeg: Int = 8,
      efConstruction: Int = 32, numShards: Int = 4,
      heuristic: Boolean = true): HnswIndex = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val nodesDf = corpus.repartition(numShards, col("vec_id"))
      .as[(Long, Seq[Double], Double)]
      .mapPartitions { iter =>
        val shard = org.apache.spark.TaskContext.getPartitionId()
        val nodes = iter.map { case (id, v, n) => (id, v.toArray, n) }
          .toArray.sortBy(_._1)
        if (nodes.isEmpty) Iterator.empty
        else {
          val (_, adj, _) = hnswBuild(nodes, maxDeg, efConstruction, heuristic)
          nodes.indices.iterator.map { i =>
            (shard, nodes(i)._1, nodes(i)._2.toSeq, nodes(i)._3,
              adj(i).map(_.map(j => nodes(j)._1).toSeq).toSeq)
          }
        }
      }.toDF("shard", "vec_id", "v", "norm", "lnbrs")
    HnswIndex(nodesDf, numShards)
  }

  def annHnswSearch(idx: HnswIndex, corpus: DataFrame,
      efSearch: Int = 32): DataFrame =
    annHnswSearchProbes(idx,
      corpus.filter(col("vec_id") < NumProbes).toDF("probe_id", "p_v", "p_norm"),
      efSearch, excludeSelf = true)

  /** Layered search against an explicit probe batch (same serve-path
    * contract as [[annGraphSearchProbes]]).
    */
  def annHnswSearchProbes(idx: HnswIndex, probes: DataFrame,
      efSearch: Int = 32, excludeSelf: Boolean = false): DataFrame = {
    val spark = idx.nodes.sparkSession
    import spark.implicits._
    val bProbes = spark.sparkContext.broadcast(probeArrayOf(probes))
    val local = idx.nodes.as[(Int, Long, Seq[Double], Double, Seq[Seq[Long]])]
      .groupByKey(_._1)
      .flatMapGroups { (_, rows) =>
        val rs = rows.toArray.sortBy(_._2)
        val nodes: Array[NswNode] = rs.map(r => (r._2, r._3.toArray, r._4))
        val idToIdx = nodes.iterator.map(_._1).zipWithIndex.toMap
        val levels = rs.map(_._5.length - 1)
        val adj = rs.map(_._5.map(layer =>
          layer.iterator.map(idToIdx)
            .to(scala.collection.mutable.ArrayBuffer)).toArray)
        val maxLevel = levels.max
        val entry = levels.indexOf(maxLevel)
        bProbes.value.iterator.flatMap { case (pid, pv, pn) =>
          hnswSearchLocal(nodes, levels, adj, entry, pv, pn, efSearch)
            .filter { case (_, j) => !excludeSelf || nodes(j)._1 != pid }
            .take(TopK)
            .map { case (c, j) => (pid, nodes(j)._1, c) }
        }
      }.toDF("probe_id", "neighbor_id", "cos")
    mergeShardTopK(local)
  }

  /** Incremental HNSW maintenance — same contract as
    * [[updateGraphIndex]] (hash-routed batch, per-shard id-ordered
    * insertion into the standing hierarchy, duplicate ids fail
    * loudly); levels for the arrivals come from the same id hash the
    * build uses, so an appended node lands on exactly the layers a
    * from-scratch build would give it.
    */
  def updateHnswIndex(idx: HnswIndex, newVecs: DataFrame,
      maxDeg: Int = 8, efConstruction: Int = 32): HnswIndex = {
    val spark = idx.nodes.sparkSession
    import spark.implicits._
    val numShards = idx.numShards
    val batch = newVecs
      .select(col("vec_id"), col("v").cast("array<double>").as("v"))
      .withColumn("norm", sqrt(Dedup.dot(col("v"), col("v"))))
      .repartition(numShards, col("vec_id"))
      .as[(Long, Seq[Double], Double)]
      .mapPartitions { iter =>
        val shard = org.apache.spark.TaskContext.getPartitionId()
        iter.map { case (id, v, n) =>
          (shard, id, v, n, null: Seq[Seq[Long]])
        }
      }.toDF("shard", "vec_id", "v", "norm", "lnbrs")
    val merged = idx.nodes.unionByName(batch)
      .as[(Int, Long, Seq[Double], Double, Seq[Seq[Long]])]
      .groupByKey(_._1)
      .flatMapGroups { (shard, rows) =>
        val (oldRows, newRows) = rows.toArray.partition(_._5 != null)
        val olds = oldRows.sortBy(_._2)
        val news = newRows.sortBy(_._2)
        val nodes: Array[NswNode] =
          (olds ++ news).map(r => (r._2, r._3.toArray, r._4))
        if (nodes.isEmpty) Iterator.empty
        else {
          val idToIdx = nodes.iterator.map(_._1).zipWithIndex.toMap
          require(idToIdx.size == nodes.length,
            s"duplicate vec_ids appended into shard $shard")
          val levels = olds.map(_._5.length - 1) ++
            news.map(r => hnswLevel(r._2, maxDeg))
          val adj = Array.tabulate(nodes.length) { i =>
            if (i < olds.length)
              olds(i)._5.map(layer => layer.iterator.map(idToIdx)
                .to(scala.collection.mutable.ArrayBuffer)).toArray
            else Array.fill(levels(i) + 1)(
              scala.collection.mutable.ArrayBuffer.empty[Int])
          }
          hnswExtend(nodes, levels, adj, olds.length, maxDeg, efConstruction)
          nodes.indices.iterator.map { i =>
            (shard, nodes(i)._1, nodes(i)._2.toSeq, nodes(i)._3,
              adj(i).map(_.map(j => nodes(j)._1).toSeq).toSeq)
          }
        }
      }.toDF("shard", "vec_id", "v", "norm", "lnbrs")
    HnswIndex(merged, numShards)
  }

  /** A SEGMENTED HNSW deployment — the micro-append economics
    * [[updateHnswIndex]] cannot give: as an immutable-DataFrame index
    * every direct append REWRITES the whole standing index (one
    * shuffle of index + batch), so a stream of small batches pays
    * O(index) per batch. The segment tier is the standard LSM-style
    * answer: each ingest batch becomes its own small single-shard
    * hierarchy (build cost O(batch·log batch), the standing `main` is
    * NOT touched), serve searches main + every open segment and
    * re-ranks the union, and a periodic [[compactHnswSegments]] folds
    * all segments into main with ONE rewrite — amortizing the
    * O(index) cost over however many batches accumulated between
    * compactions. Search cost grows with the open-segment count
    * (each segment adds a beam descent per probe), which is the knob:
    * compact when segments × per-segment latency outweighs one
    * rewrite.
    */
  case class HnswSegmented(main: HnswIndex, segments: List[HnswIndex])

  /** Open a new segment for an ingest batch: a fresh single-shard
    * hierarchy over just the batch. `main` and existing segments are
    * untouched (reference-equal — spec-asserted); duplicate ids
    * across main/segments surface at compaction, exactly like a
    * direct append would fail.
    */
  def hnswAppendSegment(seg: HnswSegmented, newVecs: DataFrame,
      maxDeg: Int = 8, efConstruction: Int = 32): HnswSegmented = {
    val prepared = newVecs
      .select(col("vec_id"), col("v").cast("array<double>").as("v"))
      .withColumn("norm", sqrt(Dedup.dot(col("v"), col("v"))))
    seg.copy(segments = seg.segments :+
      hnswIndexOf(prepared, maxDeg, efConstruction, numShards = 1))
  }

  /** Serve across main + open segments: each index answers the probe
    * batch independently (same per-shard layered descent as
    * [[annHnswSearchProbes]]) and the union re-ranks to one global
    * top-k per probe — identical surface to the un-segmented search.
    */
  def annHnswSearchSegmented(seg: HnswSegmented, probes: DataFrame,
      efSearch: Int = 32, excludeSelf: Boolean = false): DataFrame =
    mergeSegmentedTopK((seg.main :: seg.segments)
      .map(ix => annHnswSearchProbes(ix, probes, efSearch, excludeSelf)))

  /** Re-rank per-index top-ks (main + open segments) into one global
    * top-k per probe — shared by the HNSW and flat-NSW segment tiers.
    */
  private def mergeSegmentedTopK(per: Seq[DataFrame]): DataFrame = {
    val w = Window.partitionBy("probe_id")
      .orderBy(col("cosine").desc, col("neighbor_id"))
    per.map(_.select("probe_id", "neighbor_id", "cosine"))
      .reduce(_ unionByName _)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= TopK)
      .select("probe_id", "rank", "neighbor_id", "cosine")
  }

  /** Segment tier for the FLAT graph — the same micro-append
    * economics as [[HnswSegmented]] (segments never rewrite main,
    * merged serve, one-rewrite compaction) for deployments running
    * single-layer NSW.
    */
  case class NswSegmented(main: GraphIndex, segments: List[GraphIndex])

  def nswAppendSegment(seg: NswSegmented, newVecs: DataFrame,
      maxDeg: Int = 8, efConstruction: Int = 32): NswSegmented = {
    val prepared = newVecs
      .select(col("vec_id"), col("v").cast("array<double>").as("v"))
      .withColumn("norm", sqrt(Dedup.dot(col("v"), col("v"))))
    seg.copy(segments = seg.segments :+
      graphIndexOf(prepared, maxDeg, efConstruction, numShards = 1))
  }

  def annGraphSearchSegmented(seg: NswSegmented, probes: DataFrame,
      efSearch: Int = 32, excludeSelf: Boolean = false): DataFrame =
    mergeSegmentedTopK((seg.main :: seg.segments)
      .map(ix => annGraphSearchProbes(ix, probes, efSearch, excludeSelf)))

  def compactNswSegments(seg: NswSegmented, maxDeg: Int = 8,
      efConstruction: Int = 32): NswSegmented =
    if (seg.segments.isEmpty) seg
    else NswSegmented(
      updateGraphIndex(seg.main,
        seg.segments.map(_.nodes.select("vec_id", "v"))
          .reduce(_ unionByName _),
        maxDeg, efConstruction),
      Nil)

  /** Fold every open segment into `main` with ONE index rewrite (the
    * same id-ordered insertion a direct [[updateHnswIndex]] of the
    * concatenated batches would run, so the compacted index is
    * bit-identical to having appended them directly — spec-asserted);
    * segment order cannot matter because insertion is id-ordered.
    */
  def compactHnswSegments(seg: HnswSegmented, maxDeg: Int = 8,
      efConstruction: Int = 32): HnswSegmented =
    if (seg.segments.isEmpty) seg
    else HnswSegmented(
      updateHnswIndex(seg.main,
        seg.segments.map(_.nodes.select("vec_id", "v")).reduce(_ unionByName _),
        maxDeg, efConstruction),
      Nil)

  def saveHnswIndex(idx: HnswIndex, path: String): Unit = {
    idx.nodes.write.mode("overwrite").parquet(path)
    writeShardMeta(idx.nodes.sparkSession, path, idx.numShards)
    IndexManifest.write(idx.nodes.sparkSession, path, "ann_hnsw", Seq("."),
      Map("num_shards" -> idx.numShards.toString))
  }

  /** Persist a SEGMENTED deployment (main + open segments) under the
    * unified manifest — the durability leg of the LSM tier: without
    * it a restart either loses the open segments or must compact
    * them into main first, paying exactly the O(index) rewrite the
    * segment tier exists to amortize. Layout is two fixed parts —
    * `main` (a nested [[saveHnswIndex]] artifact, its own manifest
    * riding inside) and `segments`, ALL open segments as one parquet
    * tagged by `seg_id` — so overwriting an older save with a
    * different segment count can never leave a stale segment
    * directory behind. Segments are single-shard by construction
    * ([[hnswAppendSegment]] builds them that way; asserted at save),
    * so flattening them into one table loses nothing.
    */
  def saveHnswSegmented(seg: HnswSegmented, path: String): Unit = {
    require(seg.segments.forall(_.numShards == 1),
      "segment tier persists single-shard segments only (appendSegment builds them)")
    saveHnswIndex(seg.main, s"$path/main")
    writeSegmentsPart(seg.segments.map(_.nodes), seg.main.nodes, path)
    IndexManifest.write(seg.main.nodes.sparkSession, path,
      "ann_hnsw_segmented", Seq("main", "segments"),
      Map("num_segments" -> seg.segments.length.toString))
  }

  def loadHnswSegmented(spark: SparkSession, path: String): HnswSegmented = {
    // outer family manifest first — see [[loadNswSegmented]]
    val segs = readSegmentsPart(spark, path, "ann_hnsw_segmented",
      Seq("shard", "vec_id", "v", "norm", "lnbrs")).map(HnswIndex(_, 1))
    HnswSegmented(loadHnswIndex(spark, s"$path/main"), segs)
  }

  def loadHnswIndex(spark: SparkSession, path: String): HnswIndex = {
    IndexManifest.validate(spark, path, "ann_hnsw", Seq(".")): Unit
    val nodes = spark.read.parquet(path)
    require(nodes.columns.toSet == Set("shard", "vec_id", "v", "norm", "lnbrs"),
      s"invalid hnsw index at $path: ${nodes.columns.mkString(",")}")
    val ns = readShardMeta(spark, path).getOrElse(
      nodes.agg(coalesce(max("shard") + 1, lit(1))).head.getInt(0))
    HnswIndex(nodes.select("shard", "vec_id", "v", "norm", "lnbrs"), ns)
  }

  /** LSH-bucketed approximate top-k at the production (scale-safe)
    * default: `numTables` independent 16-plane signatures → 65 536
    * buckets per table; each probe expands to its hamming ≤ 2 code
    * set (137 codes per table ≈ 0.2% of the bucket space) and
    * equi-joins the corpus on (table, code) — a true bucket LOOKUP
    * (broadcast hash join on the key), not a scan: corpus rows
    * outside the probed buckets are rejected at the hash table, so
    * cost is O(corpus ∩ probed buckets), independent of probe-batch
    * size. Probe side stays (probes × tables × 137) rows —
    * broadcastable for 10k+ probe batches. Candidates found in more
    * than one table are deduped by (probe_id, vec_id) before ranking.
    *
    * Recall envelope (RecallProbe + LlmOpsSpec): on a clustered
    * corpus — the near-duplicate workload LSH is for, neighbor
    * cosine ≥ ~0.85 — the default reaches recall@10 ≥ 0.9 while
    * probing < 1% of the bucket space. On the UNIFORM synthetic test
    * corpus top-10 neighbors sit at cosine ≈ 0.3 (per-plane agreement
    * ≈ 0.6, statistically near-random): no sublinear hash family can
    * retrieve them, so the registered entry's recall there is
    * intentionally unpinned — that corpus is the documented hard
    * instance, and brute/IVF/PQ are the right tools for it.
    */
  def annLsh(spark: SparkSession, dir: String,
      radius: Int = SearchRadius, numPlanes: Int = SearchPlanes,
      numTables: Int = SearchTables): DataFrame = {
    val corpus = vecs(spark, dir).toDF("vec_id", "v", "norm")
    annLshOn(corpus, corpus.filter(col("vec_id") < NumProbes)
        .toDF("probe_id", "p_v", "p_norm"),
      radius, numPlanes, numTables)
  }

  /** [[annLsh]] over an explicit (vec_id, v, norm) corpus and
    * (probe_id, p_v, p_norm) probe set — lets RecallProbe and the
    * spec drive the same kernel with synthetic clustered corpora.
    */
  private[graft] def annLshOn(corpus0: DataFrame, probes0: DataFrame,
      radius: Int, numPlanes: Int, numTables: Int): DataFrame = {
    def tableCodes(v: String): Column = explode(array(
      (0 until numTables).map(t =>
        struct(lit(t).as("t"), lshCode(col(v), t, numPlanes).as("c"))): _*))
    val corpus = corpus0
      .withColumn("tc", tableCodes("v"))
      .select(col("vec_id"), col("v"), col("norm"),
        col("tc.t").as("t"), col("tc.c").as("code"))
    val probes = probes0
      .withColumn("tc", tableCodes("p_v"))
      .withColumn("m", explode(typedLit(hammingMasks(radius, numPlanes))))
      .select(col("probe_id"), col("p_v"), col("p_norm"),
        col("tc.t").as("t"), col("m").bitwiseXOR(col("tc.c")).as("code"))
    val scored = corpus.join(broadcast(probes), Seq("t", "code"))
      .filter(col("vec_id") =!= col("probe_id"))
      .withColumn("cos", Dedup.dot(col("v"), col("p_v")) / (col("norm") * col("p_norm")))
      // a pair colliding in several tables must rank once, not L times
      .groupBy("probe_id", "vec_id").agg(max("cos").as("cos"))
    val w = Window.partitionBy("probe_id").orderBy(col("cos").desc, col("vec_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= TopK)
      .select(col("probe_id"), col("rank"), col("vec_id").as("neighbor_id"),
        round(col("cos"), 6).as("cosine"))
  }

  /** PLANTED-TWIN certainty gate over [[annLsh]] (the
    * [[graft.operators.Dedup.minhashRecount]] pattern applied to
    * vectors — round 13): LSH recall on a general corpus is
    * corpus-shaped by design (the scaladoc above), but an IDENTICAL
    * vector hashes to the SAME code in every table with probability
    * 1 — its own bucket is always in the probe's hamming ≤ radius
    * expansion (the zero mask), so a planted exact twin of a corpus
    * vector is retrieved with certainty at cosine exactly 1 (the
    * maximum; 6-dp rounding absorbs the sqrt·sqrt ulp). The gate
    * plants one twin probe per brute-force probe id (vec_id <
    * NumProbes, negated ids so the self-exclusion filter never
    * fires) and asserts: every twin probe is served, and every
    * probe's best cosine is exactly 1.0. The oracle recomputes the
    * planted-probe count from the raw table and carries the
    * certainty booleans as TRUE literals — a banding, mask-set, or
    * code regression that loses even one twin breaks the driver
    * hash on any corpus, which is exactly the half of LSH that IS
    * gradable independent of corpus shape.
    */
  def annLshGate(spark: SparkSession, dir: String): DataFrame = {
    val corpus = vecs(spark, dir).toDF("vec_id", "v", "norm")
    val twins = corpus.filter(col("vec_id") < NumProbes)
      .select((-col("vec_id") - 1).as("probe_id"), col("v").as("p_v"),
        col("norm").as("p_norm"))
    val per = annLshOn(corpus, twins, SearchRadius, SearchPlanes,
        SearchTables)
      .groupBy("probe_id").agg(max("cosine").as("mx"))
    per.agg(
        count(lit(1)).as("n_probes_served"),
        coalesce(expr("bool_and(mx = 1.0)"), lit(true))
          .as("all_twins_retrieved"))
      .crossJoin(broadcast(
        twins.agg(countDistinct(col("probe_id")).as("n_twin_probes"))))
      .select("n_twin_probes", "n_probes_served", "all_twins_retrieved")
  }

  def annLshGateSql: String =
    s"""WITH t AS (
       |  SELECT count(DISTINCT vec_id)::BIGINT AS n
       |  FROM embeddings WHERE vec_id < $NumProbes
       |)
       |SELECT n AS n_twin_probes, n AS n_probes_served,
       |  true AS all_twins_retrieved
       |FROM t""".stripMargin

  /** Embedding-table QUALITY GATE — the audit run before any index
    * build or similarity pass trusts a vector column: per label,
    * vector count, distinct dimensionality (anything but 1 means a
    * ragged column that would corrupt every dot product), non-finite
    * and all-zero vectors (zero norm breaks cosine), the exact
    * [min, max] L2-norm envelope, and out-of-envelope counts against
    * fixed [0.5, 2.0] bounds (≈unit-norm corpus contract). Norms are
    * left-fold sums in array order + IEEE sqrt, so the doubles are
    * bit-identical across engines (the [[graft.operators.Bpe]]-style
    * list_reduce oracle idiom); non-finite vectors report NULL norm
    * and are excluded from the envelope on both engines.
    *
    * Scale shape: one narrow codegen'd projection over the vector
    * scan into a labels-sized partial agg — no shuffle of the
    * vectors themselves, streams unchanged.
    */
  def embeddingQuality(spark: SparkSession, dir: String): DataFrame =
    embeddingQualityOf(Tables.embeddings(spark, dir))

  /** Kernel over any (label, embedding) frame — split out so specs
    * can plant NaN / Inf / zero / ragged vectors.
    */
  private[graft] def embeddingQualityOf(vecs: DataFrame): DataFrame = {
    val e = vecs
      .select(col("label"),
        size(col("embedding")).cast("long").as("dim"),
        expr("exists(embedding, x -> isnan(x) OR " +
          "abs(CAST(x AS double)) = CAST('Infinity' AS double))").as("nonfinite"),
        expr("aggregate(embedding, CAST(0.0 AS double), " +
          "(a, x) -> a + CAST(x AS double) * CAST(x AS double))").as("ss"))
      .withColumn("norm", when(col("nonfinite"), lit(null).cast("double"))
        .otherwise(sqrt(col("ss"))))
    e.groupBy("label")
      .agg(
        count(lit(1)).as("n_vecs"),
        countDistinct(col("dim")).as("n_dims"),
        sum(when(col("nonfinite"), 1L).otherwise(0L)).as("n_nonfinite"),
        sum(when(col("norm") === 0.0, 1L).otherwise(0L)).as("n_zero"),
        min("norm").as("min_norm"),
        max("norm").as("max_norm"),
        sum(when(col("norm") < 0.5, 1L).otherwise(0L)).as("n_low_norm"),
        sum(when(col("norm") > 2.0, 1L).otherwise(0L)).as("n_high_norm"))
  }

  /** DuckDB dual of [[embeddingQuality]]: `list_reduce` over the
    * squared elements is the same left fold in the same array order
    * (a leading explicit 0 adds exactly nothing in IEEE), so norms —
    * and therefore the envelope doubles — hash-match bit-for-bit.
    * Zero-length vectors are guarded explicitly: DuckDB's
    * `list_reduce` THROWS on an empty list, and the gate must report
    * a malformed vector (dim 0, norm 0 — matching Spark's 0.0 fold
    * init), never abort on it.
    */
  def embeddingQualitySql: String =
    """WITH e AS (
      |  SELECT label, len(embedding)::BIGINT AS dim,
      |    CASE WHEN len(embedding) = 0 THEN false
      |         ELSE list_reduce(list_transform(embedding,
      |           x -> CASE WHEN isnan(x) OR isinf(x) THEN 1 ELSE 0 END),
      |           (a, b) -> a + b) > 0 END AS nonfinite,
      |    CASE WHEN len(embedding) = 0 THEN 0.0::DOUBLE
      |         ELSE list_reduce(list_transform(embedding,
      |           x -> x::DOUBLE * x::DOUBLE), (a, b) -> a + b) END AS ss
      |  FROM embeddings
      |), n AS (
      |  SELECT label, dim, nonfinite,
      |    CASE WHEN nonfinite THEN NULL ELSE sqrt(ss) END AS norm
      |  FROM e
      |)
      |SELECT label, count(*)::BIGINT AS n_vecs,
      |  count(DISTINCT dim)::BIGINT AS n_dims,
      |  sum(CASE WHEN nonfinite THEN 1 ELSE 0 END)::BIGINT AS n_nonfinite,
      |  sum(CASE WHEN norm = 0 THEN 1 ELSE 0 END)::BIGINT AS n_zero,
      |  min(norm) AS min_norm, max(norm) AS max_norm,
      |  sum(CASE WHEN norm < 0.5 THEN 1 ELSE 0 END)::BIGINT AS n_low_norm,
      |  sum(CASE WHEN norm > 2.0 THEN 1 ELSE 0 END)::BIGINT AS n_high_norm
      |FROM n GROUP BY label ORDER BY label""".stripMargin

  // ------------------------------------------------------------- PCA

  /** Fitted PCA model: per-dim mean, top-k eigenvalues (descending),
    * and the matching eigenvectors (rows, sign-normalized so each
    * component's largest-|entry| coordinate is positive — the
    * deterministic convention that makes refits bit-reproducible).
    */
  private[graft] case class PcaModel(mean: Array[Double],
      eigenvalues: Array[Double], components: Array[Array[Double]])

  private[graft] def fitPca(spark: SparkSession, dir: String,
      k: Int): PcaModel =
    fitPcaOf(vecs(spark, dir), k)

  /** PCA fit over a (vec_id, v, norm) corpus: ONE distributed Gramian
    * pass (Σ v·vᵀ via treeAggregate — map-side combined, d×d partials
    * only ever cross the wire) plus one per-dim mean pass, then the
    * covariance Cov = Σvvᵀ/n − μμᵀ eigendecomposes on the driver
    * (64×64 — model-sized, the [[fitOpqRotationOnSample]] budget).
    * At 100 TB the corpus is touched exactly twice and nothing
    * vector-sized is ever collected.
    */
  private[graft] def fitPcaOf(corpus: DataFrame, k: Int): PcaModel = {
    import org.apache.spark.mllib.linalg.{Vectors => OldVectors}
    import org.apache.spark.mllib.linalg.distributed.RowMatrix
    val cached = corpus.select("v").localCheckpoint()
    try {
      val n = cached.count().toDouble
      require(n > 1, "PCA needs at least two vectors")
      val mean = cached
        .select(posexplode(col("v")).as(Seq("dim", "x")))
        .groupBy("dim").agg(sum("x").as("s"))
        .collect().sortBy(_.getInt(0)).map(_.getDouble(1) / n)
      val d = mean.length
      val gram = new RowMatrix(
        cached.rdd.map(r => OldVectors.dense(r.getSeq[Double](0).toArray)))
        .computeGramianMatrix()
      val cov = breeze.linalg.DenseMatrix.tabulate(d, d)((i, j) =>
        gram(i, j) / n - mean(i) * mean(j))
      val es = breeze.linalg.eigSym(cov)
      val order = (0 until d).sortBy(i => -es.eigenvalues(i)).take(k)
      val comps = order.map { i =>
        val w = Array.tabulate(d)(j => es.eigenvectors(j, i))
        val m = w.indices.maxBy(j => (math.abs(w(j)), -j))
        if (w(m) < 0) w.map(x => -x) else w
      }.toArray
      PcaModel(mean, order.map(es.eigenvalues(_)).toArray, comps)
    } finally cached.unpersist()
  }

  /** ANN via PCA candidate generation — dimension-reduced search:
    * UNIT vectors project into [[fitPcaOf]]'s top-k principal
    * coordinates of the normalized corpus (64 → 16 doubles by
    * default, a 4× smaller candidate index), probes rank the corpus
    * by PROJECTED L2 distance — on unit vectors L2² = 2 − 2·cos, and
    * the contractive bound ‖P(a−b)‖ ≤ ‖a−b‖ keeps near neighbors near
    * in the retained subspace (exactly what PCA maximizes) — then the
    * top `cands` per probe rerank by EXACT cosine through the one
    * shared [[exactRerankTopK]] kernel. Same contract as every
    * family: probes vec_id < 5, self excluded, ties broken on vec_id,
    * final cosines exact.
    *
    * CANDIDATE BUDGET SCALES WITH THE CORPUS (round 12): a fixed
    * `cands` is a shrinking corpus fraction as the corpus grows, and
    * the shrink is measurable — recall@10 at (k=16, cands=128) fell
    * 0.90 (N=500) → 0.44 (N=2000) on the driver corpora. The default
    * (`cands ≤ 0`) is therefore [[pcaCands]] = max(128, ⌈N/4⌉),
    * derived from the corpus size the index carries: measured
    * recall@10 at the adaptive default is 0.98 (N=500) and 0.88
    * (N=2000, k=16; 1.00 at k=32), and the fraction — not the
    * absolute budget — is what the near-isotropic synthetic corpus
    * pins (top-16 of 64 dims keeps only ~¼ of its variance, so the
    * projected rank is a coarse filter; a real anisotropic embedding
    * corpus concentrates variance and sustains a far smaller
    * fraction). An explicit `cands > 0` overrides — the
    * (compression, candidate-budget) dial [[RecallProbe]] sweeps.
    *
    * Scale shape: the projection is a narrow broadcast map (8 codegen
    * dots/row); candidate scoring streams the 16-dim index against
    * broadcast probes — at 100 TB this is the classic two-tier
    * filter-and-refine, with the full-precision corpus touched only
    * for `cands` rows per probe. The N/4 default makes the refine leg
    * a constant corpus fraction — the honest cost of serving this
    * corpus shape at this compression; drop the fraction (or raise k)
    * only with a measured recall curve on the production corpus.
    */
  def annPca(spark: SparkSession, dir: String, cands: Int = 0,
      k: Int = 16): DataFrame =
    annPcaSearch(spark, dir, pcaIndex(spark, dir, k), cands)

  /** The adaptive PCA candidate budget: a quarter of the corpus with
    * a floor of 128 — see [[annPca]] for the measured rationale.
    */
  private[graft] def pcaCands(n: Long): Int =
    // clamp before .toInt: past ~8.6B vectors the N/4 fraction wraps
    // negative and .limit() would reject it (a per-probe rerank that
    // large needs a smaller fraction long before then — the dial
    // RecallProbe sweeps — but the default must stay a legal plan)
    math.min(math.max(128L, (n + 3L) / 4L), Int.MaxValue.toLong).toInt

  /** A fitted PCA candidate index: the projected corpus (vec_id, the
    * k projected coordinates — the ONLY per-vector state a deployment
    * stores) plus the model that projects probes at serve time, and
    * the corpus size `n` at fit time so the serve path can derive the
    * adaptive [[pcaCands]] budget without re-counting the corpus.
    * Build-once/serve-many like [[PqIndex]]; persists via
    * [[savePcaIndex]]/[[loadPcaIndex]] under the same manifest
    * discipline as every other family.
    */
  case class PcaIndex(projected: DataFrame, model: PcaModel, n: Long)

  /** The projection every PCA-index path shares: pcⱼ = ⟨wⱼ, v⟩/‖v‖ −
    * ⟨wⱼ, μ⟩ — the UNIT-vector projection with the center folded into
    * one broadcast constant per component (k codegen dots/row). One
    * definition, so the fused build, the persisted index, and the
    * serve-time probe leg can never project differently.
    */
  private def pcaProject(model: PcaModel)(vc: Column,
      norm: Column): Column = {
    val centers = model.components.map(w =>
      w.zip(model.mean).map { case (wi, mi) => wi * mi }.sum)
    array(model.components.toIndexedSeq.zipWithIndex.map { case (w, j) =>
      Dedup.dot(typedLit(w.toSeq), vc) / norm - lit(centers(j))
    }: _*)
  }

  /** Fit on the UNIT corpus: for unit vectors L2² = 2 − 2·cos, so a
    * projected-L2 rank in their principal subspace approximates the
    * cosine rank directly; fitting on raw vectors would let norm
    * variance (irrelevant to the angle) steal retained dimensions.
    */
  def pcaIndex(spark: SparkSession, dir: String, k: Int = 16): PcaIndex = {
    val corpus = vecs(spark, dir)
    val unit = corpus.select(col("vec_id"),
      transform(col("v"), _ / col("norm")).as("v"), lit(1.0).as("norm"))
    val model = fitPcaOf(unit, k)
    PcaIndex(corpus.select(col("vec_id"),
      pcaProject(model)(col("v"), col("norm")).as("pv")), model,
      corpus.count())
  }

  /** Serve path over a (possibly loaded) [[PcaIndex]]: probes project
    * through the index's model, rank the projected corpus by
    * projected L2, and the top `cands` rerank by EXACT cosine through
    * the one shared [[exactRerankTopK]] kernel. `cands ≤ 0` (the
    * default) derives the adaptive [[pcaCands]] budget from the
    * index's own corpus size — see [[annPca]].
    */
  def annPcaSearch(spark: SparkSession, dir: String, idx: PcaIndex,
      cands0: Int = 0): DataFrame = {
    val cands = if (cands0 > 0) cands0 else pcaCands(idx.n)
    val corpus = vecs(spark, dir)
    val probes = corpus.filter(col("vec_id") < NumProbes)
      .select(col("vec_id").as("probe_id"), col("v").as("p_v"),
        col("norm").as("p_norm"),
        pcaProject(idx.model)(col("v"), col("norm")).as("p_pv"))
    val wd = Window.partitionBy("probe_id")
      .orderBy(col("pd2").asc, col("vec_id"))
    val candRows = idx.projected.join(broadcast(probes),
        col("vec_id") =!= col("probe_id"))
      .withColumn("pd2", expr(
        "aggregate(zip_with(pv, p_pv, (a, b) -> (a - b) * (a - b)), " +
          "0D, (s, x) -> s + x)"))
      .withColumn("crank", row_number().over(wd))
      .filter(col("crank") <= cands)
      .select("probe_id", "p_v", "p_norm", "vec_id")
    exactRerankTopK(candRows, corpus)
  }

  /** PCA-index persistence: the projected corpus as parquet plus the
    * model flattened to (field, j, vals) rows — mean, eigenvalues,
    * and one row per component — under the [[IndexManifest]]
    * discipline. Doubles round-trip parquet bit-exactly, so a loaded
    * index serves BIT-identical results (spec-asserted).
    */
  def savePcaIndex(idx: PcaIndex, path: String): Unit = {
    val spark = idx.projected.sparkSession
    idx.projected.write.mode("overwrite").parquet(s"$path/projected")
    val m = idx.model
    val rows = Seq(("mean", 0, m.mean.toSeq),
      ("eigenvalues", 0, m.eigenvalues.toSeq),
      // corpus size at fit time — doubles hold integers exactly to
      // 2^53, far beyond any corpus this index format addresses
      ("n", 0, Seq(idx.n.toDouble))) ++
      m.components.zipWithIndex.map { case (w, j) =>
        ("component", j, w.toSeq) }
    spark.createDataFrame(rows.toIndexedSeq).toDF("field", "j", "vals")
      .write.mode("overwrite").parquet(s"$path/model")
    IndexManifest.write(spark, path, "ann_pca", Seq("projected", "model"))
  }

  def loadPcaIndex(spark: SparkSession, path: String): PcaIndex = {
    IndexManifest.validate(spark, path, "ann_pca",
      Seq("projected", "model")): Unit
    val projected = spark.read.parquet(s"$path/projected")
    require(projected.columns.toSet == Set("vec_id", "pv"),
      s"invalid PCA index at $path/projected: " +
        projected.columns.mkString(","))
    val rows = spark.read.parquet(s"$path/model")
      .select("field", "j", "vals").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getSeq[Double](2).toArray))
    def one(f: String) = {
      val hits = rows.filter(_._1 == f)
      require(hits.length == 1, s"invalid PCA model at $path: $f")
      hits.head._3
    }
    val comps = rows.filter(_._1 == "component").sortBy(_._2)
    val eig = one("eigenvalues")
    require(comps.map(_._2).toSeq == comps.indices &&
      comps.length == eig.length,
      s"invalid PCA model at $path: component rows do not cover 0..k-1")
    val n = one("n")
    require(n.length == 1 && n.head >= 0 && n.head.isWhole,
      s"invalid PCA model at $path: corpus size row")
    PcaIndex(projected,
      PcaModel(one("mean"), eig, comps.map(_._3)), n.head.toLong)
  }

  /** Principal-component projection of the embedding corpus — the
    * dimension-reduction leg a 100 TB embedding pipeline runs before
    * indexing or visualization: fit [[fitPca]]'s top-8 components,
    * then project every vector, pcⱼ = ⟨v, wⱼ⟩ − ⟨μ, wⱼ⟩ (the center
    * term folds into one broadcast constant per component, so the
    * projection is 8 codegen'd dots per row — a narrow map, zero
    * shuffle beyond the fit passes). Output carries the per-row
    * squared reconstruction error ‖v−μ‖² − Σpc² (non-negative by
    * Parseval; the spec pins it against explicit reconstruction) so
    * downstream monitors can watch captured variance drift.
    *
    * No SQL oracle by design (the eigensolve is not SQL-expressible);
    * correctness is the LlmOpsSpec property suite: orthonormal
    * components, descending eigenvalues that sum to ≤ trace with
    * per-component projected variance ≈ λ, exact per-row
    * reconstruction-error identity, and refit determinism.
    *
    * The registered surface emits the projection as SCALAR columns
    * pc_0..pc_7 (the q_feature_extract emb_i convention,
    * [[graft.operators.Multimodal]]) — an `array<double>` column is
    * not canonicalizable by the driver's correctness harness; the
    * array form stays on the internal [[embedPcaOf]] for the specs.
    */
  def embedPca(spark: SparkSession, dir: String): DataFrame = {
    val model = fitPca(spark, dir, k = 8)
    val k = model.components.length
    embedPcaOf(Tables.embeddings(spark, dir), model)
      .select(Seq(col("vec_id"), col("label")) ++
        (0 until k).map(j => element_at(col("pc"), j + 1).as(s"pc_$j")) :+
        col("recon_err2"): _*)
  }

  private[graft] def embedPcaOf(emb: DataFrame, model: PcaModel): DataFrame = {
    val base = emb.select(col("vec_id"), col("label"),
      col("embedding").cast("array<double>").as("v"))
    val centers = model.components.map(w =>
      w.zip(model.mean).map { case (wi, mi) => wi * mi }.sum)
    val pcs = model.components.toIndexedSeq.zipWithIndex.map {
      case (w, j) =>
        Dedup.dot(typedLit(w.toSeq), col("v")) - lit(centers(j))
    }
    val mu2 = model.mean.map(x => x * x).sum
    base
      .withColumn("pc", array(pcs: _*))
      .withColumn("recon_err2",
        Dedup.dot(col("v"), col("v")) -
          Dedup.dot(typedLit(model.mean.toSeq), col("v")) * 2.0 + lit(mu2) -
          expr("aggregate(pc, 0D, (a, x) -> a + x * x)"))
      .select("vec_id", "label", "pc", "recon_err2")
  }

  /** EMBEDDING OUTLIER REPORT — the embedding-space leg of the
    * quality gate, next to the text-side [[graft.operators.TextOps]]
    * signals: distance of every vector to the corpus CENTROID, with
    * the Iglewicz–Hoaglin modified z-score (0.6745·(d − med)/MAD,
    * |z| > 3.5 flags — q_anomaly_ticks' robust rule, which a few wild
    * embeddings cannot drag) marking vectors whose geometry says
    * "broken encoder output / wrong-modality row / adversarial junk".
    * Emits the full per-vector report (dist, z, is_outlier) so
    * downstream pruning composes the flag rather than re-deriving it.
    *
    * Cross-engine exactness: the centroid's per-dim means round to 12
    * (absorbing the engines' sum association orders — the beta
    * envelope); the distance is a fold over identical doubles rounded
    * 6; median/MAD are exact interpolated percentiles of those
    * rounded-6 dists rounded 6 (at 100 TB the documented swap is the
    * approx_percentile sketch — the q_anomaly_ticks convention); z is
    * one identical op chain rounded 6.
    *
    * Scale shape: centroid = ONE map-side-combined per-dim aggregate
    * (d×1 partials; the [[fitPcaOf]] mean pass) collected model-sized
    * and folded back as a broadcast literal — the corpus is scanned
    * once for the fit, once for the serve; the (med, MAD) model is a
    * one-row broadcast like the anomaly gate's.
    */
  def embedOutliers(spark: SparkSession, dir: String): DataFrame =
    embedOutliersOf(Tables.embeddings(spark, dir))

  private[graft] def embedOutliersOf(emb: DataFrame): DataFrame = {
    val base = emb.select(col("vec_id"),
      col("embedding").cast("array<double>").as("v"))
    val nRows = base.count().toDouble
    val mu = base
      .select(posexplode(col("v")).as(Seq("dim", "x")))
      .groupBy("dim").agg(sum("x").as("s"))
      .collect().sortBy(_.getInt(0))
      .map(r => BigDecimal(r.getDouble(1) / nRows)
        .setScale(12, BigDecimal.RoundingMode.HALF_UP).toDouble)
    val withMu = base.withColumn("mu", typedLit(mu.toSeq))
      .select(col("vec_id"), round(sqrt(expr(
        "aggregate(zip_with(v, mu, (a, b) -> (a - b) * (a - b)), " +
          "0D, (s, x) -> s + x)")), 6).as("dist"))
    val med = withMu.agg(
      round(percentile(col("dist"), lit(0.5)), 6).as("med"))
    val model = withMu.join(broadcast(med),
        org.apache.spark.sql.functions.lit(true))
      .agg(max("med").as("med"),
        round(percentile(abs(col("dist") - col("med")), lit(0.5)), 6)
          .as("mad"))
    withMu.join(broadcast(model), lit(true))
      .withColumn("z", when(col("mad") > 0,
        round(lit(0.6745) * (col("dist") - col("med")) / col("mad"), 6)))
      .select(col("vec_id"), col("dist"), col("med"), col("mad"), col("z"),
        (col("z").isNotNull && abs(col("z")) > 3.5).as("is_outlier"))
  }

  def embedOutliersSql: String =
    """WITH e AS (
      |  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
      |), d AS (
      |  SELECT vec_id, i, v[i] AS x
      |  FROM e, unnest(generate_series(1, len(v))) AS t(i)
      |), m AS (
      |  SELECT i, round(sum(x) / (SELECT count(*) FROM e), 12) AS mu
      |  FROM d GROUP BY i
      |), dist AS (
      |  SELECT vec_id,
      |    round(sqrt(sum((x - mu) * (x - mu))), 6) AS dist
      |  FROM d JOIN m USING (i) GROUP BY vec_id
      |), md AS (
      |  SELECT round(quantile_cont(dist, 0.5), 6) AS med FROM dist
      |), mm AS (
      |  SELECT max(med) AS med,
      |    round(quantile_cont(abs(dist - med), 0.5), 6) AS mad
      |  FROM dist, md
      |)
      |SELECT vec_id, dist, med, mad,
      |  CASE WHEN mad > 0
      |    THEN round(0.6745 * (dist - med) / mad, 6) END AS z,
      |  (mad > 0 AND abs(round(0.6745 * (dist - med) / mad, 6)) > 3.5)
      |    AS is_outlier
      |FROM dist, mm
      |ORDER BY vec_id""".stripMargin

  /** Per-variant recall REGRESSION floors for [[annRecallGate]] —
    * deliberately LOOSER than the spec floors (spec: ivf 0.35,
    * pq/opq/opq_np 0.5, graph/hnsw 0.7, pca 0.8, sq8 0.9 at
    * sf0.001): the gate's job is to hash-FAIL when an index family
    * breaks outright (a broken build or search reads ~0.0–0.1
    * recall), not to re-litigate the tight envelopes the specs and
    * RecallProbe own; generous margins keep the gate stable across
    * the driver's scale factors (measured sf0.01 recalls: ivf 0.58,
    * pq 0.52, opq 0.58, opq_np 0.52, pca ≥0.8, graph ≥0.7, hnsw 1.0,
    * sq8 1.0; ivfpq joined in round 11's tail — spec floor 0.45,
    * gate 0.3, measured 0.40-0.50 at sf0.1).
    *
    * Round 11 had LOWERED pca to 0.3 and graph to 0.2 after the
    * first sf0.1/replica runs measured real scale collapses (pca's
    * fixed cands=128 budget: 0.44 at N=2000; flat NSW navigability:
    * 0.26 at N=20k). Round 12 FIXED the operators instead and
    * restored the floors: pca's candidate budget now scales with the
    * corpus ([[pcaCands]] = max(128, N/4) — measured 0.98/0.88 at
    * N=500/2000, floor back to 0.5), and the graph serve path
    * auto-routes to the HNSW hierarchy above [[NswServeCap]]
    * ([[annGraphAuto]] — flat NSW only ever serves the regime where
    * it measures ≥0.88, floor back to 0.6, matching hnsw's). LSH is
    * excluded — its recall is corpus-shape-dependent by design
    * (uniform vs clustered; the clustered probe covers it).
    */
  private[graft] val RecallGateFloors: Seq[(String, Double)] = Seq(
    "graph" -> 0.6, "hnsw" -> 0.6, "ivf" -> 0.3, "ivfpq" -> 0.3,
    "opq" -> 0.35, "opq_np" -> 0.35, "pca" -> 0.5, "pq" -> 0.35,
    "sq8" -> 0.8)

  /** ANN RECALL GATE (round-11 partial-oracle tier) — the whole index
    * family's serve quality as ONE hash-graded row set: recall@k of
    * each variant against the exact brute-force top-k, compared to
    * its regression floor. The per-variant recall value is
    * index-dependent (not SQL-expressible), but `n_exact` is the
    * oracle's own brute-force count and `recall_ok` must equal the
    * TRUE literal — so an index regression that tanks any family
    * breaks the driver hash instead of waiting for a spec run.
    * Deterministic: every index build is seedless/hash-derived, so
    * recall is a fixed number per corpus.
    */
  def annRecallGate(spark: SparkSession, dir: String): DataFrame = {
    val exact = annBruteForce(spark, dir).select("probe_id", "neighbor_id")
    // Each family's CONSTRUCTION is eager driver work (seeded fits,
    // quantizer trainings, graph builds — dozens of small blocking
    // jobs); built sequentially they serialize into the gate's whole
    // wall time. The nine builds are independent, so they run from a
    // bounded pool and overlap (guide §2.6 — concurrent jobs
    // back-fill each other's idle stages); every fit stays seeded, so
    // each family's output is identical to a sequential build.
    val variantBuilders: Seq[(String, () => DataFrame)] = Seq(
      "ivf" -> (() => annIvf(spark, dir)),
      "ivfpq" -> (() => annIvfPq(spark, dir)),
      "sq8" -> (() => annSq8(spark, dir)),
      "pq" -> (() => annPq(spark, dir)),
      "opq" -> (() => annOpq(spark, dir)),
      "opq_np" -> (() => annOpqNp(spark, dir)),
      "pca" -> (() => annPca(spark, dir)),
      // the gate grades the SERVE path — the index a user actually
      // gets — so flat NSW's small-corpus-only regime is enforced by
      // the same routing production traffic takes
      "graph" -> (() => annGraphAuto(spark, dir)),
      "hnsw" -> (() => annHnsw(spark, dir)))
    val variants: Map[String, DataFrame] = {
      import scala.collection.parallel.CollectionConverters._
      val pool = new java.util.concurrent.ForkJoinPool(4)
      try {
        val par = variantBuilders.par
        par.tasksupport =
          new scala.collection.parallel.ForkJoinTaskSupport(pool)
        par.map { case (n, b) => n -> b() }.toList.toMap
      } finally pool.shutdown()
    }
    RecallGateFloors.map { case (name, floor) =>
      exact
        .join(variants(name).select(col("probe_id"), col("neighbor_id"))
          .withColumn("hit", lit(1)), Seq("probe_id", "neighbor_id"), "left")
        .agg(count(lit(1)).as("n_exact"),
          (sum(coalesce(col("hit"), lit(0))).cast("double")
            / count(lit(1)).cast("double") >= floor).as("recall_ok"))
        .select(lit(name).as("variant"), col("n_exact"),
          lit(floor).as("recall_floor"), col("recall_ok"))
    }.reduce(_ unionByName _)
  }

  def annRecallGateSql: String = {
    val values = RecallGateFloors
      .map { case (n, f) => s"('$n', ${f}::DOUBLE)" }.mkString(", ")
    s"""WITH $embNormCteSql, scored AS (
       |  SELECT p.vec_id AS probe_id, c.vec_id AS neighbor_id,
       |    list_sum(list_transform(list_zip(c.v, p.v), z -> z[1] * z[2]))
       |      / (c.norm * p.norm) AS cos
       |  FROM e c JOIN e p ON p.vec_id < $NumProbes AND c.vec_id <> p.vec_id
       |), ranked AS (
       |  SELECT probe_id,
       |    row_number() OVER (PARTITION BY probe_id ORDER BY cos DESC, neighbor_id) AS rank
       |  FROM scored
       |), n AS (SELECT count(*)::BIGINT AS n_exact FROM ranked WHERE rank <= $TopK)
       |SELECT v.variant, n.n_exact, v.recall_floor, true AS recall_ok
       |FROM (VALUES $values) AS v(variant, recall_floor), n
       |ORDER BY variant""".stripMargin
  }

  /** ASSIGNMENT-OPTIMALITY GATE over the shared IVF quantizer
    * (round-11 partial-oracle tier): the KMeans cells feed FOUR
    * rows-only surfaces (q_ann_ivf's cell pruning, q_semdedup's
    * candidate bounding, q_cluster_labels/q_cluster_cap/
    * q_cluster_purity's semantic rollups), so one hash-graded
    * invariant covers them all at the root — every vector sits in
    * its NEAREST center's cell (KMeans' own assignment contract;
    * 1e-9 slack absorbs fold-order float noise, ties pass by ≤).
    * `n_vecs` is the oracle's corpus count: a quantizer that drops
    * or double-assigns a vector, or a center table that drifts from
    * the assignment, breaks the driver hash. Deterministic: seeded
    * KMeans.
    *
    * Scale shape: one narrow pass over the assigned corpus against
    * the BROADCAST 16-row center table (16 codegen'd dots per row),
    * then a map-side-combined count/bool aggregate — no shuffle of
    * anything vector-sized.
    */
  def kmeansGate(spark: SparkSession, dir: String): DataFrame = {
    val idx = ivfIndex(spark, dir)
    idx.assigned
      .join(broadcast(idx.centers), lit(true))
      .withColumn("d2",
        Dedup.dot(col("center"), col("center"))
          - lit(2.0) * Dedup.dot(col("v"), col("center")))
      .groupBy("vec_id", "cell")
      .agg(min("d2").as("min_d2"),
        min(when(col("center_cell") === col("cell"), col("d2")))
          .as("own_d2"))
      .agg(count(lit(1)).as("n_vecs"),
        coalesce(expr(
          "bool_and(own_d2 IS NOT NULL AND own_d2 <= min_d2 + 1e-9)"),
          lit(true)).as("assign_optimal_ok"))
  }

  def kmeansGateSql: String =
    """SELECT count(*)::BIGINT AS n_vecs, true AS assign_optimal_ok
      |FROM embeddings""".stripMargin

  /** Floor for [[embedPcaGate]]'s explained-variance boolean —
    * looser than the measured fraction (top-8 of 64 dims explains
    * ~0.2 of an isotropic-ish synthetic corpus; a broken
    * eigendecomposition reads ~8/64 ≈ 0.125 of random directions
    * only when variance is exactly uniform, and ~0 when components
    * stop being unit vectors) so the gate trips on breakage, not on
    * corpus shape.
    */
  private[graft] val PcaExplainedFloor = 0.125

  /** SPECTRAL GATE over the PCA fit (round-11 partial-oracle tier)
    * — q_embed_pca's projections aren't SQL-expressible, but the
    * fit's defining properties are checkable against TRUE literals
    * next to an exact corpus-count leg:
    *  - `orthonormal_ok`: the top-k eigenvectors are unit-length and
    *    mutually orthogonal (driver-side, 1e-8);
    *  - `var_ordered_ok`: eigenvalues non-increasing (driver-side);
    *  - `recon_nonneg_ok`: no projection "explains" more energy than
    *    its vector holds (corpus min recon_err2 ≥ −1e-6);
    *  - `spectral_ok`: the eigSym residual identity — mean
    *    recon_err2 equals trace(Cov) − Σ top-k λ within 1e-6
    *    relative (ties the corpus-side projections to the
    *    driver-side spectrum; a component/eigenvalue mismatch or a
    *    projection bug breaks it);
    *  - `explained_ok`: Σ top-k λ / trace ≥ [[PcaExplainedFloor]].
    *
    * Scale shape: the fit is [[fitPcaOf]]'s two corpus passes; the
    * gate adds ONE narrow aggregate over the projected corpus (k
    * doubles + one residual per row) — nothing vector-sized ever
    * collects.
    */
  def embedPcaGate(spark: SparkSession, dir: String): DataFrame = {
    val k = 8
    val model = fitPca(spark, dir, k)
    val d = model.mean.length
    def dotA(a: Array[Double], b: Array[Double]): Double =
      a.zip(b).map { case (x, y) => x * y }.sum
    val orthonormal = (0 until k).forall { i =>
      (i until k).forall { j =>
        val expect = if (i == j) 1.0 else 0.0
        math.abs(dotA(model.components(i), model.components(j)) - expect) <= 1e-8
      }
    }
    val ordered = model.eigenvalues.sliding(2)
      .forall(w => w.length < 2 || w(0) >= w(1) - 1e-12)
    val emb = Tables.embeddings(spark, dir)
    val stats = embedPcaOf(emb, model)
      .agg(count(lit(1)).as("n_vecs"),
        avg("recon_err2").as("mean_recon"),
        min("recon_err2").as("min_recon"))
      .head()
    val nVecs = stats.getAs[Long]("n_vecs")
    val meanRecon = stats.getAs[Double]("mean_recon")
    val minRecon = stats.getAs[Double]("min_recon")
    // INDEPENDENT trace(Cov) = E[v·v] − ‖μ‖² (corpus second moment,
    // not the projection path) — ties the Gramian-side spectrum to
    // the projection-side residuals: mean recon_err2 must equal
    // trace − Σ top-k λ, so a component/eigenvalue mismatch or a
    // projection bug breaks the identity.
    val meanSq = emb
      .select(col("embedding").cast("array<double>").as("v"))
      .agg(avg(Dedup.dot(col("v"), col("v")))).head().getDouble(0)
    val trace = meanSq - model.mean.map(x => x * x).sum
    val topVar = model.eigenvalues.sum
    val spectralOk =
      math.abs(meanRecon - (trace - topVar)) <= 1e-6 * math.max(trace, 1.0)
    val explainedOk = trace > 0 && topVar / trace >= PcaExplainedFloor
    import spark.implicits._
    Seq((nVecs, k, orthonormal, ordered, minRecon >= -1e-6,
      spectralOk, explainedOk))
      .toDF("n_vecs", "k", "orthonormal_ok", "var_ordered_ok",
        "recon_nonneg_ok", "spectral_ok", "explained_ok")
  }

  def embedPcaGateSql: String =
    """SELECT count(*)::BIGINT AS n_vecs, 8 AS k, true AS orthonormal_ok,
      |  true AS var_ordered_ok, true AS recon_nonneg_ok,
      |  true AS spectral_ok, true AS explained_ok
      |FROM embeddings""".stripMargin

  /** Recall floor for [[annFilteredGate]] — loose for the same
    * reason as [[RecallGateFloors]] (GateProbe-measured: 0.34 /
    * 0.50 / 0.50 at sf0.001/0.01/0.1 — the label constraint thins
    * each cell, so nProbe=3 of 16 costs more recall than unfiltered
    * IVF; a broken pushdown or label join reads ~0).
    */
  private[graft] val FilteredIvfRecallFloor = 0.15

  /** FILTERED-SEARCH RECALL GATE (round-11 partial-oracle tier):
    * q_ann_filtered_ivf — the label-pushdown search through the IVF
    * cells — against the exact filtered top-k, whose count the
    * oracle recomputes with the SAME label-constrained ranking SQL
    * that already hash-proves q_ann_filtered. One row: the exact
    * result mass, the floor, and recall_ok vs TRUE. A pushdown
    * regression (filter applied after ranking, wrong label join,
    * broken cell pruning) breaks the driver hash.
    */
  def annFilteredGate(spark: SparkSession, dir: String): DataFrame = {
    val exact = annFiltered(spark, dir).select("probe_id", "neighbor_id")
    val ivf = annFilteredIvf(spark, dir)
      .select(col("probe_id"), col("neighbor_id"), lit(1).as("hit"))
    exact.join(ivf, Seq("probe_id", "neighbor_id"), "left")
      .agg(count(lit(1)).as("n_exact"),
        coalesce(sum(coalesce(col("hit"), lit(0))).cast("double")
          / count(lit(1)).cast("double") >= FilteredIvfRecallFloor,
          lit(true)).as("recall_ok"))
      .select(col("n_exact"),
        lit(FilteredIvfRecallFloor).as("recall_floor"), col("recall_ok"))
  }

  def annFilteredGateSql: String =
    s"""WITH $embNormCteSql, el AS (
       |  SELECT e.vec_id, e.v, e.norm, l.label
       |  FROM e JOIN embeddings l ON l.vec_id = e.vec_id
       |), scored AS (
       |  SELECT p.vec_id AS probe_id, c.vec_id AS neighbor_id,
       |    list_sum(list_transform(list_zip(c.v, p.v), z -> z[1] * z[2]))
       |      / (c.norm * p.norm) AS cos
       |  FROM el c JOIN el p ON p.vec_id < $NumProbes
       |    AND c.label = p.label AND c.vec_id <> p.vec_id
       |), ranked AS (
       |  SELECT probe_id,
       |    row_number() OVER (PARTITION BY probe_id
       |      ORDER BY cos DESC, neighbor_id) AS rank
       |  FROM scored
       |)
       |SELECT count(*)::BIGINT AS n_exact,
       |  $FilteredIvfRecallFloor::DOUBLE AS recall_floor, true AS recall_ok
       |FROM ranked WHERE rank <= $TopK""".stripMargin
}
