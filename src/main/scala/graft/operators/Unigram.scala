package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Unigram-LM subword tokenizer (Kudo 2018, "Subword Regularization:
  * Improving Neural Network Translation Models with Multiple Subword
  * Candidates" — the SentencePiece unigram model): the second member
  * of the tokenizer-construction tier next to [[Bpe]]. Where BPE
  * grows a vocabulary bottom-up by greedy pair merging, the unigram
  * model starts from a large seed of candidate pieces and PRUNES it
  * under an EM-fitted piece-probability model; encoding is the
  * Viterbi max-probability segmentation instead of merge replay.
  *
  * Scale shape — identical to [[Bpe]] by design: the only
  * corpus-sized pass is the shared (word, count) aggregation
  * ([[Bpe.wordCounts]] — one shuffle, map-side combined); seeding,
  * EM, and pruning run on the AGGREGATED vocab-scale table on the
  * driver (every quantity is a sum over distinct words weighted by
  * count, so the fit never touches the corpus again); encoding
  * streams per partition with the fitted piece table broadcast and a
  * per-partition word memo.
  *
  * Honest simplifications, documented: the E-step is the full
  * forward-backward expectation over ALL segmentations (exact, not
  * the k-best approximation), but pruning keeps the highest
  * expected-mass pieces rather than recomputing each piece's exact
  * likelihood-loss-on-removal (the standard cheap approximation;
  * single-character pieces are never pruned, which preserves full
  * coverage of the normalized a-z0-9 alphabet). Determinism: seed
  * order, EM arithmetic, pruning ties (mass desc, piece asc), and
  * Viterbi ties (longer piece first, then lexicographic) are all
  * pinned, so two trainings on the same corpus are bit-identical.
  */
object Unigram {

  /** Longest candidate piece considered at seeding. */
  private val MaxPieceLen = 6

  /** Seed vocabulary size (most frequent substrings + all chars). */
  private val SeedSize = 4096

  /** Post-pruning vocabulary size (plus any protected chars). */
  private val FinalVocab = 512

  /** EM iterations before and after the prune. */
  private val EmIters = 2

  /** A fitted model: piece → natural-log probability. */
  private[graft] final case class Model(logp: Map[String, Double]) {
    val maxLen: Int = if (logp.isEmpty) 1 else logp.keysIterator.map(_.length).max
  }

  /** Expected piece counts of one (word, count) under the current
    * model — exact forward-backward over every segmentation.
    * alpha(i)/beta(i) are log partition masses of the prefix/suffix;
    * a piece spanning [j, i) contributes exp(alpha(j) + lp + beta(i)
    * − alpha(n)) · count.
    */
  private def accumulate(word: String, count: Long, logp: collection.Map[String, Double],
      maxLen: Int, out: collection.mutable.HashMap[String, Double]): Double = {
    val n = word.length
    val NegInf = Double.NegativeInfinity
    val alpha = Array.fill(n + 1)(NegInf); alpha(0) = 0.0
    var i = 1
    while (i <= n) {
      var j = math.max(0, i - maxLen)
      while (j < i) {
        if (alpha(j) != NegInf) {
          logp.get(word.substring(j, i)) match {
            case Some(lp) =>
              val v = alpha(j) + lp
              alpha(i) = if (alpha(i) == NegInf) v
                else math.max(alpha(i), v) + math.log1p(math.exp(-math.abs(alpha(i) - v)))
            case None =>
          }
        }
        j += 1
      }
      i += 1
    }
    if (alpha(n) == NegInf) return 0.0 // uncoverable word: contributes nothing
    val beta = Array.fill(n + 1)(NegInf); beta(n) = 0.0
    i = n - 1
    while (i >= 0) {
      var k = i + 1
      val lim = math.min(n, i + maxLen)
      while (k <= lim) {
        if (beta(k) != NegInf) {
          logp.get(word.substring(i, k)) match {
            case Some(lp) =>
              val v = beta(k) + lp
              beta(i) = if (beta(i) == NegInf) v
                else math.max(beta(i), v) + math.log1p(math.exp(-math.abs(beta(i) - v)))
            case None =>
          }
        }
        k += 1
      }
      i -= 1
    }
    i = 0
    while (i < n) {
      var k = i + 1
      val lim = math.min(n, i + maxLen)
      while (k <= lim) {
        val piece = word.substring(i, k)
        logp.get(piece) match {
          case Some(lp) if alpha(i) != NegInf && beta(k) != NegInf =>
            val post = math.exp(alpha(i) + lp + beta(k) - alpha(n))
            if (post > 0.0) out.update(piece, out.getOrElse(piece, 0.0) + post * count)
          case _ =>
        }
        k += 1
      }
      i += 1
    }
    alpha(n) * count // the word's log-likelihood contribution
  }

  /** Train on the aggregated (word, count) table: frequency seed →
    * EM → mass prune (chars protected) → EM. Returns the model and
    * the corpus log-likelihood trace (one entry per EM iteration —
    * [[UnigramSpec]] pins its monotonicity, the EM guarantee).
    */
  private[graft] def train(counts: Seq[(String, Long)]): (Model, Seq[Double]) = {
    import scala.collection.mutable
    // 1. seed: substring frequencies weighted by word count
    val seedMass = mutable.HashMap.empty[String, Double]
    counts.foreach { case (w, c) =>
      var i = 0
      while (i < w.length) {
        var k = i + 1
        val lim = math.min(w.length, i + MaxPieceLen)
        while (k <= lim) {
          val p = w.substring(i, k)
          seedMass.update(p, seedMass.getOrElse(p, 0.0) + c.toDouble)
          k += 1
        }
        i += 1
      }
    }
    val chars = seedMass.keysIterator.filter(_.length == 1).toVector
    val multi = seedMass.iterator.filter(_._1.length > 1).toVector
      .sortBy { case (p, m) => (-m, p) }
      .take(math.max(0, SeedSize - chars.length)).map(_._1)
    def normalize(mass: collection.Map[String, Double],
        keep: Iterable[String]): Map[String, Double] = {
      val kept = keep.map(p => p -> math.max(mass.getOrElse(p, 0.0), 1e-12)).toVector
      val total = kept.iterator.map(_._2).sum
      kept.map { case (p, m) => p -> (math.log(m) - math.log(total)) }.toMap
    }
    var logp = normalize(seedMass, chars ++ multi)
    val ll = Vector.newBuilder[Double]
    def emIter(): mutable.HashMap[String, Double] = {
      val maxLen = logp.keysIterator.map(_.length).max
      val expected = mutable.HashMap.empty[String, Double]
      var lik = 0.0
      counts.foreach { case (w, c) => lik += accumulate(w, c, logp, maxLen, expected) }
      ll += lik
      expected
    }
    // 2. EM on the seed
    var iter = 0
    var expected = mutable.HashMap.empty[String, Double]
    while (iter < EmIters) {
      expected = emIter()
      logp = normalize(expected, logp.keysIterator.toVector.sorted)
      iter += 1
    }
    // 3. prune to FinalVocab by expected mass; chars are never pruned
    val protectedChars = logp.keysIterator.filter(_.length == 1).toVector.sorted
    val keptMulti = expected.iterator.filter(_._1.length > 1).toVector
      .sortBy { case (p, m) => (-m, p) }
      .take(math.max(0, FinalVocab - protectedChars.length)).map(_._1)
    logp = normalize(expected, protectedChars ++ keptMulti)
    // 4. EM on the pruned vocabulary
    iter = 0
    while (iter < EmIters) {
      expected = emIter()
      logp = normalize(expected, logp.keysIterator.toVector.sorted)
      iter += 1
    }
    (Model(logp), ll.result())
  }

  /** Viterbi max-log-probability segmentation. Ties prefer the LONGER
    * final piece, then the lexicographically smaller one — a total
    * deterministic order.
    */
  private[graft] def encodeWord(word: String, m: Model): Array[String] = {
    val n = word.length
    if (n == 0) return Array.empty
    val NegInf = Double.NegativeInfinity
    val best = Array.fill(n + 1)(NegInf); best(0) = 0.0
    val back = Array.fill(n + 1)(-1)
    var i = 1
    while (i <= n) {
      var j = math.max(0, i - m.maxLen)
      while (j < i) {
        if (best(j) != NegInf) {
          m.logp.get(word.substring(j, i)) match {
            case Some(lp) =>
              val v = best(j) + lp
              // tie → smaller j = longer final piece (total order: the
              // same (j, i) is the same piece, so no further tie exists)
              if (v > best(i) || (v == best(i) && j < back(i))) {
                best(i) = v; back(i) = j
              }
            case None =>
          }
        }
        j += 1
      }
      i += 1
    }
    if (best(n) == NegInf) return Array(word) // uncoverable: emit whole (never for a-z0-9)
    var pos = n
    var pieces = List.empty[String]
    while (pos > 0) { val j = back(pos); pieces = word.substring(j, pos) :: pieces; pos = j }
    pieces.toArray
  }

  /** Segmentation log-probability under the model (−∞ if any piece
    * is out-of-vocabulary) — the scoring leg of the optimality gate.
    */
  private[graft] def score(pieces: Seq[String], m: Model): Double =
    pieces.foldLeft(0.0)((acc, p) =>
      acc + m.logp.getOrElse(p, Double.NegativeInfinity))

  /** Greedy longest-match segmentation — the independent baseline the
    * optimality gate compares Viterbi against.
    */
  private[graft] def greedyEncode(word: String, m: Model): Array[String] = {
    val out = Array.newBuilder[String]
    var i = 0
    while (i < word.length) {
      var k = math.min(word.length, i + m.maxLen)
      var found = false
      while (k > i && !found) {
        if (m.logp.contains(word.substring(i, k))) {
          out += word.substring(i, k); i = k; found = true
        } else k -= 1
      }
      if (!found) { out += word.substring(i, i + 1); i += 1 }
    }
    out.result()
  }

  private[graft] def fitModelDocs(docs: DataFrame,
      maxVocab: Int = 1 << 20): Model = {
    val spark = docs.sparkSession
    import spark.implicits._
    val counts = Bpe.wordCounts(docs)
      .orderBy(col("cnt").desc, col("word"))
      .limit(maxVocab)
      .as[(String, Long)].collect().toSeq
      .sortBy { case (w, c) => (-c, w) }
    train(counts)._1
  }

  private def fitModel(spark: SparkSession, dir: String,
      maxVocab: Int): Model =
    fitModelDocs(graft.Tables.documents(spark, dir), maxVocab)

  /** The encode leg alone over an arbitrary documents frame with an
    * already-fitted model — the ScaleProbe surface (fit is
    * vocab-scale driver work; the corpus-scale question is encode).
    */
  private[graft] def encodeDocsWith(docs: DataFrame, model: Model): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val modelB = spark.sparkContext.broadcast(model)
    docs.select(col("doc_id"), TextOps.normalizedWords.as("words"))
      .as[(Long, Seq[String])]
      .mapPartitions { it =>
        val m = modelB.value
        val memo = scala.collection.mutable.HashMap.empty[String, Array[String]]
        it.map { case (id, words) =>
          val toks = words.filter(_.nonEmpty).flatMap(w =>
            memo.getOrElseUpdate(w, encodeWord(w, m)))
          val lp = if (toks.isEmpty) 0.0 else score(toks, m) / toks.length
          (id, toks.length.toLong, toks.take(12).mkString(" "),
            math.rint(lp * 1e6) / 1e6)
        }
      }
      .toDF("doc_id", "n_pieces", "piece_preview", "mean_piece_logp")
  }

  /** End-to-end: fit the unigram model on the corpus, Viterbi-encode
    * every document. Output mirrors [[Bpe.tokenizeDocs]]: piece count
    * plus a bounded space-joined preview, and the mean piece
    * log-probability (the sequence-level "naturalness" the unigram
    * model adds over BPE — a doc of rare pieces scores low).
    */
  def tokenizeDocs(spark: SparkSession, dir: String,
      maxVocab: Int = 1 << 20): DataFrame =
    encodeDocsWith(graft.Tables.documents(spark, dir),
      fitModel(spark, dir, maxVocab))

  /** ROUNDTRIP + OPTIMALITY gate for [[tokenizeDocs]]
    * ([[Bpe.bpeRoundtrip]]'s pattern plus a Viterbi leg): per doc the
    * oracle recomputes the normalized word count and character mass
    * from raw text, while two booleans must equal TRUE —
    * `roundtrip_ok` (Viterbi pieces concatenate back to every word:
    * segmentation is a partition of the word, the conservation
    * certainty) and `viterbi_opt_ok` (the Viterbi score beats-or-ties
    * BOTH independent baseline segmentations: greedy longest-match
    * and all-single-chars — the defining max-probability property; a
    * DP or tie-break regression that picks a sub-optimal path breaks
    * the hash). Same broadcast + memo shape as the tokenizer.
    */
  def unigramGate(spark: SparkSession, dir: String,
      maxVocab: Int = 1 << 20): DataFrame = {
    import spark.implicits._
    val model = fitModel(spark, dir, maxVocab)
    val modelB = spark.sparkContext.broadcast(model)
    graft.Tables.documents(spark, dir)
      .select(col("doc_id"), TextOps.normalizedWords.as("words"))
      .as[(Long, Seq[String])]
      .mapPartitions { it =>
        val m = modelB.value
        val memo = scala.collection.mutable.HashMap.empty[String, (Boolean, Boolean)]
        it.map { case (id, words) =>
          val ws = words.filter(_.nonEmpty)
          var chars = 0L
          var rt = true
          var opt = true
          ws.foreach { w =>
            chars += w.length
            val (r, o) = memo.getOrElseUpdate(w, {
              val vit = encodeWord(w, m)
              val vs = score(vit.toSeq, m)
              val gs = score(greedyEncode(w, m).toSeq, m)
              val cs = score(w.map(_.toString), m)
              (vit.mkString("") == w,
                vs >= gs - 1e-9 && vs >= cs - 1e-9)
            })
            rt &&= r; opt &&= o
          }
          (id, ws.length.toLong, chars, rt, opt)
        }
      }
      .toDF("doc_id", "n_words", "n_chars_norm", "roundtrip_ok", "viterbi_opt_ok")
  }

  def unigramGateSql: String =
    """WITH w AS (
      |  SELECT doc_id,
      |    list_filter(string_split(trim(regexp_replace(regexp_replace(
      |      lower(trim(text)), '[^a-z0-9\s]', ' ', 'g'), '\s+', ' ', 'g')),
      |      ' '), x -> x <> '') AS ws
      |  FROM documents
      |)
      |SELECT doc_id, len(ws)::BIGINT AS n_words,
      |  coalesce(list_sum(list_transform(ws, x -> length(x))), 0)::BIGINT
      |    AS n_chars_norm,
      |  true AS roundtrip_ok, true AS viterbi_opt_ok
      |FROM w ORDER BY doc_id""".stripMargin
}
