package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding subword tokenizer: distributed training +
  * distributed apply — the tokenizer-construction stage of a
  * training-data pipeline (richer than the BPE-ish regex count in
  * [[TextOps.tokenCount]]).
  *
  * Scale shape: the only corpus-sized pass is the word-frequency
  * aggregation (one shuffle, map-side combined). The merge-learning
  * loop then runs over the AGGREGATED (word, count) table — the
  * standard shape for BPE training: vocab-scale data, not
  * corpus-scale — and tokenization streams per partition with the
  * merge table broadcast (read-only, a few KB).
  *
  * Algorithm: classic BPE (Sennrich et al. 2016, "Neural Machine
  * Translation of Rare Words with Subword Units"): start from
  * characters with an end-of-word marker, repeatedly merge the most
  * frequent adjacent symbol pair. Ties break on (count desc, pair
  * lexicographic asc) so training is deterministic. Apply follows the
  * learned merge ORDER (rank), merging the lowest-rank adjacent pair
  * first — the published apply rule.
  */
object Bpe {

  /** End-of-word marker so merges can't cross word boundaries and
    * word-final subwords stay distinct from word-internal ones.
    */
  val Eow = "</w>"

  /** Lowercased a-z0-9 words of a document column — the SAME helper
    * [[TextOps.cleanText]] uses, so tokenizer vocab and text cleaning
    * can't silently diverge.
    */
  private def wordsCol = TextOps.normalizedWords

  /** Distributed (word, count) aggregation — the corpus-scale pass. */
  def wordCounts(docs: DataFrame): DataFrame =
    docs.select(explode(wordsCol).as("word"))
      .filter(col("word") =!= "")
      .groupBy("word").agg(count(lit(1)).as("cnt"))

  /** Learn `numMerges` BPE merges from the aggregated word counts.
    * Returns merges in learned order (rank = index).
    */
  def train(counts: Seq[(String, Long)], numMerges: Int): Seq[(String, String)] = {
    // each word as its current symbol segmentation
    var words: Array[(Array[String], Long)] = counts.map { case (w, c) =>
      (w.map(_.toString).toArray :+ Eow, c)
    }.toArray
    val merges = Vector.newBuilder[(String, String)]
    var i = 0
    var done = false
    while (i < numMerges && !done) {
      val pairCounts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      words.foreach { case (syms, c) =>
        var j = 0
        while (j < syms.length - 1) {
          val p = (syms(j), syms(j + 1))
          pairCounts.update(p, pairCounts.getOrElse(p, 0L) + c)
          j += 1
        }
      }
      if (pairCounts.isEmpty) done = true
      else {
        val best = pairCounts.toSeq.minBy { case ((a, b), c) => (-c, a, b) }._1
        merges += best
        words = words.map { case (syms, c) => (mergePair(syms, best), c) }
        i += 1
      }
    }
    merges.result()
  }

  private def mergePair(syms: Array[String], p: (String, String)): Array[String] = {
    val out = Array.newBuilder[String]
    var j = 0
    while (j < syms.length) {
      if (j < syms.length - 1 && syms(j) == p._1 && syms(j + 1) == p._2) {
        out += syms(j) + syms(j + 1); j += 2
      } else { out += syms(j); j += 1 }
    }
    out.result()
  }

  /** Tokenize one word with the learned merges: repeatedly apply the
    * LOWEST-rank merge present (the canonical apply order).
    */
  def encodeWord(word: String, rank: Map[(String, String), Int]): Array[String] = {
    var syms: Array[String] = word.map(_.toString).toArray :+ Eow
    var continue = syms.length > 1
    while (continue) {
      var bestRank = Int.MaxValue
      var bestPair: (String, String) = null
      var j = 0
      while (j < syms.length - 1) {
        val r = rank.getOrElse((syms(j), syms(j + 1)), Int.MaxValue)
        if (r < bestRank) { bestRank = r; bestPair = (syms(j), syms(j + 1)) }
        j += 1
      }
      if (bestPair == null) continue = false
      else syms = mergePair(syms, bestPair)
      if (syms.length < 2) continue = false
    }
    syms
  }

  /** End-to-end: train `numMerges` merges on the corpus, then tokenize
    * every document. Output per doc: subword count and the subword
    * sequence of the first words (bounded preview, space-joined so
    * every output column is a flat scalar). The merge table is
    * broadcast; per-partition tokenization memoizes repeated words.
    *
    * The vocab collect is CAPPED at the `maxVocab` most frequent words
    * (ordered cnt desc, word asc — deterministic): at web scale the
    * distinct-word table is 10⁸+, while BPE merge learning is driven
    * by the frequent head — rare-tail words contribute ~0 pair mass.
    */
  def tokenizeDocs(spark: SparkSession, dir: String, numMerges: Int = 64,
      maxVocab: Int = 1 << 20): DataFrame = {
    import spark.implicits._
    val docs = graft.Tables.documents(spark, dir)
    val counts = wordCounts(docs)
      .orderBy(col("cnt").desc, col("word"))
      .limit(maxVocab)
      .as[(String, Long)].collect().toSeq
      .sortBy { case (w, c) => (-c, w) } // deterministic train input order
    val merges = train(counts, numMerges)
    val rankB = spark.sparkContext.broadcast(
      merges.zipWithIndex.map { case (p, r) => p -> r }.toMap)
    docs.select(col("doc_id"), wordsCol.as("words"))
      .as[(Long, Seq[String])]
      .mapPartitions { it =>
        val rank = rankB.value
        val memo = scala.collection.mutable.HashMap.empty[String, Array[String]]
        it.map { case (id, words) =>
          val toks = words.filter(_.nonEmpty).flatMap(w =>
            memo.getOrElseUpdate(w, encodeWord(w, rank)))
          (id, toks.length.toLong, toks.take(12).mkString(" "))
        }
      }
      .toDF("doc_id", "n_subwords", "subword_preview")
      .orderBy("doc_id")
  }
}
