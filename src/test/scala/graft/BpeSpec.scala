package graft

import graft.operators.Bpe
import org.apache.spark.sql.functions._

class BpeSpec extends SparkSuite {

  // the classic Sennrich et al. example corpus
  private val toyCounts: Seq[(String, Long)] = Seq(
    ("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L))

  test("train learns the published merge sequence on the toy corpus") {
    val merges = Bpe.train(toyCounts, 5)
    // hand-computed: (e,s)=9; (es,t)=9; (est,</w>)=9; then the
    // (l,o)/(o,w) 7-7 tie breaks lexicographically to (l,o); (lo,w)=7
    assert(merges == Seq(
      ("e", "s"), ("es", "t"), ("est", Bpe.Eow),
      ("l", "o"), ("lo", "w")))
  }

  test("encodeWord applies merges by rank and reconstructs the word") {
    val merges = Bpe.train(toyCounts, 10)
    val rank = merges.zipWithIndex.map { case (p, r) => p -> r }.toMap
    for (w <- Seq("low", "lower", "newest", "widest", "lowest", "news", "zzz")) {
      val toks = Bpe.encodeWord(w, rank)
      assert(toks.mkString("").stripSuffix(Bpe.Eow) == w,
        s"roundtrip failed for $w: ${toks.mkString("|")}")
    }
    // a fully-merged in-vocab word collapses to few subwords
    assert(Bpe.encodeWord("newest", rank).length <= 2)
  }

  test("train halts when no pairs remain") {
    val merges = Bpe.train(Seq(("ab", 1L)), 100)
    // a b </w> has only 2 pairs to merge before each word is 1 symbol
    assert(merges.length <= 2)
  }

  test("vocab cap: rare tail prune leaves head-driven merges unchanged") {
    // the tail word shares no characters with the frequent head, so
    // pruning it must not perturb any winning pair count or tie
    val counts = Seq(("low", 50L), ("lower", 30L), ("newest", 20L), ("xyzzy", 1L))
    assert(Bpe.train(counts, 8) == Bpe.train(counts.filter(_._2 > 1), 8))
  }

  test("tokenizeDocs under a tight vocab cap still covers every doc") {
    val capped = Bpe.tokenizeDocs(spark, sfDir, numMerges = 32, maxVocab = 200)
    assert(capped.count() == Tables.documents(spark, sfDir).count())
    assert(capped.filter("n_subwords <= 0").count() == 0)
  }

  test("tokenizeDocs is deterministic and consistent on real docs") {
    val a = Bpe.tokenizeDocs(spark, sfDir, numMerges = 32).collect()
    val b = Bpe.tokenizeDocs(spark, sfDir, numMerges = 32).collect()
    assert(a.length == Tables.documents(spark, sfDir).count())
    assert(a.map(_.toString).sameElements(b.map(_.toString)), "nondeterministic")
    // more merges → no more subwords per doc
    val fewer = Bpe.tokenizeDocs(spark, sfDir, numMerges = 128)
      .select(sum("n_subwords")).head.getLong(0)
    val more = a.map(_.getAs[Long]("n_subwords")).sum
    assert(fewer <= more, "extra merges must not increase token count")
  }
}
