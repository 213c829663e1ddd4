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

  test("incremental trainer equals full pair-recount on random vocabularies") {
    // independent naive formulation: recount every pair each merge
    def naive(counts: Seq[(String, Long)], numMerges: Int): Seq[(String, String)] = {
      var words = counts.map { case (w, c) => (w.map(_.toString).toArray :+ Bpe.Eow, c) }
      val out = Seq.newBuilder[(String, String)]
      var i = 0
      var done = false
      while (i < numMerges && !done) {
        val pc = scala.collection.mutable.HashMap.empty[(String, String), Long]
        words.foreach { case (s, c) =>
          s.sliding(2).filter(_.length == 2).foreach(p =>
            pc.update((p(0), p(1)), pc.getOrElse((p(0), p(1)), 0L) + c))
        }
        if (pc.isEmpty) done = true
        else {
          val best = pc.toSeq.minBy { case ((a, b), c) => (-c, a, b) }._1
          out += best
          words = words.map { case (s, c) =>
            // re-segment via encode-like merge of one pair
            val buf = Array.newBuilder[String]
            var j = 0
            while (j < s.length) {
              if (j < s.length - 1 && s(j) == best._1 && s(j + 1) == best._2) {
                buf += s(j) + s(j + 1); j += 2
              } else { buf += s(j); j += 1 }
            }
            (buf.result(), c)
          }
          i += 1
        }
      }
      out.result()
    }
    val rnd = new scala.util.Random(23L)
    for (trial <- 0 until 5) {
      val vocab = (0 until 40).map { _ =>
        val len = 1 + rnd.nextInt(8)
        (Array.fill(len)(('a' + rnd.nextInt(4)).toChar).mkString,
          1L + rnd.nextInt(30))
      }.distinct
      assert(Bpe.train(vocab, 24) == naive(vocab, 24), s"trial $trial diverged")
    }
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

  test("bpeRoundtrip: every word reassembles; conservation legs match a driver recount") {
    val got = Bpe.bpeRoundtrip(spark, sfDir).collect()
    assert(got.length == Tables.documents(spark, sfDir).count())
    assert(got.forall(_.getAs[Boolean]("roundtrip_ok")), "a subword sequence failed to reassemble")
    // independent driver-side recount of the normalization
    val exact = Tables.documents(spark, sfDir).select("doc_id", "text")
      .collect().map { r =>
        val ws = r.getString(1).toLowerCase.trim
          .replaceAll("[^a-z0-9 \t\n\f\r]", " ")
          .replaceAll("[ \t\n\f\r]+", " ").trim
          .split(" ").filter(_.nonEmpty)
        r.getLong(0) -> (ws.length.toLong, ws.map(_.length.toLong).sum)
      }.toMap
    got.foreach { r =>
      val (nw, nc) = exact(r.getAs[Long]("doc_id"))
      assert(r.getAs[Long]("n_words") == nw, s"doc ${r.get(0)} word count")
      assert(r.getAs[Long]("n_chars_norm") == nc, s"doc ${r.get(0)} char mass")
    }
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
