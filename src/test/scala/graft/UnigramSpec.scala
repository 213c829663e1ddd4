package graft

import graft.operators.{Bpe, Unigram}
import org.apache.spark.sql.functions._

class UnigramSpec extends SparkSuite {

  private def corpusCounts: Seq[(String, Long)] = {
    import spark.implicits._
    Bpe.wordCounts(Tables.documents(spark, sfDir))
      .orderBy(col("cnt").desc, col("word"))
      .as[(String, Long)].collect().toSeq
      .sortBy { case (w, c) => (-c, w) }
  }

  test("EM log-likelihood is monotone within each phase") {
    val (_, ll) = Unigram.train(corpusCounts)
    assert(ll.length == 4, s"2 EM iters before + after the prune: $ll")
    // within a phase EM cannot decrease the likelihood (the 1e-12
    // zero-mass floor in the M-step perturbs exactness negligibly);
    // across the prune boundary a drop is expected and allowed
    assert(ll(1) >= ll(0) - 1e-6, s"seed phase decreased: $ll")
    assert(ll(3) >= ll(2) - 1e-6, s"pruned phase decreased: $ll")
    assert(ll.forall(v => v.isFinite && v < 0), s"log-likelihoods sane: $ll")
  }

  test("training is deterministic") {
    val (m1, ll1) = Unigram.train(corpusCounts)
    val (m2, ll2) = Unigram.train(corpusCounts)
    assert(m1.logp == m2.logp && ll1 == ll2)
  }

  test("Viterbi equals the exhaustive best segmentation on short words") {
    val (m, _) = Unigram.train(corpusCounts)
    def allSegs(w: String): Seq[Seq[String]] =
      if (w.isEmpty) Seq(Seq.empty)
      else (1 to math.min(w.length, 6)).flatMap { k =>
        val (h, t) = w.splitAt(k)
        if (m.logp.contains(h)) allSegs(t).map(h +: _) else Seq.empty
      }
    val words = corpusCounts.map(_._1).filter(_.length <= 8).take(40)
    assert(words.nonEmpty)
    words.foreach { w =>
      val vit = Unigram.encodeWord(w, m)
      val vs = Unigram.score(vit.toSeq, m)
      val exhaustive = allSegs(w).map(s => Unigram.score(s, m)).max
      assert(math.abs(vs - exhaustive) < 1e-9,
        s"'$w': viterbi $vs != exhaustive best $exhaustive")
      assert(vit.mkString("") == w, s"'$w' roundtrip")
    }
  }

  test("gate booleans hold corpus-wide and word/char masses are conserved") {
    val rows = Unigram.unigramGate(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getBoolean(r.fieldIndex("roundtrip_ok")), s"doc ${r.getLong(0)}")
      assert(r.getBoolean(r.fieldIndex("viterbi_opt_ok")), s"doc ${r.getLong(0)}")
    }
  }

  test("tokenizeDocs emits pieces for every wordful doc; unigram is no more fertile than chars") {
    val toks = Unigram.tokenizeDocs(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r).toMap
    val gate = Unigram.unigramGate(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(toks.keySet == gate.keySet)
    toks.foreach { case (id, r) =>
      val g = gate(id)
      val nW = g.getLong(g.fieldIndex("n_words"))
      val nC = g.getLong(g.fieldIndex("n_chars_norm"))
      val nP = r.getLong(r.fieldIndex("n_pieces"))
      assert(nP >= nW && nP <= nC, s"doc $id: $nW words <= $nP pieces <= $nC chars")
      if (nP > 0) {
        val lp = r.getDouble(r.fieldIndex("mean_piece_logp"))
        assert(lp < 0 && lp.isFinite, s"doc $id mean logp $lp")
        assert(r.getString(r.fieldIndex("piece_preview")).nonEmpty)
      }
    }
  }
}
