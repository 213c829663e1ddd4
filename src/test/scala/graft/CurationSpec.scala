package graft

import graft.operators.Curation
import org.apache.spark.sql.functions._

class CurationSpec extends SparkSuite {

  test("gopherFilters fractions are in [0,1] and verdict matches thresholds") {
    val rows = Curation.gopherFilters(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val dup = r.getDouble(r.fieldIndex("dup_sentence_frac"))
      val top = r.getDouble(r.fieldIndex("top_word_frac"))
      assert(dup >= 0.0 && dup <= 1.0)
      assert(top > 0.0 && top <= 1.0)
      assert(r.getBoolean(r.fieldIndex("keep_doc")) == (dup <= 0.30 && top <= 0.20))
    }
  }

  test("decontaminate only flags docs that genuinely share an 8-gram") {
    val flagged = Curation.decontaminate(spark, sfDir)
    val rows = flagged.collect()
    rows.foreach(r => assert(r.getLong(r.fieldIndex("n_shared_ngrams")) >= 1))
    // no eval doc may appear in the output, and every flagged id is corpus-side
    assert(rows.forall(_.getLong(0) >= 10L))
    // cross-check one flagged doc by direct recomputation
    if (rows.nonEmpty) {
      val docId = rows.head.getLong(0)
      val texts = Tables.documents(spark, sfDir)
        .filter(col("doc_id") < 10 || col("doc_id") === docId)
        .select("doc_id", "text").collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
      def grams(t: String): Set[String] = {
        val ws = t.toLowerCase.replaceAll("[^a-z0-9\\s]", " ")
          .trim.split("\\s+").filter(_.nonEmpty)
        ws.sliding(8).filter(_.length == 8).map(_.mkString(" ")).toSet
      }
      val evalGrams = (0L until 10L).flatMap(i => texts.get(i).map(grams).getOrElse(Set.empty)).toSet
      val shared = grams(texts(docId)) & evalGrams
      assert(shared.size == rows.head.getLong(rows.head.fieldIndex("n_shared_ngrams")),
        s"doc $docId: recomputed overlap ${shared.size} != reported")
    }
  }

  test("packSequences offsets are contiguous and consistent with the budget") {
    val rows = Curation.packSequences(spark, sfDir).collect()
    assert(rows.length == Tables.documents(spark, sfDir).count())
    var expectedStart = 0L
    rows.foreach { r =>
      val n = r.getLong(r.fieldIndex("n_tokens"))
      val start = r.getLong(r.fieldIndex("start_offset"))
      assert(start == expectedStart, s"doc ${r.getLong(0)}: gap in packing")
      assert(r.getLong(r.fieldIndex("seq_id")) == start / 2048)
      assert(r.getLong(r.fieldIndex("offset_in_seq")) == start % 2048)
      assert(n > 0)
      expectedStart += n
    }
    // the distributed prefix sum equals a single-threaded scan by
    // construction of expectedStart above; also pin determinism
    val again = Curation.packSequences(spark, sfDir).collect()
    assert(rows.map(_.toString).sameElements(again.map(_.toString)))
  }

  test("narrow per-row gopher formulation equals the aggregation shape exactly") {
    val agg = Curation.gopherFilters(spark, sfDir)
    val narrow = Curation.gopherNarrowDocs(Tables.documents(spark, sfDir))
    assert(agg.exceptAll(narrow).count() == 0)
    assert(narrow.exceptAll(agg).count() == 0)
  }

  test("redactPii scrubs urls, emails, and ssn-shaped numbers") {
    import spark.implicits._
    val df = Seq(
      (1L, "mail me at jane.doe+x@corp.example.com today"),
      (2L, "see https://example.com/a?b=c&d=e for details"),
      (3L, "ssn 123-45-6789 leaked"),
      (4L, "url with mail https://ex.com/u/bob@ex.com trailing"),
      (5L, "nothing sensitive here")).toDF("doc_id", "text")
    val out = df.select(col("doc_id"),
      graft.operators.Curation.redactPii(col("text")).as("clean"),
      graft.operators.Curation.piiCount(col("text")).as("n"))
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    assert(out(1)._1 == "mail me at <REDACTED> today" && out(1)._2 == 1)
    assert(out(2)._1 == "see <REDACTED> for details" && out(2)._2 == 1)
    assert(out(3)._1 == "ssn <REDACTED> leaked" && out(3)._2 == 1)
    // the url (redacted first) swallows the embedded email; the count
    // is per-pattern on the original text, so it reports 2
    assert(out(4)._1 == "url with mail <REDACTED> trailing" && out(4)._2 == 2)
    assert(out(5)._1 == "nothing sensitive here" && out(5)._2 == 0)
  }

  test("q_redact_pii leaves the pii-free synthetic corpus intact") {
    val rows = graft.operators.Curation.redactPiiDocs(spark, sfDir).collect()
    assert(rows.length == Tables.documents(spark, sfDir).count())
    assert(rows.forall(_.getLong(2) == 0L), "synthetic corpus must be pii-free")
  }

  test("stratifiedSample is deterministic and hits per-stratum rates") {
    val a = Curation.stratifiedSample(spark, sfDir).collect()
    val b = Curation.stratifiedSample(spark, sfDir).collect()
    assert(a.map(_.toString).sameElements(b.map(_.toString)), "nondeterministic")
    val total = Tables.documents(spark, sfDir)
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val sampled = a.groupBy(_.getString(1)).view.mapValues(_.length.toLong).toMap
    val targets = Map("en" -> 0.30, "fr" -> 0.50, "es" -> 0.50, "de" -> 0.50, "zh" -> 0.80)
    targets.foreach { case (lang, rate) =>
      val frac = sampled.getOrElse(lang, 0L).toDouble / total(lang)
      // multiplicative-hash selection over uniform synthetic ids:
      // generous tolerance at small strata (~64-220 docs at sf0.01)
      assert(math.abs(frac - rate) < 0.15, s"$lang sampled $frac, target $rate")
    }
  }
}
