package graft

import graft.operators.Dedup
import org.apache.spark.sql.functions._

/** Edit-distance dedup (q_dedup_edit): blocking behavior, exact
  * distances, the block-size cap, and the distance bound, on planted
  * corpora.
  */
class EditDedupSpec extends SparkSuite {
  import spark.implicits._

  private val prefix = "shared thirty-two char prefix!!!" // exactly 32
  assert(prefix.length == 32)

  private def frame(rows: (Long, String)*) =
    rows.map { case (id, t) => (id, t, "en", "src", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")

  test("pairs within a block carry the exact Levenshtein distance") {
    val docs = frame(
      (1, prefix + " the quick brown fox jumps over"),
      (2, prefix + " the quick brown fax jumps over"), // 1 substitution
      (3, prefix + " the quick brown fox jumps ove")) // 1 deletion vs 1
    val got = Dedup.editDedupDocs(docs)
      .select("doc_a", "doc_b", "edit_dist").as[(Long, Long, Long)]
      .collect().toSet
    assert(got == Set((1L, 2L, 1L), (1L, 3L, 1L), (2L, 3L, 2L)))
  }

  test("a head-of-document edit falls outside the block (documented miss)") {
    val docs = frame(
      (1, prefix + " same tail"),
      (2, "X" + prefix.drop(1) + " same tail")) // first char differs
    assert(Dedup.editDedupDocs(docs).count() == 0)
  }

  test("blocks over the cap are dropped as boilerplate") {
    val big = (1L to (Dedup.EditBlockCap + 1L))
      .map(i => (i, prefix + s" body $i"))
    assert(Dedup.editDedupDocs(frame(big: _*)).count() == 0)
    val atCap = big.take(Dedup.EditBlockCap)
    val n = Dedup.EditBlockCap.toLong
    assert(Dedup.editDedupDocs(frame(atCap: _*)).count() == n * (n - 1) / 2)
  }

  test("every emitted pair carries the over-cap excluded-mass ledger") {
    val boiler = "boilerplate prefix, 32 chars ok!" // exactly 32
    assert(boiler.length == 32)
    // one healthy block (2 docs → 1 pair) + one over-cap block whose
    // docs are silently excluded from pairing
    val overN = Dedup.EditBlockCap + 3
    val docs = frame(
      (Seq(
        (1L, prefix + " alpha beta gamma"),
        (2L, prefix + " alpha beta gamm")) ++
        (10L until (10L + overN)).map(i => (i, boiler + s" filler $i"))
      ): _*)
    val got = Dedup.editDedupDocs(docs).collect()
    assert(got.length == 1, "only the healthy block pairs")
    assert(got.head.getAs[Long]("n_overcap_blocks") == 1L)
    assert(got.head.getAs[Long]("n_overcap_docs") == overN.toLong)
    // with nothing excluded the ledger reads zero, not null
    val clean = Dedup.editDedupDocs(frame(
      (1, prefix + " alpha beta gamma"),
      (2, prefix + " alpha beta gamm"))).collect()
    assert(clean.head.getAs[Long]("n_overcap_blocks") == 0L)
    assert(clean.head.getAs[Long]("n_overcap_docs") == 0L)
  }

  test("scorecard masses equal the standalone families' flag sets") {
    // a corpus that lights up every channel: d2 = exact copy of d1,
    // d3 = one tail edit, d4 = a line-subset of d1
    val base = prefix + " one two three four five six seven eight nine" +
      "\nline two of the doc\nline three of the doc\nline four tail"
    val docs = frame(
      (1, base),
      (2, base), // exact dup
      (3, base.replace("nine", "wine")), // tail edit, same 32-prefix
      (4, "line two of the doc\nline three of the doc")) // line subset
    val card = Dedup.dedupScorecardDocs(docs).collect()
    assert(card.length == 1)
    val row = card.head

    val exactIds = docs.select("doc_id", "text").as[(Long, String)]
      .collect().groupBy(_._2).values
      .flatMap(g => g.map(_._1).sorted.drop(1)).toSet
    val editIds = Dedup.editDedupDocs(docs)
      .select("doc_b").as[Long].collect().toSet
    val ct = Dedup.containmentDocs(docs).cache()
    val subsetIds =
      ct.filter($"cont_a" >= 0.8).select("doc_a").as[Long].collect().toSet ++
      ct.filter($"cont_b" >= 0.8).select("doc_b").as[Long].collect().toSet
    val lineIds = graft.operators.Curation.lineDedupDocs(docs)
      .filter($"n_lines" > 0 && $"n_kept" * 2 <= $"n_lines")
      .select("doc_id").as[Long].collect().toSet

    assert(exactIds == Set(2L)) // the copy, never the original
    assert(row.getAs[Long]("n_docs") == 4L)
    assert(row.getAs[Long]("n_exact") == exactIds.size)
    assert(row.getAs[Long]("n_edit") == editIds.size)
    assert(row.getAs[Long]("n_subset") == subsetIds.size)
    assert(row.getAs[Long]("n_line_heavy") == lineIds.size)
    val anyIds = exactIds ++ editIds ++ subsetIds
    assert(row.getAs[Long]("n_any") == anyIds.size)
    val (s, n) = (anyIds.size.toLong, 4L)
    assert(row.getAs[Long]("dup_ppm") == (2 * 1000000 * s + n) / (2 * n))
    // the channels are genuinely distinct on this corpus
    assert(editIds.nonEmpty && subsetIds.nonEmpty && lineIds.nonEmpty)
  }

  test("pairs beyond EditMax are excluded; doc_a < doc_b everywhere") {
    val far = Seq.fill(40)("zzzz").mkString(" ") // distance >> 32
    val docs = frame(
      (7, prefix + " alpha beta gamma"),
      (3, prefix + " alpha beta gamm"), // close pair, ids out of order
      (5, prefix + " " + far))
    val got = Dedup.editDedupDocs(docs)
      .select("doc_a", "doc_b", "edit_dist").as[(Long, Long, Long)]
      .collect()
    assert(got.toSet == Set((3L, 7L, 1L)))
    got.foreach { case (a, b, _) => assert(a < b) }
  }
}
