package graft

import graft.operators.Preference
import org.apache.spark.sql.functions._

/** Preference-pair mining (q_pref_pairs / q_pref_stats): pairing
  * structure, margin gating, and the length-bias audit on a corpus
  * whose quality order is constructed by hand.
  */
class PreferenceSpec extends SparkSuite {
  import spark.implicits._

  // quality_score is 0.4·min(words/100,1) + 0.3·min(stop·5,1)
  // + 0.3·(1−min(punct·10,1)); all-stopword long docs score high,
  // punct-heavy short docs score low — build a 5-doc source whose
  // rank order is unambiguous and a 4-doc source with one near-tie.
  private def doc(id: Long, src: String, words: Int, junk: Boolean) = {
    val body =
      if (junk) Seq.fill(words)("x;;!?").mkString(" ")
      else Seq.fill(words)("the and of to a in is").mkString(" ")
    (id, body, "en", src, body.length.toLong)
  }

  private lazy val docs = Seq(
    doc(1, "a", 40, junk = false), // high: long, stopwords, clean
    doc(2, "a", 20, junk = false),
    doc(3, "a", 8, junk = false),
    doc(4, "a", 6, junk = true), // junk: punct-saturated
    doc(5, "a", 2, junk = true), // worst
    // b is a two-doc group of EQUAL saturated quality (both clear the
    // 100-word length cap, all stopwords, zero punct): its one pair
    // (rank 1 → rank 2, id-tiebroken) is the exact tie the margin
    // floor must reject
    doc(6, "b", 30, junk = false),
    doc(7, "b", 29, junk = false),
    (10L, "solo doc", "en", "c", 8L) // singleton source: no pairs
  ).toDF("doc_id", "text", "lang", "source", "n_chars")

  private lazy val pairs = Preference.prefPairsDocs(docs).cache()

  test("median-offset pairing: n − ⌊n/2⌋ pairs per source, singletons dropped") {
    val bySrc = pairs.groupBy("source").count().as[(String, Long)]
      .collect().toMap
    assert(bySrc == Map("a" -> 3L, "b" -> 1L)) // 5−2=3, 2−1=1; c absent
  }

  test("each doc appears at most once per side and never self-pairs") {
    val chosen = pairs.select("chosen_id").as[Long].collect()
    val rejected = pairs.select("rejected_id").as[Long].collect()
    assert(chosen.distinct.length == chosen.length)
    assert(rejected.distinct.length == rejected.length)
    assert(pairs.filter($"chosen_id" === $"rejected_id").count() == 0)
  }

  test("pairs contrast the quality halves: chosen_q > rejected_q on clean-vs-junk") {
    // source a: ranks (1,2,3) pair with (3+offset)=(4,5) shifted by ⌊5/2⌋=2
    val a = pairs.filter($"source" === "a")
      .select("chosen_id", "rejected_id").as[(Long, Long)].collect().toSet
    assert(a == Set((1L, 3L), (2L, 4L), (3L, 5L)))
    assert(pairs.filter($"source" === "a" && !($"chosen_q" > $"rejected_q"))
      .count() == 0)
  }

  test("margin floor gates near-ties: accepted ⇔ margin ≥ 0.05") {
    val m = pairs.select($"margin", $"accepted").as[(Double, Boolean)]
      .collect()
    assert(m.nonEmpty)
    m.foreach { case (margin, acc) => assert(acc == (margin >= 0.05)) }
    // the b-source pair is an exact quality tie (margin 0) — rejected
    val tie = pairs.filter($"source" === "b")
    assert(tie.count() == 1)
    val t = tie.select("chosen_id", "margin", "accepted")
      .as[(Long, Double, Boolean)].head()
    assert(t == ((6L, 0.0, false)))
  }

  test("stats audit: counts, exact mean margin, length-bias rate") {
    val stats = Preference.prefStatsPairs(pairs)
    val row = stats.filter($"source" === "a").collect().head
    val accA = pairs.filter($"source" === "a" && $"accepted")
      .select("margin", "chosen_chars", "rejected_chars")
      .as[(Double, Long, Long)].collect()
    assert(row.getAs[Long]("n_pairs") == accA.length)
    // replicate the impl's exact-addition path: margins cast to
    // DECIMAL(28,14), summed, back to double, divided, rounded to 8
    val sumDec = accA.map(t => BigDecimal(t._1)
      .setScale(14, BigDecimal.RoundingMode.HALF_UP)).sum
    val meanM = BigDecimal.valueOf(sumDec.toDouble / accA.length)
      .setScale(8, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(math.abs(row.getAs[Double]("mean_margin") - meanM) < 1e-9)
    // clean docs are longer than junk here — the audit must read 1.0
    assert(row.getAs[Double]("len_bias_rate") == 1.0)
    // a source with zero accepted pairs contributes no stats row
    assert(stats.filter($"source" === "c").count() == 0)
  }
}
