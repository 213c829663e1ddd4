package graft

import org.apache.spark.sql.functions._

/** Randomized cross-check of the fused [[graft.functions.PairCorr]]
  * merge against a driver-side reference Pearson over explicit common
  * positions — exercises disjoint/sparse/total overlaps, zero
  * variance, the minDays boundary, and null slots (skipped by
  * contract) that the fixed correlation specs can't cover. The
  * reference accumulates the SAME six moments in the SAME index order
  * with the same IEEE754 operations, so the comparison is bit-exact,
  * not epsilon-based.
  */
class PairCorrPropertySpec extends SparkSuite {
  import spark.implicits._

  /** Random strictly-increasing index array with values; ~p of the
    * index space retained, so overlap between two draws varies from
    * near-empty to near-total.
    */
  private def randomSeries(rnd: scala.util.Random, span: Int,
      p: Double, constant: Boolean): (Seq[Int], Seq[Double]) = {
    val idx = (0 until span).filter(_ => rnd.nextDouble() < p)
    val v = if (constant) idx.map(_ => 1.5)
      else idx.map(_ => rnd.nextDouble() * 4 - 2)
    (idx, v)
  }

  private def reference(aIdx: Seq[Int], aVal: Seq[Double],
      bIdx: Seq[Int], bVal: Seq[Double], minDays: Int): Option[(Double, Double)] = {
    val bPos = bIdx.zipWithIndex.toMap
    var n = 0.0; var sx = 0.0; var sy = 0.0
    var sxx = 0.0; var syy = 0.0; var sxy = 0.0
    aIdx.indices.foreach { i =>
      bPos.get(aIdx(i)).foreach { j =>
        val x = aVal(i); val y = bVal(j)
        n += 1.0; sx += x; sy += y
        sxx += x * x; syy += y * y; sxy += x * y
      }
    }
    if (n < minDays) None
    else {
      val cden = math.sqrt((sxx - sx * sx / n) * (syy - sy * sy / n))
      if (!(cden > 0)) None
      else Some((n, (sxy - sx * sy / n) / cden))
    }
  }

  test("pair_corr equals a driver-side reference merge on random series") {
    val minDays = 5
    val rows = (1L to 200L).map { seed =>
      val rnd = new scala.util.Random(seed)
      val span = 10 + rnd.nextInt(60)
      val (ai, av) = randomSeries(rnd, span, 0.2 + rnd.nextDouble() * 0.7,
        constant = seed % 11 == 0)
      val (bi, bv) = randomSeries(rnd, span, 0.2 + rnd.nextDouble() * 0.7,
        constant = seed % 13 == 0)
      (seed, ai, av, bi, bv)
    }
    val got = rows.toDF("seed", "ai", "av", "bi", "bv")
      .withColumn("pc", graft.functions.PairCorr.pair_corr(
        col("ai"), col("av"), col("bi"), col("bv"), minDays))
      .select(col("seed"), col("pc"))
      .collect()
      .map(r => r.getLong(0) ->
        Option(r.getSeq[Double](1)).map(s => (s(0), s(1)))).toMap
    rows.foreach { case (seed, ai, av, bi, bv) =>
      val exp = reference(ai, av, bi, bv, minDays)
      assert(got(seed) == exp,
        s"seed=$seed: got ${got(seed)}, reference $exp")
    }
  }

  test("pair_corr skips null slots on either side, per the contract") {
    // series with nullable values: a null slot contributes nothing —
    // the result must equal the same series with those slots REMOVED
    val ai = Seq(1, 2, 3, 4, 5, 6, 7)
    val av: Seq[java.lang.Double] =
      Seq(0.5, null, 1.0, -0.5, null, 2.0, 0.25)
    val bi = Seq(1, 2, 3, 4, 5, 6, 7)
    val bv: Seq[java.lang.Double] =
      Seq(1.0, 0.5, null, -1.0, 0.75, 1.5, -0.25)
    val withNulls = Seq((ai, av, bi, bv))
      .toDF("ai", "av", "bi", "bv")
      .select(graft.functions.PairCorr.pair_corr(
        col("ai"), col("av"), col("bi"), col("bv"), 2).as("pc"))
      .head.getSeq[Double](0)
    // dense equivalent: drop slot k from a side when ITS value is
    // null (the merge advances past the null slot, so the other
    // side's same-index entry simply finds no partner)
    val aKeep = ai.indices.filter(av(_) != null)
    val bKeep = bi.indices.filter(bv(_) != null)
    val dense = Seq((aKeep.map(ai), aKeep.map(av(_).doubleValue()),
        bKeep.map(bi), bKeep.map(bv(_).doubleValue())))
      .toDF("ai", "av", "bi", "bv")
      .select(graft.functions.PairCorr.pair_corr(
        col("ai"), col("av"), col("bi"), col("bv"), 2).as("pc"))
      .head.getSeq[Double](0)
    assert(withNulls == dense,
      s"null slots not skipped: $withNulls vs $dense")
    // and the overlap is what the skip rule predicts: indices
    // {1,4,6,7} have non-null values on BOTH sides
    assert(withNulls.head == 4.0)
  }
}
