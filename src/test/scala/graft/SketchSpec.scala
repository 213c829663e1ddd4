package graft

import graft.operators.{Skew, Warehouse}
import org.apache.spark.sql.functions._

/** Sketch accuracy envelope: at 100 TB the exact
  * percentile/countDistinct queries (q_percentiles, q_distinct_keys,
  * saltedDistinctCount) have approximate duals — HLL++ and KLL-style
  * quantile sketches — that trade a bounded error for one-pass merge-
  * able state. These tests pin that the approximate answers stay
  * inside the advertised envelope on real data, so the swap is safe
  * when exactness stops being worth a shuffle.
  */
class SketchSpec extends SparkSuite {

  test("sourceOverlapHll stays inside the inclusion-exclusion envelope") {
    import graft.operators.Dedup
    val got = Dedup.sourceOverlapHll(spark, sfDir).collect()
    assert(got.nonEmpty)
    // exact distinct-content sets per source, driver-side
    val bySource = Tables.documents(spark, sfDir)
      .select(col("source"), md5(col("text").cast("binary")).as("fp"))
      .collect().map(r => (r.getString(0), r.getString(1)))
      .groupBy(_._1).map { case (s, g) => s -> g.map(_._2).toSet }
    val rsd = 0.01
    got.foreach { r =>
      val (a, b) = (r.getString(0), r.getString(1))
      assert(a < b, "pairs are ordered and unique")
      val (sa, sb) = (bySource(a), bySource(b))
      // each sketch term is within ~3σ of its exact cardinality
      assert(math.abs(r.getAs[Long]("card_a") - sa.size) <=
        math.max(3, 3 * rsd * sa.size), s"$a card")
      assert(math.abs(r.getAs[Long]("card_b") - sb.size) <=
        math.max(3, 3 * rsd * sb.size), s"$b card")
      val union = (sa ++ sb).size
      assert(math.abs(r.getAs[Long]("card_union") - union) <=
        math.max(3, 3 * rsd * union), s"$a/$b union")
      val exact = sa.intersect(sb).size
      val tol = math.max(6, 3 * rsd * (sa.size + sb.size + union))
      assert(math.abs(r.getAs[Long]("inter_est") - exact) <= tol,
        s"$a/$b inter: est ${r.getAs[Long]("inter_est")} vs exact $exact")
      assert(r.getAs[Long]("inter_est") >= 0)
    }
    val n = bySource.size
    assert(got.length == n * (n - 1) / 2, "every source pair reported")
  }

  test("sourceOverlapHllCheck: exact legs match driver sets, all verdicts true") {
    import graft.operators.Dedup
    val got = Dedup.sourceOverlapHllCheck(spark, sfDir).collect()
    assert(got.nonEmpty)
    val bySource = Tables.documents(spark, sfDir)
      .select(col("source"), md5(col("text").cast("binary")).as("fp"))
      .collect().map(r => (r.getString(0), r.getString(1)))
      .groupBy(_._1).map { case (s, g) => s -> g.map(_._2).toSet }
    val n = bySource.size
    assert(got.length == n * (n - 1) / 2, "every source pair reported")
    got.foreach { r =>
      val (sa, sb) = (bySource(r.getString(0)), bySource(r.getString(1)))
      assert(r.getAs[Long]("card_a_exact") == sa.size)
      assert(r.getAs[Long]("card_b_exact") == sb.size)
      assert(r.getAs[Long]("card_union_exact") == (sa ++ sb).size)
      assert(r.getAs[Long]("inter_exact") == sa.intersect(sb).size)
      assert(r.getAs[Boolean]("cards_ok"), s"${r.get(0)}/${r.get(1)} cards")
      assert(r.getAs[Boolean]("inter_ok"), s"${r.get(0)}/${r.get(1)} inter")
    }
  }

  test("approx_count_distinct (HLL++) within its error envelope") {
    val ev = Tables.events(spark, sfDir)
    // rsd is one standard deviation of relative error — assert 3σ
    val rsd = 0.01
    val row = ev.agg(
      countDistinct(col("value")).as("exact"),
      approx_count_distinct(col("value"), rsd).as("approx")).head
    val exact = row.getLong(0).toDouble
    val approx = row.getLong(1).toDouble
    assert(math.abs(approx - exact) / exact < 3 * rsd,
      s"exact=$exact approx=$approx")
    // and against the skew-spread exact variant per key
    val perKeyExact = Skew.saltedDistinctCount(ev, "user_id", "value")
      .agg(sum("n_distinct")).head.getLong(0)
    val perKeyDirect = ev.groupBy("user_id")
      .agg(countDistinct("value").as("n")).agg(sum("n")).head.getLong(0)
    assert(perKeyExact == perKeyDirect)
  }

  test("q_percentiles_approx returns values at the right RANK (the sketch guarantee)") {
    // approx_percentile bounds the RANK error (1/accuracy), not the
    // value error — on a heavy tail a tiny rank slip at p99 can move
    // the value by several percent, so the honest pin is rank-based:
    // the fraction of values at or below the sketch answer must
    // bracket the requested quantile.
    val ev = Tables.events(spark, sfDir).filter(col("value").isNotNull)
    val approx = Warehouse.percentilesApprox(spark, sfDir).collect()
    assert(approx.nonEmpty)
    val eps = 0.005
    approx.foreach { r =>
      val et = r.getString(0)
      val slice = ev.filter(col("event_type") === et)
      val n = slice.count().toDouble
      Seq("p50" -> 0.5, "p90" -> 0.9, "p99" -> 0.99).foreach { case (c, qt) =>
        val a = r.getAs[Double](c)
        val below = slice.filter(col("value") < a).count() / n
        val atOrBelow = slice.filter(col("value") <= a).count() / n
        assert(below <= qt + eps && atOrBelow >= qt - eps,
          s"$et.$c: rank window [$below, $atOrBelow] misses $qt")
      }
    }
  }

  test("q_approx_distinct tracks exact per-type user counts within 3 sigma") {
    val ev = Tables.events(spark, sfDir)
    val exact = ev.groupBy("event_type")
      .agg(countDistinct("user_id").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val approx = Warehouse.approxDistinct(spark, sfDir).collect()
    assert(approx.length == exact.size)
    approx.foreach { r =>
      val e = exact(r.getString(0)).toDouble
      val a = r.getAs[Long]("approx_users").toDouble
      assert(math.abs(a - e) / e < 0.03, s"${r.getString(0)}: exact=$e approx=$a")
    }
  }

  test("approx_percentile within 1% relative error of exact percentiles") {
    val ev = Tables.events(spark, sfDir)
    val exact = Warehouse.percentiles(spark, sfDir).collect()
      .map(r => r.getAs[String]("event_type") -> r.getAs[Double]("p50")).toMap
    val approx = ev.groupBy("event_type")
      .agg(percentile_approx(col("value"), lit(0.5), lit(10000)).as("p50"))
      .collect()
      .map(r => r.getAs[String]("event_type") -> r.getAs[Double]("p50")).toMap
    exact.foreach { case (k, e) =>
      val a = approx(k)
      assert(math.abs(a - e) / math.max(math.abs(e), 1e-9) < 0.01,
        s"$k: exact=$e approx=$a")
    }
  }

  test("heavy hitters: CMS never undercounts and stays inside eps*N") {
    import org.apache.spark.sql.functions._
    val eps = 1e-4
    val got = graft.operators.TextOps.heavyHitters(spark, sfDir, k = 50, eps = eps).collect()
    // the sf0.001 vocabulary is smaller than k — the report covers it
    assert(got.nonEmpty && got.length <= 50)
    val total = got.head.getAs[Long]("n_words")
    got.foreach { r =>
      val exact = r.getAs[Long]("freq")
      val est = r.getAs[Long]("cms_estimate")
      assert(est >= exact,
        s"CMS undercounted '${r.getString(0)}': $est < $exact")
      assert(est <= exact + (eps * total).toLong,
        s"'${r.getString(0)}' overestimate ${est - exact} beyond eps*N")
    }
    // the exact leg agrees with q_word_freq's ranking on the shared
    // tokenization (same split, same tie-break)
    val wf = graft.operators.TextOps.wordFreq(spark, sfDir)
      .limit(got.length).collect()
      .map(r => (r.getString(0), r.getAs[Long]("freq")))
    assert(got.map(r => (r.getString(0), r.getAs[Long]("freq"))).toSeq ==
      wf.toSeq)
    // deterministic: fixed seed, fixed grid
    val again = graft.operators.TextOps.heavyHitters(spark, sfDir, k = 50, eps = eps).collect()
    assert(got.map(_.toString).sameElements(again.map(_.toString)))
  }

  test("Misra-Gries summary: never overcounts, bounded gap, no false negatives") {
    val k = 64
    val got = graft.operators.TextOps.heavyHittersMg(spark, sfDir, k).collect()
    assert(got.nonEmpty)
    val total = got.head.getAs[Long]("n_words")
    val retained = got.map(_.getAs[Long]("mg_estimate")).sum
    got.foreach { r =>
      val freq = r.getAs[Long]("freq")
      val est = r.getAs[Long]("mg_estimate")
      assert(est >= 1L && est <= freq,
        s"'${r.getString(0)}' MG estimate $est outside (0, $freq]")
      // the mergeable-summary guarantee, exact-rational form
      assert((freq - est) * (k + 1).toLong <= total - retained,
        s"'${r.getString(0)}' gap ${freq - est} breaks the MG bound")
    }
    // no false negatives: every word heavier than the bound is present
    val bound = (total - retained) / (k + 1).toLong
    val present = got.map(_.getString(0)).toSet
    graft.operators.TextOps.wordFreq(spark, sfDir).collect()
      .filter(_.getAs[Long]("freq") > bound)
      .foreach(r => assert(present(r.getString(0)),
        s"heavy word '${r.getString(0)}' missing from the MG summary"))
    // deterministic (value arithmetic + partition row order only)
    val again = graft.operators.TextOps.heavyHittersMg(spark, sfDir, k).collect()
    assert(got.map(_.toString).sameElements(again.map(_.toString)))
  }

  test("Misra-Gries survives a skew-planted corpus with a tight estimate") {
    import spark.implicits._
    // one word owns half the mass; a long tail forces real decrements
    val docs = ((1 to 4000).map(i => (i.toLong, "heavy")) ++
      (1 to 4000).map(i => (4000L + i, s"tail$i")))
      .toDF("doc_id", "text")
    val got = graft.operators.TextOps.heavyHittersMgDocs(docs, k = 8)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(got.contains("heavy"), "the dominant word must survive")
    val h = got("heavy")
    assert(h.getAs[Long]("freq") == 4000L)
    // est >= freq - (N - M)/(k+1) — with half the mass on one word the
    // estimate stays within the bound of the true count
    assert((h.getAs[Long]("freq") - h.getAs[Long]("mg_estimate")) *
      9L <= 8000L - got.values.map(_.getAs[Long]("mg_estimate")).sum)
  }
}
