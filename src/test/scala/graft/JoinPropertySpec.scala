package graft

import java.sql.Timestamp

import graft.operators.{AsofJoin, RangeJoin}

/** Randomized cross-checks of the distributed join operators against
  * brute-force scans — exercises tie timestamps, band-edge values,
  * keys with empty sides, and duplicate right rows that the fixed
  * specs can't cover.
  */
class JoinPropertySpec extends SparkSuite {
  import spark.implicits._

  private def ts(s: Double) = new Timestamp((s * 1000).toLong)

  /** Random (user, ts-seconds, id) rows with deliberate collisions:
    * coarse time grid so cross-side ties and band edges happen often.
    */
  private def randomRows(seed: Long, n: Int, users: Int): Seq[(Long, Double, Long)] = {
    val rnd = new scala.util.Random(seed)
    (0 until n).map { i =>
      val u = 1L + rnd.nextInt(users)
      val t = rnd.nextInt(50) * 30.0 // 30s grid over 25 min
      (u, t, 1000L + i)
    }
  }

  test("asofJoin matches brute force on random collision-heavy data") {
    for (seed <- 1L to 5L) {
      val lRows = randomRows(seed, 60, 4)
      // right side unique per (user, ts): keep max id like the driver query
      val rRows = randomRows(seed + 100, 40, 4)
        .groupBy(r => (r._1, r._2)).map(_._2.maxBy(_._3)).toSeq
      val left = lRows.map { case (u, t, id) => (u, ts(t), id) }
        .toDF("user_id", "t", "l_id")
      val right = rRows.map { case (u, t, id) => (u, ts(t), id) }
        .toDF("user_id", "t", "r_id")
      val got = AsofJoin.asofJoin(left, right, Seq("user_id"), "t", Seq("r_id"))
        .collect()
        .map(r => r.getAs[Long]("l_id") ->
          Option(r.getAs[java.lang.Long]("r_r_id")).map(_.longValue())).toMap
      val expected = lRows.map { case (u, t, id) =>
        val cand = rRows.filter(r => r._1 == u && r._2 <= t)
        id -> (if (cand.isEmpty) None else Some(cand.maxBy(r => (r._2, r._3))._3))
      }.toMap
      assert(got == expected, s"asof mismatch at seed=$seed")
    }
  }

  test("rangeJoin matches brute force on random band-edge-heavy data") {
    val window = 120.0 // 4 grid steps → both-edges-inclusive cases occur
    for (seed <- 1L to 5L) {
      val lRows = randomRows(seed, 50, 3)
      val rRows = randomRows(seed + 200, 50, 3)
      val left = lRows.map { case (u, t, id) => (u, ts(t), id) }
        .toDF("user_id", "t", "l_id")
      val right = rRows.map { case (u, t, id) => (u, ts(t), id) }
        .toDF("user_id", "t", "r_id")
      val got = RangeJoin.rangeJoin(left, right, Seq("user_id"), "t",
        window, Seq("r_id"))
        .select("l_id", "r_r_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val expected = (for {
        (lu, lt, lid) <- lRows
        (ru, rt, rid) <- rRows
        if lu == ru && rt >= lt && rt <= lt + window
      } yield (lid, rid)).toSet
      assert(got == expected,
        s"range mismatch at seed=$seed: missing=${expected -- got} extra=${got -- expected}")
    }
  }

  test("joins behave on degenerate inputs: empty sides, single key") {
    val left = Seq((1L, ts(10), 1L)).toDF("user_id", "t", "l_id")
    val empty = Seq.empty[(Long, Timestamp, Long)].toDF("user_id", "t", "r_id")
    assert(AsofJoin.asofJoin(left, empty, Seq("user_id"), "t", Seq("r_id"))
      .collect().map(_.getAs[Any]("r_r_id")).sameElements(Array(null)))
    assert(RangeJoin.rangeJoin(left, empty, Seq("user_id"), "t", 60.0, Seq("r_id"))
      .count() == 0)
    assert(AsofJoin.asofJoin(empty.toDF("user_id", "t", "l_id"), left
      .toDF("user_id", "t", "r_id"), Seq("user_id"), "t", Seq("r_id")).count() == 0)
  }
}
