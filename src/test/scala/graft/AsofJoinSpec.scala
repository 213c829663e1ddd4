package graft

import java.sql.Timestamp

import graft.operators.AsofJoin
import org.apache.spark.sql.functions._

class AsofJoinSpec extends SparkSuite {

  private def ts(s: Long) = new Timestamp(s * 1000L)

  test("asofJoin picks latest at-or-before right row, inclusive on ties") {
    import spark.implicits._
    val left = Seq(
      (1L, ts(10), 100L), // after right@5 → matches 5
      (1L, ts(20), 101L), // exactly at right@20 → inclusive match
      (1L, ts(3), 102L),  // before any right row → nulls
      (2L, ts(50), 103L)  // user with no right rows at all → nulls
    ).toDF("user_id", "t", "event_id")
    val right = Seq(
      (1L, ts(5), 7.0),
      (1L, ts(20), 8.0),
      (1L, ts(30), 9.0) // in the future of every left row
    ).toDF("user_id", "t", "price")

    val out = AsofJoin.asofJoin(left, right, Seq("user_id"), "t", Seq("price"))
      .orderBy("event_id")
      .collect()

    assert(out.length == 4)
    val byId = out.map(r => r.getAs[Long]("event_id") -> r).toMap
    assert(byId(100L).getAs[Timestamp]("r_t") == ts(5))
    assert(byId(100L).getAs[Double]("r_price") == 7.0)
    assert(byId(101L).getAs[Timestamp]("r_t") == ts(20))
    assert(byId(101L).getAs[Double]("r_price") == 8.0)
    assert(byId(102L).getAs[Timestamp]("r_t") == null)
    assert(byId(103L).getAs[Timestamp]("r_t") == null)
  }

  test("viewToPurchase: every purchase ts is at-or-before its view ts") {
    val out = AsofJoin.viewToPurchase(spark, sfDir)
    assert(out.count() > 0)
    assert(out.filter(col("p_ts") > col("ts")).count() == 0)
    assert(out.filter(col("p_ts").isNotNull && col("secs_since_purchase") < 0)
      .count() == 0)
  }

  test("viewToPurchase matches a per-user brute-force scan") {
    val ev = operators.Warehouse.validTicks(spark, sfDir).collect()
    val views = ev.filter(_.getAs[String]("event_type") == "view")
    val purchases = ev.filter(_.getAs[String]("event_type") == "purchase")
      .groupBy(r => (r.getAs[Long]("user_id"), r.getAs[Timestamp]("ts")))
      .map { case (_, rs) => rs.maxBy(_.getAs[Long]("event_id")) }
      .toSeq
    val expected = views.map { v =>
      val u = v.getAs[Long]("user_id")
      val t = v.getAs[Timestamp]("ts")
      val cand = purchases
        .filter(p => p.getAs[Long]("user_id") == u && !p.getAs[Timestamp]("ts").after(t))
      val best = if (cand.isEmpty) None
        else Some(cand.maxBy(p => (p.getAs[Timestamp]("ts").getTime,
          p.getAs[Long]("event_id"))))
      v.getAs[Long]("event_id") -> best.map(_.getAs[Long]("event_id"))
    }.toMap
    val got = AsofJoin.viewToPurchase(spark, sfDir).collect()
    assert(got.length == expected.size)
    got.foreach { r =>
      val want = expected(r.getAs[Long]("event_id"))
      val have = Option(r.getAs[java.lang.Long]("p_event_id")).map(_.longValue())
      assert(have == want, s"event ${r.getAs[Long]("event_id")}")
    }
  }

  test("asofJoin plan shuffles once on the key") {
    import spark.implicits._
    val left = Seq((1L, ts(10), 1.0)).toDF("user_id", "t", "x")
    val right = Seq((1L, ts(5), 2.0)).toDF("user_id", "t", "y")
    val plan = AsofJoin.asofJoin(left, right, Seq("user_id"), "t", Seq("y"))
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges == 1, s"expected 1 hash exchange, plan:\n$plan")
  }
}
