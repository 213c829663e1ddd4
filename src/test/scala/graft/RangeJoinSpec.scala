package graft

import java.sql.Timestamp

import graft.operators.RangeJoin
import org.apache.spark.sql.functions._

class RangeJoinSpec extends SparkSuite {

  private def ts(s: Double) = new Timestamp((s * 1000).toLong)

  test("rangeJoin emits each in-window pair exactly once, incl. band edges") {
    import spark.implicits._
    val left = Seq((1L, ts(100.0), 10L), (1L, ts(550.0), 11L), (2L, ts(100.0), 12L))
      .toDF("user_id", "t", "l_id")
    val right = Seq(
      (1L, ts(100.0), 20L),  // == left ts → inclusive
      (1L, ts(699.9), 21L),  // within 600 of left@100, crosses band edge
      (1L, ts(700.1), 22L),  // outside for left@100, inside for left@550
      (1L, ts(99.0), 23L),   // before → excluded
      (2L, ts(650.0), 24L),  // other user, within 600 of 100
      (3L, ts(100.0), 25L))  // user with no left rows
      .toDF("user_id", "t", "r_id")
    val out = RangeJoin.rangeJoin(left, right, Seq("user_id"), "t", 600.0,
      Seq("r_id")).select("l_id", "r_r_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out == Set((10L, 20L), (10L, 21L), (11L, 21L), (11L, 22L), (12L, 24L)))
  }

  test("rangeJoin matches a brute-force interval scan on real events") {
    val ev = Tables.events(spark, sfDir)
      .select("event_id", "ts", "user_id", "event_type").collect()
    val purchases = ev.filter(_.getAs[String]("event_type") == "purchase")
    val errors = ev.filter(_.getAs[String]("event_type") == "error")
    val expected = (for {
      p <- purchases
      e <- errors
      if e.getAs[Long]("user_id") == p.getAs[Long]("user_id")
      dt = (e.getAs[Timestamp]("ts").getTime - p.getAs[Timestamp]("ts").getTime) / 1000.0
      if dt >= 0 && dt <= 14400.0
    } yield (p.getAs[Long]("event_id"), e.getAs[Long]("event_id"))).toSet
    val got = RangeJoin.purchaseErrors(spark, sfDir)
      .select("event_id", "e_event_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == expected, s"missing=${expected -- got} extra=${got -- expected}")
  }

  test("rangeJoin plans as an equi-join, not a nested loop") {
    val plan = RangeJoin.purchaseErrors(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"),
      s"range join fell back to a nested loop:\n$plan")
  }
}
