package graft

import graft.operators.{Bucketing, Warehouse}
import org.apache.spark.sql.functions._

class BucketingSpec extends SparkSuite {

  private def withSmj[A](body: => A): A = {
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // force SMJ so the assertions test bucketing, not broadcast
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      body
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
    }
  }

  test("co-located join on bucketed tables plans zero exchanges") {
    Bucketing.writeBucketed(
      Warehouse.validTicks(spark, sfDir), "ticks_b", 8, Seq("user_id"), Seq("ts"))
    Bucketing.writeBucketed(
      Warehouse.latestPerKey(spark, sfDir), "latest_b", 8, Seq("user_id"))
    withSmj {
      val joined = Bucketing.coLocatedJoin(spark, "ticks_b", "latest_b",
        Seq("user_id"))
      val plan = joined.queryExecution.executedPlan.toString
      assert("Exchange".r.findAllIn(plan).isEmpty,
        s"bucketed join should not shuffle:\n$plan")
      assert(plan.contains("SortMergeJoin"), "expected a sort-merge join")
      assert(joined.count() == Warehouse.validTicks(spark, sfDir).count())
    }
  }

  test("composite-key bucketing also elides the exchange") {
    val ticks = Warehouse.validTicks(spark, sfDir)
    Bucketing.writeBucketed(ticks, "ticks_c", 8,
      Seq("user_id", "event_type"), Seq("ts"))
    Bucketing.writeBucketed(
      ticks.groupBy("user_id", "event_type")
        .agg(count(lit(1)).as("n"), max("value").as("max_value")),
      "stats_c", 8, Seq("user_id", "event_type"))
    withSmj {
      val joined = Bucketing.coLocatedJoin(spark, "ticks_c", "stats_c",
        Seq("user_id", "event_type"))
      val plan = joined.queryExecution.executedPlan.toString
      assert("Exchange".r.findAllIn(plan).isEmpty,
        s"composite bucketed join should not shuffle:\n$plan")
      assert(joined.count() == ticks.count())
    }
  }
}
