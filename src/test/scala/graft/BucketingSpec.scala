package graft

import graft.operators.{Bucketing, Warehouse}

class BucketingSpec extends SparkSuite {

  test("co-located join on bucketed tables plans zero exchanges") {
    Bucketing.writeBucketed(
      Warehouse.validTicks(spark, sfDir), "ticks_b", 8, "user_id", Seq("ts"))
    Bucketing.writeBucketed(
      Warehouse.latestPerKey(spark, sfDir), "latest_b", 8, "user_id")
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // force SMJ so the assertion tests bucketing, not broadcast
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = Bucketing.coLocatedJoin(spark, "ticks_b", "latest_b", "user_id")
      val plan = joined.queryExecution.executedPlan.toString
      assert("Exchange".r.findAllIn(plan).isEmpty,
        s"bucketed join should not shuffle:\n$plan")
      assert(plan.contains("SortMergeJoin"), "expected a sort-merge join")
      assert(joined.count() == Warehouse.validTicks(spark, sfDir).count())
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
    }
  }
}
