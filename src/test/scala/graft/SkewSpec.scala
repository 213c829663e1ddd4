package graft

import graft.operators.Skew
import org.apache.spark.sql.functions._

class SkewSpec extends SparkSuite {
  import spark.implicits._

  test("saltedDistinctCount equals countDistinct exactly") {
    val ev = Tables.events(spark, sfDir)
    val salted = Skew.saltedDistinctCount(ev, "user_id", "value")
      .orderBy("user_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val direct = ev.groupBy("user_id").agg(countDistinct("value").as("n"))
      .orderBy("user_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(salted.sameElements(direct))
  }

  test("saltedDistinctCount correct on a synthetic hot key with duplicates") {
    val hot = (1 to 10000).map(i => (1L, (i % 997).toDouble)) ++
      (1 to 50).map(i => (2L, i.toDouble))
    val df = hot.toDF("user_id", "value")
    val got = Skew.saltedDistinctCount(df, "user_id", "value")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got(1L) == 997 && got(2L) == 50)
  }
}
