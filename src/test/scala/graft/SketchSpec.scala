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
}
