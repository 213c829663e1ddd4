package graft

import graft.operators.Relational

class RelationalSpec extends SparkSuite {

  test("q1_agg returns grouped pricing summary") {
    val df = Relational.q1Agg(spark, sfDir)
    val rows = df.collect()
    assert(rows.nonEmpty)
    assert(df.columns.toSeq == Seq("l_returnflag", "l_linestatus", "sum_qty",
      "sum_base_price", "sum_disc_price", "sum_charge", "avg_qty", "avg_price",
      "avg_disc", "count_order"))
    // groups are unique
    assert(rows.map(r => (r.getString(0), r.getString(1))).distinct.length == rows.length)
    // totals reconcile with a direct count
    val total = rows.map(_.getAs[Long]("count_order")).sum
    val expected = Tables.lineitem(spark, sfDir)
      .filter("l_shipdate <= timestamp'1998-09-02 00:00:00'").count()
    assert(total == expected)
  }

  test("q3_join returns top-10 revenue orders") {
    val rows = Relational.q3Join(spark, sfDir).collect()
    assert(rows.nonEmpty && rows.length <= 10)
    val revenues = rows.map(_.getAs[Double]("revenue"))
    assert(revenues.sameElements(revenues.sortBy(-_)), "sorted by revenue desc")
  }

  test("q5_multijoin returns per-region revenue") {
    val rows = Relational.q5MultiJoin(spark, sfDir).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[Long]("n_items") > 0))
  }
}
