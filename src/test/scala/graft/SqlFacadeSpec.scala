package graft

/** The pure-SQL entry path: temp views over every table plus the
  * injected custom functions must make the library usable from
  * `spark.sql` alone (the reference's dashboard speaks SQL to
  * PostgreSQL; this is that interface on Spark).
  */
class SqlFacadeSpec extends SparkSuite {

  test("registerViews exposes every table to spark.sql") {
    Tables.registerViews(spark, sfDir)
    Tables.names.foreach { n =>
      assert(spark.sql(s"SELECT count(*) FROM $n").head.getLong(0) > 0, n)
    }
    // events ts arrives as a usable timestamp, not raw nanos
    val t = spark.sql("SELECT max(ts) FROM events").head.get(0)
    assert(t.isInstanceOf[java.sql.Timestamp])
  }

  test("a reference-style dashboard query runs as plain SQL") {
    Tables.registerViews(spark, sfDir)
    val rows = spark.sql(
      """SELECT c.c_name, e.user_id, count(*) AS n, round(avg(e.value), 4) AS mean
        |FROM events e JOIN customer c ON e.user_id = c.c_custkey
        |GROUP BY c.c_name, e.user_id ORDER BY n DESC LIMIT 10""".stripMargin)
      .collect()
    assert(rows.length == 10 && rows.forall(_.getAs[Long]("n") > 0))
  }

  test("custom codegen functions are callable from SQL") {
    graft.functions.VectorDot.register(spark)
    org.apache.spark.sql.GraftShim.registerFunction(spark, "simhash64",
      exprs => graft.functions.SimHash64(exprs.head))
    val dot = spark.sql(
      "SELECT vector_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d").head.getDouble(0)
    assert(dot == 11.0)
    val sim = spark.sql(
      "SELECT simhash64(array('hello', 'world', 'hello')) AS h").head.getLong(0)
    assert(sim != 0L)
    // pair_corr: perfectly anticorrelated over the 2 common indices
    org.apache.spark.sql.GraftShim.registerFunction(spark, "pair_corr",
      exprs => graft.functions.PairCorr(exprs(0), exprs(1), exprs(2),
        exprs(3), exprs(4).eval().asInstanceOf[Number].intValue()))
    val pc = spark.sql(
      """SELECT pair_corr(array(1, 2, 3), array(1.0d, 2.0d, 3.0d),
        |                 array(2, 3, 4), array(9.0d, 8.0d, 7.0d), 2) AS pc"""
        .stripMargin).head.getSeq[Double](0)
    assert(pc == Seq(2.0, -1.0), s"got $pc")
  }
}
