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

  test("saltedJoin equals the plain inner join on a skewed key") {
    // one hot key (90% of rows) + a long tail; dim has multiplicity 2
    val big = ((1 to 9000).map(i => (1L, i.toDouble)) ++
      (1 to 1000).map(i => ((i % 100 + 2).toLong, i.toDouble)))
      .toDF("user_id", "v")
    val dim = ((1 to 102).map(i => (i.toLong, s"a$i")) ++
      (1 to 102).map(i => (i.toLong, s"b$i"))).toDF("user_id", "tag")
    val got = Skew.saltedJoin(big, dim, Seq("user_id"), numSalts = 8)
      .groupBy("user_id").agg(count(lit(1)).as("n"), sum("v").as("s"))
      .orderBy("user_id").collect()
    val want = big.join(dim, Seq("user_id"))
      .groupBy("user_id").agg(count(lit(1)).as("n"), sum("v").as("s"))
      .orderBy("user_id").collect()
    assert(got.length == want.length)
    got.zip(want).foreach { case (g, w) =>
      assert(g.getLong(0) == w.getLong(0) && g.getLong(1) == w.getLong(1)
        && math.abs(g.getDouble(2) - w.getDouble(2)) < 1e-6)
    }
  }

  test("saltedJoin spreads a hot key over multiple shuffle sub-keys") {
    // hot key with a distinguishing column, as the operator requires
    val big = (1 to 1000).map(i => (1L, i.toDouble)).toDF("user_id", "v")
    val dim = Seq((1L, "x")).toDF("user_id", "tag")
    // the PRODUCTION salt expression: content hash over all columns
    val bigS = big.withColumn("_salt",
      pmod(xxhash64(col("user_id"), col("v")), lit(8L)).cast("int"))
    val nSalts = bigS.select("_salt").distinct().count()
    assert(nSalts >= 6, s"salting should spread the hot key, got $nSalts sub-keys")
    assert(Skew.saltedJoin(big, dim, Seq("user_id")).count() == 1000)
  }
}
