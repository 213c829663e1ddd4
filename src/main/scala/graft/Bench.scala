package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs the headline queries at SPARK_GRAFT_SF_DIR and
  * prints ONE JSON metrics line. Results are materialized through the
  * noop sink so every column is computed (a bare .count() would let
  * Catalyst prune the expensive projections and under-report).
  */
object Bench {

  /** Representative slice of SURVEY.md §2: relational, warehouse,
    * indicator, dedup/similarity, text and ML operators.
    */
  val headline: Seq[String] = Seq(
    "q1_agg", "q3_join", "q5_multijoin",
    "q_daily_ohlc", "q_sessionize", "q_window_agg",
    "q_analytics_full", "q_alerts",
    "q_dedup_minhash", "q_dedup_embedding", "q_ann_bruteforce",
    "q_token_count", "q_quality_score",
    "q_linreg_autoreg", "q_arima_forecast")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // JVM/session warmup outside the timed region; never let it kill
    // the run — the metrics line below must always print
    try SparkEntry.queries("q1_agg")(spark, sfDir).write
      .format("noop").mode("overwrite").save()
    catch { case e: Throwable => System.err.println(s"[bench] warmup: $e") }

    // min-of-N per query: single runs swing ±15% with machine noise
    // (page cache, JIT, GC alignment); the minimum is the stable
    // estimator of achievable time. Failures short-circuit a query's
    // remaining runs.
    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "2").toInt.max(1)
    val failed = scala.collection.mutable.ArrayBuffer.empty[String]
    val results = headline.map { name =>
      val fn = SparkEntry.queries(name)
      var best = Double.MaxValue
      var lastErrSecs = 0.0
      var anyOk = false
      var halted = false
      var i = 0
      while (!halted && i < runs) {
        val t0 = System.nanoTime()
        val ok =
          try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true }
          catch { case e: Throwable => System.err.println(s"[bench] $name: $e"); false }
        val secs = (System.nanoTime() - t0) / 1e9
        // an error stops this query's remaining runs, but a minimum
        // already measured from a COMPLETED run stands — only a query
        // with zero successful runs is graded failed
        if (ok) { anyOk = true; best = math.min(best, secs) }
        else { halted = true; lastErrSecs = secs }
        i += 1
      }
      if (!anyOk) failed += name
      name -> (if (anyOk) best else -lastErrSecs)
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    // failed queries report negative elapsed per-query and charge a
    // fixed 999 s penalty into the total, so a fast crash makes the
    // headline number strictly WORSE, never a phantom speedup; the
    // errors array names the culprits
    val total = results.collect { case (_, v) if v >= 0 => v }.sum +
      failed.length * 999.0
    val errs = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errs,"runs":$runs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
