package graft

import graft.operators.{Classifier, Curation, Dedup, Forecast, PerfLedger, Similarity}
import org.apache.spark.sql.DataFrame

/** The round-11 gate tier in one sweep: every gate query's boolean
  * verdicts must read TRUE at spec scale, so a floor regression (or
  * an operator change that trips one) fails here before it can
  * byte-break the driver's oracle compare. The exact legs are the
  * driver's job; the booleans are the gates' whole point.
  */
class GateSpec extends SparkSuite {

  private def allBoolsTrue(df: DataFrame): Unit = {
    val rows = df.collect()
    assert(rows.nonEmpty)
    val boolCols = df.schema.fields.filter(_.dataType ==
      org.apache.spark.sql.types.BooleanType).map(_.name)
    assert(boolCols.nonEmpty, "a gate must carry at least one verdict")
    rows.foreach { r =>
      boolCols.foreach { c =>
        assert(r.getAs[Boolean](c), s"gate verdict $c is false in $r")
      }
    }
  }

  test("ann recall gate: every family clears its floor") {
    allBoolsTrue(Similarity.annRecallGate(spark, sfDir))
  }

  test("filtered-search recall gate clears its floor") {
    allBoolsTrue(Similarity.annFilteredGate(spark, sfDir))
  }

  test("kmeans assignment-optimality gate holds") {
    allBoolsTrue(Similarity.kmeansGate(spark, sfDir))
  }

  test("PCA spectral gate holds") {
    allBoolsTrue(Similarity.embedPcaGate(spark, sfDir))
  }

  test("embedding dedup gate: precision zero extras, recall floors") {
    val df = Dedup.embedDedupGate(spark, sfDir)
    allBoolsTrue(df)
    assert(df.collect().forall(_.getAs[Long]("n_false_pairs") == 0L))
  }

  test("LSH refinement gate holds") {
    allBoolsTrue(Dedup.lshRefineGate(spark, sfDir))
  }

  test("minhash cluster consistency gate holds") {
    allBoolsTrue(Dedup.minhashClusterGate(spark, sfDir))
  }

  test("triplet hard-negative gate holds") {
    allBoolsTrue(Dedup.tripletHardGate(spark, sfDir))
  }

  test("near-dup gate certainty check holds") {
    allBoolsTrue(Dedup.nearDupGateCheck(spark, sfDir))
  }

  test("DSIR hash-agreement gate clears its correlation floor") {
    allBoolsTrue(Curation.dsirHashGate(spark, sfDir))
  }

  test("forecast serve-mass gate holds") {
    allBoolsTrue(Forecast.forecastGate(spark, sfDir))
  }

  test("classifier training gate holds") {
    allBoolsTrue(Classifier.clfGate(spark, sfDir))
  }

  test("topic-mix gate: dual-derived accepted set reconciles, rates antitone") {
    val df = Curation.topicMixGate(spark, sfDir)
    allBoolsTrue(df)
    val row = df.collect().head
    // n_docs is the documents⋈embeddings join mass the oracle recounts
    val emb = Tables.embeddings(spark, sfDir)
      .select(org.apache.spark.sql.functions.col("vec_id").as("doc_id"))
    val expected = Tables.documents(spark, sfDir).select("doc_id")
      .join(emb, Seq("doc_id")).count()
    assert(row.getAs[Long]("n_docs") == expected)
    // the gate's accepted-set reconciliation covers topicMix itself:
    // the accepted rows it blessed are exactly the registered surface
    assert(Curation.topicMix(spark, sfDir).count() > 0)
  }

  test("perf-rollup gate: one batch per leg, row masses match, zero errors") {
    val rows = PerfLedger.perfRollupGate(spark, sfDir).collect()
    assert(rows.map(_.getAs[String]("component_name")).toSeq.sorted ==
      Seq("alerts", "daily_ohlc", "validate_ticks"))
    rows.foreach { r =>
      assert(r.getAs[Long]("n_batches") == 1L)
      assert(r.getAs[Long]("total_errors") == 0L)
    }
    val masses = rows.map(r => r.getAs[String]("component_name")
      -> r.getAs[Long]("total_rows")).toMap
    assert(masses("validate_ticks")
      == graft.operators.Warehouse.validateTicks(spark, sfDir).count())
    assert(masses("daily_ohlc")
      == graft.operators.Warehouse.dailyOhlc(spark, sfDir).count())
    assert(masses("alerts")
      == graft.operators.Indicators.alerts(spark, sfDir).count())
  }
}
