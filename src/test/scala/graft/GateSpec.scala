package graft

import graft.operators.{Classifier, Curation, Dedup, Forecast, Similarity}
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
}
