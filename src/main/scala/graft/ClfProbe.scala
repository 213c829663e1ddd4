package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Quality-classifier measurement harness — held-out accuracy,
  * per-class recall and probability separation of
  * [[graft.operators.Classifier]] across scale factors and hash-table
  * sizes, next to the generative DSIR model's separation on the same
  * corpus (the two tiers share one feature definition, so the
  * comparison is feature-for-feature). Run:
  * `sbt "runMain graft.ClfProbe"`. Numbers land in SURVEY §6.
  */
object ClfProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.1")) {
      // the generative yardstick: per-token DSIR log-weight separation
      val dsir = operators.Curation.importanceWeightsHashed(spark, dir)
        .join(Tables.documents(spark, dir).select("doc_id", "source"), "doc_id")
        .select((col("log_weight") / col("n_tokens")).as("lw"),
          (col("source") === "src0").as("t"))
      val d = dsir.agg(avg(when(col("t"), col("lw"))),
        avg(when(!col("t"), col("lw"))), stddev(col("lw"))).head
      println(f"[clf] $dir dsir-sep=${
        (d.getDouble(0) - d.getDouble(1)) / d.getDouble(2)}%.2f sd")
      for (b <- Seq(operators.Classifier.defaultBuckets, 4096)) {
        val docs = Tables.documents(spark, dir)
        val t0 = System.nanoTime()
        val train = docs.filter(pmod(xxhash64(col("doc_id")), lit(5L)) =!= 0L)
        val (model, losses) = operators.Classifier.fit(
          operators.Classifier.featurize(train, b), b)
        val res = operators.Classifier.classifierScore(docs, model)
          .withColumn("ho", pmod(xxhash64(col("doc_id")), lit(5L)) === 0L)
          .cache()
        val hit = when(col("pred_target") === col("is_target"), 1.0)
          .otherwise(0.0)
        val m = res.agg(
          avg(when(col("ho"), hit)).as("acc_ho"),
          avg(when(col("is_target"), when(col("pred_target"), 1.0)
            .otherwise(0.0))).as("recall_t"),
          avg(when(!col("is_target"), when(!col("pred_target"), 1.0)
            .otherwise(0.0))).as("recall_nt"),
          avg(when(col("is_target"), col("prob"))).as("p_t"),
          avg(when(!col("is_target"), col("prob"))).as("p_nt")).head
        println(f"[clf] $dir B=$b%5d fit=${(System.nanoTime() - t0) / 1e9}%5.1f s " +
          f"loss=${losses.last}%.4f monotone=${
            losses.sliding(2).forall(p => p(1) <= p(0) + 1e-9)} " +
          f"accHO=${m.getDouble(0)}%.3f recT=${m.getDouble(1)}%.3f " +
          f"recNT=${m.getDouble(2)}%.3f pT=${m.getDouble(3)}%.3f " +
          f"pNT=${m.getDouble(4)}%.3f")
        res.unpersist()
      }
    }
    spark.stop()
  }
}
