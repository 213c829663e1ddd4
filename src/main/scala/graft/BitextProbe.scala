package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Bitext-miner nProbe calibration (the RecallProbe pattern): pair
  * RECALL of the IVF-bounded production miner (q_bitext_ivf) against
  * the exact X×Y margin surface (q_bitext_margin) across nProbe
  * settings at two SFs. Accepted-pair recall — not candidate recall —
  * is the number that matters: a missed k-NN neighbor can still leave
  * the margin ranking (and so the mined pair set) unchanged, so this
  * probe measures the end-to-end effect. The q_bitext_gate floor
  * (BitextRecallFloor = 0.6 at the default nProbe=8) was
  * sweep-derived from this probe's output on the uniform-random
  * driver corpus — the hard instance; see the floor's scaladoc for
  * the measured nProbe curve (4 → ~0.50, 8 → 0.78-0.85, 12 → ~0.97).
  */
object BitextProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", 16)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val exact = operators.Similarity.bitextMargin(spark, dir)
        .filter(col("accepted")).select("x_id", "y_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val idx = operators.Similarity.ivfIndex(spark, dir)
      idx.assigned.cache().count()
      if (exact.isEmpty)
        println(s"[bitext] $dir DEGENERATE baseline: exact miner " +
          "accepted 0 pairs — recall undefined, sweep skipped")
      else for (np <- Seq(4, 6, 8, 12)) {
        val ann = operators.Similarity.bitextMarginIvfOn(idx, np)
          .filter(col("accepted")).select("x_id", "y_id").collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
        println(f"[bitext] $dir nProbe=$np recall=${(exact & ann).size.toDouble / exact.size}%.3f ann_acc=${ann.size}")
      }
      idx.assigned.unpersist()
    }
    spark.stop()
  }
}
