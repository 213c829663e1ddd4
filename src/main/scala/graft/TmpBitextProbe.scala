package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object TmpBitextProbe {
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
      for (np <- Seq(4, 6, 8, 12)) {
        val ann = operators.Similarity.bitextMarginIvfOn(idx, np)
          .filter(col("accepted")).select("x_id", "y_id").collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
        println(f"[bt] $dir nProbe=$np recall=${(exact & ann).size.toDouble / exact.size}%.3f ann_acc=${ann.size}")
      }
      idx.assigned.unpersist()
    }
    spark.stop()
  }
}
