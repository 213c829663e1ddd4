package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-table co-location: the storage-level answer to repeated
  * large joins/aggregations on the same key at 100 TB.
  *
  * Writing both sides bucketed (and sorted) by the join key lets
  * SortMergeJoin run with ZERO exchanges — the shuffle is paid once at
  * write time instead of once per query. This is the strategy for the
  * tick↔analytics and fact↔fact joins the reference performs per
  * dashboard refresh (dashboard/app.py:54-119).
  */
object Bucketing {

  /** Persist `df` as a bucketed, per-bucket-sorted parquet table. */
  def writeBucketed(df: DataFrame, table: String, numBuckets: Int,
      key: String, sortCols: Seq[String] = Nil): Unit =
    df.write.format("parquet")
      .bucketBy(numBuckets, key)
      .sortBy(key, sortCols: _*)
      .mode(SaveMode.Overwrite)
      .saveAsTable(table)

  /** Join two tables bucketed on the same key; with matching bucket
    * counts Spark plans a shuffle-free sort-merge join.
    */
  def coLocatedJoin(spark: SparkSession, left: String, right: String,
      key: String): DataFrame =
    spark.table(left).join(spark.table(right), key)
}
