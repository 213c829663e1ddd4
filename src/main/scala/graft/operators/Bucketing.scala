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

  /** Persist `df` as a bucketed, per-bucket-sorted parquet table.
    * `keys` may be composite — both sides of a multi-column equi-join
    * must bucket on the SAME column list (order included) for the
    * exchange to be elided.
    */
  def writeBucketed(df: DataFrame, table: String, numBuckets: Int,
      keys: Seq[String], sortCols: Seq[String] = Nil): Unit = {
    require(keys.nonEmpty, "writeBucketed: at least one bucket key")
    df.write.format("parquet")
      .bucketBy(numBuckets, keys.head, keys.tail: _*)
      .sortBy((keys ++ sortCols).head, (keys ++ sortCols).tail: _*)
      .mode(SaveMode.Overwrite)
      .saveAsTable(table)
  }

  /** Join two tables bucketed on the same key list; with matching
    * bucket counts Spark plans a shuffle-free sort-merge join.
    */
  def coLocatedJoin(spark: SparkSession, left: String, right: String,
      keys: Seq[String]): DataFrame =
    spark.table(left).join(spark.table(right), keys)
}
