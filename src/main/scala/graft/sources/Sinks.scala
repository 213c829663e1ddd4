package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Sink-side semantics of the reference pipeline re-expressed for a
  * data-lake target.
  *
  * The reference upserts into PostgreSQL (`ON CONFLICT ... DO UPDATE`,
  * db/current_schema.sql:165-200; predictions upsert,
  * batch_predict_linear_regression.py:60-76). On a cluster the target
  * is a table-format/parquet sink, and the same contract is
  * merge-by-key-keep-latest, implemented here as a deterministic
  * read-merge-write. In production the JDBC variant is the same
  * `foreachBatch` body with `batch.write.jdbc(...)` and a staging
  * table + MERGE.
  */
object Sinks {

  /** The merge-by-key kernel both upsert sinks (and the companies-dim
    * write path) share: one row per `keyCols` survives, newest by
    * `versionCol`, ties → the update side wins. Pure plan — callers
    * own materialization and durability.
    */
  private[graft] def mergeByKey(existing: Option[DataFrame],
      updates: DataFrame, keyCols: Seq[String],
      versionCol: String): DataFrame = {
    val tagged = updates.withColumn("_src", lit(1))
    val all = existing match {
      case Some(e) => e.withColumn("_src", lit(0)).unionByName(tagged)
      case None => tagged
    }
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(versionCol).desc, col("_src").desc)
    all
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .drop("_rn", "_src")
  }

  /** Merge `updates` into the parquet table at `path`: one row per
    * `keyCols` survives, newest by `versionCol` (ties → update wins).
    */
  def upsertParquet(updates: DataFrame, path: String, keyCols: Seq[String],
      versionCol: String): Unit = {
    val spark = updates.sparkSession
    // crash recovery: if a previous swap renamed the live table to
    // .old but died before promoting the staging copy, the .old dir
    // still holds the last durable state — read from it
    val live = new java.io.File(path)
    val old = new java.io.File(path + ".old")
    val readPath = if (live.exists()) Some(path)
      else if (old.exists()) Some(path + ".old")
      else None
    val existing = readPath.map(spark.read.parquet(_))
    val merged = mergeByKey(existing, updates, keyCols, versionCol)
    // stage-and-swap: writing over the path being read would corrupt
    // the table if cached partitions were evicted mid-write. Swap via
    // rename(live→old) + rename(staging→live) + delete(old): every
    // crash point leaves a recoverable copy (see readPath above).
    val staged = path + ".staging"
    merged.write.mode(SaveMode.Overwrite).parquet(staged)
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rm)); f.delete()
    }
    val stagedDir = new java.io.File(staged)
    if (live.exists()) {
      if (old.exists()) rm(old) // stale leftover from a completed swap
      if (!live.renameTo(old))
        throw new java.io.IOException(s"could not retire $path")
      if (!stagedDir.renameTo(live))
        throw new java.io.IOException(s"could not promote $staged into $path")
      rm(old)
    } else {
      // recovery path: .old (if present) is the only durable copy —
      // promote staging to live FIRST, only then drop .old, so every
      // crash point still leaves a dir that readPath recovers from
      if (!stagedDir.renameTo(live))
        throw new java.io.IOException(s"could not promote $staged into $path")
      if (old.exists()) rm(old)
    }
  }

  /** Partition-aware upsert: merge `updates` into a table
    * partitioned by `partitionCol`, rewriting ONLY the partitions the
    * update batch touches (dynamic partition overwrite). This is the
    * 100 TB sink shape — a daily tick batch touches a handful of date
    * partitions, so the merge reads and rewrites O(batch) data, not
    * O(table) like a whole-table swap.
    *
    * Same merge contract as [[upsertParquet]]: one row per `keyCols`
    * survives per partition, newest by `versionCol`, ties → update
    * wins.
    */
  def upsertPartitioned(updates: DataFrame, path: String,
      keyCols: Seq[String], versionCol: String, partitionCol: String): Unit = {
    val spark = updates.sparkSession
    val touched = updates.select(partitionCol).distinct().collect()
      .map(_.get(0))
    // a null partition value would silently vanish (the pruning
    // filter below can't isin-match null and dynamic overwrite would
    // write it unmerged to the default partition) — reject upfront
    require(!touched.contains(null),
      s"upsertPartitioned: null $partitionCol in update batch")
    if (touched.isEmpty) return
    val existing =
      if (new java.io.File(path).exists())
        // filter on the partition column prunes to touched partitions
        // at the file-listing level (verified in SinksSpec's plan check)
        Some(spark.read.parquet(path)
          .filter(col(partitionCol).isin(touched.toIndexedSeq: _*)))
      else None
    val merged = mergeByKey(existing, updates, keyCols, versionCol)
    // materialize before writing: Spark (correctly) refuses to
    // overwrite a path its plan still reads; the eager localCheckpoint
    // truncates lineage and is O(touched partitions), not O(table)
    val materialized = merged.localCheckpoint(true)
    materialized.write
      .mode(SaveMode.Overwrite)
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy(partitionCol)
      .parquet(path)
  }

  /** Small-file compaction for a partitioned table: incremental
    * upserts leave one file per merge per partition; over time a hot
    * partition accumulates hundreds of small files and scan tasks
    * drown in open/seek overhead. Rewrites every partition whose file
    * count exceeds `maxFiles` down to `targetFiles` files, leaving
    * compact partitions untouched (their bytes stay as-is — safe to
    * run concurrently with readers of other partitions).
    */
  def compactPartitions(spark: SparkSession, path: String,
      partitionCol: String, maxFiles: Int = 8, targetFiles: Int = 1): Unit = {
    val root = new java.io.File(path)
    if (!root.exists()) return
    val needCompaction = Option(root.listFiles()).getOrElse(Array.empty)
      .filter(d => d.isDirectory && d.getName.startsWith(partitionCol + "="))
      .filter(d => d.listFiles().count(_.getName.endsWith(".parquet")) > maxFiles)
    if (needCompaction.isEmpty) return
    // Hive dir-name escaping percent-encodes specials but leaves '+'
    // literal — URLDecoder would corrupt it to a space, so decode
    // only %XX sequences
    def unescape(s: String): String =
      "%([0-9A-Fa-f]{2})".r.replaceAllIn(s,
        m => java.util.regex.Matcher.quoteReplacement(
          Integer.parseInt(m.group(1), 16).toChar.toString))
    val values = needCompaction.map(_.getName.stripPrefix(partitionCol + "="))
      .map(unescape)
    val compacted = spark.read.parquet(path)
      .filter(col(partitionCol).cast("string").isin(values.toIndexedSeq: _*))
      .repartition(targetFiles)
      .localCheckpoint(true) // reading + overwriting the same path
    compacted.write
      .mode(SaveMode.Overwrite)
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy(partitionCol)
      .parquet(path)
  }

  /** COMPANIES-DIM WRITE PATH — the reference's dim maintenance
    * (utils/company_manager.py:62-122 get_or_create_company, :215-252
    * update_company_info, :277-291 bulk_create_companies) as ONE
    * SCD-1 merge over the customer dim (the companies stand-in):
    * a deterministic incoming batch carries UPDATES for existing keys
    * (the reference's `UPDATE companies SET <kwargs> WHERE ticker` —
    * the row is read, mutable fields overwritten, identity preserved)
    * and INSERTS for brand-new keys (get_or_create's miss path —
    * whole rows). The merge itself is [[mergeByKey]] — the identical
    * kernel the durable sinks run, exercised here as a hash-graded
    * query: batch rows (version 1) win over the base dim (version 0),
    * one row per key survives, `action` says what the merge did.
    *
    * Scale shape: ONE key-partitioned window over base ∪ batch — at a
    * real dim size the batch is tiny and [[upsertPartitioned]]'s
    * partition pruning bounds the rewrite; the query form grades the
    * merge algebra.
    */
  def companyUpsert(spark: SparkSession, dir: String): DataFrame = {
    val base = graft.Tables.customer(spark, dir)
      .select(col("c_custkey"), col("c_name"), col("c_nationkey"),
        col("c_acctbal"), col("c_mktsegment"))
    val updated = base.filter(col("c_custkey") % 7 === 0)
      .withColumn("c_acctbal", (col("c_custkey") % 1000L).cast("double"))
      .withColumn("c_mktsegment", lit("REASSIGNED"))
      .withColumn("action", lit("update"))
    val inserted = base.filter(col("c_custkey") % 13 === 0)
      .select((col("c_custkey") + 1000000L).as("c_custkey"),
        concat(lit("NewCo#"),
          (col("c_custkey") + 1000000L).cast("string")).as("c_name"),
        col("c_nationkey"),
        lit(0.0).as("c_acctbal"),
        lit("NEWLY_LISTED").as("c_mktsegment"),
        lit("insert").as("action"))
    val batch = updated.unionByName(inserted).withColumn("v", lit(1))
    val dim = base.withColumn("action", lit("carry")).withColumn("v", lit(0))
    mergeByKey(Some(dim), batch, Seq("c_custkey"), "v")
      .drop("v")
  }

  /** [[companyUpsert]]'s HISTORY-PRESERVING dual — SCD TYPE-2: instead
    * of overwriting, the merge APPENDS a new version row and closes
    * the old one (valid_from/valid_to version stamps + is_current),
    * the dim shape the reference's realtime→historical migration
    * implies for facts (current_schema.sql:165-200 keeps daily
    * snapshots; a dim under the same discipline keeps attribute
    * history). Same deterministic batch as the upsert: updated keys
    * carry TWO rows (v0 closed + v1 current), carried keys one open
    * v0 row, inserted keys one open v1 row. An SCD-2 merge is pure
    * append algebra — one key-partitioned window computes valid_to as
    * the next version's stamp — so at scale it rides the identical
    * partition-pruned write path as [[upsertPartitioned]] with NO
    * read-modify-write of history (closed rows never change).
    */
  def companyScd2(spark: SparkSession, dir: String): DataFrame = {
    val base = graft.Tables.customer(spark, dir)
      .select(col("c_custkey"), col("c_name"), col("c_nationkey"),
        col("c_acctbal"), col("c_mktsegment"))
    val updated = base.filter(col("c_custkey") % 7 === 0)
      .withColumn("c_acctbal", (col("c_custkey") % 1000L).cast("double"))
      .withColumn("c_mktsegment", lit("REASSIGNED"))
    val inserted = base.filter(col("c_custkey") % 13 === 0)
      .select((col("c_custkey") + 1000000L).as("c_custkey"),
        concat(lit("NewCo#"),
          (col("c_custkey") + 1000000L).cast("string")).as("c_name"),
        col("c_nationkey"),
        lit(0.0).as("c_acctbal"),
        lit("NEWLY_LISTED").as("c_mktsegment"))
    val versions = base.withColumn("valid_from", lit(0))
      .unionByName(updated.unionByName(inserted).withColumn("valid_from", lit(1)))
    val w = Window.partitionBy("c_custkey").orderBy("valid_from")
    versions
      .withColumn("valid_to", lead("valid_from", 1).over(w))
      .withColumn("is_current", col("valid_to").isNull)
  }

  def companyScd2Sql: String =
    """WITH base AS (
      |  SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment
      |  FROM customer
      |), upd AS (
      |  SELECT c_custkey, c_name, c_nationkey,
      |    (c_custkey % 1000)::DOUBLE AS c_acctbal,
      |    'REASSIGNED' AS c_mktsegment
      |  FROM base WHERE c_custkey % 7 = 0
      |), ins AS (
      |  SELECT c_custkey + 1000000 AS c_custkey,
      |    'NewCo#' || CAST(c_custkey + 1000000 AS VARCHAR) AS c_name,
      |    c_nationkey, 0.0::DOUBLE AS c_acctbal,
      |    'NEWLY_LISTED' AS c_mktsegment
      |  FROM base WHERE c_custkey % 13 = 0
      |), versions AS (
      |  SELECT *, 0 AS valid_from FROM base
      |  UNION ALL
      |  SELECT *, 1 AS valid_from
      |  FROM (SELECT * FROM upd UNION ALL SELECT * FROM ins)
      |)
      |SELECT *,
      |  lead(valid_from) OVER (PARTITION BY c_custkey ORDER BY valid_from)
      |    AS valid_to,
      |  lead(valid_from) OVER (PARTITION BY c_custkey ORDER BY valid_from)
      |    IS NULL AS is_current
      |FROM versions ORDER BY c_custkey, valid_from""".stripMargin

  def companyUpsertSql: String =
    """WITH base AS (
      |  SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment
      |  FROM customer
      |), upd AS (
      |  SELECT c_custkey, c_name, c_nationkey,
      |    (c_custkey % 1000)::DOUBLE AS c_acctbal,
      |    'REASSIGNED' AS c_mktsegment, 'update' AS action
      |  FROM base WHERE c_custkey % 7 = 0
      |), ins AS (
      |  SELECT c_custkey + 1000000 AS c_custkey,
      |    'NewCo#' || CAST(c_custkey + 1000000 AS VARCHAR) AS c_name,
      |    c_nationkey, 0.0::DOUBLE AS c_acctbal,
      |    'NEWLY_LISTED' AS c_mktsegment, 'insert' AS action
      |  FROM base WHERE c_custkey % 13 = 0
      |), batch AS (
      |  SELECT * FROM upd UNION ALL SELECT * FROM ins
      |)
      |SELECT * FROM batch
      |UNION ALL
      |SELECT b.*, 'carry' AS action FROM base b
      |WHERE b.c_custkey NOT IN (SELECT c_custkey FROM batch)
      |ORDER BY c_custkey""".stripMargin

  private def startForeachBatch(ticks: DataFrame, checkpoint: String)(
      body: (DataFrame, Long) => Unit): StreamingQuery =
    ticks.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, id: Long) => body(batch, id) }
      .start()

  /** Streaming sink: the consumer→database leg (consumer/consumer.py
    * + analytics_consumer.py:97-192) as a foreachBatch upsert —
    * exactly-once per key via idempotent merge.
    */
  def streamUpsert(ticks: DataFrame, path: String, checkpoint: String,
      keyCols: Seq[String], versionCol: String): StreamingQuery =
    startForeachBatch(ticks, checkpoint) { (batch, _) =>
      upsertParquet(batch, path, keyCols, versionCol)
    }

  // the ledger lives beside the CHECKPOINT, which Spark treats as a
  // Hadoop path (file:/, hdfs://, s3a://...) — so it must be accessed
  // through the Hadoop FileSystem API, not java.io.File, or a URI
  // checkpoint would silently mangle into a cwd-relative local path
  private def ledgerFs(spark: SparkSession, ledgerPath: String)
      : (org.apache.hadoop.fs.FileSystem, org.apache.hadoop.fs.Path) = {
    val p = new org.apache.hadoop.fs.Path(ledgerPath)
    (p.getFileSystem(spark.sparkContext.hadoopConfiguration), p)
  }

  private def committedBatch(fs: org.apache.hadoop.fs.FileSystem,
      ledger: org.apache.hadoop.fs.Path): Long =
    if (!fs.exists(ledger)) -1L
    else
      // an unreadable/truncated ledger (crash between rename and data
      // flush) must degrade to RE-APPLY — the merge is idempotent —
      // never to a permanently failing sink
      scala.util.Try {
        val in = fs.open(ledger)
        try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim.toLong
        finally in.close()
      }.getOrElse(-1L)

  /** One exactly-once microbatch commit: run `apply`, then record the
    * batch id in the ledger file (written staged + atomic rename). A
    * RE-DELIVERED batch (id ≤ ledger) is skipped entirely. foreachBatch
    * is at-least-once after failures; the merge body is already
    * idempotent per key, so the ledger's job is to also make side
    * effects (file churn, write amplification) happen once per batch.
    * Returns true when the batch was applied.
    *
    * The ledger lives with the CHECKPOINT, not the table: batch ids
    * are only monotonic within one checkpoint lineage, so a checkpoint
    * reset (ids restart at 0) gets a fresh ledger and re-applies
    * idempotently instead of silently dropping the first batches.
    */
  private[graft] def commitOnce(spark: SparkSession, ledgerPath: String,
      batchId: Long)(apply: => Unit): Boolean = {
    val (fs, ledger) = ledgerFs(spark, ledgerPath)
    if (batchId <= committedBatch(fs, ledger)) return false
    apply
    val staged = new org.apache.hadoop.fs.Path(ledgerPath + ".staging")
    val out = fs.create(staged, true)
    try out.write(batchId.toString.getBytes("UTF-8")) finally out.close()
    // HDFS-style rename refuses to overwrite: drop the old ledger
    // first. A crash in the gap leaves NO ledger, which degrades to
    // re-apply (idempotent), never to data loss.
    if (fs.exists(ledger)) fs.delete(ledger, false)
    if (!fs.rename(staged, ledger))
      throw new java.io.IOException(s"could not commit batch ledger $ledgerPath")
    true
  }

  private[graft] def commitBatchOnce(batch: DataFrame, path: String,
      ledgerPath: String, keyCols: Seq[String], versionCol: String,
      batchId: Long): Boolean =
    commitOnce(batch.sparkSession, ledgerPath, batchId) {
      upsertParquet(batch, path, keyCols, versionCol)
    }

  /** [[streamUpsert]] with a per-batch commit ledger: exactly-once in
    * effects as well as in results — Structured Streaming replays the
    * last uncommitted microbatch after a crash, and the ledger makes
    * the replay a no-op when the previous attempt got through.
    */
  def streamUpsertExactlyOnce(ticks: DataFrame, path: String, checkpoint: String,
      keyCols: Seq[String], versionCol: String): StreamingQuery =
    startForeachBatch(ticks, checkpoint) { (batch, id) =>
      commitBatchOnce(batch, path, s"$checkpoint/graft.commit",
        keyCols, versionCol, id): Unit
    }

  // ---------------------------------------------------------------- JDBC

  private def qid(ident: String): String = "\"" + ident + "\""

  /** Merge `updates` into JDBC table `table` — the reference's ACTUAL
    * sink leg (PostgreSQL `INSERT ... ON CONFLICT ... DO UPDATE`,
    * shared/database.py; predictions upsert,
    * batch_predict_linear_regression.py:60-76) — as a staging table +
    * ANSI MERGE. Same contract as [[upsertParquet]]: one row per
    * `keyCols` survives, newest by `versionCol`, ties → update wins.
    *
    * The batch is deduped per key BEFORE staging (MERGE requires one
    * source row per target row), written with Spark's parallel JDBC
    * writer, then merged in one set-based server-side statement — no
    * per-row driver round-trips. Verified against embedded Derby in
    * SinksSpec (the in-container stand-in); against PostgreSQL the
    * same staging+MERGE shape applies verbatim.
    *
    * String columns are pinned to VARCHAR (Spark's Derby default is
    * CLOB, which cannot be compared or indexed in a MERGE ON clause).
    *
    * Identifier contract: COLUMN references are double-quoted to match
    * the exact-case columns Spark's JDBC writer creates in the staging
    * table; TABLE names are interpolated unquoted and case-fold per
    * engine (Derby→upper, PostgreSQL→lower). Targets this function
    * creates are therefore always consistent; a PRE-EXISTING target
    * must have been created with case-exact (quoted) column DDL
    * matching the DataFrame schema, or the quoted refs like
    * t."user_id" won't resolve. Concurrency: each invocation stages
    * into a unique table (dropped in a finally), so concurrent writers
    * to the same TARGET serialize on the engine's MERGE row locks
    * rather than clobbering each other's staging rows; last version
    * wins per key either way, per the MERGE condition.
    */
  def upsertJdbc(updates: DataFrame, url: String, table: String,
      keyCols: Seq[String], versionCol: String): Unit = {
    // tie-break equal versions on the remaining columns so the winner
    // is a function of batch CONTENT — a crash-replayed batch then
    // stages the same row and the re-MERGE is a true no-op
    val tieBreak = updates.schema.fieldNames
      .filterNot(c => keyCols.contains(c) || c == versionCol)
      .map(col(_).desc)
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(versionCol).desc +: tieBreak: _*)
    val deduped = updates
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1).drop("_rn")
    // unique per invocation: concurrent writers (batch job + streaming
    // foreachBatch) must not share or race a fixed staging name
    val staging = table + "_stg_" +
      java.util.UUID.randomUUID().toString.replace("-", "").take(12)
    val stringCols = deduped.schema.fields
      .filter(_.dataType == org.apache.spark.sql.types.StringType)
      .map(f => s"${f.name} VARCHAR(32672)") // Derby's max VARCHAR
    val writer = deduped.write.mode(SaveMode.Overwrite)
      .format("jdbc").option("url", url).option("dbtable", staging)
    (if (stringCols.isEmpty) writer
     else writer.option("createTableColumnTypes", stringCols.mkString(", ")))
      .save()
    val cols = deduped.schema.fieldNames
    val colList = cols.map(qid).mkString(", ")
    val onClause = keyCols.map(k => s"t.${qid(k)} = s.${qid(k)}").mkString(" AND ")
    val setClause = cols.filterNot(keyCols.contains)
      .map(c => s"${qid(c)} = s.${qid(c)}").mkString(", ")
    val insertVals = cols.map(c => s"s.${qid(c)}").mkString(", ")
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      // probe existence with a no-row SELECT rather than metadata
      // getTables: the JDBC pattern API treats '_' as a wildcard and
      // is case-folding-sensitive per engine (Derby stores uppercase,
      // PostgreSQL lowercase) — a direct query is exact everywhere
      val exists =
        try {
          val st0 = conn.createStatement()
          try { st0.executeQuery(s"SELECT 1 FROM $table WHERE 1 = 0").close(); true }
          finally st0.close()
        } catch { case _: java.sql.SQLException => false }
      val st = conn.createStatement()
      try {
        if (!exists)
          st.executeUpdate(
            s"CREATE TABLE $table AS SELECT * FROM $staging WITH NO DATA")
        st.executeUpdate(
          s"""MERGE INTO $table t USING $staging s ON $onClause
             |WHEN MATCHED AND s.${qid(versionCol)} >= t.${qid(versionCol)}
             |  THEN UPDATE SET $setClause
             |WHEN NOT MATCHED THEN INSERT ($colList) VALUES ($insertVals)
             |""".stripMargin)
      } finally {
        // always drop the staging copy — even on a failed MERGE —
        // so aborted invocations don't leak uniquely-named tables
        try st.executeUpdate(s"DROP TABLE $staging")
        catch { case _: java.sql.SQLException => () }
        st.close()
      }
    } finally conn.close()
  }

  /** Streaming JDBC upsert with the per-batch commit ledger — the
    * consumer→PostgreSQL leg of the reference as a foreachBatch
    * staging+MERGE, exactly-once in both results (idempotent merge)
    * and effects (ledger skips re-delivered batch ids).
    */
  def streamUpsertJdbc(ticks: DataFrame, url: String, table: String,
      checkpoint: String, keyCols: Seq[String], versionCol: String): StreamingQuery =
    startForeachBatch(ticks, checkpoint) { (batch, id) =>
      commitOnce(batch.sparkSession, s"$checkpoint/graft.commit", id) {
        upsertJdbc(batch, url, table, keyCols, versionCol)
      }: Unit
    }
}
