package graft

import graft.sources.Sinks
import graft.streaming.TickStream
import org.apache.spark.sql.functions._

class SinksSpec extends SparkSuite {
  import spark.implicits._

  test("upsertParquet keeps latest row per key across merges") {
    val path = java.nio.file.Files.createTempDirectory("upsert").toString + "/t"
    val batch1 = Seq((1L, "2024-01-01", 10.0), (2L, "2024-01-01", 20.0))
      .toDF("id", "day", "price")
    Sinks.upsertParquet(batch1, path, Seq("id"), "day")
    val batch2 = Seq((2L, "2024-01-02", 25.0), (3L, "2024-01-01", 30.0))
      .toDF("id", "day", "price")
    Sinks.upsertParquet(batch2, path, Seq("id"), "day")
    val result = spark.read.parquet(path).orderBy("id").collect()
    assert(result.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L))
    assert(result(1).getDouble(2) == 25.0, "id=2 should take the newer price")
  }

  test("companyUpsert: updates overwrite info, inserts add keys, identity survives") {
    val base = graft.Tables.customer(spark, sfDir)
      .select("c_custkey", "c_name", "c_nationkey", "c_acctbal",
        "c_mktsegment").collect()
      .map(r => r.getLong(0) -> r).toMap
    val out = Sinks.companyUpsert(spark, sfDir).collect()
    // one row per key; the key space = base ∪ synthesized inserts
    val keys = out.map(_.getAs[Long]("c_custkey"))
    assert(keys.toSet.size == keys.length, "merge must emit one row per key")
    val expectedInserts = base.keySet.filter(_ % 13 == 0).map(_ + 1000000L)
    assert(keys.toSet == base.keySet ++ expectedInserts)
    val byAction = out.groupBy(_.getAs[String]("action"))
    assert(byAction("insert").map(_.getAs[Long]("c_custkey")).toSet ==
      expectedInserts)
    assert(byAction("update").map(_.getAs[Long]("c_custkey")).toSet ==
      base.keySet.filter(_ % 7 == 0))
    byAction("update").foreach { r =>
      val b = base(r.getAs[Long]("c_custkey"))
      // identity preserved (get_or_create keeps the existing row's
      // identity); mutable info overwritten (update_company_info)
      assert(r.getAs[String]("c_name") == b.getAs[String]("c_name"))
      assert(r.getAs[Int]("c_nationkey") == b.getAs[Int]("c_nationkey"))
      assert(r.getAs[String]("c_mktsegment") == "REASSIGNED")
      assert(r.getAs[Double]("c_acctbal") ==
        (r.getAs[Long]("c_custkey") % 1000L).toDouble)
    }
    byAction("carry").foreach { r =>
      val b = base(r.getAs[Long]("c_custkey"))
      assert(r.getAs[String]("c_mktsegment") == b.getAs[String]("c_mktsegment")
        && r.getAs[Double]("c_acctbal") == b.getAs[Double]("c_acctbal"),
        "carried rows must pass through unmodified")
    }
  }

  test("companyScd2: history preserved, one current row per key") {
    val baseKeys = graft.Tables.customer(spark, sfDir)
      .select("c_custkey").collect().map(_.getLong(0)).toSet
    val rows = Sinks.companyScd2(spark, sfDir).collect()
    val byKey = rows.groupBy(_.getAs[Long]("c_custkey"))
    byKey.foreach { case (k, vs) =>
      // exactly one OPEN row per key; updates close their v0 row
      assert(vs.count(_.getAs[Boolean]("is_current")) == 1, s"key $k")
      if (baseKeys(k) && k % 7 == 0) {
        assert(vs.length == 2, s"updated key $k must keep both versions")
        val v0 = vs.find(_.getAs[Int]("valid_from") == 0).get
        assert(!v0.getAs[Boolean]("is_current")
          && v0.getAs[Int]("valid_to") == 1, s"key $k v0 must close at 1")
        val v1 = vs.find(_.getAs[Int]("valid_from") == 1).get
        assert(v1.getAs[String]("c_mktsegment") == "REASSIGNED")
      } else {
        assert(vs.length == 1, s"key $k must have one version")
        assert(vs.head.getAs[Boolean]("is_current"))
      }
    }
    // history append-only: every base attribute row survives verbatim
    val v0Rows = rows.filter(_.getAs[Int]("valid_from") == 0)
    assert(v0Rows.length == baseKeys.size, "no base row may vanish")
  }

  test("upsert is idempotent (re-applying a batch changes nothing)") {
    val path = java.nio.file.Files.createTempDirectory("upsert_idem").toString + "/t"
    val batch = Seq((1L, "2024-01-01", 10.0)).toDF("id", "day", "price")
    Sinks.upsertParquet(batch, path, Seq("id"), "day")
    Sinks.upsertParquet(batch, path, Seq("id"), "day")
    assert(spark.read.parquet(path).count() == 1)
  }

  test("upsertPartitioned merges by key and rewrites only touched partitions") {
    val path = java.nio.file.Files.createTempDirectory("upsert_part").toString + "/t"
    val batch1 = Seq(
      (1L, 1L, 10.0, "2024-01-01"), (2L, 1L, 20.0, "2024-01-01"),
      (3L, 1L, 30.0, "2024-01-02"), (4L, 1L, 40.0, "2024-01-03"))
      .toDF("id", "v", "price", "day")
    Sinks.upsertPartitioned(batch1, path, Seq("id"), "v", "day")

    def filesOf(day: String): Map[String, Long] = {
      val d = new java.io.File(s"$path/day=$day")
      d.listFiles().filter(_.getName.endsWith(".parquet"))
        .map(f => f.getName -> f.lastModified()).toMap
    }
    val d2Before = filesOf("2024-01-02")
    val d3Before = filesOf("2024-01-03")

    // update a 01-01 key, add a new key to 01-01 — other days untouched
    val batch2 = Seq(
      (2L, 2L, 21.0, "2024-01-01"), (9L, 1L, 90.0, "2024-01-01"))
      .toDF("id", "v", "price", "day")
    Sinks.upsertPartitioned(batch2, path, Seq("id"), "v", "day")

    assert(filesOf("2024-01-02") == d2Before, "untouched partition rewritten")
    assert(filesOf("2024-01-03") == d3Before, "untouched partition rewritten")
    val result = spark.read.parquet(path)
    assert(result.count() == 5)
    val id2 = result.filter("id = 2").head
    assert(id2.getAs[Double]("price") == 21.0, "id=2 should take newer version")
    assert(result.filter("id = 9").count() == 1)
  }

  test("upsertPartitioned is idempotent per partition") {
    val path = java.nio.file.Files.createTempDirectory("upsert_part_idem").toString + "/t"
    val batch = Seq((1L, 1L, 10.0, "2024-01-01")).toDF("id", "v", "price", "day")
    Sinks.upsertPartitioned(batch, path, Seq("id"), "v", "day")
    Sinks.upsertPartitioned(batch, path, Seq("id"), "v", "day")
    assert(spark.read.parquet(path).count() == 1)
  }

  test("compactPartitions shrinks fragmented partitions, leaves compact ones") {
    val path = java.nio.file.Files.createTempDirectory("compact").toString + "/t"
    // fragment day 1 with 12 single-row appends; day 2 stays compact
    (1 to 12).foreach { i =>
      Seq((i.toLong, i * 1.0, "2024-01-01")).toDF("id", "price", "day")
        .coalesce(1).write.mode("append").partitionBy("day").parquet(path)
    }
    Seq((100L, 1.0, "2024-01-02"), (101L, 2.0, "2024-01-02")).toDF("id", "price", "day")
      .coalesce(1).write.mode("append").partitionBy("day").parquet(path)

    def files(day: String): Map[String, Long] = {
      val d = new java.io.File(s"$path/day=$day")
      d.listFiles().filter(_.getName.endsWith(".parquet"))
        .map(f => f.getName -> f.lastModified()).toMap
    }
    assert(files("2024-01-01").size == 12)
    val d2Before = files("2024-01-02")
    val before = spark.read.parquet(path).collect().map(_.toString).sorted

    Sinks.compactPartitions(spark, path, "day", maxFiles = 8, targetFiles = 1)

    assert(files("2024-01-01").size == 1, "fragmented partition not compacted")
    assert(files("2024-01-02") == d2Before, "compact partition was rewritten")
    val after = spark.read.parquet(path).collect().map(_.toString).sorted
    assert(before.sameElements(after), "compaction changed the data")
  }

  test("commitBatchOnce applies a batch once and skips the replay") {
    val dir = java.nio.file.Files.createTempDirectory("once").toString
    val path = dir + "/t"
    val ledger = dir + "/ckpt/graft.commit"
    val batch = Seq((1L, 1L, 10.0)).toDF("id", "v", "price")
    assert(graft.sources.Sinks.commitBatchOnce(
      batch, path, ledger, Seq("id"), "v", 0L))
    def state() = {
      val files = new java.io.File(path).listFiles()
        .filter(_.getName.endsWith(".parquet"))
        .map(f => f.getName -> f.lastModified()).toMap
      (files, spark.read.parquet(path).collect().map(_.toString).sorted.toSeq)
    }
    val before = state()
    // crash-replay of the SAME batch id must be a complete no-op
    val differentPayload = Seq((1L, 9L, 99.0)).toDF("id", "v", "price")
    assert(!graft.sources.Sinks.commitBatchOnce(
      differentPayload, path, ledger, Seq("id"), "v", 0L))
    assert(state() == before, "replayed batch must not touch the table")
    // the NEXT batch id applies normally
    assert(graft.sources.Sinks.commitBatchOnce(
      Seq((2L, 2L, 20.0)).toDF("id", "v", "price"), path, ledger, Seq("id"), "v", 1L))
    assert(spark.read.parquet(path).count() == 2)
    // a truncated/corrupt ledger degrades to re-apply, never to a crash
    java.nio.file.Files.writeString(java.nio.file.Paths.get(ledger), "")
    assert(graft.sources.Sinks.commitBatchOnce(
      Seq((3L, 3L, 30.0)).toDF("id", "v", "price"), path, ledger, Seq("id"), "v", 0L))
    assert(spark.read.parquet(path).count() == 3)
  }

  test("commitBatchOnce handles a URI-style ledger path (Hadoop FS)") {
    val dir = java.nio.file.Files.createTempDirectory("once_uri").toString
    val path = dir + "/t"
    val ledgerUri = s"file:$dir/ckpt/graft.commit"
    val batch = Seq((1L, 1L, 10.0)).toDF("id", "v", "price")
    assert(graft.sources.Sinks.commitBatchOnce(
      batch, path, ledgerUri, Seq("id"), "v", 0L))
    // the ledger landed at the REAL location, not a cwd-mangled one
    assert(new java.io.File(s"$dir/ckpt/graft.commit").exists(),
      "URI ledger path must resolve through the Hadoop filesystem")
    assert(!graft.sources.Sinks.commitBatchOnce(
      batch, path, ledgerUri, Seq("id"), "v", 0L), "replay must be skipped")
  }

  test("streamUpsertExactlyOnce lands the stream like streamUpsert") {
    val out = java.nio.file.Files.createTempDirectory("stream_once").toString
    val q = graft.sources.Sinks.streamUpsertExactlyOnce(
      TickStream.eventsStream(spark, sfDir),
      s"$out/table", s"$out/ckpt", Seq("user_id", "ts"), "event_id")
    q.processAllAvailable()
    q.stop()
    val landed = spark.read.parquet(s"$out/table")
    assert(landed.groupBy("user_id", "ts").count().filter("count > 1").count() == 0)
    assert(landed.count() > 0)
    // ledger recorded the last batch, namespaced under the checkpoint
    assert(new java.io.File(s"$out/ckpt/graft.commit").exists())
  }

  private def readJdbc(url: String, table: String) =
    spark.read.format("jdbc").option("url", url).option("dbtable", table).load()

  test("upsertJdbc merges newest-per-key into Derby across batches") {
    val db = java.nio.file.Files.createTempDirectory("derby").toString + "/db"
    val url = s"jdbc:derby:$db;create=true"
    val b1 = Seq((1L, 1L, 10.0, "A"), (2L, 1L, 20.0, "B"),
      (2L, 2L, 21.0, "B2")) // in-batch duplicate: newest must stage
      .toDF("id", "v", "price", "tag")
    Sinks.upsertJdbc(b1, url, "prices", Seq("id"), "v")
    val r1 = readJdbc(url, "prices").orderBy("id").collect()
    assert(r1.map(_.getLong(0)).toSeq == Seq(1L, 2L))
    assert(r1(1).getDouble(2) == 21.0, "in-batch dedup must keep newest")
    // update id=1, insert id=3, stale id=2 (v=0) must lose
    val b2 = Seq((1L, 2L, 11.0, "A2"), (3L, 1L, 30.0, "C"), (2L, 0L, 99.0, "stale"))
      .toDF("id", "v", "price", "tag")
    Sinks.upsertJdbc(b2, url, "prices", Seq("id"), "v")
    val r2 = readJdbc(url, "prices").orderBy("id").collect()
    assert(r2.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L))
    assert(r2(0).getDouble(2) == 11.0 && r2(0).getString(3) == "A2")
    assert(r2(1).getDouble(2) == 21.0, "stale version must not overwrite")
    // equal version: the update wins (reference ON CONFLICT semantics)
    Sinks.upsertJdbc(Seq((3L, 1L, 31.0, "C2")).toDF("id", "v", "price", "tag"),
      url, "prices", Seq("id"), "v")
    assert(readJdbc(url, "prices").filter("id = 3").head.getDouble(2) == 31.0)
  }

  test("streamUpsertJdbc lands the stream exactly-once into Derby") {
    val out = java.nio.file.Files.createTempDirectory("stream_jdbc").toString
    val url = s"jdbc:derby:$out/db;create=true"
    val q = Sinks.streamUpsertJdbc(
      TickStream.eventsStream(spark, sfDir),
      url, "ticks", s"$out/ckpt", Seq("user_id", "ts"), "event_id")
    q.processAllAvailable()
    q.stop()
    val landed = readJdbc(url, "ticks")
    assert(landed.count() > 0)
    assert(landed.groupBy("user_id", "ts").count().filter("count > 1").count() == 0)
    assert(new java.io.File(s"$out/ckpt/graft.commit").exists())
    // replaying the last committed batch id is a no-op (crash replay)
    val before = landed.collect().map(_.toString).sorted.toSeq
    val events = Tables.events(spark, sfDir).limit(10)
    val applied = Sinks.commitOnce(spark, s"$out/ckpt/graft.commit", 0L) {
      Sinks.upsertJdbc(events, url, "ticks", Seq("user_id", "ts"), "event_id")
    }
    assert(!applied, "batch 0 was already committed by the stream")
    assert(readJdbc(url, "ticks").collect().map(_.toString).sorted.toSeq == before)
  }

  test("streaming foreachBatch upsert lands deduped ticks") {
    val out = java.nio.file.Files.createTempDirectory("stream_upsert").toString
    val q = Sinks.streamUpsert(
      TickStream.eventsStream(spark, sfDir),
      s"$out/table", s"$out/ckpt", Seq("user_id", "ts"), "event_id")
    q.processAllAvailable()
    q.stop()
    val landed = spark.read.parquet(s"$out/table")
    assert(landed.groupBy("user_id", "ts").count().filter("count > 1").count() == 0)
    assert(landed.count() > 0)
  }

  test("producer-shaped JSON roundtrip: to_json -> parseTicks preserves ticks") {
    val json = Tables.events(spark, sfDir).select(to_json(struct(
      col("user_id").cast("string").as("ticker_symbol"),
      col("value").as("current_price"),
      col("ts").as("trade_datetime"),
      col("ts").as("timestamp"),
      lit(100L).as("volume"))).as("value"))
    val parsed = TickStream.parseTicks(json)
    assert(parsed.count() == Tables.events(spark, sfDir)
      .filter("value > 0 AND user_id IS NOT NULL").count())
  }
}
