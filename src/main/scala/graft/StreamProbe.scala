package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Streaming THROUGHPUT probe — the end-to-end ticks/second of the
  * stateful streaming tier, the number to hold against the
  * reference's measured ~1k msg/s single-consumer analytics loop
  * (SURVEY §6: analytics_consumer.py recomputes full-history
  * indicators per tick; graft's streaming tier carries O(1) state
  * per symbol instead). Each probe drives the operator with the sf
  * events table staged as an N-file stream (the file source is the
  * sandbox's Kafka stand-in), runs to completion, and reports
  * rows/second of wall-clock including source, state store and sink
  * — deliberately end-to-end, not kernel-only.
  *
  * Usage: sbt "runMain graft.StreamProbe [sfDir] [files] [replicas]"
  * (SPARK_GRAFT_STATE_STORE=rocksdb swaps the state backend — the
  * disk-spilling provider the cluster runs.)
  */
object StreamProbe {

  /** Best-effort recursive delete for per-run /tmp scratch (staged
    * corpus copies, stream checkpoints) — shared by this probe and
    * the bench so the cleanup discipline cannot drift between the two
    * harnesses. Errors are swallowed: scratch cleanup must never fail
    * a run that already measured.
    */
  private[graft] def deleteRecursively(path: String): Unit =
    try {
      import scala.jdk.CollectionConverters._
      val walk = java.nio.file.Files.walk(java.nio.file.Paths.get(path))
      try walk.iterator().asScala.toSeq.reverse
        .foreach(java.nio.file.Files.deleteIfExists(_))
      finally walk.close()
    } catch { case _: Throwable => () }

  /** Stage the events table as `nFiles` time-ordered stream files with
    * strictly increasing mtimes (same discipline as the specs: the
    * file source orders batches by mtime); `replicas` scales volume
    * AND key cardinality like ScaleProbe (distinct key space per
    * replica). Returns (staged dir, source schema, total rows) —
    * shared by this probe and the bench's streaming group so the two
    * measure the identical source shape.
    */
  private[graft] def stageEvents(spark: SparkSession, dir: String,
      nFiles: Int, replicas: Int): (String, org.apache.spark.sql.types.StructType, Long) = {
    import org.apache.spark.sql.expressions.Window
    val ev0 = Tables.events(spark, dir)
    val ev = if (replicas <= 1) ev0
      else (0 until replicas).map { i =>
        ev0.withColumn("user_id", col("user_id") + lit(i * 1000000L))
          .withColumn("event_id", col("event_id") + lit(i * 100000000L))
      }.reduce(_ unionByName _)
    val total = ev.count()
    val staged = java.nio.file.Files.createTempDirectory("sprobe").toString
    val flat = java.nio.file.Files.createTempDirectory("sprobe_flat")
    ev.withColumn("part",
        org.apache.spark.sql.functions.ntile(nFiles)
          .over(Window.orderBy("ts", "event_id")))
      .write.partitionBy("part").parquet(s"$staged/w")
    val parts = new java.io.File(s"$staged/w").listFiles()
      .filter(_.getName.startsWith("part=")).sortBy(
        f => f.getName.stripPrefix("part=").toInt)
    parts.zipWithIndex.foreach { case (d, i) =>
      d.listFiles().filter(_.getName.endsWith(".parquet")).zipWithIndex
        .foreach { case (f, j) =>
          val dst = flat.resolve(f"f$i%03d_$j%02d.parquet")
          java.nio.file.Files.copy(f.toPath, dst)
          require(dst.toFile.setLastModified(1700000000000L + i * 60000L + j))
        }
    }
    // the partitioned write was only a vehicle for the time split —
    // drop it now or every probe/bench run leaves a corpus copy in /tmp
    deleteRecursively(staged)
    (flat.toString, ev.drop("part").schema, total)
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val nFiles = args.lift(1).map(_.toInt).getOrElse(8)
    val replicas = args.lift(2).map(_.toInt).getOrElse(1)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    if (sys.env.get("SPARK_GRAFT_STATE_STORE").contains("rocksdb")) {
      spark.conf.set("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      println("[stream] state store: RocksDB")
    }
    val (flat, schema, total) = stageEvents(spark, dir, nFiles, replicas)
    // the probe's own scratch: the staged corpus copy plus one
    // checkpoint per probe — deleted after the run (the bench's
    // streaming group has the same discipline)
    val scratch = scala.collection.mutable.ArrayBuffer(flat)

    def probe(name: String, rows: Long)(
        build: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame): Unit = {
      val stream = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(flat)
      val ckpt = java.nio.file.Files.createTempDirectory(s"sprobe_$name").toString
      scratch += ckpt
      val t0 = System.nanoTime()
      val q = build(stream).writeStream.format("noop")
        .option("checkpointLocation", ckpt).start()
      q.processAllAvailable()
      q.stop()
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"[stream] $name%-18s ${rows / secs}%9.0f rows/s " +
        f"($rows rows, $secs%6.2f s, $nFiles batches)")
    }

    try {
      // the reference's consumer loop: full indicator state per tick
      probe("indicators", total)(s =>
        graft.streaming.TickStream.statefulIndicators(spark, s).toDF())
      // gap sessionization — the second stateful operator
      probe("sessionize", total)(s =>
        graft.streaming.TickStream.sessionizeStream(spark, s).toDF())
      // watermark-complete daily grid (state = pending days per symbol)
      probe("price_ffill", total)(s =>
        graft.streaming.TickStream.priceFfillStream(spark, s).toDF())
      // stateless contrast: validation + windowed agg shuffle
      probe("windowed_agg", total)(s =>
        graft.streaming.TickStream.windowedAgg(s))
    } finally scratch.foreach(deleteRecursively)
    spark.stop()
  }
}
