package graft

import java.nio.file.{Files, Paths, StandardCopyOption}
import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, StreamingQueryListener, Trigger}

/** Streaming throughput benchmark: the reference's job shape — a
  * forever-loop that moves envelope records from a source to a sink
  * (kafka-database-import.go:121,208-214) — measured as SUSTAINED
  * rows/sec under live arrival, not as a one-shot batch time.
  *
  * A feeder thread drips pre-serialized envelope JSONL files into a
  * watched directory on a fixed cadence, respecting the
  * EnvelopeMicroBatchStream name-watermark convention (strictly
  * increasing zero-padded names), while a Structured Streaming query
  * consumes them with a 100 ms ProcessingTime trigger. Three legs, all
  * through the engine's own DSv2 envelope connector:
  *
  *  - `decode`:   stream read → noop. The parse/scan ceiling.
  *  - `pipeline`: stream read → broadcast stream–static semi-join
  *    (the reference's allowlist, R4) → envelope columns → the custom
  *    DSv2 envelope SINK with its per-epoch exactly-once task-commit
  *    protocol. This is the reference's entire job, streaming form;
  *    the sink's row count is validated against a batch-computed
  *    expected count after the run.
  *  - `stateful`: stream read → event-time watermark → tumbling-window
  *    aggregation (update mode) → noop. State-store throughput.
  *
  * Timing starts when the first file lands and ends when the query has
  * processed every staged row (per-query input-row accounting via a
  * StreamingQueryListener, so the measurement is completed-batch
  * based, not wall-guess based). `feed_sec` (arrival window) and
  * `drain_sec` (how long the query ran past the last arrival) are
  * reported so a feed-bound reading is visible as such.
  *
  *   runMain graft.StreamBench [waves] [cadenceMs]
  *
  * Output: one line `STREAMBENCH {json}` with rows/sec per leg.
  * BASELINE.md derives the reference's floor at 62.5 rec/s (250k rows
  * inside its 4,000 s deadline); the engine's pipeline leg is the
  * like-for-like number.
  */
object StreamBench {

  /** Per-query completed-batch input-row totals. recentProgress caps at
    * 100 entries, so long runs would silently undercount — a listener
    * sees every progress event exactly once. */
  private val rowsSeen = new ConcurrentHashMap[java.util.UUID, AtomicLong]()
  private val batchesSeen = new ConcurrentHashMap[java.util.UUID, AtomicLong]()

  private def listen(spark: SparkSession): Unit =
    spark.streams.addListener(new StreamingQueryListener {
      override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
      override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
        val id = e.progress.id
        if (e.progress.numInputRows > 0) {
          rowsSeen.computeIfAbsent(id, _ => new AtomicLong)
            .addAndGet(e.progress.numInputRows)
          batchesSeen.computeIfAbsent(id, _ => new AtomicLong).incrementAndGet()
        }
      }
    })

  private case class Leg(
      rows: Long, sec: Double, feedSec: Double, batches: Long,
      extra: Seq[(String, String)] = Nil) {
    def rps: Double = if (sec > 0) rows / sec else 0.0
    def json: String = {
      val base = Seq(
        "rows" -> rows.toString,
        "sec" -> Bench.f3(sec),
        "rows_per_sec" -> Bench.f3(rps),
        "feed_sec" -> Bench.f3(feedSec),
        "drain_sec" -> Bench.f3(math.max(0.0, sec - feedSec)),
        "batches" -> batches.toString)
      (base ++ extra).map { case (k, v) => s""""$k":$v""" }
        .mkString("{", ",", "}")
    }
  }

  /** Copy the staged wave files into this leg's private stage (cheap
    * local copies — the feeder consumes them by atomic move). */
  private def legStage(master: String, leg: String): Seq[java.nio.file.Path] = {
    val dst = Paths.get(queries.Qh.ioDir(s"sb_stage_$leg"))
    Files.createDirectories(dst)
    val parts = new java.io.File(master).listFiles()
      .filter(f => f.isFile && f.getName.startsWith("part-"))
      .sortBy(_.getName)
    parts.toSeq.map { f =>
      val t = dst.resolve(f.getName)
      Files.copy(f.toPath, t, StandardCopyOption.REPLACE_EXISTING)
      t
    }
  }

  /** Drip the staged files into liveDir and measure until the query has
    * consumed `expectedRows` completed-batch input rows. */
  private def runLeg(
      name: String, spark: SparkSession, master: String, cadenceMs: Long,
      expectedRows: Long,
      build: (DataFrame, String) => StreamingQuery): Leg = {
    val staged = legStage(master, name)
    val live = queries.Qh.ioDir(s"sb_live_$name")
    Files.createDirectories(Paths.get(live))
    val src = spark.readStream.format("graft.sources.EnvelopeSource")
      .option("path", live).load()
    val q = build(src, name)
    val t0 = System.nanoTime()
    @volatile var feedEnd = 0L
    val feeder = new Thread(() => {
      staged.zipWithIndex.foreach { case (f, i) =>
        Files.move(f, Paths.get(live, f"live-$i%06d.jsonl"),
          StandardCopyOption.ATOMIC_MOVE)
        Thread.sleep(cadenceMs)
      }
      feedEnd = System.nanoTime()
    }, s"sb-feeder-$name")
    feeder.setDaemon(true)
    feeder.start()
    val deadline = t0 + 600L * 1000 * 1000 * 1000
    def seen: Long =
      Option(rowsSeen.get(q.id)).map(_.get()).getOrElse(0L)
    while (seen < expectedRows && System.nanoTime() < deadline) Thread.sleep(20)
    val t1 = System.nanoTime()
    feeder.join(10000)
    q.stop(); q.awaitTermination()
    require(seen >= expectedRows,
      s"$name: timed out at $seen/$expectedRows rows")
    Leg(seen, (t1 - t0) / 1e9,
      (math.max(feedEnd, t0) - t0) / 1e9,
      Option(batchesSeen.get(q.id)).map(_.get()).getOrElse(0L))
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val waves = if (args.length > 0) args(0).toInt else 16
    val cadenceMs = if (args.length > 1) args(1).toLong else 50L
    val spark = Engine.session("graft-streambench")
    listen(spark)
    Bench.warmup(spark, sfDir)

    // Stage: serialize every event as one envelope JSONL line, split
    // into `waves` roughly equal files (untimed prep — the reference's
    // upstream database is out of scope for engine throughput).
    val ev = queries.Qh.t(spark, sfDir, "events")
    val master = queries.Qh.ioDir("sb_stage_master")
    sources.KafkaIO.toEnvelope(ev).select("value")
      .repartition(waves).write.mode("overwrite").text(master)
    val total = ev.count()
    val allow = ev.filter(col("event_type") === "signup")
      .select("user_id").distinct().cache()
    val expectedOut = ev.join(allow, Seq("user_id"), "left_semi").count()

    def trg = Trigger.ProcessingTime("100 milliseconds")

    val decode = runLeg("decode", spark, master, cadenceMs, total,
      (src, leg) => src.writeStream.format("noop")
        .option("checkpointLocation", queries.Qh.ioDir(s"sb_ckpt_$leg"))
        .trigger(trg).start())

    val outDir = queries.Qh.ioDir("sb_pipeline_out")
    val pipeline0 = runLeg("pipeline", spark, master, cadenceMs, total,
      (src, leg) => streaming.Streams.streamStaticSemiJoin(src, allow)
        .select("event_id", "event_type", "user_id", "value", "source")
        .writeStream.format("graft.sources.EnvelopeSource")
        .option("path", outDir)
        .option("checkpointLocation", queries.Qh.ioDir(s"sb_ckpt_$leg"))
        .outputMode("append").trigger(trg).start())
    // exactly-once validation: the sink must hold exactly the
    // batch-computed semi-join row count — no loss, no duplication
    // across the drip-fed epochs.
    val sinkRows = spark.read.format("graft.sources.EnvelopeSource")
      .option("path", outDir).load().count()
    val pipeline = pipeline0.copy(extra = Seq(
      "sink_rows" -> sinkRows.toString,
      "expected_rows" -> expectedOut.toString,
      "exactly_once" -> (sinkRows == expectedOut).toString))

    val stateful = runLeg("stateful", spark, master, cadenceMs, total,
      (src, leg) => src
        .withColumn("ts", timestamp_seconds(col("event_id") % 86400))
        .withWatermark("ts", "1 hour")
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n"), sum("value").as("total"))
        .writeStream.format("noop")
        .option("checkpointLocation", queries.Qh.ioDir(s"sb_ckpt_$leg"))
        .outputMode("update").trigger(trg).start())

    require(pipeline.extra.exists { case (k, v) =>
      k == "exactly_once" && v == "true" },
      s"pipeline sink row count $sinkRows != expected $expectedOut")

    // --- tail leg: the commit-log change feed drained LIVE ---
    // A feeder commits `waves` pre-staged parquet batches at the drip
    // cadence; the consumer loops CommitLogTail.drain until the cursor
    // reaches the last version, counting every handed batch's rows (a
    // real scan per version). Throughput = total rows / wall-clock from
    // first commit to last drain — the downstream-sync figure for a
    // table receiving commits at this cadence. Exactly-once is the
    // cursor contract: versions seen once each, row total exact.
    val tailRoot = queries.Qh.ioDir("sb_tail_tbl")
    val tailCkpt = queries.Qh.ioDir("sb_tail_ckpt")
    Seq(tailRoot, tailCkpt).foreach(p =>
      queries.Qh.deleteRecursively(new java.io.File(p)))
    (0 until waves).foreach { w =>
      ev.filter(pmod(col("event_id"), lit(waves)) === w)
        .write.parquet(s"$tailRoot/b$w")
    }
    val tailT0 = System.nanoTime()
    @volatile var tailFeedEnd = 0L
    val tailFeeder = new Thread(() => {
      (0 until waves).foreach { w =>
        sources.CommitLog.commit(tailRoot,
          sources.CommitLog.latestVersion(tailRoot), added = Seq(s"b$w"))
        Thread.sleep(cadenceMs)
      }
      tailFeedEnd = System.nanoTime()
    }, "sb-tail-feeder")
    tailFeeder.setDaemon(true)
    tailFeeder.start()
    var tailRows = 0L
    var tailBatches = 0L
    val tailDeadline = tailT0 + 600L * 1000 * 1000 * 1000
    while (sources.CommitLogTail.lastProcessed(tailCkpt) < waves &&
        System.nanoTime() < tailDeadline) {
      sources.CommitLogTail.drain(spark, tailRoot, tailCkpt) { (df, _) =>
        tailRows += df.count(); tailBatches += 1
      }
      Thread.sleep(10)
    }
    val tailT1 = System.nanoTime()
    tailFeeder.join(10000)
    require(tailRows == total && tailBatches == waves,
      s"tail leg not exactly-once: $tailRows/$total rows, " +
        s"$tailBatches/$waves versions")
    val tail = Leg(tailRows, (tailT1 - tailT0) / 1e9,
      (math.max(tailFeedEnd, tailT0) - tailT0) / 1e9, tailBatches,
      extra = Seq("exactly_once" -> "true"))

    // --- lakeloop leg: live commitlog SOURCE → commitlog SINK ---
    // The full DSv2 loop under drip load: a feeder commits `waves`
    // batches into a source table at the cadence; one streaming query
    // tails it (`readStream.format("commitlog")`, version offsets in
    // Spark's checkpoint) and lands every micro-batch into a SECOND
    // commit-log table through the exactly-once sink (per-epoch txn
    // watermark). Throughput = rows / wall-clock from first commit to
    // the sink table holding them all; exactness = count AND distinct
    // event_id at the sink (a lost epoch, replayed epoch, or
    // double-published batch breaks either).
    val llSrc = queries.Qh.ioDir("sb_ll_src")
    val llDst = queries.Qh.ioDir("sb_ll_dst")
    val llCkpt = queries.Qh.ioDir("sb_ll_ckpt")
    Seq(llSrc, llDst, llCkpt).foreach(p =>
      queries.Qh.deleteRecursively(new java.io.File(p)))
    (0 until waves).foreach { w =>
      ev.filter(pmod(col("event_id"), lit(waves)) === w)
        .write.parquet(s"$llSrc/b$w")
    }
    // declare the schema up front so the stream can plan before the
    // first data commit lands
    sources.CommitLog.commit(llSrc, 0, added = Nil,
      schema = Some(ev.schema.toDDL))
    val llT0 = System.nanoTime()
    @volatile var llFeedEnd = 0L
    val llFeeder = new Thread(() => {
      (0 until waves).foreach { w =>
        sources.CommitLog.commit(llSrc,
          sources.CommitLog.latestVersion(llSrc), added = Seq(s"b$w"))
        Thread.sleep(cadenceMs)
      }
      llFeedEnd = System.nanoTime()
    }, "sb-ll-feeder")
    llFeeder.setDaemon(true)
    llFeeder.start()
    val llQ = spark.readStream.format("commitlog").option("path", llSrc).load()
      .writeStream.format("commitlog")
      .option("path", llDst)
      .option("checkpointLocation", llCkpt)
      .trigger(trg)
      .outputMode("append")
      .start()
    def llLanded: Long =
      if (sources.CommitLog.latestVersion(llDst) == 0) 0L
      else spark.read.format("commitlog").option("path", llDst).load().count()
    val llDeadline = llT0 + 600L * 1000 * 1000 * 1000
    while (llLanded < total && System.nanoTime() < llDeadline) Thread.sleep(100)
    val llT1 = System.nanoTime()
    llQ.stop()
    val llFinal = spark.read.format("commitlog").option("path", llDst).load()
    val llRows = llFinal.count()
    val llDistinct = llFinal.select("event_id").distinct().count()
    require(llRows == total && llDistinct == total,
      s"lakeloop not exactly-once: $llRows rows / $llDistinct distinct of $total")
    val lakeloop = Leg(llRows, (llT1 - llT0) / 1e9,
      (math.max(llFeedEnd, llT0) - llT0) / 1e9,
      sources.CommitLog.latestVersion(llDst).toLong,
      extra = Seq("exactly_once" -> "true"))

    val legs = Seq(
      "decode" -> decode, "pipeline" -> pipeline, "stateful" -> stateful,
      "tail" -> tail, "lakeloop" -> lakeloop)
    val legsJson = legs.map { case (k, l) => s""""$k":${l.json}""" }
      .mkString("{", ",", "}")
    println(
      s"""STREAMBENCH {"metric":"stream_pipeline_rows_per_sec","value":${
        Bench.f3(pipeline.rps)},"unit":"rows/sec","sf":"$sfDir","rows":$total,"waves":$waves,"cadence_ms":$cadenceMs,"legs":$legsJson}""")
    spark.stop()
  }
}
