package graft

import graft.streaming.Streams
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import java.sql.Timestamp

/** T6 on the Spark 4 `transformWithState` API (StatefulProcessor +
  * typed state variables over the RocksDB state store) — the successor
  * to flatMapGroupsWithState; both implementations of the per-user
  * running total must agree. */
class TransformWithStateSpec extends SparkSpec {

  test("transformWithState running totals carry state across batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val ckpt = java.nio.file.Files.createTempDirectory("tws_ckpt").toString
    def ts(m: Int) = Timestamp.valueOf(f"2024-01-01 00:$m%02d:00")

    // transformWithState requires the RocksDB provider (multiple column
    // families); the default HDFS-backed store can't host it
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val oldProvider = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val mem = MemoryStream[Streams.Ev]
    val q = Streams.runningTotalsTws(mem.toDS())
      .writeStream.format("memory").queryName("tws_out")
      .option("checkpointLocation", ckpt)
      .outputMode("append").start()
    try {
      mem.addData(Streams.Ev(1, ts(1), 7, 10.50), Streams.Ev(2, ts(2), 9, 5.00))
      q.processAllAvailable()
      mem.addData(Streams.Ev(3, ts(3), 7, 0.25))
      q.processAllAvailable()
      val out = spark.table("tws_out")
        .as[Streams.RunningTotal].collect()
        .map(r => r.event_id -> r.running_total).toMap
      assert(out == Map(1L -> 10.50, 2L -> 5.00, 3L -> 10.75),
        s"unexpected state evolution: $out")
    } finally {
      q.stop()
      oldProvider match {
        case Some(v) => spark.conf.set(providerKey, v)
        case None => spark.conf.unset(providerKey)
      }
    }
  }

  test("ListState bounded buffer keeps the last N ids per key across batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val ckpt = java.nio.file.Files.createTempDirectory("tws_lastn_ckpt").toString
    def ts(m: Int) = Timestamp.valueOf(f"2024-01-01 00:$m%02d:00")

    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val oldProvider = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val mem = MemoryStream[Streams.Ev]
    val q = Streams.lastNTws(mem.toDS(), 3)
      .writeStream.format("memory").queryName("tws_lastn_out")
      .option("checkpointLocation", ckpt)
      .outputMode("update").start()
    try {
      mem.addData(
        Streams.Ev(1, ts(1), 7, 1.0), Streams.Ev(2, ts(2), 7, 1.0))
      q.processAllAvailable()
      mem.addData(
        Streams.Ev(3, ts(3), 7, 1.0), Streams.Ev(4, ts(4), 7, 1.0),
        Streams.Ev(9, ts(4), 8, 1.0))
      q.processAllAvailable()
      // latest update per key: user 7 buffered [2,3,4] (trimmed from 4
      // appends), n_seen carried across batches; user 8 fresh
      val latest = spark.table("tws_lastn_out")
        .groupBy($"user_id")
        .agg(org.apache.spark.sql.functions.max_by(
          org.apache.spark.sql.functions.struct($"n_seen", $"last_ids"),
          $"n_seen").as("s"))
        .select($"user_id", $"s.n_seen", $"s.last_ids")
        .as[(Long, Long, String)].collect()
        .map(r => r._1 -> (r._2, r._3)).toMap
      assert(latest(7L) == (4L, "2,3,4"), s"buffer not trimmed/carried: $latest")
      assert(latest(8L) == (1L, "9"), s"fresh key wrong: $latest")
    } finally {
      q.stop()
      oldProvider match {
        case Some(v) => spark.conf.set(providerKey, v)
        case None => spark.conf.unset(providerKey)
      }
    }
  }

  test("v2 state survives a query RESTART from the checkpoint") {
    // the fault-tolerance story TransformWithStateSpec's in-query tests
    // don't pin: kill the query, start a NEW one on the same
    // checkpoint — the RocksDB snapshot+changelog must restore the
    // ValueState, not just carry it between micro-batches
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val ckpt = java.nio.file.Files.createTempDirectory("tws_restart_ckpt").toString
    def ts(m: Int) = Timestamp.valueOf(f"2024-01-01 00:$m%02d:00")

    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val oldProvider = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val mem = MemoryStream[Streams.Ev]
    // memory sink refuses checkpoint recovery — use the file sink,
    // which is the recovery-capable path anyway
    val outDir = java.nio.file.Files.createTempDirectory("tws_restart_out").toString
    def start() = Streams.runningTotalsTws(mem.toDS())
      .writeStream.format("parquet").option("path", outDir)
      .option("checkpointLocation", ckpt)
      .outputMode("append").start()
    try {
      val q1 = start()
      mem.addData(Streams.Ev(1, ts(1), 7, 10.50))
      q1.processAllAvailable()
      q1.stop()
      val q2 = start()
      try {
        mem.addData(Streams.Ev(2, ts(2), 7, 0.25))
        q2.processAllAvailable()
        val out = spark.read.parquet(outDir)
          .as[Streams.RunningTotal].collect()
          .map(r => r.event_id -> r.running_total).toMap
        assert(out.get(2L).contains(10.75),
          s"state lost across restart (expected 10.50 carried): $out")
      } finally q2.stop()
    } finally {
      oldProvider match {
        case Some(v) => spark.conf.set(providerKey, v)
        case None => spark.conf.unset(providerKey)
      }
    }
  }

  test("ListState buffer survives a kill-and-restart from the RocksDB checkpoint") {
    // the restart test for TYPED LIST state: the ValueState restart
    // test can pass off a single restored blob — here the buffer + the
    // seen-counter must BOTH come back from the RocksDB
    // snapshot+changelog, and the trim must keep operating on the
    // restored list, not a fresh one
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val ckpt = java.nio.file.Files.createTempDirectory("tws_lastn_restart_ckpt").toString
    val outDir = java.nio.file.Files.createTempDirectory("tws_lastn_restart_out").toString
    def ts(m: Int) = Timestamp.valueOf(f"2024-01-01 00:$m%02d:00")

    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val oldProvider = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val mem = MemoryStream[Streams.Ev]
    def start() = Streams.lastNTws(mem.toDS(), 3)
      .writeStream.format("parquet").option("path", outDir)
      .option("checkpointLocation", ckpt)
      .outputMode("append").start()
    try {
      val q1 = start()
      mem.addData(Streams.Ev(1, ts(1), 7, 1.0), Streams.Ev(2, ts(2), 7, 1.0))
      q1.processAllAvailable()
      q1.stop() // kill between micro-batches
      val q2 = start()
      try {
        mem.addData(Streams.Ev(3, ts(3), 7, 1.0), Streams.Ev(4, ts(4), 7, 1.0))
        q2.processAllAvailable()
        val latest = spark.read.parquet(outDir).as[Streams.LastN]
          .collect().maxBy(_.n_seen)
        // restored [1,2] ++ fresh [3,4], trimmed to the last 3; a lost
        // list would read "3,4", a lost counter n_seen=2
        assert(latest == Streams.LastN(7L, 4L, "2,3,4"),
          s"ListState not restored across restart: $latest")
      } finally q2.stop()
    } finally {
      oldProvider match {
        case Some(v) => spark.conf.set(providerKey, v)
        case None => spark.conf.unset(providerKey)
      }
    }
  }

  test("a registered event-time timer survives a kill-and-restart and still fires") {
    // open a session (state + ONE registered timer), kill the query
    // BEFORE any watermark passes the timer, restart on the checkpoint,
    // then advance the watermark: the restored timer must fire and
    // close the PRE-RESTART session even though its key never sends
    // another row after the restart
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val ckpt = java.nio.file.Files.createTempDirectory("tws_timer_restart_ckpt").toString
    val outDir = java.nio.file.Files.createTempDirectory("tws_timer_restart_out").toString
    def ts(m: Int) = Timestamp.valueOf(f"2024-01-01 00:$m%02d:00")
    def ms(m: Int) = ts(m).getTime

    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val oldProvider = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val mem = MemoryStream[Streams.Ev]
    def start() = Streams.sessionTimeoutTws(mem.toDS(), gapMs = 5 * 60 * 1000)
      .writeStream.format("parquet").option("path", outDir)
      .option("checkpointLocation", ckpt)
      .outputMode("append").start()
    try {
      val q1 = start()
      mem.addData(Streams.Ev(1, ts(1), 7, 1.0), Streams.Ev(2, ts(3), 7, 1.0))
      q1.processAllAvailable()
      q1.stop() // killed with the session open and its timer registered
      val q2 = start()
      try {
        // watermark jumps past 00:08 via an unrelated key — user 7's
        // RESTORED timer must fire in the ensuing batch
        mem.addData(Streams.Ev(10, ts(30), 9, 1.0))
        q2.processAllAvailable()
        val out = spark.read.parquet(outDir).as[Streams.SessionOut]
          .collect().toSet
        assert(out.contains(Streams.SessionOut(7, ms(1), ms(3), 2)),
          s"pre-restart session never closed — timer lost in restart: $out")
        assert(out.count(_.user_id == 7L) == 1,
          s"session emitted more than once across restart: $out")
      } finally q2.stop()
    } finally {
      oldProvider match {
        case Some(v) => spark.conf.set(providerKey, v)
        case None => spark.conf.unset(providerKey)
      }
    }
  }

  test("event-time timers close sessions on watermark, extend on in-gap arrivals") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val ckpt = java.nio.file.Files.createTempDirectory("tws_timer_ckpt").toString
    def ts(m: Int) = Timestamp.valueOf(f"2024-01-01 00:$m%02d:00")
    def ms(m: Int) = ts(m).getTime

    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val oldProvider = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val mem = MemoryStream[Streams.Ev]
    val q = Streams.sessionTimeoutTws(mem.toDS(), gapMs = 5 * 60 * 1000)
      .writeStream.format("memory").queryName("tws_timer_out")
      .option("checkpointLocation", ckpt)
      .outputMode("append").start()
    try {
      // open a session for user 7, then EXTEND it within the gap in a
      // later micro-batch (the old timer must be deleted, not fire)
      mem.addData(Streams.Ev(1, ts(1), 7, 1.0))
      q.processAllAvailable()
      mem.addData(Streams.Ev(2, ts(4), 7, 1.0))
      q.processAllAvailable()
      assert(spark.table("tws_timer_out").isEmpty,
        "session emitted before its gap elapsed")
      // an unrelated user's event advances the watermark past 00:09 —
      // user 7's timer fires in the ensuing no-data batch even though
      // user 7 never sends another row
      mem.addData(Streams.Ev(10, ts(30), 9, 1.0))
      q.processAllAvailable()
      val out = spark.table("tws_timer_out")
        .as[Streams.SessionOut].collect().toSet
      assert(out == Set(Streams.SessionOut(7, ms(1), ms(4), 2)),
        s"want ONE extended session for user 7: $out")
      // user 9's session is still open (watermark hasn't passed 00:35)
      mem.addData(Streams.Ev(11, Timestamp.valueOf("2024-01-01 01:00:00"), 5, 1.0))
      q.processAllAvailable()
      val out2 = spark.table("tws_timer_out")
        .as[Streams.SessionOut].collect().toSet
      assert(out2.contains(Streams.SessionOut(9, ms(30), ms(30), 1)),
        s"user 9's timeout never fired: $out2")
    } finally {
      q.stop()
      oldProvider match {
        case Some(v) => spark.conf.set(providerKey, v)
        case None => spark.conf.unset(providerKey)
      }
    }
  }

  test("two gap-separated bursts in ONE micro-batch yield TWO sessions") {
    // gap-sessionization must not depend on how events batch up: a
    // single batch carrying bursts at 00:01-00:02 and 00:20 (gap 5 min)
    // is two sessions — the first closes immediately (nothing can ever
    // extend it), the second stays open for its timer
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val ckpt = java.nio.file.Files.createTempDirectory("tws_burst_ckpt").toString
    def ts(m: Int) = Timestamp.valueOf(f"2024-01-01 00:$m%02d:00")
    def ms(m: Int) = ts(m).getTime

    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val oldProvider = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val mem = MemoryStream[Streams.Ev]
    val q = Streams.sessionTimeoutTws(mem.toDS(), gapMs = 5 * 60 * 1000)
      .writeStream.format("memory").queryName("tws_burst_out")
      .option("checkpointLocation", ckpt)
      .outputMode("append").start()
    try {
      mem.addData(
        Streams.Ev(1, ts(1), 7, 1.0), Streams.Ev(2, ts(2), 7, 1.0),
        Streams.Ev(3, ts(20), 7, 1.0))
      q.processAllAvailable()
      val immediate = spark.table("tws_burst_out")
        .as[Streams.SessionOut].collect().toSet
      assert(immediate == Set(Streams.SessionOut(7, ms(1), ms(2), 2)),
        s"first burst should close on arrival, got: $immediate")
      // advance the watermark past 00:25 — the open second burst times out
      mem.addData(Streams.Ev(10, ts(50), 9, 1.0))
      q.processAllAvailable()
      val after = spark.table("tws_burst_out")
        .as[Streams.SessionOut].collect().toSet
      assert(after.contains(Streams.SessionOut(7, ms(20), ms(20), 1)),
        s"second burst never closed: $after")
      assert(after.count(_.user_id == 7L) == 2, s"want exactly 2 sessions: $after")
    } finally {
      q.stop()
      oldProvider match {
        case Some(v) => spark.conf.set(providerKey, v)
        case None => spark.conf.unset(providerKey)
      }
    }
  }

  test("transformWithState agrees with flatMapGroupsWithState in batch") {
    import spark.implicits._
    val ev = Tables(spark, sf0001, "events")
      .selectExpr("event_id", "ts", "user_id", "value").as[Streams.Ev]
    // transformWithState is streaming-only; in batch, the contract is
    // that flatMapGroupsWithState matches the t6 decl's window oracle
    val viaFmgws = Streams.runningTotals(ev).toDF()
    val expected = SparkEntry.queries("t6_stateful_running")(spark, sf0001)
    assert(viaFmgws.orderBy("user_id", "event_id").except(expected).count() == 0)
  }
}
