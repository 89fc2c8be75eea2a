package graft

import graft.streaming.Streams
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** SURVEY §2.B T1–T8 streaming-only semantics, driven by MemoryStream:
  * incremental windowed aggregation, watermark late-data drop, stateful
  * dedup, arbitrary state across micro-batches, foreachBatch→JDBC. */
class StreamingSpec extends SparkSpec {

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 ${minute / 60}%02d:${minute % 60}%02d:00")

  case class E(event_id: Long, ts: Timestamp, user_id: Long, event_type: String, value: Double)

  test("T1: tumbling window counts accumulate across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[E]
    val q = Streams.tumblingCounts(mem.toDF())
      .writeStream.format("memory").queryName("t1_out")
      .outputMode("complete").start()
    try {
      mem.addData(E(1, ts(1), 1, "click", 1.0), E(2, ts(2), 1, "click", 1.0))
      q.processAllAvailable()
      mem.addData(E(3, ts(11), 1, "click", 1.0))
      q.processAllAvailable()
      val out = spark.table("t1_out")
        .select($"window_start_ms", $"n").as[(Long, Long)].collect().toMap
      assert(out.size == 2)
      assert(out.values.toSeq.sorted == Seq(1L, 2L))
    } finally q.stop()
  }

  test("T4: watermark drops data later than the horizon") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[E]
    val q = Streams.watermarkedTumbling(mem.toDF())
      .writeStream.format("memory").queryName("t4_out")
      .outputMode("append").start()
    try {
      // advance event time far ahead → watermark = 200min - 60min = 140min
      mem.addData(E(1, ts(5), 1, "click", 1.0), E(2, ts(200), 1, "click", 1.0))
      q.processAllAvailable()
      // this event is way behind the watermark → must be dropped
      mem.addData(E(3, ts(6), 1, "click", 1.0))
      q.processAllAvailable()
      // close all windows by advancing further
      mem.addData(E(4, ts(400), 1, "click", 1.0))
      q.processAllAvailable()
      val out = spark.table("t4_out")
        .select($"window_start_ms", $"n").as[(Long, Long)].collect().toMap
      // the 00:00 window emitted with count 1 (late event 3 dropped)
      val w0 = ts(0).getTime
      assert(out(w0) == 1L, s"late row leaked into closed window: $out")
    } finally q.stop()
  }

  test("T5: dropDuplicatesWithinWatermark suppresses re-delivered events") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[E]
    val q = Streams.dedupWithinWatermark(mem.toDF())
      .writeStream.format("memory").queryName("t5_out")
      .outputMode("append").start()
    try {
      mem.addData(E(1, ts(1), 1, "click", 1.0), E(2, ts(2), 1, "click", 1.0))
      q.processAllAvailable()
      // re-deliver event 1 (at-least-once upstream) within the horizon
      mem.addData(E(1, ts(1), 1, "click", 1.0), E(3, ts(3), 1, "click", 1.0))
      q.processAllAvailable()
      assert(spark.table("t5_out").count() == 3, "duplicate leaked")
    } finally q.stop()
  }

  test("T6: flatMapGroupsWithState carries state across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Streams.Ev]
    val q = Streams.runningTotals(mem.toDS())
      .writeStream.format("memory").queryName("t6_out")
      .outputMode("append").start()
    try {
      mem.addData(Streams.Ev(1, ts(1), 7, 10.50))
      q.processAllAvailable()
      mem.addData(Streams.Ev(2, ts(2), 7, 0.25))
      q.processAllAvailable()
      val out = spark.table("t6_out")
        .select($"event_id", $"running_total").as[(Long, Double)].collect().toMap
      assert(out(1L) == 10.50)
      assert(out(2L) == 10.75, s"state not carried across batches: $out")
    } finally q.stop()
  }

  test("T9: stream-stream interval join matches across micro-batches with bounded state") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val purchases = MemoryStream[E]
    val clicks = MemoryStream[E]
    val q = Streams.streamStreamJoin(
        purchases.toDF().withWatermark("ts", "2 hours"),
        clicks.toDF().withWatermark("ts", "2 hours"))
      .writeStream.format("memory").queryName("t9_out")
      .outputMode("append").start()
    try {
      // click arrives FIRST, matching purchase in a LATER micro-batch —
      // the join must buffer the click in state until the purchase lands
      clicks.addData(E(10, ts(30), 1, "click", 1.0))
      q.processAllAvailable()
      purchases.addData(E(1, ts(70), 1, "purchase", 5.0))
      q.processAllAvailable()
      // out-of-window click (>1h before the purchase) and other-user
      // click: no match
      clicks.addData(E(11, ts(5), 1, "click", 1.0), E(12, ts(55), 2, "click", 1.0))
      purchases.addData(E(2, ts(140), 1, "purchase", 5.0))
      q.processAllAvailable()
      val out = spark.table("t9_out")
        .select($"purchase_id", $"click_id").as[(Long, Long)].collect().toSet
      assert(out == Set((1L, 10L)), s"unexpected matches: $out")
    } finally q.stop()
  }

  test("T9d: left-semi stream-stream join emits each converted purchase exactly once") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val purchases = MemoryStream[E]
    val clicks = MemoryStream[E]
    val q = Streams.streamStreamLeftSemi(
        purchases.toDF().withWatermark("ts", "2 hours"),
        clicks.toDF().withWatermark("ts", "2 hours"))
      .writeStream.format("memory").queryName("t9d_out")
      .outputMode("append").start()
    try {
      // TWO qualifying clicks for purchase 1 — an inner join would fan
      // out to two rows; semi must emit the purchase exactly once
      clicks.addData(E(10, ts(30), 1, "click", 1.0), E(11, ts(40), 1, "click", 1.0))
      q.processAllAvailable()
      purchases.addData(E(1, ts(70), 1, "purchase", 5.0))
      // purchase 2 has no qualifying click: never emits
      purchases.addData(E(2, ts(70), 2, "purchase", 5.0))
      q.processAllAvailable()
      val out = spark.table("t9d_out")
        .select($"purchase_id").as[Long].collect().toSeq
      assert(out == Seq(1L), s"semi join emitted: $out (want exactly one row for purchase 1)")
    } finally q.stop()
  }

  test("T9b: left-outer stream-stream join emits null-padded rows only after the watermark passes") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val purchases = MemoryStream[E]
    val clicks = MemoryStream[E]
    val q = Streams.streamStreamLeftOuter(
        purchases.toDF().withWatermark("ts", "0 seconds"),
        clicks.toDF().withWatermark("ts", "0 seconds"))
      .writeStream.format("memory").queryName("t9b_out")
      .outputMode("append").start()
    try {
      // a purchase with NO click: its null-padded row cannot appear yet
      // (a match could still arrive within the hour horizon)
      purchases.addData(E(1, ts(70), 1, "purchase", 5.0))
      clicks.addData(E(10, ts(30), 2, "click", 1.0)) // other user
      q.processAllAvailable()
      val early = spark.table("t9b_out")
        .filter($"purchase_id" === 1).count()
      assert(early == 0L, "outer row emitted before the watermark closed the horizon")
      // advance BOTH watermarks far past the purchase's horizon: the
      // unmatched purchase must now emit exactly once, null-padded
      purchases.addData(E(2, ts(500), 3, "purchase", 5.0))
      clicks.addData(E(11, ts(500), 2, "click", 1.0))
      q.processAllAvailable()
      val out = spark.table("t9b_out")
        .select($"purchase_id", $"click_id")
        .as[(Long, Option[Long])].collect().toSet
      assert(out.contains((1L, None)),
        s"missing null-padded outer row for purchase 1: $out")
    } finally q.stop()
  }

  test("T9c: full-outer stream-stream join null-pads BOTH unmatched sides after the watermark") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val purchases = MemoryStream[E]
    val clicks = MemoryStream[E]
    val q = Streams.streamStreamFullOuter(
        purchases.toDF().withWatermark("ts", "0 seconds"),
        clicks.toDF().withWatermark("ts", "0 seconds"))
      .writeStream.format("memory").queryName("t9c_out")
      .outputMode("append").start()
    try {
      // an unmatched purchase AND an unmatched click (different users)
      purchases.addData(E(1, ts(70), 1, "purchase", 5.0))
      clicks.addData(E(10, ts(30), 2, "click", 1.0))
      q.processAllAvailable()
      // advance both watermarks far past both horizons
      purchases.addData(E(2, ts(600), 3, "purchase", 5.0))
      clicks.addData(E(11, ts(600), 4, "click", 1.0))
      q.processAllAvailable()
      val out = spark.table("t9c_out")
        .select($"purchase_id", $"click_id")
        .as[(Option[Long], Option[Long])].collect().toSet
      assert(out.contains((Some(1L), None)),
        s"missing null-padded row for the unmatched purchase: $out")
      assert(out.contains((None, Some(10L))),
        s"missing null-padded row for the unmatched click: $out")
    } finally q.stop()
  }

  test("T8: foreachBatch lands micro-batches in a JDBC (Derby) table") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val url = "jdbc:derby:memory:graft_t8;create=true"
    val props = new java.util.Properties()
    props.setProperty("driver", "org.apache.derby.jdbc.EmbeddedDriver")
    // fresh table per run
    val mem = MemoryStream[E]
    val q = mem.toDF()
      .writeStream
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, id: Long) =>
        Streams.jdbcForeachBatchWriter(url, "t8_sink", props)(
          df.select($"event_id", $"user_id", $"value"), id)
      }
      .outputMode("append").start()
    try {
      mem.addData(E(1, ts(1), 1, "click", 1.0), E(2, ts(2), 2, "click", 2.0))
      q.processAllAvailable()
      mem.addData(E(3, ts(3), 3, "click", 3.0))
      q.processAllAvailable()
      val back = spark.read.jdbc(url, "t8_sink", props)
      assert(back.count() == 3)
      assert(back.select(countDistinct($"batch_id")).head.getLong(0) >= 2,
        "expected at least two distinct micro-batch ids")
    } finally q.stop()
  }

  test("T8b: idempotent JDBC sink — re-delivered micro-batch leaves exactly-once state") {
    import spark.implicits._
    val url = "jdbc:derby:memory:graft_t8b;create=true"
    val props = new java.util.Properties()
    props.setProperty("driver", "org.apache.derby.jdbc.EmbeddedDriver")
    val conn = java.sql.DriverManager.getConnection(url, props)
    conn.createStatement().execute(
      "CREATE TABLE t8b_sink (event_id BIGINT, user_id BIGINT, value DOUBLE, batch_id BIGINT, part_id INT)")
    conn.close()
    val batch = Seq((1L, 7L, 1.5), (2L, 8L, 2.5)).toDF("event_id", "user_id", "value")
    // deliver batch 0, then REPLAY it (at-least-once re-delivery after a
    // simulated failure), then batch 1
    Streams.jdbcIdempotentWriter(url, "t8b_sink", props)(batch, 0L)
    Streams.jdbcIdempotentWriter(url, "t8b_sink", props)(batch, 0L)
    Streams.jdbcIdempotentWriter(url, "t8b_sink", props)(
      Seq((3L, 9L, 3.5)).toDF("event_id", "user_id", "value"), 1L)
    val back = spark.read.jdbc(url, "t8b_sink", props)
    assert(back.count() == 3, "replayed batch must not duplicate rows")
    assert(back.select(sum($"value")).head.getDouble(0) == 7.5)
  }

  test("T8b: multi-partition re-delivery with CHANGED partitioning is exactly-once, no driver collect") {
    import spark.implicits._
    val url = "jdbc:derby:memory:graft_t8b_mp;create=true"
    val props = new java.util.Properties()
    props.setProperty("driver", "org.apache.derby.jdbc.EmbeddedDriver")
    val conn = java.sql.DriverManager.getConnection(url, props)
    conn.createStatement().execute(
      "CREATE TABLE t8b_mp (event_id BIGINT, user_id BIGINT, value DOUBLE, batch_id BIGINT, part_id INT)")
    conn.close()
    val rows = (1L to 100L).map(i => (i, i % 7, i * 0.5))
    // first attempt lands batch 0 across 8 partitions…
    Streams.jdbcIdempotentWriter(url, "t8b_mp", props)(
      rows.toDF("event_id", "user_id", "value").repartition(8), 0L)
    // …then the SAME batchId is re-delivered with DIFFERENT partitioning
    // (3 partitions — the stale rows from partitions 3..7 must vanish)
    Streams.jdbcIdempotentWriter(url, "t8b_mp", props)(
      rows.toDF("event_id", "user_id", "value").repartition(3), 0L)
    val back = spark.read.jdbc(url, "t8b_mp", props)
    assert(back.count() == 100, "re-delivered batch must leave exactly one copy of each row")
    assert(back.select(countDistinct($"event_id")).head.getLong(0) == 100)
    assert(back.select(max($"part_id")).head.getInt(0) <= 2,
      "replay used 3 partitions; stale part_ids from the 8-partition attempt must be gone")
    // the writer really did fan out: the first attempt used >1 partition
    // (asserted indirectly: second attempt wrote 3 distinct part_ids)
    assert(back.select(countDistinct($"part_id")).head.getLong(0) == 3)
  }

  test("T8b: a zombie duplicate commit dies on the (batch_id, event_id) unique index") {
    import spark.implicits._
    val url = "jdbc:derby:memory:graft_t8b_z;create=true"
    val props = new java.util.Properties()
    props.setProperty("driver", "org.apache.derby.jdbc.EmbeddedDriver")
    val conn = java.sql.DriverManager.getConnection(url, props)
    conn.createStatement().execute(
      "CREATE TABLE t8b_z (event_id BIGINT, user_id BIGINT, value DOUBLE, batch_id BIGINT, part_id INT)")
    conn.close()
    Streams.jdbcIdempotentWriter(url, "t8b_z", props)(
      Seq((1L, 7L, 1.5), (2L, 8L, 2.5)).toDF("event_id", "user_id", "value"), 0L)
    // a straggler task that missed its cooperative kill tries to commit
    // event 1 again for batch 0 under a different part_id — the exact
    // interleave delete-then-insert can't stop under READ_COMMITTED
    val zombie = java.sql.DriverManager.getConnection(url, props)
    try {
      val e = intercept[java.sql.SQLException] {
        zombie.createStatement().executeUpdate(
          "INSERT INTO t8b_z (event_id, user_id, value, batch_id, part_id) " +
            "VALUES (1, 7, 1.5, 0, 9)")
      }
      assert(e.getSQLState == "23505", s"expected unique violation, got ${e.getSQLState}")
    } finally zombie.close()
    val back = spark.read.jdbc(url, "t8b_z", props)
    assert(back.count() == 2, "zombie duplicate must not land")
  }

  test("T8b: commit markers give readers whole-batch visibility") {
    import spark.implicits._
    val url = "jdbc:derby:memory:graft_t8b_c;create=true"
    val props = new java.util.Properties()
    props.setProperty("driver", "org.apache.derby.jdbc.EmbeddedDriver")
    val conn = java.sql.DriverManager.getConnection(url, props)
    conn.createStatement().execute(
      "CREATE TABLE t8b_c (event_id BIGINT, user_id BIGINT, value DOUBLE, batch_id BIGINT, part_id INT)")
    conn.close()
    Streams.jdbcIdempotentWriter(url, "t8b_c", props)(
      Seq((1L, 7L, 1.5)).toDF("event_id", "user_id", "value"), 0L)
    Streams.jdbcIdempotentWriter(url, "t8b_c", props)(
      Seq((2L, 8L, 2.5)).toDF("event_id", "user_id", "value"), 1L)
    // the documented reader pattern: join the marker table
    def visible(): Long = {
      val c = java.sql.DriverManager.getConnection(url, props)
      try {
        val rs = c.createStatement().executeQuery(
          "SELECT count(*) FROM t8b_c t JOIN t8b_c_commits m ON t.batch_id = m.batch_id")
        rs.next(); rs.getLong(1)
      } finally c.close()
    }
    assert(visible() == 2, "both committed batches visible through the marker join")
    // simulate a batch mid-rewrite: the driver's first transaction has
    // revoked batch 1's marker but its rows are not yet rewritten —
    // readers must fall back to batch 0 only, never see a partial batch
    val c2 = java.sql.DriverManager.getConnection(url, props)
    c2.createStatement().executeUpdate("DELETE FROM t8b_c_commits WHERE batch_id = 1")
    c2.close()
    assert(visible() == 1, "a batch without its marker is invisible to marker-join readers")
  }

  test("T8b: idempotent writer driven by a REAL streaming query lands exact state") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val url = "jdbc:derby:memory:graft_t8b_q;create=true"
    val props = new java.util.Properties()
    props.setProperty("driver", "org.apache.derby.jdbc.EmbeddedDriver")
    val conn = java.sql.DriverManager.getConnection(url, props)
    conn.createStatement().execute(
      "CREATE TABLE t8bq_sink (event_id BIGINT, user_id BIGINT, value DOUBLE, batch_id BIGINT, part_id INT)")
    conn.close()
    val mem = MemoryStream[E]
    val q = mem.toDF()
      .writeStream
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, id: Long) =>
        Streams.jdbcIdempotentWriter(url, "t8bq_sink", props)(df, id)
      }
      .outputMode("append").start()
    try {
      mem.addData(E(1, ts(1), 1, "click", 1.5), E(2, ts(2), 2, "click", 2.5))
      q.processAllAvailable()
      mem.addData(E(3, ts(3), 3, "click", 3.5))
      q.processAllAvailable()
      val back = spark.read.jdbc(url, "t8bq_sink", props)
      assert(back.count() == 3)
      assert(back.select(countDistinct($"batch_id")).head.getLong(0) >= 2)
      assert(back.select(sum($"value")).head.getDouble(0) == 7.5)
    } finally q.stop()
  }

  test("T7: stream-static semi-join filters a stream by a static allowlist") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val allow = Seq(1L, 3L).toDF("user_id")
    val mem = MemoryStream[E]
    val q = Streams.streamStaticSemiJoin(mem.toDF(), allow)
      .writeStream.format("memory").queryName("t7_out")
      .outputMode("append").start()
    try {
      mem.addData(
        E(1, ts(1), 1, "click", 1.0),
        E(2, ts(2), 2, "click", 1.0),
        E(3, ts(3), 3, "click", 1.0))
      q.processAllAvailable()
      val users = spark.table("t7_out").select($"user_id").as[Long].collect().toSet
      assert(users == Set(1L, 3L), s"allowlist not applied: $users")
    } finally q.stop()
  }
}
