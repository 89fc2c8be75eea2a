package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/** SURVEY §2.B T1–T8 — Structured Streaming core.
  *
  * Every transform here takes a DataFrame and returns a DataFrame, so
  * the SAME code runs over `readStream` sources (StreamingSpec drives it
  * with MemoryStream) and over static tables (the batch-equivalent
  * `queries/Streaming.scala` decls the DuckDB oracle checks). That
  * batch/stream unification is the Spark-native answer to the
  * reference's batch-job-deployed-as-a-service duality
  * (kafka-database-import.go:230-234: compute batch, then sleep forever;
  * here: one incremental query, `awaitTermination` = R12).
  *
  * Scale: all windowed aggs are keyed by (window, low-cardinality key) —
  * partial aggregation before shuffle; state stores are bounded by the
  * watermark horizon (T4) so at 100 TB/day state is O(active keys ×
  * horizon), not O(history).
  */
object Streams {

  /** Shuffle-partition count for STATEFUL STREAM runs, and the scope
    * helper that applies it around a streaming query (r16 optimization).
    *
    * A stateful micro-batch pays a fixed per-partition cost every epoch
    * — state store provider init, delta-file write + rename + fsync into
    * the checkpoint, commit bookkeeping — independent of row volume.
    * Measured at sf0.1 (Profile, t14): 32 state partitions cost ~2 s of
    * task time per micro-batch for a 4-group aggregate; 4 partitions cut
    * the query's wall time in half. Unlike batch shuffles (AQE coalesces
    * small exchanges at runtime), the state partition count is LOCKED
    * into the checkpoint at first run and AQE never applies to stateful
    * operators, so inheriting the batch `spark.sql.shuffle.partitions`
    * is simply the wrong default for a stream: production guidance is to
    * size it explicitly for the query's keyspace and throughput.
    *
    * Default: min(cores, 8) — enough parallelism for the declared
    * streams' keyspaces (≤ ~dozens of groups) at any fixture scale while
    * bounding the fixed per-epoch overhead; a 100 TB deployment sets
    * `spark.graft.stream.statePartitions` (e.g. to 2-3× cores) in the
    * session conf, exactly like shuffle.partitions itself. Results are
    * partition-count-invariant; only the checkpoint layout changes, and
    * every declared stream builds a fresh checkpoint per run. */
  def statePartitions(spark: SparkSession): Int =
    spark.conf.getOption("spark.graft.stream.statePartitions")
      .map(_.toInt)
      .getOrElse(math.min(spark.sparkContext.defaultParallelism, 8))

  /** Run `f` (a streaming query: build → start → awaitTermination) with
    * `spark.sql.shuffle.partitions` set to [[statePartitions]], restoring
    * the previous value after. The conf is read at query START, so the
    * scope needs to cover only the stream's lifetime. */
  def withStatePartitions[T](spark: SparkSession)(f: => T): T = {
    val key = "spark.sql.shuffle.partitions"
    val saved = spark.conf.get(key)
    spark.conf.set(key, statePartitions(spark).toString)
    try f finally spark.conf.set(key, saved)
  }

  /** T1: tumbling 10-minute counts per event type. */
  def tumblingCounts(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "10 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(
        unix_millis(col("window.start")).as("window_start_ms"),
        col("event_type"), col("n"))

  /** T2: sliding 10-minute windows every 5 minutes. */
  def slidingCounts(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "10 minutes", "5 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(
        unix_millis(col("window.start")).as("window_start_ms"),
        col("event_type"), col("n"))

  /** T3: session windows per user, 30-minute gap. */
  def sessionCounts(events: DataFrame): DataFrame =
    events
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(
        col("user_id"),
        unix_millis(col("session_window.start")).as("session_start_ms"),
        unix_millis(col("session_window.end")).as("session_end_ms"),
        col("n_events"))

  /** T4: watermarked tumbling counts — in streaming mode, windows close
    * (and late rows drop) 1 hour behind max event time. */
  def watermarkedTumbling(events: DataFrame): DataFrame =
    tumblingCounts(events.withWatermark("ts", "1 hour"))

  /** T5: stateful dedup by event_id within the watermark horizon. */
  def dedupWithinWatermark(events: DataFrame): DataFrame =
    events.withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark("event_id")

  /** T5 batch form: plain dropDuplicates (same key contract). */
  def dedupBatch(events: DataFrame): DataFrame =
    events.dropDuplicates("event_id")

  // ---- T6: arbitrary stateful processing ----

  final case class Ev(event_id: Long, ts: java.sql.Timestamp, user_id: Long, value: Double)
  final case class RunningTotal(user_id: Long, event_id: Long, running_total: Double)
  final case class UserState(totalCents: Long)

  /** Per-user running total via flatMapGroupsWithState — the arbitrary-
    * state API. Cents-integer state (not double accumulation) so results
    * are exact and match the oracle's DECIMAL window sum. Works in BOTH
    * batch (single invocation per group) and streaming (incremental)
    * execution, which is how StreamingSpec and the t6 decl share it. */
  def runningTotals(events: Dataset[Ev]): Dataset[RunningTotal] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[UserState, RunningTotal](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (user: Long, it: Iterator[Ev], state: GroupState[UserState]) =>
          var acc = state.getOption.map(_.totalCents).getOrElse(0L)
          // deterministic in-group order regardless of shuffle arrival
          val out = it.toSeq.sortBy(e => (e.ts.getTime, e.event_id)).map { e =>
            acc += math.round(e.value * 100)
            RunningTotal(user, e.event_id, acc / 100.0)
          }
          state.update(UserState(acc))
          out.iterator
      }
  }

  /** T6 on the Spark 4 `transformWithState` API: same running-total
    * semantics as [[runningTotals]], expressed as a StatefulProcessor
    * with a typed ValueState over the RocksDB-backed state store — the
    * successor API for arbitrary streaming state. */
  class RunningTotalProcessor
      extends org.apache.spark.sql.streaming.StatefulProcessor[Long, Ev, RunningTotal]
      with Serializable {
    @transient private var total: org.apache.spark.sql.streaming.ValueState[Long] = _

    override def init(
        outputMode: OutputMode,
        timeMode: org.apache.spark.sql.streaming.TimeMode): Unit =
      total = getHandle.getValueState[Long](
        "totalCents", org.apache.spark.sql.Encoders.scalaLong,
        org.apache.spark.sql.streaming.TTLConfig.NONE)

    override def handleInputRows(
        user: Long, rows: Iterator[Ev],
        timerValues: org.apache.spark.sql.streaming.TimerValues)
        : Iterator[RunningTotal] = {
      var acc = if (total.exists()) total.get() else 0L
      val out = rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id)).map { e =>
        acc += math.round(e.value * 100)
        RunningTotal(user, e.event_id, acc / 100.0)
      }
      total.update(acc)
      out.iterator
    }
  }

  /** T6 via transformWithState (see [[RunningTotalProcessor]]). */
  def runningTotalsTws(events: Dataset[Ev]): Dataset[RunningTotal] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .transformWithState(
        new RunningTotalProcessor,
        org.apache.spark.sql.streaming.TimeMode.None(),
        OutputMode.Append())
  }

  final case class LastN(user_id: Long, n_seen: Long, last_ids: String)

  /** T10: BOUNDED PER-KEY BUFFER on the v2 state API's ListState — the
    * "last N events per user" serving pattern (feature stores, fraud
    * features, session context windows). ListState appends are O(1)
    * RocksDB writes (no read-modify-write of one blob, unlike a
    * ValueState holding a list — the reason the v2 API has typed state
    * variables at all); the trim keeps state bounded per key, so total
    * state is O(keys · N) no matter how long the stream runs. */
  class LastNProcessor(n: Int)
      extends org.apache.spark.sql.streaming.StatefulProcessor[Long, Ev, LastN]
      with Serializable {
    @transient private var buf: org.apache.spark.sql.streaming.ListState[Long] = _
    @transient private var seen: org.apache.spark.sql.streaming.ValueState[Long] = _

    override def init(
        outputMode: OutputMode,
        timeMode: org.apache.spark.sql.streaming.TimeMode): Unit = {
      buf = getHandle.getListState[Long](
        "lastIds", org.apache.spark.sql.Encoders.scalaLong,
        org.apache.spark.sql.streaming.TTLConfig.NONE)
      seen = getHandle.getValueState[Long](
        "nSeen", org.apache.spark.sql.Encoders.scalaLong,
        org.apache.spark.sql.streaming.TTLConfig.NONE)
    }

    override def handleInputRows(
        user: Long, rows: Iterator[Ev],
        timerValues: org.apache.spark.sql.streaming.TimerValues)
        : Iterator[LastN] = {
      val fresh = rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
      fresh.foreach(e => buf.appendValue(e.event_id))
      val kept = buf.get().toSeq.takeRight(n)
      buf.put(kept.toArray) // trim: state stays O(n) per key
      val total = (if (seen.exists()) seen.get() else 0L) + fresh.size
      seen.update(total)
      Iterator.single(LastN(user, total, kept.mkString(",")))
    }
  }

  final case class SessionOut(
      user_id: Long, start_ms: Long, end_ms: Long, n_events: Long)
  final case class SessAgg(startMs: Long, lastMs: Long, n: Long, timerMs: Long)

  /** T11: TIMER-DRIVEN SESSION TIMEOUT on the v2 state API — the state
    * type the ValueState/ListState processors don't exercise: EVENT-TIME
    * TIMERS. Each key holds one open session (start, last, count) and
    * ONE registered timer at last+gap; a new event within the gap
    * deletes the old timer and re-registers (the session extends), and
    * when the WATERMARK passes the timer the framework calls
    * handleExpiredTimer — the session closes and its state clears even
    * if the key never receives another row (the case batch
    * sessionization and input-driven state can't handle: emission is
    * driven by time, not by data arrival). State is O(open sessions);
    * timers live in the same RocksDB store and survive restarts with
    * the checkpoint. */
  class SessionTimeoutProcessor(gapMs: Long)
      extends org.apache.spark.sql.streaming.StatefulProcessor[Long, Ev, SessionOut]
      with Serializable {
    @transient private var st: org.apache.spark.sql.streaming.ValueState[SessAgg] = _

    override def init(
        outputMode: OutputMode,
        timeMode: org.apache.spark.sql.streaming.TimeMode): Unit =
      st = getHandle.getValueState[SessAgg](
        "sess", org.apache.spark.sql.Encoders.product[SessAgg],
        org.apache.spark.sql.streaming.TTLConfig.NONE)

    override def handleInputRows(
        user: Long, rows: Iterator[Ev],
        timerValues: org.apache.spark.sql.streaming.TimerValues)
        : Iterator[SessionOut] = {
      // One micro-batch can carry SEVERAL gap-separated bursts for a
      // key. Sort, split into gap-runs, close every run but the last
      // immediately (no event can extend them: any later event in this
      // or a future batch is > gap away by construction), and keep only
      // the last run open with its timer — exact gap-sessionization
      // regardless of how events batch up.
      val times = rows.map(_.ts.getTime).toSeq.sorted
      val prev = if (st.exists()) Some(st.get()) else None
      prev.foreach(p => getHandle.deleteTimer(p.timerMs))
      val closed = scala.collection.mutable.ArrayBuffer.empty[SessionOut]
      var open: Option[SessAgg] = prev
      times.foreach { t =>
        open match {
          case Some(s) if t - s.lastMs <= gapMs =>
            // extends the open run (a late-but-in-watermark event may
            // even precede the run's start — widen both ends)
            open = Some(s.copy(
              startMs = math.min(s.startMs, t),
              lastMs = math.max(s.lastMs, t), n = s.n + 1))
          case Some(s) =>
            closed += SessionOut(user, s.startMs, s.lastMs, s.n)
            open = Some(SessAgg(t, t, 1L, 0L))
          case None =>
            open = Some(SessAgg(t, t, 1L, 0L))
        }
      }
      val s = open.get // times nonempty => always defined
      val expiry = s.lastMs + gapMs
      getHandle.registerTimer(expiry)
      st.update(s.copy(timerMs = expiry))
      closed.iterator // only the still-open tail waits for its timer
    }

    override def handleExpiredTimer(
        user: Long,
        timerValues: org.apache.spark.sql.streaming.TimerValues,
        expiredTimerInfo: org.apache.spark.sql.streaming.ExpiredTimerInfo)
        : Iterator[SessionOut] = {
      if (!st.exists()) Iterator.empty
      else {
        val s = st.get()
        st.clear() // closed: state AND timer are gone for this key
        Iterator.single(SessionOut(user, s.startMs, s.lastMs, s.n))
      }
    }
  }

  /** T11 via transformWithState (see [[SessionTimeoutProcessor]]);
    * event-time timers require a watermark on the input. */
  def sessionTimeoutTws(events: Dataset[Ev], gapMs: Long): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", "0 seconds")
      .as[Ev]
      .groupByKey(_.user_id)
      .transformWithState(
        new SessionTimeoutProcessor(gapMs),
        org.apache.spark.sql.streaming.TimeMode.EventTime(),
        OutputMode.Append())
  }

  /** T10 via transformWithState (see [[LastNProcessor]]). */
  def lastNTws(events: Dataset[Ev], n: Int): Dataset[LastN] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .transformWithState(
        new LastNProcessor(n),
        org.apache.spark.sql.streaming.TimeMode.None(),
        OutputMode.Update())
  }

  /** T7: stream–static join — the reference pipeline's streaming form
    * (events ⋉ allowlist, R4). `allow` is the static side. */
  def streamStaticSemiJoin(events: DataFrame, allow: DataFrame): DataFrame =
    events.join(broadcast(allow), Seq("user_id"), "left_semi")

  /** T9: stream–stream interval join — each purchase matched to the
    * same user's clicks in the preceding hour. In streaming execution
    * both inputs carry watermarks and the time-range condition bounds
    * BOTH state stores (rows age out an hour + watermark after their
    * event time — O(active users × horizon) state, not O(history));
    * in batch execution the identical code is a plain equi-join with a
    * range residual (the bucketed form for huge batch sides is
    * [[graft.operators.RangeJoin]]). Inputs must expose user_id,
    * event_id, ts. */
  def streamStreamJoin(purchases: DataFrame, clicks: DataFrame): DataFrame =
    purchases.alias("p").join(
      clicks.alias("c"),
      expr("""p.user_id = c.user_id
             |AND c.ts >= p.ts - INTERVAL 1 HOUR
             |AND c.ts <= p.ts""".stripMargin))
      .select(
        col("p.event_id").as("purchase_id"),
        col("c.event_id").as("click_id"))

  /** T9b: stream–stream LEFT OUTER interval join — purchases with NO
    * qualifying click still emit, null-padded. In streaming execution
    * the null row can only be emitted once the CLICK watermark has
    * passed the purchase's join horizon (before that a match could
    * still arrive), so outer results trail the inner ones by the
    * watermark delay — the outer-join-specific semantics pinned in
    * StreamingSpec; state bounds are identical to the inner form. */
  def streamStreamLeftOuter(purchases: DataFrame, clicks: DataFrame): DataFrame =
    purchases.alias("p").join(
      clicks.alias("c"),
      expr("""p.user_id = c.user_id
             |AND c.ts >= p.ts - INTERVAL 1 HOUR
             |AND c.ts <= p.ts""".stripMargin),
      "left_outer")
      .select(
        col("p.event_id").as("purchase_id"),
        col("c.event_id").as("click_id"))

  /** T9c: stream–stream FULL OUTER interval join — unmatched rows on
    * BOTH sides emit null-padded once the opposing side's watermark
    * closes their join horizon (purchases with no click in the
    * preceding hour, and clicks followed by no purchase within an
    * hour). State bounds are identical to the inner form. */
  def streamStreamFullOuter(purchases: DataFrame, clicks: DataFrame): DataFrame =
    purchases.alias("p").join(
      clicks.alias("c"),
      expr("""p.user_id = c.user_id
             |AND c.ts >= p.ts - INTERVAL 1 HOUR
             |AND c.ts <= p.ts""".stripMargin),
      "full_outer")
      .select(
        col("p.event_id").as("purchase_id"),
        col("c.event_id").as("click_id"))

  /** T9d: stream–stream LEFT SEMI interval join — purchases that HAD a
    * qualifying click, each emitted EXACTLY ONCE no matter how many
    * clicks matched (the dedup-free "conversion happened" probe; an
    * inner join would fan out per click and need a distinct). Spark
    * emits the semi row as soon as the first match arrives and stores
    * NO click rows beyond the interval state the inner form already
    * keeps — at scale this is strictly cheaper than inner + distinct,
    * which would shuffle the fanned-out matches a second time. */
  def streamStreamLeftSemi(purchases: DataFrame, clicks: DataFrame): DataFrame =
    purchases.alias("p").join(
      clicks.alias("c"),
      expr("""p.user_id = c.user_id
             |AND c.ts >= p.ts - INTERVAL 1 HOUR
             |AND c.ts <= p.ts""".stripMargin),
      "left_semi")
      .select(col("p.event_id").as("purchase_id"))

  /** T8: foreachBatch JDBC sink — the north star's "Kafka source + JDBC
    * sink" tail. Append per micro-batch; idempotence at the table level
    * comes from the batch-id column. */
  def jdbcForeachBatchWriter(
      url: String, table: String, props: java.util.Properties)(
      batch: DataFrame, batchId: Long): Unit =
    batch.withColumn("batch_id", lit(batchId))
      .write.mode("append").jdbc(url, table, props)

  /** T8b: IDEMPOTENT JDBC sink — exactly-once table state with NO rows
    * ever passing through the driver. Two nested delete-then-insert
    * guards (standard recipe for JDBC sinks without MERGE):
    *
    *  1. Driver (metadata-only): one transaction
    *     `DELETE FROM t WHERE batch_id = ?` plus the batch's row in
    *     `{table}_commits`. foreachBatch is at-least-once — after a
    *     failure the SAME batchId is re-delivered, possibly with
    *     DIFFERENT partitioning, so any partial rows a prior attempt
    *     committed (including partitions that no longer exist in the
    *     replay) are cleared up front, and the batch's visibility
    *     marker is revoked in the same transaction.
    *  2. Each executor task: one transaction
    *     `DELETE WHERE batch_id = ? AND part_id = ?` + batched INSERT
    *     of its own partition through its own connection. That makes a
    *     task RETRY (stage retry, speculative duplicate) replay only
    *     its partition idempotently: the retry's delete removes
    *     whatever a half-committed or duplicate attempt wrote.
    *
    * Two guards close the races delete-then-insert alone leaves open:
    *
    *  - '''Zombie commits''': task kill is cooperative, so a zombie or
    *    speculative duplicate for the same (batch_id, part_id) can
    *    interleave its DELETE/INSERT with the replacement's under
    *    READ_COMMITTED and both commit — duplicate rows. The writer
    *    ensures a UNIQUE index on (batch_id, event_id): the straggler's
    *    INSERT of an event the winner already committed violates the
    *    constraint and rolls back, so at most one copy of each event
    *    per batch can ever commit. Run with `spark.speculation=false`
    *    anyway (speculation buys nothing on a transactional sink —
    *    the losing attempt's work is thrown away at the constraint).
    *  - '''Partial-batch reads''': per-partition commits land
    *    independently, so a concurrent reader of the bare table sees a
    *    half-written batch. The writer inserts `batchId` into
    *    `{table}_commits` in one driver transaction only after every
    *    partition has committed; readers that want whole-batch
    *    atomicity join it:
    *    `SELECT t.* FROM t JOIN {table}_commits c ON t.batch_id = c.batch_id`.
    *
    * Throughput scales with executors (one connection per partition,
    * `addBatch` batching inside); the driver does O(1) work. The
    * target table needs a `part_id INT` column alongside `batch_id`. */
  def jdbcIdempotentWriter(
      url: String, table: String, props: java.util.Properties)(
      batch: DataFrame, batchId: Long): Unit = {
    val conn = java.sql.DriverManager.getConnection(url, props)
    try {
      ensureSinkGuards(conn, table)
      conn.setAutoCommit(false)
      // one transaction: revoke the batch's visibility marker AND clear
      // its rows, so a re-delivery can never be half-visible
      val mdel = conn.prepareStatement(
        s"DELETE FROM ${table}_commits WHERE batch_id = ?")
      mdel.setLong(1, batchId); mdel.executeUpdate(); mdel.close()
      val del = conn.prepareStatement(s"DELETE FROM $table WHERE batch_id = ?")
      del.setLong(1, batchId); del.executeUpdate(); del.close()
      conn.commit()
    } catch {
      case e: Throwable => conn.rollback(); throw e
    } finally conn.close()

    batch.select(
      col("event_id").cast("long"),
      col("user_id").cast("long"),
      col("value").cast("double"))
      .foreachPartition { (it: Iterator[org.apache.spark.sql.Row]) =>
        val partId = org.apache.spark.TaskContext.getPartitionId()
        val c = java.sql.DriverManager.getConnection(url, props)
        try {
          c.setAutoCommit(false)
          val pdel = c.prepareStatement(
            s"DELETE FROM $table WHERE batch_id = ? AND part_id = ?")
          pdel.setLong(1, batchId); pdel.setInt(2, partId)
          pdel.executeUpdate(); pdel.close()
          val ins = c.prepareStatement(
            s"INSERT INTO $table (event_id, user_id, value, batch_id, part_id) " +
              "VALUES (?, ?, ?, ?, ?)")
          var n = 0
          it.foreach { r =>
            ins.setLong(1, r.getLong(0)); ins.setLong(2, r.getLong(1))
            ins.setDouble(3, r.getDouble(2)); ins.setLong(4, batchId)
            ins.setInt(5, partId)
            ins.addBatch()
            n += 1
            if (n % 10000 == 0) ins.executeBatch()
          }
          ins.executeBatch(); ins.close()
          c.commit()
        } catch {
          case e: Throwable => c.rollback(); throw e
        } finally c.close()
      }

    // all partitions committed → publish the batch atomically
    val mc = java.sql.DriverManager.getConnection(url, props)
    try {
      mc.setAutoCommit(false)
      val ins = mc.prepareStatement(
        s"INSERT INTO ${table}_commits (batch_id) VALUES (?)")
      ins.setLong(1, batchId); ins.executeUpdate(); ins.close()
      mc.commit()
    } catch {
      case e: Throwable => mc.rollback(); throw e
    } finally mc.close()
  }

  // ---- T16 / L2-streaming: LSH near-dup admission filter ----

  /** One (doc, band) row entering the streaming index: `key` is the
    * banded signature bucket, `sigs` the doc's FULL minhash signature
    * (carried so candidate agreement is checked in-state, without a
    * side lookup). */
  final case class BandRow(doc_id: Long, key: String, sigs: Seq[Long])
  /** A flagged near-duplicate: `doc_id` collided with earlier
    * `dup_of` in some band and their signatures agree ≥ the floor. */
  final case class BandHit(doc_id: Long, key: String, dup_of: Long,
      agree: Double)
  final case class BandIndexState(docs: Seq[(Long, Seq[Long])])

  /** STREAMING NEAR-DUP ADMISSION (SURVEY S85): the L2 MinHash/LSH
    * dedup family's ingestion leg as ONE incremental operator. Each
    * arriving document is banded (outside, the same banding the batch
    * decls use); this operator keys the stream by band bucket and
    * keeps the bucket's signature index in Spark state. A new doc is
    * checked against the earlier signatures of ITS OWN buckets — work
    * per doc ∝ bucket occupancy, never corpus size — and emits a
    * [[BandHit]] per matched band; every signature is admitted to the
    * index (flagging is informational: production records all and
    * canonicalizes downstream, which also keeps the semantics
    * ORDER-INDEPENDENT at the doc-set level — dup(d) ⇔ some smaller
    * doc collides with agreement ≥ `minAgree`, exactly the closed-form
    * the DuckDB oracle states).
    *
    * Batch/stream unification: flatMapGroupsWithState executes in
    * BOTH modes — the `l2_stream_dedup` decl runs it as one batch
    * (each bucket's rows in one invocation, sorted by doc_id so
    * "earlier" is well-defined); StreamingDedupSpec drives the SAME
    * function incrementally over MemoryStream epochs, where state
    * carries the corpus index across micro-batches. At 100 TB the
    * state store is the RocksDB-backed inverted LSH index, sized by
    * distinct buckets × occupancy — the same asymptotics as the
    * persisted band table the batch path joins against. */
  def lshAdmit(rows: Dataset[BandRow], minAgree: Double = 0.75)
      : Dataset[BandHit] = {
    import rows.sparkSession.implicits._
    rows.groupByKey(_.key)
      .flatMapGroupsWithState[BandIndexState, BandHit](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (key: String, it: Iterator[BandRow], st: GroupState[BandIndexState]) =>
          var seen = st.getOption.map(_.docs).getOrElse(Seq.empty)
          val out = Seq.newBuilder[BandHit]
          // deterministic "earlier": by doc_id within the invocation
          // (one epoch, or the whole input in batch execution)
          it.toSeq.sortBy(_.doc_id).foreach { r =>
            val matches = seen.iterator
              .filter(_._1 != r.doc_id)
              .map { case (d, s) =>
                val n = math.min(s.length, r.sigs.length)
                val eq = (0 until n).count(i => s(i) == r.sigs(i))
                (d, if (n == 0) 0.0 else eq.toDouble / n)
              }
              .filter(_._2 >= minAgree)
              .toSeq
            if (matches.nonEmpty) {
              val best = matches.minBy(_._1)
              out += BandHit(r.doc_id, key, best._1, best._2)
            }
            if (!seen.exists(_._1 == r.doc_id))
              seen = seen :+ ((r.doc_id, r.sigs))
          }
          st.update(BandIndexState(seen))
          out.result().iterator
      }
  }

  /** Doc-level admission verdicts from [[lshAdmit]]'s band hits: a doc
    * is a duplicate iff ANY band flagged it; `dup_of` is the smallest
    * matched earlier doc. Plain (non-stateful) relational algebra —
    * runs over the hits sink in batch, or inside the same streaming
    * query when the consumer wants per-epoch verdicts. */
  def admissionVerdicts(allDocs: DataFrame, hits: DataFrame): DataFrame = {
    val agg = hits.groupBy(col("doc_id"))
      .agg(min(col("dup_of")).as("dup_of"))
    allDocs.select(col("doc_id")).distinct()
      .join(agg, Seq("doc_id"), "left")
      .select(col("doc_id"), col("dup_of").isNotNull.as("is_dup"),
        col("dup_of"))
  }

  /** Idempotent DDL for the sink's two guards: the (batch_id, event_id)
    * unique index that makes straggler duplicate commits fail, and the
    * commit-marker table that gives readers whole-batch visibility.
    * "Already exists" (Derby SQLState X0Y32) is the steady state. */
  private def ensureSinkGuards(conn: java.sql.Connection, table: String): Unit = {
    def tolerantDdl(sql: String): Unit = {
      val st = conn.createStatement()
      try st.execute(sql)
      catch {
        case e: java.sql.SQLException if e.getSQLState == "X0Y32" => ()
      } finally st.close()
    }
    tolerantDdl(s"CREATE TABLE ${table}_commits (batch_id BIGINT PRIMARY KEY)")
    tolerantDdl(s"CREATE UNIQUE INDEX ${table}_batch_event_uq " +
      s"ON $table (batch_id, event_id)")
  }
}
