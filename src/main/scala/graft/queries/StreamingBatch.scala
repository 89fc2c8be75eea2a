package graft.queries

import graft.sources.KafkaIO
import graft.streaming.Streams
import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

/** SURVEY §2.B T1–T7 batch-equivalent decls: the SAME transform
  * functions from [[graft.streaming.Streams]] run over the static
  * `events` table and hash-checked against DuckDB (whose SQL emulates
  * windows via time_bucket and gaps-and-islands). Streaming-only
  * semantics (late data, state eviction, exactly-once) are covered by
  * StreamingSpec with MemoryStream.
  */
object StreamingBatch {

  val decls: Seq[Decl] = Seq(

    // T1: tumbling windows ≡ epoch-aligned time_bucket.
    Decl(
      "t1_tumbling",
      """SELECT epoch_ms(time_bucket(INTERVAL '10 minutes', CAST(ts AS TIMESTAMP))) AS window_start_ms,
        |  event_type, count(*) AS n
        |FROM events
        |GROUP BY 1, 2
        |ORDER BY window_start_ms, event_type""".stripMargin) { (s, dir) =>
      Streams.tumblingCounts(Qh.t(s, dir, "events"))
        .orderBy("window_start_ms", "event_type")
    },

    // T2: sliding 10m/5m ≡ union of the two 5-minute phases.
    Decl(
      "t2_sliding",
      """WITH phases AS (
        |  SELECT epoch_ms(time_bucket(INTERVAL '10 minutes', CAST(ts AS TIMESTAMP))) AS window_start_ms,
        |    event_type FROM events
        |  UNION ALL
        |  SELECT epoch_ms(time_bucket(INTERVAL '10 minutes', CAST(ts AS TIMESTAMP), INTERVAL '5 minutes')) AS window_start_ms,
        |    event_type FROM events)
        |SELECT window_start_ms, event_type, count(*) AS n
        |FROM phases
        |GROUP BY 1, 2
        |ORDER BY window_start_ms, event_type""".stripMargin) { (s, dir) =>
      Streams.slidingCounts(Qh.t(s, dir, "events"))
        .orderBy("window_start_ms", "event_type")
    },

    // T3: session windows ≡ gaps-and-islands with a 30-minute gap;
    // session end = last event + gap (Spark session_window semantics).
    Decl(
      "t3_session",
      """WITH marked AS (
        |  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts,
        |    CASE WHEN lag(CAST(ts AS TIMESTAMP)) OVER w IS NULL
        |           OR CAST(ts AS TIMESTAMP) - lag(CAST(ts AS TIMESTAMP)) OVER w >= INTERVAL '30 minutes'
        |         THEN 1 ELSE 0 END AS is_new
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP))),
        |sessions AS (
        |  SELECT user_id, ts,
        |    sum(is_new) OVER (PARTITION BY user_id ORDER BY ts
        |                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        |  FROM marked)
        |SELECT user_id,
        |  epoch_ms(min(ts)) AS session_start_ms,
        |  epoch_ms(max(ts) + INTERVAL '30 minutes') AS session_end_ms,
        |  count(*) AS n_events
        |FROM sessions
        |GROUP BY user_id, sid
        |ORDER BY user_id, session_start_ms""".stripMargin) { (s, dir) =>
      Streams.sessionCounts(Qh.t(s, dir, "events"))
        .orderBy("user_id", "session_start_ms")
    },

    // T4 batch equivalent of the watermark contract: only windows fully
    // closed w.r.t. (max event time − 1 hour) are emitted — exactly the
    // append-mode output of the streaming form after all data arrives.
    Decl(
      "t4_watermark_closed",
      """WITH agg AS (
        |  SELECT time_bucket(INTERVAL '10 minutes', CAST(ts AS TIMESTAMP)) AS w_start,
        |    event_type, count(*) AS n
        |  FROM events GROUP BY 1, 2),
        |horizon AS (SELECT max(CAST(ts AS TIMESTAMP)) - INTERVAL '1 hour' AS h FROM events)
        |SELECT epoch_ms(w_start) AS window_start_ms, event_type, n
        |FROM agg, horizon
        |WHERE w_start + INTERVAL '10 minutes' <= h
        |ORDER BY window_start_ms, event_type""".stripMargin) { (s, dir) =>
      import s.implicits._
      val ev = Qh.t(s, dir, "events")
      // horizon stays IN the plan (scalar agg + broadcast cross join) —
      // no driver-side collect; at scale this is a tiny second branch
      val horizon = ev.agg(
        (unix_millis(max(Qh.tsUs($"ts"))) - 3600 * 1000L).as("h"))
      Streams.tumblingCounts(ev)
        .crossJoin(broadcast(horizon))
        .filter($"window_start_ms" + (10 * 60 * 1000L) <= $"h")
        .drop("h")
        .orderBy("window_start_ms", "event_type")
    },

    // T5: dedup of a duplicated input recovers exactly the original keys.
    Decl(
      "t5_dedup",
      """SELECT count(*) AS n_after_dedup,
        |  (SELECT count(*) FROM events) AS n_original
        |FROM (SELECT DISTINCT event_id FROM
        |       (SELECT event_id FROM events UNION ALL SELECT event_id FROM events))""".stripMargin) { (s, dir) =>
      import s.implicits._
      val ev = Qh.t(s, dir, "events")
      val doubled = ev.unionAll(ev)
      Streams.dedupBatch(doubled)
        .agg(count(lit(1)).as("n_after_dedup"))
        .crossJoin(ev.agg(count(lit(1)).as("n_original")))
    },

    // T6: arbitrary stateful processing (flatMapGroupsWithState) in its
    // batch execution — per-user running totals, exact cents arithmetic.
    Decl(
      "t6_stateful_running",
      """SELECT user_id, event_id,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) OVER (
        |    PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_total
        |FROM events
        |ORDER BY user_id, event_id""".stripMargin) { (s, dir) =>
      import s.implicits._
      val ev = Qh.t(s, dir, "events")
        .select($"event_id", Qh.tsUs($"ts").as("ts"), $"user_id", $"value")
        .as[Streams.Ev]
      Streams.runningTotals(ev)
        .toDF()
        .orderBy("user_id", "event_id")
    },

    // T7: stream–static semi-join (reference pipeline R4, streaming shape)
    // + tumbling count — batch execution over the static table.
    Decl(
      "t7_stream_static",
      """SELECT epoch_ms(time_bucket(INTERVAL '10 minutes', CAST(ts AS TIMESTAMP))) AS window_start_ms,
        |  event_type, count(*) AS n
        |FROM events
        |WHERE user_id IN (SELECT user_id FROM events WHERE event_type = 'signup')
        |GROUP BY 1, 2
        |ORDER BY window_start_ms, event_type""".stripMargin) { (s, dir) =>
      import s.implicits._
      val ev = Qh.t(s, dir, "events")
      val allow = ev.filter($"event_type" === "signup").select($"user_id").distinct()
      Streams.tumblingCounts(Streams.streamStaticSemiJoin(ev, allow))
        .orderBy("window_start_ms", "event_type")
    },

    // T9: stream-stream interval join, batch execution (the streaming
    // form with watermarks on both sides + bounded join state runs in
    // StreamingSpec over two MemoryStreams).
    Decl(
      "t9_stream_stream",
      """SELECT p.event_id AS purchase_id, c.event_id AS click_id
        |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        |JOIN (SELECT * FROM events WHERE event_type = 'click') c
        |  ON p.user_id = c.user_id
        | AND CAST(c.ts AS TIMESTAMP) >= CAST(p.ts AS TIMESTAMP) - INTERVAL '1 hour'
        | AND CAST(c.ts AS TIMESTAMP) <= CAST(p.ts AS TIMESTAMP)
        |ORDER BY purchase_id, click_id""".stripMargin) { (s, dir) =>
      import s.implicits._
      val ev = Qh.t(s, dir, "events")
        .select($"event_id", $"user_id", Qh.tsUs($"ts").as("ts"), $"event_type")
      Streams.streamStreamJoin(
          ev.filter($"event_type" === "purchase"),
          ev.filter($"event_type" === "click"))
        .orderBy("purchase_id", "click_id")
    },

    // T9b: the LEFT OUTER form — purchases with no preceding-hour click
    // emit null-padded (in streaming: after the click watermark passes
    // the horizon; see Streams.streamStreamLeftOuter + StreamingSpec).
    Decl(
      "t9_stream_stream_outer",
      """SELECT p.event_id AS purchase_id, c.event_id AS click_id
        |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        |LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
        |  ON p.user_id = c.user_id
        | AND CAST(c.ts AS TIMESTAMP) >= CAST(p.ts AS TIMESTAMP) - INTERVAL '1 hour'
        | AND CAST(c.ts AS TIMESTAMP) <= CAST(p.ts AS TIMESTAMP)
        |ORDER BY purchase_id, click_id""".stripMargin) { (s, dir) =>
      import s.implicits._
      val ev = Qh.t(s, dir, "events")
        .select($"event_id", $"user_id", Qh.tsUs($"ts").as("ts"), $"event_type")
      Streams.streamStreamLeftOuter(
          ev.filter($"event_type" === "purchase"),
          ev.filter($"event_type" === "click"))
        .orderBy("purchase_id", "click_id")
    },

    // T9c: the FULL OUTER form (r5) — unmatched rows on BOTH sides
    // null-pad, completing the stream-stream join matrix
    // (inner / left outer / full outer; Spark supports exactly these
    // plus right-outer-by-symmetry for interval joins).
    Decl(
      "t9_stream_stream_full",
      """SELECT p.event_id AS purchase_id, c.event_id AS click_id
        |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        |FULL JOIN (SELECT * FROM events WHERE event_type = 'click') c
        |  ON p.user_id = c.user_id
        | AND CAST(c.ts AS TIMESTAMP) >= CAST(p.ts AS TIMESTAMP) - INTERVAL '1 hour'
        | AND CAST(c.ts AS TIMESTAMP) <= CAST(p.ts AS TIMESTAMP)
        |ORDER BY purchase_id, click_id""".stripMargin) { (s, dir) =>
      import s.implicits._
      val ev = Qh.t(s, dir, "events")
        .select($"event_id", $"user_id", Qh.tsUs($"ts").as("ts"), $"event_type")
      Streams.streamStreamFullOuter(
          ev.filter($"event_type" === "purchase"),
          ev.filter($"event_type" === "click"))
        .orderBy("purchase_id", "click_id")
    },

    // T9d: the LEFT SEMI form — "did a qualifying click precede this
    // purchase": one row per converted purchase regardless of how many
    // clicks matched (inner + distinct would shuffle the fanout twice;
    // semi stores no extra state — see Streams.streamStreamLeftSemi).
    Decl(
      "t9_stream_stream_semi",
      """SELECT p.event_id AS purchase_id
        |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        |WHERE EXISTS (
        |  SELECT 1 FROM events c
        |  WHERE c.event_type = 'click'
        |    AND c.user_id = p.user_id
        |    AND CAST(c.ts AS TIMESTAMP) >= CAST(p.ts AS TIMESTAMP) - INTERVAL '1 hour'
        |    AND CAST(c.ts AS TIMESTAMP) <= CAST(p.ts AS TIMESTAMP))
        |ORDER BY purchase_id""".stripMargin) { (s, dir) =>
      import s.implicits._
      val ev = Qh.t(s, dir, "events")
        .select($"event_id", $"user_id", Qh.tsUs($"ts").as("ts"), $"event_type")
      Streams.streamStreamLeftSemi(
          ev.filter($"event_type" === "purchase"),
          ev.filter($"event_type" === "click"))
        .orderBy("purchase_id")
    },

    // T8: the full streaming sink loop, oracle-checked end to end — a
    // REAL streaming query (file source → foreachBatch → JDBC/Derby),
    // then the landed table is read back through spark.read.jdbc and
    // aggregated; the oracle computes the same aggregate from the
    // ORIGINAL parquet. Any loss/duplication/type corruption anywhere in
    // stream-read → micro-batch → JDBC write → JDBC read breaks the
    // hash (the s3_jdbc_roundtrip pattern applied to the streaming
    // sink). The `event_id % 7` filter bounds single-threaded Derby
    // insert volume at bench scale; multi-batch delivery and batch-id
    // idempotence are pinned in StreamingSpec.
    Decl(
      "t13_stream_envelope_source",
      s"""SELECT event_type, count(*) AS n, ${Qh.oSum2("value")} AS total_value
         |FROM events
         |WHERE event_type <> 'signup'
         |GROUP BY event_type
         |ORDER BY event_type""".stripMargin) { (s, dir) =>
      // T13: the custom DSv2 connector's streaming READ end to end —
      // the reference's forever-import loop as a Structured Streaming
      // source: events landed as envelope JSONL files, stream-read
      // through EnvelopeMicroBatchStream (name-watermark offsets;
      // EnvelopeSourceSpec pins incremental batches + below-watermark
      // isolation), filtered, then a streaming AGGREGATION in complete
      // mode. The oracle aggregates the original parquet, so loss or
      // duplication anywhere in land → offset-planned batches → parse
      // → stateful agg breaks the hash.
      import s.implicits._
      val run = StreamingBatch.t8Runs.incrementAndGet()
      val runId = java.util.UUID.randomUUID()
      val land = Qh.ioDir(s"t13_land_$runId")
      val ckpt = Qh.ioDir(s"t13_ckpt_$runId")
      KafkaIO.toEnvelope(Qh.t(s, dir, "events"))
        .select($"value")
        .write.mode(SaveMode.Overwrite).text(land)
      val sink = s"t13_out_$run"
      Streams.withStatePartitions(s) {
        val q = s.readStream.format("graft.sources.EnvelopeSource")
          .option("path", land).load()
          .filter($"event_type" =!= "signup")
          .groupBy($"event_type")
          .agg(count(lit(1)).as("n"), Qh.sumd2($"value").as("total_value"))
          .writeStream.format("memory").queryName(sink)
          .option("checkpointLocation", ckpt)
          .trigger(Trigger.AvailableNow())
          .outputMode("complete")
          .start()
        q.awaitTermination()
      }
      s.table(sink).orderBy("event_type")
    },

    // T14: the COMMIT-LOG TABLE as a first-class Structured Streaming
    // SOURCE — the round-9 lakehouse semantics behind the API a Spark
    // user actually reaches for: `readStream.format("commitlog")`. The
    // version cursor lives in SPARK'S OWN checkpoint as the stream
    // offset (no hand-rolled cursor file — replay, trigger cadence and
    // admission control come from the engine), each micro-batch plans
    // exactly the files its admitted versions ADDED (O(changes), never
    // a table rescan), maxVersionsPerTrigger=1 forces the 3 appends
    // through 3 separate bounded micro-batches (the accounting column
    // pins that drain shape), the v3 pure-delete commit is skipped
    // under ignoreDeletes (appends already emitted stay emitted — the
    // oracle therefore INCLUDES b1's rows), and AvailableNow stops at
    // the entry snapshot. Loss, duplication, or misordering anywhere in
    // manifest → offset range → file plan → parquet read → stateful agg
    // breaks the hash. CommitLogStreamSpec pins restart/replay, the
    // COW hard-fail, startingVersion and schema-evolution null-fill.
    Decl(
      "t14_stream_commitlog",
      s"""SELECT CAST(3 AS BIGINT) AS n_batches, event_type,
         |  count(*) AS n, ${Qh.oSum2("value")} AS total_value
         |FROM events
         |GROUP BY event_type
         |ORDER BY event_type""".stripMargin) { (s, dir) =>
      import s.implicits._
      import graft.sources.CommitLog
      val run = StreamingBatch.t8Runs.incrementAndGet()
      val runId = java.util.UUID.randomUUID()
      val root = Qh.ioDir(s"t14_tbl_$runId")
      val ckpt = Qh.ioDir(s"t14_ckpt_$runId")
      val ev = Qh.t(s, dir, "events")
        .select($"event_id", $"event_type", $"user_id", $"value")
      def stage(batch: String, m: Int): Unit =
        ev.filter($"event_id" % 3 === m)
          .write.mode(SaveMode.Overwrite).parquet(s"$root/$batch")
      stage("b1", 0)
      val c1 = CommitLog.commit(root, 0, added = Seq("b1"),
        schema = Some(ev.schema.toDDL))
      stage("b2", 1)
      val c2 = CommitLog.commit(root, c1.version, added = Seq("b2"))
      val c3 = CommitLog.commit(root, c2.version, added = Nil, removed = Seq("b1"))
      stage("b4", 2)
      CommitLog.commit(root, c3.version, added = Seq("b4"))
      val sink = s"t14_out_$run"
      val q = Streams.withStatePartitions(s) {
        val q0 = s.readStream.format("commitlog")
          .option("path", root)
          .option("ignoreDeletes", true)
          .option("maxVersionsPerTrigger", 1)
          .load()
          .groupBy($"event_type")
          .agg(count(lit(1)).as("n"), Qh.sumd2($"value").as("total_value"))
          .writeStream.format("memory").queryName(sink)
          .option("checkpointLocation", ckpt)
          .trigger(Trigger.AvailableNow())
          .outputMode("complete")
          .start()
        q0.awaitTermination()
        q0
      }
      val nonEmpty = q.recentProgress.count(_.numInputRows > 0)
      s.table(sink)
        .select(lit(nonEmpty.toLong).as("n_batches"),
          $"event_type", $"n", $"total_value")
        .orderBy("event_type")
    },

    // T15: the COMMIT-LOG TABLE as a Structured Streaming SINK — the
    // write half of t14, closing the lakehouse loop: `writeStream
    // .format("commitlog")` lands ONE committed batch per micro-batch
    // epoch with a (queryId, epochId) txn watermark in the SAME
    // manifest (the Delta idempotent-sink protocol: data + watermark
    // publish atomically, a replayed epoch is a no-op — pinned in
    // CommitLogWriteSpec). Three source files under maxFilesPerTrigger=1
    // force three epochs → three committed versions (the n_versions
    // column pins that shape), each born with manifest stats boxes.
    // The landed table is read back through the batch leg of the SAME
    // connector and aggregated; the oracle computes the tripled
    // aggregate from the original parquet, so loss, duplication, or
    // corruption anywhere in stream-read → epoch-commit → parquet →
    // manifest → snapshot read breaks the hash.
    Decl(
      "t15_stream_commitlog_sink",
      s"""SELECT CAST(3 AS INT) AS n_versions, event_type,
         |  CAST(3 * count(*) AS BIGINT) AS n,
         |  CAST(3 * sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
         |FROM events
         |WHERE event_id % 4 = 0
         |GROUP BY event_type
         |ORDER BY event_type""".stripMargin) { (s, dir) =>
      import s.implicits._
      import graft.sources.CommitLog
      val path = s"$dir/events.parquet"
      val runId = java.util.UUID.randomUUID()
      val root = Qh.ioDir(s"t15_tbl_$runId")
      val ckpt = Qh.ioDir(s"t15_ckpt_$runId")
      val srcDir = java.nio.file.Paths.get(Qh.ioDir(s"t15_src_$runId"))
      java.nio.file.Files.createDirectories(srcDir)
      // three links to the fixture = three files = three epochs under
      // maxFilesPerTrigger=1 (the t8 staging pattern, tripled)
      (1 to 3).foreach { i =>
        java.nio.file.Files.createSymbolicLink(
          srcDir.resolve(s"events_$i.parquet"), java.nio.file.Paths.get(path))
      }
      val schema = s.read.parquet(path).schema
      Streams.withStatePartitions(s) {
        val q = s.readStream.schema(schema)
          .option("maxFilesPerTrigger", 1).parquet(srcDir.toString)
          .filter($"event_id" % 4 === 0)
          .select($"event_id", $"event_type", $"user_id", $"value")
          .writeStream.format("commitlog")
          .option("path", root)
          .option("checkpointLocation", ckpt)
          .trigger(Trigger.AvailableNow())
          .outputMode("append")
          .start()
        q.awaitTermination()
      }
      s.read.format("commitlog").option("path", root).load()
        .groupBy($"event_type")
        .agg(count(lit(1)).as("n"), Qh.sumd2($"value").as("total_value"))
        .select(lit(CommitLog.latestVersion(root)).as("n_versions"),
          $"event_type", $"n", $"total_value")
        .orderBy("event_type")
    },

    Decl(
      "t12_stream_envelope_sink",
      s"""SELECT event_type, count(*) AS n, ${Qh.oSum2("value")} AS total_value,
         |  count(DISTINCT user_id) AS n_users
         |FROM events
         |WHERE event_id % 5 = 0
         |GROUP BY event_type
         |ORDER BY event_type""".stripMargin) { (s, dir) =>
      // T12: a REAL streaming query through the custom DSv2 envelope
      // SINK (the streaming half of S19): file stream → filter →
      // EnvelopeStreamingWrite (per-epoch hidden-temp → rename commit,
      // replayed epochs publish once — EnvelopeSourceSpec pins the
      // replay) → read back through the S8 reader → aggregate. The
      // oracle aggregates the original parquet, so any row lost,
      // doubled, or corrupted across stream-read → epoch-commit →
      // JSONL → re-read breaks the hash.
      import s.implicits._
      val path = s"$dir/events.parquet"
      val runId = java.util.UUID.randomUUID()
      val ckpt = Qh.ioDir(s"t12_ckpt_$runId")
      val out = Qh.ioDir(s"t12_out_$runId")
      val srcDir = java.nio.file.Paths.get(Qh.ioDir(s"t12_src_$runId"))
      java.nio.file.Files.createDirectories(srcDir)
      java.nio.file.Files.createSymbolicLink(
        srcDir.resolve("events.parquet"), java.nio.file.Paths.get(path))
      val schema = s.read.parquet(path).schema
      Streams.withStatePartitions(s) {
        val q = s.readStream.schema(schema).parquet(srcDir.toString)
          .filter($"event_id" % 5 === 0)
          .select($"event_id", $"event_type", $"user_id", $"value",
            lit("database").as("source"))
          .writeStream.format("graft.sources.EnvelopeSource")
          .option("path", out)
          .option("checkpointLocation", ckpt)
          .trigger(Trigger.AvailableNow())
          .outputMode("append")
          .start()
        q.awaitTermination()
      }
      s.read.format("graft.sources.EnvelopeSource").option("path", out).load()
        .groupBy($"event_type")
        .agg(
          count(lit(1)).as("n"),
          Qh.sumd2($"value").as("total_value"),
          countDistinct($"user_id").as("n_users"))
        .orderBy("event_type")
    },

    Decl(
      "t8_foreachbatch_jdbc",
      s"""SELECT event_type, count(*) AS n, ${Qh.oSum2("value")} AS total_value
         |FROM events
         |WHERE event_id % 7 = 0
         |GROUP BY event_type
         |ORDER BY event_type""".stripMargin) { (s, dir) =>
      import s.implicits._
      val path = s"$dir/events.parquet"
      val run = StreamingBatch.t8Runs.incrementAndGet()
      val url = s"jdbc:derby:memory:graft_t8_decl_$run;create=true"
      val props = new java.util.Properties()
      props.setProperty("driver", "org.apache.derby.jdbc.EmbeddedDriver")
      props.setProperty("batchsize", "10000")
      val runId = java.util.UUID.randomUUID()
      // under the pid-namespaced scratch root so the dead-JVM sweep
      // reclaims these dirs (a bare /tmp/graft_io/<uuid> path never ages out)
      val ckpt = Qh.ioDir(s"t8_ckpt_$runId")
      // the file streaming source requires a DIRECTORY; the fixture is a
      // single file, so stage a symlink to it in a fresh temp dir (the
      // production shape is a watched directory of arriving files)
      val srcDir = java.nio.file.Paths.get(Qh.ioDir(s"t8_src_$runId"))
      java.nio.file.Files.createDirectories(srcDir)
      java.nio.file.Files.createSymbolicLink(
        srcDir.resolve("events.parquet"), java.nio.file.Paths.get(path))
      // file streaming source needs an explicit schema; take it from the
      // batch reader (ts arrives as ns-Long under nanosAsLong and is
      // dropped before the sink — the loop under test is id/type/value)
      val schema = s.read.parquet(path).schema
      Streams.withStatePartitions(s) {
        val q = s.readStream.schema(schema).parquet(srcDir.toString)
          .filter($"event_id" % 7 === 0)
          .select($"event_id", $"user_id", $"event_type", $"value")
          .writeStream
          .foreachBatch { (df: org.apache.spark.sql.DataFrame, id: Long) =>
            Streams.jdbcForeachBatchWriter(url, "t8_sink", props)(df, id)
          }
          .option("checkpointLocation", ckpt)
          .trigger(Trigger.AvailableNow())
          .outputMode("append")
          .start()
        q.awaitTermination()
      }
      s.read.jdbc(url, "t8_sink", props)
        .groupBy($"event_type")
        .agg(count(lit(1)).as("n"), Qh.sumd2($"value").as("total_value"))
        .orderBy("event_type")
    },

    // T8c: the EXACTLY-ONCE sink path oracle-checked end to end. The
    // same file-source streaming scaffold as T8, but landed through
    // jdbcIdempotentWriter — distributed per-partition transactions,
    // the (batch_id, event_id) unique guard, and the {table}_commits
    // visibility marker — and then DELIVERED A SECOND TIME with a
    // fresh checkpoint, so every row is redelivered as the same batch
    // ids and the delete-then-insert + marker revoke/republish cycle
    // runs for real. The read-back uses the documented marker-join
    // pattern (only batches whose marker committed are visible). The
    // oracle aggregates the ORIGINAL parquet once — any duplicate the
    // redelivery leaks, any row lost, or a half-visible batch breaks
    // the hash.
    Decl(
      "t8c_exactly_once_jdbc",
      s"""SELECT user_id % 10 AS bucket, count(*) AS n,
         |  ${Qh.oSum2("value")} AS total_value
         |FROM events
         |WHERE event_id % 5 = 0
         |GROUP BY 1
         |ORDER BY bucket""".stripMargin) { (s, dir) =>
      import s.implicits._
      val path = s"$dir/events.parquet"
      val run = StreamingBatch.t8Runs.incrementAndGet()
      val url = s"jdbc:derby:memory:graft_t8c_decl_$run;create=true"
      val props = new java.util.Properties()
      props.setProperty("driver", "org.apache.derby.jdbc.EmbeddedDriver")
      val conn = java.sql.DriverManager.getConnection(url, props)
      conn.createStatement().execute(
        "CREATE TABLE t8c_sink (event_id BIGINT, user_id BIGINT, " +
          "value DOUBLE, batch_id BIGINT, part_id INT)")
      conn.close()
      val runId = java.util.UUID.randomUUID()
      val srcDir = java.nio.file.Paths.get(Qh.ioDir(s"t8c_src_$runId"))
      java.nio.file.Files.createDirectories(srcDir)
      java.nio.file.Files.createSymbolicLink(
        srcDir.resolve("events.parquet"), java.nio.file.Paths.get(path))
      val schema = s.read.parquet(path).schema
      def deliver(ckpt: String): Unit = Streams.withStatePartitions(s) {
        val q = s.readStream.schema(schema).parquet(srcDir.toString)
          .filter($"event_id" % 5 === 0)
          .select($"event_id", $"user_id", $"value")
          .writeStream
          .foreachBatch { (df: org.apache.spark.sql.DataFrame, id: Long) =>
            Streams.jdbcIdempotentWriter(url, "t8c_sink", props)(df, id)
          }
          .option("checkpointLocation", ckpt)
          .trigger(Trigger.AvailableNow())
          .outputMode("append")
          .start()
        q.awaitTermination()
      }
      deliver(Qh.ioDir(s"t8c_ckpt_${runId}_a"))
      // full redelivery: fresh checkpoint → the same rows arrive again
      // under the same batch ids; exactly-once must hold
      deliver(Qh.ioDir(s"t8c_ckpt_${runId}_b"))
      s.read.jdbc(url,
          "(SELECT t.event_id, t.user_id, t.value FROM t8c_sink t " +
            "JOIN t8c_sink_commits m ON t.batch_id = m.batch_id) v",
          props)
        .groupBy(($"user_id" % 10).as("bucket"))
        .agg(count(lit(1)).as("n"), Qh.sumd2($"value").as("total_value"))
        .orderBy("bucket")
    }
  )

  /** Fresh in-memory Derby db + checkpoint per t8 invocation (the decl
    * may run several times in one JVM: tests, Verify, Bench). */
  private val t8Runs = new java.util.concurrent.atomic.AtomicInteger(0)
}
