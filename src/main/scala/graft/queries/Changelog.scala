package graft.queries

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** SURVEY §2.B C1–C2 — CHANGELOG/CDC compaction over the events table
  * (each event = one version of its user's state, ordered by
  * (ts, event_id); the reference's import stream is exactly such a
  * changelog — kafka-database-import.go row loop).
  *
  * C1 (upsert-latest) is written with `max_by(struct(payload),
  * struct(ord))` — ONE hash aggregate with map-side partial combine:
  * at 100 TB the shuffle carries one pre-reduced row per key per map
  * task, not the full history (a window rn=1 would sort-shuffle every
  * version of every key — strictly worse; this is the compaction shape
  * log-structured stores use). C2 (SCD-2) genuinely needs per-key
  * order, so it pays the one window shuffle to derive validity
  * intervals — the "history table" form a warehouse keeps next to
  * C1's "current table".
  */
object Changelog {

  val decls: Seq[Decl] = Seq(

    // C1: current-state snapshot — latest version per key.
    Decl(
      "c1_upsert_latest",
      """SELECT user_id, event_id AS last_event_id,
        |  event_type AS last_event_type, value AS last_value,
        |  epoch_ms(CAST(ts AS TIMESTAMP)) AS last_ts_ms
        |FROM (
        |  SELECT user_id, event_id, event_type, value, ts,
        |    row_number() OVER (PARTITION BY user_id
        |      ORDER BY CAST(ts AS TIMESTAMP) DESC, event_id DESC) AS rn
        |  FROM events)
        |WHERE rn = 1
        |ORDER BY user_id""".stripMargin) { (s, dir) =>
      import s.implicits._
      Qh.t(s, dir, "events")
        .groupBy($"user_id")
        .agg(max_by(
          struct($"event_id", $"event_type", $"value",
            unix_millis(Qh.tsUs($"ts")).as("ts_ms")),
          struct(Qh.tsUs($"ts"), $"event_id")).as("last"))
        .select($"user_id",
          $"last.event_id".as("last_event_id"),
          $"last.event_type".as("last_event_type"),
          $"last.value".as("last_value"),
          $"last.ts_ms".as("last_ts_ms"))
        .orderBy("user_id")
    },

    // C2: SCD type-2 history — each version's validity interval
    // [valid_from, valid_to), open-ended for the current row.
    Decl(
      "c2_scd2_intervals",
      """SELECT user_id, event_id, event_type,
        |  epoch_ms(CAST(ts AS TIMESTAMP)) AS valid_from_ms,
        |  epoch_ms(lead(CAST(ts AS TIMESTAMP)) OVER w) AS valid_to_ms,
        |  CASE WHEN lead(event_id) OVER w IS NULL THEN 1 ELSE 0 END AS is_current
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id)
        |ORDER BY user_id, valid_from_ms, event_id""".stripMargin) { (s, dir) =>
      import s.implicits._
      val w = Window.partitionBy($"user_id").orderBy(Qh.tsUs($"ts"), $"event_id")
      Qh.t(s, dir, "events")
        .select($"user_id", $"event_id", $"event_type",
          unix_millis(Qh.tsUs($"ts")).as("valid_from_ms"),
          unix_millis(lead(Qh.tsUs($"ts"), 1).over(w)).as("valid_to_ms"),
          when(lead($"event_id", 1).over(w).isNull, 1).otherwise(0).as("is_current"))
        .orderBy("user_id", "valid_from_ms", "event_id")
    },

    // C3: INCREMENTAL AGGREGATE MAINTENANCE — the materialized-view
    // merge loop every 100-TB warehouse runs instead of re-aggregating
    // the corpus per batch. The standing MV keeps ONE mergeable partial
    // row per key (count / DECIMAL sum / max — the same
    // partial-aggregate states Spark's own map-side combine ships);
    // a new batch contributes batch-sized partials, and the refresh is
    // a full-outer coalesce-merge of MV ⋈ batch partials: cost
    // ∝ |MV| + |batch|, the corpus is NEVER rescanned (at 100 TB the
    // MV is keys-sized, orders of magnitude under the fact table; a
    // key-bucketed MV makes the merge exchange-free on the MV side,
    // the S10b/Graph bucketing machinery). The sum is carried as
    // DECIMAL so incremental merge is EXACT — a float accumulator
    // would drift from the oracle's recompute after enough batches.
    // event_id % 10 = 0 stands in for the arriving batch (the
    // l2_incremental_dedup convention); the oracle re-aggregates ALL
    // events from scratch, so a key dropped, double-merged, or
    // wrongly coalesced in the MV refresh breaks the hash.
    Decl(
      "c3_incremental_agg",
      s"""SELECT user_id,
         |  count(*) AS n_events,
         |  ${Qh.oSum2("value")} AS total_value,
         |  epoch_ms(max(CAST(ts AS TIMESTAMP))) AS last_ts_ms
         |FROM events
         |GROUP BY user_id
         |ORDER BY user_id""".stripMargin) { (s, dir) =>
      import s.implicits._
      val root = Qh.ioDir("c3_mv")
      val ev = Qh.t(s, dir, "events")
        .select($"event_id", $"user_id", $"value", Qh.tsUs($"ts").as("ts"))
      def partials(df: DataFrame): DataFrame = df
        .groupBy($"user_id")
        .agg(
          count(lit(1)).as("n_events"),
          sum($"value".cast(DecimalType(18, 2))).as("total_dec"),
          max(unix_millis($"ts")).as("last_ts_ms"))
      // the standing MV: built once from the already-ingested corpus
      partials(ev.filter($"event_id" % 10 =!= 0))
        .write.mode(SaveMode.Overwrite).parquet(s"$root/v0")
      // refresh: MV ⋈ batch partials, one mergeable row per key
      s.read.parquet(s"$root/v0").as("m")
        .join(partials(ev.filter($"event_id" % 10 === 0)).as("b"),
          Seq("user_id"), "full_outer")
        .select($"user_id",
          (coalesce($"m.n_events", lit(0L)) + coalesce($"b.n_events", lit(0L)))
            .as("n_events"),
          (coalesce($"m.total_dec", lit(0).cast(DecimalType(18, 2))) +
            coalesce($"b.total_dec", lit(0).cast(DecimalType(18, 2))))
            .as("total_dec"),
          greatest($"m.last_ts_ms", $"b.last_ts_ms").as("last_ts_ms"))
        .write.mode(SaveMode.Overwrite).parquet(s"$root/v1")
      s.read.parquet(s"$root/v1")
        .select($"user_id", $"n_events",
          $"total_dec".cast(DoubleType).as("total_value"), $"last_ts_ms")
        .orderBy("user_id")
    },

    // C4: CDC APPLY with deletes — MERGE INTO semantics (WHEN MATCHED
    // AND op='D' DELETE / WHEN MATCHED UPDATE / ELSE KEEP), the verb C1
    // (changelog-only compaction) and C2 (history intervals) don't
    // cover: reconciling a base snapshot against a keyed change stream.
    // Latest change per key via partial+final max_by on a unique
    // sequence (no window sort — the C1 discipline), then ONE
    // user-keyed outer join against the base decides keep/update/delete
    // per row. At 100 TB: changes aggregate to key-cardinality before
    // the join, and the base never shuffles more than once.
    Decl(
      "c4_cdc_apply",
      """WITH ch AS (
        |  SELECT o_custkey AS c_custkey, o_orderkey AS seq,
        |    CASE WHEN o_orderkey % 10 < 2 THEN 'D' ELSE 'U' END AS op,
        |    o_totalprice AS new_bal
        |  FROM orders WHERE o_custkey % 5 <> 0),
        |latest AS (
        |  SELECT c_custkey, arg_max(op, seq) AS op, arg_max(new_bal, seq) AS new_bal
        |  FROM ch GROUP BY c_custkey)
        |SELECT b.c_custkey, b.c_name,
        |  CASE WHEN l.op = 'U' THEN l.new_bal ELSE b.c_acctbal END AS acctbal,
        |  coalesce(l.op, 'K') AS last_op
        |FROM customer b LEFT JOIN latest l ON b.c_custkey = l.c_custkey
        |WHERE l.op IS NULL OR l.op <> 'D'
        |ORDER BY b.c_custkey""".stripMargin) { (s, dir) =>
      import s.implicits._
      val ch = Qh
        .t(s, dir, "orders")
        .select(
          $"o_custkey".as("c_custkey"),
          $"o_orderkey".as("seq"),
          when($"o_orderkey" % 10 < 2, lit("D")).otherwise(lit("U")).as("op"),
          $"o_totalprice".as("new_bal"))
        .filter($"c_custkey" % 5 =!= 0) // 20% of keys: no change → KEEP path
      val latest = ch
        .groupBy($"c_custkey")
        .agg(
          max_by($"op", $"seq").as("op"),
          max_by($"new_bal", $"seq").as("new_bal"))
      Qh.t(s, dir, "customer")
        .select($"c_custkey", $"c_name", $"c_acctbal")
        .join(latest, Seq("c_custkey"), "left_outer")
        .filter($"op".isNull || $"op" =!= "D")
        .select(
          $"c_custkey",
          $"c_name",
          when($"op" === "U", $"new_bal").otherwise($"c_acctbal").as("acctbal"),
          coalesce($"op", lit("K")).as("last_op"))
        .orderBy("c_custkey")
    },

    // C5: RETRACTABLE AGGREGATE MAINTENANCE — C3's MV refresh under a
    // change stream that also RETRACTS previously-aggregated rows (the
    // Flink/Materialize retraction model: every change is (row, ±1)).
    // The batch unions inserts (+1) and retractions (−1) and reduces
    // to ONE signed partial row per key before the merge; the
    // full-outer coalesce-merge adds signed counts and DECIMAL sums,
    // and keys whose merged count hits ZERO are dropped from the view
    // (the path plain upsert-MVs never exercise — 76/860/8499 daily
    // keys zero out at sf0.001/0.01/0.1). Count and sum are the
    // retractable aggregates; max is deliberately absent — it is not
    // invertible under deletes (a retracted max needs a re-scan or an
    // order-statistic sketch), which is exactly why production
    // retraction pipelines carry count/sum and recompute extrema.
    // Cost ∝ |MV| + |batch|; the corpus is never rescanned. The oracle
    // re-aggregates the post-change row set from scratch, so a zero
    // key kept, a key dropped early, or a double-applied retraction
    // breaks the hash.
    Decl(
      "c5_retractable_agg",
      s"""WITH e AS (
         |  SELECT event_id, user_id, event_type, value,
         |    epoch_ms(CAST(ts AS TIMESTAMP)) // 86400000 AS day
         |  FROM events)
         |SELECT user_id, event_type, day,
         |  count(*) AS n_events,
         |  ${Qh.oSum2("value")} AS total_value
         |FROM e
         |WHERE event_id % 10 = 0 OR event_id % 7 <> 0
         |GROUP BY user_id, event_type, day
         |ORDER BY user_id, event_type, day""".stripMargin) { (s, dir) =>
      import s.implicits._
      val root = Qh.ioDir("c5_mv")
      val e = Qh.t(s, dir, "events")
        .select($"event_id", $"user_id", $"event_type", $"value",
          (unix_millis(Qh.tsUs($"ts")) / 86400000L).cast("long").as("day"))
      val keys = Seq($"user_id", $"event_type", $"day")
      // standing MV from the already-ingested corpus (event_id%10 != 0)
      e.filter($"event_id" % 10 =!= 0)
        .groupBy(keys: _*)
        .agg(count(lit(1)).as("n"),
          sum($"value".cast(DecimalType(18, 2))).as("s"))
        .write.mode(SaveMode.Overwrite).parquet(s"$root/v0")
      // change batch: new arrivals (+1) ∪ replayed base rows (−1),
      // reduced to one SIGNED partial per key before the merge
      val batch = e.filter($"event_id" % 10 === 0).withColumn("sgn", lit(1L))
        .unionAll(e.filter($"event_id" % 10 =!= 0 && $"event_id" % 7 === 0)
          .withColumn("sgn", lit(-1L)))
        .groupBy(keys: _*)
        .agg(sum($"sgn").as("n"),
          sum(($"value" * $"sgn").cast(DecimalType(18, 2))).as("s"))
      s.read.parquet(s"$root/v0").as("m")
        .join(batch.as("b"), Seq("user_id", "event_type", "day"), "full_outer")
        .select($"user_id", $"event_type", $"day",
          (coalesce($"m.n", lit(0L)) + coalesce($"b.n", lit(0L))).as("n"),
          (coalesce($"m.s", lit(0).cast(DecimalType(18, 2))) +
            coalesce($"b.s", lit(0).cast(DecimalType(18, 2)))).as("s"))
        .filter($"n" > 0) // fully-retracted keys leave the view
        .select($"user_id", $"event_type", $"day", $"n".as("n_events"),
          $"s".cast(DoubleType).as("total_value"))
        .orderBy("user_id", "event_type", "day")
    }
  )
}
