package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

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
    }
  )
}
