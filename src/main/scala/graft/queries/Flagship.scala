package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The reference pipeline itself, batch form (SURVEY §7 Step 1):
  *
  *   events ⋉ user-allowlist  →  limit  →  envelope  →  to_json
  *
  * i.e. §2.A R2–R8 composed: dimension scan + semi-join (R4,
  * kafka-database-import.go:149-170), client limit (R5, :180-185),
  * envelope projection (R7, :199), JSON serialization (R8, :200).
  * The fixture set has no user_filter table, so the allowlist dimension
  * is derived: users with at least one signup event — same shape as the
  * reference's userFilter collection (a small keyed allowlist).
  *
  * Scale: the allowlist is broadcast (the reference materializes the whole
  * dimension in driver RAM via cur.All — broadcast is the distributed form
  * of the same decision); the fact side never shuffles. The whole plan is
  * scan → broadcast-semi-join → project → limit: shuffle-free.
  */
object Flagship {

  /** Raw pipeline for SparkEntry.entry: Kafka-sink-shaped output
    * (single `value` column of JSON bytes-as-string, R9-ready). */
  def pipeline(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = Qh.t(s, dir, "events")
    val allow = ev.filter($"event_type" === "signup")
      .select($"user_id").distinct()
    val out = ev.join(broadcast(allow), Seq("user_id"), "left_semi")
      .limit(250000) // reference MaxRecs (:111); clean semantics, off-by-one documented not reproduced
      .select(
        to_json(
          struct(
            struct($"event_id", $"event_type", $"user_id", $"value").as("data"),
            lit("database").as("source")),
          Map("ignoreNullFields" -> "false")).as("value"))
    // R10: declarative progress counter (rides the plan, no extra pass)
    graft.Metrics.observed(out)
  }

  /** Deterministic decl form of the same composition (order/limit made
    * stable so the DuckDB hash-compare holds). */
  val decls: Seq[Decl] = Seq(
    Decl(
      "flagship_pipeline",
      """SELECT event_id,
        |  to_json(struct_pack(
        |    data := struct_pack(event_id := event_id, event_type := event_type, user_id := user_id),
        |    source := 'database'))::VARCHAR AS value
        |FROM events
        |WHERE user_id IN (SELECT user_id FROM events WHERE event_type = 'signup')
        |ORDER BY event_id
        |LIMIT 500""".stripMargin) { (s, dir) =>
      import s.implicits._
      val ev = Qh.t(s, dir, "events")
      val allow = ev.filter($"event_type" === "signup")
        .select($"user_id").distinct()
      ev.join(broadcast(allow), Seq("user_id"), "left_semi")
        .orderBy("event_id")
        .limit(500)
        .select(
          $"event_id",
          to_json(
            struct(
              struct($"event_id", $"event_type", $"user_id").as("data"),
              lit("database").as("source")),
            Map("ignoreNullFields" -> "false")).as("value"))
    }
  )
}
