package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SURVEY §2.B W7/W8 — product-analytics operators over the event
  * stream: funnel conversion and cohort retention. Both are the
  * canonical "big events table" queries (reference §1.2 event payloads,
  * recast as the analyses a user of the imported data runs).
  *
  * Scale shape: everything is per-user aggregation + user-keyed
  * equi-joins — partial aggs combine map-side, joins co-locate on the
  * user hash, and no step is ever quadratic in events. Time lives in
  * epoch-millis BIGINT (µs-truncated once), so every comparison and
  * bucket is integer arithmetic — bit-identical across engines.
  */
object Analytics {

  val decls: Seq[Decl] = Seq(

    // W7: FUNNEL — ordered-step conversion signup → click → purchase.
    // Each stage is "earliest qualifying event STRICTLY AFTER the
    // previous stage's time AND within a 24 h step window", the
    // standard windowed-funnel semantics (a purchase before the first
    // qualifying click, or one arriving days later, does not convert).
    // SINGLE-SCAN shape: all three stage times are conditional mins
    // over the same unordered user partition — three chained Window
    // projections share ONE user-keyed exchange (no sort: the frame is
    // the whole partition), then one per-user collapse. The naive form
    // (a join per stage) scans the fact three times; at 100 TB that is
    // 3× the IO for the same answer. Final counts are a single tiny
    // agg. The oracle keeps the equivalent chained-join SQL.
    Decl(
      "w7_funnel",
      s"""WITH e AS (
         |  SELECT user_id, epoch_ms(CAST(ts AS TIMESTAMP)) AS tms, event_type
         |  FROM events),
         |s AS (
         |  SELECT user_id, min(tms) AS st
         |  FROM e WHERE event_type = 'signup' GROUP BY user_id),
         |c AS (
         |  SELECT e.user_id, min(e.tms) AS ct
         |  FROM e JOIN s ON e.user_id = s.user_id
         |  WHERE e.event_type = 'click' AND e.tms > s.st AND e.tms <= s.st + 86400000
         |  GROUP BY e.user_id),
         |p AS (
         |  SELECT e.user_id, min(e.tms) AS pt
         |  FROM e JOIN c ON e.user_id = c.user_id
         |  WHERE e.event_type = 'purchase' AND e.tms > c.ct AND e.tms <= c.ct + 86400000
         |  GROUP BY e.user_id)
         |SELECT
         |  (SELECT CAST(count(*) AS BIGINT) FROM s) AS n_signup,
         |  (SELECT CAST(count(*) AS BIGINT) FROM c) AS n_click,
         |  (SELECT CAST(count(*) AS BIGINT) FROM p) AS n_purchase,
         |  ${Qh.oR6("CAST((SELECT count(*) FROM c) AS DOUBLE) / CAST((SELECT count(*) FROM s) AS DOUBLE)")} AS click_rate,
         |  ${Qh.oR6("CAST((SELECT count(*) FROM p) AS DOUBLE) / CAST((SELECT count(*) FROM s) AS DOUBLE)")} AS purchase_rate""".stripMargin) { (s, dir) =>
      import s.implicits._
      val day = 86400000L
      // whole-partition frame, no ordering — no sort, one exchange
      val byUser = Window.partitionBy($"user_id")
      Qh.t(s, dir, "events")
        .select($"user_id", unix_millis(Qh.tsUs($"ts")).as("tms"), $"event_type")
        .withColumn("st",
          min(when($"event_type" === "signup", $"tms")).over(byUser))
        .withColumn("ct",
          min(when($"event_type" === "click" &&
            $"tms" > $"st" && $"tms" <= $"st" + day, $"tms")).over(byUser))
        .withColumn("pt",
          min(when($"event_type" === "purchase" &&
            $"tms" > $"ct" && $"tms" <= $"ct" + day, $"tms")).over(byUser))
        // st/ct/pt are constant per user — collapse reuses the window's
        // user partitioning, so this agg shuffles nothing new
        .groupBy($"user_id")
        .agg(max($"st").as("st"), max($"ct").as("ct"), max($"pt").as("pt"))
        .agg(
          count($"st").cast("bigint").as("n_signup"),
          count($"ct").cast("bigint").as("n_click"),
          count($"pt").cast("bigint").as("n_purchase"))
        .select(
          $"n_signup",
          $"n_click",
          $"n_purchase",
          Qh.r6($"n_click".cast("double") / $"n_signup".cast("double"))
            .as("click_rate"),
          Qh.r6($"n_purchase".cast("double") / $"n_signup".cast("double"))
            .as("purchase_rate"))
    },

    // W8: COHORT RETENTION — users bucketed by their first-activity
    // epoch week; for each cohort, distinct active users at each week
    // offset (the retention triangle every growth dashboard draws).
    // Distinct (user, week) pairs first (one shuffle, collapses the
    // event volume), cohort via a window min over the SAME user-keyed
    // partitioning (no self-join, no second scan), then a small
    // (cohort, offset) count agg. Absolute epoch-week integers
    // everywhere.
    Decl(
      "w8_retention",
      """WITH uw AS (
        |  SELECT DISTINCT user_id,
        |    epoch_ms(CAST(ts AS TIMESTAMP)) // 604800000 AS wk
        |  FROM events),
        |cohort AS (SELECT user_id, min(wk) AS cw FROM uw GROUP BY user_id)
        |SELECT c.cw AS cohort_week, uw.wk - c.cw AS week_offset,
        |  CAST(count(*) AS BIGINT) AS n_active
        |FROM uw JOIN cohort c ON uw.user_id = c.user_id
        |WHERE uw.wk - c.cw <= 8
        |GROUP BY 1, 2
        |ORDER BY cohort_week, week_offset""".stripMargin) { (s, dir) =>
      import s.implicits._
      Qh.t(s, dir, "events")
        .select(
          $"user_id",
          expr("unix_millis(CAST(ts AS TIMESTAMP)) DIV 604800000").as("wk"))
        .distinct()
        .withColumn("cw", min($"wk").over(Window.partitionBy($"user_id")))
        .filter($"wk" - $"cw" <= 8)
        .groupBy($"cw".as("cohort_week"), ($"wk" - $"cw").as("week_offset"))
        .agg(count(lit(1)).cast("bigint").as("n_active"))
        .orderBy("cohort_week", "week_offset")
    },

    // W10: SEASONAL DECOMPOSITION — the classical additive
    // trend/seasonal/residual split (the moving-average core of STL)
    // over the daily revenue series: trend = centered 7-day moving
    // average (full windows only), seasonal = per-day-of-week mean of
    // the detrended series, residual = what's left. Shape at 100 TB:
    // the heavy step is ONE hash agg collapsing the fact to daily
    // totals; everything after runs on the DAYS-sized series (a few
    // thousand rows for a decade), where the single-partition ordered
    // window is the honest plan — the same justification as the w6
    // gap-fill grid. Exactness: daily totals are exact BIGINT cents;
    // the 7-day sum is integer; trend = s7/7 is one double division of
    // identical integers; detrended terms are r6-rounded then
    // DECIMAL-summed for the order-proof seasonal means. The calendar
    // is densified first (missing days = 0) so the ROWS frame spans
    // true calendar neighbors; day-of-week is pure integer arithmetic
    // (epoch-day mod 7), no timezone anywhere.
    Decl(
      "w10_seasonal_decomp",
      s"""WITH e AS (
         |  SELECT epoch_ms(CAST(ts AS TIMESTAMP)) // 86400000 AS d,
         |    CAST(floor(value * 100 + 0.5) AS BIGINT) AS vi
         |  FROM events),
         |daily AS (SELECT d, CAST(sum(vi) AS BIGINT) AS y FROM e GROUP BY d),
         |b AS (SELECT min(d) AS mn, max(d) AS mx FROM daily),
         |grid AS (SELECT unnest(range(mn, mx + 1)) AS d FROM b),
         |dense AS (
         |  SELECT g.d, coalesce(daily.y, CAST(0 AS BIGINT)) AS y
         |  FROM grid g LEFT JOIN daily ON g.d = daily.d),
         |tr AS (
         |  SELECT d, y,
         |    count(y) OVER w AS n7,
         |    CAST(sum(y) OVER w AS BIGINT) AS s7
         |  FROM dense
         |  WINDOW w AS (ORDER BY d ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
         |t2 AS (
         |  SELECT d, y, CAST(s7 AS DOUBLE) / 7.0 AS trend, d % 7 AS dow,
         |    ${Qh.oR6("CAST(y AS DOUBLE) - CAST(s7 AS DOUBLE) / 7.0")} AS detr6
         |  FROM tr WHERE n7 = 7),
         |seas AS (
         |  SELECT dow, ${Qh.oR6(s"(${Qh.oSum6("detr6")} / count(*))")} AS seasonal
         |  FROM t2 GROUP BY dow)
         |SELECT t2.d AS day, t2.y AS y_cents,
         |  ${Qh.oR6("t2.trend")} AS trend,
         |  seas.seasonal,
         |  ${Qh.oR6("CAST(t2.y AS DOUBLE) - t2.trend - seas.seasonal")} AS residual
         |FROM t2 JOIN seas ON t2.dow = seas.dow
         |ORDER BY day""".stripMargin) { (s, dir) =>
      import s.implicits._
      // the ONE fact-sized step: collapse to daily totals, materialize —
      // every consumer below (grid bounds, densify join, windows) reads
      // the days-sized series, never the fact again (PlanSpec-gated)
      val daily = Qh.materialize(Qh.t(s, dir, "events")
        .select(
          (unix_millis(Qh.tsUs($"ts")) / 86400000L).cast("long").as("d"),
          floor($"value" * 100 + lit(0.5)).cast("long").as("vi"))
        .groupBy($"d").agg(sum($"vi").as("y")))
      val grid = daily.agg(min($"d").as("mn"), max($"d").as("mx"))
        .select(explode(sequence($"mn", $"mx")).as("d"))
      val dense = grid.join(daily, Seq("d"), "left")
        .select($"d", coalesce($"y", lit(0L)).as("y"))
      // days-sized series: single-partition ordered window is the plan
      val w = Window.orderBy($"d").rowsBetween(-3, 3)
      val t2 = dense
        .withColumn("n7", count($"y").over(w))
        .withColumn("s7", sum($"y").over(w))
        .filter($"n7" === 7)
        .withColumn("trend", $"s7".cast("double") / 7.0)
        .withColumn("dow", ($"d" % 7).cast("long"))
        .withColumn("detr6", Qh.r6($"y".cast("double") - $"trend"))
      val seas = t2.groupBy($"dow")
        .agg(Qh.r6(Qh.sumd6($"detr6") / count(lit(1))).as("seasonal"))
      t2.join(broadcast(seas), "dow")
        .select($"d".as("day"), $"y".as("y_cents"),
          Qh.r6($"trend").as("trend"), $"seasonal",
          Qh.r6($"y".cast("double") - $"trend" - $"seasonal").as("residual"))
        .orderBy("day")
    },

    // W9: ROLLING Z-SCORE ANOMALY DETECTION — flag events whose value
    // deviates > 3σ from that user's own trailing window (previous 20
    // events, ≥ 10 required), the standard streaming-metrics outlier
    // rule. One user-keyed exchange + one in-partition sort serves the
    // whole computation — the w3 frames shape, so it scales as far as
    // any per-entity window does. Exactness: values live on the cent
    // grid, so they scale to EXACT BIGINT (vi = value·100); the
    // trailing count/sum/sum-of-squares are integer window aggs
    // (order-proof — no float accumulation across an arbitrary frame
    // order), and z = (n·x − Σv) / √(n·Σv² − (Σv)²) evaluates in
    // doubles from identical exact integers on both engines. Variance
    // products stay ≪ 2^63 (n ≤ 20, vi ≤ 49 002).
    Decl(
      "w9_anomaly",
      s"""WITH e AS (
         |  SELECT event_id, user_id, epoch_ms(CAST(ts AS TIMESTAMP)) AS tms,
         |    CAST(floor(value * 100 + 0.5) AS BIGINT) AS vi, value
         |  FROM events),
         |st AS (
         |  SELECT *,
         |    CAST(count(vi) OVER w AS BIGINT) AS n,
         |    CAST(sum(vi) OVER w AS BIGINT) AS sv,
         |    CAST(sum(vi * vi) OVER w AS BIGINT) AS sv2
         |  FROM e
         |  WINDOW w AS (PARTITION BY user_id ORDER BY tms, event_id
         |               ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING))
         |SELECT event_id, user_id, value,
         |  ${Qh.oR6("CAST(n * vi - sv AS DOUBLE) / sqrt(CAST(n * sv2 - sv * sv AS DOUBLE))")} AS z
         |FROM st
         |WHERE n >= 10 AND n * sv2 - sv * sv > 0
         |  AND abs(CAST(n * vi - sv AS DOUBLE) / sqrt(CAST(n * sv2 - sv * sv AS DOUBLE))) > 3.0
         |ORDER BY event_id""".stripMargin) { (s, dir) =>
      import s.implicits._
      val w = Window.partitionBy($"user_id").orderBy($"tms", $"event_id")
        .rowsBetween(-20, -1)
      Qh.t(s, dir, "events")
        .select($"event_id", $"user_id", unix_millis(Qh.tsUs($"ts")).as("tms"),
          floor($"value" * 100 + lit(0.5)).cast("long").as("vi"), $"value")
        // vi² precomputed so all three trailing aggs share plain column
        // inputs — Catalyst then collapses them into ONE Window node
        // (one pass over each frame buffer), PlanSpec-gated
        .withColumn("vi2", $"vi" * $"vi")
        .withColumn("n", count($"vi").over(w).cast("long"))
        .withColumn("sv", sum($"vi").over(w).cast("long"))
        .withColumn("sv2", sum($"vi2").over(w).cast("long"))
        .filter($"n" >= 10 && $"n" * $"sv2" - $"sv" * $"sv" > 0)
        .withColumn("z", ($"n" * $"vi" - $"sv").cast("double") /
          sqrt(($"n" * $"sv2" - $"sv" * $"sv").cast("double")))
        .filter(abs($"z") > 3.0)
        .select($"event_id", $"user_id", $"value", Qh.r6($"z").as("z"))
        .orderBy("event_id")
    },

    // W11: EXPONENTIALLY-WEIGHTED moving average per user — the
    // recursive smoother (s_i = α·v_i + (1−α)·s_{i−1}) that frame
    // windows cannot express: every output depends on the ENTIRE
    // prefix, so it runs as an ordered per-key fold. α = 1/2 is chosen
    // deliberately: each step is (s + v) / 2 — one add and one exact
    // binary halving — so the fold is bit-identical across engines
    // with NO per-step rounding (the general-α form would need the
    // fixed-point discipline). Order is made total by (µs-cast ts,
    // event_id) — the oracle casts TIMESTAMP_NS → TIMESTAMP so the
    // order-sensitive fold breaks ties identically on ns-precision
    // fixtures (the Qh.tsUs discipline; the engine folds µs order).
    // Shape: ONE user-keyed agg (collect partials concat map-side),
    // per-user fold over a bounded event list — the per-entity
    // sessionized-data contract; truly unbounded keys would move to
    // the T6 stateful streaming form, which maintains exactly this
    // fold incrementally. Only the final smoothed value is rounded.
    Decl(
      "w11_ewma",
      """WITH s AS (
        |  SELECT user_id, count(*) AS n,
        |    list(value ORDER BY CAST(ts AS TIMESTAMP), event_id) AS vals
        |  FROM events GROUP BY user_id)
        |SELECT user_id, CAST(n AS BIGINT) AS n_events,
        |  floor(list_reduce(vals, (a, v) -> (a + v) / 2.0) * 1000000 + 0.5)
        |    / 1000000.0 AS ewma
        |FROM s ORDER BY user_id""".stripMargin) { (s, dir) =>
      import s.implicits._
      // DuckDB's seedless list_reduce starts at vals[1]; Spark's
      // aggregate mirrors that with vals[0] as the seed over the tail
      val foldExpr =
        """aggregate(
          |  slice(vals, 2, size(vals) - 1),
          |  element_at(vals, 1),
          |  (a, v) -> (a + v) / CAST(2.0 AS DOUBLE))""".stripMargin
      Qh.t(s, dir, "events")
        .select($"user_id", Qh.tsUs($"ts").as("ts"), $"event_id", $"value")
        .groupBy($"user_id")
        .agg(
          count(lit(1)).as("n_events"),
          expr("transform(array_sort(collect_list(struct(ts, event_id, value))), x -> x.value)")
            .as("vals"))
        .select($"user_id", $"n_events",
          Qh.r6(expr(foldExpr)).as("ewma"))
        .orderBy("user_id")
    }
  )
}
