package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** SURVEY §2.B W1–W4 — window-function surface.
  *
  * Physical shape: one shuffle on the partition key, sort within
  * partitions, then a single WindowExec pass — no join, no second
  * shuffle. At 100 TB the partition key (customer/user) has bounded
  * per-key row counts, so no single window partition can blow past an
  * executor; a global-ORDER-BY window (empty partitionBy) is the
  * anti-pattern deliberately absent here.
  *
  * Determinism: every window ORDER BY carries a unique tiebreaker
  * (orderkey/event_id) — row_number over a tied sort is otherwise free
  * to differ between engines. Window sums go through DECIMAL so frame
  * evaluation order (Spark running-accumulate vs DuckDB segment tree)
  * can't change the float result.
  */
object Windows {

  val decls: Seq[Decl] = Seq(

    Decl(
      "w1_ranking",
      """SELECT o_orderkey, o_custkey,
        |  row_number() OVER w AS rn,
        |  rank()       OVER w AS rk,
        |  dense_rank() OVER w AS drk
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY CAST(o_orderdate AS DATE), o_orderkey)
        |ORDER BY o_orderkey""".stripMargin) { (s, dir) =>
      import s.implicits._
      val w = Window.partitionBy($"o_custkey")
        .orderBy($"o_orderdate".cast(DateType), $"o_orderkey")
      Qh.t(s, dir, "orders")
        .select(
          $"o_orderkey", $"o_custkey",
          row_number().over(w).as("rn"),
          rank().over(w).as("rk"),
          dense_rank().over(w).as("drk"))
        .orderBy("o_orderkey")
    },

    // lag/lead/first/last with EXPLICIT rows frames (the ANSI default
    // frame for last_value is RANGE ... CURRENT ROW, which makes
    // last_value ≡ current row — explicit frames say what we mean).
    Decl(
      "w2_analytic",
      """SELECT event_id,
        |  lag(value)  OVER w AS prev_value,
        |  lead(value) OVER w AS next_value,
        |  first_value(event_type) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS first_type,
        |  last_value(event_type)  OVER (w ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS final_type
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id)
        |ORDER BY event_id""".stripMargin) { (s, dir) =>
      import s.implicits._
      val w = Window.partitionBy($"user_id").orderBy(Qh.tsUs($"ts"), $"event_id")
      val wFromStart = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wToEnd = w.rowsBetween(Window.currentRow, Window.unboundedFollowing)
      Qh.t(s, dir, "events")
        .select(
          $"event_id",
          lag($"value", 1).over(w).as("prev_value"),
          lead($"value", 1).over(w).as("next_value"),
          first($"event_type").over(wFromStart).as("first_type"),
          last($"event_type").over(wToEnd).as("final_type"))
        .orderBy("event_id")
    },

    // Frame specs: running sum (unbounded→current), sliding 3-row mean,
    // and a RANGE frame over a numeric order key.
    Decl(
      "w3_frames",
      """SELECT o_orderkey,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_total,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER (w ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE) AS sliding_total,
        |  CAST(count(*) OVER (PARTITION BY o_custkey ORDER BY o_orderkey RANGE BETWEEN 5 PRECEDING AND 5 FOLLOWING) AS BIGINT) AS n_near
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderkey)
        |ORDER BY o_orderkey""".stripMargin) { (s, dir) =>
      import s.implicits._
      val w = Window.partitionBy($"o_custkey").orderBy($"o_orderkey")
      val dec = $"o_totalprice".cast(DecimalType(18, 2))
      Qh.t(s, dir, "orders")
        .select(
          $"o_orderkey",
          sum(dec).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
            .cast(DoubleType).as("running_total"),
          sum(dec).over(w.rowsBetween(-2, Window.currentRow))
            .cast(DoubleType).as("sliding_total"),
          count(lit(1)).over(w.rangeBetween(-5, 5)).as("n_near"))
        .orderBy("o_orderkey")
    },

    // W5: distribution functions — ntile / percent_rank / cume_dist.
    // percent_rank = (rank-1)/(n-1) and cume_dist = rows≤cur/n are the
    // same double division on identical integers in both engines, so
    // they hash-match without rounding; total order via o_orderkey.
    Decl(
      "w5_distribution",
      """SELECT o_orderkey, o_orderstatus,
        |  ntile(4)       OVER w AS quartile,
        |  percent_rank() OVER w AS pct_rank,
        |  cume_dist()    OVER w AS cdist
        |FROM orders
        |WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice, o_orderkey)
        |ORDER BY o_orderkey""".stripMargin) { (s, dir) =>
      import s.implicits._
      val w = Window.partitionBy($"o_orderstatus")
        .orderBy($"o_totalprice", $"o_orderkey")
      Qh.t(s, dir, "orders")
        .select(
          $"o_orderkey", $"o_orderstatus",
          ntile(4).over(w).as("quartile"),
          percent_rank().over(w).as("pct_rank"),
          cume_dist().over(w).as("cdist"))
        .orderBy("o_orderkey")
    },

    // W3b: event-time RANGE frame — trailing 10-minute count per user.
    // RANGE peers are defined by the interval, so ties in ts behave
    // identically on both engines (no ROWS-frame order sensitivity).
    Decl(
      "w3_time_range",
      """SELECT event_id,
        |  count(*) OVER (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP)
        |    RANGE BETWEEN INTERVAL '10 minutes' PRECEDING AND CURRENT ROW) AS n_trailing_10m
        |FROM events
        |ORDER BY event_id""".stripMargin) { (s, dir) =>
      Qh.t(s, dir, "events").createOrReplaceTempView("w3b_events")
      s.sql(
        """SELECT event_id,
          |  count(*) OVER (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP)
          |    RANGE BETWEEN INTERVAL '10' MINUTE PRECEDING AND CURRENT ROW) AS n_trailing_10m
          |FROM w3b_events
          |ORDER BY event_id""".stripMargin)
    },

    // W6: calendar densification + forward fill — the time-series
    // gap-fill every reporting/feature pipeline needs: a common daily
    // grid (global min..max, kept IN the plan — scalar agg + broadcast,
    // no driver collect), per-user daily aggregates left-joined on, and
    // the last observed total carried forward with last(ignoreNulls).
    // Scale: the grid is |users| × |days| (tiny next to the events), the
    // join and the fill window both key on user_id — one shuffle.
    Decl(
      "w6_gap_fill",
      s"""WITH bounds AS (
         |  SELECT CAST(min(CAST(ts AS TIMESTAMP)) AS DATE) AS a,
         |         CAST(max(CAST(ts AS TIMESTAMP)) AS DATE) AS b FROM events),
         |days AS (
         |  SELECT CAST(unnest(generate_series(CAST(a AS TIMESTAMP), CAST(b AS TIMESTAMP), INTERVAL '1 day')) AS DATE) AS day
         |  FROM bounds),
         |users AS (SELECT DISTINCT user_id FROM events),
         |daily AS (
         |  SELECT user_id, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
         |    count(*) AS n, ${Qh.oSum2("value")} AS total
         |  FROM events GROUP BY 1, 2)
         |SELECT u.user_id, d.day,
         |  coalesce(daily.n, 0) AS n_events,
         |  last_value(daily.total IGNORE NULLS) OVER (
         |    PARTITION BY u.user_id ORDER BY d.day
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS carried_total
         |FROM users u
         |CROSS JOIN days d
         |LEFT JOIN daily ON daily.user_id = u.user_id AND daily.day = d.day
         |ORDER BY u.user_id, d.day""".stripMargin) { (s, dir) =>
      import s.implicits._
      val ev = Qh.t(s, dir, "events")
        .select($"user_id", Qh.tsUs($"ts").cast(DateType).as("day"), $"value")
      val daily = ev.groupBy($"user_id", $"day")
        .agg(count(lit(1)).as("n"), Qh.sumd2($"value").as("total"))
      val days = ev.agg(min($"day").as("a"), max($"day").as("b"))
        .select(explode(sequence($"a", $"b", expr("interval 1 day"))).as("day"))
      val users = ev.select($"user_id").distinct()
      val w = Window.partitionBy($"user_id").orderBy($"day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      users.crossJoin(broadcast(days))
        .join(daily, Seq("user_id", "day"), "left")
        .select(
          $"user_id", $"day",
          coalesce($"n", lit(0)).as("n_events"),
          last($"total", ignoreNulls = true).over(w).as("carried_total"))
        .orderBy("user_id", "day")
    },

    // Top-K per group on the CUSTOM two-phase operator
    // (graft.plans.TopKPerGroup: partial bounded heaps before the
    // shuffle, final merge after — shuffles ≤ k·groups·partitions rows
    // instead of all rows like the window idiom). The oracle states the
    // standard row_number() form, so the custom physical operator is
    // hash-checked against DuckDB through the driver's gate; exact
    // equality with Spark's own window idiom is pinned separately in
    // TopKPerGroupSpec.
    Decl(
      "w4_topk_per_group",
      """SELECT o_custkey, o_orderkey, o_totalprice
        |FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders)
        |WHERE rn <= 3
        |ORDER BY o_custkey, o_orderkey""".stripMargin) { (s, dir) =>
      import s.implicits._
      graft.plans.TopKPerGroup(
          Qh.t(s, dir, "orders")
            .select($"o_custkey", $"o_orderkey", $"o_totalprice"),
          groupCols = Seq("o_custkey"),
          orderSpec = Seq(("o_totalprice", false), ("o_orderkey", true)),
          k = 3)
        .orderBy("o_custkey", "o_orderkey")
    },

    // Same top-k, written in the PLAIN window idiom a user would write.
    // The graft.plans.TopKWindowRewrite optimizer rule recognizes
    // Filter(row_number() <= k) and inserts the bounded-heap
    // TopKPerGroupNode below the Window, so this query runs on the
    // custom operator WITHOUT calling the DSL — PlanSpec asserts
    // TopKPerGroupExec is in the physical plan.
    Decl(
      "w4_topk_window_idiom",
      """SELECT o_custkey, o_orderkey, o_totalprice, rn
        |FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders)
        |WHERE rn <= 3
        |ORDER BY o_custkey, rn""".stripMargin) { (s, dir) =>
      import s.implicits._
      val w = Window.partitionBy($"o_custkey")
        .orderBy($"o_totalprice".desc, $"o_orderkey")
      Qh.t(s, dir, "orders")
        .select($"o_custkey", $"o_orderkey", $"o_totalprice")
        .withColumn("rn", row_number().over(w))
        .filter($"rn" <= 3)
        .orderBy("o_custkey", "rn")
    }
  )
}
