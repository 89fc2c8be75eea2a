package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** SURVEY §2.B A1–A7 — aggregation surface.
  *
  * All shapes are partial+final hash aggregations (HashAggregateExec with
  * map-side combine): at 100 TB each query shuffles only the grouped
  * partials (|groups| × |agg bufs|), never raw rows. Group-by keys here
  * are low-cardinality; skewed high-cardinality keys would lean on AQE
  * skew handling (enabled in Engine.builder).
  *
  * Float discipline (see [[Qh]]): every double aggregate goes through
  * decimal-exact sums so results are shuffle-order-independent, and the
  * identical formula is emitted in the oracle SQL.
  *
  * Reference anchor: the reference's only aggregation is R10's progress
  * counting (kafka-database-import.go:215-218); A1–A7 generalize it to
  * the declared engine surface.
  */
object Aggregations {

  /** stddev/variance via decimal-exact moments: both engines compute
    * sqrt((s2 - s1²/n)/(n-1)) in identical double arithmetic on exact
    * decimal sums, so results match bit-for-bit regardless of partition
    * or shuffle order (naive stddev(double) is order-dependent). */
  private def oMoments(x: String): (String, String, String) = (
    s"CAST(sum(CAST($x AS DECIMAL(18,2)) * CAST($x AS DECIMAL(18,2))) AS DOUBLE)",
    s"CAST(sum(CAST($x AS DECIMAL(18,2))) AS DOUBLE)",
    "CAST(count(*) AS DOUBLE)")

  val decls: Seq[Decl] = Seq(

    // TPC-H Q1 shape: the canonical partial+final hash agg.
    Decl(
      "a1_hashagg",
      s"""SELECT l_returnflag, l_linestatus,
         |  ${Qh.oSum2("l_quantity")} AS sum_qty,
         |  ${Qh.oSum2("l_extendedprice")} AS sum_base_price,
         |  ${Qh.oSum6("l_extendedprice * (1 - l_discount)")} AS sum_disc_price,
         |  ${Qh.oAvg2("l_quantity")} AS avg_qty,
         |  ${Qh.oAvg2("l_extendedprice")} AS avg_price,
         |  count(*) AS count_order
         |FROM lineitem
         |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
         |GROUP BY l_returnflag, l_linestatus
         |ORDER BY l_returnflag, l_linestatus""".stripMargin) { (s, dir) =>
      import s.implicits._
      Qh.t(s, dir, "lineitem")
        .filter($"l_shipdate" <= lit("1998-09-02").cast(TimestampType))
        .groupBy($"l_returnflag", $"l_linestatus")
        .agg(
          Qh.sumd2($"l_quantity").as("sum_qty"),
          Qh.sumd2($"l_extendedprice").as("sum_base_price"),
          Qh.sumd6($"l_extendedprice" * (lit(1) - $"l_discount")).as("sum_disc_price"),
          Qh.avgd2($"l_quantity").as("avg_qty"),
          Qh.avgd2($"l_extendedprice").as("avg_price"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    },

    Decl(
      "a2_distinct",
      """SELECT o_orderpriority,
        |  count(DISTINCT o_custkey) AS n_custs,
        |  count(*) AS n_orders
        |FROM orders
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin) { (s, dir) =>
      import s.implicits._
      Qh.t(s, dir, "orders")
        .groupBy($"o_orderpriority")
        .agg(
          countDistinct($"o_custkey").as("n_custs"),
          count(lit(1)).as("n_orders"))
        .orderBy("o_orderpriority")
    },

    // HLL++ sketch checked by tolerance against the exact count: the
    // oracle asserts `true`, the engine asserts |approx-exact| within
    // 5% + 2. Cross-engine sketch equality is impossible (different HLL
    // impls); the tolerance invariant IS the checkable contract.
    Decl(
      "a3_approx_distinct",
      """SELECT event_type,
        |  count(DISTINCT user_id) AS exact_users,
        |  TRUE AS approx_ok
        |FROM events
        |GROUP BY event_type
        |ORDER BY event_type""".stripMargin) { (s, dir) =>
      import s.implicits._
      // pre-aggregate to distinct (event_type, user_id) pairs FIRST:
      // mixing countDistinct with a plain agg otherwise plans an Expand
      // that doubles every input row before the shuffle. HLL registers
      // are duplicate-insensitive, so the sketch over deduped pairs is
      // BIT-IDENTICAL to the sketch over raw rows — same estimate, no
      // Expand, and at 100 TB the map-side partial dedup means the
      // sketch updates once per distinct pair instead of once per row.
      Qh.t(s, dir, "events")
        .groupBy($"event_type", $"user_id").agg(Map.empty[String, String])
        .groupBy($"event_type")
        .agg(
          count(lit(1)).as("exact_users"),
          // rsd = 1%: the declared 5%+2 acceptance band is then a ~5σ
          // margin — holds at EVERY scale factor, where the default 5%
          // rsd deterministically breached the band at sf0.1 (an HLL
          // estimate is a fixed function of the data; one bad group
          // stays bad). Sketch cost is still KB-sized.
          approx_count_distinct($"user_id", 0.01).as("approx_users"))
        .select(
          $"event_type",
          $"exact_users",
          (abs($"approx_users" - $"exact_users") <= lit(2) + $"exact_users" * 0.05)
            .as("approx_ok"))
        .orderBy("event_type")
    },

    // Mergeable sketches: per-group HLL sketches union into a global
    // estimate WITHOUT re-scanning — the 100 TB pattern for distinct
    // counts over partitioned/incremental data (sketches are the only
    // thing that moves). Tolerance contract like a3: the oracle asserts
    // the exact value and `TRUE`; the engine must land within 5% + 2.
    Decl(
      "a3_hll_merge",
      """SELECT count(DISTINCT user_id) AS exact_total,
        |  TRUE AS merged_ok
        |FROM events""".stripMargin) { (s, dir) =>
      import s.implicits._
      val perType = Qh.t(s, dir, "events")
        .groupBy($"event_type")
        .agg(hll_sketch_agg($"user_id").as("sketch"))
      val merged = perType
        .agg(hll_sketch_estimate(hll_union_agg($"sketch")).as("approx_total"))
      val exact = Qh.t(s, dir, "events")
        .agg(countDistinct($"user_id").as("exact_total"))
      merged.crossJoin(exact)
        .select(
          $"exact_total",
          (abs($"approx_total" - $"exact_total") <= lit(2) + $"exact_total" * 0.05)
            .as("merged_ok"))
    },

    Decl(
      "a4_rollup",
      s"""SELECT coalesce(o_orderstatus, '(all)') AS status,
         |  coalesce(o_orderpriority, '(all)') AS priority,
         |  count(*) AS n,
         |  ${Qh.oSum2("o_totalprice")} AS total
         |FROM orders
         |GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
         |ORDER BY status, priority""".stripMargin) { (s, dir) =>
      import s.implicits._
      Qh.t(s, dir, "orders")
        .rollup($"o_orderstatus", $"o_orderpriority")
        .agg(count(lit(1)).as("n"), Qh.sumd2($"o_totalprice").as("total"))
        .select(
          coalesce($"o_orderstatus", lit("(all)")).as("status"),
          coalesce($"o_orderpriority", lit("(all)")).as("priority"),
          $"n", $"total")
        .orderBy("status", "priority")
    },

    // A4c: explicit GROUPING SETS — the general form rollup/cube sugar
    // over; executed as one Expand + hash agg (each input row fans out
    // once per set, partial combine still applies).
    Decl(
      "a4_grouping_sets",
      s"""SELECT coalesce(o_orderstatus, '(all)') AS status,
         |  coalesce(o_orderpriority, '(all)') AS priority,
         |  count(*) AS n,
         |  ${Qh.oSum2("o_totalprice")} AS total
         |FROM orders
         |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
         |ORDER BY status, priority""".stripMargin) { (s, dir) =>
      import s.implicits._
      Qh.t(s, dir, "orders").createOrReplaceTempView("a4_orders")
      s.sql(
        """SELECT coalesce(o_orderstatus, '(all)') AS status,
          |  coalesce(o_orderpriority, '(all)') AS priority,
          |  count(*) AS n,
          |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
          |FROM a4_orders
          |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
          |ORDER BY status, priority""".stripMargin)
    },

    Decl(
      "a4_cube",
      """SELECT coalesce(l_returnflag, '(all)') AS rflag,
        |  coalesce(l_linestatus, '(all)') AS lstatus,
        |  count(*) AS n
        |FROM lineitem
        |GROUP BY CUBE (l_returnflag, l_linestatus)
        |ORDER BY rflag, lstatus""".stripMargin) { (s, dir) =>
      import s.implicits._
      Qh.t(s, dir, "lineitem")
        .cube($"l_returnflag", $"l_linestatus")
        .agg(count(lit(1)).as("n"))
        .select(
          coalesce($"l_returnflag", lit("(all)")).as("rflag"),
          coalesce($"l_linestatus", lit("(all)")).as("lstatus"),
          $"n")
        .orderBy("rflag", "lstatus")
    },

    Decl(
      "a5_filtered_agg",
      s"""SELECT user_id,
         |  CAST(sum(CAST(value AS DECIMAL(18,2))) FILTER (WHERE event_type = 'purchase') AS DOUBLE) AS purchase_total,
         |  count(*) FILTER (WHERE event_type = 'click') AS n_clicks,
         |  count(*) AS n_events
         |FROM events
         |GROUP BY user_id
         |ORDER BY user_id""".stripMargin) { (s, dir) =>
      import s.implicits._
      Qh.t(s, dir, "events")
        .groupBy($"user_id")
        .agg(
          Qh.sumd2(when($"event_type" === "purchase", $"value")).as("purchase_total"),
          count(when($"event_type" === "click", lit(1))).as("n_clicks"),
          count(lit(1)).as("n_events"))
        .orderBy("user_id")
    },

    // Pivot: event_type values spread to columns (groupBy().pivot() with
    // an EXPLICIT value list — at scale an implicit pivot means an extra
    // distinct-collect job over the full table; the explicit list keeps
    // it a single pass).
    Decl(
      "a8_pivot",
      s"""SELECT user_id,
         |  count(*) FILTER (WHERE event_type = 'click') AS click,
         |  count(*) FILTER (WHERE event_type = 'error') AS error,
         |  count(*) FILTER (WHERE event_type = 'purchase') AS purchase,
         |  count(*) FILTER (WHERE event_type = 'signup') AS signup,
         |  count(*) FILTER (WHERE event_type = 'view') AS view
         |FROM events
         |GROUP BY user_id
         |ORDER BY user_id""".stripMargin) { (s, dir) =>
      import s.implicits._
      Qh.t(s, dir, "events")
        .groupBy($"user_id")
        .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
        .agg(count(lit(1)))
        .na.fill(0L)
        .orderBy("user_id")
    },

    // min/max/stddev/variance/median — order-independent forms only.
    // NOTE on the exact `percentile`: it buffers every (value, count)
    // per group in executor memory, which is correct at oracle scale
    // but an OOM at 100 TB. The scale path is `a6_approx_percentile`
    // below (bounded-memory mergeable sketch); this decl exists to pin
    // exact cross-engine medians at the small-sf oracle contract.
    // Variance is rounded at 2 decimals (not 6): var ~ 1e9 at r6 needs
    // 16 significant digits — past double precision, so the last ulp of
    // the decimal→double cast could flip the rounding between engines.
    Decl(
      "a6_stats", {
        val (s2, s1, n) = oMoments("l_extendedprice")
        s"""SELECT l_returnflag,
           |  min(l_extendedprice) AS min_price,
           |  max(l_extendedprice) AS max_price,
           |  ${Qh.oR6(s"sqrt(($s2 - $s1 * $s1 / $n) / ($n - 1))")} AS std_price,
           |  ${Qh.oR2(s"($s2 - $s1 * $s1 / $n) / ($n - 1)")} AS var_price,
           |  ${Qh.oR6("quantile_cont(l_extendedprice, 0.5)")} AS med_price
           |FROM lineitem
           |GROUP BY l_returnflag
           |ORDER BY l_returnflag""".stripMargin
      }) { (s, dir) =>
      import s.implicits._
      val xd = $"l_extendedprice".cast(DecimalType(18, 2))
      val s2 = sum(xd * xd).cast(DoubleType)
      val s1 = sum(xd).cast(DoubleType)
      val n = count(lit(1)).cast(DoubleType)
      Qh.t(s, dir, "lineitem")
        .groupBy($"l_returnflag")
        .agg(
          min($"l_extendedprice").as("min_price"),
          max($"l_extendedprice").as("max_price"),
          s2.as("_s2"), s1.as("_s1"), n.as("_n"),
          expr("percentile(l_extendedprice, 0.5)").as("_med"))
        .select(
          $"l_returnflag",
          $"min_price", $"max_price",
          Qh.r6(sqrt(($"_s2" - $"_s1" * $"_s1" / $"_n") / ($"_n" - 1))).as("std_price"),
          Qh.r2(($"_s2" - $"_s1" * $"_s1" / $"_n") / ($"_n" - 1)).as("var_price"),
          Qh.r6($"_med").as("med_price"))
        .orderBy("l_returnflag")
    },

    // A6 scale path: approx_percentile — a mergeable bounded-memory
    // quantile sketch (Greenwald–Khanna variant), the ONLY percentile
    // form that survives 100 TB (exact `percentile` buffers each group).
    // Tolerance contract like a3_approx_distinct: the oracle pins the
    // exact quantiles + TRUE; the engine must land its sketch estimates
    // within 1% + 1 of its own exact values. Rank-error bound is
    // n/accuracy; accuracy=10000 keeps value error far inside 1% on
    // price-shaped data.
    Decl(
      "a6_approx_percentile",
      s"""SELECT l_returnflag,
         |  ${Qh.oR6("quantile_cont(l_extendedprice, 0.5)")} AS exact_p50,
         |  ${Qh.oR6("quantile_cont(l_extendedprice, 0.95)")} AS exact_p95,
         |  TRUE AS approx_ok
         |FROM lineitem
         |GROUP BY l_returnflag
         |ORDER BY l_returnflag""".stripMargin) { (s, dir) =>
      import s.implicits._
      Qh.t(s, dir, "lineitem")
        .groupBy($"l_returnflag")
        .agg(
          // array form: ONE value buffer / ONE sketch serves both
          // quantiles (two scalar calls would buffer the column twice)
          expr("percentile(l_extendedprice, array(0.5D, 0.95D))").as("_e"),
          expr("approx_percentile(l_extendedprice, array(0.5D, 0.95D), 10000)").as("_a"))
        .select(
          $"l_returnflag",
          Qh.r6(element_at($"_e", 1)).as("exact_p50"),
          Qh.r6(element_at($"_e", 2)).as("exact_p95"),
          ((abs(element_at($"_a", 1) - element_at($"_e", 1)) <= element_at($"_e", 1) * 0.01 + 1) &&
            (abs(element_at($"_a", 2) - element_at($"_e", 2)) <= element_at($"_e", 2) * 0.01 + 1))
            .as("approx_ok"))
        .orderBy("l_returnflag")
    },

    // A9: explicit two-stage SALTED aggregation — the manual skew
    // breaker for when one group key dwarfs the rest (event_type here is
    // low-cardinality by design: every group is a potential hot key).
    // Stage 1 aggregates on (key, salt=phash(user_id)%16) spreading each
    // hot group over 16 reducers; stage 2 combines the 16 partials per
    // key. Decimal sums make the two-stage result bit-equal to the
    // oracle's one-stage form regardless of how rows were split. AQE's
    // skew handling only rescues JOINS; for aggregations this is the
    // pattern. The salt must be a DETERMINISTIC function of the row
    // (never rand()): retried tasks must re-salt identically or
    // at-least-once execution double-counts.
    Decl(
      "a9_salted_agg",
      s"""SELECT event_type,
         |  count(*) AS n,
         |  ${Qh.oSum2("value")} AS total_value,
         |  count(DISTINCT user_id) AS n_users
         |FROM events
         |GROUP BY event_type
         |ORDER BY event_type""".stripMargin) { (s, dir) =>
      import s.implicits._
      val salted = Qh.t(s, dir, "events")
        .withColumn("_salt", Qh.phash($"user_id".cast(StringType), 13) % 16)
        .groupBy($"event_type", $"_salt")
        .agg(
          count(lit(1)).as("_n"),
          sum($"value".cast(DecimalType(18, 2))).as("_sum"),
          // distinct-by-salt is exact: a user_id lands in exactly one
          // salt bucket (salt is a function of user_id), so per-bucket
          // distincts add up
          countDistinct($"user_id").as("_nd"))
      salted.groupBy($"event_type")
        .agg(
          sum($"_n").as("n"),
          sum($"_sum").cast(DoubleType).as("total_value"),
          sum($"_nd").as("n_users"))
        .orderBy("event_type")
    },

    // A6 custom-surface path: the same tolerance contract as
    // a6_approx_percentile, but the sketch is OUR OWN mergeable t-digest
    // (graft.functions.TDigestAgg — Dunning & Ertl 2019) running as a
    // typed Aggregator: partials compress on the executors, (means,
    // weights) arrays ship as the shuffle payload. Demonstrates that the
    // engine's custom-aggregation surface carries production sketches,
    // not just built-ins.
    Decl(
      "a6_tdigest",
      s"""SELECT l_returnflag,
         |  ${Qh.oR6("quantile_cont(l_extendedprice, 0.5)")} AS exact_p50,
         |  TRUE AS tdigest_ok
         |FROM lineitem
         |GROUP BY l_returnflag
         |ORDER BY l_returnflag""".stripMargin) { (s, dir) =>
      import s.implicits._
      val td50 = udaf(graft.functions.TDigestAgg.TDigestQuantile(0.5))
      Qh.t(s, dir, "lineitem")
        .groupBy($"l_returnflag")
        .agg(
          expr("percentile(l_extendedprice, 0.5)").as("_e50"),
          td50($"l_extendedprice").as("_t50"))
        .select(
          $"l_returnflag",
          Qh.r6($"_e50").as("exact_p50"),
          (abs($"_t50" - $"_e50") <= $"_e50" * 0.01 + 1).as("tdigest_ok"))
        .orderBy("l_returnflag")
    },

    // collect_list/collect_set made deterministic: sorted, then joined to
    // csv of integer keys (double→string formatting differs per engine).
    Decl(
      "a7_collect",
      """SELECT o_custkey,
        |  array_to_string(list_sort(list(o_orderkey)), ',') AS orderkeys_csv,
        |  array_to_string(list_sort(list(DISTINCT o_orderstatus)), ',') AS statuses_csv
        |FROM orders
        |GROUP BY o_custkey
        |ORDER BY o_custkey""".stripMargin) { (s, dir) =>
      import s.implicits._
      Qh.t(s, dir, "orders")
        .groupBy($"o_custkey")
        .agg(
          array_join(sort_array(collect_list($"o_orderkey")), ",").as("orderkeys_csv"),
          array_join(sort_array(collect_set($"o_orderstatus")), ",").as("statuses_csv"))
        .orderBy("o_custkey")
    }
  )
}
