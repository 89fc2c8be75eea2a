package graft.queries

import org.apache.spark.sql.expressions.Window
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
      Qh.tSpread(s, dir, "events")
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
      Qh.tSpread(s, dir, "lineitem")
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
      Qh.tSpread(s, dir, "lineitem")
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
      Qh.tSpread(s, dir, "lineitem")
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
    },

    // A10: KMV distinct sketch WITH SET ALGEBRA (Beyer/Haas/Reinwald/
    // Sismanis/Gemulla, SIGMOD 2007; the k-minimum-values / Θ-sketch
    // family) — the sketch tier's missing piece next to HLL (A3: union
    // only) and CMS (l4: point frequency): bottom-k hash sketches
    // support UNION and, unlike HLL, INTERSECTION — est_jaccard ρ =
    // |bottom-k(A∪B) ∩ A's sketch ∩ B's sketch| / |bottom-k(A∪B)|,
    // D̂_∩ = ρ·D̂_∪, D̂ = (k−1)/u(k) with u(k) the k-th smallest
    // normalized hash. Everything is a pure function of the portable
    // hash, so DuckDB rebuilds the identical sketches and identical
    // estimates — exactly checkable, no tolerance band; the exact
    // per-language distinct counts and exact Jaccard ride along as the
    // verification companion (they'd be dropped at 100 TB). Scale
    // shape: distinct (lang, shingle-hash) is the one corpus-sized
    // shuffle; bottom-k per language is the window idiom the
    // TopKWindowRewrite lowers onto the bounded-heap operator (losers
    // never cross the exchange — KMV's mergeability is exactly why:
    // bottom-k of a union is the bottom-k of the parts' bottom-k's);
    // all pair algebra runs over ≤ k × |langs| rows.
    Decl(
      "a10_kmv_sketch", {
        val estExpr = (kth: String, n: String) =>
          s"CASE WHEN $n < 64 THEN CAST($n AS DOUBLE) " +
            s"ELSE 63.0 / (CAST($kth AS DOUBLE) / 4294967296.0) END"
        s"""WITH t AS (
           |  SELECT lang, regexp_extract_all(lower(text), '[a-z]+') AS toks
           |  FROM documents),
           |dh AS MATERIALIZED (
           |  SELECT DISTINCT lang, ${Qh.oPhash("sh", 41)} AS h
           |  FROM (SELECT lang, unnest(list_transform(range(len(toks) - 2),
           |          i -> toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3])) AS sh
           |        FROM t WHERE len(toks) >= 3)),
           |sk AS MATERIALIZED (
           |  SELECT lang, h FROM (
           |    SELECT lang, h,
           |      row_number() OVER (PARTITION BY lang ORDER BY h) AS rn
           |    FROM dh)
           |  WHERE rn <= 64),
           |est AS (
           |  SELECT lang, max(h) AS kth, count(*) AS sk_n FROM sk GROUP BY lang),
           |ex AS (SELECT lang, count(*) AS exact_n FROM dh GROUP BY lang),
           |pairs AS (
           |  SELECT a.lang AS lang_a, b.lang AS lang_b
           |  FROM est a JOIN est b ON a.lang < b.lang),
           |pu AS (
           |  SELECT p.lang_a, p.lang_b, s.h,
           |    max(CASE WHEN s.lang = p.lang_a THEN 1 ELSE 0 END) AS ina,
           |    max(CASE WHEN s.lang = p.lang_b THEN 1 ELSE 0 END) AS inb
           |  FROM pairs p JOIN sk s ON s.lang IN (p.lang_a, p.lang_b)
           |  GROUP BY p.lang_a, p.lang_b, s.h),
           |pur AS (
           |  SELECT lang_a, lang_b, h, ina, inb,
           |    row_number() OVER (PARTITION BY lang_a, lang_b ORDER BY h) AS rn
           |  FROM pu),
           |uk AS (
           |  SELECT lang_a, lang_b, max(h) AS ukth, count(*) AS uk_n,
           |    CAST(sum(ina * inb) AS BIGINT) AS rho_n
           |  FROM pur WHERE rn <= 64 GROUP BY lang_a, lang_b),
           |exj AS (
           |  SELECT a.lang AS ja, b.lang AS jb, count(*) AS inter_n
           |  FROM dh a JOIN dh b ON a.h = b.h AND a.lang < b.lang
           |  GROUP BY a.lang, b.lang),
           |res AS (
           |  SELECT u.lang_a, u.lang_b,
           |    ${Qh.oR2(estExpr("ea.kth", "ea.sk_n"))} AS est_a,
           |    ${Qh.oR2(estExpr("eb.kth", "eb.sk_n"))} AS est_b,
           |    ea2.exact_n AS exact_a, eb2.exact_n AS exact_b,
           |    ${Qh.oR2(estExpr("u.ukth", "u.uk_n"))} AS est_union,
           |    ${Qh.oR6("CAST(u.rho_n AS DOUBLE) / CAST(u.uk_n AS DOUBLE)")} AS est_jaccard,
           |    ${Qh.oR6("CAST(coalesce(j.inter_n, 0) AS DOUBLE) / CAST(ea2.exact_n + eb2.exact_n - coalesce(j.inter_n, 0) AS DOUBLE)")} AS exact_jaccard
           |  FROM uk u
           |  JOIN est ea ON ea.lang = u.lang_a
           |  JOIN est eb ON eb.lang = u.lang_b
           |  JOIN ex ea2 ON ea2.lang = u.lang_a
           |  JOIN ex eb2 ON eb2.lang = u.lang_b
           |  LEFT JOIN exj j ON j.ja = u.lang_a AND j.jb = u.lang_b)
           |SELECT lang_a, lang_b, est_a, est_b, exact_a, exact_b, est_union,
           |  ${Qh.oR2("est_jaccard * est_union")} AS est_inter,
           |  est_jaccard, exact_jaccard
           |FROM res ORDER BY lang_a, lang_b""".stripMargin
      }) { (s, dir) =>
      import s.implicits._
      val K = 64
      def estCol(kth: org.apache.spark.sql.Column,
          n: org.apache.spark.sql.Column): org.apache.spark.sql.Column = Qh.r2(
        when(n < K, n.cast(DoubleType))
          .otherwise(lit(63.0) / (kth.cast(DoubleType) / lit(4294967296.0))))
      // the one corpus-sized shuffle: distinct (lang, 3-shingle hash)
      val dh = Qh.materialize(
        Qh.tSpread(s, dir, "documents")
          .select($"lang", expr(Qh.toksExpr).as("toks"))
          .filter(size($"toks") >= 3)
          .select($"lang", explode(expr(
            "transform(sequence(0, size(toks) - 3), " +
              "i -> concat(toks[i], ' ', toks[i + 1], ' ', toks[i + 2]))")).as("sh"))
          .select($"lang", Qh.phash($"sh", 41).as("h"))
          .distinct())
      // bottom-K per language (TopKWindowRewrite → bounded heap)
      val wl = Window.partitionBy($"lang").orderBy($"h".asc)
      val sk = dh.withColumn("rn", row_number().over(wl))
        .filter($"rn" <= K).drop("rn")
      // ---- everything below runs over ≤ K × |langs| sketch rows ----
      val est = sk.groupBy($"lang")
        .agg(max($"h").as("kth"), count(lit(1)).as("sk_n"))
      val ex = dh.groupBy($"lang").agg(count(lit(1)).as("exact_n"))
      val pairs = est.select($"lang".as("lang_a"))
        .join(broadcast(est.select($"lang".as("lang_b"))), $"lang_a" < $"lang_b")
      val pu = pairs
        .join(broadcast(sk), $"lang" === $"lang_a" || $"lang" === $"lang_b")
        .groupBy($"lang_a", $"lang_b", $"h")
        .agg(
          max(when($"lang" === $"lang_a", 1).otherwise(0)).as("ina"),
          max(when($"lang" === $"lang_b", 1).otherwise(0)).as("inb"))
      val wp = Window.partitionBy($"lang_a", $"lang_b").orderBy($"h".asc)
      val uk = pu.withColumn("rn", row_number().over(wp))
        .filter($"rn" <= K)
        .groupBy($"lang_a", $"lang_b")
        .agg(max($"h").as("ukth"), count(lit(1)).as("uk_n"),
          sum($"ina" * $"inb").cast(LongType).as("rho_n"))
      // exact companion: per-lang distinct + pairwise exact Jaccard
      val exj = dh.as("a")
        .join(dh.as("b"), $"a.h" === $"b.h" && $"a.lang" < $"b.lang")
        .groupBy($"a.lang".as("ja"), $"b.lang".as("jb"))
        .agg(count(lit(1)).as("inter_n"))
      uk
        .join(broadcast(est.select($"lang".as("lang_a"),
          $"kth".as("kth_a"), $"sk_n".as("sk_n_a"))), Seq("lang_a"))
        .join(broadcast(est.select($"lang".as("lang_b"),
          $"kth".as("kth_b"), $"sk_n".as("sk_n_b"))), Seq("lang_b"))
        .join(broadcast(ex.select($"lang".as("lang_a"),
          $"exact_n".as("exact_a"))), Seq("lang_a"))
        .join(broadcast(ex.select($"lang".as("lang_b"),
          $"exact_n".as("exact_b"))), Seq("lang_b"))
        .join(broadcast(exj), $"ja" === $"lang_a" && $"jb" === $"lang_b", "left_outer")
        .select($"lang_a", $"lang_b",
          estCol($"kth_a", $"sk_n_a").as("est_a"),
          estCol($"kth_b", $"sk_n_b").as("est_b"),
          $"exact_a", $"exact_b",
          estCol($"ukth", $"uk_n").as("est_union"),
          Qh.r6($"rho_n".cast(DoubleType) / $"uk_n".cast(DoubleType))
            .as("est_jaccard"),
          Qh.r6(coalesce($"inter_n", lit(0L)).cast(DoubleType) /
            ($"exact_a" + $"exact_b" - coalesce($"inter_n", lit(0L)))
              .cast(DoubleType)).as("exact_jaccard"))
        .withColumn("est_inter", Qh.r2($"est_jaccard" * $"est_union"))
        .select($"lang_a", $"lang_b", $"est_a", $"est_b", $"exact_a",
          $"exact_b", $"est_union", $"est_inter", $"est_jaccard",
          $"exact_jaccard")
        .orderBy("lang_a", "lang_b")
    }
  )
}
