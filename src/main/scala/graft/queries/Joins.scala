package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SURVEY §2.B J1–J9 — join surface.
  *
  * Scale design notes (100 TB):
  *  - J1: the FILTERED supplier dim is broadcast explicitly, so the fact
  *    scan never shuffles — the same physical shape as the reference's
  *    client-collected `$in` semi-join (kafka-database-import.go:149-170),
  *    minus the single-threaded driver. Explicit hints are reserved for
  *    sides that are bounded by construction (a filtered allowlist,
  *    region/nation); anything that scales with sf (customer, orders)
  *    gets NO hint and AQE promotes/demotes at runtime.
  *  - J3: chained star joins broadcast only region/nation; customer joins
  *    by AQE choice; shuffle only on the orders↔lineitem edge.
  *  - J6 is the deliberate large↔large sort-merge case (broadcast
  *    disabled via MERGE hint) — the shape that survives when both sides
  *    are TBs.
  *  - J7 keeps the equi key (user_id) in the join condition so the range
  *    predicate is a post-filter on a hash/sort-merge join, never a
  *    BroadcastNestedLoopJoin.
  *  - J9 (as-of) is composed from a window `lag` — no custom operator
  *    needed; one shuffle on (user_id), sorted within partitions.
  */
object Joins {

  val decls: Seq[Decl] = Seq(

    // The reference's core operator (R4): facts ⋉ broadcast dimension.
    Decl(
      "j1_semi_broadcast",
      """SELECT l_orderkey, l_linenumber, l_suppkey
        |FROM lineitem
        |WHERE l_suppkey IN (SELECT s_suppkey FROM supplier WHERE s_acctbal > 5000)
        |ORDER BY l_orderkey, l_linenumber""".stripMargin) { (s, dir) =>
      import s.implicits._
      val li = Qh.t(s, dir, "lineitem")
      val dim = Qh.t(s, dir, "supplier").filter($"s_acctbal" > 5000)
      li.join(broadcast(dim), li("l_suppkey") === dim("s_suppkey"), "left_semi")
        .select("l_orderkey", "l_linenumber", "l_suppkey")
        .orderBy("l_orderkey", "l_linenumber")
    },

    Decl(
      "j2_inner",
      """SELECT o_orderkey, c_name, c_mktsegment
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |ORDER BY o_orderkey""".stripMargin) { (s, dir) =>
      // No broadcast hint: customer scales with sf (unlike region/nation),
      // so a hard hint would OOM at 100 TB. AQE promotes to broadcast at
      // runtime when the build side is actually small.
      val o = Qh.t(s, dir, "orders")
      val c = Qh.t(s, dir, "customer")
      o.join(c, o("o_custkey") === c("c_custkey"), "inner")
        .select("o_orderkey", "c_name", "c_mktsegment")
        .orderBy("o_orderkey")
    },

    // TPC-H Q5 shape: revenue per nation through the full star.
    Decl(
      "j3_multiway",
      s"""SELECT n_name,
         |  ${Qh.oSum6("l_extendedprice * (1 - l_discount)")} AS revenue,
         |  count(*) AS n_items
         |FROM region
         |JOIN nation ON n_regionkey = r_regionkey
         |JOIN customer ON c_nationkey = n_nationkey
         |JOIN orders ON o_custkey = c_custkey
         |JOIN lineitem ON l_orderkey = o_orderkey
         |WHERE r_name <> 'REGION#0'
         |GROUP BY n_name
         |ORDER BY n_name""".stripMargin) { (s, dir) =>
      import s.implicits._
      val r = Qh.t(s, dir, "region").filter($"r_name" =!= "REGION#0")
      val n = Qh.t(s, dir, "nation")
      val c = Qh.t(s, dir, "customer")
      val o = Qh.t(s, dir, "orders")
      val li = Qh.t(s, dir, "lineitem")
      // broadcast() only on the genuinely bounded dims (region 5 rows,
      // nation 25 rows); customer grows with sf → AQE decides.
      li.join(o, li("l_orderkey") === o("o_orderkey"))
        .join(c, o("o_custkey") === c("c_custkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .groupBy($"n_name")
        .agg(
          Qh.sumd6($"l_extendedprice" * (lit(1) - $"l_discount")).as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy("n_name")
    },

    // Left outer with genuinely unmatched left rows (not every customer
    // has an urgent finished order).
    Decl(
      "j4_left_outer",
      """SELECT c_custkey, o.o_orderkey, o.o_totalprice
        |FROM customer
        |LEFT JOIN (SELECT * FROM orders
        |           WHERE o_orderpriority = '1-URGENT' AND o_orderstatus = 'F') o
        |  ON o.o_custkey = c_custkey
        |ORDER BY c_custkey, o.o_orderkey NULLS FIRST""".stripMargin) { (s, dir) =>
      import s.implicits._
      val c = Qh.t(s, dir, "customer")
      val o = Qh.t(s, dir, "orders")
        .filter($"o_orderpriority" === "1-URGENT" && $"o_orderstatus" === "F")
      c.join(o, o("o_custkey") === c("c_custkey"), "left_outer")
        .select($"c_custkey", $"o_orderkey", $"o_totalprice")
        .orderBy($"c_custkey".asc, $"o_orderkey".asc_nulls_first)
    },

    // Full outer with unmatched rows on BOTH sides.
    Decl(
      "j4_full_outer",
      """SELECT c.c_custkey, o.o_orderkey
        |FROM (SELECT * FROM customer WHERE c_nationkey < 10) c
        |FULL OUTER JOIN (SELECT * FROM orders WHERE o_orderstatus = 'F'
        |                 AND o_orderpriority = '1-URGENT') o
        |  ON o.o_custkey = c.c_custkey
        |ORDER BY c.c_custkey NULLS FIRST, o.o_orderkey NULLS FIRST""".stripMargin) { (s, dir) =>
      import s.implicits._
      val c = Qh.t(s, dir, "customer").filter($"c_nationkey" < 10)
      val o = Qh.t(s, dir, "orders")
        .filter($"o_orderstatus" === "F" && $"o_orderpriority" === "1-URGENT")
      c.join(o, o("o_custkey") === c("c_custkey"), "full_outer")
        .select($"c_custkey", $"o_orderkey")
        .orderBy($"c_custkey".asc_nulls_first, $"o_orderkey".asc_nulls_first)
    },

    Decl(
      "j5_anti",
      """SELECT c_custkey, c_name
        |FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey
        |                    AND o_orderpriority = '1-URGENT')
        |ORDER BY c_custkey""".stripMargin) { (s, dir) =>
      import s.implicits._
      val c = Qh.t(s, dir, "customer")
      val o = Qh.t(s, dir, "orders").filter($"o_orderpriority" === "1-URGENT")
      c.join(o, o("o_custkey") === c("c_custkey"), "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    },

    // Large-large: broadcast disabled via MERGE hint → sort-merge join,
    // the only join shape that survives two 50-TB sides.
    Decl(
      "j6_sortmerge",
      s"""SELECT o_orderpriority,
         |  ${Qh.oSum6("l_extendedprice * (1 - l_discount)")} AS revenue,
         |  count(*) AS n_items
         |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         |GROUP BY o_orderpriority
         |ORDER BY o_orderpriority""".stripMargin) { (s, dir) =>
      import s.implicits._
      val li = Qh.t(s, dir, "lineitem")
      val o = Qh.t(s, dir, "orders").hint("merge")
      li.join(o, li("l_orderkey") === o("o_orderkey"))
        .groupBy($"o_orderpriority")
        .agg(
          Qh.sumd6($"l_extendedprice" * (lit(1) - $"l_discount")).as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy("o_orderpriority")
    },

    // Equi + range residual: events within 1h after each event, same user.
    // The join key is (user_id, HOUR BUCKET): because the range span is
    // exactly one bucket width, every match for an e1 in bucket b lies in
    // buckets {b, b+1}, so e1 probes two bucket keys. This bounds a
    // task's work by per-user-per-HOUR activity — a hot user no longer
    // produces one quadratic task at 100 TB (plain (user_id) keying
    // would). The range predicate stays a residual on a hash join; the
    // oracle states the same relation without the execution strategy.
    Decl(
      "j7_range",
      """SELECT e1.user_id, count(*) AS n_pairs
        |FROM (SELECT user_id, event_id, CAST(ts AS TIMESTAMP) ts FROM events) e1
        |JOIN (SELECT user_id, event_id, CAST(ts AS TIMESTAMP) ts FROM events) e2
        |  ON e1.user_id = e2.user_id
        | AND e2.event_id <> e1.event_id
        | AND e2.ts >= e1.ts AND e2.ts <= e1.ts + INTERVAL 1 HOUR
        |GROUP BY e1.user_id
        |ORDER BY e1.user_id""".stripMargin) { (s, dir) =>
      import s.implicits._
      val ev = Qh.t(s, dir, "events")
        .select($"user_id", $"event_id", Qh.tsUs($"ts").as("ts"))
      graft.operators.RangeJoin.bucketed(
          ev, ev,
          keys = Seq("user_id"), leftTime = "ts", rightTime = "ts",
          windowMicros = 3600L * 1000000L,
          extraCondition = col("r.event_id") =!= col("l.event_id"))
        .groupBy($"l.user_id")
        .agg(count(lit(1)).as("n_pairs"))
        .orderBy($"l.user_id")
    },

    // J10: Bloom-filter semi-join pushdown — the 100 TB technique made
    // explicit. A mergeable Bloom sketch of the (filtered) dimension
    // keys is built once in a scalar subquery, broadcast to every scan
    // task, and drops non-matching fact rows BEFORE the join shuffle;
    // the exact semi-join after it scrubs the false positives, so the
    // result is EXACT and the oracle is a plain semi-join (bloom
    // parameters cannot affect the hash, only the speed). This is the
    // user-facing form of Spark's own runtime row-level filtering
    // (InjectRuntimeFilter), which at fixture sizes never fires due to
    // size thresholds. Bloom (1970, CACM); sizing ~10 bits/key → ~1% FP.
    Decl(
      "j10_bloom_semi",
      s"""SELECT l_returnflag,
         |  count(*) AS n,
         |  ${Qh.oSum2("l_extendedprice")} AS revenue
         |FROM lineitem
         |WHERE l_orderkey IN
         |  (SELECT o_orderkey FROM orders WHERE o_orderpriority = '1-URGENT')
         |GROUP BY l_returnflag
         |ORDER BY l_returnflag""".stripMargin) { (s, dir) =>
      Qh.t(s, dir, "orders").createOrReplaceTempView("j10_orders")
      Qh.t(s, dir, "lineitem").createOrReplaceTempView("j10_lineitem")
      s.sql(
        """WITH dim AS (
          |  SELECT o_orderkey FROM j10_orders WHERE o_orderpriority = '1-URGENT')
          |SELECT l_returnflag,
          |  count(*) AS n,
          |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
          |FROM j10_lineitem
          |WHERE bloom_might_contain(
          |        (SELECT bloom_filter_agg(xxhash64(o_orderkey),
          |                                 CAST(200000 AS BIGINT),
          |                                 CAST(2000000 AS BIGINT)) FROM dim),
          |        xxhash64(l_orderkey))
          |  AND l_orderkey IN (SELECT o_orderkey FROM dim)
          |GROUP BY l_returnflag
          |ORDER BY l_returnflag""".stripMargin)
    },

    Decl(
      "j8_cross",
      """SELECT r_name, n_name
        |FROM region CROSS JOIN nation
        |ORDER BY r_name, n_name""".stripMargin) { (s, dir) =>
      Qh.t(s, dir, "region")
        .crossJoin(Qh.t(s, dir, "nation"))
        .select("r_name", "n_name")
        .orderBy("r_name", "n_name")
    },

    // True two-table as-of join (graft.operators.AsOfJoin): every
    // purchase matched to the user's latest signup at or before it.
    // Union+window composition — ONE shuffle on user_id, no range join;
    // the oracle is DuckDB's native ASOF JOIN, so the engine's
    // composition is checked against a first-class implementation.
    Decl(
      "j9_asof_join",
      """SELECT p.event_id, p.user_id, s.event_id AS asof_signup_event
        |FROM (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) ts FROM events WHERE event_type = 'purchase') p
        |ASOF LEFT JOIN (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) ts FROM events WHERE event_type = 'signup') s
        |  ON p.user_id = s.user_id AND p.ts >= s.ts
        |ORDER BY p.event_id""".stripMargin) { (s, dir) =>
      import s.implicits._
      val ev = Qh.t(s, dir, "events")
        .select($"event_id", $"user_id", Qh.tsUs($"ts").as("ts"), $"event_type")
      val purchases = ev.filter($"event_type" === "purchase").drop("event_type")
      val signups = ev.filter($"event_type" === "signup").drop("event_type")
        .withColumnRenamed("event_id", "signup_event")
      graft.operators.AsOfJoin(
          purchases, signups,
          keys = Seq("user_id"), leftTime = "ts", rightTime = "ts",
          payload = Seq("signup_event"))
        .select($"event_id", $"user_id",
          $"asof_signup_event".cast("bigint"))
        .orderBy("event_id")
    },

    // As-of join composed from a window lag (SURVEY J9): latest prior
    // event of the same user. One shuffle on user_id, no custom operator.
    Decl(
      "j9_asof",
      """SELECT event_id,
        |  lag(event_id) OVER (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id) AS prev_event_id,
        |  lag(event_type) OVER (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id) AS prev_event_type
        |FROM events
        |ORDER BY event_id""".stripMargin) { (s, dir) =>
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy($"user_id").orderBy(Qh.tsUs($"ts"), $"event_id")
      Qh.t(s, dir, "events")
        .select(
          $"event_id",
          lag($"event_id", 1).over(w).as("prev_event_id"),
          lag($"event_type", 1).over(w).as("prev_event_type"))
        .orderBy("event_id")
    },

    // J11: two-stage SALTED equi-join — the hot-key treatment when the
    // SKEWED SIDE IS TOO BIG TO BROADCAST and AQE's skew split can't
    // help (it only splits sort-merge partitions, not a hash join's
    // build side; and it never fires when one hot key IS the
    // partition). Fact rows fan out over S=8 deterministic salts
    // (event_id % 8 — any row-uniform value works), the dim side
    // replicates ×8 via a generator (no shuffle on the dim — it's a
    // narrow explode), and the join key becomes (key, salt): a hot
    // user's rows now land on 8 reducers instead of 1. Salting is
    // invisible to the result — the oracle is the PLAIN join.
    Decl(
      "j11_salted_skew_join",
      s"""SELECT c_mktsegment,
         |  count(*) AS n,
         |  ${Qh.oSum2("value")} AS total_value
         |FROM events JOIN customer ON user_id = c_custkey
         |GROUP BY c_mktsegment
         |ORDER BY c_mktsegment""".stripMargin) { (s, dir) =>
      import s.implicits._
      val S = 8
      val fact = Qh.t(s, dir, "events")
        .select($"user_id", $"value",
          pmod($"event_id", lit(S.toLong)).as("salt"))
      val dim = Qh.t(s, dir, "customer")
        .select($"c_custkey", $"c_mktsegment",
          explode(sequence(lit(0L), lit(S.toLong - 1))).as("salt"))
      fact.join(dim,
          fact("user_id") === dim("c_custkey") && fact("salt") === dim("salt"))
        .groupBy($"c_mktsegment")
        .agg(count(lit(1)).as("n"), Qh.sumd2($"value").as("total_value"))
        .orderBy("c_mktsegment")
    },

    // J12: INTERVAL-OVERLAP join — interval × interval (J7 is point-in-
    // range), the shape of sessions × maintenance-windows, ad-flights ×
    // user-sessions, outage × SLA windows. Scale path: both interval
    // sets are bucketed on a 6 h time grid — sessions explode into the
    // buckets they span (bounded fan-out: interval length / grid), the
    // 1 h grid-aligned windows live in exactly one bucket — so the
    // overlap predicate runs as a bucket EQUI-join with the strict
    // inequalities as residual, never as a nested loop over all pairs.
    // Each overlapping (session, window) pair meets in exactly one
    // bucket (the window's), so no pair-dedup pass is needed. All time
    // arithmetic in epoch-ms BIGINT; sessions are the same 30-min-gap
    // construction as t3, ordered by (tms, event_id) so tie-breaks are
    // engine-independent.
    Decl(
      "j12_interval_overlap",
      """WITH e AS (
        |  SELECT user_id, epoch_ms(CAST(ts AS TIMESTAMP)) AS tms, event_id
        |  FROM events),
        |m AS (
        |  SELECT user_id, tms,
        |    CASE WHEN lag(tms) OVER w IS NULL
        |           OR tms - lag(tms) OVER w >= 1800000
        |         THEN 1 ELSE 0 END AS brk
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY tms, event_id)),
        |sess AS (
        |  SELECT user_id, sid, min(tms) AS st, max(tms) AS en
        |  FROM (
        |    SELECT user_id, tms,
        |      sum(brk) OVER (PARTITION BY user_id ORDER BY tms
        |                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        |    FROM m)
        |  GROUP BY user_id, sid),
        |b AS (SELECT min(tms) AS mn, max(tms) AS mx FROM e),
        |wins AS (
        |  SELECT unnest(range((mn // 21600000) * 21600000, mx + 1, 21600000)) AS w_start
        |  FROM b)
        |SELECT w.w_start AS window_start_ms,
        |  CAST(count(*) AS BIGINT) AS n_sessions,
        |  CAST(sum(least(s.en, w.w_start + 3600000) - greatest(s.st, w.w_start)) AS BIGINT) AS overlap_ms
        |FROM wins w JOIN sess s
        |  ON s.st < w.w_start + 3600000 AND w.w_start < s.en
        |GROUP BY 1
        |ORDER BY 1""".stripMargin) { (s, dir) =>
      import s.implicits._
      val grid = 21600000L // 6 h buckets
      val wlen = 3600000L // 1 h maintenance windows on the grid
      val e = Qh
        .t(s, dir, "events")
        .select($"user_id", unix_millis(Qh.tsUs($"ts")).as("tms"), $"event_id")
      val w = Window.partitionBy($"user_id").orderBy($"tms", $"event_id")
      val brk = when(
        lag($"tms", 1).over(w).isNull ||
          $"tms" - lag($"tms", 1).over(w) >= 1800000L, 1).otherwise(0)
      val cum = Window
        .partitionBy($"user_id")
        .orderBy($"tms", $"event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val sess = e
        .withColumn("brk", brk)
        .withColumn("sid", sum($"brk").over(cum))
        .groupBy($"user_id", $"sid")
        .agg(min($"tms").as("st"), max($"tms").as("en"))
      // sessions fan out into every grid bucket they span (bounded)
      val sessB = sess.withColumn(
        "b",
        explode(sequence(expr(s"st DIV $grid"), expr(s"en DIV $grid"))))
      // grid built in-plan from a 1-row bound agg (w6 gap-fill pattern)
      val bounds = e.agg(min($"tms").as("mn"), max($"tms").as("mx"))
      val wins = bounds
        .select(explode(
          sequence(expr(s"(mn DIV $grid) * $grid"), $"mx", lit(grid)))
          .as("w_start"))
        .withColumn("b", expr(s"w_start DIV $grid"))
      wins
        .join(
          sessB,
          wins("b") === sessB("b") &&
            sessB("st") < wins("w_start") + wlen &&
            wins("w_start") < sessB("en"))
        .groupBy($"w_start".as("window_start_ms"))
        .agg(
          count(lit(1)).cast("bigint").as("n_sessions"),
          sum(least($"en", $"w_start" + wlen) -
            greatest($"st", $"w_start")).cast("bigint").as("overlap_ms"))
        .orderBy("window_start_ms")
    },

    // J13: SPATIAL PROXIMITY JOIN — all (customer site, supplier site)
    // pairs within planar distance r, the geospatial workhorse join
    // (geohash/S2-cell blocking in production systems). Coordinates
    // are synthesized deterministically from the keys via the portable
    // hash (integer mod + one exact IEEE division — bit-identical in
    // both engines; the fixtures carry no geo columns). Blocking: the
    // plane is cut into r×r grid cells; ONE side explodes to its 3×3
    // neighbor cells (a narrow Generate, the j11 salt idiom), the
    // other keeps its single home cell, so the join is a plain cell
    // equi-join + squared-distance residual — each qualifying pair
    // meets in EXACTLY one (probe-cell, home-cell) combination, so no
    // dedup pass. At 100 TB: shuffle is keyed on cells (bounded fanout
    // ×9 on one side only), never all-pairs; per-cell work is local
    // density, the same reason S2/geohash indexes scale. Distance math
    // is pure IEEE (squared Euclidean — no trig drift), so the oracle
    // can independently verify COMPLETENESS with a brute-force
    // all-pairs filter (the l13_triangles oracle discipline).
    Decl(
      "j13_spatial_grid",
      s"""WITH c AS (
         |  SELECT c_custkey AS ck,
         |    (${Qh.oPhash("CAST(c_custkey AS VARCHAR)", 101)} % 100000) / 1000.0 AS x,
         |    (${Qh.oPhash("CAST(c_custkey AS VARCHAR)", 102)} % 100000) / 1000.0 AS y
         |  FROM customer),
         |s AS (
         |  SELECT s_suppkey AS sk,
         |    (${Qh.oPhash("CAST(s_suppkey AS VARCHAR)", 101)} % 100000) / 1000.0 AS x,
         |    (${Qh.oPhash("CAST(s_suppkey AS VARCHAR)", 102)} % 100000) / 1000.0 AS y
         |  FROM supplier)
         |SELECT c.ck AS c_custkey, s.sk AS s_suppkey,
         |  ${Qh.oR6("sqrt((c.x - s.x) * (c.x - s.x) + (c.y - s.y) * (c.y - s.y))")} AS dist
         |FROM c JOIN s
         |  ON (c.x - s.x) * (c.x - s.x) + (c.y - s.y) * (c.y - s.y) <= 4.0
         |ORDER BY c_custkey, s_suppkey""".stripMargin) { (s, dir) =>
      import s.implicits._
      val r = 2.0 // proximity radius == grid pitch
      def sites(df: org.apache.spark.sql.DataFrame, key: String) =
        df.select(
          col(key).as("id"),
          (Qh.phash(col(key).cast("string"), 101) % 100000 / lit(1000.0)).as("x"),
          (Qh.phash(col(key).cast("string"), 102) % 100000 / lit(1000.0)).as("y"))
      gridProximityPairs(
          sites(Qh.t(s, dir, "customer"), "c_custkey"),
          sites(Qh.t(s, dir, "supplier"), "s_suppkey"), r)
        .select($"left_id".as("c_custkey"), $"right_id".as("s_suppkey"), $"dist")
        .orderBy("c_custkey", "s_suppkey")
    },

    // J14: CO-BUCKETED fact⋈fact join — the standing layout answer to
    // J6's one-shot sort-merge: BOTH fact tables persisted bucketed +
    // sorted on the join key (one file per bucket, the shared
    // Qh.bucketedTable machinery behind the PageRank adjacency and the
    // LSH band table), so EVERY subsequent join on that key runs with
    // no exchange and no sort on either side — at 100 TB the join's
    // entire shuffle cost is paid once at ingest and amortized across
    // every downstream run (the production warehouse layout for the
    // hottest join keys). PlanSpec pins no Exchange/Sort under the
    // join with broadcast disabled; the oracle is the plain join, so
    // the layout must be semantically invisible.
    Decl(
      "j14_cobucketed_join",
      s"""SELECT o_orderpriority, l_returnflag,
         |  ${Qh.oSum6("l_extendedprice * (1 - l_discount)")} AS revenue,
         |  count(*) AS n_items
         |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         |GROUP BY o_orderpriority, l_returnflag
         |ORDER BY o_orderpriority, l_returnflag""".stripMargin) { (s, dir) =>
      import s.implicits._
      val li = bucketedLineitem(s, dir)
      val o = bucketedOrders(s, dir)
      li.join(o, $"l_orderkey" === $"o_orderkey")
        .groupBy($"o_orderpriority", $"l_returnflag")
        .agg(
          Qh.sumd6($"l_extendedprice" * (lit(1) - $"l_discount")).as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy("o_orderpriority", "l_returnflag")
    }
  )

  /** The co-bucketed fact layouts behind j14 (exposed for PlanSpec). */
  private[graft] def bucketedLineitem(
      s: org.apache.spark.sql.SparkSession, dir: String)
      : org.apache.spark.sql.DataFrame = {
    import s.implicits._
    Qh.bucketedTable(s, "bkt_lineitem", dir, 32, Seq("l_orderkey"))(
      Qh.t(s, dir, "lineitem")
        .select($"l_orderkey", $"l_returnflag", $"l_extendedprice", $"l_discount"))
  }

  private[graft] def bucketedOrders(
      s: org.apache.spark.sql.SparkSession, dir: String)
      : org.apache.spark.sql.DataFrame = {
    import s.implicits._
    Qh.bucketedTable(s, "bkt_orders", dir, 32, Seq("o_orderkey"))(
      Qh.t(s, dir, "orders").select($"o_orderkey", $"o_orderpriority"))
  }

  /** All (left, right) point pairs within planar distance `r`, as a
    * grid-blocked equi-join: the plane is cut into r×r cells, the LEFT
    * side explodes to its 3×3 neighbor cells (narrow Generate — the
    * J11 salt idiom), the right keeps its single home cell, and the
    * squared-distance residual runs on the cell equi-join's output.
    * Every qualifying pair meets in EXACTLY one (probe-cell,
    * home-cell) combination, so no dedup pass. Inputs: (id, x, y);
    * output: (left_id, right_id, dist) with dist IEEE-rounded at 1e-6.
    * Property-tested against the brute-force all-pairs filter on
    * random point sets (PropertySpec), same discipline as
    * [[Graph.triangleStats]]. */
  def gridProximityPairs(
      left: org.apache.spark.sql.DataFrame,
      right: org.apache.spark.sql.DataFrame,
      r: Double): org.apache.spark.sql.DataFrame = {
    val s = left.sparkSession
    import s.implicits._
    def cells(df: org.apache.spark.sql.DataFrame) = df
      .withColumn("cx", floor($"x" / r).cast("long"))
      .withColumn("cy", floor($"y" / r).cast("long"))
    val probe = cells(left)
      .withColumn("d", explode(expr(
        "transform(sequence(0, 8), i -> named_struct(" +
          "'gx', cx + i DIV 3 - 1, 'gy', cy + i % 3 - 1))")))
      .select($"id".as("left_id"), $"x".as("xl"), $"y".as("yl"),
        $"d.gx".as("gx"), $"d.gy".as("gy"))
    val home = cells(right)
      .select($"id".as("right_id"), $"x".as("xr"), $"y".as("yr"),
        $"cx".as("gx"), $"cy".as("gy"))
    probe.join(home, Seq("gx", "gy"))
      .filter(($"xl" - $"xr") * ($"xl" - $"xr") +
        ($"yl" - $"yr") * ($"yl" - $"yr") <= r * r)
      .select($"left_id", $"right_id",
        Qh.r6(sqrt(($"xl" - $"xr") * ($"xl" - $"xr") +
          ($"yl" - $"yr") * ($"yl" - $"yr"))).as("dist"))
  }
}
