package graft.queries

import org.apache.spark.sql.functions._

/** SURVEY §2.B L13 — PageRank (Brin/Page 1998) over the
  * supplier↔customer interaction graph (an edge per distinct supplier/
  * customer pair that shared an order; both directions, so every node
  * has out-degree ≥ 1 and no dangling-mass term is needed).
  *
  * The BSP power-iteration shape every distributed graph engine runs
  * (Pregel/GraphX semantics, here as two Spark SQL stages per
  * iteration): join ranks to edges on src, then partial+final sum of
  * contributions keyed by dst (map-side combined). The edge list —
  * with each edge's precomputed src out-degree — is written ONCE as a
  * BUCKETED table on src (one file per bucket, sorted), so every
  * iteration's rank⋈edges join co-locates on the bucketing: the
  * fact-sized edge side is never shuffled again; only the nodes-sized
  * rank side moves (or broadcasts). At 100 TB the edge shuffle would
  * dominate each iteration — bucketing amortizes it to zero across all
  * iterations, which is exactly how production graph engines lay out
  * their adjacency lists.
  *
  * == Exactness (same discipline as l3_kmeans) ==
  * Ranks live in FIXED-POINT BIGINT (scale 1e12): per-edge
  * contribution is `r DIV outdeg` (integer floor division), damping is
  * `(85 · m) DIV 100`, and the teleport term is an integer constant —
  * every operation is associative integer arithmetic, so TWO unrolled
  * power iterations hash-match DuckDB exactly, with no float anywhere
  * and no tolerance band. (Mass lost to floor division is deterministic
  * and identical on both engines.)
  */
object Graph {

  private val S = 1000000000000L // fixed-point scale (1.0 == 1e12)
  // HITS fixed-point scale — declared ABOVE `decls` (the Decl seq forces
  // oHitsSql at object init; a val declared below it would read as 0)
  private[graft] val HitsS = 1000000L

  /** One unrolled oracle iteration: ranks `rin` → `rout`. */
  private def oIter(rin: String, rout: String): String =
    s"""$rout AS (
       |  SELECT n2.node,
       |    (${S} * 15) // (100 * p.n)
       |      + (85 * coalesce(m.m, CAST(0 AS BIGINT))) // 100 AS r
       |  FROM nodes n2
       |  LEFT JOIN (
       |    SELECT e.dst, CAST(sum(r.r // d.outdeg) AS BIGINT) AS m
       |    FROM edges e
       |    JOIN $rin r ON r.node = e.src
       |    JOIN deg d ON d.src = e.src
       |    GROUP BY e.dst) m ON m.dst = n2.node,
       |  params p)""".stripMargin

  private val oSql =
    s"""WITH pairs AS (
       |  SELECT DISTINCT l_suppkey * 2 + 1 AS s, o_custkey * 2 AS c
       |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
       |edges AS (
       |  SELECT s AS src, c AS dst FROM pairs
       |  UNION ALL
       |  SELECT c AS src, s AS dst FROM pairs),
       |nodes AS (SELECT DISTINCT src AS node FROM edges),
       |deg AS (SELECT src, count(*) AS outdeg FROM edges GROUP BY src),
       |params AS (SELECT count(*) AS n FROM nodes),
       |r0 AS (SELECT node, CAST($S AS BIGINT) // p.n AS r FROM nodes, params p),
       |${oIter("r0", "r1")},
       |${oIter("r1", "r2")}
       |SELECT node, r FROM r2 ORDER BY node""".stripMargin

  /** Build the bucketed adjacency table `(src, dst, outdeg)` for the
    * supplier↔customer graph and return it. Bucketed + sorted on src,
    * one file per bucket (repartitioned by src before the write), so
    * every downstream join or aggregation keyed on src is shuffle-free
    * on this side. Table name is per-JVM (concurrent runs don't race). */
  /** The adjacency layout is immutable per input, so one JVM builds it
    * at most once via the shared [[Qh.bucketedTable]] machinery (tests,
    * Scratch double-runs, and convergence loops reuse it). */
  def edgeTable(s: org.apache.spark.sql.SparkSession, dir: String): org.apache.spark.sql.DataFrame = {
    import s.implicits._
    Qh.bucketedTable(s, "pr_edges", dir, 32, Seq("src")) {
      val li = Qh.t(s, dir, "lineitem").select($"l_orderkey", $"l_suppkey")
      val ord = Qh.t(s, dir, "orders").select($"o_orderkey", $"o_custkey")
      val pairs = Qh.materialize(
        li.join(ord, $"l_orderkey" === $"o_orderkey")
          .select(($"l_suppkey" * 2 + 1).as("s"), ($"o_custkey" * 2).as("c"))
          .distinct())
      val edges = pairs.select($"s".as("src"), $"c".as("dst"))
        .unionAll(pairs.select($"c".as("src"), $"s".as("dst")))
      val deg = edges.groupBy($"src").agg(count(lit(1)).as("outdeg"))
      edges.join(deg, "src")
    }
  }

  /** One power iteration over the bucketed adjacency table: rank mass
    * flows src→dst, damped, teleport re-added. Integer fixed-point
    * throughout (see the exactness note above). */
  def iterate(
      e: org.apache.spark.sql.DataFrame,
      nodes: org.apache.spark.sql.DataFrame,
      r: org.apache.spark.sql.DataFrame,
      base: Long): org.apache.spark.sql.DataFrame = {
    import e.sparkSession.implicits._
    val contrib = e.join(r, e("src") === r("node"))
      .select($"dst", expr("r DIV outdeg").as("cb"))
    val m = contrib.groupBy($"dst").agg(sum($"cb").as("m"))
    nodes.join(m, nodes("node") === m("dst"), "left")
      .select($"node",
        (lit(base) + expr("(85 * coalesce(m, CAST(0 AS BIGINT))) DIV 100")).as("r"))
  }

  /** Convergence-mode PageRank — the production loop the fixed-
    * iteration oracle decl deliberately doesn't use: iterate until the
    * max per-node rank change (exact fixed-point BIGINT — deterministic
    * across runs, no float tolerance) falls to `tolFp`, or `maxIters`.
    * Each iteration materializes its rank frontier (bounded lineage —
    * an unbounded loop would otherwise stack plans) and pays one extra
    * nodes-sized join+max for the delta; the bucketed edge side is
    * untouched. Returns (ranks, iterationsRun). */
  def pageRankUntil(
      s: org.apache.spark.sql.SparkSession, dir: String,
      maxIters: Int, tolFp: Long): (org.apache.spark.sql.DataFrame, Int) = {
    import s.implicits._
    val e = edgeTable(s, dir)
    val nodes = Qh.materialize(e.select($"src".as("node")).distinct())
    val n = nodes.count()
    val base = (S * 15) / (100 * n)
    var r = Qh.materialize(nodes.select($"node", lit(S / n).as("r")))
    var i = 0
    while (i < maxIters) {
      val next = Qh.materialize(iterate(e, nodes, r, base))
      i += 1
      val d = next.as("a").join(r.as("b"), $"a.node" === $"b.node")
        .agg(max(abs($"a.r" - $"b.r")))
        .head.getLong(0)
      // the delta was the old frontier's last reader — free its blocks
      // now, or a long convergence run accumulates one persisted
      // frontier per iteration
      Qh.release(r)
      r = next
      if (d <= tolFp) return (r, i)
    }
    (r, i)
  }

  /** Oracle for [[declTriangles]]: the direct triple self-join over the
    * canonical u<v undirected edge set. Exact (no orientation trick
    * needed at oracle scale), so it independently validates the
    * engine's oriented-wedge count. */
  private val oTriSql: String =
    """WITH inc AS (
      |  SELECT DISTINCT l_orderkey AS ok, l_suppkey AS sk
      |  FROM lineitem WHERE l_quantity >= 45),
      |e AS (
      |  SELECT DISTINCT a.sk AS u, b.sk AS v
      |  FROM inc a JOIN inc b ON a.ok = b.ok AND a.sk < b.sk),
      |deg AS (
      |  SELECT n, count(*) AS d
      |  FROM (SELECT u AS n FROM e UNION ALL SELECT v AS n FROM e)
      |  GROUP BY n),
      |tri AS (
      |  SELECT count(*) AS t
      |  FROM e ab JOIN e bc ON bc.u = ab.v
      |            JOIN e ac ON ac.u = ab.u AND ac.v = bc.v),
      |agg AS (
      |  SELECT CAST(count(*) AS BIGINT) AS n_nodes,
      |         CAST(sum((d * (d - 1)) // 2) AS BIGINT) AS n_wedges
      |  FROM deg)
      |SELECT n_nodes,
      |  (SELECT CAST(count(*) AS BIGINT) FROM e) AS n_edges,
      |  n_wedges,
      |  CAST(t AS BIGINT) AS n_triangles,
      |  floor((CAST(3 * t AS DOUBLE) / CAST(n_wedges AS DOUBLE)) * 1000000 + 0.5) / 1000000.0 AS gcc
      |FROM agg, tri""".stripMargin

  val decls: Seq[Decl] = Seq(
    Decl("l13_pagerank", oSql) { (s, dir) =>
      import s.implicits._
      val e = edgeTable(s, dir)
      // nodes derive from the bucketed scan (the distinct's partial agg
      // runs per-bucket with no preceding shuffle) — and BECAUSE there
      // is no exchange under it, Spark has nothing to reuse across its
      // three consumers (r0 + one join per unrolled round): without
      // materialization each reference re-ran the scan+distinct (r16
      // profile). One nodes-sized materialization serves all three —
      // the pageRankUntil discipline applied to the decl.
      val nodes = Qh.materialize(e.select($"src".as("node")).distinct())
      // n and the teleport base are model-sized scalars; Scala Long
      // division on positives == DuckDB's floor `//`
      val n = nodes.count()
      val base = (S * 15) / (100 * n)
      var r = nodes.select($"node", lit(S / n).as("r"))
      // materialize the INTERMEDIATE frontier only (round 1): round 2's
      // two references to r1 otherwise re-execute the whole round-1
      // dataflow (no exchange under the bucketed join → no reuse). The
      // final round stays lazy so the decl's plan keeps the pinned
      // bucketed-join shape end to end.
      r = Qh.materialize(iterate(e, nodes, r, base))
      r = iterate(e, nodes, r, base)
      r.orderBy("node")
    },

    // L13b: TRIANGLE COUNTING + global clustering coefficient over the
    // supplier co-occurrence graph (suppliers linked when they serve
    // the same order). See [[triangleStats]] for the degree-orientation
    // algorithm; GraphSpec property-checks it against a brute-force
    // model on random graphs, and the DuckDB oracle is an independent
    // exact triple self-join.
    Decl("l13_triangles", oTriSql) { (s, dir) =>
      triangleStats(coSupplyEdges(s, dir))
    },

    // L13c: K-CORE decomposition (two unrolled synchronous peel rounds,
    // k=6) over a SPARSER co-supply graph (l_quantity >= 47) — the
    // standard "dense sub-community" extractor (Seidman 1983;
    // Batagelj–Zaveršnik peeling): each round simultaneously removes
    // every node whose CURRENT degree is < k, edges incident to removed
    // nodes disappear, degrees recompute. Rounds are unrolled (the
    // l13_pagerank / l3_kmeans fixed-iteration discipline) so the
    // oracle states the identical CTE rounds — the fixed-round state is
    // well-defined whether or not the peel has converged. The (47, 6)
    // parameters are the selective pair that still peels at EVERY
    // fixture scale (sf0.001's graph is a 10-supplier near-clique:
    // 2/1/10 nodes peel at sf0.001/0.01/0.1; the first cut's (45, 24)
    // emptied the sf0.001 core entirely and failed the rows>0 smoke).
    // Per round: one semi-join to keep both-alive edges + one degree
    // agg — at 100 TB the bucketed-adjacency layout
    // (Graph.buildEdgeTable) makes the edge side of every round
    // exchange-free.
    Decl("l13_kcore", oKCoreSql) { (s, dir) =>
      import s.implicits._
      val e0 = coSupplyEdges(s, dir, minQty = 47)
      def degrees(e: org.apache.spark.sql.DataFrame) = e
        .select($"u".as("node"))
        .unionAll(e.select($"v".as("node")))
        .groupBy($"node")
        .agg(count(lit(1)).as("deg"))
      var e = e0
      var alive = degrees(e).filter($"deg" >= 6).select($"node")
      for (round <- 1 to 2) {
        val al = Qh.materialize(alive)
        e = e
          .join(al.select($"node".as("u")), Seq("u"), "left_semi")
          .join(al.select($"node".as("v")), Seq("v"), "left_semi")
        // degrees(e) references e twice (u ∪ v legs) and the next round
        // references it again — materialize the INTERMEDIATE round's
        // edge set so the final plan re-executes none of round 1
        // (final round lazy, same discipline as the other l13 decls)
        if (round == 1) e = Qh.materialize(e)
        alive = degrees(e).filter($"deg" >= 6).select($"node")
      }
      degrees(e)
        .join(alive, Seq("node"), "left_semi")
        .select($"node", $"deg".cast("bigint").as("core_deg"))
        .orderBy("node")
    },

    // L13d: HITS hubs & authorities (Kleinberg, JACM 1999) — the
    // second eigenvector pair next to PageRank's one: auth mass flows
    // ALONG edges (a ← Σ h over in-edges), hub mass flows AGAINST them
    // (h ← Σ a over out-edges), L1-normalized each half-step. Two
    // unrolled rounds in the l13_pagerank fixed-point discipline:
    // scores are BIGINT at scale 1e6 (the scale is a dial — it bounds
    // n·S² against 2^63), normalization is `raw * S DIV Σraw` (integer
    // floor, associative, shuffle-order-proof), so the oracle replays
    // every round bit-identically — no tolerance band. Plan shape: the
    // auth half-step joins ranks on src over the SRC-bucketed
    // adjacency (exchange-free edge side, same table PageRank uses);
    // the hub half-step keys on dst, so a SECOND bucketed layout on
    // dst serves it exchange-free — at 100 TB a graph warehouse
    // maintains both orientations of its adjacency for exactly this
    // (out-edge AND in-edge traversals), shuffle paid once at ingest.
    // The Σraw normalizers ride as one-row broadcasts.
    Decl("l13_hits", oHitsSql) { (s, dir) =>
      import s.implicits._
      val eSrc = edgeTable(s, dir)
      val eDst = edgeTableByDst(s, dir)
      val nodes = eSrc.select($"src".as("node")).distinct()
      var h = nodes.select($"node", lit(HitsS).as("h"))
      // round 1 materialized: round 2 references h1 through BOTH of its
      // half-steps, and with no exchange under the bucketed edge joins
      // Spark re-executed the entire round-1 dataflow per reference
      // (r16 profile: ~50 s of task time for ~1 MB of edges). The final
      // round stays lazy so the decl's plan keeps both pinned adjacency
      // orientations visible (PlanSpec l13_hits).
      h = Qh.materialize(hitsRound(eSrc, eDst, h)._1)
      val (h2, a2) = hitsRound(eSrc, eDst, h)
      h2.join(a2, Seq("node"))
        .select($"node", $"h".as("hub"), $"a".as("auth"))
        .orderBy("node")
    },

    // L13e: MULTI-SOURCE BFS / k-hop reachability (the Pregel hello-
    // world, and the lineage/blast-radius primitive every graph
    // warehouse serves): distances from a seed set (every node ≡ 0
    // mod 10) after two synchronous relaxation rounds — the unrolled
    // fixed-iteration discipline, so the oracle states the identical
    // rounds and the 2-hop state is well-defined whether or not the
    // frontier has quiesced. Each round is one join of the current
    // distance table to the adjacency on src (co-located on the
    // bucketed layout — the fact-sized edge side never shuffles) plus
    // one min-agg keyed by dst; distances are small exact integers.
    // At 100 TB the per-round cost is frontier-sized, the edge scan
    // is exchange-free, and k composes by iterating — the same loop
    // shape as pageRankUntil with Qh.release bounding storage.
    Decl("l13_bfs", oBfsSql) { (s, dir) =>
      import s.implicits._
      val e = edgeTable(s, dir)
      val nodes = e.select($"src".as("node")).distinct()
      var d = nodes.filter($"node" % 10 === 0)
        .select($"node", lit(0L).as("dist"))
      // NOT materialized between rounds (r16: measured — the frontier
      // is seeds-sized and two unrolled rounds recompute less than one
      // checkpoint barrier costs, 1.25 s lazy vs 1.8 s materialized;
      // the convergence-mode loop, bfsUntil, does materialize because
      // its round count is unbounded)
      for (_ <- 1 to 2) d = bfsRound(e, d)
      d.orderBy("node")
    }
  )

  /** One HITS round over the two adjacency orientations: the auth
    * half-step joins hub scores on src (co-located on the src-bucketed
    * layout), the hub half-step joins auth scores on dst (co-located on
    * the dst-bucketed layout); both L1-normalize via a one-row
    * broadcast. Integer fixed-point at scale [[HitsS]] — shared by the
    * l13_hits decl (two unrolled rounds, oracle-checked) and
    * [[hitsUntil]] (the production convergence loop). */
  private[graft] def hitsRound(
      eSrc: org.apache.spark.sql.DataFrame,
      eDst: org.apache.spark.sql.DataFrame,
      h: org.apache.spark.sql.DataFrame)
      : (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame) = {
    import h.sparkSession.implicits._
    val ar = eSrc.join(h, eSrc("src") === h("node"))
      .groupBy($"dst").agg(sum($"h").as("raw"))
    val at = ar.agg(sum($"raw").as("t"))
    val a = ar.crossJoin(broadcast(at))
      .select($"dst".as("node"), expr(s"(raw * $HitsS) DIV t").as("a"))
    val hr = eDst.join(a, eDst("dst") === a("node"))
      .groupBy($"src").agg(sum($"a").as("raw"))
    val ht = hr.agg(sum($"raw").as("t"))
    val h2 = hr.crossJoin(broadcast(ht))
      .select($"src".as("node"), expr(s"(raw * $HitsS) DIV t").as("h"))
    (h2, a)
  }

  /** One BFS relaxation round: frontier mass flows src→dst, distances
    * min-combine. Shared by the l13_bfs decl and [[bfsUntil]]. */
  private[graft] def bfsRound(
      e: org.apache.spark.sql.DataFrame,
      d: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    import d.sparkSession.implicits._
    val relaxed = e.join(d, e("src") === d("node"))
      .select($"dst".as("node"), ($"dist" + 1L).as("dist"))
    d.unionAll(relaxed).groupBy($"node").agg(min($"dist").as("dist"))
  }

  /** Convergence-mode HITS — the production loop next to the decl's
    * fixed two oracle rounds (the [[pageRankUntil]] discipline): iterate
    * until the max per-node change of BOTH score vectors (exact integer
    * fixed-point — no float tolerance band) falls to `tolFp`, or
    * `maxIters`. Each round materializes its frontier (bounded lineage)
    * and releases the previous one; the two bucketed adjacency
    * orientations are untouched across rounds. `edges` must carry
    * (src, dst); pass the same DataFrame twice when no dst-bucketed
    * layout exists (correct, one extra exchange per round).
    * Returns (hub ⋈ auth scores, iterationsRun). */
  def hitsUntil(
      eSrc: org.apache.spark.sql.DataFrame,
      eDst: org.apache.spark.sql.DataFrame,
      maxIters: Int, tolFp: Long): (org.apache.spark.sql.DataFrame, Int) = {
    val s = eSrc.sparkSession
    import s.implicits._
    // node universe = src ∪ dst, and every round's scores are
    // re-expanded onto it (missing = 0: a pure source has auth 0, a
    // pure sink hub 0 — the HITS semantics). Keeping both score
    // tables on one fixed domain makes the delta joins total: on a
    // src-only domain a graph with pure sinks either NPE'd the delta
    // agg or declared convergence against a half-empty join.
    val nodes = Qh.materialize(
      eSrc.select($"src".as("node"))
        .unionAll(eSrc.select($"dst".as("node"))).distinct())
    def expand(x: org.apache.spark.sql.DataFrame, c: String) =
      nodes.join(x, Seq("node"), "left")
        .select($"node", coalesce(col(c), lit(0L)).as(c))
    var h = Qh.materialize(nodes.select($"node", lit(HitsS).as("h")))
    var a = Qh.materialize(nodes.select($"node", lit(HitsS).as("a")))
    var i = 0
    def finish(): org.apache.spark.sql.DataFrame = {
      // materialize the result and release every intermediate — the
      // caller owns exactly one frame (the ccUntil/pageRankUntil
      // contract); anything less leaks pinned RDDs per call in a loop
      val res = Qh.materialize(h.join(a, Seq("node"))
        .select($"node", $"h".as("hub"), $"a".as("auth")))
      Qh.release(h); Qh.release(a); Qh.release(nodes)
      res
    }
    while (i < maxIters) {
      val (h2r, a2r) = hitsRound(eSrc, eDst, h)
      val h2 = Qh.materialize(expand(h2r, "h"))
      val a2 = Qh.materialize(expand(a2r, "a"))
      i += 1
      val dh = h2.as("n").join(h.as("o"), $"n.node" === $"o.node")
        .agg(max(abs($"n.h" - $"o.h"))).head.getLong(0)
      val da = a2.as("n").join(a.as("o"), $"n.node" === $"o.node")
        .agg(max(abs($"n.a" - $"o.a"))).head.getLong(0)
      Qh.release(h); Qh.release(a)
      h = h2; a = a2
      if (math.max(dh, da) <= tolFp) return (finish(), i)
    }
    (finish(), i)
  }

  /** Convergence-mode K-CORE: synchronous peel rounds until the alive
    * set reaches its fixpoint (the decl's two unrolled rounds are the
    * oracle form; this is the production loop, Batagelj–Zaveršnik
    * semantics). The alive set only ever SHRINKS, so count equality
    * across a round ⟺ set equality — the fixpoint test is one scalar.
    * `edges0` is a canonical undirected (u, v) edge set. Returns
    * (core member degrees, roundsRun) — roundsRun includes the final
    * quiesced round that proved the fixpoint. */
  def kcoreUntil(
      edges0: org.apache.spark.sql.DataFrame, k: Int, maxRounds: Int = 200)
      : (org.apache.spark.sql.DataFrame, Int) = {
    val s = edges0.sparkSession
    import s.implicits._
    def degrees(e: org.apache.spark.sql.DataFrame) = e
      .select($"u".as("node"))
      .unionAll(e.select($"v".as("node")))
      .groupBy($"node")
      .agg(count(lit(1)).as("deg"))
    var e = Qh.materialize(edges0)
    var alive = Qh.materialize(degrees(e).filter($"deg" >= k).select($"node"))
    var n = alive.count()
    var rounds = 0
    while (rounds < maxRounds) {
      val e2 = Qh.materialize(
        e.join(alive.select($"node".as("u")), Seq("u"), "left_semi")
          .join(alive.select($"node".as("v")), Seq("v"), "left_semi"))
      val alive2 = Qh.materialize(
        degrees(e2).filter($"deg" >= k).select($"node"))
      rounds += 1
      val n2 = alive2.count()
      Qh.release(e); Qh.release(alive)
      e = e2; alive = alive2
      if (n2 == n) return (finishKcore(e, alive), rounds)
      n = n2
    }
    (finishKcore(e, alive), rounds)
  }

  /** Materialize the k-core result and release the loop's final edge
    * and alive frames — the caller owns exactly one frame (the
    * ccUntil contract), so looped calls cannot accumulate pinned RDDs. */
  private def finishKcore(
      e: org.apache.spark.sql.DataFrame,
      alive: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    import e.sparkSession.implicits._
    val core = Qh.materialize(
      e.select($"u".as("node")).unionAll(e.select($"v".as("node")))
        .groupBy($"node").agg(count(lit(1)).as("deg"))
        .join(alive, Seq("node"), "left_semi")
        .select($"node", $"deg".cast("bigint").as("core_deg")))
    Qh.release(e); Qh.release(alive)
    core
  }

  /** Convergence-mode multi-source BFS: relax until the distance table
    * reaches its fixpoint (frontier quiesced), or `maxIters`. The
    * fixpoint test rides two scalars — per-node distances only ever
    * DECREASE and the reached set only ever GROWS, so (count, sum)
    * unchanged ⟺ nothing changed; no row-level diff join needed.
    * `seeds` is a (node) DataFrame at distance 0. Returns
    * (distances, iterationsRun) — iterationsRun includes the final
    * quiesced round that proved the fixpoint. */
  def bfsUntil(
      e: org.apache.spark.sql.DataFrame,
      seeds: org.apache.spark.sql.DataFrame,
      maxIters: Int = 200): (org.apache.spark.sql.DataFrame, Int) = {
    val s = e.sparkSession
    import s.implicits._
    var d = Qh.materialize(seeds.select($"node", lit(0L).as("dist")))
    var sig = d.agg(count(lit(1)), sum($"dist")).head
    var i = 0
    while (i < maxIters) {
      val next = Qh.materialize(bfsRound(e, d))
      i += 1
      val nsig = next.agg(count(lit(1)), sum($"dist")).head
      Qh.release(d)
      d = next
      if (nsig == sig) return (d, i)
      sig = nsig
    }
    (d, i)
  }

  /** Oracle for l13_bfs: the identical two unrolled relaxation rounds. */
  private lazy val oBfsSql: String = {
    // AS MATERIALIZED — same chained-round inlining hazard as oHitsSql
    def round(din: String, dout: String): String =
      s"""$dout AS MATERIALIZED (
         |  SELECT node, CAST(min(dist) AS BIGINT) AS dist FROM (
         |    SELECT node, dist FROM $din
         |    UNION ALL
         |    SELECT e.dst AS node, d.dist + 1 AS dist
         |    FROM edges e JOIN $din d ON d.node = e.src)
         |  GROUP BY node)""".stripMargin
    s"""WITH pairs AS MATERIALIZED (
       |  SELECT DISTINCT l_suppkey * 2 + 1 AS s, o_custkey * 2 AS c
       |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
       |edges AS MATERIALIZED (
       |  SELECT s AS src, c AS dst FROM pairs
       |  UNION ALL
       |  SELECT c AS src, s AS dst FROM pairs),
       |nodes AS (SELECT DISTINCT src AS node FROM edges),
       |d0 AS MATERIALIZED (SELECT node, CAST(0 AS BIGINT) AS dist FROM nodes WHERE node % 10 = 0),
       |${round("d0", "d1")},
       |${round("d1", "d2")}
       |SELECT node, dist FROM d2 ORDER BY node""".stripMargin
  }

  /** The dst-bucketed orientation of [[edgeTable]] (same edge set,
    * bucketed+sorted on dst) — serves in-edge-keyed joins
    * exchange-free, as the src layout serves out-edge-keyed ones. */
  def edgeTableByDst(s: org.apache.spark.sql.SparkSession, dir: String): org.apache.spark.sql.DataFrame = {
    import s.implicits._
    Qh.bucketedTable(s, "pr_edges_dst", dir, 32, Seq("dst")) {
      edgeTable(s, dir).select($"src", $"dst")
    }
  }

  /** Oracle for l13_hits: the identical two unrolled integer rounds. */
  private lazy val oHitsSql: String = {
    // AS MATERIALIZED: every round CTE is referenced by the next round,
    // and DuckDB's default inlining re-expands the whole upstream chain
    // per reference — at sf1 that plan exhausted 79 GB of spill before
    // failing. Materialization makes the oracle linear in rounds, like
    // the engine. (Hint-only: the driver's DuckDB accepts it; Spark
    // never parses oracle SQL.)
    def round(hin: String, k: Int): String =
      s"""a${k}r AS MATERIALIZED (
         |  SELECT e.dst AS node, CAST(sum(h.h) AS BIGINT) AS raw
         |  FROM edges e JOIN $hin h ON h.node = e.src GROUP BY e.dst),
         |a${k}t AS (SELECT CAST(sum(raw) AS BIGINT) AS t FROM a${k}r),
         |a$k AS MATERIALIZED (SELECT node, (raw * $HitsS) // t AS a FROM a${k}r, a${k}t),
         |h${k}r AS MATERIALIZED (
         |  SELECT e.src AS node, CAST(sum(a.a) AS BIGINT) AS raw
         |  FROM edges e JOIN a$k a ON a.node = e.dst GROUP BY e.src),
         |h${k}t AS (SELECT CAST(sum(raw) AS BIGINT) AS t FROM h${k}r),
         |h$k AS MATERIALIZED (SELECT node, (raw * $HitsS) // t AS h FROM h${k}r, h${k}t)""".stripMargin
    s"""WITH pairs AS MATERIALIZED (
       |  SELECT DISTINCT l_suppkey * 2 + 1 AS s, o_custkey * 2 AS c
       |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
       |edges AS MATERIALIZED (
       |  SELECT s AS src, c AS dst FROM pairs
       |  UNION ALL
       |  SELECT c AS src, s AS dst FROM pairs),
       |nodes AS (SELECT DISTINCT src AS node FROM edges),
       |h0 AS MATERIALIZED (SELECT node, CAST($HitsS AS BIGINT) AS h FROM nodes),
       |${round("h0", 1)},
       |${round("h1", 2)}
       |SELECT h2.node, h2.h AS hub, a2.a AS auth
       |FROM h2 JOIN a2 ON a2.node = h2.node
       |ORDER BY h2.node""".stripMargin
  }

  /** Canonical u<v undirected co-supply edges: suppliers linked when
    * they serve the same order, THRESHOLDED to significant line items —
    * an unfiltered bipartite projection densifies toward a clique as
    * scale grows (every popular supplier pair eventually co-occurs);
    * thresholding is how production co-occurrence graphs stay sparse at
    * any sf. Materialized once per call site (shared by the triangle
    * and k-core decls). */
  private def coSupplyEdges(
      s: org.apache.spark.sql.SparkSession, dir: String, minQty: Int = 45)
      : org.apache.spark.sql.DataFrame = {
    import s.implicits._
    val inc = Qh
      .t(s, dir, "lineitem")
      .filter($"l_quantity" >= minQty)
      .select($"l_orderkey".as("ok"), $"l_suppkey".as("sk"))
      .distinct()
    Qh.materialize(
      inc
        .as("a")
        .join(inc.as("b"), $"a.ok" === $"b.ok" && $"a.sk" < $"b.sk")
        .select($"a.sk".as("u"), $"b.sk".as("v"))
        .distinct())
  }

  /** Shared oracle CTE: the thresholded co-supply edge set. */
  private def oCoEdges(minQty: Int): String =
    s"""inc AS (
       |  SELECT DISTINCT l_orderkey AS ok, l_suppkey AS sk
       |  FROM lineitem WHERE l_quantity >= $minQty),
       |e0 AS (
       |  SELECT DISTINCT a.sk AS u, b.sk AS v
       |  FROM inc a JOIN inc b ON a.ok = b.ok AND a.sk < b.sk)""".stripMargin

  /** Oracle for [[decls]]' l13_kcore: the same two unrolled synchronous
    * peel rounds (three degree evaluations) + final core filter. */
  private lazy val oKCoreSql: String = {
    def deg(e: String, d: String) =
      s"""$d AS (
         |  SELECT node, count(*) AS deg
         |  FROM (SELECT u AS node FROM $e UNION ALL SELECT v AS node FROM $e)
         |  GROUP BY node)"""
    def peel(ePrev: String, dPrev: String, eNext: String) =
      s"""$eNext AS (
         |  SELECT u, v FROM $ePrev
         |  WHERE u IN (SELECT node FROM $dPrev WHERE deg >= 6)
         |    AND v IN (SELECT node FROM $dPrev WHERE deg >= 6))"""
    s"""WITH ${oCoEdges(minQty = 47)},
       |${deg("e0", "d0")},
       |${peel("e0", "d0", "e1")},
       |${deg("e1", "d1")},
       |${peel("e1", "d1", "e2")},
       |${deg("e2", "d2")}
       |SELECT node, CAST(deg AS BIGINT) AS core_deg
       |FROM d2 WHERE deg >= 6
       |ORDER BY node""".stripMargin
  }

  /** Triangle count, wedge count, and global clustering coefficient
    * over a canonical undirected edge set (`u < v`, distinct rows).
    *
    * The degree-orientation shape of Suri & Vassilvitskii (WWW'11) /
    * Cohen's MR graph suite: every undirected edge is oriented from
    * its lower (degree, id) endpoint to the higher, wedges are
    * generated only at each edge's LOW-rank center, and a wedge closes
    * iff its (a, b) pair appears as an oriented edge. Total wedge work
    * is O(m^1.5) regardless of skew — a celebrity node of degree d
    * generates no wedges itself (its rank is high), so the 100-TB
    * hot-key failure mode of the naive neighbor self-join never
    * materializes. Everything is equi-joins (PlanSpec: no
    * cartesian/BNLJ anywhere in the plan). */
  def triangleStats(e: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val s = e.sparkSession
    import s.implicits._
    val deg = e
      .select($"u".as("n"))
      .unionAll(e.select($"v".as("n")))
      .groupBy($"n")
      .agg(count(lit(1)).as("d"))
    // orient low (degree, id) → high; keep the dst endpoint's degree
    // so the wedge join can compare dst ranks without another join
    val er = Qh.materialize(
      e.join(deg.select($"n".as("u"), $"d".as("du")), "u")
        .join(deg.select($"n".as("v"), $"d".as("dv")), "v")
        .select(
          when(
            $"du" < $"dv" || ($"du" === $"dv" && $"u" < $"v"),
            struct($"u".as("src"), $"v".as("dst"), $"dv".as("dd")))
            .otherwise(struct($"v".as("src"), $"u".as("dst"), $"du".as("dd")))
            .as("o"))
        .select($"o.src".as("src"), $"o.dst".as("dst"), $"o.dd".as("dd")))
    // wedges at the low-rank center, ordered by dst rank so each
    // candidate pair is generated exactly once; close on the oriented
    // edge set (edges are distinct, so the inner join counts each
    // closing wedge exactly once)
    val tri = er
      .as("x")
      .join(
        er.as("y"),
        $"x.src" === $"y.src" &&
          ($"x.dd" < $"y.dd" || ($"x.dd" === $"y.dd" && $"x.dst" < $"y.dst")))
      .select($"x.dst".as("a"), $"y.dst".as("b"))
      .join(er.select($"src".as("a"), $"dst".as("b")), Seq("a", "b"))
      .agg(count(lit(1)).as("t"))
    val stats = deg
      .agg(
        count(lit(1)).cast("bigint").as("n_nodes"),
        sum(expr("(d * (d - 1)) DIV 2")).cast("bigint").as("n_wedges"))
    val edgeCnt = e.agg(count(lit(1)).cast("bigint").as("n_edges"))
    // stitch the three one-row aggregates by union + max — a literal
    // join key would constant-fold into a nested-loop join; this stays
    // pure aggregation
    stats
      .unionByName(edgeCnt, allowMissingColumns = true)
      .unionByName(tri, allowMissingColumns = true)
      .agg(
        max($"n_nodes").as("n_nodes"),
        max($"n_edges").as("n_edges"),
        max($"n_wedges").as("n_wedges"),
        max($"t").cast("bigint").as("n_triangles"))
      .select(
        $"n_nodes",
        $"n_edges",
        $"n_wedges",
        $"n_triangles",
        Qh.r6(lit(3) * $"n_triangles".cast("double") /
          $"n_wedges".cast("double")).as("gcc"))
  }
}
