package graft.queries

import org.apache.spark.sql.functions._

/** SURVEY §2.B L13 — PageRank (Brin/Page 1998) over the
  * supplier↔customer interaction graph (an edge per distinct supplier/
  * customer pair that shared an order; both directions, so every node
  * has out-degree ≥ 1 and no dangling-mass term is needed).
  *
  * The BSP power-iteration shape every distributed graph engine runs
  * (Pregel/GraphX semantics, here as two Spark SQL stages per
  * iteration): join ranks to edges on src (one shuffle keyed by src),
  * partial+final sum of contributions keyed by dst (second shuffle,
  * map-side combined). Edge list is materialized once and reused by
  * every iteration; ranks are a nodes-sized side that rebuilds per
  * iteration. At 100 TB the edge shuffle dominates — partition the
  * edge table by src once and every iteration's join co-locates.
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

  val decls: Seq[Decl] = Seq(
    Decl("l13_pagerank", oSql) { (s, dir) =>
      import s.implicits._
      val li = Qh.t(s, dir, "lineitem").select($"l_orderkey", $"l_suppkey")
      val ord = Qh.t(s, dir, "orders").select($"o_orderkey", $"o_custkey")
      val pairs = Qh.materialize(
        li.join(ord, $"l_orderkey" === $"o_orderkey")
          .select(($"l_suppkey" * 2 + 1).as("s"), ($"o_custkey" * 2).as("c"))
          .distinct())
      val edges = Qh.materialize(
        pairs.select($"s".as("src"), $"c".as("dst"))
          .unionAll(pairs.select($"c".as("src"), $"s".as("dst"))))
      val nodes = edges.select($"src".as("node")).distinct()
      val deg = edges.groupBy($"src").agg(count(lit(1)).as("outdeg"))
      // n and the teleport base are model-sized scalars; Scala Long
      // division on positives == DuckDB's floor `//`
      val n = nodes.count()
      val base = (S * 15) / (100 * n)
      var r = nodes.select($"node", lit(S / n).as("r"))
      for (_ <- 1 to 2) {
        val contrib = edges.join(r, edges("src") === r("node"))
          .join(deg, "src")
          .select($"dst", expr("r DIV outdeg").as("cb"))
        val m = contrib.groupBy($"dst").agg(sum($"cb").as("m"))
        r = nodes.join(m, nodes("node") === m("dst"), "left")
          .select($"node",
            (lit(base) + expr("(85 * coalesce(m, CAST(0 AS BIGINT))) DIV 100")).as("r"))
      }
      r.orderBy("node")
    }
  )
}
