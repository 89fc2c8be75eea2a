package graft

import graft.queries.Graph
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** PageRank properties the hash oracle can't see: convergence-mode
  * stopping, mass conservation under floor division, and determinism. */
class GraphSpec extends AnyFunSuite with SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private val S = 1000000000000L

  test("oriented-wedge triangle count equals brute force on random graphs") {
    // the degree-orientation algorithm vs an O(n^3) model, across
    // random sparse AND dense graphs (the decl's oracle only ever sees
    // one fixture graph; this pins the algorithm itself)
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 8) {
      val n = 4 + rnd.nextInt(9) // 4..12 nodes
      val p = 0.15 + rnd.nextDouble() * 0.7
      val edges = (for {
        u <- 0 until n; v <- (u + 1) until n if rnd.nextDouble() < p
      } yield (u.toLong, v.toLong)).toSeq
      whenever(edges.nonEmpty) {
        val adj = edges.toSet
        val expectTri = (for {
          a <- 0 until n; b <- (a + 1) until n; c <- (b + 1) until n
          if adj((a, b)) && adj((b, c)) && adj((a, c))
        } yield 1).size.toLong
        val degs = edges.flatMap(e => Seq(e._1, e._2))
          .groupBy(identity).view.mapValues(_.size.toLong)
        val expectWedges = degs.values.map(d => d * (d - 1) / 2).sum
        val row = Graph.triangleStats(edges.toDF("u", "v")).collect().head
        assert(row.getAs[Long]("n_triangles") == expectTri,
          s"trial $trial (n=$n p=$p): triangles ${row.getAs[Long]("n_triangles")} != $expectTri")
        assert(row.getAs[Long]("n_wedges") == expectWedges, s"trial $trial: wedges")
        assert(row.getAs[Long]("n_edges") == edges.size.toLong, s"trial $trial: edges")
      }
    }
  }

  private def whenever(cond: Boolean)(body: => Unit): Unit = if (cond) body

  test("convergence mode stops before the iteration cap and is actually converged") {
    // 1e-3 in rank units (fixed-point 1e-12 scale): the max-delta
    // starts hub-sized (~7.7e10 on this fixture) and decays by the
    // damping factor per iteration, so this lands at ~27 iterations —
    // comfortably inside the cap, far from instant
    val tol = 1000000000L
    val (r, iters) = Graph.pageRankUntil(spark, dir, maxIters = 40, tolFp = tol)
    assert(iters < 40, s"did not converge within the cap ($iters iterations)")
    assert(iters > 1, "suspiciously instant convergence")
    // converged means one MORE iteration moves no rank beyond tol
    val e = Graph.edgeTable(spark, dir)
    val nodes = e.select(col("src").as("node")).distinct()
    val n = nodes.count()
    val base = (S * 15) / (100 * n)
    val next = Graph.iterate(e, nodes, r, base)
    val d = next.as("a").join(r.as("b"), col("a.node") === col("b.node"))
      .agg(max(abs(col("a.r") - col("b.r")))).head.getLong(0)
    assert(d <= tol, s"reported converged but next step still moves $d")
    // floor division only ever loses mass: 0 < total ≤ S, and close to S
    val total = r.agg(sum(col("r"))).head.getLong(0)
    assert(total <= S && total > (S * 95) / 100,
      s"rank mass off: $total vs scale $S")
  }

  test("convergence-mode ranks are deterministic across runs") {
    val (ra, ia) = Graph.pageRankUntil(spark, dir, maxIters = 15, tolFp = 100000000L)
    val (rb, ib) = Graph.pageRankUntil(spark, dir, maxIters = 15, tolFp = 100000000L)
    assert(ia == ib)
    assert(ra.orderBy("node").collect().toSeq == rb.orderBy("node").collect().toSeq)
  }

  test("convergence loop releases superseded frontiers — bounded storage") {
    // a long 100 TB convergence run must not accumulate one persisted
    // frontier per iteration; superseded frontiers are released as soon
    // as the delta check has consumed them
    val before = spark.sparkContext.getPersistentRDDs.size
    val (r, iters) = Graph.pageRankUntil(spark, dir, maxIters = 8, tolFp = 0L)
    assert(iters == 8, "tolFp=0 must run to the cap")
    assert(r.count() > 0)
    val after = spark.sparkContext.getPersistentRDDs.size
    // live at the end: nodes + the final frontier (+ the shared edge
    // pairs from edgeTable's one-time build) — NOT 8 frontiers
    assert(after - before <= 3,
      s"frontier RDD blocks leaked across iterations: $before -> $after")
  }

  test("hitsUntil converges inside the cap and one more round moves nothing beyond tol") {
    val eSrc = Graph.edgeTable(spark, dir)
    val eDst = Graph.edgeTableByDst(spark, dir)
    val tol = 100L // 1e-4 at the 1e6 fixed-point scale
    val (scores, iters) = Graph.hitsUntil(eSrc, eDst, maxIters = 40, tolFp = tol)
    assert(iters < 40, s"did not converge within the cap ($iters iterations)")
    assert(iters > 1, "suspiciously instant convergence")
    // converged means one MORE round moves neither score side beyond tol
    val h = scores.select(col("node"), col("hub").as("h"))
    val (h2, a2) = Graph.hitsRound(eSrc, eDst, h)
    val dh = h2.join(scores, "node")
      .agg(max(abs(col("h") - col("hub")))).head.getLong(0)
    val da = a2.join(scores, "node")
      .agg(max(abs(col("a") - col("auth")))).head.getLong(0)
    assert(math.max(dh, da) <= tol,
      s"reported converged but the next round still moves hub $dh / auth $da")
  }

  test("hitsUntil replays bit-exactly against a driver-side integer model") {
    import spark.implicits._
    // a small digraph where every node has in- AND out-edges (the same
    // closure the fixture's bidirectional graph guarantees): a 6-cycle
    // with two chords
    val edges = Seq(
      (0L, 1L), (1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 0L),
      (0L, 3L), (3L, 0L))
    val e = edges.toDF("src", "dst").localCheckpoint()
    val (scores, iters) = Graph.hitsUntil(e, e, maxIters = 30, tolFp = 10L)
    val got = scores.collect()
      .map(r => r.getAs[Long]("node") -> (r.getAs[Long]("hub"), r.getAs[Long]("auth")))
      .toMap
    // replay the SAME integer half-steps (sum, then floor-normalize) on
    // the driver for the same number of rounds
    val s2 = Graph.HitsS
    val nodes = edges.flatMap(p => Seq(p._1, p._2)).distinct
    var h = nodes.map(_ -> s2).toMap
    var a = Map.empty[Long, Long]
    (1 to iters).foreach { _ =>
      val rawA = edges.groupBy(_._2).view
        .mapValues(_.map { case (srcN, _) => h(srcN) }.sum).toMap
      val ta = rawA.values.sum
      a = rawA.view.mapValues(raw => raw * s2 / ta).toMap
      val rawH = edges.groupBy(_._1).view
        .mapValues(_.map { case (_, dstN) => a(dstN) }.sum).toMap
      val th = rawH.values.sum
      h = rawH.view.mapValues(raw => raw * s2 / th).toMap
    }
    val expect = nodes.map(n => n -> (h(n), a(n))).toMap
    assert(got == expect, s"integer HITS diverged from the model: $got vs $expect")
  }

  test("hitsUntil handles pure sources and sinks: full node universe, zero for the missing side") {
    import spark.implicits._
    // node 3 only emits (pure source -> auth 0), node 4 only receives
    // (pure sink -> hub 0); the old src-only domain either NPE'd the
    // delta agg or silently dropped such nodes from the result
    val e = Seq((1L, 2L), (2L, 1L), (3L, 1L), (1L, 4L))
      .toDF("src", "dst").localCheckpoint()
    val (scores, _) = Graph.hitsUntil(e, e, maxIters = 30, tolFp = 10L)
    val got = scores.collect()
      .map(r => r.getAs[Long]("node") ->
        (r.getAs[Long]("hub"), r.getAs[Long]("auth"))).toMap
    assert(got.keySet == Set(1L, 2L, 3L, 4L), s"universe incomplete: ${got.keySet}")
    assert(got(3L)._2 == 0L, "a pure source must carry auth 0")
    assert(got(4L)._1 == 0L, "a pure sink must carry hub 0")
    assert(got(1L)._1 > 0 && got(1L)._2 > 0)
    // the degenerate single-edge graph must simply converge, not NPE
    val single = Seq((1L, 2L)).toDF("src", "dst").localCheckpoint()
    val (s2, _) = Graph.hitsUntil(single, single, maxIters = 10, tolFp = 0L)
    val got2 = s2.collect()
      .map(r => r.getAs[Long]("node") ->
        (r.getAs[Long]("hub"), r.getAs[Long]("auth"))).toMap
    assert(got2 == Map(1L -> (Graph.HitsS, 0L), 2L -> (0L, Graph.HitsS)))
  }

  test("bfsUntil on a 64-chain: exact closure distances, fixpoint detected") {
    import spark.implicits._
    val chain = (0L until 63L).flatMap(i => Seq((i, i + 1), (i + 1, i)))
    val e = chain.toDF("src", "dst").localCheckpoint()
    val (d, iters) = Graph.bfsUntil(e, Seq(0L).toDF("node"), maxIters = 100)
    val got = d.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == (0L until 64L).map(i => i -> i).toMap,
      s"chain distances wrong: $got")
    // 63 relaxation rounds reach the far end; round 64 proves quiescence
    assert(iters == 64, s"expected 63 relax + 1 quiesced round, got $iters")
    // multi-source: seeds at both ends halve the radius
    val (d2, iters2) = Graph.bfsUntil(e, Seq(0L, 63L).toDF("node"), maxIters = 100)
    val got2 = d2.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got2 == (0L until 64L).map(i => i -> math.min(i, 63 - i)).toMap)
    assert(iters2 == 32, s"two-seed chain (radius 31) must quiesce in 31+1 rounds, got $iters2")
  }

  test("kcoreUntil peels to the exact fixpoint: chain empties round-by-round, cycle and clique survive") {
    import spark.implicits._
    // a 64-chain under k=2: each synchronous round removes exactly the
    // two current endpoints, so the peel runs ~32 rounds to empty —
    // the shape that proves the loop actually iterates to quiescence
    val chain = (0L until 63L).map(i => (i, i + 1)).toDF("u", "v").localCheckpoint()
    val (coreC, roundsC) = Graph.kcoreUntil(chain, k = 2)
    assert(coreC.isEmpty, "an open chain has no 2-core")
    assert(roundsC >= 30 && roundsC <= 35,
      s"synchronous endpoint peel should take ~32 rounds, got $roundsC")
    // a 64-cycle under k=2 is its own 2-core: nothing peels, fixpoint
    // proves in the minimum number of rounds
    val cycle = ((0L until 63L).map(i => (i, i + 1)) :+ (0L, 63L))
      .toDF("u", "v").localCheckpoint()
    val (coreY, roundsY) = Graph.kcoreUntil(cycle, k = 2)
    val gotY = coreY.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(gotY == (0L until 64L).map(_ -> 2L).toMap, s"cycle 2-core wrong: $gotY")
    assert(roundsY == 1, s"an already-stable core must quiesce in one round, got $roundsY")
    // K5 with a pendant chain under k=4: the chain (and its attachment
    // influence) peels, the clique survives with core degree 4 — the
    // union-shape matching the driver-side peel model
    val k5 = for { a <- 0 until 5; b <- (a + 1) until 5 } yield (a.toLong, b.toLong)
    val pendant = Seq((4L, 10L), (10L, 11L), (11L, 12L))
    val mixed = (k5 ++ pendant).toDF("u", "v").localCheckpoint()
    val (coreM, _) = Graph.kcoreUntil(mixed, k = 4)
    val gotM = coreM.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(gotM == (0L until 5L).map(_ -> 4L).toMap,
      s"K5 4-core must survive exactly: $gotM")
  }

  test("HITS scores are L1-normalized: each side's mass lands just under the scale") {
    // `raw * S DIV Σraw` floors per node, so each normalization loses
    // < 1 unit per node: S - n ≤ Σ ≤ S must hold for BOTH score sides
    val s2 = graft.queries.Graph.HitsS // turning the scale dial moves the bounds too
    val rows = SparkEntry.queries("l13_hits")(spark, dir).collect()
    val n = rows.length
    val hubs = rows.map(_.getAs[Long]("hub")).sum
    val auths = rows.map(_.getAs[Long]("auth")).sum
    assert(auths <= s2 && auths >= s2 - n, s"auth mass off: $auths vs $s2 (n=$n)")
    assert(hubs <= s2 && hubs >= s2 - n, s"hub mass off: $hubs vs $s2 (n=$n)")
    assert(rows.forall(r => r.getAs[Long]("hub") >= 0 && r.getAs[Long]("auth") >= 0))
  }
}
