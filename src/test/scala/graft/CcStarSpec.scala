package graft

import org.scalatest.funsuite.AnyFunSuite

/** Large-star/small-star fixpoint properties the shared closure oracle
  * can't see: the decl's oracle only ever meets the fixture's shallow
  * near-dup clusters, but the schedule's whole point is exactness on
  * ARBITRARY component shapes — long chains (the O(diameter) killer for
  * plain label propagation), stars, cliques, random multigraphs. Each
  * shape is checked against a union-by-min union-find model. */
class CcStarSpec extends AnyFunSuite with SparkSpec {
  import graft.queries.Dedup.{largeStar, smallStar}

  /** Run the alternating schedule to its fixpoint; returns the star
    * edges (node → component min) — roots are absent (label = self). */
  private def ccStar(pairs: Seq[(Long, Long)]): Map[Long, Long] = {
    import spark.implicits._
    var edges = pairs.map { case (a, b) => (math.max(a, b), math.min(a, b)) }
      .distinct.toDF("u", "v").localCheckpoint()
    var converged = false
    var rounds = 0
    while (!converged && rounds < 30) {
      val ss = smallStar(largeStar(edges)).localCheckpoint()
      converged = ss.except(edges).isEmpty && edges.except(ss).isEmpty
      edges = ss
      rounds += 1
    }
    assert(converged, s"star schedule did not converge in 30 rounds")
    edges.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  /** Union-by-min union-find: every node's root is its component min. */
  private def unionFind(nodes: Seq[Long], pairs: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map(nodes.map(n => n -> n): _*)
    def find(x: Long): Long = { var r = x; while (parent(r) != r) r = parent(r); r }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    nodes.map(n => n -> find(n)).toMap
  }

  test("star schedule equals union-find on chains, stars, cliques, random graphs") {
    val rnd = new scala.util.Random(7)
    val shapes: Seq[Seq[(Long, Long)]] = Seq(
      (1L until 20L).map(i => (i, i + 1)), // 20-chain
      (2L to 12L).map(i => (1L, i)), // star
      for { a <- 1 to 8; b <- (a + 1) to 8 } yield (a.toLong, b.toLong), // clique
      Seq((1L, 2L), (3L, 4L), (10L, 11L), (2L, 3L)) // merging components
    ) ++ (1 to 5).map { _ =>
      val n = 5 + rnd.nextInt(20)
      (1 to (n + rnd.nextInt(n)))
        .map(_ => (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
    }
    for (pairs <- shapes if pairs.nonEmpty) {
      val nodes = pairs.flatMap(p => Seq(p._1, p._2)).distinct
      val expect = unionFind(nodes, pairs)
      val star = ccStar(pairs)
      val got = nodes.map(n => n -> star.getOrElse(n, n)).toMap
      assert(got == expect, s"component mismatch on pairs=$pairs")
    }
  }

  test("the chain converges in logarithmically few rounds, not diameter-many") {
    // a 64-node chain has diameter 63; label propagation needs ~63
    // rounds, the star schedule must land well under 10
    import spark.implicits._
    var edges = (1L until 64L).map(i => (i + 1, i)).toDF("u", "v").localCheckpoint()
    var converged = false
    var rounds = 0
    while (!converged && rounds < 10) {
      val ss = smallStar(largeStar(edges)).localCheckpoint()
      converged = ss.except(edges).isEmpty && edges.except(ss).isEmpty
      edges = ss
      rounds += 1
    }
    assert(converged, "64-chain must converge within 10 star rounds")
    // fixpoint is the star: every node 2..64 points directly at 1
    val labels = edges.collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert((2L to 64L).forall(labels.get(_).contains(1L)))
  }

  test("ccUntil (the public convergence driver) matches union-find on the 64-chain") {
    // same property as the inlined loop above, through the REUSABLE
    // driver the l2_cc_star decl now delegates to — with the
    // materialize/release storage discipline the inlined test skips
    import spark.implicits._
    val pairs = (1L until 64L).map(i => (i, i + 1))
    val before = spark.sparkContext.getPersistentRDDs.size
    val (star, rounds) = graft.queries.Dedup.ccUntil(
      pairs.map { case (a, b) => (math.max(a, b), math.min(a, b)) }
        .toDF("u", "v"))
    assert(rounds <= 10, s"64-chain took $rounds rounds — not O(log² n)")
    assert(rounds > 1, "suspiciously instant convergence")
    val labels = star.collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val expect = unionFind((1L to 64L).toSeq, pairs)
    assert((1L to 64L).forall(n => labels.getOrElse(n, n) == expect(n)),
      s"ccUntil fixpoint diverges from union-find: $labels")
    // superseded frontiers are released: only the fixpoint edge set may
    // remain persisted
    val after = spark.sparkContext.getPersistentRDDs.size
    assert(after - before <= 1,
      s"ccUntil leaked persisted frontiers: $before -> $after")
  }
}
