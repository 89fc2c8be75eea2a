package graft

import graft.operators.KMeansLloyd
import graft.queries.Qh
import org.scalatest.funsuite.AnyFunSuite

/** Lloyd's algorithm invariants that the hash oracle can't see:
  * monotone SSE descent, full cluster survival on this data, and
  * repeat-run determinism of the trained model itself. */
class KMeansSpec extends AnyFunSuite with SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("each Lloyd iteration monotonically reduces SSE") {
    val e = Qh.t(spark, dir, "embeddings").select("vec_id", "embedding")
    val c0 = KMeansLloyd.initByIds(e, 8)
    val c1 = KMeansLloyd.step(e, c0)
    val c2 = KMeansLloyd.step(e, c1)
    val s0 = KMeansLloyd.sse(e, c0)
    val s1 = KMeansLloyd.sse(e, c1)
    val s2 = KMeansLloyd.sse(e, c2)
    // tiny relative tolerance: centroids are fixed-point-rounded means
    // (not exact minimizers) and sse() is an unordered double sum, so
    // exact Lloyd monotonicity can miss by ulp-scale noise
    assert(s1 <= s0 * (1 + 1e-9), s"step 1 must not increase SSE: $s1 > $s0")
    assert(s2 <= s1 * (1 + 1e-9), s"step 2 must not increase SSE: $s2 > $s1")
    // means strictly improve on a by-id init over random-ish data
    assert(s1 < s0 * 0.999, s"step 1 barely moved: $s1 vs $s0")
  }

  test("convergence mode stops at a fixed point within the cap") {
    val e = Qh.t(spark, dir, "embeddings").select("vec_id", "embedding")
    val (model, iters) = KMeansLloyd.fitUntil(
      e, KMeansLloyd.initByIds(e, 8), maxIters = 50, tolFp = 100L)
    assert(iters < 50, s"did not converge within the cap ($iters iterations)")
    assert(iters > 1, "suspiciously instant convergence")
    // converged means one more step moves no centroid element > tol
    val d = KMeansLloyd.deltaFp(KMeansLloyd.step(e, model), model)
    assert(d <= 100L, s"reported converged but next step moves $d")
    assert(model.size == 8)
  }

  test("all 8 clusters survive and every vector is assigned") {
    val e = Qh.t(spark, dir, "embeddings").select("vec_id", "embedding")
    val cents = KMeansLloyd.fit(e, KMeansLloyd.initByIds(e, 8), 2)
    assert(cents.size == 8)
    assert(cents.forall(_._2.size == 64))
    val a = KMeansLloyd.assign(e, cents)
    assert(a.filter(a("cid") === -1).count() == 0L)
    assert(a.select("cid").distinct().count() == 8L)
    assert(a.count() == e.count())
  }

  test("training is deterministic across runs (model params bit-equal)") {
    val e = Qh.t(spark, dir, "embeddings").select("vec_id", "embedding")
    val runA = KMeansLloyd.fit(e, KMeansLloyd.initByIds(e, 8), 2)
    val runB = KMeansLloyd.fit(e, KMeansLloyd.initByIds(e, 8), 2)
    assert(runA == runB)
  }
}
