package graft

import graft.functions.TDigestAgg
import graft.functions.TDigestAgg.{TD, TDigestQuantile}
import org.apache.spark.sql.functions._

/** Accuracy + mergeability contract of the custom t-digest sketch. */
class TDigestAggSpec extends SparkSpec {

  private def direct(xs: Seq[Double], q: Double): Double = {
    val agg = TDigestQuantile(q)
    val buf = xs.foldLeft(agg.zero)(agg.reduce)
    agg.finish(buf)
  }

  test("p50/p95 of 1..10000 within 1% of exact") {
    val xs = (1 to 10000).map(_.toDouble)
    assert(math.abs(direct(xs, 0.5) - 5000.0) <= 60.0)
    assert(math.abs(direct(xs, 0.95) - 9500.0) <= 110.0)
  }

  test("merging disjoint halves ~ digesting the whole") {
    val agg = TDigestQuantile(0.5)
    val lo = (1 to 5000).map(_.toDouble).foldLeft(agg.zero)(agg.reduce)
    val hi = (5001 to 10000).map(_.toDouble).foldLeft(agg.zero)(agg.reduce)
    val merged = agg.finish(agg.merge(lo, hi))
    assert(math.abs(merged - 5000.0) <= 60.0, s"merged p50 = $merged")
  }

  test("estimate is partitioning-insensitive within tolerance (udaf on a DataFrame)") {
    import spark.implicits._
    val td = udaf(TDigestQuantile(0.5))
    val exact = 5000.5
    for (parts <- Seq(1, 4, 32)) {
      val est = (1 to 10000).map(_.toDouble).toDF("x")
        .repartition(parts)
        .agg(td($"x")).head.getDouble(0)
      assert(math.abs(est - exact) <= exact * 0.01,
        s"p50 with $parts partitions = $est")
    }
  }

  test("buffer stays bounded: 100k points never exceed ~2*delta centroids") {
    val agg = TDigestQuantile(0.5)
    val buf = (1 to 100000).map(_.toDouble).foldLeft(agg.zero)(agg.reduce)
    val compact = agg.merge(buf, agg.zero) // forces a final compress
    assert(compact.means.length <= 2 * TDigestAgg.Delta + 8,
      s"${compact.means.length} centroids retained")
    assert(compact.pending.isEmpty)
  }

  test("empty and single-value digests") {
    val agg = TDigestQuantile(0.5)
    assert(agg.finish(agg.zero).isNaN)
    assert(agg.finish(agg.reduce(agg.zero, 42.0)) == 42.0)
  }
}
