package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** t-digest quantile sketch as a typed Spark `Aggregator` — the
  * bounded-memory, MERGEABLE percentile path for 100 TB (exact
  * `percentile` buffers every value per group; this keeps ≤ ~2·δ
  * centroids per partial buffer no matter how many rows stream through).
  *
  * Algorithm: Dunning & Ertl, "Computing Extremely Accurate Quantiles
  * Using t-Digests" (2019), with the k0 (uniform) scale function: sorted
  * centroids are greedily merged while each stays under capacity
  * `totalWeight / δ`. k0 gives uniform (not tail-weighted) accuracy —
  * ~0.5/δ rank error worst-case, plenty inside the 1% tolerance
  * contract the decls assert. Estimates depend on arrival/merge order
  * (like every t-digest); the decl contract absorbs that.
  *
  * Spark surface: partial aggregation happens in `reduce` on the
  * executors, partials ship as (means, weights) arrays and combine in
  * `merge` — the classic map-side-combine shape, identical to how HLL
  * sketches travel in a3_hll_merge.
  */
object TDigestAgg {

  /** δ (compression): max retained centroids ~ 2δ; rank error ~ 0.5/δ. */
  val Delta = 100

  /** Points buffered before an executor-side compress (amortizes sort). */
  private val BufCap = 512

  /** `pending` is a fixed-capacity scratch buffer filled to `nPending`
    * — appending a point is an O(1) in-place write + a small case-class
    * copy, NOT a full array copy per row (the buffer object lives
    * deserialized inside the hash map between rows; it only crosses the
    * wire at partial/final boundaries). */
  final case class TD(
      means: Array[Double],
      weights: Array[Double],
      pending: Array[Double],
      nPending: Int)

  private def compress(td: TD): TD = {
    val n = td.means.length + td.nPending
    if (n == 0) return TD(Array.empty, Array.empty, Array.empty, 0)
    // gather (mean, weight) pairs: existing centroids + pending points
    val ms = new Array[Double](n)
    val ws = new Array[Double](n)
    System.arraycopy(td.means, 0, ms, 0, td.means.length)
    System.arraycopy(td.weights, 0, ws, 0, td.means.length)
    var i = 0
    while (i < td.nPending) {
      ms(td.means.length + i) = td.pending(i)
      ws(td.means.length + i) = 1.0
      i += 1
    }
    // sort pairs by mean
    val idx = (0 until n).sortBy(ms(_)).toArray
    val total = ws.sum
    val cap = total / Delta // k0 scale: uniform centroid capacity
    val outM = new scala.collection.mutable.ArrayBuffer[Double](2 * Delta + 8)
    val outW = new scala.collection.mutable.ArrayBuffer[Double](2 * Delta + 8)
    var curM = ms(idx(0))
    var curW = ws(idx(0))
    i = 1
    while (i < n) {
      val m = ms(idx(i))
      val w = ws(idx(i))
      if (curW + w <= cap) { // merge into current centroid
        curM += (m - curM) * w / (curW + w)
        curW += w
      } else {
        outM += curM; outW += curW
        curM = m; curW = w
      }
      i += 1
    }
    outM += curM; outW += curW
    TD(outM.toArray, outW.toArray, Array.empty, 0)
  }

  /** Quantile by linear interpolation between centroid midpoints. */
  def quantile(td0: TD, q: Double): Double = {
    val td = compress(td0)
    val m = td.means; val w = td.weights
    if (m.isEmpty) return Double.NaN
    if (m.length == 1) return m(0)
    val total = w.sum
    val target = q * total
    // cumulative weight at centroid midpoints
    var cum = 0.0
    var i = 0
    while (i < m.length) {
      val mid = cum + w(i) / 2
      if (target < mid) {
        if (i == 0) return m(0)
        val prevMid = cum - w(i - 1) / 2
        val frac = (target - prevMid) / (mid - prevMid)
        return m(i - 1) + (m(i) - m(i - 1)) * math.max(0.0, math.min(1.0, frac))
      }
      cum += w(i)
      i += 1
    }
    m(m.length - 1)
  }

  /** Aggregator producing the q-quantile estimate of a Double column. */
  final case class TDigestQuantile(q: Double) extends Aggregator[Double, TD, Double] {
    override def zero: TD = TD(Array.empty, Array.empty, new Array[Double](BufCap), 0)

    override def reduce(b: TD, x: Double): TD = {
      val p = if (b.pending.length == 0) new Array[Double](BufCap) else b.pending
      p(b.nPending) = x
      if (b.nPending + 1 >= p.length)
        compress(TD(b.means, b.weights, p, b.nPending + 1))
      else TD(b.means, b.weights, p, b.nPending + 1)
    }

    override def merge(a: TD, b: TD): TD =
      compress(TD(
        a.means ++ b.means,
        a.weights ++ b.weights,
        a.pending.take(a.nPending) ++ b.pending.take(b.nPending),
        a.nPending + b.nPending))

    override def finish(r: TD): Double = quantile(r, q)

    override def bufferEncoder: Encoder[TD] = Encoders.product[TD]
    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }
}
