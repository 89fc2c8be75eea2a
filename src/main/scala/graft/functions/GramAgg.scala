package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** One-pass EXACT Gram-matrix accumulation over an embedding column —
  * the distributed half of PCA/covariance/whitening: buffer = the
  * dim×dim upper-left-ordered cell array of fixed-point BIGINT sums
  * `Σ_rows floor(e_i · e_j · 1e12 + 0.5)`. Quantizing each per-row
  * product before summing makes the aggregate shuffle-order-proof and
  * cross-engine exact (the w9/kmeans integer discipline applied to a
  * matrix); merge is elementwise add, so partials combine map-side
  * like any built-in agg and the shuffle payload is CONSTANT (d² longs
  * per partition) no matter the corpus size — the covariance shape
  * every distributed PCA uses. At 64 dims the buffer is 4 KB; headroom:
  * |product| ≤ 1 ⇒ cell increments ≤ 1e12, so ~9×10⁶ billion rows fit
  * in the BIGINT before overflow (swap to DECIMAL partials beyond).
  */
object GramAgg {

  val Dim = 64

  val agg: Aggregator[Array[Float], Array[Long], Array[Long]] =
    new Aggregator[Array[Float], Array[Long], Array[Long]] {
      override def zero: Array[Long] = new Array[Long](Dim * Dim)

      override def reduce(buf: Array[Long], e: Array[Float]): Array[Long] = {
        var i = 0
        while (i < Dim) {
          val ei = e(i).toDouble
          var j = 0
          while (j < Dim) {
            // same expression text as the oracle: (e_i * e_j * 1e12) + 0.5
            buf(i * Dim + j) += math.floor(ei * e(j).toDouble * 1e12 + 0.5).toLong
            j += 1
          }
          i += 1
        }
        buf
      }

      override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
        var i = 0
        while (i < Dim * Dim) {
          a(i) += b(i)
          i += 1
        }
        a
      }

      override def finish(buf: Array[Long]): Array[Long] = buf
      override def bufferEncoder: Encoder[Array[Long]] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
      override def outputEncoder: Encoder[Array[Long]] = bufferEncoder
    }
}
