package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed `Aggregator` computing an 8-slot MinHash signature in ONE pass
  * over exploded (doc, hash-pair) rows — the SURVEY §2.B "typed UDAF"
  * surface. Input is the two 32-bit hashes per shingle (from the md5
  * digest slices, see [[graft.queries.Dedup]]); the buffer keeps the
  * running minimum per derived hash slot.
  *
  * Semantically identical to the expression-based `l2_minhash_sigs`
  * decl (asserted in MinHashAggSpec); the Aggregator form is the shape
  * you reach for when the signature update logic outgrows what
  * expressions can say (weighted minhash, b-bit packing, HLL-style
  * registers). Merge is elementwise min — associative and commutative,
  * so partial aggregation works map-side like any built-in agg.
  */
object MinHashAgg {

  /** (h0, h1): the two md5-slice hash values for one shingle, each
    * carrying 4 independent 32-bit slices packed by the caller. */
  final case class ShingleHashes(s: Array[Long])

  val NSlots = 8

  val agg: Aggregator[ShingleHashes, Array[Long], Array[Long]] =
    new Aggregator[ShingleHashes, Array[Long], Array[Long]] {
      override def zero: Array[Long] = Array.fill(NSlots)(Long.MaxValue)

      override def reduce(buf: Array[Long], in: ShingleHashes): Array[Long] = {
        var i = 0
        while (i < NSlots) {
          if (in.s(i) < buf(i)) buf(i) = in.s(i)
          i += 1
        }
        buf
      }

      override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
        var i = 0
        while (i < NSlots) {
          if (b(i) < a(i)) a(i) = b(i)
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
