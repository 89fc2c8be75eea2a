package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Misra–Gries frequent-items summary as a typed `Aggregator` — the
  * third mergeable sketch in the engine's aggregation toolkit (HLL for
  * distincts, t-digest for quantiles, MG for heavy hitters). At 100 TB
  * an exact term-frequency top-k needs a full (term, count) shuffle;
  * the MG summary is O(capacity) memory per partial, merges
  * associatively (Agarwal et al., "Mergeable Summaries", PODS 2012),
  * and guarantees every true heavy hitter with frequency > n/capacity
  * survives, with counts undercounted by at most n/capacity.
  *
  * Buffer is parallel (terms, counts) arrays (encoder-friendly); the
  * per-row hit path is a hash-map lookup built lazily per partial.
  */
object FreqItemsAgg {

  final case class MG(terms: Array[String], counts: Array[Long])

  /** MG merge: sum counters, keep the top `cap` by count, subtract the
    * (cap+1)-th count from survivors (the mergeable-summaries rule),
    * drop non-positive. */
  private def compress(pairs: Seq[(String, Long)], cap: Int): MG = {
    val sorted = pairs.sortBy { case (t, c) => (-c, t) }
    if (sorted.length <= cap) {
      val kept = sorted
      MG(kept.map(_._1).toArray, kept.map(_._2).toArray)
    } else {
      val cut = sorted(cap)._2
      val kept = sorted.take(cap).map { case (t, c) => (t, c - cut) }
        .filter(_._2 > 0)
      MG(kept.map(_._1).toArray, kept.map(_._2).toArray)
    }
  }

  /** Top-k heavy hitters of a string column: returns the k most
    * frequent terms (count desc, term asc) estimated by an MG summary
    * of the given capacity. */
  final case class MgTopK(capacity: Int, k: Int)
      extends Aggregator[String, MG, Array[String]] {
    require(capacity >= k && k >= 1, s"need capacity >= k >= 1, got ($capacity, $k)")

    override def zero: MG = MG(Array.empty, Array.empty)

    override def reduce(b: MG, term: String): MG = {
      if (term == null) return b
      val i = b.terms.indexOf(term)
      if (i >= 0) { b.counts(i) += 1; b } // in-place: object buffer
      else if (b.terms.length < capacity)
        MG(b.terms :+ term, b.counts :+ 1L)
      else {
        // MG decrement step: all counters down by one, drop zeros, and
        // the incoming term is absorbed by the decrement
        val kept = (b.terms.lazyZip(b.counts))
          .map((t, c) => (t, c - 1)).filter(_._2 > 0)
        MG(kept.map(_._1).toArray, kept.map(_._2).toArray)
      }
    }

    override def merge(a: MG, b: MG): MG = {
      val m = scala.collection.mutable.LinkedHashMap[String, Long]()
      a.terms.indices.foreach(i => m(a.terms(i)) = m.getOrElse(a.terms(i), 0L) + a.counts(i))
      b.terms.indices.foreach(i => m(b.terms(i)) = m.getOrElse(b.terms(i), 0L) + b.counts(i))
      compress(m.toSeq, capacity)
    }

    override def finish(r: MG): Array[String] =
      r.terms.indices
        .sortBy(i => (-r.counts(i), r.terms(i)))
        .take(k)
        .map(r.terms(_))
        .toArray

    override def bufferEncoder: Encoder[MG] = Encoders.product[MG]
    override def outputEncoder: Encoder[Array[String]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[String]]()
  }
}
