package graft.sources

/** Per-batch per-column NDV SKETCHES in commit manifests — the
  * distinct-count facet the CBO column statistics (SURVEY S76) need:
  * Spark's `FilterEstimation` refuses to range-estimate a predicate
  * unless the column carries a `distinctCount`, so boxes and null
  * counts alone leave the CBO blind on commitlog tables.
  *
  * The sketch is a dense HyperLogLog (Flajolet et al. 2007) with
  * [[M]] = 64 single-byte registers — deliberately TINY (64 bytes =
  * 128 manifest hex chars per (batch, column), ~13% standard error),
  * because its only consumer is cardinality ESTIMATION: the CBO wants
  * the order of magnitude, never a correct answer, and a manifest
  * line must stay bounded on a 1000-column table. Always on: the
  * per-row cost is one 64-bit mix per non-null value, the same order
  * the declared-bloom path already pays.
  *
  * Mergeability is the point (like the blooms): the union sketch is
  * the element-wise register MAX, so task sketches merge at publish
  * with no coordination, batch sketches merge at PLAN time into a
  * whole-table (or surviving-subset — the facet is pruning-aware)
  * estimate, and the OPTIMIZE pack merges its sources' sketches
  * instead of dropping the facet. A REORG purge carries the source
  * sketch unchanged: the rewrite holds a row SUBSET, so the carried
  * estimate only over-reports — for estimation that is the safe
  * direction (equality selectivity 1/ndv under-counts).
  *
  * Hashing: murmur-style fmix64 over the value's canonical 64-bit
  * form (longs as-is; doubles by bit pattern with -0.0/NaN
  * normalized; strings/bytes via two seeded 32-bit murmurs packed).
  * Consistency only matters WITHIN the engine — the sketch never
  * faces an oracle. */
object CommitLogNdv {

  /** Register count (2^P). 64 bytes/sketch, σ ≈ 1.04/√64 ≈ 13%. */
  val M = 64
  private val P = 6
  private val Alpha = 0.709 // α_64 (Flajolet et al., table for m=64)

  def empty(): Array[Byte] = new Array[Byte](M)

  /** Murmur3's 64-bit finalizer — full avalanche over one long. */
  def fmix64(v0: Long): Long = {
    var v = v0
    v ^= v >>> 33
    v *= 0xff51afd7ed558ccdL
    v ^= v >>> 33
    v *= 0xc4ceb9fe1a85ec53L
    v ^= v >>> 33
    v
  }

  def hashLong(v: Long): Long = fmix64(v ^ 0x9e3779b97f4a7c15L)

  def hashDouble(v0: Double): Long = {
    // one canonical pattern per VALUE: -0.0 == 0.0 and every NaN is
    // "the" NaN, matching SQL DISTINCT semantics close enough for an
    // estimator
    val v = if (v0.isNaN) Double.NaN else if (v0 == 0.0d) 0.0d else v0
    hashLong(java.lang.Double.doubleToLongBits(v))
  }

  def hashBytes(b: Array[Byte]): Long = {
    val h1 = scala.util.hashing.MurmurHash3.bytesHash(b, 0x9747b28c)
    val h2 = scala.util.hashing.MurmurHash3.bytesHash(b, 0x85ebca6b)
    fmix64((h1.toLong << 32) | (h2.toLong & 0xffffffffL))
  }

  /** Zero-copy string hash for the write hot path: UTF8String's own
    * hashCode is a single-pass murmur3 over the bytes; packing it
    * with the length and avalanching gives 64 usable bits. Residual
    * 32-bit collisions (same murmur AND same length) are far below
    * the sketch's own 13% error. */
  def hashUTF8(v: org.apache.spark.unsafe.types.UTF8String): Long =
    fmix64((v.hashCode().toLong << 32) | (v.numBytes().toLong & 0xffffffffL))

  /** Observe one hashed value: register = top P bits, rank = leading
    * zeros of the remaining bits + 1 (capped so it fits the byte). */
  def add(regs: Array[Byte], hash: Long): Unit = {
    val idx = (hash >>> (64 - P)).toInt
    val w = hash << P
    val rank = (if (w == 0L) 64 - P else java.lang.Long.numberOfLeadingZeros(w)) + 1
    if (rank > regs(idx)) regs(idx) = rank.toByte
  }

  /** Union = element-wise max (fresh array — sketches in manifests
    * and messages are treated as immutable). */
  def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    val out = new Array[Byte](M)
    var i = 0
    while (i < M) {
      out(i) = if (a(i) >= b(i)) a(i) else b(i)
      i += 1
    }
    out
  }

  /** The HLL estimate with the small-range (linear counting)
    * correction; the 64-bit-hash large-range correction is moot. */
  def estimate(regs: Array[Byte]): Double = {
    var sum = 0.0
    var zeros = 0
    var i = 0
    while (i < M) {
      sum += java.lang.Math.scalb(1.0, -regs(i))
      if (regs(i) == 0) zeros += 1
      i += 1
    }
    val raw = Alpha * M * M / sum
    if (raw <= 2.5 * M && zeros > 0) M * math.log(M.toDouble / zeros)
    else raw
  }
}
