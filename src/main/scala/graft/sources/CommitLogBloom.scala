package graft.sources

/** Per-batch BLOOM FILTERS in commit manifests — the point-lookup
  * pruning modality (min, max) boxes cannot provide: a box orders
  * values, so it answers RANGE questions; an equality probe on a
  * string column (`WHERE event_type = 'purchase'`,
  * `WHERE doc_id IN (...)`) needs membership, and a per-batch bloom
  * answers "definitely absent" from manifest metadata alone — zero
  * data reads, the same plan-time economics as the stats boxes.
  *
  * Encoding: a fixed-width bitset, hex-encoded so it survives the
  * manifest's flat string grammar, built task-side as rows stream
  * through the sink and OR-merged at the driver (bloom union IS
  * bitwise OR — the same mergeability that makes it work across N
  * writer tasks with no coordination). k=4 probe positions by double
  * hashing (Kirsch–Mitzenmacher): h_i = h1 + i·h2 over murmur3 of the
  * UTF-8 bytes.
  *
  * Sizing (r16): AUTO by default — the false-positive rate
  * (1 − e^(−k·n/m))^k is a function of n/m, and a fixed m silently
  * saturates when batches grow (at sf1 a 2^18-bit filter over ~167k
  * ids reads FP ≈ 0.7: pruning dies with no error anywhere). The sink
  * cannot know n when the first row streams through, but publish
  * knows it EXACTLY (the same row counts S42 commits), so tasks build
  * at [[BuildBits]] — a width only the engine produces — and publish
  * FOLDS the merged filter down to [[sizeFor]](n): the smallest
  * power-of-two m with FP ≤ ~2% (k=4 ⇒ m ≈ 8.5·n), clamped to
  * [[[DefaultBits]], 2^20]. Folding in half ORs the upper half onto
  * the lower; positions are `h mod 2^a`, and `(h mod 2^a) mod 2^(a−1)
  * = h mod 2^(a−1)`, so the folded filter is BIT-IDENTICAL to one
  * built at the smaller width — fold-then-probe equals build-small.
  * An explicit `bloomBits` (≤ 2^20) keeps the fixed behavior as the
  * override dial. A saturated bloom never breaks correctness (a false
  * positive only reads a batch the residual filter then excludes); an
  * absent bloom never prunes. At 100 TB, blooms are the difference
  * between a needle-in-haystack key lookup scanning every batch and
  * scanning ~the one batch that holds it.
  */
object CommitLogBloom {

  /** Floor of the auto size; also the pre-r16 fixed default (4096
    * bits = 512 bytes of manifest per (batch, column), ~1% FP at
    * n ≈ 400). */
  val DefaultBits = 4096

  /** `bloomBits` sentinel: size from the batch's published row count. */
  val AutoBits = 0

  /** Task-side build width in auto mode — deliberately ABOVE the
    * explicit dial's 2^20 cap, so a merged filter of this width can
    * only mean "auto: fold me at publish". */
  val BuildBits = 1 << 21

  private val K = 4

  /** Width a task allocates for the given dial value. */
  def buildWidth(bloomBits: Int): Int =
    if (bloomBits == AutoBits) BuildBits else bloomBits

  /** Smallest power-of-two m holding n values at ≤ ~2% FP with k=4
    * (m ≈ 8.5·n), clamped to [DefaultBits, 2^20]. The cap keeps the
    * manifest bounded: past it FP degrades gracefully (2^20 over 167k
    * ids ≈ 5% — a point probe still plans ~1 batch of many). */
  def sizeFor(n: Long): Int = {
    val need = math.max(DefaultBits.toLong, math.ceil(n * 8.5).toLong)
    val cap = 1 << 20
    if (need >= cap) cap
    else java.lang.Long.highestOneBit(need - 1).toInt << 1
  }

  /** Fold a power-of-two filter down to `targetBits` by repeated
    * halving (see object doc for why this is exact). */
  def fold(bitset: Array[Long], targetBits: Int): Array[Long] = {
    val bits = bitset.length * 64
    require(Integer.bitCount(bits) == 1 && Integer.bitCount(targetBits) == 1 &&
      targetBits >= 64 && targetBits <= bits,
      s"can only fold a power-of-two bloom down: $bits -> $targetBits")
    var cur = bitset
    while (cur.length * 64 > targetBits) {
      val half = cur.length / 2
      val next = new Array[Long](half)
      var i = 0
      while (i < half) { next(i) = cur(i) | cur(i + half); i += 1 }
      cur = next
    }
    cur
  }

  /** Publish-side finalization: an auto-built (BuildBits-wide) merged
    * filter folds to the batch's exact-count size; a fixed-width one
    * passes through untouched. */
  def finalizeHex(merged: Array[Long], batchRows: Long): String =
    if (merged.length * 64 == BuildBits)
      toHex(fold(merged, sizeFor(batchRows)))
    else toHex(merged)

  /** Key grammar: a STRING column hashes its values verbatim; an
    * INTEGRAL column hashes the DECIMAL STRING of each value — the
    * one canonical text form writer and probe side derive
    * independently (the pushed literal for a BIGINT column is a Long;
    * `123L.toString == "123"` on both sides). Floats/decimals are
    * excluded: their text forms are not canonical across widths
    * (`1.0` vs `1.00`), and point lookups on them are rare anyway. */
  def bloomable(dt: org.apache.spark.sql.types.DataType): Boolean = {
    import org.apache.spark.sql.types._
    dt match {
      case StringType | LongType | IntegerType | ShortType | ByteType => true
      case _ => false
    }
  }

  def emptyBits(bits: Int): Array[Long] = {
    // explicit dial caps at 2^20; BuildBits (2^21) is the engine's own
    // auto-mode width and the only value allowed above the dial cap
    require(bits >= 64 && bits % 64 == 0 &&
      (bits <= (1 << 20) || bits == BuildBits),
      s"bloomBits must be a multiple of 64 in [64, 1M]: $bits")
    new Array[Long](bits / 64)
  }

  private def positions(value: String, bits: Int): Array[Int] = {
    val bytes = value.getBytes("UTF-8")
    val h1 = scala.util.hashing.MurmurHash3.bytesHash(bytes, 0x9747b28c)
    val h2 = scala.util.hashing.MurmurHash3.bytesHash(bytes, 0x85ebca6b) | 1
    Array.tabulate(K) { i =>
      val h = h1 + i * h2
      math.floorMod(h, bits)
    }
  }

  def add(bitset: Array[Long], value: String): Unit = {
    val bits = bitset.length * 64
    positions(value, bits).foreach { p =>
      bitset(p >> 6) |= (1L << (p & 63))
    }
  }

  /** Bitwise-OR merge (bloom union); widths must agree. */
  def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    require(a.length == b.length, "bloom widths must agree to merge")
    Array.tabulate(a.length)(i => a(i) | b(i))
  }

  def toHex(bitset: Array[Long]): String =
    bitset.map(w => f"$w%016x").mkString

  def fromHex(hex: String): Array[Long] = {
    require(hex.length % 16 == 0, s"bloom hex must be 16-aligned: ${hex.length}")
    Array.tabulate(hex.length / 16) { i =>
      java.lang.Long.parseUnsignedLong(hex.substring(i * 16, i * 16 + 16), 16)
    }
  }

  /** Membership probe against the hex-encoded bitset: false means the
    * value is DEFINITELY not in the batch (prune it); true means read
    * the batch and let the residual filter decide. */
  def mightContain(hex: String, value: String): Boolean = {
    val bits = (hex.length / 16) * 64
    val ps = positions(value, bits)
    ps.forall { p =>
      val w = java.lang.Long.parseUnsignedLong(
        hex.substring((p >> 6) * 16, (p >> 6) * 16 + 16), 16)
      (w & (1L << (p & 63))) != 0L
    }
  }
}
