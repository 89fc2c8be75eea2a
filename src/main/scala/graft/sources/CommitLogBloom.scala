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
  * Sizing is the caller's dial (`bloomBits`, default 4096 = 512 bytes
  * of manifest per (batch, column)): false-positive rate ≈
  * (1 − e^(−k·n/m))^k — at the default, ~1% for n ≈ 400 distinct
  * values per batch. A saturated bloom never breaks correctness (a
  * false positive only reads a batch the residual filter then
  * excludes); an absent bloom never prunes. At 100 TB, blooms are the
  * difference between a needle-in-haystack key lookup scanning every
  * batch and scanning ~the one batch that holds it.
  */
object CommitLogBloom {

  val DefaultBits = 4096
  private val K = 4

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
    require(bits >= 64 && bits % 64 == 0 && bits <= (1 << 20),
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
