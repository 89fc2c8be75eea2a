package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Morton (Z-order) keys for multi-dimensional data clustering.
  *
  * Writing a table sorted by the bit-interleaving of two dimensions
  * packs each output file into a compact sub-rectangle of the 2-D key
  * space, so a conjunctive range predicate on EITHER or BOTH dimensions
  * skips most files on their parquet column min/max statistics. A
  * linear sort only ever clusters its leading column: a predicate on
  * the second dimension must open every file. This is the published
  * layout technique behind Delta Lake's `OPTIMIZE ... ZORDER BY` and
  * Iceberg's z-order sort strategy (Morton 1966, "A computer oriented
  * geodetic data base and a new technique in file sequencing").
  *
  * Everything here is a composition of BUILT-IN codegen'd expressions
  * (`shiftleft`/`&`/`|`/arithmetic) — the key computation stays inside
  * whole-stage codegen with no UDF boundary, so the layout build is a
  * narrow map over the scan at any scale. Bit-equality of
  * [[interleave]] against a bit-twiddling Scala model is
  * property-tested in ZOrderSpec.
  *
  * Relation to the reference: the reference's MongoDB collections are
  * accessed by single-key `_id` lookups (kafka-database-import.go:149-170);
  * at warehouse scale the analogous access path is min/max file
  * skipping, which this layout makes effective for more than one
  * predicate column at once.
  */
object ZOrder {

  /** Spread the low 32 bits of `x` (a LongType column) so that input
    * bit i lands at output bit 2i; output bits 2i+1 are zero. The
    * classic 5-step mask-shift sequence — each step is a builtin
    * `shiftleft`/`|`/`&`, all codegen'd.
    */
  def spread32(x: Column): Column = {
    var v = x.bitwiseAND(lit(0xFFFFFFFFL))
    v = v.bitwiseOR(shiftleft(v, 16)).bitwiseAND(lit(0x0000FFFF0000FFFFL))
    v = v.bitwiseOR(shiftleft(v, 8)).bitwiseAND(lit(0x00FF00FF00FF00FFL))
    v = v.bitwiseOR(shiftleft(v, 4)).bitwiseAND(lit(0x0F0F0F0F0F0F0F0FL))
    v = v.bitwiseOR(shiftleft(v, 2)).bitwiseAND(lit(0x3333333333333333L))
    v.bitwiseOR(shiftleft(v, 1)).bitwiseAND(lit(0x5555555555555555L))
  }

  /** 64-bit Morton key of two 32-bit dimensions: bit i of `a` at output
    * bit 2i, bit i of `b` at output bit 2i+1 (`b` is the "major-er"
    * dimension only in the tie sense — the curve treats both evenly).
    */
  def interleave(a: Column, b: Column): Column =
    spread32(a).bitwiseOR(shiftleft(spread32(b), 1))

  /** Map a numeric column onto a `bits`-wide integer grid via min/max
    * scaling: `floor((x - min) * 2^bits / span)`, clamped into
    * [0, 2^bits). Interleaving grid CELLS (not raw values) keeps the
    * curve balanced when the dimensions have very different ranges —
    * the same reason Delta/Iceberg z-order on range-quantized values.
    * `cMin`/`cMax` are columns (typically min/max aggregates joined in
    * by a broadcast — one cheap extra pass, the layout-build analogue
    * of the range-partition sampling every sorted write already does).
    */
  def gridCell(x: Column, cMin: Column, cMax: Column, bits: Int): Column = {
    require(bits > 0 && bits <= 32, s"grid width must be 1..32 bits, got $bits")
    val cells = 1L << bits
    val span = cMax.cast("double") - cMin.cast("double")
    val raw = floor((x.cast("double") - cMin.cast("double")) * cells / (span + lit(1e-9)))
    greatest(lit(0L), least(lit(cells - 1), raw.cast("long")))
  }
}
