package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native forms of the engine's portable 32-bit hash (Qh.phash
  * contract: `conv(substring(md5(concat(s, '#seed')), 1+8j, 8), 16, 10)`
  * — the first/j-th big-endian 32-bit word of MD5(s ++ "#seed")).
  *
  * The SQL formula pays, per evaluation: a concat allocation, the full
  * 32-char hex encoding, a substring, and a base-16 string parse. These
  * expressions produce the IDENTICAL value straight from the digest
  * bytes (equality is property-tested in PortableHashSpec), which
  * matters because the hash sits in the innermost loop of the minhash /
  * simhash / fingerprint family — millions of evaluations per scan.
  * DuckDB oracles keep stating the hex-parse formula; only the engine
  * side switches.
  */
object PortableHash {
  private val md = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  // tiny cache of "#seed" suffix bytes (seeds are small literals)
  private val suffixes = new java.util.concurrent.ConcurrentHashMap[Int, Array[Byte]]()
  private def suffix(seed: Int): Array[Byte] =
    suffixes.computeIfAbsent(seed, s => s"#$s".getBytes("UTF-8"))

  def digest(s: UTF8String, seed: Int): Array[Byte] = {
    val d = md.get()
    d.reset()
    d.update(s.getBytes)
    d.update(suffix(seed))
    d.digest()
  }

  /** Big-endian unsigned word j of the 16-byte digest, as a Long —
    * exactly what base-16-parsing hex chars [8j+1, 8j+8] yields. */
  def word(d: Array[Byte], j: Int): Long =
    ((d(4 * j) & 0xffL) << 24) |
      ((d(4 * j + 1) & 0xffL) << 16) |
      ((d(4 * j + 2) & 0xffL) << 8) |
      (d(4 * j + 3) & 0xffL)

  def prefix(s: UTF8String, seed: Int): Long = word(digest(s, seed), 0)

  def words(s: UTF8String, seed: Int): GenericArrayData = {
    val d = digest(s, seed)
    new GenericArrayData(Array(word(d, 0), word(d, 1), word(d, 2), word(d, 3)))
  }
}

/** `md5_prefix32(str, seed)` ≡ Qh.phash — first MD5 word as Long. */
case class Md5Prefix32(child: Expression, seed: Int) extends UnaryExpression {
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = LongType
  def inputTypes: Seq[DataType] = Seq(StringType)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case _: StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"md5_prefix32 expects string, got ${t.catalogString}")
    }

  override def nullSafeEval(s: Any): Any =
    PortableHash.prefix(s.asInstanceOf[UTF8String], seed)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.PortableHash.prefix($c, $seed)")

  override protected def withNewChildInternal(newChild: Expression): Md5Prefix32 =
    copy(child = newChild)

  override def prettyName: String = "md5_prefix32"
}

/** `bin_word32(bin, pos)` ≡ `conv(hex(substring(bin, pos+1, 4)), 16,
  * 10)` — the big-endian word of up to 4 bytes at 0-based `pos` of a
  * BINARY column, without the hex encode + base-16 parse. Sits in the
  * innermost loop of the n-gram family (one evaluation per character
  * position of every document). */
case class BinWord32(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = LongType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, IntegerType | LongType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"bin_word32 expects (binary, int), got (${l.catalogString}, ${r.catalogString})")
    }

  override def nullSafeEval(b: Any, p: Any): Any =
    BinWord32.word(b.asInstanceOf[Array[Byte]],
      p.asInstanceOf[Number].intValue())

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (b, p) => s"graft.functions.BinWord32.word($b, (int)($p))")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BinWord32 =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "bin_word32"
}

object BinWord32 {
  /** Big-endian fold of up to 4 bytes from `pos` — exactly what
    * hex-encoding that slice and parsing base-16 yields (short slices
    * near the end of the buffer fold fewer bytes, like substring). */
  def word(bytes: Array[Byte], pos: Int): Long = {
    var v = 0L
    var i = math.max(pos, 0)
    val end = math.min(bytes.length, pos + 4)
    while (i < end) {
      v = (v << 8) | (bytes(i) & 0xffL)
      i += 1
    }
    v
  }
}

/** `md5_words32(str, seed)` — all four MD5 words as array<long>; one
  * digest yields four independent 32-bit hash families (the minhash
  * trick: 8 signatures from 2 digests). */
case class Md5Words32(child: Expression, seed: Int) extends UnaryExpression {
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  def inputTypes: Seq[DataType] = Seq(StringType)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case _: StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"md5_words32 expects string, got ${t.catalogString}")
    }

  override def nullSafeEval(s: Any): Any =
    PortableHash.words(s.asInstanceOf[UTF8String], seed)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.PortableHash.words($c, $seed)")

  override protected def withNewChildInternal(newChild: Expression): Md5Words32 =
    copy(child = newChild)

  override def prettyName: String = "md5_words32"
}
