package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: `intersect_count(array, array)` ≡
  * `size(array_intersect(a, b))`, i.e. |set(a) ∩ set(b)| (null elements
  * follow array_intersect: a null present on BOTH sides counts once).
  *
  * The r16 optimization behind the L2 pair-verify stages: the
  * `size(array_intersect(...))` idiom allocates a generic hash set AND
  * materializes the full intersection array per evaluation — and
  * because the Jaccard predicate is pushed into the candidate join's
  * condition, Catalyst evaluates it up to four times per candidate
  * (condition numerator/denominator + projection). This expression
  * returns the COUNT alone: one tight primitive-typed probe loop, no
  * output array, no boxing for BIGINT elements (open-addressed long
  * set), making even the duplicated evaluations cheap.
  *
  * Exactness contract (the decl hashes must not move): for any inputs,
  * `intersect_count(a, b) == size(array_intersect(a, b))` — set
  * semantics, duplicate elements counted once, null-element handling
  * identical. IntersectCountSpec property-checks this equivalence.
  *
  * Supported element types: the ones the dedup family uses — BIGINT
  * (gram codes) and STRING (shingles). Anything else is refused at
  * analysis time; fall back to array_intersect there.
  */
case class IntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def nullIntolerant: Boolean = true
  override def dataType: DataType = IntegerType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (ArrayType(StringType, _), ArrayType(StringType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"intersect_count expects matching array<bigint> or array<string>, " +
            s"got (${l.catalogString}, ${r.catalogString})")
    }
  }

  private lazy val isLong: Boolean =
    left.dataType.asInstanceOf[ArrayType].elementType == LongType

  /** Entry point shared by interpreted eval and codegen (the generated
    * code makes ONE call per row; the loops run inside). */
  def count(a: ArrayData, b: ArrayData): Int =
    if (isLong) IntersectCount.countLong(a, b)
    else IntersectCount.countString(a, b)

  override def nullSafeEval(a: Any, b: Any): Any =
    count(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("intersectCount", this,
      classOf[IntersectCount].getName)
    nullSafeCodeGen(ctx, ev, (x, y) => s"${ev.value} = $ref.count($x, $y);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): IntersectCount =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "intersect_count"
}

object IntersectCount {

  /** |set(a) ∩ set(b)| over BIGINT arrays: open-addressed long set
    * built from the SMALLER side (set intersection is symmetric), then
    * a probe pass that marks each set slot at most once — duplicates on
    * either side count once, exactly like array_intersect. */
  private[functions] def countLong(a0: ArrayData, b0: ArrayData): Int = {
    val (build, probe) =
      if (a0.numElements() <= b0.numElements()) (a0, b0) else (b0, a0)
    val n = build.numElements()
    var cap = 8
    while (cap < (n << 1)) cap <<= 1
    val mask = cap - 1
    val keys = new Array[Long](cap)
    val used = new Array[Byte](cap) // 0 empty, 1 present, 2 matched
    var buildHasNull = false
    var i = 0
    while (i < n) {
      if (build.isNullAt(i)) buildHasNull = true
      else {
        val v = build.getLong(i)
        var s = scramble(v) & mask
        var done = false
        while (!done) {
          if (used(s) == 0) { keys(s) = v; used(s) = 1; done = true }
          else if (keys(s) == v) done = true // duplicate in build side
          else s = (s + 1) & mask
        }
      }
      i += 1
    }
    var cnt = 0
    var probeHasNull = false
    val m = probe.numElements()
    i = 0
    while (i < m) {
      if (probe.isNullAt(i)) probeHasNull = true
      else {
        val v = probe.getLong(i)
        var s = scramble(v) & mask
        var done = false
        while (!done) {
          if (used(s) == 0) done = true // not in build side
          else if (keys(s) == v) {
            if (used(s) == 1) { used(s) = 2; cnt += 1 }
            done = true
          } else s = (s + 1) & mask
        }
      }
      i += 1
    }
    if (buildHasNull && probeHasNull) cnt += 1
    cnt
  }

  /** fmix64-style finalizer — spreads consecutive gram codes across the
    * table (identity hashing would cluster them into long probe runs). */
  private def scramble(v0: Long): Int = {
    var v = v0
    v ^= v >>> 33
    v *= 0xff51afd7ed558ccdL
    v ^= v >>> 33
    (v & 0x7fffffff).toInt
  }

  /** |set(a) ∩ set(b)| over STRING arrays: one HashMap build from the
    * smaller side (UTF8String views — zero copies), probe marks each
    * entry at most once. Still allocation-lighter than array_intersect,
    * which additionally materializes the intersection array. */
  private[functions] def countString(a0: ArrayData, b0: ArrayData): Int = {
    val (build, probe) =
      if (a0.numElements() <= b0.numElements()) (a0, b0) else (b0, a0)
    val n = build.numElements()
    val set = new java.util.HashMap[UTF8String, java.lang.Boolean](n * 2)
    var buildHasNull = false
    var i = 0
    while (i < n) {
      if (build.isNullAt(i)) buildHasNull = true
      else set.putIfAbsent(build.getUTF8String(i), java.lang.Boolean.FALSE)
      i += 1
    }
    var cnt = 0
    var probeHasNull = false
    val m = probe.numElements()
    i = 0
    while (i < m) {
      if (probe.isNullAt(i)) probeHasNull = true
      else {
        val v = probe.getUTF8String(i)
        val cur = set.get(v)
        if (cur != null && !cur.booleanValue()) {
          set.put(v, java.lang.Boolean.TRUE)
          cnt += 1
        }
      }
      i += 1
    }
    if (buildHasNull && probeHasNull) cnt += 1
    cnt
  }
}
