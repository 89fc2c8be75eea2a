package graft.functions

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expression: `cosine_sim(array<float>, array<float>)`.
  *
  * The SURVEY §4 performance path for L3: a single fused pass computing
  * dot(a,b), dot(a,a), dot(b,b) with whole-stage codegen — replaces
  * three interpreted `aggregate(zip_with(...))` higher-order folds
  * (~6× less work per pair and no lambda-interpretation overhead).
  *
  * Numeric contract: accumulation is left-to-right in double, exactly
  * like the HOF fold it replaces and like the oracle's `list_reduce`
  * fold ([[graft.queries.Qh.oDot]]), so results are bit-identical and
  * the DuckDB hash-compare still holds.
  *
  * Registered through [[GraftExtensions]] (SparkSessionExtensions
  * .injectFunction) — the idiomatic injection point; no planner surgery.
  */
case class CosineSim(left: Expression, right: Expression)
    extends BinaryExpression {

  override def nullIntolerant: Boolean = true
  override def dataType: DataType = DoubleType
  def inputTypes: Seq[DataType] =
    Seq(ArrayType(FloatType), ArrayType(FloatType))

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"cosine_sim expects (array<float>, array<float>), got " +
          s"(${left.dataType.catalogString}, ${right.dataType.catalogString})")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      val xi = x.getFloat(i).toDouble
      val yi = y.getFloat(i).toDouble
      dot += xi * yi
      na += xi * xi
      nb += yi * yi
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi")
      s"""
         |int $n = java.lang.Math.min($x.numElements(), $y.numElements());
         |double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $xi = (double) $x.getFloat($i);
         |  double $yi = (double) $y.getFloat($i);
         |  $dot += $xi * $yi; $na += $xi * $xi; $nb += $yi * $yi;
         |}
         |${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSim =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "cosine_sim"
}

/** Dot product companion (same fused-loop design), for pipelines that
  * need the raw dot (e.g. pre-normalized vectors). */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def nullIntolerant: Boolean = true
  override def dataType: DataType = DoubleType

  // same contract as CosineSim: getFloat on an array<double> would read
  // 4 bytes of each 8-byte slot — silently wrong numbers, so reject at
  // analysis time instead
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"dot_product expects (array<float>, array<float>), got " +
          s"(${left.dataType.catalogString}, ${right.dataType.catalogString})")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0
    var i = 0
    while (i < n) {
      dot += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    dot
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      s"""
         |int $n = java.lang.Math.min($x.numElements(), $y.numElements());
         |double $dot = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $dot += (double) $x.getFloat($i) * (double) $y.getFloat($i);
         |}
         |${ev.value} = $dot;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "dot_product"
}

/** Squared L2 distance companion — same fused-loop design, same
  * left-to-right double accumulation as the oracle's `list_reduce`
  * fold, so PQ code assignments agree bit-for-bit cross-engine. */
case class L2Sq(left: Expression, right: Expression)
    extends BinaryExpression {

  override def nullIntolerant: Boolean = true
  override def dataType: DataType = DoubleType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"l2_sq expects (array<float>, array<float>), got " +
          s"(${left.dataType.catalogString}, ${right.dataType.catalogString})")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      val d = x.getFloat(i).toDouble - y.getFloat(i).toDouble
      acc += d * d
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val d = ctx.freshName("d")
      s"""
         |int $n = java.lang.Math.min($x.numElements(), $y.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $d = (double) $x.getFloat($i) - (double) $y.getFloat($i);
         |  $acc += $d * $d;
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): L2Sq =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "l2_sq"
}

/** `l2_sq_at(x, y, offset)` ≡ `l2_sq(slice(x, offset+1, len(y)), y)`
  * without materializing the slice — the inner loop reads
  * `x[offset+i]` directly. The PQ encode evaluates 128 subvector
  * distances per row; slicing would allocate 128 arrays per row. */
case class L2SqAt(first: Expression, second: Expression, third: Expression)
    extends org.apache.spark.sql.catalyst.expressions.TernaryExpression {

  override def nullIntolerant: Boolean = true
  override def dataType: DataType = DoubleType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def arr(t: DataType) = t match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    val intish = third.dataType == IntegerType || third.dataType == LongType
    if (arr(first.dataType) && arr(second.dataType) && intish)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"l2_sq_at expects (array<float>, array<float>, int), got " +
          s"(${first.dataType.catalogString}, ${second.dataType.catalogString}, ${third.dataType.catalogString})")
  }

  override def nullSafeEval(a: Any, b: Any, c: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val off = c.asInstanceOf[Number].intValue()
    val n = math.min(y.numElements(), math.max(0, x.numElements() - off))
    var acc = 0.0
    var i = 0
    while (i < n) {
      val d = x.getFloat(off + i).toDouble - y.getFloat(i).toDouble
      acc += d * d
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y, off) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val d = ctx.freshName("d")
      val o = ctx.freshName("off")
      s"""
         |int $o = (int)($off);
         |int $n = java.lang.Math.min($y.numElements(),
         |  java.lang.Math.max(0, $x.numElements() - $o));
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $d = (double) $x.getFloat($o + $i) - (double) $y.getFloat($i);
         |  $acc += $d * $d;
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): L2SqAt =
    copy(first = f, second = s, third = t)

  override def prettyName: String = "l2_sq_at"
}

/** SparkSessionExtensions entry point (spark.sql.extensions-compatible):
  * the full engine surface — every native function, the custom top-k
  * strategy, and the window-top-k rewrite rule — so a session built
  * with `spark.sql.extensions=graft.functions.GraftExtensions` is
  * equivalent to one from `Engine.session`. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftFunctions.all.foreach { case (name, builder) =>
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo(classOf[GraftExtensions].getName, name),
        builder))
    }
    ext.injectPlannerStrategy(_ => graft.plans.TopKPerGroupStrategy)
    ext.injectOptimizerRule(_ => graft.plans.TopKWindowRewrite)
    // variant-extraction pushdown is declined on metadata-bearing
    // scans (see the rule's scaladoc for the pushdown-phase ordering
    // that makes this necessary)
    ext.injectOptimizerRule(_ =>
      graft.sources.NoVariantPushdownOnMetadataScans)
  }
}

object GraftFunctions {

  /** Every engine-native function: name → expression builder. Single
    * source of truth for both [[register]] (imperative sessions) and
    * [[GraftExtensions]] (spark.sql.extensions). Includes Spark's
    * internal Bloom-filter expressions (the machinery behind runtime
    * row-level filtering) surfaced as user-callable functions:
    * `bloom_filter_agg(xxhash64(k), items, bits)` builds a mergeable
    * sketch, `bloom_might_contain(bloom, xxhash64(k))` probes it —
    * the explicit form of semi-join pushdown at 100 TB (broadcast a
    * few hundred KB of bloom instead of shuffling the big side). */
  val all: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "cosine_sim" -> ((args: Seq[Expression]) => CosineSim(args(0), args(1))),
    "dot_product" -> ((args: Seq[Expression]) => DotProduct(args(0), args(1))),
    "l2_sq" -> ((args: Seq[Expression]) => L2Sq(args(0), args(1))),
    "l2_sq_at" -> ((args: Seq[Expression]) => L2SqAt(args(0), args(1), args(2))),
    "bin_word32" -> ((args: Seq[Expression]) => BinWord32(args(0), args(1))),
    "intersect_count" -> ((args: Seq[Expression]) =>
      IntersectCount(args(0), args(1))),
    "md5_prefix32" -> ((args: Seq[Expression]) =>
      Md5Prefix32(args(0), litSeed(args(1), "md5_prefix32"))),
    "md5_words32" -> ((args: Seq[Expression]) =>
      Md5Words32(args(0), litSeed(args(1), "md5_words32"))),
    "bloom_filter_agg" -> ((args: Seq[Expression]) =>
      new org.apache.spark.sql.catalyst.expressions.aggregate
        .BloomFilterAggregate(args(0), args(1), args(2))),
    "bloom_might_contain" -> ((args: Seq[Expression]) =>
      org.apache.spark.sql.catalyst.expressions
        .BloomFilterMightContain(args(0), args(1))))

  /** Idempotent registration for sessions not built with the extension
    * (Engine.session calls this so every entry point has the functions). */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    all.foreach { case (name, builder) =>
      reg.createOrReplaceTempFunction(name, builder, "scala_udf")
    }
  }

  private def litSeed(e: Expression, fn: String): Int =
    if (e.foldable) e.eval().asInstanceOf[Number].intValue()
    else throw new IllegalArgumentException(s"$fn: seed must be a literal integer")

}
