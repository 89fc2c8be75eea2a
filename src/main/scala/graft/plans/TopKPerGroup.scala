package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Alias, Ascending, Attribute, Descending, EqualTo, Expression, GreaterThan, GreaterThanOrEqual, IntegerLiteral, LessThan, LessThanOrEqual, PredicateHelper, RowNumber, SortOrder, UnsafeProjection, UnsafeRow, WindowExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.LazilyGeneratedOrdering
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, UnaryNode, Window, WindowGroupLimit}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning, UnspecifiedDistribution}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.classic.ClassicConversions.castToImpl
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}

/** Whole-operator custom plan (SURVEY §2.B "custom" tier c): TOP-K PER
  * GROUP as a first-class operator — logical node + strategy + two-phase
  * physical operator, injected via SparkSessionExtensions.
  *
  * Why not a window? `row_number() OVER (PARTITION BY g ORDER BY o) <= k`
  * fully SORTS every group (WindowExec: shuffle + sort of ALL rows) and
  * only then discards everything past k. This operator keeps a BOUNDED
  * HEAP of k rows per group: a partial pass prunes each input partition
  * to ≤k rows per group BEFORE the shuffle (the map-side-combine shape
  * aggregation enjoys, applied to top-k), then a final pass merges the
  * pruned partials. Shuffled volume drops from |rows| to
  * ≤ k·|groups|·|partitions| — at 100 TB with k=3 that is the
  * difference between shuffling terabytes and megabytes.
  *
  * Both phases are the same physical node (`partial` flag); the final
  * phase declares ClusteredDistribution on the group keys so Spark
  * inserts the exchange. Rows never globally sort; each heap is O(k).
  */
final case class TopKPerGroupNode(
    groupExprs: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    child: LogicalPlan)
    extends UnaryNode {
  override def output: Seq[Attribute] = child.output
  override def maxRows: Option[Long] = child.maxRows
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerGroupNode =
    copy(child = newChild)
}

final case class TopKPerGroupExec(
    groupExprs: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    partial: Boolean,
    child: SparkPlan)
    extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output

  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) Seq(UnspecifiedDistribution)
    else Seq(ClusteredDistribution(groupExprs))

  // the final phase's exchange clusters rows on the group keys; report
  // that downstream so a consumer with the same requirement (e.g. the
  // Window the rewrite rule leaves on top) reuses it instead of
  // inserting a second exchange
  override def outputPartitioning: Partitioning = child.outputPartitioning

  override protected def doExecute(): RDD[InternalRow] = {
    // capture only serializable values; build the projection/ordering
    // per partition (UnsafeProjection is not serializable, and the
    // closure must not capture the SparkPlan itself)
    val groupExprsL = groupExprs
    val orderL = order
    val outputL = child.output
    val kL = k
    child.execute().mapPartitions({ it =>
      val gp = UnsafeProjection.create(groupExprsL, outputL)
      val ordering = new LazilyGeneratedOrdering(orderL, outputL)
      val k = kL
      // group key -> rows sorted ascending by `order`; keep first k.
      // k is small: an insertion-sorted ArrayBuffer beats a heap's
      // constant factors and keeps rows in emit order.
      val heaps = new java.util.HashMap[UnsafeRow, scala.collection.mutable.ArrayBuffer[UnsafeRow]]()
      it.foreach { row =>
        val key = gp(row)
        var buf = heaps.get(key)
        if (buf == null) {
          buf = new scala.collection.mutable.ArrayBuffer[UnsafeRow](k + 1)
          heaps.put(key.copy(), buf)
        }
        if (buf.length < k || ordering.compare(row, buf.last) < 0) {
          val copied = row.asInstanceOf[UnsafeRow].copy()
          var i = buf.length
          buf += copied
          while (i > 0 && ordering.compare(copied, buf(i - 1)) < 0) {
            buf(i) = buf(i - 1)
            i -= 1
          }
          buf(i) = copied
          if (buf.length > k) buf.remove(buf.length - 1)
        }
      }
      val out = new scala.collection.mutable.ArrayBuffer[InternalRow]()
      heaps.forEach((_, rows) => out ++= rows)
      out.iterator
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerGroupExec =
    copy(child = newChild)
}

/** Optimizer rule: recognize the universal window-top-k idiom
  *
  * {{{ Filter(row_number() OVER (PARTITION BY g ORDER BY o) <= k, ...) }}}
  *
  * and insert [[TopKPerGroupNode]] BELOW the Window, so each input
  * partition is pruned to ≤k rows per group with bounded heaps BEFORE
  * the shuffle — user-written window queries get the custom operator's
  * plan without calling the DSL. The Filter and Window stay on top
  * (the Window now ranks ≤ k·|groups| rows instead of all rows), which
  * keeps the rewrite semantics-preserving by construction for every
  * bound shape (`<=`, `<`, `=`, and their flipped forms).
  *
  * Guards: single RowNumber window expression (rank/dense_rank can keep
  * > k rows on ties; other functions change under pruning), non-empty
  * partition spec (global top-k is TakeOrderedAndProject's job),
  * ordered window, k ≥ 1. A WindowGroupLimit the built-in
  * InferWindowGroupLimit rule may already have inserted is replaced —
  * TopKPerGroupNode subsumes it.
  */
object TopKWindowRewrite extends Rule[LogicalPlan] with PredicateHelper {

  private def boundOf(conjuncts: Seq[Expression], rn: Attribute): Option[Int] =
    conjuncts.collectFirst {
      case LessThanOrEqual(a: Attribute, IntegerLiteral(k)) if a.semanticEquals(rn) => k
      case LessThan(a: Attribute, IntegerLiteral(k)) if a.semanticEquals(rn) => k - 1
      case GreaterThanOrEqual(IntegerLiteral(k), a: Attribute) if a.semanticEquals(rn) => k
      case GreaterThan(IntegerLiteral(k), a: Attribute) if a.semanticEquals(rn) => k - 1
      case EqualTo(a: Attribute, IntegerLiteral(k)) if a.semanticEquals(rn) => k
      case EqualTo(IntegerLiteral(k), a: Attribute) if a.semanticEquals(rn) => k
    }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond,
        w @ Window(Seq(alias @ Alias(WindowExpression(_: RowNumber, _), _)),
          part, order, child, _))
        if part.nonEmpty && order.nonEmpty &&
          !child.isInstanceOf[TopKPerGroupNode] =>
      boundOf(splitConjunctivePredicates(cond), alias.toAttribute) match {
        case Some(k) if k >= 1 =>
          val base = child match {
            case wgl: WindowGroupLimit => wgl.child
            case other => other
          }
          f.copy(child = w.copy(child = TopKPerGroupNode(part, order, k, base)))
        case _ => f
      }
  }
}

/** Plans the logical node as final-over-partial. */
object TopKPerGroupStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerGroupNode(groups, order, k, child) =>
      TopKPerGroupExec(groups, order, k, partial = false,
        TopKPerGroupExec(groups, order, k, partial = true, planLater(child))) :: Nil
    case _ => Nil
  }
}

object TopKPerGroup {
  /** DSL entry: top `k` rows per group, ordered by `orderSpec`
    * (column name, ascending?). Columns resolve by name against the
    * input; registers the strategy on first use (idempotent). */
  def apply(
      df: DataFrame,
      groupCols: Seq[String],
      orderSpec: Seq[(String, Boolean)],
      k: Int): DataFrame = {
    require(k >= 1, s"top-k requires k >= 1, got $k")
    val spark = df.sparkSession
    register(spark)
    val logical = df.queryExecution.analyzed
    def attr(n: String): Attribute = logical.output
      .find(_.name == n)
      .getOrElse(throw new IllegalArgumentException(
        s"column $n not in ${logical.output.map(_.name).mkString(",")}"))
    val groupExprs: Seq[Expression] = groupCols.map(attr)
    val sortOrders = orderSpec.map { case (n, asc) =>
      SortOrder(attr(n), if (asc) Ascending else Descending)
    }
    org.apache.spark.sql.GraftShims.ofRows(
      spark, TopKPerGroupNode(groupExprs, sortOrders, k, logical))
  }

  def register(spark: SparkSession): Unit = {
    if (!spark.experimental.extraStrategies.contains(TopKPerGroupStrategy)) {
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ TopKPerGroupStrategy
    }
    if (!spark.experimental.extraOptimizations.contains(TopKWindowRewrite)) {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ TopKWindowRewrite
    }
  }
}
