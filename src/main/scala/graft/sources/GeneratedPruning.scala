package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeReference, BindReferences, Cast, GenericInternalRow, Literal, Substring, TruncDate, TruncTimestamp, Year}
import org.apache.spark.sql.catalyst.plans.logical.{LocalRelation, Project}
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._

/** GENERATED-COLUMN FILTER DERIVATION (Delta's generated-column
  * partition pruning): a table partitioned (or stats-boxed) by
  * `day DATE GENERATED ALWAYS AS (CAST(ts AS DATE))` must prune on a
  * query that filters only `ts` — the user never names the partition
  * column. For every generated column whose expression is a recognized
  * MONOTONIC function of one source column, each pushed filter on the
  * source derives a conservative filter on the generated column:
  *
  *   ts >  X  →  day >= f(X)        (f non-decreasing: ts > X ⇒ f(ts) ≥ f(X))
  *   ts <= Y  →  day <= f(Y)
  *   ts =  X  →  day =  f(X)        (equality needs no monotonicity)
  *   ts IN (…) → day IN (f(…))
  *
  * Derived filters join the scan's partition-tuple and stats-box
  * pruning only — they are never returned to Spark as residuals, and
  * pruning acts only on PROVABLY-FALSE, so a conservative derivation
  * can only cost an extra batch read, never a lost row. At 100 TB this
  * is the difference between a date-range query reading three daily
  * partitions and reading the table.
  *
  * Recognized families (all floors/prefixes, hence monotonic):
  * `CAST(c AS DATE)`, `year(c)`, `date_trunc(unit, c)`,
  * `trunc(c, unit)`, and `substring(c, 1, n)` — the last derives
  * EQUALITY/IN only (string range order at the tuple differs from
  * UTF8 binary order on supplementary characters; equality is
  * order-free). Evaluation runs the SAME bound expression the sink's
  * generator runs, on the driver, once per filter literal. */
object GeneratedPruning {

  /** One derivable generated column: evaluate the generation function
    * on a v1 filter literal; `rangesOk` gates range derivation,
    * `notNullOk` gates IsNotNull (sound only when the function never
    * maps a non-null input to null). */
  private final case class Rule(
      src: String, gen: String, rangesOk: Boolean, notNullOk: Boolean,
      ev: Any => Option[Any])

  /** Derived filters for `filters` over a table whose generated-column
    * expressions are `gens` (col -> expression SQL). Empty unless a
    * recognized rule applies — the common no-generated-columns path
    * costs one Map.isEmpty. */
  def derived(
      spark: SparkSession, schema: StructType,
      gens: Map[String, String], filters: Seq[Filter]): Seq[Filter] = {
    if (gens.isEmpty || filters.isEmpty) return Nil
    val rules = gens.toSeq.sortBy(_._1).flatMap { case (gcol, sql) =>
      recognize(spark, schema, gcol, sql)
    }
    if (rules.isEmpty) return Nil
    filters.flatMap(conjuncts).flatMap(f => rules.flatMap(derive(f, _)))
  }

  /** Spark pushes conjuncts separately, but a caller may AND them. */
  private def conjuncts(f: Filter): Seq[Filter] = f match {
    case And(l, r) => conjuncts(l) ++ conjuncts(r)
    case other => Seq(other)
  }

  private def derive(f: Filter, r: Rule): Option[Filter] = f match {
    case EqualTo(c, v) if c == r.src && v != null =>
      r.ev(v).map(EqualTo(r.gen, _))
    case In(c, vs) if c == r.src && vs != null && vs.forall(_ != null) =>
      val m = vs.toSeq.map(r.ev)
      if (m.nonEmpty && m.forall(_.isDefined))
        Some(In(r.gen, m.flatten.distinct.toArray))
      else None
    case IsNull(c) if c == r.src => Some(IsNull(r.gen))
    case IsNotNull(c) if c == r.src && r.notNullOk => Some(IsNotNull(r.gen))
    case GreaterThan(c, v) if c == r.src && r.rangesOk && v != null =>
      r.ev(v).map(GreaterThanOrEqual(r.gen, _))
    case GreaterThanOrEqual(c, v) if c == r.src && r.rangesOk && v != null =>
      r.ev(v).map(GreaterThanOrEqual(r.gen, _))
    case LessThan(c, v) if c == r.src && r.rangesOk && v != null =>
      r.ev(v).map(LessThanOrEqual(r.gen, _))
    case LessThanOrEqual(c, v) if c == r.src && r.rangesOk && v != null =>
      r.ev(v).map(LessThanOrEqual(r.gen, _))
    case _ => None
  }

  /** Resolve the generation expression exactly as the sink does, then
    * whitelist the monotonic single-source shapes. Anything else —
    * arithmetic, multi-column, non-floor functions like month() — is
    * silently not derivable (pruning is a fast path, never required
    * for correctness). */
  private def recognize(
      spark: SparkSession, schema: StructType,
      gcol: String, sql: String): Option[Rule] = try {
    val attrs =
      org.apache.spark.sql.catalyst.types.DataTypeUtils.toAttributes(schema)
    val analyzed = org.apache.spark.sql.catalyst.util.GeneratedColumnAnalyzer
      .execute(Project(
        Seq(Alias(spark.sessionState.sqlParser.parseExpression(sql), gcol)()),
        LocalRelation(attrs)))
    val expr = analyzed.asInstanceOf[Project].projectList.head
      .asInstanceOf[Alias].child
    if (!expr.resolved) return None
    val shape: Option[(AttributeReference, Boolean)] = expr match {
      case Cast(a: AttributeReference, DateType, _, _) => Some((a, true))
      case Year(a: AttributeReference) => Some((a, true))
      case Year(Cast(a: AttributeReference, DateType, _, _)) => Some((a, true))
      case TruncTimestamp(Literal(_, _), a: AttributeReference, _) =>
        Some((a, true))
      case TruncTimestamp(Literal(_, _),
          Cast(a: AttributeReference, TimestampType, _, _), _) =>
        Some((a, true))
      case TruncDate(a: AttributeReference, Literal(_, _)) => Some((a, true))
      case TruncDate(Cast(a: AttributeReference, DateType, _, _),
          Literal(_, _)) => Some((a, true))
      // substring from position 1 = a prefix: equality-only (order at
      // the tuple is UTF-16, source order is UTF-8 binary)
      case Substring(a: AttributeReference,
          Literal(pos: Integer, IntegerType), Literal(_: Integer, IntegerType))
          if pos == 1 => Some((a, false))
      case _ => None
    }
    shape.map { case (srcAttr, monotoneShape) =>
      val idx = schema.fieldIndex(srcAttr.name)
      val srcDt = schema(idx).dataType
      // the monotonic family is only SOUND over temporal sources:
      // casting a STRING to date is neither monotone in the string's
      // binary order ('2024-1-03' sorts above '2024-09-05' but casts
      // below it — a derived range would prune its partition) nor
      // non-null-preserving (a malformed non-null string casts to
      // null, landing in the null partition a derived IsNotNull would
      // prune). Equality/IN stay sound for any source type (a
      // deterministic function of an equal input is equal).
      val temporal = srcDt == DateType || srcDt == TimestampType ||
        srcDt == TimestampNTZType
      val rangesOk = monotoneShape && temporal
      val notNullOk = if (monotoneShape) temporal else true
      val bound = BindReferences.bindReference(expr, attrs)
      Rule(srcAttr.name, gcol, rangesOk, notNullOk, (v: Any) =>
        toCatalyst(v, srcDt).flatMap { cv =>
          val row = new GenericInternalRow(schema.length)
          row.update(idx, cv)
          Option(bound.eval(row)).map(fromCatalyst)
        })
    }
  } catch { case scala.util.control.NonFatal(_) => None }

  /** v1 filter literal → catalyst form of the source column's type
    * (the exact inverse of what the tuple comparator's litNum reads). */
  private def toCatalyst(v: Any, dt: DataType): Option[Any] = (v, dt) match {
    case (t: java.sql.Timestamp, TimestampType) =>
      Some(Long.box(t.getTime * 1000L + (t.getNanos % 1000000) / 1000))
    case (i: java.time.Instant, TimestampType) =>
      Some(Long.box(i.getEpochSecond * 1000000L + i.getNano / 1000))
    case (d: java.sql.Date, DateType) =>
      Some(Int.box(d.toLocalDate.toEpochDay.toInt))
    case (d: java.time.LocalDate, DateType) => Some(Int.box(d.toEpochDay.toInt))
    case (s: String, StringType) =>
      Some(org.apache.spark.unsafe.types.UTF8String.fromString(s))
    case (n: java.lang.Long, LongType) => Some(n)
    case (n: java.lang.Integer, IntegerType) => Some(n)
    case _ => None
  }

  /** Catalyst result → the external literal form the partition-tuple
    * comparator and box pruning expect (numbers stay in storage units:
    * dates epoch days, timestamps micros). */
  private def fromCatalyst(v: Any): Any = v match {
    case u: org.apache.spark.unsafe.types.UTF8String => u.toString
    case other => other
  }
}
