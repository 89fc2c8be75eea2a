package graft.sources

import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._

/** EXACT partition pruning: evaluate pushed v1 filters against a
  * batch's recorded partition TUPLE ([[CommitLog.Parts]]). A partition
  * column holds ONE value per batch, so any deterministic predicate
  * over partition columns evaluates to a definite answer — unlike
  * min/max boxes (ranges, numerics only) or blooms (membership,
  * false positives), this prunes equality, ranges, IN, IS NULL,
  * string prefix/suffix/infix and their AND/OR/NOT compositions, for
  * every supported type.
  *
  * Three-valued result: `Some(false)` = provably no row of the batch
  * satisfies the filter (SKIP — the only actionable answer),
  * `Some(true)` = rows match, `None` = unknown (unrecorded column,
  * non-partition column, untranslatable literal → KEEP). SQL NULL
  * semantics: a null partition value satisfies no comparison; under
  * `Not` the null case may degrade to a safe `Some(true)` (keep) —
  * pruning only ever acts on `Some(false)`, so approximation can only
  * cost an extra batch read, never a lost row (the residual-filter
  * contract: Spark re-evaluates the exact predicate above the scan).
  *
  * Numeric comparison is BigDecimal-exact — a Double detour would
  * mis-prune long keys past 2^53. Stored value forms are the writer's
  * ([[CommitLogPartitionedDataWriter]]): long/int/double/bool/string
  * verbatim, timestamps as micros, dates as epoch days, decimals
  * unscaled. */
object CommitLogPartitions {

  /** Tuple of one batch, decoded: col -> value (None = null). */
  type Tuple = Map[String, Option[String]]

  def decodeTuple(raw: Map[String, String]): Tuple =
    raw.map { case (c, tok) => c -> CommitLog.partValue(tok) }

  /** The filter's provable answer over every row of a batch holding
    * `tuple`; see class doc for the three-valued contract. */
  def eval(f: Filter, tuple: Tuple, schema: StructType): Option[Boolean] = {
    def dtOf(c: String): Option[DataType] =
      schema.fields.find(_.name == c).map(_.dataType)
    // Some(None) = recorded null, Some(Some(s)) = recorded value,
    // None = column not recorded for this batch
    def stored(c: String): Option[Option[String]] = tuple.get(c)
    def test(c: String, v: Any)(p: Int => Boolean): Option[Boolean] =
      stored(c) match {
        case None => None
        case Some(None) => Some(false) // null satisfies no comparison
        case Some(Some(s)) =>
          for { dt <- dtOf(c); r <- cmp(s, v, dt) } yield p(r)
      }
    def strTest(c: String)(p: String => Boolean): Option[Boolean] =
      stored(c) match {
        case None => None
        case Some(None) => Some(false)
        case Some(Some(s)) => dtOf(c) match {
          case Some(StringType) => Some(p(s))
          case _ => None
        }
      }
    f match {
      case EqualTo(c, v) => test(c, v)(_ == 0)
      case EqualNullSafe(c, v) => stored(c) match {
        case None => None
        case Some(None) => Some(v == null)
        case Some(Some(s)) =>
          if (v == null) Some(false)
          else for { dt <- dtOf(c); r <- cmp(s, v, dt) } yield r == 0
      }
      case In(c, vs) => stored(c) match {
        case None => None
        case Some(None) => Some(false)
        case Some(Some(s)) => dtOf(c) match {
          case None => None
          case Some(dt) =>
            val rs = vs.toSeq.map(v => cmp(s, v, dt))
            if (rs.exists(_.contains(0))) Some(true)
            else if (rs.forall(_.isDefined)) Some(false)
            else None
        }
      }
      case GreaterThan(c, v) => test(c, v)(_ > 0)
      case GreaterThanOrEqual(c, v) => test(c, v)(_ >= 0)
      case LessThan(c, v) => test(c, v)(_ < 0)
      case LessThanOrEqual(c, v) => test(c, v)(_ <= 0)
      case IsNull(c) => stored(c).map(_.isEmpty)
      case IsNotNull(c) => stored(c).map(_.nonEmpty)
      case StringStartsWith(c, p) => strTest(c)(_.startsWith(p))
      case StringEndsWith(c, p) => strTest(c)(_.endsWith(p))
      case StringContains(c, p) => strTest(c)(_.contains(p))
      case And(l, r) => (eval(l, tuple, schema), eval(r, tuple, schema)) match {
        case (Some(false), _) | (_, Some(false)) => Some(false)
        case (Some(true), Some(true)) => Some(true)
        case _ => None
      }
      case Or(l, r) => (eval(l, tuple, schema), eval(r, tuple, schema)) match {
        case (Some(true), _) | (_, Some(true)) => Some(true)
        case (Some(false), Some(false)) => Some(false)
        case _ => None
      }
      case Not(c) => eval(c, tuple, schema).map(!_)
      case _: AlwaysTrue => Some(true)
      case _: AlwaysFalse => Some(false)
      case _ => None
    }
  }

  /** A batch SURVIVES pruning unless some filter is provably false. */
  def mayMatch(
      filters: Seq[Filter], tuple: Tuple, schema: StructType): Boolean =
    !filters.exists(f => eval(f, tuple, schema).contains(false))

  /** Decode one STORED partition value (the writer's unit system:
    * timestamps micros, dates epoch days, decimals unscaled) to
    * its catalyst representation — the form partition keys, partition
    * identifiers and metadata-aggregate group columns all carry. */
  def catalystValue(s: String, dt: DataType): Any = dt match {
    case LongType | TimestampType => Long.box(s.toLong)
    case IntegerType | DateType => Int.box(s.toInt)
    case DoubleType => Double.box(s.toDouble)
    case FloatType => Float.box(s.toFloat)
    case BooleanType => Boolean.box(s.toBoolean)
    case StringType => org.apache.spark.unsafe.types.UTF8String.fromString(s)
    case d: DecimalType if d.precision <= 18 =>
      org.apache.spark.sql.types.Decimal(s.toLong, d.precision, d.scale)
    case d: DecimalType =>
      // wide decimals store the unscaled value as a decimal string
      org.apache.spark.sql.types.Decimal(
        BigDecimal(BigInt(s), d.scale), d.precision, d.scale)
    case other => throw new IllegalArgumentException(
      s"unsupported partition value type $other")
  }

  /** Exact comparison of a stored partition value against a pushed
    * filter literal; None = not comparable (unknown literal type). */
  private def cmp(stored: String, lit: Any, dt: DataType): Option[Int] =
    dt match {
      case StringType => lit match {
        case s: String => Some(stored.compareTo(s))
        case _ => None
      }
      case BooleanType => lit match {
        case b: java.lang.Boolean =>
          Some(java.lang.Boolean.compare(stored.toBoolean, b))
        case _ => None
      }
      case _ => for { s <- storedNum(stored, dt); l <- litNum(lit, dt) }
        yield s.compare(l)
    }

  private def storedNum(s: String, dt: DataType): Option[BigDecimal] =
    try dt match {
      case LongType | IntegerType | TimestampType | DateType |
           DoubleType | FloatType => Some(BigDecimal(s))
      case d: DecimalType => Some(BigDecimal(s) / BigDecimal(10).pow(d.scale))
      case _ => None
    } catch { case _: NumberFormatException => None }

  /** Filter literal → the stored unit: timestamps to micros, dates to
    * epoch days, numbers exactly. */
  private def litNum(v: Any, dt: DataType): Option[BigDecimal] = v match {
    case t: java.sql.Timestamp =>
      Some(BigDecimal(t.getTime) * 1000 +
        BigDecimal((t.getNanos % 1000000) / 1000))
    case i: java.time.Instant =>
      Some(BigDecimal(i.getEpochSecond) * 1000000 + BigDecimal(i.getNano / 1000))
    case d: java.sql.Date => Some(BigDecimal(d.toLocalDate.toEpochDay))
    case d: java.time.LocalDate => Some(BigDecimal(d.toEpochDay))
    case d: java.math.BigDecimal => Some(BigDecimal(d))
    case d: BigDecimal => Some(d)
    // NaN/±Infinity have no BigDecimal form — not comparable here
    // (None → three-valued UNKNOWN → the batch is kept and the
    // residual filter answers under Spark's own NaN total order);
    // without the guard a `c = double('NaN')` probe against a
    // double-partitioned table crashed PLANNING with
    // NumberFormatException
    case n: java.lang.Number =>
      try Some(BigDecimal(n.toString))
      catch { case _: NumberFormatException => None }
    case _ => None
  }
}
