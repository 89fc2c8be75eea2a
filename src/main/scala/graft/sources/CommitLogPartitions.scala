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
/** HASH-BUCKET partition transform (SURVEY S81): a partition-spec
  * entry `bucketN(col)` routes rows into N hash buckets of `col` —
  * Iceberg's `bucket(N, col)` — so a HIGH-CARDINALITY key can drive
  * partition pruning (point probes open ~1/N of the table) and
  * storage-partitioned joins (N key groups, not one per key) without
  * the million-tuple explosion identity partitioning would cost.
  *
  * The id is ENGINE-CANONICAL, not Spark's `hash()`: integral values
  * hash their LONG form (so int->bigint type widening keeps every
  * row's bucket — the same canonicalization the blooms and NDV facets
  * use), strings their UTF-8 bytes; Murmur3 x86-32 seed 42, floorMod
  * N. Consistency is all pruning and SPJ need — the probe side derives
  * ids from pushed literals with this same function, and Spark's SPJ
  * resolves the transform through [[GraftCatalog]]'s function catalog
  * rather than assuming any particular hash. */
object CommitLogBucket {
  import org.apache.spark.unsafe.hash.Murmur3_x86_32
  import org.apache.spark.unsafe.Platform

  private val Seed = 42
  private val P = """bucket(\d+)\((.+)\)""".r

  def render(n: Int, col: String): String = s"bucket$n($col)"

  /** `bucketN(col)` -> (N, col); None for an identity entry. */
  def parse(spec: String): Option[(Int, String)] = spec match {
    case P(n, c) =>
      try { val b = n.toInt; if (b > 0) Some((b, c)) else None }
      catch { case _: NumberFormatException => None }
    case _ => None
  }

  def isBucket(spec: String): Boolean = parse(spec).isDefined

  /** The column a spec entry reads: itself for identity, the
    * transformed source for a bucket OR monotone entry (this is the
    * one facade every partcols consumer resolves through). */
  def sourceOf(spec: String): String =
    parse(spec).map(_._2)
      .orElse(CommitLogMonotone.parse(spec).map(_.source))
      .getOrElse(spec)

  /** Types that can key a bucket: integrals (long-canonical, so type
    * widening preserves ids), date/timestamp (epoch-integral under the
    * hood) and strings. Floats (NaN/-0.0 equality pitfalls) and
    * decimals (scale-dependent form) are refused. */
  def supported(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType |
         DateType | TimestampType | StringType => true
    case _ => false
  }

  def idOfLong(v: Long, n: Int): Int =
    Math.floorMod(Murmur3_x86_32.hashLong(v, Seed), n)

  def idOfBytes(b: Array[Byte], n: Int): Int =
    Math.floorMod(
      Murmur3_x86_32.hashUnsafeBytes(b, Platform.BYTE_ARRAY_OFFSET, b.length, Seed), n)

  /** Bucket id of a pushed FILTER literal under the source column's
    * type; None = not derivable (mismatched literal form → the
    * three-valued eval keeps the batch). */
  def idOfLiteral(v: Any, dt: DataType, n: Int): Option[Int] = dt match {
    case StringType => v match {
      case s: String => Some(idOfBytes(s.getBytes("UTF-8"), n))
      case u: org.apache.spark.unsafe.types.UTF8String =>
        Some(idOfBytes(u.getBytes, n))
      case _ => None
    }
    case DateType => v match {
      case d: java.sql.Date => Some(idOfLong(d.toLocalDate.toEpochDay, n))
      case d: java.time.LocalDate => Some(idOfLong(d.toEpochDay, n))
      case _ => None
    }
    case TimestampType => v match {
      case t: java.sql.Timestamp =>
        Some(idOfLong(t.getTime * 1000L + (t.getNanos % 1000000) / 1000, n))
      case i: java.time.Instant =>
        Some(idOfLong(i.getEpochSecond * 1000000L + i.getNano / 1000, n))
      case _ => None
    }
    case ByteType | ShortType | IntegerType | LongType => v match {
      case x: java.lang.Number =>
        // exact integral literals only — 1.5 = k matches no bucket the
        // long form would find, but that is the residual's business
        val bd = try BigDecimal(x.toString) catch {
          case _: NumberFormatException => return None
        }
        if (bd.isValidLong) Some(idOfLong(bd.toLongExact, n)) else None
      case _ => None
    }
    case _ => None
  }
}

/** MONOTONE partition transforms (SURVEY S82): Iceberg's hidden
  * partitioning for time and prefixes — spec entries `days(ts)`,
  * `hours(ts)`, `months(ts)`, `years(ts)` over timestamp/date columns
  * and `truncateW(col)` over integrals (floor to a multiple of W) and
  * strings (W-byte prefix). Unlike [[CommitLogBucket]]'s hash, every
  * one of these is ORDER-PRESERVING, so RANGE predicates on the
  * SOURCE column prune through the transform: `ts >= X` skips every
  * batch whose day token is below day(X) — the query never mentions
  * the partition column, which is the whole point of hidden
  * partitioning.
  *
  * Value forms: time transforms integer-count since the epoch (days /
  * hours verbatim from the stored micros|epoch-days; months/years via
  * proleptic LocalDate), integral truncate the floored LONG multiple,
  * string truncate the UTF-8-safe byte prefix (a cut that would split
  * a codepoint backs up — prefix-of semantics survive). */
object CommitLogMonotone {
  import java.time.LocalDate

  private val TimeP = """(days|hours|months|years)\((.+)\)""".r
  private val TruncP = """truncate(\d+)\((.+)\)""".r

  sealed trait Spec { def source: String; def render: String }
  final case class Time(unit: String, source: String) extends Spec {
    def render = s"$unit($source)"
  }
  final case class Trunc(w: Int, source: String) extends Spec {
    def render = s"truncate$w($source)"
  }

  def parse(spec: String): Option[Spec] = spec match {
    case TimeP(u, c) => Some(Time(u, c))
    case TruncP(w, c) =>
      try { val v = w.toInt; if (v > 0) Some(Trunc(v, c)) else None }
      catch { case _: NumberFormatException => None }
    case _ => None
  }

  def isMonotone(spec: String): Boolean = parse(spec).isDefined

  /** Whether `dt` can source the transform. */
  def supported(s: Spec, dt: DataType): Boolean = s match {
    case Time(_, _) => dt == TimestampType || dt == DateType
    case Trunc(_, _) => dt match {
      case ByteType | ShortType | IntegerType | LongType | StringType => true
      case _ => false
    }
  }

  private def fromMicros(unit: String, micros: Long): Long = unit match {
    case "hours" => Math.floorDiv(micros, 3600L * 1000000L)
    case "days" => Math.floorDiv(micros, 86400L * 1000000L)
    case u => fromEpochDay(u, Math.floorDiv(micros, 86400L * 1000000L))
  }
  private def fromEpochDay(unit: String, day: Long): Long = unit match {
    case "days" => day
    case "hours" => day * 24L
    case "months" =>
      val d = LocalDate.ofEpochDay(day)
      (d.getYear - 1970L) * 12L + (d.getMonthValue - 1)
    case "years" => LocalDate.ofEpochDay(day).getYear - 1970L
  }

  /** Transform a SOURCE value in its stored/InternalRow form (micros
    * for timestamps, epoch days for dates, raw integrals, UTF8 bytes
    * for strings) to the token value. */
  def timeValue(s: Time, dt: DataType, v: Long): Long = dt match {
    case TimestampType => fromMicros(s.unit, v)
    case DateType => fromEpochDay(s.unit, v)
    case other => throw new IllegalArgumentException(
      s"${s.render} over $other")
  }

  def truncLong(w: Int, v: Long): Long = Math.floorDiv(v, w.toLong) * w

  /** First W CODEPOINTS of a UTF-8 string (Iceberg's string truncate).
    * Codepoint (not byte) truncation matters for soundness: a fixed
    * codepoint count is MONOTONE in the byte-lex source order (first-
    * difference argument), so range predicates prune through it; a
    * byte cut that backs up past continuation bytes truncates
    * different values at different lengths and is NOT monotone. */
  def truncChars(w: Int, b: Array[Byte]): Array[Byte] = {
    var i = 0
    var seen = 0
    while (i < b.length) {
      if ((b(i) & 0xc0) != 0x80) { // codepoint start
        if (seen == w) return java.util.Arrays.copyOfRange(b, 0, i)
        seen += 1
      }
      i += 1
    }
    b // at most w codepoints already
  }

  /** The token of a pushed FILTER literal; None = underivable form. */
  def literalToken(s: Spec, dt: DataType, v: Any): Option[String] = s match {
    case t: Time => (dt, v) match {
      case (TimestampType, x: java.sql.Timestamp) =>
        Some(timeValue(t, dt,
          x.getTime * 1000L + (x.getNanos % 1000000) / 1000).toString)
      case (TimestampType, x: java.time.Instant) =>
        Some(timeValue(t, dt,
          x.getEpochSecond * 1000000L + x.getNano / 1000).toString)
      case (DateType, x: java.sql.Date) =>
        Some(timeValue(t, dt, x.toLocalDate.toEpochDay).toString)
      case (DateType, x: java.time.LocalDate) =>
        Some(timeValue(t, dt, x.toEpochDay).toString)
      case _ => None
    }
    case Trunc(w, _) => dt match {
      case StringType => v match {
        case x: String =>
          Some(new String(truncChars(w, x.getBytes("UTF-8")), "UTF-8"))
        case x: org.apache.spark.unsafe.types.UTF8String =>
          Some(new String(truncChars(w, x.getBytes), "UTF-8"))
        case _ => None
      }
      case ByteType | ShortType | IntegerType | LongType => v match {
        case x: java.lang.Number =>
          val bd = try BigDecimal(x.toString) catch {
            case _: NumberFormatException => return None
          }
          if (bd.isValidLong) Some(truncLong(w, bd.toLongExact).toString)
          else None
        case _ => None
      }
      case _ => None
    }
  }

  /** Compare two token strings in the transform's value domain: time
    * and integral-truncate tokens numerically, string-truncate tokens
    * in unsigned UTF-8 BYTE order (the source column's own order —
    * String.compareTo would use UTF-16 units, which disagrees above
    * the BMP). */
  def tokenCompare(
      s: Spec, dt: DataType, a: String, b: String): Option[Int] = s match {
    case Trunc(_, _) if dt == StringType =>
      Some(java.util.Arrays.compareUnsigned(
        a.getBytes("UTF-8"), b.getBytes("UTF-8")))
    case _ => (tryLong(a), tryLong(b)) match {
      case (Some(x), Some(y)) => Some(java.lang.Long.compare(x, y))
      case _ => None
    }
  }

  private def tryLong(s: String): Option[Long] =
    try Some(s.toLong) catch { case _: NumberFormatException => None }
}

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
    // BUCKET fallback: when `c` is not an identity tuple key, look for
    // a `bucketN(c)` entry. A bucket token is definite on MISMATCH
    // (the literal's bucket differs → no row can equal it) and on
    // nullness (the writer routes null keys to the null token, so a
    // token answers IS [NOT] NULL exactly like identity), but a
    // matching bucket proves nothing (collisions) → unknown.
    def bucketStored(c: String): Option[(Int, Option[String])] =
      tuple.collectFirst {
        case (k, v) if CommitLogBucket.parse(k).exists(_._2 == c) =>
          (CommitLogBucket.parse(k).get._1, v)
      }
    def bucketEq(c: String, v: Any): Option[Boolean] = bucketStored(c) match {
      case None => None
      case Some((_, None)) => Some(false) // all-null batch; v is non-null
      case Some((n, Some(tok))) =>
        dtOf(c).flatMap(CommitLogBucket.idOfLiteral(v, _, n)) match {
          case Some(id) if id.toString != tok => Some(false)
          case _ => None
        }
    }
    // MONOTONE-transform fallback (days/hours/months/years/truncate):
    // order-preserving, so RANGES on the source prune too — the
    // comparison of the batch token against the literal's token bounds
    // what any row of the batch can satisfy. Many-to-one still: only
    // provable MISMATCH answers are definite.
    def monoStored(c: String)
        : Option[(CommitLogMonotone.Spec, Option[String])] =
      tuple.collectFirst {
        case (k, v) if CommitLogMonotone.parse(k).exists(_.source == c) =>
          (CommitLogMonotone.parse(k).get, v)
      }
    // compare(batch token, T(literal)); Left = all-null batch,
    // None = no monotone entry / underivable literal
    def monoCmp(c: String, v: Any): Option[Either[Unit, Int]] =
      monoStored(c) match {
        case None => None
        case Some((_, None)) => Some(Left(()))
        case Some((s, Some(tok))) =>
          for {
            dt <- dtOf(c)
            lt <- CommitLogMonotone.literalToken(s, dt, v)
            r <- CommitLogMonotone.tokenCompare(s, dt, tok, lt)
          } yield Right(r)
      }
    def monoTest(c: String, v: Any)(prune: Int => Boolean): Option[Boolean] =
      monoCmp(c, v) match {
        case Some(Left(())) => Some(false) // nulls satisfy no comparison
        case Some(Right(r)) => if (prune(r)) Some(false) else None
        case None => None
      }
    f match {
      case EqualTo(c, v) =>
        if (v == null) None // Spark never pushes = NULL; stay unknown
        else test(c, v)(_ == 0).orElse(bucketEq(c, v))
          .orElse(monoTest(c, v)(_ != 0))
      case EqualNullSafe(c, v) => stored(c) match {
        case None => bucketStored(c) match {
          case None => monoStored(c) match {
            case None => None
            case Some((_, tokOpt)) =>
              if (v == null) Some(tokOpt.isEmpty)
              else if (tokOpt.isEmpty) Some(false)
              else monoTest(c, v)(_ != 0)
          }
          case Some((_, tokOpt)) =>
            if (v == null) Some(tokOpt.isEmpty)
            else if (tokOpt.isEmpty) Some(false)
            else bucketEq(c, v)
        }
        case Some(None) => Some(v == null)
        case Some(Some(s)) =>
          if (v == null) Some(false)
          else for { dt <- dtOf(c); r <- cmp(s, v, dt) } yield r == 0
      }
      case In(c, vs) => stored(c) match {
        case None => bucketStored(c) match {
          case None => monoStored(c) match {
            case None => None
            case Some((_, None)) => Some(false) // nulls match no element
            case Some((s, Some(tok))) => dtOf(c) match {
              case None => None
              case Some(dt) =>
                val toks = vs.toSeq.filter(_ != null)
                  .map(CommitLogMonotone.literalToken(s, dt, _))
                if (toks.forall(_.isDefined) &&
                    !toks.flatten.exists(lt =>
                      CommitLogMonotone.tokenCompare(s, dt, tok, lt)
                        .contains(0))) Some(false)
                else None
            }
          }
          case Some((_, None)) => Some(false) // nulls match no IN element
          case Some((n, Some(tok))) => dtOf(c) match {
            case None => None
            case Some(dt) =>
              // prune only when EVERY element's bucket provably misses
              // (null elements match no row, so skipping them is safe)
              val ids = vs.toSeq.filter(_ != null)
                .map(CommitLogBucket.idOfLiteral(_, dt, n))
              if (ids.forall(_.isDefined) &&
                  !ids.flatten.exists(_.toString == tok)) Some(false)
              else None
          }
        }
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
      // a monotone token below the literal's token cannot hold c > v
      // (T non-decreasing: c > v ⇒ T(c) ≥ T(v)); mirrored for <
      case GreaterThan(c, v) =>
        test(c, v)(_ > 0).orElse(monoTest(c, v)(_ < 0))
      case GreaterThanOrEqual(c, v) =>
        test(c, v)(_ >= 0).orElse(monoTest(c, v)(_ < 0))
      case LessThan(c, v) =>
        test(c, v)(_ < 0).orElse(monoTest(c, v)(_ > 0))
      case LessThanOrEqual(c, v) =>
        test(c, v)(_ <= 0).orElse(monoTest(c, v)(_ > 0))
      case IsNull(c) =>
        stored(c).map(_.isEmpty).orElse(bucketStored(c).map(_._2.isEmpty))
          .orElse(monoStored(c).map(_._2.isEmpty))
      case IsNotNull(c) =>
        stored(c).map(_.nonEmpty).orElse(bucketStored(c).map(_._2.nonEmpty))
          .orElse(monoStored(c).map(_._2.nonEmpty))
      case StringStartsWith(c, p) => strTest(c)(_.startsWith(p))
        .orElse(monoStored(c) match {
          // truncate(W, string): rows starting with `p` carry a token
          // that is byte-prefix-compatible with p — equal to
          // truncChars(W, p) when p has ≥ W codepoints, else starting
          // with p itself; a token failing both is a provable miss
          case Some((s @ CommitLogMonotone.Trunc(w, _), Some(tok)))
              if dtOf(c).contains(StringType) =>
            val pb = p.getBytes("UTF-8")
            val tb = tok.getBytes("UTF-8")
            val cut = CommitLogMonotone.truncChars(w, pb)
            val compatible =
              if (cut.length < pb.length) // p longer than the token cap
                java.util.Arrays.equals(tb, cut)
              else // token must extend p (or p extends the short token)
                (tb.length >= pb.length &&
                  java.util.Arrays.equals(
                    java.util.Arrays.copyOfRange(tb, 0, pb.length), pb)) ||
                (tb.length < pb.length &&
                  java.util.Arrays.equals(
                    java.util.Arrays.copyOfRange(pb, 0, tb.length), tb))
            if (compatible) None else Some(false)
          case Some((_, None)) => Some(false) // null rows match no prefix
          case _ => None
        })
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
