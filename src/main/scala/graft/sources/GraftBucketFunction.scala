package graft.sources

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.functions.{BoundFunction, ScalarFunction, UnboundFunction}
import org.apache.spark.sql.types._

/** The catalog-resolved `bucket` function behind SURVEY S81's hash
  * partitioning — what makes storage-partitioned joins work over
  * `PARTITIONED BY (bucket(N, k))` tables: Spark's SPJ resolves a
  * reported bucket transform through the table catalog's
  * FunctionCatalog (`V2ExpressionUtils.loadV2FunctionOpt`), compares
  * both sides by the bound function's CANONICAL NAME + bucket count,
  * and — under `spark.sql.sources.v2.bucketing.shuffle.enabled` — may
  * EVALUATE it to co-shuffle an unbucketed side, so `produceResult`
  * must compute exactly the id [[CommitLogBucket]]'s writer recorded.
  *
  * Binding shape is Spark's bucket-transform convention: inputs
  * `(numBuckets INT, key)`; the result is the bucket id, null for a
  * null key (the writer routes null keys to the null tuple token, and
  * a co-shuffled null must land with them, not in bucket
  * hash(whatever)). */
object GraftBucketFunction extends UnboundFunction {
  override def name(): String = "bucket"
  override def description(): String =
    "bucket(n, key): engine-canonical hash bucket id (Murmur3 of the " +
      "long form for integrals, UTF-8 bytes for strings, floorMod n)"

  override def bind(inputType: StructType): BoundFunction = {
    require(inputType.fields.length == 2,
      s"bucket takes (numBuckets, key) — got ${inputType.simpleString}")
    val nType = inputType.fields(0).dataType
    require(nType == IntegerType || nType == LongType,
      s"bucket count must be integral — got ${nType.simpleString}")
    val keyType = inputType.fields(1).dataType
    require(CommitLogBucket.supported(keyType),
      s"bucket key must be integral, date/timestamp or string — got " +
        keyType.simpleString)
    new Bound(keyType)
  }

  private final class Bound(keyType: DataType)
      extends ScalarFunction[Integer] {
    override def inputTypes(): Array[DataType] = Array(IntegerType, keyType)
    override def resultType(): DataType = IntegerType
    override def isResultNullable: Boolean = true // null key -> null id
    override def name(): String = "bucket"
    // SPJ compatibility hinges on this string: two scans' bucket
    // transforms are the same partitioning iff canonical names and
    // bucket counts agree
    override def canonicalName(): String = s"graft.bucket(${keyType.sql})"
    override def produceResult(input: InternalRow): Integer = {
      if (input.isNullAt(1)) return null
      val n = input.getInt(0)
      keyType match {
        case LongType | TimestampType =>
          Int.box(CommitLogBucket.idOfLong(input.getLong(1), n))
        case IntegerType | DateType =>
          Int.box(CommitLogBucket.idOfLong(input.getInt(1).toLong, n))
        case ShortType =>
          Int.box(CommitLogBucket.idOfLong(input.getShort(1).toLong, n))
        case ByteType =>
          Int.box(CommitLogBucket.idOfLong(input.getByte(1).toLong, n))
        case StringType =>
          Int.box(CommitLogBucket.idOfBytes(input.getUTF8String(1).getBytes, n))
        case other => throw new UnsupportedOperationException(
          s"bucket over $other")
      }
    }
  }
}

/** The monotone time transforms as catalog functions — `days(ts)`,
  * `hours(ts)`, `months(ts)`, `years(ts)` (SURVEY S82) — so SPJ
  * resolves a scan's reported time transform exactly like bucket.
  * Result is the int epoch-count [[CommitLogMonotone.timeValue]]
  * records as the tuple token; null in, null out. */
final class GraftTimeFunction(unit: String) extends UnboundFunction {
  override def name(): String = unit
  override def description(): String =
    s"$unit(ts): int count of $unit since the epoch (partition transform)"

  override def bind(inputType: StructType): BoundFunction = {
    require(inputType.fields.length == 1,
      s"$unit takes one timestamp/date argument — got ${inputType.simpleString}")
    val keyType = inputType.fields(0).dataType
    require(keyType == TimestampType || keyType == DateType,
      s"$unit needs a timestamp or date — got ${keyType.simpleString}")
    val spec = CommitLogMonotone.Time(unit, "k")
    new ScalarFunction[Integer] {
      override def inputTypes(): Array[DataType] = Array(keyType)
      override def resultType(): DataType = IntegerType
      override def isResultNullable: Boolean = true
      override def name(): String = unit
      override def canonicalName(): String = s"graft.$unit"
      override def produceResult(input: InternalRow): Integer = {
        if (input.isNullAt(0)) return null
        val v = keyType match {
          case TimestampType => input.getLong(0)
          case _ => input.getInt(0).toLong
        }
        Int.box(CommitLogMonotone.timeValue(spec, keyType, v).toInt)
      }
    }
  }
}

/** `truncate(w, col)` as a catalog function: floored multiple for
  * integrals (long result), W-codepoint prefix for strings. */
object GraftTruncateFunction extends UnboundFunction {
  override def name(): String = "truncate"
  override def description(): String =
    "truncate(w, col): floor to a multiple of w (integrals) or the " +
      "first w codepoints (strings) — partition transform"

  override def bind(inputType: StructType): BoundFunction = {
    require(inputType.fields.length == 2,
      s"truncate takes (width, col) — got ${inputType.simpleString}")
    val wType = inputType.fields(0).dataType
    require(wType == IntegerType || wType == LongType,
      s"truncate width must be integral — got ${wType.simpleString}")
    val keyType = inputType.fields(1).dataType
    keyType match {
      case ByteType | ShortType | IntegerType | LongType =>
        new ScalarFunction[java.lang.Long] {
          override def inputTypes(): Array[DataType] = Array(IntegerType, keyType)
          override def resultType(): DataType = LongType
          override def isResultNullable: Boolean = true
          override def name(): String = "truncate"
          override def canonicalName(): String = "graft.truncate"
          override def produceResult(input: InternalRow): java.lang.Long = {
            if (input.isNullAt(1)) return null
            val v = keyType match {
              case LongType => input.getLong(1)
              case IntegerType => input.getInt(1).toLong
              case ShortType => input.getShort(1).toLong
              case ByteType => input.getByte(1).toLong
            }
            Long.box(CommitLogMonotone.truncLong(input.getInt(0), v))
          }
        }
      case StringType =>
        new ScalarFunction[org.apache.spark.unsafe.types.UTF8String] {
          override def inputTypes(): Array[DataType] = Array(IntegerType, keyType)
          override def resultType(): DataType = StringType
          override def isResultNullable: Boolean = true
          override def name(): String = "truncate"
          override def canonicalName(): String = "graft.truncate(string)"
          override def produceResult(input: InternalRow)
              : org.apache.spark.unsafe.types.UTF8String = {
            if (input.isNullAt(1)) return null
            org.apache.spark.unsafe.types.UTF8String.fromBytes(
              CommitLogMonotone.truncChars(
                input.getInt(0), input.getUTF8String(1).getBytes))
          }
        }
      case other => throw new IllegalArgumentException(
        s"truncate needs an integral or string column — got ${other.simpleString}")
    }
  }
}
