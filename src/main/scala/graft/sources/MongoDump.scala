package graft.sources

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.Filter
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import java.nio.{ByteBuffer, ByteOrder}

/** Minimal BSON codec over the PUBLIC wire spec (bsonspec.org) — the
  * byte format the reference's fact source actually reads: its Mongo
  * cursor decodes each document into a `bson.M`
  * (kafka-database-import.go:192) before wrapping it in the Kafka
  * envelope. A mongodump `.bson` file is nothing but those documents
  * concatenated: `int32 little-endian total length, elements…, 0x00`,
  * repeated to EOF. This codec covers the scalar subset the fact
  * documents carry (double, string, embedded doc, array, ObjectId,
  * bool, UTC datetime, null, int32, int64) and refuses anything else —
  * an undecodable document is DROPPED (the reference's §1.4
  * drop-on-error contract, go:188-197), and the length prefix lets the
  * reader resync on the next document.
  *
  * Values map to: Double, String, Map[String,Any], Vector[Any],
  * [[BsonObjectId]] (24-hex), Boolean, [[BsonDateTime]] (epoch ms),
  * null, Int, Long.
  */
object Bson {
  final case class BsonObjectId(hex: String) {
    require(hex.length == 24, s"ObjectId must be 24 hex chars: $hex")
  }
  final case class BsonDateTime(ms: Long)

  /** Max sane document size (the server's own hard cap is 16 MB) —
    * a length prefix beyond it means corrupt framing, not a real doc. */
  val MaxDocBytes: Int = 16 * 1024 * 1024

  // ---------------------------------------------------------------- encode

  def encode(doc: Seq[(String, Any)]): Array[Byte] = {
    val body = new java.io.ByteArrayOutputStream()
    doc.foreach { case (k, v) => writeElement(body, k, v) }
    val bytes = body.toByteArray
    val total = 4 + bytes.length + 1
    val out = ByteBuffer.allocate(total).order(ByteOrder.LITTLE_ENDIAN)
    out.putInt(total)
    out.put(bytes)
    out.put(0: Byte)
    out.array()
  }

  private def writeElement(out: java.io.ByteArrayOutputStream, name: String, v: Any): Unit = {
    def le32(i: Int): Array[Byte] =
      ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN).putInt(i).array()
    def le64(l: Long): Array[Byte] =
      ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN).putLong(l).array()
    def cstring(s: String): Unit = { out.write(s.getBytes("UTF-8")); out.write(0) }
    v match {
      case d: Double =>
        out.write(0x01); cstring(name)
        out.write(le64(java.lang.Double.doubleToLongBits(d)))
      case s: String =>
        out.write(0x02); cstring(name)
        val b = s.getBytes("UTF-8")
        out.write(le32(b.length + 1)); out.write(b); out.write(0)
      case m: Map[_, _] =>
        out.write(0x03); cstring(name)
        out.write(encode(m.toSeq.map { case (k, x) => (k.toString, x) }))
      case arr: Seq[_] =>
        out.write(0x04); cstring(name)
        out.write(encode(arr.zipWithIndex.map { case (x, i) => (i.toString, x) }))
      case BsonObjectId(hex) =>
        out.write(0x07); cstring(name)
        out.write(hex.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray)
      case b: Boolean =>
        out.write(0x08); cstring(name); out.write(if (b) 1 else 0)
      case BsonDateTime(ms) =>
        out.write(0x09); cstring(name); out.write(le64(ms))
      case null =>
        out.write(0x0A); cstring(name)
      case i: Int =>
        out.write(0x10); cstring(name); out.write(le32(i))
      case l: Long =>
        out.write(0x12); cstring(name); out.write(le64(l))
      case other =>
        throw new IllegalArgumentException(s"unsupported BSON value: $other")
    }
  }

  // ---------------------------------------------------------------- decode

  /** Decode one document from `bytes` (which must be exactly the
    * document: length prefix through terminator). Throws on any
    * malformation — callers drop the document. */
  def decode(bytes: Array[Byte]): Map[String, Any] = {
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val total = buf.getInt()
    require(total == bytes.length, s"framing: declared $total, got ${bytes.length}")
    require(bytes.length >= 5 && bytes(bytes.length - 1) == 0, "framing: bad terminator")
    readElements(buf, bytes.length - 1)
  }

  private def readElements(buf: ByteBuffer, end: Int): Map[String, Any] = {
    val m = Map.newBuilder[String, Any]
    while (buf.position() < end) {
      val t = buf.get()
      val name = readCString(buf)
      m += name -> readValue(t, buf)
    }
    require(buf.position() == end, "element ran past document terminator")
    m.result()
  }

  private def readCString(buf: ByteBuffer): String = {
    val sb = new java.io.ByteArrayOutputStream()
    var b = buf.get()
    while (b != 0) { sb.write(b); b = buf.get() }
    new String(sb.toByteArray, "UTF-8")
  }

  private def readValue(t: Byte, buf: ByteBuffer): Any = t match {
    case 0x01 => buf.getDouble()
    case 0x02 =>
      val len = buf.getInt()
      require(len >= 1 && len <= buf.remaining(), s"string length $len out of range")
      val b = new Array[Byte](len - 1)
      buf.get(b)
      require(buf.get() == 0, "string missing NUL")
      new String(b, "UTF-8")
    case 0x03 | 0x04 =>
      val start = buf.position()
      val len = buf.getInt()
      require(len >= 5 && start + len <= buf.limit(), s"subdocument length $len out of range")
      val inner = readElements(buf, start + len - 1)
      require(buf.get() == 0, "subdocument missing terminator")
      if (t == 0x04) inner.toVector.sortBy(_._1.toInt).map(_._2) else inner
    case 0x07 =>
      val b = new Array[Byte](12)
      buf.get(b)
      BsonObjectId(b.map("%02x".format(_)).mkString)
    case 0x08 => buf.get() == 1
    case 0x09 => BsonDateTime(buf.getLong())
    case 0x0A => null
    case 0x10 => buf.getInt()
    case 0x12 => buf.getLong()
    case other => throw new IllegalArgumentException(
      f"unsupported BSON type 0x$other%02x")
  }
}

/** Mongo EXTENDED JSON → plain values: the text form of the same
  * documents (what mongoexport emits), type wrappers normalized away.
  * Handles the wrappers the fact documents use — `$oid`, `$date` (ISO
  * string or `{$numberLong}`), `$numberInt/Long/Double/Decimal`,
  * `$binary` — returning the same value model as [[Bson.decode]]. */
object MongoExtJson {
  import Bson.{BsonDateTime, BsonObjectId}

  def normalize(n: JsonNode): Any = {
    if (n == null || n.isNull) return null
    if (n.isObject) {
      if (n.size() == 1) {
        val key = n.fieldNames().next()
        key match {
          case "$oid" => return BsonObjectId(n.get("$oid").asText())
          case "$date" =>
            val d = n.get("$date")
            return BsonDateTime(
              if (d.isTextual) java.time.Instant.parse(d.asText()).toEpochMilli
              else normalize(d) match {
                case l: Long => l
                case other => throw new IllegalArgumentException(s"bad \\$$date: $other")
              })
          case "$numberInt" => return n.get("$numberInt").asText().toInt
          case "$numberLong" => return n.get("$numberLong").asText().toLong
          case "$numberDouble" => return parseDouble(n.get("$numberDouble").asText())
          case "$numberDecimal" => return parseDouble(n.get("$numberDecimal").asText())
          case "$binary" => return n.get("$binary") // opaque: keep the wrapper node
          case _ => ()
        }
      }
      val it = n.fields()
      val m = Map.newBuilder[String, Any]
      while (it.hasNext) { val e = it.next(); m += e.getKey -> normalize(e.getValue) }
      m.result()
    } else if (n.isArray) {
      (0 until n.size()).map(i => normalize(n.get(i))).toVector
    } else if (n.isTextual) n.asText()
    else if (n.isBoolean) n.asBoolean()
    else if (n.isIntegralNumber) n.asLong()
    else if (n.isFloatingPointNumber) n.asDouble()
    else n.asText()
  }

  private def parseDouble(s: String): Double = s match {
    case "Infinity" => Double.PositiveInfinity
    case "-Infinity" => Double.NegativeInfinity
    case "NaN" => Double.NaN
    case x => x.toDouble
  }
}

/** DataSourceV2 source for MONGO-SHAPED DUMP FILES — the file-based
  * form of the reference's actual fact source. The reference holds a
  * live cursor and decodes each document with the driver's BSON codec
  * (`bson.M`, kafka-database-import.go:141-197); with zero egress and
  * no mongod in this container, the equivalent offline surface is the
  * dump those collections export to:
  *
  *  - `format=bson` (default): mongodump `.bson` files — concatenated
  *    length-prefixed BSON documents, decoded by [[Bson]];
  *  - `format=extjson`: mongoexport JSON-lines with extended-JSON type
  *    wrappers, normalized by [[MongoExtJson]].
  *
  * Same machinery as [[EnvelopeSource]] (S8): one InputPartition per
  * file (files are the unit of parallelism at 100 TB — the dump
  * shards them per collection chunk), column pruning into the reader,
  * comparison filters evaluated next to the decode with everything
  * kept residual (fast path, never a correctness risk), and §1.4
  * drop-on-error: an undecodable document is skipped and the reader
  * resyncs on the next length prefix; a truncated tail or corrupt
  * framing drops the remainder of that file only.
  *
  * Rows surface as the flattened fact schema: `_id` (ObjectId hex),
  * `event_id`, `event_type`, `user_id`, `value`, `ts_ms` (BSON UTC
  * datetime as epoch millis — timezone-free, like the wire format).
  *
  * Usage: `spark.read.format("graft.sources.MongoDumpSource")
  * .option("path", dir).option("format", "bson").load()`.
  */
class MongoDumpSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    MongoDumpSource.fullSchema

  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table =
    new MongoDumpTable(
      properties.get("path"),
      Option(properties.get("format")).getOrElse("bson"))

  override def supportsExternalMetadata(): Boolean = false
}

object MongoDumpSource {
  val fullSchema: StructType = StructType(Seq(
    StructField("_id", StringType),
    StructField("event_id", LongType),
    StructField("event_type", StringType),
    StructField("user_id", LongType),
    StructField("value", DoubleType),
    StructField("ts_ms", LongType)))

  private val fields = fullSchema.fieldNames.toSet

  def supportedFilter(f: Filter): Boolean = f match {
    case org.apache.spark.sql.sources.EqualTo(a, _) => fields(a)
    case org.apache.spark.sql.sources.GreaterThan(a, _) => fields(a)
    case org.apache.spark.sql.sources.GreaterThanOrEqual(a, _) => fields(a)
    case org.apache.spark.sql.sources.LessThan(a, _) => fields(a)
    case org.apache.spark.sql.sources.LessThanOrEqual(a, _) => fields(a)
    case _ => false
  }

  /** Flatten one decoded document to the fact schema's field values. */
  def fieldOf(doc: Map[String, Any], name: String): Any = {
    def long(v: Any): Any = v match {
      case l: Long => Long.box(l)
      case i: Int => Long.box(i.toLong)
      case _ => null
    }
    name match {
      case "_id" => doc.get("_id").orNull match {
        case Bson.BsonObjectId(hex) => hex
        case s: String => s
        case _ => null
      }
      case "event_id" => long(doc.get("event_id").orNull)
      case "user_id" => long(doc.get("user_id").orNull)
      case "event_type" => doc.get("event_type").orNull match {
        case s: String => s
        case _ => null
      }
      case "value" => doc.get("value").orNull match {
        case d: Double => Double.box(d)
        case l: Long => Double.box(l.toDouble)
        case i: Int => Double.box(i.toDouble)
        case _ => null
      }
      case "ts_ms" => doc.get("ts").orNull match {
        case Bson.BsonDateTime(ms) => Long.box(ms)
        case l: Long => Long.box(l)
        case _ => null
      }
      case _ => null
    }
  }
}

class MongoDumpTable(path: String, format: String)
    extends Table with SupportsRead {
  override def name(): String = s"mongodump($path)"
  override def schema(): StructType = MongoDumpSource.fullSchema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new MongoDumpScanBuilder(
      Option(path).getOrElse(options.get("path")),
      Option(format).getOrElse(
        Option(options.get("format")).getOrElse("bson")))
}

class MongoDumpScanBuilder(path: String, format: String)
    extends ScanBuilder
    with SupportsPushDownFilters
    with SupportsPushDownRequiredColumns {

  private var required: StructType = MongoDumpSource.fullSchema
  private var pushed: Array[Filter] = Array.empty

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    pushed = filters.filter(MongoDumpSource.supportedFilter)
    filters // all residual — pushdown is a fast path only (S8 contract)
  }
  override def pushedFilters(): Array[Filter] = pushed
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan = MongoDumpScan(path, format, required, pushed)
}

case class MongoDumpScan(
    path: String, format: String, required: StructType, filters: Array[Filter])
    extends Scan with Batch {

  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"MongoDumpScan path=$path format=$format, " +
      s"PushedMongoFilters=[${filters.mkString(", ")}], " +
      s"ReadSchema=${required.catalogString}"

  override def planInputPartitions(): Array[InputPartition] = {
    val conf = SparkSession.active.sessionState.newHadoopConf()
    val root = new Path(path)
    val fs = FileSystem.get(root.toUri, conf)
    if (!fs.exists(root)) return Array.empty
    fs.listStatus(root)
      .filter(st => st.isFile && !st.getPath.getName.startsWith("_")
        && !st.getPath.getName.startsWith("."))
      .sortBy(_.getPath.getName)
      .map(st => MongoDumpInputPartition(st.getPath.toString, format): InputPartition)
  }

  override def createReaderFactory(): PartitionReaderFactory =
    MongoDumpReaderFactory(required, filters)
}

case class MongoDumpInputPartition(file: String, format: String)
    extends InputPartition

case class MongoDumpReaderFactory(required: StructType, filters: Array[Filter])
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[MongoDumpInputPartition]
    if (p.format == "extjson")
      new MongoExtJsonPartitionReader(p.file, required, filters)
    else new BsonDumpPartitionReader(p.file, required, filters)
  }
}

/** Shared project/filter/emit half of both readers: documents come in
  * as the [[Bson]] value model; pushed filters are evaluated on the
  * flattened fields (reusing [[EnvelopeFilters.eval]] — same
  * comparison semantics as the envelope source), then the row is
  * projected to the pruned schema. */
abstract class MongoPartitionReaderBase(
    required: StructType, filters: Array[Filter])
    extends PartitionReader[InternalRow] {

  private var row: InternalRow = _

  /** Next decoded document, or null at end of file. Implementations
    * DROP undecodable documents internally (§1.4). */
  protected def nextDoc(): Map[String, Any]

  override def next(): Boolean = {
    var doc = nextDoc()
    while (doc != null) {
      val projected = project(doc)
      if (projected != null) { row = projected; return true }
      doc = nextDoc()
    }
    false
  }

  private def project(doc: Map[String, Any]): InternalRow = {
    def field(name: String): Any = MongoDumpSource.fieldOf(doc, name)
    var i = 0
    while (i < filters.length) {
      if (!EnvelopeFilters.eval(filters(i), field)) return null
      i += 1
    }
    val out = new GenericInternalRow(required.length)
    i = 0
    while (i < required.length) {
      out(i) = field(required(i).name) match {
        case s: String => UTF8String.fromString(s)
        case other => other
      }
      i += 1
    }
    out
  }

  override def get(): InternalRow = row
}

/** `.bson` dump reader: length-prefixed documents streamed off the
  * filesystem. A document that fails decode is dropped and the length
  * prefix carries the reader to the next one (resync); an implausible
  * length (< 5, > 16 MB, or past EOF) means the framing itself is
  * corrupt — the remainder of the file drops. */
class BsonDumpPartitionReader(
    file: String, required: StructType, filters: Array[Filter])
    extends MongoPartitionReaderBase(required, filters) {

  private val in = {
    val p = new Path(file)
    val fs = FileSystem.get(p.toUri, CommitLogSource.readerConf)
    new java.io.DataInputStream(new java.io.BufferedInputStream(fs.open(p)))
  }
  private var exhausted = false

  override protected def nextDoc(): Map[String, Any] = {
    while (!exhausted) {
      val lenBytes = new Array[Byte](4)
      val n = in.read(lenBytes)
      if (n < 4) { exhausted = true; return null } // clean EOF (or ragged tail)
      val len = ByteBuffer.wrap(lenBytes).order(ByteOrder.LITTLE_ENDIAN).getInt()
      if (len < 5 || len > Bson.MaxDocBytes) { exhausted = true; return null }
      val doc = new Array[Byte](len)
      System.arraycopy(lenBytes, 0, doc, 0, 4)
      try in.readFully(doc, 4, len - 4)
      catch { case _: java.io.EOFException => exhausted = true; return null }
      try return Bson.decode(doc)
      catch { case _: Exception => () } // corrupt document: drop, resync
    }
    null
  }

  override def close(): Unit = in.close()
}

/** mongoexport JSON-lines reader: one extended-JSON document per line;
  * a line that fails parse or normalization drops. */
class MongoExtJsonPartitionReader(
    file: String, required: StructType, filters: Array[Filter])
    extends MongoPartitionReaderBase(required, filters) {

  private val mapper = new ObjectMapper()
  private val reader = {
    val p = new Path(file)
    val fs = FileSystem.get(p.toUri, CommitLogSource.readerConf)
    new java.io.BufferedReader(
      new java.io.InputStreamReader(fs.open(p), "UTF-8"))
  }

  override protected def nextDoc(): Map[String, Any] = {
    var line = reader.readLine()
    while (line != null) {
      if (line.nonEmpty) {
        try {
          MongoExtJson.normalize(mapper.readTree(line)) match {
            case m: Map[_, _] =>
              return m.map { case (k, v) => (k.toString, v) }
            case _ => () // not a document: drop
          }
        } catch { case _: Exception => () } // malformed line: drop
      }
      line = reader.readLine()
    }
    null
  }

  override def close(): Unit = reader.close()
}
