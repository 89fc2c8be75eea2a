package graft

import graft.sources.{Bson, BsonDumpPartitionReader, MongoExtJsonPartitionReader}
import graft.sources.Bson.{BsonDateTime, BsonObjectId}
import org.apache.spark.sql.types.StructType
import org.scalacheck.{Gen, Prop, Properties}

/** ScalaCheck laws for the BSON dump tier (S20): codec round-trip on
  * arbitrary nested documents, and the reader's §1.4 drop-on-error
  * contract under byte-level fuzz — a corrupted or truncated stream
  * never throws, never desyncs documents before the damage, and
  * resyncs on the length prefix after it. Exercises the REAL
  * partition reader (a probe subclass over its protected cursor),
  * not a reimplementation of the loop. */
object MongoDumpProps extends Properties("graft.mongodump") {

  // ------------------------------------------------------ generators

  private val fieldName: Gen[String] =
    Gen.choose(1, 8).flatMap(n => Gen.stringOfN(n, Gen.alphaNumChar))

  private val scalar: Gen[Any] = Gen.oneOf(
    Gen.chooseNum(-1e12, 1e12).map(d => d: Any),
    Gen.alphaNumStr.map(s => s: Any),
    Gen.chooseNum(Int.MinValue, Int.MaxValue).map(i => i: Any),
    Gen.chooseNum(Long.MinValue, Long.MaxValue).map(l => l: Any),
    Gen.oneOf(true, false).map(b => b: Any),
    Gen.const(null: Any),
    Gen.listOfN(24, Gen.oneOf("0123456789abcdef".toSeq))
      .map(cs => BsonObjectId(cs.mkString): Any),
    Gen.chooseNum(-62135596800000L, 253402300799999L)
      .map(ms => BsonDateTime(ms): Any))

  private def value(depth: Int): Gen[Any] =
    if (depth <= 0) scalar
    else Gen.frequency(
      6 -> scalar,
      1 -> Gen.choose(0, 3)
        .flatMap(n => Gen.listOfN(n, value(depth - 1)).map(_.toVector: Any)),
      1 -> Gen.choose(0, 3).flatMap(n =>
        Gen.listOfN(n, Gen.zip(fieldName, value(depth - 1)))
          .map(kvs => kvs.toMap: Any)))

  /** One document: 1–6 distinct-keyed fields, values nested ≤ 2 deep. */
  private val docGen: Gen[Seq[(String, Any)]] =
    Gen.choose(1, 6).flatMap(n =>
      Gen.listOfN(n, Gen.zip(fieldName, value(2)))
        .map(_.distinctBy(_._1)))

  private val dumpGen: Gen[List[Seq[(String, Any)]]] =
    Gen.choose(1, 5).flatMap(Gen.listOfN(_, docGen))

  // ------------------------------------------------------- plumbing

  /** The real S20 reader with its protected cursor exposed; empty
    * required schema + no filters so drained docs are the raw decoded
    * value model (project() never rejects on an empty filter set). */
  private class ProbeReader(file: String) extends BsonDumpPartitionReader(
      file, new StructType(), Array.empty[org.apache.spark.sql.sources.Filter]) {
    def drain(): Vector[Map[String, Any]] = {
      val b = Vector.newBuilder[Map[String, Any]]
      var d = nextDoc()
      while (d != null) { b += d; d = nextDoc() }
      close()
      b.result()
    }
  }

  private def withDump[A](bytes: Array[Byte])(f: String => A): A = {
    val tmp = java.io.File.createTempFile("graft-bson-props", ".bson")
    try {
      java.nio.file.Files.write(tmp.toPath, bytes)
      f(tmp.getAbsolutePath)
    } finally tmp.delete()
  }

  // ------------------------------------------------------ properties

  property("codec round-trips arbitrary nested documents") =
    Prop.forAll(docGen) { doc =>
      Bson.decode(Bson.encode(doc)) == doc.toMap
    }

  property("stream of clean documents is recovered exactly, in order") =
    Prop.forAll(dumpGen) { docs =>
      val encoded = docs.map(Bson.encode)
      withDump(encoded.toArray.flatten) { f =>
        new ProbeReader(f).drain() == docs.map(_.toMap).toVector
      }
    }

  property("one flipped byte: no throw, no loss before it, resync after it") =
    Prop.forAll(dumpGen, Gen.choose(0, Int.MaxValue), Gen.choose(0, Int.MaxValue)) {
      (docs, whichSeed, offSeed) =>
        val encoded = docs.map(Bson.encode)
        val i = whichSeed % docs.length
        val off = offSeed % encoded(i).length
        val bytes = encoded.toArray.flatten
        val abs = encoded.take(i).map(_.length).sum + off
        bytes(abs) = (bytes(abs) ^ 0xFF).toByte
        val expect = docs.map(_.toMap).toVector
        val out = withDump(bytes)(f => new ProbeReader(f).drain())
        val before = out.take(i) == expect.take(i)
        if (off < 4) {
          // corrupted length prefix: framing itself is damaged — the
          // documents already emitted must be intact; nothing stronger
          // is promised for the remainder
          Prop(before) :| "prefix-corrupt: docs before the damage intact"
        } else {
          // corrupted body: the length prefix still carries the reader
          // to the next boundary — every OTHER document is recovered
          // exactly; the damaged one either drops or decodes altered
          val after = out.drop(out.length - (docs.length - i - 1)) ==
            expect.drop(i + 1)
          val countOk =
            out.length == expect.length || out.length == expect.length - 1
          (Prop(before) :| "docs before the damage intact") &&
            (Prop(after) :| "docs after the damage resync exactly") &&
            (Prop(countOk) :| "damaged doc drops or survives, never duplicates")
        }
    }

  property("truncation at any offset yields exactly the fully-contained docs") =
    Prop.forAll(dumpGen, Gen.choose(0, Int.MaxValue)) { (docs, tSeed) =>
      val encoded = docs.map(Bson.encode)
      val bytes = encoded.toArray.flatten
      val t = tSeed % bytes.length
      val ends = encoded.scanLeft(0)(_ + _.length).tail
      val expect = docs.map(_.toMap).zip(ends)
        .takeWhile(_._2 <= t).map(_._1).toVector
      withDump(bytes.take(t))(f => new ProbeReader(f).drain()) == expect
    }

  // ------------------------------------------- extended JSON (S21)

  /** Test-side mongoexport serializer: the canonical wrapper for every
    * type whose plain-JSON form is lossy (Int, Double, ObjectId,
    * DateTime); plain JSON where it round-trips (Long, Boolean,
    * String, null). Generated field names are alphanumeric, so they
    * can never collide with the `$`-prefixed wrapper keys. */
  private val jackson = new com.fasterxml.jackson.databind.ObjectMapper()
  private def toExtJson(v: Any): com.fasterxml.jackson.databind.JsonNode = {
    import com.fasterxml.jackson.databind.node.JsonNodeFactory.{instance => jf}
    v match {
      case null => jf.nullNode()
      case s: String => jf.textNode(s)
      case b: Boolean => jf.booleanNode(b)
      case l: Long => jf.numberNode(l)
      case i: Int => jf.objectNode().put("$numberInt", i.toString)
      case d: Double => jf.objectNode().put("$numberDouble", d.toString)
      case BsonObjectId(hex) => jf.objectNode().put("$oid", hex)
      case BsonDateTime(ms) =>
        jf.objectNode().set[com.fasterxml.jackson.databind.JsonNode]("$date",
          jf.objectNode().put("$numberLong", ms.toString))
      case xs: Seq[_] =>
        val a = jf.arrayNode(); xs.foreach(x => a.add(toExtJson(x))); a
      case m: Map[_, _] =>
        val o = jf.objectNode()
        m.foreach { case (k, x) =>
          o.set[com.fasterxml.jackson.databind.JsonNode](k.toString, toExtJson(x)) }
        o
    }
  }
  private def toLine(doc: Seq[(String, Any)]): String =
    jackson.writeValueAsString(toExtJson(doc.toMap))

  private class ExtProbeReader(file: String) extends MongoExtJsonPartitionReader(
      file, new StructType(), Array.empty[org.apache.spark.sql.sources.Filter]) {
    def drain(): Vector[Map[String, Any]] = {
      val b = Vector.newBuilder[Map[String, Any]]
      var d = nextDoc()
      while (d != null) { b += d; d = nextDoc() }
      close()
      b.result()
    }
  }

  property("extjson lines round-trip the wrapper normalization exactly") =
    Prop.forAll(dumpGen) { docs =>
      val bytes = docs.map(toLine).mkString("", "\n", "\n").getBytes("UTF-8")
      withDump(bytes)(f => new ExtProbeReader(f).drain()) ==
        docs.map(_.toMap).toVector
    }

  property("a truncated extjson line drops alone; every other line survives") =
    Prop.forAll(dumpGen, Gen.choose(0, Int.MaxValue), Gen.choose(0, Int.MaxValue)) {
      (docs, whichSeed, cutSeed) =>
        val lines = docs.map(toLine)
        val i = whichSeed % lines.length
        // a strict prefix of a top-level JSON object is never valid
        // JSON (the matching close brace is the final char), so any
        // cut point makes the line malformed — §1.4 drops it alone
        val cut = 1 + cutSeed % (lines(i).length - 1)
        val fuzzed = lines.updated(i, lines(i).take(cut))
        val bytes = fuzzed.mkString("", "\n", "\n").getBytes("UTF-8")
        val expect = docs.map(_.toMap).zipWithIndex
          .collect { case (d, j) if j != i => d }.toVector
        withDump(bytes)(f => new ExtProbeReader(f).drain()) == expect
    }
}
