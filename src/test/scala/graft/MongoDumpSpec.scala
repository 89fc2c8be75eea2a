package graft

import graft.sources.{Bson, MongoDumpScan, MongoExtJson}
import graft.sources.Bson.{BsonDateTime, BsonObjectId}
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec

/** The Mongo-dump ingest tier (S20/S21): BSON codec over the public
  * wire spec, extended-JSON normalization, and the DSv2 reader's
  * pruning / pushdown / drop-on-error contracts. */
class MongoDumpSpec extends SparkSpec {

  test("BSON codec round-trips every supported type, nested") {
    val doc: Seq[(String, Any)] = Seq(
      "_id" -> BsonObjectId("0123456789abcdef01234567"),
      "d" -> 1.5,
      "s" -> "héllo wörld",
      "nested" -> Map("a" -> 1, "b" -> 2L),
      "arr" -> Vector("x", 3L, 2.5),
      "flag" -> true,
      "when" -> BsonDateTime(1700000000123L),
      "nothing" -> null,
      "i32" -> 42,
      "i64" -> 9007199254740993L)
    val back = Bson.decode(Bson.encode(doc))
    assert(back("_id") == BsonObjectId("0123456789abcdef01234567"))
    assert(back("d") == 1.5)
    assert(back("s") == "héllo wörld")
    assert(back("nested") == Map("a" -> 1, "b" -> 2L))
    assert(back("arr") == Vector("x", 3L, 2.5))
    assert(back("flag") == true)
    assert(back("when") == BsonDateTime(1700000000123L))
    assert(back("nothing") == null)
    assert(back("i32") == 42)
    assert(back("i64") == 9007199254740993L)
  }

  test("BSON decode rejects malformed documents instead of misreading them") {
    val good = Bson.encode(Seq("a" -> 1))
    // wrong declared length
    val badLen = good.clone(); badLen(0) = (badLen(0) + 1).toByte
    assertThrows[Exception](Bson.decode(badLen))
    // missing terminator
    val badTerm = good.clone(); badTerm(badTerm.length - 1) = 7
    assertThrows[Exception](Bson.decode(badTerm))
    // unknown element type
    val badType = good.clone(); badType(4) = 0x63
    assertThrows[Exception](Bson.decode(badType))
  }

  test("extended JSON wrappers normalize to the BSON value model") {
    val m = new com.fasterxml.jackson.databind.ObjectMapper()
    def norm(s: String): Any = MongoExtJson.normalize(m.readTree(s))
    assert(norm("""{"$oid":"0123456789abcdef01234567"}""") ==
      BsonObjectId("0123456789abcdef01234567"))
    assert(norm("""{"$date":{"$numberLong":"1700000000123"}}""") ==
      BsonDateTime(1700000000123L))
    assert(norm("""{"$date":"2023-11-14T22:13:20.123Z"}""") ==
      BsonDateTime(1700000000123L))
    assert(norm("""{"$numberLong":"9007199254740993"}""") == 9007199254740993L)
    assert(norm("""{"$numberInt":"-7"}""") == -7)
    assert(norm("""{"$numberDouble":"1.5"}""") == 1.5)
    assert(norm("""{"$numberDecimal":"2.25"}""") == 2.25)
    assert(norm("""{"a":{"$numberLong":"1"},"b":[{"$numberInt":"2"},"x"]}""") ==
      Map("a" -> 1L, "b" -> Vector(2, "x")))
  }

  test("corrupt BSON document drops; reader resyncs on the length prefix") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("bson_resync").toString
    val out = new java.io.ByteArrayOutputStream()
    out.write(Bson.encode(Seq("_id" -> BsonObjectId("0" * 24),
      "event_id" -> 1L, "event_type" -> "a", "user_id" -> 1L,
      "value" -> 1.0, "ts" -> BsonDateTime(10L))))
    // honest framing, garbage payload → drop + resync
    out.write(Array[Byte](16, 0, 0, 0, 0x63, 1, 2, 3, 0, 1, 2, 3, 4, 5, 6, 0))
    out.write(Bson.encode(Seq("_id" -> BsonObjectId("f" * 24),
      "event_id" -> 2L, "event_type" -> "b", "user_id" -> 2L,
      "value" -> 2.0, "ts" -> BsonDateTime(20L))))
    // ragged tail → drop remainder
    out.write(Array[Byte](99, 0, 0, 0, 1))
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, "part-0.bson"), out.toByteArray)
    val got = spark.read.format("graft.sources.MongoDumpSource")
      .option("path", dir).load()
      .select($"event_id").as[Long].collect().sorted.toSeq
    assert(got == Seq(1L, 2L), s"resync failed: $got")
  }

  test("column pruning and filters reach the mongo reader; rows match an unpushed plan") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("bson_prune").toString
    val bytes = new java.io.ByteArrayOutputStream()
    (1L to 50L).foreach { i =>
      bytes.write(Bson.encode(Seq(
        "_id" -> BsonObjectId(f"$i%024x"),
        "event_id" -> i, "event_type" -> (if (i % 2 == 0) "click" else "view"),
        "user_id" -> i % 5, "value" -> i.toDouble, "ts" -> BsonDateTime(i * 1000))))
    }
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, "part-0.bson"), bytes.toByteArray)
    val df = spark.read.format("graft.sources.MongoDumpSource")
      .option("path", dir).load()
    val q = df.filter($"event_type" === "click" && $"event_id" <= 20L)
      .select($"user_id")
    def scanOf(d: org.apache.spark.sql.DataFrame): MongoDumpScan =
      d.queryExecution.executedPlan.collectFirst {
        case b: BatchScanExec => b.scan.asInstanceOf[MongoDumpScan]
      }.getOrElse(fail("no BatchScanExec in plan"))
    // pure projection prunes to exactly the selected column...
    assert(scanOf(df.select($"user_id")).required.fieldNames.toSeq == Seq("user_id"))
    // ...with residual filters the reader also materializes their inputs
    val scan = scanOf(q)
    assert(scan.required.fieldNames.toSeq ==
      Seq("event_id", "event_type", "user_id"),
      s"pruning missed the reader: ${scan.required.catalogString}")
    assert(scan.filters.length == 2,
      s"filters not pushed: ${scan.filters.mkString(", ")}")
    assert(q.as[Long].collect().sorted.toSeq ==
      (2L to 20L by 2).map(_ % 5).sorted.toSeq)
  }

  test("extjson reader drops malformed lines, decodes wrappers (incl. ISO $date)") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("extjson").toString
    val lines = Seq(
      """{"_id":{"$oid":"00000000000000000000000a"},"event_id":{"$numberLong":"1"},"event_type":"click","user_id":{"$numberLong":"7"},"value":{"$numberDouble":"1.5"},"ts":{"$date":"2023-11-14T22:13:20.123Z"}}""",
      """not json""",
      """{"_id":{"$oid":"00000000000000000000000b"},"event_id":{"$numberLong":"2"},"event_type":"view","user_id":{"$numberLong":"8"},"value":{"$numberDouble":"2.5"},"ts":{"$date":{"$numberLong":"42"}}}""")
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "docs.jsonl"),
      lines.mkString("", "\n", "\n").getBytes("UTF-8"))
    val got = spark.read.format("graft.sources.MongoDumpSource")
      .option("path", dir).option("format", "extjson").load()
      .select($"event_id", $"ts_ms").as[(Long, Long)].collect().sortBy(_._1).toSeq
    assert(got == Seq((1L, 1700000000123L), (2L, 42L)), s"got $got")
  }
}
