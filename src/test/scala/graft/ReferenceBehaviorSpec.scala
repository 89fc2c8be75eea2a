package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** SURVEY §5.4 — the reference's load-bearing quirks as executable
  * documentation (behavior studied from the public reference repo;
  * nothing copied).
  */
class ReferenceBehaviorSpec extends SparkSpec {

  // R7/R8 (kafka-database-import.go:199-200): envelope shape is exactly
  // {"data": <doc>, "source": "database"}.
  test("R7/R8: envelope serializes as data+source with literal 'database'") {
    import spark.implicits._
    val df = Seq((1L, "click")).toDF("event_id", "event_type")
      .select(to_json(struct(
        struct($"event_id", $"event_type").as("data"),
        lit("database").as("source"))).as("value"))
    assert(df.head.getString(0) ==
      """{"data":{"event_id":1,"event_type":"click"},"source":"database"}""")
  }

  // R6 (kafka-database-import.go:188-197): a record that fails to decode
  // is dropped and the pipeline continues — PERMISSIVE + corrupt-column
  // filter is the Spark form.
  test("R6: permissive JSON parse drops corrupt records, keeps the rest") {
    import spark.implicits._
    val lines = Seq(
      """{"user_id": 1, "v": 10}""",
      """{"user_id": 2, "v": }""", // corrupt
      """not json at all""", // corrupt
      """{"user_id": 3, "v": 30}""")
    val schema = StructType(Seq(
      StructField("user_id", LongType),
      StructField("v", LongType),
      StructField("_corrupt_record", StringType)))
    val parsed = spark.read
      .schema(schema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(lines.toDS())
    val good = parsed.filter($"_corrupt_record".isNull).drop("_corrupt_record")
    assert(good.count() == 2)
    assert(good.agg(sum($"v")).head.getLong(0) == 40)
    // and the corrupt ones are observable (for R10-style counters)
    assert(parsed.filter($"_corrupt_record".isNotNull).count() == 2)
  }

  // R5 (kafka-database-import.go:111,180-185): the reference's MaxRecs
  // check passes rows 1..250001 (off-by-one). The engine documents the
  // quirk and uses clean limit(n) semantics: exactly n rows pass.
  test("R5: engine limit(n) is exact (reference off-by-one NOT reproduced)") {
    val li = Tables(spark, sf0001, "lineitem")
    assert(li.limit(250).count() == 250)
  }

  // R4: the reference evaluates the allowlist as a pushed-down $in;
  // the Spark form is a broadcast semi-join with identical semantics to
  // an isin() filter.
  test("R4: broadcast semi-join ≡ isin filter") {
    import spark.implicits._
    val ev = Tables(spark, sf0001, "events")
    val allow = ev.filter($"event_type" === "signup").select($"user_id").distinct()
    val semi = ev.join(broadcast(allow), Seq("user_id"), "left_semi").count()
    val ids = allow.as[Long].collect().toSeq
    val isin = ev.filter($"user_id".isin(ids: _*)).count()
    assert(semi == isin)
  }
}
