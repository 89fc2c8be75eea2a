package graft

import graft.sources.{EnvelopeScan, KafkaIO}
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._

/** Pushdown contract of the custom DSv2 envelope source: pruning
  * reaches the reader's schema, supported filters reach the reader,
  * and results survive both (Spark re-checks residuals, so pushdown
  * can only drop work, never rows). */
class EnvelopeSourceSpec extends SparkSpec {

  private lazy val path = {
    val p = "/tmp/graft_io/spec_envelope"
    KafkaIO.toEnvelope(Tables(spark, sf0001, "events"))
      .select(col("value"))
      .write.mode("overwrite").text(p)
    p
  }

  private def read =
    spark.read.format("graft.sources.EnvelopeSource").option("path", path).load()

  private def scanOf(df: org.apache.spark.sql.DataFrame): EnvelopeScan =
    df.queryExecution.executedPlan.collectFirst {
      case b: BatchScanExec => b.scan.asInstanceOf[EnvelopeScan]
    }.getOrElse(fail("no BatchScanExec in plan"))

  test("round trip preserves every row and field") {
    import spark.implicits._
    val ev = Tables(spark, sf0001, "events")
      .select($"event_id", $"event_type", $"user_id", $"value")
    val back = read.select($"event_id", $"event_type", $"user_id", $"value")
    assert(back.count() == ev.count())
    assert(back.exceptAll(ev).isEmpty && ev.exceptAll(back).isEmpty)
  }

  test("column pruning reaches the reader") {
    import spark.implicits._
    val scan = scanOf(read.select($"user_id"))
    assert(scan.required.fieldNames.toSeq == Seq("user_id"),
      s"expected pruned schema, got ${scan.required.catalogString}")
  }

  test("supported filters are pushed into the reader; rows match an unpushed plan") {
    import spark.implicits._
    val filtered = read.filter($"event_type" === "purchase" && $"user_id" < 50)
    val scan = scanOf(filtered)
    assert(scan.filters.length == 2,
      s"expected 2 pushed filters, got ${scan.filters.mkString(", ")}")
    val expected = Tables(spark, sf0001, "events")
      .filter($"event_type" === "purchase" && $"user_id" < 50).count()
    assert(filtered.count() == expected)
  }

  test("malformed lines drop (R6 semantics), valid lines survive") {
    import spark.implicits._
    val p = "/tmp/graft_io/spec_envelope_corrupt"
    Seq(
      """{"data":{"event_id":1,"event_type":"click","user_id":7,"value":1.5},"source":"database"}""",
      """this is not json""",
      """{"data":{"event_id":2,"event_type":"view","user_id":8,"value":2.5},"source":"database"}""")
      .toDF("value").coalesce(1).write.mode("overwrite").text(p)
    val rows = spark.read.format("graft.sources.EnvelopeSource")
      .option("path", p).load()
      .select($"event_id").as[Long].collect().sorted.toSeq
    assert(rows == Seq(1L, 2L))
  }
}
