package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Checkpointed recovery: a streaming query stopped and restarted on
  * the same checkpoint must process each input exactly once — the
  * at-least-once + idempotent-sink upgrade over the reference's
  * at-most-once drop-on-error delivery (kafka-database-import.go:211-214). */
class StreamingRecoverySpec extends SparkSpec {

  test("Trigger.AvailableNow drains the backlog, stops, and resumes incrementally") {
    // the incremental-batch pattern that replaces nightly full reloads:
    // each invocation processes exactly the files that arrived since
    // the last checkpoint, then terminates on its own — same code path
    // as the always-on stream, scheduled like a batch job
    import org.apache.spark.sql.streaming.Trigger
    val base = "/tmp/graft_stream_an"
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty).foreach(rm)
      f.delete()
    }
    rm(new java.io.File(base))
    val (inDir, ckpt, outDir) = (s"$base/in", s"$base/ckpt", s"$base/out")
    new java.io.File(inDir).mkdirs()
    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("v", LongType)))
    def writeFile(name: String, ids: Range): Unit =
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"$inDir/$name.json"),
        ids.map(i => s"""{"event_id": $i, "v": ${i * 10}}""")
          .mkString("\n").getBytes("UTF-8"))
    def runOnce(): Unit = {
      val q = spark.readStream.schema(schema).json(inDir)
        .writeStream.format("parquet")
        .option("path", outDir).option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination(60000) // AvailableNow self-terminates
      assert(!q.isActive, "AvailableNow query did not stop on its own")
    }
    writeFile("b1", 0 until 40)
    runOnce()
    assert(spark.read.parquet(outDir).count() == 40)
    writeFile("b2", 40 until 70)
    runOnce()
    // second run processed ONLY the new file: 70 total, no duplicates
    val ids = spark.read.parquet(outDir)
      .select("event_id").collect().map(_.getLong(0)).sorted
    assert(ids.length == 70 && ids.distinct.length == 70,
      s"expected 70 distinct ids, got ${ids.length}")
  }

  test("restarted query resumes from the checkpoint, no loss, no dupes") {
    import spark.implicits._
    val base = "/tmp/graft_stream"
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm)
      f.delete()
    }
    rm(new java.io.File(base))
    val inDir = s"$base/in"
    val ckpt = s"$base/ckpt"
    new java.io.File(inDir).mkdirs()

    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("v", LongType)))

    def writeFile(name: String, ids: Range): Unit = {
      val lines = ids.map(i => s"""{"event_id": $i, "v": ${i * 10}}""")
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"$inDir/$name.json"),
        lines.mkString("\n").getBytes("UTF-8"))
    }

    val url = "jdbc:derby:memory:graft_recovery;create=true"
    val props = new java.util.Properties()
    props.setProperty("driver", "org.apache.derby.jdbc.EmbeddedDriver")
    // seed an empty sink table
    Seq.empty[(Long, Long)].toDF("event_id", "v")
      .write.mode("overwrite").jdbc(url, "rec_sink", props)

    def startQuery() =
      spark.readStream.schema(schema).json(inDir)
        .writeStream
        .option("checkpointLocation", ckpt)
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
          df.write.mode("append").jdbc(url, "rec_sink", props)
        }
        .start()

    writeFile("f1", 0 until 50)
    writeFile("f2", 50 until 80)
    val q1 = startQuery()
    q1.processAllAvailable()
    q1.stop()
    assert(spark.read.jdbc(url, "rec_sink", props).count() == 80)

    // new data arrives while the query is down
    writeFile("f3", 80 until 100)
    val q2 = startQuery()
    q2.processAllAvailable()
    q2.stop()

    val sunk = spark.read.jdbc(url, "rec_sink", props)
    assert(sunk.count() == 100, "lost or duplicated rows across restart")
    assert(sunk.select(countDistinct($"event_id")).head.getLong(0) == 100,
      "duplicate event_ids after recovery")
  }

  test("north-star pipeline: landing files -> allowlist semi-join -> idempotent JDBC, across restart") {
    // the reference's whole job (scan -> user-filter semi-join ->
    // envelope -> single sink), upgraded to Structured Streaming with
    // the DISTRIBUTED exactly-once JDBC sink: stopped and restarted on
    // the same checkpoint, the target table holds exactly the allowed
    // rows, once each, with no rows ever passing through the driver.
    import graft.streaming.Streams
    import spark.implicits._
    val base = "/tmp/graft_stream_ns"
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm)
      f.delete()
    }
    rm(new java.io.File(base))
    val inDir = s"$base/in"
    val ckpt = s"$base/ckpt"
    new java.io.File(inDir).mkdirs()

    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("user_id", LongType),
      StructField("value", DoubleType)))
    def writeFile(name: String, ids: Range): Unit = {
      val lines = ids.map(i =>
        s"""{"event_id": $i, "user_id": ${i % 10}, "value": ${i}.5}""")
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"$inDir/$name.json"),
        lines.mkString("\n").getBytes("UTF-8"))
    }

    val url = "jdbc:derby:memory:graft_ns;create=true"
    val props = new java.util.Properties()
    props.setProperty("driver", "org.apache.derby.jdbc.EmbeddedDriver")
    val conn = java.sql.DriverManager.getConnection(url, props)
    conn.createStatement().execute(
      "CREATE TABLE ns_sink (event_id BIGINT, user_id BIGINT, value DOUBLE, batch_id BIGINT, part_id INT)")
    conn.close()

    // the user_filter dimension: only users 2, 5, 7 pass
    val allow = Seq(2L, 5L, 7L).toDF("user_id")
    def startQuery() =
      spark.readStream.schema(schema).json(inDir)
        .transform(df => Streams.streamStaticSemiJoin(df, allow))
        .writeStream
        .option("checkpointLocation", ckpt)
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, id: Long) =>
          Streams.jdbcIdempotentWriter(url, "ns_sink", props)(df, id)
        }
        .start()

    writeFile("f1", 0 until 60)
    val q1 = startQuery()
    q1.processAllAvailable()
    q1.stop()
    // more data lands while the query is down
    writeFile("f2", 60 until 100)
    val q2 = startQuery()
    q2.processAllAvailable()
    q2.stop()

    val sunk = spark.read.jdbc(url, "ns_sink", props)
    // users 2,5,7 occur for i % 10 in {2,5,7}: 30 of 100 rows
    assert(sunk.count() == 30, s"expected 30 allowed rows, got ${sunk.count()}")
    assert(sunk.select(countDistinct($"event_id")).head.getLong(0) == 30,
      "duplicates across restart")
    assert(sunk.select($"user_id").distinct().as[Long].collect().toSet == Set(2L, 5L, 7L),
      "allowlist not enforced")
  }
}
