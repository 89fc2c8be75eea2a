package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Checkpointed recovery: a streaming query stopped and restarted on
  * the same checkpoint must process each input exactly once — the
  * at-least-once + idempotent-sink upgrade over the reference's
  * at-most-once drop-on-error delivery (kafka-database-import.go:211-214). */
class StreamingRecoverySpec extends SparkSpec {

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
}
