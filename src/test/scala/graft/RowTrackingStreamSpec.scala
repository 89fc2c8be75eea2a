package graft

import graft.sources.{CommitLog, CommitLogStreamingWrite, CommitLogWrite, IdentityStreamingWrite}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.write.PhysicalWriteInfo
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** ROW TRACKING / IDENTITY for the STREAMING sink (r13 refusal → r14
  * feature): ids allocate per epoch from the committed watermark (the
  * per-epoch factory hook), the advance rides the epoch's own data
  * manifest, and a replayed epoch is dropped whole by the txn
  * watermark — no duplicate ids, no torn watermark. */
class RowTrackingStreamSpec extends SparkSpec {
  import spark.implicits._

  private def freshRoot(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_rts_$tag").toString

  private def ids(root: String): Seq[Long] =
    spark.read.format("commitlog").option("path", root).load()
      .select(col("_graft_row_id")).as[Long].collect().toSeq

  test("writeStream into a tracked table mints unique ids across epochs") {
    val root = freshRoot("e2e")
    val ckpt = freshRoot("e2e_ckpt")
    val in = MemoryStream[Long](spark)
    val q = in.toDF().toDF("k")
      .writeStream.format("commitlog")
      .option("path", root).option("rowTracking", "true")
      .option("checkpointLocation", ckpt)
      .start()
    try {
      in.addData(0L until 100L: _*); q.processAllAvailable()
      in.addData(100L until 250L: _*); q.processAllAvailable()
      in.addData(250L until 300L: _*); q.processAllAvailable()
    } finally q.stop()
    val got = ids(root)
    assert(got.length == 300)
    assert(got.distinct.length == 300, "row ids must be unique")
    // the property landed with the first epoch's commit
    val props = CommitLog.tblPropsOf(root, CommitLog.latestVersion(root))
    assert(CommitLogWrite.rowTrackingOn(props))
    // watermark advanced to the highest minted id
    val hwm = props(CommitLogWrite.IdentityHwmPrefix +
      CommitLogWrite.RowIdCol).toLong
    assert(hwm == got.max)
    // the change feed carries the ids
    val feed = spark.read.format("commitlog").option("path", root)
      .option("readChangeFeed", "true").option("startingVersion", 0).load()
    assert(feed.select(col("_graft_row_id")).as[Long].collect()
      .toSet == got.toSet)
  }

  test("a batch append between epochs cannot collide with streamed ids") {
    val root = freshRoot("mixed")
    val ckpt = freshRoot("mixed_ckpt")
    val in = MemoryStream[Long](spark)
    val q = in.toDF().toDF("k")
      .writeStream.format("commitlog")
      .option("path", root).option("rowTracking", "true")
      .option("checkpointLocation", ckpt)
      .start()
    try {
      in.addData(0L until 50L: _*); q.processAllAvailable()
      // rival BATCH append advances the id watermark between epochs
      spark.range(1000, 1080).toDF("k")
        .write.format("commitlog").option("path", root)
        .mode("append").save()
      in.addData(50L until 120L: _*); q.processAllAvailable()
    } finally q.stop()
    val got = ids(root)
    assert(got.length == 200)
    assert(got.distinct.length == 200,
      "streamed epoch planned against a stale watermark minted a " +
        "duplicate id")
  }

  test("a replayed epoch is dropped whole: no second id range, no double rows") {
    val root = freshRoot("replay")
    val userSchema = Seq(1L).toDF("k").schema
    val writeSchema = CommitLogWrite.withRowId(userSchema)
    val base = new CommitLogStreamingWrite(root, writeSchema, app = "apprt")
    base.commitProps = Map(CommitLogWrite.RowTrackingProp -> Some("true"))
    val w = new IdentityStreamingWrite(base, base, root, writeSchema,
      Seq(CommitLogWrite.rowIdSpec(writeSchema, Map.empty)), block = 4)
    val info = new PhysicalWriteInfo { override def numPartitions(): Int = 1 }
    def runEpoch(epoch: Long, rows: Seq[Long]): Unit = {
      val f = w.createStreamingWriterFactory(info)
      val dw = f.createWriter(0, 0, epoch)
      rows.foreach(k => dw.write(InternalRow(k)))
      w.commit(epoch, Array(dw.commit()))
    }
    runEpoch(0L, 0L until 10L)
    runEpoch(1L, 10L until 25L)
    val vAfter = CommitLog.latestVersion(root)
    val before = ids(root)
    assert(before.length == 25 && before.distinct.length == 25)
    val hwmBefore = CommitLog.tblPropsOf(root, vAfter)(
      CommitLogWrite.IdentityHwmPrefix + CommitLogWrite.RowIdCol)
    // crash-replay of epoch 1: the txn watermark drops it whole —
    // rows, ids AND watermark advance all ride the one manifest
    runEpoch(1L, 10L until 25L)
    assert(CommitLog.latestVersion(root) == vAfter, "replay must not commit")
    assert(ids(root).sorted == before.sorted, "replay must not re-mint ids")
    assert(CommitLog.tblPropsOf(root, vAfter)(
      CommitLogWrite.IdentityHwmPrefix + CommitLogWrite.RowIdCol)
      == hwmBefore, "replay must not advance the watermark")
  }

  test("a rival watermark advance between factory and commit aborts the epoch") {
    // the precondition leg: the epoch PLANNED against watermark W; a
    // rival batch append advances it before the epoch commits — the
    // staged ids were derived from a stale watermark and may collide,
    // so the commit must abort (the streaming query then restarts and
    // replans), never publish
    val root = freshRoot("rival")
    spark.range(0, 10).toDF("k")
      .write.format("commitlog").option("path", root)
      .option("rowTracking", "true").mode("append").save()
    val userSchema = Seq(1L).toDF("k").schema
    val writeSchema = CommitLogWrite.withRowId(userSchema)
    val base = new CommitLogStreamingWrite(root, writeSchema, app = "apprv")
    val w = new IdentityStreamingWrite(base, base, root, writeSchema,
      Seq(CommitLogWrite.rowIdSpec(writeSchema, Map.empty)), block = 4)
    val info = new PhysicalWriteInfo { override def numPartitions(): Int = 1 }
    val f = w.createStreamingWriterFactory(info) // plans against W
    val dw = f.createWriter(0, 0, 0L)
    (100L until 110L).foreach(k => dw.write(InternalRow(k)))
    val msg = dw.commit()
    // rival advances the id watermark
    spark.range(200, 230).toDF("k")
      .write.format("commitlog").option("path", root).mode("append").save()
    val vBefore = CommitLog.latestVersion(root)
    intercept[Exception] { w.commit(0L, Array(msg)) }
    assert(CommitLog.latestVersion(root) == vBefore,
      "the stale epoch must not publish")
    assert(ids(root).distinct.length == 40, "no duplicate ids leaked")
    // the restart replays the epoch against the fresh watermark
    val f2 = w.createStreamingWriterFactory(info)
    val dw2 = f2.createWriter(0, 0, 0L)
    (100L until 110L).foreach(k => dw2.write(InternalRow(k)))
    w.commit(0L, Array(dw2.commit()))
    val all = ids(root)
    assert(all.length == 50 && all.distinct.length == 50)
  }

  test("streaming into an IDENTITY-column table allocates per epoch") {
    val wh = freshRoot("idwh")
    spark.conf.set("spark.sql.catalog.rts", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.rts.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS rts.db")
    spark.sql("CREATE TABLE rts.db.s (id BIGINT GENERATED ALWAYS AS " +
      "IDENTITY (START WITH 7 INCREMENT BY 3), k BIGINT)")
    val root = s"$wh/db/s"
    val ckpt = freshRoot("id_ckpt")
    val in = MemoryStream[Long](spark)
    // the streaming writer provides only `k`; the sink fills `id`
    val q = in.toDF().toDF("k").withColumn("id", lit(null).cast("long"))
      .select($"id", $"k")
      .writeStream.format("commitlog").option("path", root)
      .option("checkpointLocation", ckpt)
      .start()
    try {
      in.addData(0L until 20L: _*); q.processAllAvailable()
      in.addData(20L until 50L: _*); q.processAllAvailable()
    } finally q.stop()
    val rows = spark.sql("SELECT id, k FROM rts.db.s").collect()
    assert(rows.length == 50)
    val idVals = rows.map(_.getLong(0)).toSeq
    assert(idVals.distinct.length == 50, "identity values must be unique")
    assert(idVals.forall(v => v >= 7 && (v - 7) % 3 == 0),
      s"identity values must follow START 7 STEP 3: ${idVals.sorted.take(5)}")
  }
}
