package graft

import graft.sources.CommitLog
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.functions._

/** The commit-log table as a first-class DSv2 source
  * (`format("commitlog")`): batch time travel, streaming version-cursor
  * offsets in Spark's OWN checkpoint (restart resumes, no hand-rolled
  * cursor file), maxVersionsPerTrigger admission, AvailableNow
  * bounding, and the Delta-source delete contract (remove-only fails
  * without ignoreDeletes; copy-on-write always fails). */
class CommitLogStreamSpec extends SparkSpec {
  import spark.implicits._

  private def freshRoot(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"clsrc_$tag").toString

  private def writeBatch(root: String, batch: String, ids: Seq[Long]): Unit =
    ids.toDF("id").withColumn("v", $"id" * 10)
      .write.parquet(s"$root/$batch")

  private def appendAll(root: String, batches: (String, Seq[Long])*): Int = {
    var v = CommitLog.latestVersion(root)
    batches.foreach { case (b, ids) =>
      writeBatch(root, b, ids)
      v = CommitLog.commit(root, v, added = Seq(b)).version
    }
    v
  }

  private def chainMessage(e: Throwable): String =
    Iterator.iterate(e)(_.getCause).takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).mkString(" | ")

  test("batch read: latest snapshot by default, versionAsOf time-travels") {
    val root = freshRoot("batch")
    appendAll(root, "b1" -> Seq(1L, 2L), "b2" -> Seq(3L))
    val latest = spark.read.format("commitlog").option("path", root).load()
    assert(latest.select("id").as[Long].collect().sorted.toSeq == Seq(1L, 2L, 3L))
    val v1 = spark.read.format("commitlog")
      .option("path", root).option("versionAsOf", 1).load()
    assert(v1.select("id").as[Long].collect().sorted.toSeq == Seq(1L, 2L))
    // values survive the reader, not just row counts
    assert(latest.agg(sum($"v")).as[Long].head() == 60L)
  }

  test("stream drains appends exactly once; maxVersionsPerTrigger bounds each batch to one version") {
    val root = freshRoot("stream")
    val ckpt = freshRoot("stream_ckpt")
    appendAll(root, "b1" -> Seq(1L), "b2" -> Seq(2L, 3L), "b3" -> Seq(4L))
    val sink = "clsrc_stream_sink"
    val q = spark.readStream.format("commitlog")
      .option("path", root)
      .option("maxVersionsPerTrigger", 1)
      .load()
      .writeStream.format("memory").queryName(sink)
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    assert(spark.table(sink).select("id").as[Long].collect().sorted.toSeq ==
      Seq(1L, 2L, 3L, 4L))
    // admission control: 3 versions → 3 separate non-empty micro-batches
    val nonEmpty = q.recentProgress.count(_.numInputRows > 0)
    assert(nonEmpty == 3,
      s"expected 3 bounded micro-batches, saw $nonEmpty: " +
        q.recentProgress.map(_.numInputRows).mkString(","))
  }

  test("restart resumes from Spark's checkpointed version offset — no re-emission") {
    val root = freshRoot("restart")
    val ckpt = freshRoot("restart_ckpt")
    val out = freshRoot("restart_out")
    appendAll(root, "b1" -> Seq(1L), "b2" -> Seq(2L))
    def runOnce(): Unit = {
      val q = spark.readStream.format("commitlog").option("path", root).load()
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    runOnce()
    assert(spark.read.parquet(out).count() == 2)
    // nothing new: a rerun emits nothing (offset lives in the checkpoint)
    runOnce()
    assert(spark.read.parquet(out).count() == 2, "replayed an already-emitted version")
    // a new commit arrives exactly once on the next run
    appendAll(root, "b3" -> Seq(5L, 6L))
    runOnce()
    assert(spark.read.parquet(out).select("id").as[Long].collect().sorted.toSeq ==
      Seq(1L, 2L, 5L, 6L))
  }

  test("startingVersion skips the backlog") {
    val root = freshRoot("startv")
    val ckpt = freshRoot("startv_ckpt")
    appendAll(root, "b1" -> Seq(1L), "b2" -> Seq(2L))
    val sink = "clsrc_startv_sink"
    val q = spark.readStream.format("commitlog")
      .option("path", root).option("startingVersion", 1)
      .load()
      .writeStream.format("memory").queryName(sink)
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    assert(spark.table(sink).select("id").as[Long].collect().toSeq == Seq(2L))
  }

  test("a remove-only commit fails the stream without ignoreDeletes and skips with it") {
    val root = freshRoot("del")
    appendAll(root, "b1" -> Seq(1L), "b2" -> Seq(2L))
    CommitLog.commit(root, 2, added = Nil, removed = Seq("b1"))
    def run(flag: Boolean, tag: String): Unit = {
      val q = spark.readStream.format("commitlog")
        .option("path", root).option("ignoreDeletes", flag)
        .load()
        .writeStream.format("memory").queryName(s"clsrc_del_$tag")
        .option("checkpointLocation", freshRoot(s"del_ckpt_$tag"))
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    val e = intercept[Exception] { run(flag = false, "strict") }
    assert(chainMessage(e).contains("ignoreDeletes"), chainMessage(e))
    run(flag = true, "lax")
    // appends already emitted stay emitted: b1's row still arrives
    // (it was added at v1, before the delete)
    assert(spark.table("clsrc_del_lax").select("id").as[Long]
      .collect().sorted.toSeq == Seq(1L, 2L))
  }

  test("a copy-on-write commit always fails the stream") {
    val root = freshRoot("cow")
    appendAll(root, "b1" -> Seq(1L, 2L))
    writeBatch(root, "b1a", Seq(1L))
    CommitLog.commit(root, 1, added = Seq("b1a"), removed = Seq("b1"))
    val e = intercept[Exception] {
      val q = spark.readStream.format("commitlog")
        .option("path", root).option("ignoreDeletes", true)
        .load()
        .writeStream.format("memory").queryName("clsrc_cow_sink")
        .option("checkpointLocation", freshRoot("cow_ckpt"))
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    assert(chainMessage(e).contains("copy-on-write"), chainMessage(e))
  }

  test("skipChangeCommits streams across COW and DV commits, emitting only pure appends") {
    val root = freshRoot("skipcc")
    appendAll(root, "b1" -> Seq(1L, 2L))
    // v2: a COW rewrite (restates row 1, drops row 2)
    writeBatch(root, "b1a", Seq(1L))
    CommitLog.commit(root, 1, added = Seq("b1a"), removed = Seq("b1"))
    // v3: a DV merge shape (adds a dv- batch, removes nothing)
    Seq(("b1a/x.parquet", 0L)).toDF("_file", "_pos")
      .write.parquet(s"$root/dv-m1")
    CommitLog.commit(root, 2, added = Seq("dv-m1"))
    // v4: a pure append — the only version the stream may emit rows for
    writeBatch(root, "b2", Seq(9L))
    CommitLog.commit(root, 3, added = Seq("b2"))
    val q = spark.readStream.format("commitlog")
      .option("path", root).option("skipChangeCommits", true)
      .load()
      .writeStream.format("memory").queryName("clsrc_skipcc_sink")
      .option("checkpointLocation", freshRoot("skipcc_ckpt"))
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    assert(spark.table("clsrc_skipcc_sink").select("id").as[Long]
      .collect().sorted.toSeq == Seq(1L, 2L, 9L),
      "expected v1's append + v4's append; v2 COW and v3 DV skipped")
  }

  test("AvailableNow drains to the entry snapshot; later commits wait for the next run") {
    // the cap is taken in prepareForTriggerAvailableNow: pre-create the
    // stream, commit mid-definition is not observable deterministically
    // here, so pin the bound the cheap way — drain, commit, drain again
    val root = freshRoot("cap")
    val ckpt = freshRoot("cap_ckpt")
    val out = freshRoot("cap_out")
    appendAll(root, "b1" -> Seq(1L))
    def drain(): Long = {
      val q = spark.readStream.format("commitlog").option("path", root).load()
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      spark.read.parquet(out).count()
    }
    assert(drain() == 1)
    appendAll(root, "b2" -> Seq(2L))
    assert(drain() == 2)
  }

  test("log DDL is the schema authority; pre-evolution files null-fill in the reader") {
    val root = freshRoot("evolve")
    // v1 declares (id, v); v2 evolves additively with a new column w
    Seq(1L).toDF("id").withColumn("v", $"id" * 10)
      .write.parquet(s"$root/b1")
    CommitLog.commit(root, 0, added = Seq("b1"), schema = Some("id BIGINT, v BIGINT"))
    Seq(2L).toDF("id").withColumn("v", $"id" * 10).withColumn("w", lit(7L))
      .write.parquet(s"$root/b2")
    CommitLog.commit(root, 1, added = Seq("b2"),
      schema = Some("id BIGINT, v BIGINT, w BIGINT"))
    val rows = spark.read.format("commitlog").option("path", root).load()
      .orderBy("id").collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(1L, 2L))
    assert(rows(0).isNullAt(2), "pre-evolution file must null-fill w")
    assert(rows(1).getLong(2) == 7L)
  }

  test("undeclared-schema table falls back to one footer read") {
    val root = freshRoot("footer")
    appendAll(root, "b1" -> Seq(3L))
    val df = spark.read.format("commitlog").option("path", root).load()
    assert(df.schema.fieldNames.toSeq == Seq("id", "v"))
    assert(df.select("v").as[Long].head() == 30L)
  }
}
