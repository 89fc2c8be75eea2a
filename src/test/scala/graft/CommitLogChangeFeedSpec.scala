package graft

import graft.sources.{CommitLog, CommitLogCdf, CommitLogMerge, CommitLogOptimize}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** The connector-level CHANGE FEED (`option("readChangeFeed", true)`):
  * batch table_changes over a version range and the STREAMING feed —
  * able to follow deletes and (materialized) merges instead of
  * faulting, because `changeFeed = true` merges write their row
  * changes to `_changes/v<N>/` at commit time. */
class CommitLogChangeFeedSpec extends SparkSpec {
  import spark.implicits._

  private def freshRoot(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"clcf_$tag").toString

  private def append(root: String, rows: Seq[(Long, Double)]): Int = {
    rows.toDF("id", "x").repartition(1)
      .write.format("commitlog").option("path", root).mode("append").save()
    CommitLog.latestVersion(root)
  }

  private def mergeSrc(rows: Seq[(Long, Double, String)]) =
    rows.toDF("id", "x", "_op")

  test("batch table_changes: a signed fold over the feed reconstructs the snapshot through a merge") {
    val root = freshRoot("fold")
    append(root, Seq((1L, 10.0), (2L, 20.0)))
    append(root, Seq((3L, 30.0)))
    // changeFeed merge: update id=2, delete id=3, insert id=4
    CommitLogMerge.merge(spark, root,
      mergeSrc(Seq((2L, 99.0, "U"), (3L, 0.0, "D"), (4L, 40.0, "U"))),
      keyCols = Seq("id"), changeFeed = true)
    val feed = spark.read.format("commitlog")
      .option("path", root).option("readChangeFeed", true).load()
    // the merge version emitted all four change kinds' rows
    val kinds = feed.filter(col(CommitLogCdf.CommitVersionCol) === 3)
      .groupBy(col(CommitLogCdf.ChangeTypeCol)).count()
      .as[(String, Long)].collect().toMap
    assert(kinds == Map("update_preimage" -> 1L, "update_postimage" -> 1L,
      "delete" -> 1L, "insert" -> 1L), s"kinds: $kinds")
    // signed fold: +postimage/+insert, -preimage/-delete == snapshot
    val folded = feed
      .withColumn("s", CommitLogCdf.changeSign(col(CommitLogCdf.ChangeTypeCol)))
      .groupBy($"id").agg(sum($"s").as("n"), max(
        when(CommitLogCdf.changeSign(col(CommitLogCdf.ChangeTypeCol)) === 1L,
          struct(col(CommitLogCdf.CommitVersionCol).as("v"), $"x"))).as("last"))
      .filter($"n" > 0)
      .select($"id", $"last.x".as("x"))
    val snap = spark.read.format("commitlog").option("path", root).load()
    assert(folded.orderBy("id").as[(Long, Double)].collect().toSeq ==
      snap.orderBy("id").as[(Long, Double)].collect().toSeq)
  }

  test("streaming change feed follows deletes and merges without faulting") {
    val root = freshRoot("stream")
    val ckpt = freshRoot("stream_ckpt")
    val out = freshRoot("stream_out")
    append(root, Seq((1L, 10.0)))
    append(root, Seq((2L, 20.0)))
    def drain(): Unit = {
      val q = spark.readStream.format("commitlog")
        .option("path", root).option("readChangeFeed", true).load()
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    drain()
    assert(spark.read.parquet(out).count() == 2L) // two inserts
    // a whole-batch delete and a changeFeed merge land; the stream
    // RESUMES and emits their change rows (pre-CDF both would fault)
    val v = CommitLog.latestVersion(root)
    CommitLog.commit(root, v, added = Nil,
      removed = Seq(CommitLog.files(root, v).head))
    CommitLogMerge.merge(spark, root,
      mergeSrc(Seq((2L, 99.0, "U"))), keyCols = Seq("id"), changeFeed = true)
    drain()
    val got = spark.read.parquet(out)
    val byKind = got.groupBy(col(CommitLogCdf.ChangeTypeCol)).count()
      .as[(String, Long)].collect().toMap
    assert(byKind == Map("insert" -> 2L, "delete" -> 1L,
      "update_preimage" -> 1L, "update_postimage" -> 1L), s"kinds: $byKind")
    // versions stamped correctly on constant-filled rows
    assert(got.filter(col(CommitLogCdf.ChangeTypeCol) === "delete")
      .select(col(CommitLogCdf.CommitVersionCol)).as[Int].head() == 3)
  }

  test("streaming feed epochs serve columnar when homogeneous, row when mixed (r16)") {
    // the r15 decline was per-epoch heterogeneity: one epoch may mix
    // constant-stamp partitions (appends) with row-leg shapes
    // (materialized change files, DV synthesis), and Spark's per-scan
    // columnar check is all-or-none. r16 coerces per epoch: a
    // homogeneous constant-stamp epoch serves the vectorized leg (the
    // dominant tailing shape — appends), a mixed epoch row-forces
    // every partition. Either way the check sees uniform children.
    // leg selection is pinned by the columnar reader-open counter
    // (local-mode executors share the JVM): streaming plans are not
    // inspectable post-hoc, but a reader opened IS the leg taken
    val root = freshRoot("colepoch")
    val ckpt = freshRoot("colepoch_ckpt")
    val out = freshRoot("colepoch_out")
    append(root, Seq((1L, 10.0)))
    append(root, Seq((2L, 20.0)))
    def drain(): Unit = {
      val q = spark.readStream.format("commitlog")
        .option("path", root).option("readChangeFeed", true).load()
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    def columnarDelta(body: => Unit): Long = {
      val before = graft.sources.CommitLogColumnar.readersOpened.get()
      body
      graft.sources.CommitLogColumnar.readersOpened.get() - before
    }
    // one epoch of two append versions: homogeneous constant stamps
    val d1 = columnarDelta(drain())
    assert(d1 == 2L,
      s"append-only epoch must open one columnar reader per file: $d1")
    assert(spark.read.parquet(out).count() == 2L)
    // a materialized merge (change rows carry _change_type as DATA)
    // plus another append: the epoch mixes shapes → uniform row leg
    CommitLogMerge.merge(spark, root,
      mergeSrc(Seq((2L, 99.0, "U"))), keyCols = Seq("id"), changeFeed = true)
    append(root, Seq((3L, 30.0)))
    val d2 = columnarDelta(drain())
    assert(d2 == 0L, s"mixed epoch must row-force uniformly: $d2")
    // update_pre + update_post + insert on top of the two inserts
    assert(spark.read.parquet(out).count() == 5L)
    // and a later pure-append epoch recovers the columnar leg
    append(root, Seq((4L, 40.0)))
    val d3 = columnarDelta(drain())
    assert(d3 == 1L,
      s"the tail must recover columnar service after the mixed epoch: $d3")
    val got = spark.read.parquet(out)
    assert(got.count() == 6L)
    val kinds = got.groupBy(col(CommitLogCdf.ChangeTypeCol)).count()
      .as[(String, Long)].collect().toMap
    assert(kinds == Map("insert" -> 4L, "update_preimage" -> 1L,
      "update_postimage" -> 1L), s"kinds: $kinds")
  }

  test("an un-materialized merge fails the change feed with guidance; OPTIMIZE is skipped") {
    val root = freshRoot("guide")
    append(root, Seq((1L, 10.0)))
    append(root, Seq((2L, 20.0)))
    CommitLogOptimize.optimize(spark, root, smallBytes = 1L << 30)
    // the optimize version emits nothing — feed over its window is empty
    val feed = spark.read.format("commitlog")
      .option("path", root).option("readChangeFeed", true)
      .option("startingVersion", 2).option("endingVersion", 3).load()
    assert(feed.count() == 0L)
    // a COW merge WITHOUT changeFeed: the scan cannot diff — loud guidance
    CommitLogMerge.merge(spark, root,
      mergeSrc(Seq((1L, 99.0, "U"), (2L, 98.0, "U"))), keyCols = Seq("id"))
    val err = intercept[Exception] {
      spark.read.format("commitlog")
        .option("path", root).option("readChangeFeed", true)
        .option("startingVersion", 3).load().collect()
    }
    def chain(e: Throwable): String =
      Iterator.iterate(e)(_.getCause).takeWhile(_ != null)
        .map(t => Option(t.getMessage).getOrElse("")).mkString(" | ")
    assert(chain(err).contains("changeFeed=true"), chain(err))
  }

  test("CommitLogCdf prefers materialized change rows — a DV-leg merge becomes consumable") {
    val root = freshRoot("dvleg")
    // a large base so the merge's touched fraction stays under the DV dial
    append(root, (1L to 200L).map(i => (i, i.toDouble)))
    val st = CommitLogMerge.merge(spark, root,
      mergeSrc(Seq((5L, 555.0, "U"), (6L, 0.0, "D"))),
      keyCols = Seq("id"), dvFraction = 0.3, changeFeed = true)
    assert(st.leg == "dv", s"expected the DV leg: ${st.leg}")
    // without materialized rows this threw requireNoDv; now it reads them
    val feed = CommitLogCdf.changeFeed(spark, root, 1, st.version, Seq("id"))
    val kinds = feed.groupBy(col(CommitLogCdf.ChangeTypeCol)).count()
      .as[(String, Long)].collect().toMap
    assert(kinds == Map("update_preimage" -> 1L, "update_postimage" -> 1L,
      "delete" -> 1L), s"kinds: $kinds")
    assert(feed.filter(col(CommitLogCdf.ChangeTypeCol) === "update_postimage")
      .select($"x").as[Double].head() == 555.0)
  }

  test("vacuum expires change-data files with their versions") {
    val root = freshRoot("vac")
    append(root, Seq((1L, 10.0)))
    val st = CommitLogMerge.merge(spark, root,
      mergeSrc(Seq((1L, 99.0, "U"))), keyCols = Seq("id"), changeFeed = true)
    val dir = java.nio.file.Paths.get(
      root, "_changes", s"v${st.version}")
    assert(java.nio.file.Files.isDirectory(dir))
    (0 until 3).foreach(_ => append(root, Seq((9L, 9.0))))
    CommitLog.vacuum(root, keepLast = 1, minAgeMs = 0L)
    assert(!java.nio.file.Files.exists(dir),
      "expired versions' change rows must be swept with their manifests")
  }
}
