package graft

import graft.sources.{CommitLog, CommitLogDml, CommitLogMerge}
import org.apache.spark.sql.functions._

/** The deletion-vector position CAP (spark.graft.dv.maxPlannedPositions):
  * "deletes-sized" plan-time DV state is unbounded in adversarial
  * workloads, so (a) the WRITE legs route a statement past the cap to
  * copy-on-write even when its changed FRACTION is sparse, and (b) the
  * READ path refuses to materialize an over-cap table on the driver,
  * with compaction guidance — never a silent OOM. */
class CommitLogDvCapSpec extends SparkSpec {
  import spark.implicits._

  private def freshRoot(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"dvcap_$tag").toString

  private def withCap[T](cap: Long)(f: => T): T = {
    spark.conf.set(CommitLogMerge.DvCapConf, cap.toString)
    try f finally spark.conf.unset(CommitLogMerge.DvCapConf)
  }

  test("a sparse delete past the cap takes the COW leg, not DV") {
    val root = freshRoot("write")
    spark.range(0, 10000).toDF("id").withColumn("v", $"id" * 2)
      .repartition(1)
      .write.format("commitlog").option("path", root).mode("append").save()
    // 1% of rows — far under the 30% fraction dial, but 100 positions
    // exceed a cap of 50: the absolute dial must force COW
    val st = withCap(50) {
      CommitLogDml.delete(spark, root, "id % 100 = 0", changeFeed = false)
    }
    assert(st.leg == "cow", s"expected cow past the cap, got ${st.leg}")
    assert(!CommitLog.files(root, CommitLog.latestVersion(root))
      .exists(_.startsWith(CommitLogMerge.DvPrefix)))
    assert(spark.read.format("commitlog").option("path", root).load()
      .count() == 9900)
  }

  test("under the cap the sparse delete still takes the DV leg") {
    val root = freshRoot("under")
    spark.range(0, 10000).toDF("id").repartition(1)
      .write.format("commitlog").option("path", root).mode("append").save()
    val st = withCap(500) {
      CommitLogDml.delete(spark, root, "id % 100 = 0", changeFeed = false)
    }
    assert(st.leg == "dv", s"expected dv under the cap, got ${st.leg}")
  }

  test("reading an over-cap DV table refuses with compaction guidance") {
    val root = freshRoot("read")
    spark.range(0, 10000).toDF("id").repartition(1)
      .write.format("commitlog").option("path", root).mode("append").save()
    CommitLogDml.delete(spark, root, "id % 100 = 0", changeFeed = false)
    val e = intercept[Exception] {
      withCap(10) {
        spark.read.format("commitlog").option("path", root).load().count()
      }
    }
    def chain(t: Throwable): String =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .map(x => Option(x.getMessage).getOrElse("")).mkString(" | ")
    // the guidance names the escape hatch: REORG APPLY PURGE
    assert(chain(e).contains("purge"), chain(e))
    // and the same table reads fine at the default cap
    assert(spark.read.format("commitlog").option("path", root).load()
      .count() == 9900)
  }

  test("merge's DV leg honors the cap too") {
    val root = freshRoot("merge")
    spark.range(0, 10000).toDF("k").withColumn("v", $"k" * 2)
      .repartition(1)
      .write.format("commitlog").option("path", root).mode("append").save()
    val src = spark.range(0, 10000).filter($"id" % 100 === 0)
      .select($"id".as("k"), lit(-1L).as("v"), lit("U").as("_op"))
    val st = withCap(50) {
      CommitLogMerge.merge(spark, root, src, keyCols = Seq("k"))
    }
    assert(st.leg == "cow", s"expected cow past the cap, got ${st.leg}")
  }
}
