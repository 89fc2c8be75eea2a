package graft

import graft.sources.{CommitLog, CommitLogDml, CommitLogWrite}
import org.apache.spark.sql.functions._

/** AUTO-COMPACTION (SURVEY S84): tables opting in via
  * `graft.autoCompact.minFiles` get a bounded OPTIMIZE pack inline
  * after an append publish once the live small-file count reaches the
  * threshold — scoped to the write's own tuples on partitioned
  * tables, silently skipped on any conflict (maintenance never fails
  * a durable write). The point at 100 TB: streaming ingest mints one
  * batch per epoch, and without a maintenance loop the table decays
  * into millions of manifest entries; the sink-side threshold
  * amortizes the rewrite to one pack per N appends.
  */
class AutoCompactSpec extends SparkSpec {
  import spark.implicits._

  private def freshRoot(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"autocompact_$tag").toString

  private def liveFiles(root: String): Seq[String] =
    CommitLog.files(root, CommitLog.latestVersion(root))

  private def append(root: String, lo: Int, hi: Int): Unit =
    spark.range(lo, hi).select($"id".as("k")).repartition(1)
      .write.format("commitlog").option("path", root).mode("append").save()

  private def setProp(root: String, k: String, v: String): Unit =
    CommitLog.commit(root, CommitLog.latestVersion(root), added = Nil,
      removed = Nil, props = Map(k -> Some(v)),
      op = Some("SET TBLPROPERTIES"))

  test("appends stay under the file threshold; content never changes") {
    val root = freshRoot("basic")
    append(root, 0, 10)
    setProp(root, CommitLogWrite.AutoCompactMinFilesProp, "4")
    (1 until 10).foreach(i => append(root, i * 10, i * 10 + 10))
    // every time the live set reached 4 small batches, the next
    // publish packed them: the count stays bounded well under 10
    assert(liveFiles(root).size < 10,
      s"auto-compact must bound the live set, got ${liveFiles(root).size}")
    val t = spark.read.format("commitlog").option("path", root).load()
    assert(t.count() == 100L)
    assert(t.agg(sum($"k")).head().getLong(0) == (0L until 100L).sum)
    assert(CommitLog.history(root).exists(_.operation.contains("OPTIMIZE")),
      "the packs appear in history as OPTIMIZE commits")
    // layout-only: the packs are dataChange=false — a change-feed read
    // over the whole history sees only the appended rows
  }

  test("without the property nothing compacts") {
    val root = freshRoot("off")
    (0 until 6).foreach(i => append(root, i * 10, i * 10 + 10))
    assert(liveFiles(root).size == 6, "auto-compact is opt-in")
  }

  test("partitioned: only the written tuples compact") {
    val wh = freshRoot("wh_part")
    spark.conf.set("spark.sql.catalog.ac", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.ac.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS ac.db")
    spark.sql("CREATE TABLE ac.db.t (k BIGINT, p STRING) PARTITIONED BY (p) " +
      s"TBLPROPERTIES ('${CommitLogWrite.AutoCompactMinFilesProp}' = '3')")
    // cold partition: two small batches, below threshold forever
    spark.sql("INSERT INTO ac.db.t VALUES (1, 'cold')")
    spark.sql("INSERT INTO ac.db.t VALUES (2, 'cold')")
    // hot partition: appends pile past the threshold
    (0 until 6).foreach(i =>
      spark.sql(s"INSERT INTO ac.db.t VALUES ($i, 'hot')"))
    val root = s"$wh/db/t"
    val parts = CommitLog.partsOf(root, CommitLog.latestVersion(root))
    val hot = liveFiles(root).filter(b =>
      parts.get(b).exists(_.get("p").contains(CommitLog.partToken(Some("hot")))))
    val cold = liveFiles(root).filter(b =>
      parts.get(b).exists(_.get("p").contains(CommitLog.partToken(Some("cold")))))
    assert(hot.size < 6, s"the hot tuple must compact, got ${hot.size}")
    assert(cold.size == 2, "an untouched tuple below threshold is left alone")
    assert(spark.table("ac.db.t").count() == 8L)
  }

  test("outstanding DVs skip maintenance without failing the append") {
    val root = freshRoot("dv")
    append(root, 0, 50)
    setProp(root, CommitLogWrite.AutoCompactMinFilesProp, "3")
    CommitLogDml.delete(spark, root, "k = 7") // leaves a deletion vector
    val before = CommitLog.latestVersion(root)
    (1 to 4).foreach(i => append(root, i * 100, i * 100 + 10))
    // all four appends landed; no OPTIMIZE committed past the DV
    assert(CommitLog.latestVersion(root) == before + 4)
    assert(CommitLog.history(root).drop(before + 1)
      .forall(!_.operation.contains("OPTIMIZE")))
    val t = spark.read.format("commitlog").option("path", root).load()
    assert(t.count() == 89L)
  }

  test("streaming epochs compact under the same threshold") {
    val root = freshRoot("stream")
    append(root, 0, 5)
    setProp(root, CommitLogWrite.AutoCompactMinFilesProp, "4")
    val ckpt = freshRoot("stream_ckpt")
    val src =
      org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Long](spark)
    val q = src.toDF().select($"value".as("k"))
      .writeStream.format("commitlog")
      .option("path", root).option("checkpointLocation", ckpt)
      .start()
    try {
      (0 until 8).foreach { i => src.addData(100L + i); q.processAllAvailable() }
    } finally q.stop()
    val t = spark.read.format("commitlog").option("path", root).load()
    assert(t.count() >= 6L) // 5 seed rows + the streamed rows
    assert(liveFiles(root).size < 9,
      s"epoch batches must pack, got ${liveFiles(root).size}")
  }
}
