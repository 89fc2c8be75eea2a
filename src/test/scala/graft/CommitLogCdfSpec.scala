package graft

import graft.sources.{CommitLog, CommitLogCdf}
import org.apache.spark.sql.functions._

/** Row-granularity CDF over the commit log: the COW diff must classify
  * every key exactly — delete / insert / update pair / silent copy —
  * and the signed fold must reconstruct snapshots through rewrites
  * (the s22f decl hash-checks the full composition against DuckDB;
  * here the per-key classification and contracts are pinned directly). */
class CommitLogCdfSpec extends SparkSpec {
  import spark.implicits._

  private def freshRoot(): String =
    java.nio.file.Files.createTempDirectory("cdf").toString

  test("COW diff classifies delete / update pair / silent copy / insert per key") {
    val root = freshRoot()
    Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v")
      .write.parquet(s"$root/b1")
    CommitLog.commit(root, 0, added = Seq("b1"))
    // rewrite: drop k=1, change k=2, copy k=3, add k=4
    Seq((2L, "B"), (3L, "c"), (4L, "d")).toDF("k", "v")
      .write.parquet(s"$root/b2")
    CommitLog.commit(root, 1, added = Seq("b2"), removed = Seq("b1"))
    val feed = CommitLogCdf.changeFeed(spark, root, 1, 2, Seq("k"))
      .select($"k", $"v", col(CommitLogCdf.ChangeTypeCol).as("ct"))
      .as[(Long, String, String)].collect().toSet
    assert(feed == Set(
      (1L, "a", "delete"),
      (2L, "b", "update_preimage"),
      (2L, "B", "update_postimage"),
      (4L, "d", "insert")),
      s"k=3 (silent copy) must emit nothing: $feed")
  }

  test("signed fold from v0 reconstructs the latest snapshot through the COW commit") {
    val root = freshRoot()
    Seq((1L, 10L), (2L, 20L)).toDF("k", "v").write.parquet(s"$root/b1")
    CommitLog.commit(root, 0, added = Seq("b1"))
    Seq((2L, 25L), (3L, 30L)).toDF("k", "v").write.parquet(s"$root/b2")
    CommitLog.commit(root, 1, added = Seq("b2"), removed = Seq("b1"))
    val feed = CommitLogCdf.changeFeed(spark, root, 0, 2, Seq("k"))
    val folded = feed
      .groupBy($"k")
      .agg(sum(CommitLogCdf.changeSign(col(CommitLogCdf.ChangeTypeCol)) * $"v").as("v"),
        sum(CommitLogCdf.changeSign(col(CommitLogCdf.ChangeTypeCol))).as("alive"))
      .filter($"alive" > 0)
      .select($"k", $"v").as[(Long, Long)].collect().toSet
    assert(folded == Set((2L, 25L), (3L, 30L)))
  }

  test("null-safe copy detection: identical rows with null values emit nothing") {
    val root = freshRoot()
    Seq((1L, Some(10L)), (2L, None)).toDF("k", "v").write.parquet(s"$root/b1")
    CommitLog.commit(root, 0, added = Seq("b1"))
    Seq((1L, Some(10L)), (2L, None)).toDF("k", "v").write.parquet(s"$root/b2")
    CommitLog.commit(root, 1, added = Seq("b2"), removed = Seq("b1"))
    assert(CommitLogCdf.changeFeed(spark, root, 1, 2, Seq("k")).count() == 0,
      "a pure compaction (identical rows, incl. nulls) must emit no churn")
  }

  test("a rewrite that changes the column set is rejected") {
    val root = freshRoot()
    Seq((1L, 10L)).toDF("k", "v").write.parquet(s"$root/b1")
    CommitLog.commit(root, 0, added = Seq("b1"))
    Seq((1L, 10L, 0L)).toDF("k", "v", "w").write.parquet(s"$root/b2")
    CommitLog.commit(root, 1, added = Seq("b2"), removed = Seq("b1"))
    val e = intercept[IllegalArgumentException] {
      CommitLogCdf.changeFeed(spark, root, 1, 2, Seq("k")).collect()
    }
    assert(e.getMessage.contains("column set"), e.getMessage)
  }
}
