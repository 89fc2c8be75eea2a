package graft

import graft.sources.{CommitLog, CommitLogBucket, CommitLogOptimize}
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** HASH-BUCKET partitioning (SURVEY S81): `PARTITIONED BY
  * (bucket(N, k))` routes rows into N hash buckets of a
  * high-cardinality key, so point probes prune to ~1/N of the files
  * without the million-tuple explosion identity partitioning would
  * cost. The id is engine-canonical (long-canonical integrals — type
  * widening keeps every row's bucket — and UTF-8 string bytes); the
  * probe side derives ids from pushed literals, definite on MISMATCH
  * only (a matching bucket proves nothing).
  */
class BucketPartitionSpec extends SparkSpec {
  import spark.implicits._

  private val wh = java.nio.file.Files.createTempDirectory("graft_bkt").toString
  spark.conf.set("spark.sql.catalog.bkt", "graft.sources.GraftCatalog")
  spark.conf.set("spark.sql.catalog.bkt.warehouse", wh)
  spark.sql("CREATE NAMESPACE IF NOT EXISTS bkt.db")

  private def rootOf(t: String): String = s"$wh/db/$t"

  private def scanOf(df: org.apache.spark.sql.DataFrame): Seq[BatchScanExec] =
    df.queryExecution.executedPlan.collect { case b: BatchScanExec => b }

  private def planned(df: org.apache.spark.sql.DataFrame): Int =
    scanOf(df).map(_.inputPartitions.length).sum

  test("bucketed writes land one batch per bucket; point probes prune") {
    spark.sql("CREATE TABLE bkt.db.t (k BIGINT, v STRING) " +
      "PARTITIONED BY (bucket(8, k))")
    spark.sql("INSERT INTO bkt.db.t SELECT id, CONCAT('v', id) FROM range(0, 400)")
    val root = rootOf("t")
    val v = CommitLog.latestVersion(root)
    assert(CommitLog.partColsOf(root, v) == Seq("bucket8(k)"))
    val parts = CommitLog.partsOf(root, v)
    val tokens = CommitLog.files(root, v).flatMap(parts.get)
      .map(_("bucket8(k)"))
    assert(tokens.distinct.size > 1 && tokens.distinct.size <= 8,
      s"expected up to 8 bucket tokens, got ${tokens.distinct}")
    // the recorded token IS the canonical id of the rows inside
    val t = spark.table("bkt.db.t")
    val probe = t.filter($"k" === 123L)
    assert(probe.count() == 1L)
    val all = planned(t)
    assert(planned(probe) < all,
      s"a point probe must open ~1/8 of the files: ${planned(probe)}/$all")
    // IN-list prunes to the union of its buckets
    val in3 = t.filter($"k".isin(1L, 2L, 3L))
    assert(in3.count() == 3L)
    assert(planned(in3) <= 3.min(all) || planned(in3) < all)
    // ranges cannot prune through a hash — kept, still correct
    assert(t.filter($"k" < 10).count() == 10L)
  }

  test("null keys route to the null token; IS NULL prunes exactly") {
    spark.sql("CREATE TABLE bkt.db.n (k BIGINT, v STRING) " +
      "PARTITIONED BY (bucket(4, k))")
    spark.sql("INSERT INTO bkt.db.n VALUES (1, 'a'), (NULL, 'x'), (2, 'b'), " +
      "(NULL, 'y')")
    val t = spark.table("bkt.db.n")
    assert(t.filter($"k".isNull).count() == 2L)
    val all = planned(t)
    assert(planned(t.filter($"k".isNull)) < all,
      "IS NULL must plan only the null-token batch")
    assert(planned(t.filter($"k".isNotNull)) < all,
      "IS NOT NULL must drop the null-token batch")
    assert(t.filter($"k" <=> 1L).count() == 1L)
  }

  test("string buckets prune; bucket ids are the engine-canonical hash") {
    spark.sql("CREATE TABLE bkt.db.s (name STRING, v BIGINT) " +
      "PARTITIONED BY (bucket(8, name))")
    spark.sql("INSERT INTO bkt.db.s SELECT CONCAT('user', id), id " +
      "FROM range(0, 200)")
    val t = spark.table("bkt.db.s")
    val probe = t.filter($"name" === "user42")
    assert(probe.count() == 1L)
    assert(planned(probe) < planned(t))
    // the stored token matches the canonical function
    val root = rootOf("s")
    val vv = CommitLog.latestVersion(root)
    val expected = CommitLogBucket.idOfBytes("user42".getBytes("UTF-8"), 8)
    val holding = CommitLog.partsOf(root, vv).collect {
      case (_, m) if m.get("bucket8(name)").flatMap(CommitLog.partValue)
        .contains(expected.toString) => 1
    }
    assert(holding.nonEmpty, "some batch must carry user42's bucket token")
  }

  test("type widening keeps every row's bucket (long-canonical ids)") {
    spark.sql("CREATE TABLE bkt.db.w (k INT, v STRING) " +
      "PARTITIONED BY (bucket(8, k))")
    spark.sql("INSERT INTO bkt.db.w SELECT CAST(id AS INT), CONCAT('v', id) " +
      "FROM range(0, 100)")
    val root = rootOf("w")
    CommitLog.widenColumn(root, "k", LongType)
    spark.sql("INSERT INTO bkt.db.w SELECT CAST(id AS BIGINT), 'wide' " +
      "FROM range(100, 200)")
    val t = spark.table("bkt.db.w")
    assert(t.schema("k").dataType == LongType)
    assert(t.count() == 200L)
    // a probe for a NARROW-era key prunes under the WIDE type: the int
    // era hashed the long form, so the pushed bigint literal derives
    // the same id
    val probe = t.filter($"k" === 42L)
    assert(probe.count() == 1L)
    assert(planned(probe) < planned(t),
      "widening must not break narrow-era bucket pruning")
  }

  test("evolution to and from bucket specs; repartition re-buckets") {
    spark.sql("CREATE TABLE bkt.db.e (k BIGINT, g STRING) " +
      "PARTITIONED BY (g)")
    spark.sql("INSERT INTO bkt.db.e SELECT id, CASE WHEN id % 2 = 0 " +
      "THEN 'a' ELSE 'b' END FROM range(0, 40)")
    val root = rootOf("e")
    CommitLog.setPartitioning(root, Seq("bucket4(k)"))
    spark.sql("INSERT INTO bkt.db.e SELECT id, 'new' FROM range(100, 140)")
    val v = CommitLog.latestVersion(root)
    val parts = CommitLog.partsOf(root, v)
    val newKeyed = CommitLog.files(root, v)
      .filter(b => parts.get(b).exists(_.keySet == Set("bucket4(k)")))
    assert(newKeyed.nonEmpty, "post-evolution batches key on the bucket spec")
    assert(spark.table("bkt.db.e").count() == 80L)
    // refusals: unsupported bucket source type
    intercept[IllegalArgumentException] {
      CommitLog.setPartitioning(rootOf("e"), Seq("bucket4(nope)"))
    }
    // optimizeRepartition re-lands the identity-era stragglers under
    // the bucket spec (clustering on the SOURCE column)
    CommitLogOptimize.optimizeRepartition(spark, root)
    val v2 = CommitLog.latestVersion(root)
    val parts2 = CommitLog.partsOf(root, v2)
    assert(CommitLog.files(root, v2).forall(b =>
      parts2.get(b).exists(_.keySet == Set("bucket4(k)"))),
      "every live batch must carry the bucket token after repartition")
    assert(spark.table("bkt.db.e").count() == 80L)
    val probe = spark.table("bkt.db.e").filter($"k" === 3L)
    assert(probe.count() == 1L)
    assert(planned(probe) < planned(spark.table("bkt.db.e")))
  }

  test("SPJ: two bucket(8, k) tables join with zero shuffle") {
    Seq("l", "r").foreach { t =>
      spark.sql(s"CREATE TABLE bkt.db.spj_$t (k BIGINT, v BIGINT) " +
        "PARTITIONED BY (bucket(8, k))")
      spark.sql(s"INSERT INTO bkt.db.spj_$t SELECT id, id * 10 " +
        "FROM range(0, 200)")
    }
    val confs = Seq(
      "spark.sql.sources.v2.bucketing.enabled" -> "true",
      "spark.sql.sources.v2.bucketing.pushPartValues.enabled" -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = confs.map { case (c, _) => c -> spark.conf.getOption(c) }
    confs.foreach { case (c, x) => spark.conf.set(c, x) }
    try {
      val j = spark.sql(
        "SELECT count(*) AS n, sum(l.v + r.v) AS s FROM bkt.db.spj_l l " +
          "JOIN bkt.db.spj_r r ON l.k = r.k")
      val row = j.head()
      assert(row.getLong(0) == 200L)
      assert(row.getLong(1) == (0L until 200L).map(i => i * 20L).sum)
      val all = graft.queries.Qh.flattenPlan(j.queryExecution.executedPlan)
      val joins = all.collect {
        case s: org.apache.spark.sql.execution.joins.SortMergeJoinExec => s
      }
      // no exchange INSIDE the join subtree (the global aggregate above
      // it legitimately plans its own SinglePartition exchange)
      val joinShuffles = joins.flatMap(graft.queries.Qh.flattenPlan).collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike => e
      }
      assert(joins.nonEmpty && joinShuffles.isEmpty,
        s"bucketed SPJ must delete both join exchanges (the function " +
          s"catalog resolves the transform):\n${j.queryExecution.executedPlan}")
    } finally saved.foreach {
      case (c, Some(x)) => spark.conf.set(c, x)
      case (c, None) => spark.conf.unset(c)
    }
  }

  test("unsupported transforms and types refuse loudly") {
    intercept[Exception] {
      spark.sql("CREATE TABLE bkt.db.bad1 (k DOUBLE, v STRING) " +
        "PARTITIONED BY (bucket(8, k))") // float keys refused
    }
    intercept[Exception] {
      spark.sql("CREATE TABLE bkt.db.bad2 (ts TIMESTAMP, v STRING) " +
        "PARTITIONED BY (foo(ts))") // unknown transform refused
    }
    intercept[Exception] {
      spark.sql("CREATE TABLE bkt.db.bad3 (ts TIMESTAMP, v STRING) " +
        "PARTITIONED BY (days(v))") // time transform over a string
    }
  }
}
