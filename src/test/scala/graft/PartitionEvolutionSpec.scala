package graft

import graft.sources.{CommitLog, CommitLogAggScan, CommitLogOptimize,
  CommitLogScan}
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._

/** PARTITION SPEC EVOLUTION (SURVEY S80): `setPartitioning` re-declares
  * the partition spec as one metadata commit (Iceberg's partition
  * evolution) — no data file moves. Every committed batch keeps its
  * own era's tuple, so pruning stays per-batch (old eras prune on old
  * columns, new on new), SPJ declines on mixed eras and comes back
  * after `optimizeRepartition` re-lands the table under the current
  * spec, dynamic overwrite matches on tuples PROJECTED onto the
  * current spec, and metadata GROUP BY answers from token presence
  * rather than current-spec membership.
  */
class PartitionEvolutionSpec extends SparkSpec {
  import spark.implicits._

  private val wh = java.nio.file.Files.createTempDirectory("graft_pev").toString
  spark.conf.set("spark.sql.catalog.pev", "graft.sources.GraftCatalog")
  spark.conf.set("spark.sql.catalog.pev.warehouse", wh)
  spark.sql("CREATE NAMESPACE IF NOT EXISTS pev.db")

  private def rootOf(t: String): String = s"$wh/db/$t"

  private def scanOf(df: org.apache.spark.sql.DataFrame): Seq[BatchScanExec] =
    df.queryExecution.executedPlan.collect { case b: BatchScanExec => b }

  private def flatten(p: org.apache.spark.sql.execution.SparkPlan) =
    graft.queries.Qh.flattenPlan(p)

  test("evolution is one metadata commit; each era prunes on its own columns") {
    spark.sql("CREATE TABLE pev.db.t (k BIGINT, region STRING, day INT) " +
      "PARTITIONED BY (region)")
    spark.sql("INSERT INTO pev.db.t SELECT id, " +
      "CASE WHEN id % 2 = 0 THEN 'us' ELSE 'eu' END, 1 FROM range(0, 40)")
    val root = rootOf("t")
    val filesBefore = CommitLog.files(root, CommitLog.latestVersion(root))

    spark.sql("CALL pev.system.set_partitioning(tbl => 'db.t', cols => 'day')")
    val v = CommitLog.latestVersion(root)
    assert(CommitLog.partColsOf(root, v) == Seq("day"))
    assert(CommitLog.history(root).last.operation.contains("SET PARTITIONING"))
    assert(CommitLog.files(root, v).toSet == filesBefore.toSet,
      "evolution must move ZERO data files")
    // time travel sees the era's spec
    assert(CommitLog.partColsOf(root, v - 1) == Seq("region"))

    // new writes bucket by the NEW spec
    spark.sql("INSERT INTO pev.db.t SELECT id, 'ap', CAST(id % 2 AS INT) + 2 " +
      "FROM range(100, 140)")
    val vNew = CommitLog.latestVersion(root)
    val newBatches = CommitLog.files(root, vNew).filterNot(filesBefore.contains)
    val parts = CommitLog.partsOf(root, vNew)
    assert(newBatches.nonEmpty && newBatches.forall(b =>
      parts(b).keySet == Set("day")), "new batches must key on day alone")

    // an old-era filter prunes old-era batches by their region tokens;
    // new-era batches (no region token) are kept as unknown
    val oldCut = spark.table("pev.db.t").filter($"region" === "us")
    assert(oldCut.count() == 20L)
    val oldPlanned = scanOf(oldCut).head.inputPartitions.length
    // a new-era filter prunes new-era batches by day tokens; old kept
    val newCut = spark.table("pev.db.t").filter($"day" === 2)
    assert(newCut.count() == 20L)
    val newPlanned = scanOf(newCut).head.inputPartitions.length
    val allPlanned = scanOf(spark.table("pev.db.t")).head.inputPartitions.length
    assert(oldPlanned < allPlanned, s"region filter must prune: $oldPlanned/$allPlanned")
    assert(newPlanned < allPlanned, s"day filter must prune: $newPlanned/$allPlanned")
    assert(spark.table("pev.db.t").count() == 80L)
  }

  test("gates: unknown column, duplicates, untokenizable types, no-op") {
    spark.sql("CREATE TABLE pev.db.g (k BIGINT, a ARRAY<INT>, s STRING) " +
      "PARTITIONED BY (s)")
    val root = rootOf("g")
    intercept[IllegalArgumentException] {
      CommitLog.setPartitioning(root, Seq("nope"))
    }
    intercept[IllegalArgumentException] {
      CommitLog.setPartitioning(root, Seq("a")) // array cannot key a tuple
    }
    intercept[IllegalArgumentException] {
      CommitLog.setPartitioning(root, Seq("k", "k"))
    }
    val v = CommitLog.latestVersion(root)
    CommitLog.setPartitioning(root, Seq("s")) // already the spec: no-op
    assert(CommitLog.latestVersion(root) == v)
  }

  test("un-partitioning round-trips replay and checkpoints") {
    spark.sql("CREATE TABLE pev.db.u (k BIGINT, p STRING) PARTITIONED BY (p)")
    spark.sql("INSERT INTO pev.db.u VALUES (1, 'a'), (2, 'b')")
    val root = rootOf("u")
    spark.sql("CALL pev.system.set_partitioning(tbl => 'db.u', cols => '')")
    assert(CommitLog.partColsOf(root, CommitLog.latestVersion(root)).isEmpty,
      "the sentinel must read back as NO partitioning, not inherit")
    // future writes land unpartitioned (no tuple)
    spark.sql("INSERT INTO pev.db.u VALUES (3, 'c')")
    val v = CommitLog.latestVersion(root)
    val tupleless = CommitLog.files(root, v)
      .filterNot(CommitLog.partsOf(root, v).contains)
    assert(tupleless.nonEmpty, "an unpartitioned append carries no tuple")
    // a checkpoint replays the effective (empty) spec
    CommitLog.writeCheckpoint(root, v)
    assert(CommitLog.partColsOf(root, v).isEmpty)
    assert(spark.table("pev.db.u").count() == 3L)
    // re-partitioning after un-partitioning works (tokens resume)
    CommitLog.setPartitioning(root, Seq("p"))
    spark.sql("INSERT INTO pev.db.u VALUES (4, 'd')")
    val v2 = CommitLog.latestVersion(root)
    val latest = CommitLog.files(root, v2)
      .filter(CommitLog.partsOf(root, v2).get(_).exists(_.contains("p")))
    assert(latest.nonEmpty)
  }

  test("dynamic overwrite matches on the tuple projected onto the current spec") {
    spark.sql("CREATE TABLE pev.db.d (k BIGINT, region STRING, day INT) " +
      "PARTITIONED BY (region, day)")
    spark.sql("INSERT INTO pev.db.d VALUES " +
      "(1, 'us', 1), (2, 'eu', 1), (3, 'us', 2), (4, 'eu', 2)")
    val root = rootOf("d")
    // narrow the spec: (region, day) -> (day). Old tuples carry BOTH
    // tokens; their projection onto (day) is their current partition.
    CommitLog.setPartitioning(root, Seq("day"))
    val saved = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try {
      spark.sql("INSERT OVERWRITE TABLE pev.db.d VALUES (30, 'ap', 2)")
    } finally saved match {
      case Some(s) => spark.conf.set("spark.sql.sources.partitionOverwriteMode", s)
      case None => spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
    }
    val rows = spark.table("pev.db.d").orderBy("k")
      .collect().map(r => (r.getLong(0), r.getInt(2))).toSeq
    assert(rows == Seq((1L, 1), (2L, 1), (30L, 2)),
      s"day=2 must be replaced across BOTH old region tuples, got $rows")
  }

  test("metadata GROUP BY answers from token presence across eras") {
    spark.sql("CREATE TABLE pev.db.m (k BIGINT, region STRING, day INT) " +
      "PARTITIONED BY (region)")
    spark.sql("INSERT INTO pev.db.m SELECT id, " +
      "CASE WHEN id % 2 = 0 THEN 'us' ELSE 'eu' END, 1 FROM range(0, 20)")
    val root = rootOf("m")
    CommitLog.setPartitioning(root, Seq("day"))
    // every live batch still carries region tokens: the ex-partition
    // column keeps answering from metadata
    val g1 = spark.sql("SELECT region, count(*) AS n FROM pev.db.m GROUP BY region")
    assert(scanOf(g1).forall(_.scan.isInstanceOf[CommitLogAggScan]),
      s"homogeneous old era must stay metadata-served:\n${g1.queryExecution.executedPlan}")
    assert(g1.collect().map(r => (r.getString(0), r.getLong(1))).sortBy(_._1)
      .toSeq == Seq(("eu", 10L), ("us", 10L)))
    // a new-era batch has no region token: decline, stay correct
    spark.sql("INSERT INTO pev.db.m VALUES (100, 'us', 2)")
    val g2 = spark.sql("SELECT region, count(*) AS n FROM pev.db.m GROUP BY region")
    assert(scanOf(g2).forall(_.scan.isInstanceOf[CommitLogScan]),
      "a token-less new-era batch must decline the metadata path")
    assert(g2.collect().map(r => (r.getString(0), r.getLong(1))).sortBy(_._1)
      .toSeq == Seq(("eu", 10L), ("us", 11L)))
    // the NEW spec's column serves once every live batch carries it…
    // (old-era region batches have no day token, so day also declines)
    val g3 = spark.sql("SELECT day, count(*) AS n FROM pev.db.m GROUP BY day")
    assert(scanOf(g3).forall(_.scan.isInstanceOf[CommitLogScan]))
    assert(g3.collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
      .toSeq == Seq((1, 20L), (2, 1L)))
  }

  test("SPJ declines on mixed eras; spec restore + repartition revives it") {
    Seq("a", "b").foreach { t =>
      spark.sql(s"CREATE TABLE pev.db.spj_$t (k BIGINT, v BIGINT, g STRING) " +
        "PARTITIONED BY (g)")
      spark.sql(s"INSERT INTO pev.db.spj_$t SELECT id, id, " +
        "CASE WHEN id % 3 = 0 THEN 'x' WHEN id % 3 = 1 THEN 'y' ELSE 'z' END " +
        "FROM range(0, 30)")
    }
    val root = rootOf("spj_a")
    val confs = Seq(
      "spark.sql.sources.v2.bucketing.enabled" -> "true",
      "spark.sql.sources.v2.bucketing.pushPartValues.enabled" -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = confs.map { case (c, _) => c -> spark.conf.getOption(c) }
    confs.foreach { case (c, x) => spark.conf.set(c, x) }
    def joined() = spark.sql(
      "SELECT a.g, count(*) AS n FROM pev.db.spj_a a " +
        "JOIN pev.db.spj_b b ON a.g = b.g GROUP BY a.g")
    def shuffles(df: org.apache.spark.sql.DataFrame) =
      flatten(df.queryExecution.executedPlan).collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike => e
      }
    try {
      assert(shuffles(joined()).isEmpty, "co-partitioned baseline is SPJ")
      // evolve spj_a to (v) and land one new-era batch: mixed tuples
      CommitLog.setPartitioning(root, Seq("v"))
      spark.sql("INSERT INTO pev.db.spj_a VALUES (100, 7, 'x')")
      val mixed = joined()
      assert(shuffles(mixed).nonEmpty,
        s"mixed eras must decline SPJ:\n${mixed.queryExecution.executedPlan}")
      assert(mixed.collect().map(r => (r.getString(0), r.getLong(1))).sortBy(_._1)
        .toSeq == Seq(("x", 110L), ("y", 100L), ("z", 100L)))
      // restore the g spec and re-land stragglers under it: SPJ revives
      CommitLog.setPartitioning(root, Seq("g"))
      CommitLogOptimize.optimizeRepartition(spark, root)
      val revived = joined()
      assert(shuffles(revived).isEmpty,
        s"repartitioned table must join shuffle-free again:\n${revived.queryExecution.executedPlan}")
      assert(revived.collect().map(r => (r.getString(0), r.getLong(1))).sortBy(_._1)
        .toSeq == Seq(("x", 110L), ("y", 100L), ("z", 100L)))
    } finally saved.foreach {
      case (c, Some(x)) => spark.conf.set(c, x)
      case (c, None) => spark.conf.unset(c)
    }
  }
}
