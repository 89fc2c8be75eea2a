package graft

import graft.sources.{CommitLog, CommitLogDml, CommitLogWrite}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._
import graft.queries.Qh

/** TOP-N PUSHDOWN (SURVEY S69) — `ORDER BY c LIMIT k` plans only the
  * files that can hold the global top-k, decided from manifest boxes
  * (accumulate exact counts down the lo-sorted batches to bound the
  * k-th value, keep batches whose box reaches it). With write-time
  * sort order the boxes are range-disjoint, so the plan opens one
  * file of N at 100 TB. Partial pushdown: Spark re-sorts above the
  * scan, so the cut can only change the files opened, never results.
  * Requires a `c IS NOT NULL` CHECK in force (counts must equal
  * non-null counts for the bound). */
class TopNPushdownSpec extends SparkSpec {
  import spark.implicits._

  private def freshRoot(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_tn_$tag").toString

  private def planned(df: DataFrame): Int =
    df.queryExecution.executedPlan.collect {
      case b: BatchScanExec => b.inputPartitions.length
    }.sum

  private def mkSorted(tag: String): String = {
    val root = freshRoot(tag)
    spark.range(0, 100000).toDF("id").withColumn("v", $"id" * 3)
      .repartition(8)
      .write.format("commitlog").option("path", root)
      .option("sortOrder", "id").option("sortBuckets", "8")
      .mode("append").save()
    CommitLogWrite.addConstraint(spark, root, "id_nn", "id IS NOT NULL")
    root
  }

  test("ORDER BY LIMIT opens one range-disjoint file of eight, both directions") {
    val root = mkSorted("basic")
    def tbl = spark.read.format("commitlog").option("path", root).load()
    assert(planned(tbl) == 8)
    val topDesc = tbl.orderBy($"id".desc).limit(5)
    assert(planned(topDesc) == 1,
      s"DESC top-5 should open 1 of 8 files, opened ${planned(topDesc)}")
    assert(topDesc.select($"id").as[Long].collect().toSeq ==
      (99999L to 99995L by -1))
    val topAsc = tbl.orderBy($"id".asc).limit(5)
    assert(planned(topAsc) == 1,
      s"ASC top-5 should open 1 of 8 files, opened ${planned(topAsc)}")
    assert(topAsc.select($"id").as[Long].collect().toSeq == (0L until 5L))
    // a k spanning file boundaries opens only the files it needs (the
    // exact count depends on the range-partitioner's sampled
    // boundaries — pin that the cut engages without over-pruning)
    val big = tbl.orderBy($"id".desc).limit(13000)
    assert(planned(big) >= 1 && planned(big) <= 3,
      s"13k of 100k rows should open 1-3 of 8 files: ${planned(big)}")
    assert(big.agg(min($"id")).head().getLong(0) == 100000L - 13000L)
  }

  test("null counts, DVs, and overlapping boxes: the cut's decline matrix") {
    // NULLABLE column without a CHECK: since r15 the per-batch null
    // counts the sink records replace the proof — the cut bounds over
    // NON-NULL counts and still opens one file
    val noCk = freshRoot("nock")
    spark.range(0, 1000).toDF("id0")
      .select(when($"id0" >= 0, $"id0").as("id")).repartition(4)
      .write.format("commitlog").option("path", noCk)
      .option("sortOrder", "id").option("sortBuckets", "4")
      .mode("append").save()
    val t1 = spark.read.format("commitlog").option("path", noCk).load()
      .orderBy($"id".desc).limit(3)
    assert(planned(t1) == 1,
      "null counts must carry the bound without a NOT NULL proof")
    assert(t1.select($"id").as[Long].collect().toSeq == Seq(999L, 998L, 997L))

    // neither proof NOR null counts (a hand-committed box-only
    // manifest, the pre-r15 shape): the cut must NOT run
    val noNulls = freshRoot("nonulls")
    spark.range(0, 100).toDF("id0")
      .select(when($"id0" >= 0, $"id0").as("id")).coalesce(1)
      .write.mode("overwrite").parquet(s"$noNulls/_tmp_a")
    (0 until 2).foreach { i =>
      val dir = new java.io.File(s"$noNulls/g$i"); dir.mkdirs()
      val part = new java.io.File(s"$noNulls/_tmp_a").listFiles()
        .find(_.getName.endsWith(".parquet")).get
      java.nio.file.Files.copy(part.toPath,
        new java.io.File(dir, "part-0.parquet").toPath)
      CommitLog.commit(noNulls, i, added = Seq(s"g$i"),
        schema = Some("id BIGINT"),
        stats = Map(s"g$i" -> Map(
          "id" -> graft.sources.CommitLog.ColStat(0.0, 99.0))),
        rows = Map(s"g$i" -> 100L))
    }
    val t1b = spark.read.format("commitlog").option("path", noNulls).load()
      .orderBy($"id".desc).limit(3)
    assert(planned(t1b) == 2,
      "box-only stats (no null counts, no proof) must disable the cut")
    assert(t1b.select($"id").as[Long].collect().toSeq == Seq(99L, 99L, 98L))

    // outstanding DVs: counts over-estimate, cut disabled
    val dv = mkSorted("dv")
    spark.conf.set("spark.graft.rowLevel.mode", "delta")
    try CommitLogDml.delete(spark, dv, "id = 99999", changeFeed = false)
    finally spark.conf.set("spark.graft.rowLevel.mode", "cow")
    val t2 = spark.read.format("commitlog").option("path", dv).load()
      .orderBy($"id".desc).limit(3)
    assert(t2.select($"id").as[Long].collect().toSeq ==
      Seq(99998L, 99997L, 99996L))

    // unsorted (overlapping boxes): the bound keeps every candidate
    // file — correctness unchanged
    val unsorted = freshRoot("uns")
    spark.range(0, 10000).toDF("id")
      .withColumn("v", Qh.phash($"id".cast("string"), 5)) // interleaved values
      .repartition(4)
      .write.format("commitlog").option("path", unsorted)
      .mode("append").save()
    CommitLogWrite.addConstraint(spark, unsorted, "v_nn", "v IS NOT NULL")
    val full = spark.read.format("commitlog").option("path", unsorted).load()
      .orderBy($"v".desc, $"id").limit(7).select($"id").as[Long].collect().toSeq
    val expect = spark.read.format("commitlog").option("path", unsorted).load()
      .collect().map(r => (r.getLong(1), r.getLong(0)))
      .sortBy { case (v, id) => (-v, id) }.take(7).map(_._2).toSeq
    assert(full == expect)
  }

  test("a declared NOT NULL column proves the bound without a CHECK") {
    val wh = freshRoot("nnwh")
    spark.conf.set("spark.sql.catalog.tnn", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.tnn.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS tnn.db")
    spark.sql("CREATE TABLE tnn.db.t (id BIGINT NOT NULL, v BIGINT) " +
      "TBLPROPERTIES ('graft.write.sortOrder'='id', " +
      "'graft.write.sortBuckets'='4')")
    spark.sql("INSERT INTO tnn.db.t SELECT id, id * 2 FROM range(0, 20000)")
    val top = spark.sql(
      "SELECT id FROM tnn.db.t ORDER BY id DESC LIMIT 3")
    assert(planned(top) == 1,
      s"schema NOT NULL should prove the cut: ${planned(top)}")
    assert(top.as[Long].collect().toSeq == Seq(19999L, 19998L, 19997L))
  }

  test("a count-less batch disables the cut instead of being dropped as empty") {
    // a batch with no recorded row count is indistinguishable from an
    // empty one inside the bound computation — the cut must go
    // unprovable (keep all), never treat it as zero rows (review
    // finding: the live-batch filter silently pruned it, losing rows)
    val root = mkSorted("nocount")
    // graft a batch holding the new GLOBAL MAX, committed without a
    // row count (direct manifest append, the pre-counts-era shape)
    val extra = new java.io.File(s"$root/xtra")
    extra.mkdirs()
    spark.range(200000, 200003).toDF("id").withColumn("v", $"id" * 3)
      .coalesce(1).write.mode("overwrite").parquet(s"$root/_tmp_x")
    val part = new java.io.File(s"$root/_tmp_x").listFiles()
      .find(_.getName.endsWith(".parquet")).get
    java.nio.file.Files.move(part.toPath,
      new java.io.File(extra, "part-x.parquet").toPath)
    CommitLog.commit(root, CommitLog.latestVersion(root),
      added = Seq("xtra"))
    val top = spark.read.format("commitlog").option("path", root).load()
      .orderBy($"id".desc).limit(2)
    assert(planned(top) == 9, "count-less batch must disable the cut")
    assert(top.select($"id").as[Long].collect().toSeq ==
      Seq(200002L, 200001L))
  }

  test("a trailing tie-break key keeps the leading-key cut") {
    // `ORDER BY id DESC, v ASC LIMIT 5`: lexicographic order is
    // primarily by id, so the top-5 carry exactly the 5 largest ids —
    // the trailing key only breaks ties and cannot pull a row from a
    // batch whose id box misses the bound. Same one-file plan as the
    // single-key spelling; Spark applies the full multi-key sort above.
    val root = mkSorted("multi")
    val tbl = spark.read.format("commitlog").option("path", root).load()
    val top = tbl.orderBy($"id".desc, $"v".asc).limit(5)
    assert(planned(top) == 1,
      s"leading-key bound should cut to 1 of 8 files: ${planned(top)}")
    assert(top.select($"id").as[Long].collect().toSeq ==
      (99999L to 99995L by -1))
  }

  test("a constraint drop + null append between pushdown and scan stays exact") {
    // pushdown accepts against version v; a concurrent DROP CONSTRAINT
    // + null-bearing append lands before the scan resolves. The cut
    // self-gates at the SCAN's version: the proof is gone there, so
    // the bound falls back to the per-batch null counts — which see
    // the new null (DESC NULLS LAST: the null batch is all-null in id
    // and prunable; the bound holds on the four counted batches).
    // Results stay exact either way; the old proof-version race has
    // no window at all.
    import org.apache.spark.sql.connector.expressions.{Expressions, SortDirection}
    import org.apache.spark.sql.util.CaseInsensitiveStringMap
    val root = freshRoot("race")
    spark.range(0, 1000).toDF("id0")
      .select(when($"id0" >= 0, $"id0").as("id"),
        when($"id0" >= 0, $"id0" * 3).as("v"))
      .repartition(4)
      .write.format("commitlog").option("path", root)
      .option("sortOrder", "id").option("sortBuckets", "4")
      .mode("append").save() // v1 (nullable DDL — no schema proof)
    CommitLogWrite.addConstraint(spark, root, "id_nn", "id IS NOT NULL") // v2
    val schema = spark.read.format("commitlog").option("path", root)
      .load().schema
    def builderWithTopN() = {
      val b = new graft.sources.CommitLogScanBuilder(
        root, schema, new CaseInsensitiveStringMap(java.util.Map.of()))
      assert(b.pushTopN(Array(Expressions.sort(
        Expressions.column("id"), SortDirection.DESCENDING)), 3))
      b
    }
    def plannedFiles(b: graft.sources.CommitLogScanBuilder): Int =
      b.build().toBatch.planInputPartitions().length
    // control: no intervening commit — the cut runs
    assert(plannedFiles(builderWithTopN()) == 1)
    // race: accept, then drop the constraint and append a null id
    val raced = builderWithTopN()
    CommitLog.dropConstraint(root, "id_nn") // v3
    Seq((Option.empty[Long], Option.empty[Long])).toDF("id", "v")
      .write.format("commitlog").option("path", root)
      .mode("append").save() // v4: a null id is live
    assert(plannedFiles(raced) == 1,
      "null counts replace the dropped proof; the all-null batch prunes " +
        "under DESC NULLS LAST")
    // and the full read at v4 answers exactly (the null sorts last)
    val top = spark.read.format("commitlog").option("path", root).load()
      .orderBy($"id".desc).limit(3)
    assert(top.select($"id").as[Long].collect().toSeq ==
      Seq(999L, 998L, 997L))
    // NULLS FIRST flips the competition: the null batch must be kept
    // and the null row leads
    val nf = spark.read.format("commitlog").option("path", root).load()
      .orderBy($"id".desc_nulls_first).limit(1)
    assert(nf.select($"id").collect().head.isNullAt(0),
      "DESC NULLS FIRST: the null row is the top-1")
  }

  test("time travel pins the constraint check to the read version") {
    val root = freshRoot("tt")
    spark.range(0, 1000).toDF("id0")
      .select(when($"id0" >= 0, $"id0").as("id")).repartition(2)
      .write.format("commitlog").option("path", root)
      .option("sortOrder", "id").option("sortBuckets", "2")
      .mode("append").save() // v1: no constraint yet
    CommitLogWrite.addConstraint(spark, root, "id_nn", "id IS NOT NULL") // v2
    val atV1 = spark.read.format("commitlog").option("path", root)
      .option("versionAsOf", 1).load().orderBy($"id".desc).limit(2)
    assert(planned(atV1) == 1,
      "v1 has no NOT NULL proof, but its null counts carry the bound")
    assert(atV1.select($"id").as[Long].collect().toSeq == Seq(999L, 998L))
    val atV2 = spark.read.format("commitlog").option("path", root)
      .option("versionAsOf", 2).load().orderBy($"id".desc).limit(2)
    assert(planned(atV2) == 1, "v2 proves NOT NULL — cut applies")
    assert(atV2.select($"id").as[Long].collect().toSeq == Seq(999L, 998L))
  }

  test("a STRING sort column cuts through S73's byte-lex bounds (r16)") {
    // zero-padded keys: byte-lex order == numeric order, so the
    // range-partitioned write yields byte-disjoint string bounds
    val root = freshRoot("str")
    spark.range(0, 100000).select(
        format_string("k%08d", $"id").as("name"), $"id".as("v"))
      .repartition(8)
      .write.format("commitlog").option("path", root)
      .option("sortOrder", "name").option("sortBuckets", "8")
      .mode("append").save()
    def tbl = spark.read.format("commitlog").option("path", root).load()
    assert(planned(tbl) == 8)
    // no NOT NULL constraint: the per-batch null counts carry the
    // bound, exactly like the numeric spelling
    val topDesc = tbl.orderBy($"name".desc).limit(5)
    assert(planned(topDesc) == 1,
      s"string DESC top-5 should open 1 of 8 files: ${planned(topDesc)}")
    assert(topDesc.select($"name").as[String].collect().toSeq ==
      (99999L to 99995L by -1).map(i => f"k$i%08d"))
    val topAsc = tbl.orderBy($"name".asc).limit(5)
    assert(planned(topAsc) == 1,
      s"string ASC top-5 should open 1 of 8 files: ${planned(topAsc)}")
    assert(topAsc.select($"name").as[String].collect().toSeq ==
      (0L until 5L).map(i => f"k$i%08d"))
    // a trailing tie-break key keeps the leading string cut
    val multi = tbl.orderBy($"name".desc, $"v".asc).limit(3)
    assert(planned(multi) == 1,
      s"multi-key with string leading key: ${planned(multi)}")
  }

  test("string bounds truncated past StrCap stay sound: decline, never wrong") {
    // every key shares a 40-byte prefix, so the stored 32-byte bounds
    // coincide across files (lower = shared prefix, upper = its
    // increment): the cut finds no separating bound and keeps all —
    // correctness over pruning
    val root = freshRoot("strcap")
    val prefix = "p" * 40
    spark.range(0, 4000).select(
        concat(lit(prefix), format_string("k%06d", $"id")).as("name"))
      .repartition(4)
      .write.format("commitlog").option("path", root)
      .option("sortOrder", "name").option("sortBuckets", "4")
      .mode("append").save()
    val top = spark.read.format("commitlog").option("path", root).load()
      .orderBy($"name".desc).limit(3)
    assert(planned(top) == 4,
      s"identical truncated bounds must keep all 4 files: ${planned(top)}")
    assert(top.select($"name").as[String].collect().toSeq ==
      (3999L to 3997L by -1).map(i => f"${prefix}k$i%06d"))
    // keys that DIVERGE inside the cap prune normally even at length
    // > cap (the differing byte sits inside the stored 32)
    val root2 = freshRoot("strdiv")
    spark.range(0, 4000).select(
        concat(format_string("k%06d", $"id"), lit(prefix)).as("name"))
      .repartition(4)
      .write.format("commitlog").option("path", root2)
      .option("sortOrder", "name").option("sortBuckets", "4")
      .mode("append").save()
    val top2 = spark.read.format("commitlog").option("path", root2).load()
      .orderBy($"name".asc).limit(3)
    assert(planned(top2) == 1,
      s"in-cap divergence prunes long strings too: ${planned(top2)}")
    assert(top2.select($"name").as[String].collect().toSeq ==
      (0L until 3L).map(i => f"k$i%06d$prefix"))
  }
}
