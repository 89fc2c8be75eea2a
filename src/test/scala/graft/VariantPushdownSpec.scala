package graft

import graft.sources.{CommitLog, CommitLogDml}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** VARIANT EXTRACTION PUSHDOWN (SURVEY S68) — `variant_get(v, '$.k')`
  * pushes into the commitlog scan via Spark's DSv2
  * `SupportsPushDownVariantExtractions`: the scan rewrites the variant
  * column to a struct of the requested paths, the vectorized leg hands
  * the VariantMetadata-annotated struct to Spark's parquet reader
  * (which serves a SHREDDED file from just that subcolumn — the point
  * of shredding), and the row leg (DV reads) reassembles + evaluates
  * per row. At 100 TB the variant binary dominates the table's bytes;
  * replacing it with one shredded subcolumn is the difference between
  * scanning the table and scanning one field of it. */
class VariantPushdownSpec extends SparkSpec {
  import spark.implicits._

  private def freshRoot(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_vp_$tag").toString

  private def pushed[T](on: Boolean)(f: => T): T = {
    val prev = spark.conf.get("spark.sql.variant.pushVariantIntoScan")
    spark.conf.set("spark.sql.variant.pushVariantIntoScan", on.toString)
    try f finally
      spark.conf.set("spark.sql.variant.pushVariantIntoScan", prev)
  }

  test("extraction pushes into the scan and matches on all three layouts") {
    val root = freshRoot("tri")
    spark.range(0, 1000).toDF("id")
      .select($"id", parse_json(format_string(
        """{"k":%d,"s":"v%d"}""", $"id", $"id" % 7)).as("v"))
      .write.format("commitlog").option("path", root).mode("append").save()
    def q: DataFrame = spark.read.format("commitlog").option("path", root)
      .load().select($"id", variant_get($"v", "$.k", "long").as("kv"),
        variant_get($"v", "$.s", "string").as("sv"))
    def sums: (Long, Long) = {
      val r = q.agg(sum($"kv"), sum(length($"sv"))).head()
      (r.getLong(0), r.getLong(1))
    }
    // the plan really pushed: the projection reads struct ordinals off
    // the scan, no variant_get above it
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains(".0 AS kv") && plan.contains(".1 AS sv"),
      s"extractions not pushed:\n$plan")
    assert(!plan.contains("variant_get"), s"variant_get survived:\n$plan")

    // UNSHREDDED (sink layout)
    assert(sums == pushed(on = false)(sums))
    // SHREDDED (Spark's writer under a COW rewrite)
    CommitLogDml.delete(spark, root, "id % 2 = 0", changeFeed = false)
    assert(sums == pushed(on = false)(sums))
    assert(sums._1 == (1 until 1000 by 2).map(_.toLong).sum)
    // DV merge-on-read: the row leg evaluates the paths per row
    spark.conf.set("spark.graft.rowLevel.mode", "delta")
    try CommitLogDml.delete(spark, root, "id = 3", changeFeed = false)
    finally spark.conf.set("spark.graft.rowLevel.mode", "cow")
    assert(sums == pushed(on = false)(sums))
    assert(sums._1 == (1 until 1000 by 2).map(_.toLong).sum - 3)
  }

  test("whole-variant use alongside an extraction stays correct") {
    val root = freshRoot("whole")
    spark.range(0, 200).toDF("id")
      .select($"id", parse_json(format_string(
        """{"k":%d,"arr":[%d,%d]}""", $"id", $"id" % 3, $"id" % 5)).as("v"))
      .write.format("commitlog").option("path", root).mode("append").save()
    def q = spark.read.format("commitlog").option("path", root).load()
      .select(variant_get($"v", "$.k", "long").as("kv"),
        to_json($"v").as("j"))
      .orderBy("kv")
    val a = q.collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    val b = pushed(on = false)(
      q.collect().map(r => (r.getLong(0), r.getString(1))).toSeq)
    assert(a == b)
    assert(a.head == ((0L, """{"arr":[0,0],"k":0}""")))
  }

  test("append-only feed windows push extractions and run columnar (r15)") {
    // tailing the appends of an ingest table is the dominant feed
    // shape: every partition is an ordinary whole data file whose
    // stamps are constant, so the scan is COLUMNAR (stamps ride as
    // constant trailing partition vectors) and variant extractions
    // are accepted — `variant_get` over the feed reads the requested
    // path, not the whole binary
    val root = freshRoot("feed")
    (0 until 3).foreach { i =>
      spark.range(i * 100L, (i + 1) * 100L).toDF("id")
        .select($"id", parse_json(format_string("""{"k":%d}""", $"id")).as("v"))
        .repartition(1)
        .write.format("commitlog").option("path", root).mode("append").save()
    }
    def feed: DataFrame = spark.read.format("commitlog").option("path", root)
      .option("readChangeFeed", "true").option("startingVersion", 0).load()
      .select($"id", variant_get($"v", "$.k", "long").as("kv"),
        $"_change_type".as("ct"), $"_commit_version".as("cv"))
    val plan = feed.queryExecution.executedPlan.toString
    assert(plan.contains(".0 AS kv"), s"feed extraction not pushed:\n$plan")
    assert(!plan.contains("variant_get"), s"variant_get survived:\n$plan")
    assert(plan.contains("ColumnarToRow"),
      s"append-only window must run the vectorized leg:\n$plan")
    val rows = feed.collect()
    assert(rows.length == 300)
    assert(rows.forall(_.getString(2) == "insert"))
    assert(rows.forall(r => r.getLong(0) == r.getLong(1)))
    assert(rows.forall(r => r.getInt(3) == (r.getLong(0) / 100 + 1).toInt),
      "constant version stamps must match each partition's commit")
    // a rewrite enters the window: acceptance declines (whole-variant
    // read, file-granularity rows) — results stay exact
    CommitLogDml.delete(spark, root, "id = 7", changeFeed = false)
    val plan2 = feed.queryExecution.executedPlan.toString
    assert(!plan2.contains(".0 AS kv"),
      s"a window with removes must decline the extraction:\n$plan2")
    val folded = feed
      .withColumn("_s", graft.sources.CommitLogCdf.changeSign($"ct"))
      .groupBy("id", "kv").agg(sum($"_s").as("m")).filter($"m" =!= 0)
    assert(folded.count() == 299)
    assert(folded.filter($"id" === 7L).isEmpty)
  }

  test("metadata-bearing plans decline the pushdown (no attribute starvation)") {
    // buildScanWithPushedVariants consumes the scan-builder holder
    // BEFORE the column-pruning phase that conveys metadata columns to
    // the scan — NoVariantPushdownOnMetadataScans tags those relations
    // to decline, or the built scan starves the plan of _batch /
    // _row_file / the row id (INTERNAL_ERROR_ATTRIBUTE_NOT_FOUND)
    val root = freshRoot("meta")
    spark.range(0, 20).toDF("id")
      .select($"id", parse_json(format_string("""{"k":%d}""", $"id")).as("v"))
      .write.format("commitlog").option("path", root).mode("append").save()
    val r = spark.read.format("commitlog").option("path", root).load()
      .select(col("_batch"), variant_get($"v", "$.k", "long").as("kv"))
      .collect()
    assert(r.length == 20 && r.map(_.getLong(1)).sorted.toSeq == (0L until 20L))

    // the delta UPDATE on a tracked variant table scans with the rowId
    // metadata attributes — the decline must cover the wrapped
    // RowLevelOperationTable relation too
    val wh = freshRoot("metawh")
    spark.conf.set("spark.sql.catalog.vpm", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.vpm.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS vpm.db")
    spark.sql("CREATE TABLE vpm.db.t (k BIGINT, v VARIANT) " +
      "TBLPROPERTIES ('graft.rowTracking'='true')")
    spark.sql("INSERT INTO vpm.db.t SELECT id, " +
      "parse_json(format_string('{\"n\":%d}', id)) FROM range(0, 40)")
    spark.sql(
      """UPDATE vpm.db.t SET v = parse_json('{"n":-1}') WHERE k % 8 = 0""")
    assert(spark.sql("SELECT count(*) FROM vpm.db.t " +
      "WHERE variant_get(v, '$.n', 'long') = -1").head().getLong(0) == 5)
  }

  test("partial variant coverage declines (positional-remap upstream bug)") {
    // two variant columns, only one extracted: Spark's post-build
    // remap composes holder output positionally and loses the
    // extracted column's original attribute — reproduced as
    // INTERNAL_ERROR_ATTRIBUTE_NOT_FOUND on parquet v2 itself (4.1.2).
    // The connector declines unless the array covers every variant
    // column, so this query must answer exactly, just unnarrowed.
    val root = freshRoot("partial")
    spark.range(0, 100).toDF("id")
      .select($"id",
        parse_json(format_string("""{"k":%d}""", $"id")).as("v"),
        parse_json(format_string("""{"m":%d}""", $"id" * 2)).as("vn"))
      .write.format("commitlog").option("path", root).mode("append").save()
    val one = spark.read.format("commitlog").option("path", root).load()
      .agg(sum(variant_get($"v", "$.k", "long"))).head().getLong(0)
    assert(one == (0L until 100L).sum)
    // ...and the fully-covered shape on the same table stays exact
    val both = spark.read.format("commitlog").option("path", root).load()
      .agg(sum(variant_get($"v", "$.k", "long") +
        variant_get($"vn", "$.m", "long"))).head().getLong(0)
    assert(both == (0L until 100L).map(i => i + 2 * i).sum)
    // after a decline the planner RE-OFFERS whole-'$' per column with
    // its field mapping still keyed by the original paths — the
    // decline must be STICKY or the accepted retry crashes the plan
    // rewrite upstream (NoSuchElementException in rewriteExpr, 4.1.2)
    val r = spark.read.format("commitlog").option("path", root).load()
      .filter($"id" === 12L)
      .select(variant_get($"v", "$.k", "long").as("kv")).head()
    assert(r.getLong(0) == 12L)
  }

  test("the change feed declines the pushdown and still serves variants") {
    val root = freshRoot("feed")
    spark.range(0, 50).toDF("id")
      .select($"id", parse_json(format_string("""{"k":%d}""", $"id")).as("v"))
      .write.format("commitlog").option("path", root).mode("append").save()
    val feed = spark.read.format("commitlog").option("path", root)
      .option("readChangeFeed", "true").option("startingVersion", 0).load()
      .select(variant_get($"v", "$.k", "long").as("kv"), $"_change_type")
    assert(feed.count() == 50)
    assert(feed.agg(sum($"kv")).head().getLong(0) == (0 until 50).sum.toLong)
  }

  test("a GENERATED partition column extracted from the variant prunes files") {
    // the lakehouse shape for semi-structured ingest: partition by a
    // path EXTRACTED from the payload (generated column over
    // variant_get) — the sink evaluates the generator per row (ANSI),
    // routes partitions on the computed value, and a filter on the
    // generated column prunes to the matching partition directories
    // without touching the variant binary at plan time
    val wh = freshRoot("genwh")
    spark.conf.set("spark.sql.catalog.vpg", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.vpg.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS vpg.db")
    spark.sql("""CREATE TABLE vpg.db.t (
      v VARIANT,
      cat BIGINT GENERATED ALWAYS AS (variant_get(v, '$.cat', 'long')))
      PARTITIONED BY (cat)""")
    spark.sql("INSERT INTO vpg.db.t (v) SELECT parse_json(format_string(" +
      "'{\"cat\":%d,\"x\":%d}', id % 3, id)) FROM range(0, 30)")
    def planned(df: org.apache.spark.sql.DataFrame): Int =
      df.queryExecution.executedPlan.collect {
        case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec =>
          b.inputPartitions.length
      }.sum
    val all = spark.sql("SELECT * FROM vpg.db.t")
    val one = spark.sql("SELECT * FROM vpg.db.t WHERE cat = 1")
    assert(planned(all) == 3, s"three partitions expected: ${planned(all)}")
    assert(planned(one) == 1,
      s"generated-partition filter must prune: ${planned(one)}")
    assert(one.count() == 10)
    assert(spark.sql("SELECT sum(variant_get(v, '$.x', 'long')) " +
      "FROM vpg.db.t WHERE cat = 1").head().getLong(0)
      == (0 until 30).filter(_ % 3 == 1).sum.toLong)
  }

  test("a renamed variant column still answers extractions (formers chain)") {
    val wh = freshRoot("renwh")
    spark.conf.set("spark.sql.catalog.vpr", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.vpr.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS vpr.db")
    spark.sql("CREATE TABLE vpr.db.t (id BIGINT, v VARIANT)")
    spark.sql("INSERT INTO vpr.db.t SELECT id, " +
      "parse_json(format_string('{\"k\":%d}', id)) FROM range(0, 30)")
    spark.sql("ALTER TABLE vpr.db.t RENAME COLUMN v TO payload")
    spark.sql("INSERT INTO vpr.db.t SELECT id, " +
      "parse_json(format_string('{\"k\":%d}', id)) FROM range(30, 50)")
    // pre-rename files answer under the new logical name — the
    // columnar reader resolves the pushed struct through the rename
    // chain exactly like a plain column
    assert(spark.sql(
      "SELECT sum(variant_get(payload, '$.k', 'long')) FROM vpr.db.t")
      .head().getLong(0) == (0 until 50).sum.toLong)
  }

  test("the streaming sink round-trips variant epochs (unshredded layout)") {
    val root = freshRoot("stream")
    val ckpt = freshRoot("stream_ckpt")
    val in = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[Long](spark)
    val q = in.toDF().toDF("id")
      .select($"id",
        parse_json(format_string("""{"k":%d}""", $"id")).as("v"))
      .writeStream.format("commitlog").option("path", root)
      .option("checkpointLocation", ckpt)
      .start()
    try {
      in.addData(0L until 40L: _*); q.processAllAvailable()
      in.addData(40L until 100L: _*); q.processAllAvailable()
    } finally q.stop()
    val got = spark.read.format("commitlog").option("path", root).load()
      .agg(sum(variant_get($"v", "$.k", "long"))).head().getLong(0)
    assert(got == (0L until 100L).sum)
  }

  test("A/B: pushed extraction beats whole-variant reassembly on a shredded table") {
    val root = freshRoot("ab")
    // a wide pad field makes the variant binary dominate the bytes; the
    // pushed read should touch only k's shredded subcolumn
    spark.range(0, 2000000).toDF("id")
      .select($"id", parse_json(format_string(
        """{"k":%d,"pad":"%s-%d"}""", $"id", lit("x" * 160), $"id")).as("v"))
      .repartition(8)
      .write.format("commitlog").option("path", root).mode("append").save()
    // an all-rows COW UPDATE rewrites every file through Spark's
    // writer (writeShredding on) — the whole table lands shredded
    CommitLogDml.update(spark, root, "id >= 0", Seq("id" -> "id"),
      changeFeed = false)
    // filter + count keeps the extraction in the scan-operation's
    // filter list, so the planner pushes the PATH '$.k' (an aggregate
    // directly over the scan registers only the whole-variant '$',
    // which cannot narrow I/O — see the shredded-'$' test below)
    def q = spark.read.format("commitlog").option("path", root).load()
      .where(variant_get($"v", "$.k", "long") % 1000000L === 7L)
      .groupBy().count()
    // earlier column pruning drops the whole-variant output, so only
    // '$.k' is requested — the scan reads just that shredded subcolumn
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains(".0") && !plan.contains("variant_get"),
      s"'$$.k' not pushed:\n$plan")
    def run(): Unit = assert(q.head().getLong(0) == 2L)
    def time(f: => Unit): Long = {
      val t0 = System.nanoTime(); f; System.nanoTime() - t0
    }
    run(); pushed(on = false)(run()) // warm both paths
    val fast = (1 to 3).map(_ => time(run())).min
    val slow = pushed(on = false)((1 to 3).map(_ => time(run())).min)
    val ratio = fast.toDouble / slow.toDouble
    info(f"pushed ${fast / 1e6}%.0f ms vs whole-variant ${slow / 1e6}%.0f ms " +
      f"(ratio $ratio%.2f)")
    assert(ratio < 0.85,
      f"pushed extraction is $ratio%.2fx of whole-variant reassembly " +
        f"(${fast / 1e6}%.0f ms vs ${slow / 1e6}%.0f ms) — the shredded " +
        "subcolumn read is not narrowing I/O")
  }

  test("aggregate-shape whole-variant ('$') pushdown stays correct on shredded files") {
    // an Aggregate directly over the scan registers the whole variant
    // (path '$', VariantType) — on a SHREDDED file Spark's own parquet
    // v2 reader nulls every value for that shape (observed upstream on
    // 4.1.2); this engine's scan must keep serving exact values
    val root = freshRoot("dollar")
    spark.range(0, 5000).toDF("id")
      .select($"id", parse_json(format_string(
        """{"k":%d,"pad":"p%d"}""", $"id", $"id")).as("v"))
      .write.format("commitlog").option("path", root).mode("append").save()
    CommitLogDml.update(spark, root, "id >= 0", Seq("id" -> "id"),
      changeFeed = false) // shred via the COW rewrite
    val r = spark.read.format("commitlog").option("path", root).load()
      .agg(sum(variant_get($"v", "$.k", "long")),
        count(variant_get($"v", "$.pad", "string"))).head()
    assert(!r.isNullAt(0) && r.getLong(0) == (0L until 5000L).sum,
      s"whole-'$$' pushdown nulled shredded values: $r")
    assert(r.getLong(1) == 5000L)
  }
}
