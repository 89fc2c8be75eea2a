package graft

import graft.sources.{CommitLog, CommitLogDml, CommitLogMerge}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** VARIANT columns in the commitlog table format: the sink writes
  * Spark's UNSHREDDED variant layout (a VARIANT-annotated group of two
  * required binaries, `value` + `metadata` — the open variant
  * encoding), the row leg reconstructs `VariantVal`s by field NAME, and
  * the whole lakehouse surface (DML over both legs, time travel,
  * OPTIMIZE) composes with it — semi-structured ingestion keeps its
  * raw shape without a JSON-string detour and without locking a schema
  * at write time. CDC materialization on variant-bearing tables keeps
  * the map-column policy: variants are not comparable, so the feed
  * refuses typed rather than serving a silent miss. */
class CommitLogVariantSpec extends SparkSpec {
  import spark.implicits._

  private def freshRoot(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"clvar_$tag").toString

  private def variantDf(n: Int, from: Int = 0) =
    spark.range(from, from + n).toDF("id")
      .withColumn("v", parse_json(format_string(
        """{"k":%d,"s":"u%d","nested":{"arr":[%d,%d]}}""",
        $"id" % 10, $"id" % 3, $"id", $"id" * 2)))
      .withColumn("vn",
        when($"id" % 5 === 0, parse_json(lit("null")))
          .otherwise(parse_json(($"id" * 7).cast("string"))))

  test("sink round-trips variant through the DSv2 writer and back") {
    val root = freshRoot("rt")
    variantDf(1000).write.format("commitlog").option("path", root)
      .mode("append").save()
    val back = spark.read.format("commitlog").option("path", root).load()
    assert(back.schema("v").dataType == VariantType)
    assert(back.count() == 1000)
    // scalar extraction: every row's $.k survives byte-exact
    assert(back
      .select(sum(variant_get($"v", "$.k", "long"))).head().getLong(0)
      == (0 until 1000).map(_ % 10).sum)
    // nested path + array index
    val r = back.filter($"id" === 123L)
      .select(
        variant_get($"v", "$.nested.arr[1]", "long").as("a1"),
        variant_get($"v", "$.s", "string").as("s"))
      .head()
    assert(r.getLong(0) == 246L)
    assert(r.getString(1) == "u0")
    // JSON nulls round-trip as variant nulls, not SQL nulls
    assert(back.filter($"id" % 5 === 0)
      .select(is_variant_null($"vn")).head().getBoolean(0))
    assert(back
      .select(sum(try_variant_get($"vn", "$", "long"))).head().getLong(0)
      == (0 until 1000).filter(_ % 5 != 0).map(_ * 7L).sum)
  }

  test("variant scans stay COLUMNAR (both file layouts decode vectorized)") {
    val root = freshRoot("vec")
    variantDf(300).write.format("commitlog").option("path", root)
      .mode("append").save()
    // shredded files too: the COW rewrite goes through Spark's writer
    graft.sources.CommitLogDml.delete(spark, root, "id % 2 = 0",
      changeFeed = false)
    val df = spark.read.format("commitlog").option("path", root).load()
      .select($"id", variant_get($"v", "$.k", "long").as("k"))
    val scans = graft.queries.Qh.flattenPlan(
      df.queryExecution.executedPlan).collect {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec =>
        b.supportsColumnar
    }
    assert(scans.nonEmpty && scans.forall(identity),
      "variant read must plan the vectorized leg (it is a plain " +
        "physical column group to Spark's reader)")
    assert(df.agg(sum($"k")).head().getLong(0) ==
      (0 until 300).filter(_ % 2 == 1).map(_ % 10).sum)
  }

  test("DV delete on a variant table: the row leg reconstructs VariantVal") {
    val root = freshRoot("dv")
    variantDf(500).write.format("commitlog").option("path", root)
      .mode("append").save()
    CommitLogDml.delete(spark, root, "id = 42", changeFeed = false)
    val v = CommitLog.latestVersion(root)
    assert(CommitLog.files(root, v)
      .exists(_.startsWith(CommitLogMerge.DvPrefix)),
      "expected the delete to take the deletion-vector leg")
    val back = spark.read.format("commitlog").option("path", root).load()
    assert(back.count() == 499)
    assert(back.filter($"id" === 43L)
      .select(variant_get($"v", "$.nested.arr[0]", "long")).head().getLong(0)
      == 43L)
  }

  test("COW rewrite (Spark-written survivors) reads back identically") {
    val root = freshRoot("cow")
    variantDf(200).write.format("commitlog").option("path", root)
      .mode("append").save()
    CommitLogDml.delete(spark, root, "id % 2 = 0", changeFeed = false)
    val back = spark.read.format("commitlog").option("path", root).load()
    assert(back.count() == 100)
    assert(back.select(sum(variant_get($"v", "$.k", "long"))).head().getLong(0)
      == (0 until 200).filter(_ % 2 == 1).map(_ % 10).sum)
    // time travel still serves the sink-written v1 files
    val v1 = spark.read.format("commitlog").option("path", root)
      .option("versionAsOf", 1).load()
    assert(v1.count() == 200)
    assert(v1.filter($"id" === 0L)
      .select(variant_get($"v", "$.s", "string")).head().getString(0) == "u0")
  }

  test("OPTIMIZE preserves variant bytes across the rewrite") {
    val root = freshRoot("opt")
    variantDf(50).write.format("commitlog").option("path", root)
      .mode("append").save()
    variantDf(50, from = 50).write.format("commitlog").option("path", root)
      .mode("append").save()
    graft.sources.CommitLogOptimize.optimize(spark, root,
      smallBytes = 1L << 30)
    val back = spark.read.format("commitlog").option("path", root).load()
    assert(back.count() == 100)
    assert(back.select(sum(variant_get($"v", "$.nested.arr[1]", "long")))
      .head().getLong(0) == (0 until 100).map(_ * 2L).sum)
  }

  test("SQL catalog: CREATE (v VARIANT) / INSERT / UPDATE; feed refuses typed") {
    val wh = java.nio.file.Files.createTempDirectory("graft_whv").toString
    spark.conf.set("spark.sql.catalog.gtv", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gtv.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gtv.db")
    spark.sql("CREATE TABLE gtv.db.vt (id BIGINT, v VARIANT)")
    spark.sql(
      """INSERT INTO gtv.db.vt
        |SELECT id, parse_json(format_string('{"k":%d}', id % 10))
        |FROM range(0, 100)""".stripMargin)
    assert(spark.sql(
      "SELECT sum(variant_get(v, '$.k', 'long')) FROM gtv.db.vt")
      .head().getLong(0) == (0 until 100).map(_ % 10).sum)
    // row-level UPDATE rewrites through Spark's (shredding) writer;
    // the snapshot read must reassemble
    spark.sql(
      """UPDATE gtv.db.vt SET v = parse_json('{"k":-1}')
        |WHERE id % 10 = 3""".stripMargin)
    assert(spark.sql(
      "SELECT sum(variant_get(v, '$.k', 'long')) FROM gtv.db.vt")
      .head().getLong(0) ==
      (0 until 100).filter(_ % 10 != 3).map(_ % 10).sum - 10)
    // variant is not comparable — the COW version has no materialized
    // change rows, and the feed serves it at FILE granularity since
    // r14 (removed rows as deletes, added rows as inserts): the
    // retraction fold over the whole feed reconstructs the snapshot
    val folded = spark.sql(
      "SELECT id, variant_get(v, '$.k', 'long') AS k, _change_type " +
        "FROM gtv.db.vt.changes")
      .withColumn("_s", graft.sources.CommitLogCdf.changeSign(
        org.apache.spark.sql.functions.col("_change_type")))
      .groupBy("id", "k")
      .agg(org.apache.spark.sql.functions.sum("_s").as("m"))
      .filter(org.apache.spark.sql.functions.col("m") =!= 0)
    assert(folded.filter(org.apache.spark.sql.functions.col("m") =!= 1).isEmpty)
    val lhs = folded.select("id", "k").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val rhs = spark.sql(
      "SELECT id, variant_get(v, '$.k', 'long') FROM gtv.db.vt").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lhs == rhs, s"file-granularity fold diverged")
  }

  test("fuzz: random JSON shapes round-trip BOTH layouts byte-faithfully") {
    // deterministic generator (no Random seed drift across runs):
    // mixed scalars, unicode, deep nesting, arrays of objects, nulls
    def jval(seed: Long, depth: Int): String = {
      val k = math.floorMod(seed, if (depth >= 3) 7L else 9L).toInt
      k match {
        case 0 => (seed % 1000000).toString
        case 1 => s"${seed % 97}.${math.floorMod(seed, 89)}"
        case 2 => "true"
        case 3 => "false"
        case 4 => "null"
        case 5 => s""""s${seed % 1000}\\u00e9\\u4e2d""""
        case 6 => s"-${math.floorMod(seed, 1L << 40)}"
        case 7 =>
          (0 until (math.floorMod(seed, 3L).toInt + 1))
            .map(i => jval(seed * 31 + i + 1, depth + 1))
            .mkString("[", ",", "]")
        case _ =>
          (0 until (math.floorMod(seed, 3L).toInt + 1))
            .map(i => s""""f$i":${jval(seed * 37 + i + 7, depth + 1)}""")
            .mkString("{", ",", "}")
      }
    }
    val docs = (0 until 120).map(i => (i.toLong, jval(i * 2654435761L + 17, 0)))
    val root = freshRoot("fz")
    val df = spark.createDataFrame(docs).toDF("id", "js")
      .withColumn("v", parse_json($"js"))
    df.write.format("commitlog").option("path", root).mode("append").save()
    // canonical form BEFORE any storage: to_json of the parsed variant
    val want = df.select($"id", to_json($"v").as("j")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    def check(tag: String): Unit = {
      val got = spark.read.format("commitlog").option("path", root).load()
        .select($"id", to_json($"v").as("j")).collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
      got.foreach { case (id, j) =>
        assert(j == want(id), s"[$tag] doc $id drifted: $j != ${want(id)}")
      }
    }
    check("unshredded sink files")
    // dense delete -> COW rewrite through Spark's SHREDDING writer;
    // survivors must reassemble to the identical canonical form
    CommitLogDml.delete(spark, root, "id % 2 = 0", changeFeed = false)
    val left = spark.read.format("commitlog").option("path", root).load()
    assert(left.count() == 60)
    check("shredded rewrite files")
  }

  test("schema DDL and to_json both speak variant") {
    val root = freshRoot("sql")
    variantDf(10).write.format("commitlog").option("path", root)
      .mode("append").save()
    val back = spark.read.format("commitlog").option("path", root).load()
    // to_json re-serializes the stored variant losslessly
    assert(back.filter($"id" === 7L).select(to_json($"v")).head().getString(0)
      == """{"k":7,"nested":{"arr":[7,14]},"s":"u1"}""")
  }
}
