package graft

import graft.sources.{CommitLog, CommitLogWrite}
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._

/** GENERATED ALWAYS AS columns (Delta parity): Spark validates the
  * expression at CREATE (the catalog declares
  * SUPPORTS_CREATE_TABLE_WITH_GENERATED_COLUMNS), the catalog persists
  * it as a `graft.generated.<col>` table property, and the SINK
  * computes the column on every write — before stats boxes and
  * partition routing, so generated partition tuples route exactly and
  * generated columns are born prunable. Incoming values are ignored
  * (the ALWAYS contract: the definition owns the column). */
class GeneratedColumnSpec extends SparkSpec {
  import spark.implicits._

  private lazy val wh = {
    val d = java.nio.file.Files.createTempDirectory("gen_wh").toString
    spark.conf.set("spark.sql.catalog.gen", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gen.warehouse", d)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gen.db")
    d
  }

  private def planned(df: org.apache.spark.sql.DataFrame): Int = {
    df.collect()
    graft.queries.Qh.flattenPlan(df.queryExecution.executedPlan).collect {
      case b: BatchScanExec => b.inputPartitions.length
    }.sum
  }

  test("generated column is computed at the sink and stored") {
    val warehouse = wh
    spark.sql("CREATE TABLE gen.db.g (ts TIMESTAMP, v DOUBLE, " +
      "d DATE GENERATED ALWAYS AS (CAST(ts AS DATE)))")
    // the definition rides the props facet
    val props = CommitLog.tblPropsOf(s"$warehouse/db/g",
      CommitLog.latestVersion(s"$warehouse/db/g"))
    assert(props.get(s"${CommitLogWrite.GeneratedPropPrefix}d")
      .contains("CAST(ts AS DATE)"))
    // INSERT omitting the generated column: null-filled by Spark,
    // computed by the sink
    spark.sql("INSERT INTO gen.db.g (ts, v) SELECT " +
      "timestamp'2024-03-01 10:00:00' + make_interval(0,0,0,0,id,0,0), " +
      "id * 1.0 FROM range(0, 100)")
    val back = spark.table("gen.db.g")
    assert(back.count() == 100)
    // hours 14..37 after 2024-03-01 10:00 land on 2024-03-02
    assert(back.filter($"d" === lit("2024-03-02").cast("date")).count() == 24)
    assert(back.filter($"d" =!= $"ts".cast("date")).count() == 0)
    assert(back.filter($"d".isNull).count() == 0)
  }

  test("ALWAYS: a writer-provided value is overwritten with the computed one") {
    val warehouse = wh
    spark.sql("CREATE TABLE gen.db.a (k BIGINT, " +
      "k2 BIGINT GENERATED ALWAYS AS (k * 2))")
    // provide a WRONG k2 explicitly — the definition wins
    spark.sql("INSERT INTO gen.db.a VALUES (5, 999)")
    Seq((7L, 111L)).toDF("k", "k2").writeTo("gen.db.a").append()
    val got = spark.table("gen.db.a").orderBy("k").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == Seq((5L, 10L), (7L, 14L)))
  }

  test("generated partition column routes tuples and prunes scans") {
    val warehouse = wh
    spark.sql("CREATE TABLE gen.db.p (ts TIMESTAMP, v DOUBLE, " +
      "d DATE GENERATED ALWAYS AS (CAST(ts AS DATE))) PARTITIONED BY (d)")
    spark.sql("INSERT INTO gen.db.p (ts, v) SELECT " +
      "timestamp'2024-03-01 00:00:00' + make_interval(0,0,0,id,0,0,0), " +
      "id * 1.0 FROM range(0, 6)") // six consecutive DAYS
    val root = s"$warehouse/db/p"
    val v = CommitLog.latestVersion(root)
    // partition-pure batches, one per generated day
    assert(CommitLog.partsOf(root, v).size == 6)
    // a day filter prunes to ONE batch at plan time
    val one = spark.sql(
      "SELECT v FROM gen.db.p WHERE d = date'2024-03-04'")
    assert(planned(one) == 1)
    assert(one.collect().map(_.getDouble(0)).toSeq == Seq(3.0))
  }

  test("generated columns compute on the streaming sink too") {
    val warehouse = wh
    spark.sql("CREATE TABLE gen.db.s (k BIGINT, " +
      "k2 BIGINT GENERATED ALWAYS AS (k + 1))")
    val src = java.nio.file.Files.createTempDirectory("gen_src").toString
    spark.range(0, 50).toDF("k")
      .withColumn("k2", lit(null).cast("bigint"))
      .write.mode("overwrite").parquet(src)
    val ckpt = java.nio.file.Files.createTempDirectory("gen_ckpt").toString
    val q = spark.readStream
      .schema(spark.read.parquet(src).schema).parquet(src)
      .writeStream.format("commitlog")
      .option("path", s"$warehouse/db/s")
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val back = spark.table("gen.db.s")
    assert(back.count() == 50)
    assert(back.filter($"k2" === $"k" + 1).count() == 50)
  }

  test("sortOrder on a generated column is refused") {
    val warehouse = wh
    spark.sql("CREATE TABLE gen.db.r (k BIGINT, " +
      "k2 BIGINT GENERATED ALWAYS AS (k * 2)) " +
      s"TBLPROPERTIES('${CommitLogWrite.SortOrderProp}'='k2')")
    val e = intercept[Exception] {
      spark.sql("INSERT INTO gen.db.r VALUES (1, 2)")
    }
    def chain(t: Throwable): String =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .map(x => Option(x.getMessage).getOrElse("")).mkString(" | ")
    assert(chain(e).contains("GENERATED"))
  }
}
