package graft

import graft.sources._
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.write.{LogicalWriteInfo, PhysicalWriteInfo, RowLevelOperation}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** The WRITE-SERIALIZABLE conflict matrix for row-level DML vs
  * concurrent ingest (the Delta matrix cell that matters at 1000
  * executors: a live append stream must not abort every DELETE):
  *
  *  - a rival BLIND DATA APPEND landing between a rewrite's read and
  *    its commit does NOT abort it — the appended rows did not exist
  *    at the read version, so the statement's predicate never saw
  *    them; the commit REBASES forward and both writes survive;
  *  - any OTHER rival (another rewrite, OPTIMIZE, a DV delete, schema/
  *    constraint changes) aborts with ConcurrentModificationException.
  *
  * The rewrite is driven through the connector classes directly so the
  * interleaving is DETERMINISTIC: operation created (read version
  * pinned) → rival commits → rewrite write commits. */
class ConcurrentDmlAppendSpec extends SparkSpec {
  import spark.implicits._

  private val tblSchema = StructType(Seq(
    StructField("k", LongType), StructField("v", LongType)))

  private def freshRoot(): String =
    java.nio.file.Files.createTempDirectory("graft_wsz").toString

  private def append(root: String, rows: Seq[(Long, Long)]): Unit =
    rows.toDF("k", "v").repartition(1)
      .write.format("commitlog").option("path", root).mode("append").save()

  /** Run a DELETE-shaped rewrite manually: the operation pins its read
    * version NOW; `meanwhile` runs BEFORE the rewrite commits; the
    * write lands `survivors` as the whole new content of the scanned
    * groups (exactly what Spark's DELETE rewrite would stage). */
  private def rewriteRace(
      root: String, survivors: Seq[(Long, Long)])(meanwhile: => Unit): Unit = {
    val op = new CommitLogRowLevelOperation(
      root, RowLevelOperation.Command.DELETE)
    // pin the scan (Spark would read survivors through it); then the
    // rival lands; then the rewrite commits
    meanwhile
    val info = new LogicalWriteInfo {
      override def queryId(): String = java.util.UUID.randomUUID().toString
      override def schema(): StructType = tblSchema
      override def options(): CaseInsensitiveStringMap =
        new CaseInsensitiveStringMap(java.util.Collections.emptyMap())
    }
    val batch = op.newWriteBuilder(info).build()
      .asInstanceOf[CommitLogReplaceWrite].toBatch
    val w = batch.createBatchWriterFactory(new PhysicalWriteInfo {
      override def numPartitions(): Int = 1
    }).createWriter(0, 0L)
    survivors.foreach { case (k, v) =>
      val r = new GenericInternalRow(2)
      r.update(0, Long.box(k)); r.update(1, Long.box(v))
      w.write(r.asInstanceOf[InternalRow])
    }
    batch.commit(Array(w.commit()))
  }

  test("a rival blind append does not abort a DELETE rewrite: both survive") {
    val root = freshRoot()
    append(root, (1L to 10L).map(i => (i, i * 10)))          // v1
    val v0 = CommitLog.latestVersion(root)
    // DELETE k <= 5 (survivors 6..10), racing an append of 100..102
    rewriteRace(root, (6L to 10L).map(i => (i, i * 10))) {
      append(root, Seq((100L, 1L), (101L, 1L), (102L, 1L)))  // rival, v2
    }
    val now = spark.read.format("commitlog").option("path", root).load()
    val ks = now.select("k").as[Long].collect().sorted.toSeq
    assert(ks == ((6L to 10L) ++ (100L to 102L)),
      s"both the rewrite and the rival append must survive: $ks")
    // the rewrite REBASED: it committed at v3, after the rival's v2
    assert(CommitLog.latestVersion(root) == v0 + 2)
    // and its CDC rows materialized at the WON version, deletes exact
    val feed = spark.read.format("commitlog").option("path", root)
      .option("readChangeFeed", true).option("startingVersion", v0 + 1).load()
    val dels = feed.filter(col(CommitLogCdf.ChangeTypeCol) === "delete")
      .select("k").as[Long].collect().sorted.toSeq
    assert(dels == (1L to 5L), s"deletes at the rebased version: $dels")
  }

  test("a rival rewrite aborts the DELETE: no rebase across changed rows") {
    val root = freshRoot()
    append(root, (1L to 10L).map(i => (i, i * 10)))
    val e = intercept[java.util.ConcurrentModificationException] {
      rewriteRace(root, (6L to 10L).map(i => (i, i * 10))) {
        // the rival is itself a COW rewrite (UPDATE-shaped): it removed
        // batches this statement scanned
        CommitLogDml.update(spark, root, "k <= 2",
          Seq("v" -> "CAST(0 AS BIGINT)"))
      }
    }
    assert(e.getMessage.contains("blind append"), e.getMessage)
  }

  test("a rival DV delete aborts the DELETE: vectors reference scanned files") {
    val root = freshRoot()
    append(root, (1L to 200L).map(i => (i, i * 10)))
    intercept[java.util.ConcurrentModificationException] {
      rewriteRace(root, (3L to 200L).map(i => (i, i * 10))) {
        // sparse delete -> DV leg: a dv- batch referencing the scanned
        // files lands first
        CommitLogDml.delete(spark, root, "k = 7")
      }
    }
  }

  test("blindDataAppend classifies the manifest shapes") {
    val root = freshRoot()
    append(root, Seq((1L, 1L)))           // v1: first append RECORDS the
    assert(!CommitLog.blindDataAppend(root, 1),
      "v1 carries the initial schema record — conservatively not blind " +
        "(no rewrite can have read v0 anyway: an empty scan is a no-op)")
    append(root, Seq((2L, 2L)))                                // v2: plain
    assert(CommitLog.blindDataAppend(root, 2))
    Seq((3L, 3L, "x")).toDF("k", "v", "note").repartition(1)   // v3: evolving
      .write.format("commitlog").option("path", root).mode("append").save()
    assert(!CommitLog.blindDataAppend(root, 3),
      "a schema-evolving append is NOT blind: a rebasing rewrite would " +
        "roll the evolution back")
    CommitLog.tryCommit(root, 4, added = Nil, removed = Nil,
      props = Map("user.key" -> Some("x")))                    // v4: props only
    assert(!CommitLog.blindDataAppend(root, 4))
    assert(CommitLog.appendOnlySince(root, 1).isEmpty,
      "any non-blind rival poisons the window")
    assert(CommitLog.appendOnlySince(root, 4).isEmpty, "empty window")
    assert(CommitLog.appendOnlySince(root, 1) == None &&
      CommitLog.appendOnlySince(root, 2).isEmpty)
  }

  test("identity-table appends (watermark props) still count as blind") {
    val wh = java.nio.file.Files.createTempDirectory("graft_wsi").toString
    spark.conf.set("spark.sql.catalog.wsi", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.wsi.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS wsi.db")
    spark.sql("CREATE TABLE wsi.db.t (id BIGINT GENERATED ALWAYS AS IDENTITY, " +
      "s STRING)")
    spark.sql("INSERT INTO wsi.db.t (s) VALUES ('a'), ('b')")
    val root = s"$wh/db/t"
    val v = CommitLog.latestVersion(root)
    // the insert advanced graft.identityHwm.id in its own commit — the
    // ONE props write a blind append may carry
    assert(CommitLog.blindDataAppend(root, v),
      "identity watermark bookkeeping must not poison the rebase window")
    // end-to-end: a DELETE racing an identity append rebases, stays unique
    spark.sql("DELETE FROM wsi.db.t WHERE s = 'a'")
    val left = spark.sql("SELECT id FROM wsi.db.t").as[Long].collect()
    assert(left.length == 1)
  }
}
