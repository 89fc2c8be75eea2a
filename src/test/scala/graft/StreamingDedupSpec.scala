package graft

import graft.streaming.Streams
import graft.streaming.Streams.{BandHit, BandRow}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** STREAMING near-dup admission (SURVEY S85): the SAME
  * `Streams.lshAdmit` the `l2_stream_dedup` decl batch-verifies, here
  * driven incrementally — MemoryStream epochs, state carrying the
  * bucket signature index across micro-batches, checkpoint restart
  * resuming the index. */
class StreamingDedupSpec extends SparkSpec {
  import spark.implicits._

  private val sigA = Seq(1L, 2L, 3L, 4L, 5L, 6L, 7L, 8L)
  private val sigB = Seq(11L, 12L, 13L, 14L, 15L, 16L, 17L, 18L)
  // 6 of 8 positions agree with sigA: at the 0.75 floor
  private val sigA6 = Seq(1L, 2L, 3L, 4L, 5L, 6L, 97L, 98L)
  // 5 of 8: below the floor
  private val sigA5 = Seq(1L, 2L, 3L, 4L, 5L, 96L, 97L, 98L)

  private def rows(docId: Long, key: String, sigs: Seq[Long]) =
    BandRow(docId, key, sigs)

  test("state carries the bucket index across epochs; floor is enforced") {
    val in = MemoryStream[BandRow](spark)
    val q = Streams.lshAdmit(in.toDS(), minAgree = 0.75)
      .writeStream.format("memory").queryName("lsh_hits")
      .outputMode("append").start()
    try {
      // epoch 1: two distinct docs seed the index — no hits
      in.addData(rows(1L, "b0", sigA), rows(2L, "b0", sigB))
      q.processAllAvailable()
      assert(spark.table("lsh_hits").count() == 0L)
      // epoch 2: doc 3 collides with doc 1's bucket, full agreement
      in.addData(rows(3L, "b0", sigA))
      q.processAllAvailable()
      val h3 = spark.table("lsh_hits").as[BandHit].collect().toSeq
      assert(h3 == Seq(BandHit(3L, "b0", 1L, 1.0)), h3.toString)
      // epoch 3: doc 4 matches BOTH 1 and 3 — dup_of is the smallest;
      // doc 5 agrees on only 5/8 — below the floor, admitted silently
      in.addData(rows(4L, "b0", sigA), rows(5L, "b0", sigA5))
      q.processAllAvailable()
      val h4 = spark.table("lsh_hits").as[BandHit].collect()
        .filter(_.doc_id == 4L).toSeq
      assert(h4 == Seq(BandHit(4L, "b0", 1L, 1.0)), h4.toString)
      assert(!spark.table("lsh_hits").as[BandHit].collect()
        .exists(_.doc_id == 5L), "5/8 agreement must not flag")
      // epoch 4: exactly AT the floor flags (>=, not >)
      in.addData(rows(6L, "b0", sigA6))
      q.processAllAvailable()
      val h6 = spark.table("lsh_hits").as[BandHit].collect()
        .filter(_.doc_id == 6L).toSeq
      assert(h6.map(h => (h.dup_of, h.agree)) == Seq((1L, 0.75)), h6.toString)
      // different bucket: no cross-bucket comparisons ever
      in.addData(rows(7L, "b1", sigA))
      q.processAllAvailable()
      assert(!spark.table("lsh_hits").as[BandHit].collect()
        .exists(_.doc_id == 7L))
    } finally q.stop()
  }

  test("checkpoint restart resumes the signature index (commitlog sink)") {
    val ckpt = java.nio.file.Files.createTempDirectory("lsh_ckpt").toString
    val root = java.nio.file.Files.createTempDirectory("lsh_hits_tbl").toString
    val in = MemoryStream[BandRow](spark)
    // hits land in a commitlog table — the memory sink cannot recover
    // from a checkpoint, and the lakehouse sink is the production
    // shape anyway (the dedup log IS a table)
    def start() = Streams.lshAdmit(in.toDS()).toDF()
      .writeStream.format("commitlog")
      .option("path", root)
      .option("checkpointLocation", ckpt)
      .outputMode("append").start()
    val q1 = start()
    try {
      in.addData(rows(10L, "bx", sigA))
      q1.processAllAvailable()
    } finally q1.stop()
    val q2 = start()
    try {
      in.addData(rows(11L, "bx", sigA))
      q2.processAllAvailable()
      val hits = spark.read.format("commitlog").option("path", root).load()
        .as[BandHit].collect().toSeq
      assert(hits.exists(h => h.doc_id == 11L && h.dup_of == 10L),
        s"the restored index must remember doc 10: $hits")
    } finally q2.stop()
  }

  test("doc-level verdicts aggregate band hits") {
    val docs = Seq(1L, 2L, 3L).toDF("doc_id")
    val hits = Seq(
      BandHit(3L, "0:x", 1L, 1.0),
      BandHit(3L, "2:y", 2L, 0.875)).toDF()
    val v = Streams.admissionVerdicts(docs, hits)
      .orderBy("doc_id")
      .collect()
      .map(r => (r.getLong(0), r.getBoolean(1),
        if (r.isNullAt(2)) -1L else r.getLong(2))).toSeq
    assert(v == Seq((1L, false, -1L), (2L, false, -1L), (3L, true, 1L)), v.toString)
  }
}
