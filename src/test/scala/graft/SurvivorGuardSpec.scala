package graft

import graft.queries.Dedup
import org.apache.spark.sql.functions._

/** The l2_survivor_selection packing contract (q6 ∈ [0, 1e6], doc_id ∈
  * [0, 1e12)) is enforced IN THE PLAN by [[Dedup.electionKey]]: an
  * out-of-contract row must fail the job loudly instead of silently
  * electing the wrong survivor. In-contract packing stays bit-identical
  * (the decl hash is the cross-check at decl scale). */
class SurvivorGuardSpec extends SparkSpec {
  import spark.implicits._

  private def keys(rows: Seq[(Long, Long)]): Seq[Long] =
    rows.toDF("doc_id", "q6")
      .select(Dedup.electionKey($"q6", $"doc_id").as("key"))
      .as[Long].collect().toSeq

  /** Task failures arrive wrapped (SparkException → cause chain); the
    * contract message may sit at any depth. */
  private def chainMessage(e: Throwable): String =
    Iterator.iterate(e)(_.getCause).takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).mkString(" | ")

  test("in-contract rows pack to the documented key, guard transparent") {
    val M = Dedup.ElectionM
    assert(keys(Seq((0L, 0L))) == Seq(M - 1))
    assert(keys(Seq((7L, 1000000L))) == Seq(1000000L * M + (M - 1 - 7L)))
    // higher quality wins; doc_id mirrored so smaller ids rank higher
    val Seq(a, b, c) = keys(Seq((5L, 3L), (5L, 4L), (6L, 4L)))
    assert(b > a, "higher q6 must outrank")
    assert(b > c, "at equal q6 the smaller doc_id must outrank")
  }

  test("doc_id >= 1e12 fails loudly, never packs") {
    val e = intercept[Exception] { keys(Seq((Dedup.ElectionM, 5L))) }
    assert(chainMessage(e).contains("packing contract"),
      s"expected the contract message, got: ${chainMessage(e)}")
  }

  test("negative doc_id fails loudly") {
    val e = intercept[Exception] { keys(Seq((-1L, 5L))) }
    assert(chainMessage(e).contains("packing contract"))
  }

  test("q6 outside [0, 1e6] fails loudly") {
    val hi = intercept[Exception] { keys(Seq((9L, 1000001L))) }
    assert(chainMessage(hi).contains("packing contract"))
    val lo = intercept[Exception] { keys(Seq((9L, -1L))) }
    assert(chainMessage(lo).contains("packing contract"))
  }
}
