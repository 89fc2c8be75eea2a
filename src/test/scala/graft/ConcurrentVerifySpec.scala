package graft

import java.util.concurrent.Executors
import scala.concurrent.duration.Duration
import scala.concurrent.{Await, ExecutionContext, Future}

/** Races in the shared per-JVM state — `Qh.bucketedTable`'s
  * computeIfAbsent build, the `Qh.ioDir` scratch sweep, and the
  * materialize cache — only surface under CONCURRENT decl execution
  * in one JVM (the shape `graft.Verify` actually runs, 4-way). This
  * spec runs EVERY registered decl 8-way concurrently and then
  * re-runs the stateful subset serially, value-comparing: a lost
  * update, double build, or swept-under-a-reader scratch dir shows up
  * as an exception or a divergent result. */
class ConcurrentVerifySpec extends SparkSpec {

  /** Decls built on the shared bucketed tables, the materialize cache,
    * or multi-step ioDir fixtures — the state the concurrency can
    * corrupt. */
  private val stateful = Seq(
    "l2_lsh_pairs", "l2_dedup_clusters", "l2_incremental_dedup",
    "l13_pagerank", "l13_triangles", "l13_kcore",
    "j14_cobucketed_join", "l4_bpe_train", "l4_bpe_encode",
    "l4_lm_score", "w10_seasonal_decomp", "l3_ann_trained")

  test("all decls survive an 8-way concurrent run; stateful decls value-match a serial re-run") {
    val pool = Executors.newFixedThreadPool(8)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    try {
      // phase 1: everything at once — 8 decls in flight at all times,
      // every shared-state consumer racing every other
      val futures = SparkEntry.queries.toSeq.map { case (name, fn) =>
        Future {
          val rows = fn(spark, sf0001).collect()
          name -> rows.map(_.toString).sorted.toSeq
        }.recover { case e =>
          fail(s"$name threw under concurrency: ${e.getMessage}", e)
        }
      }
      val concurrent = Await.result(
        Future.sequence(futures), Duration.Inf).toMap

      // phase 2: serial ground truth for the stateful subset (the
      // bucketed tables / materialize cache are now warm — a corrupt
      // build would be SERVED here and diverge)
      stateful.foreach { name =>
        val serial = SparkEntry.queries(name)(spark, sf0001)
          .collect().map(_.toString).sorted.toSeq
        assert(concurrent(name) == serial,
          s"$name: concurrent result diverges from serial re-run " +
            s"(${concurrent(name).length} vs ${serial.length} rows)")
      }
      assert(stateful.forall(concurrent.contains))
    } finally pool.shutdown()
  }
}
