package graft

/** Scale-sweep timing main: run a named subset of the registered decls
  * against an arbitrary fixture dir and print one JSON line of
  * per-query seconds (min of `reps` runs — the bench noise
  * discipline). Used by the sf1 stress sweep to measure wall-time
  * scaling exponents between sf0.1 and a locally generated 10× fixture
  * (scripts/gen_sf1.py): with per-key density held constant, a healthy
  * plan scales ~linearly in rows, so t(sf1)/t(sf0.1) ≈ 10.
  *
  *   runMain graft.Sweep <dir> <name,name,…|tail> [reps]
  *
  * `tail` selects the scale-sensitive heavy tail the round-8 sweep
  * tracks (graph, dedup family, co-bucketed join, windows, t9).
  * Same noop-sink materialization as [[Bench]]: every row of the final
  * schema is consumed, nothing is written.
  */
object Sweep {
  val tail: Seq[String] = Seq(
    "l13_kcore", "l13_pagerank", "l13_triangles",
    "l2_cosine_neardup", "l2_cosine_neardup_bucketed",
    "l2_cosine_neardup_adaptive",
    "l2_dedup_clusters", "l2_incremental_dedup",
    "l2_lsh_pairs", "l2_minhash_estimate", "l2_minhash_sigs",
    "l2_ngram_jaccard", "l2_simhash", "l2_simhash_hamming",
    "l2_simhash_blocked", "l2_substring_dedup", "j14_cobucketed_join",
    "w1_ranking", "w2_analytic", "w3_frames", "w3_time_range",
    "w4_topk_per_group", "w4_topk_window_idiom", "w5_distribution",
    "w6_gap_fill", "w7_funnel", "w8_retention", "w9_anomaly",
    "w10_seasonal_decomp",
    "t9_stream_stream", "t9_stream_stream_full",
    "t9_stream_stream_outer", "t9_stream_stream_semi")

  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val names =
      if (args.length < 2 || args(1) == "tail") tail
      else args(1).split(",").toSeq
    val reps = if (args.length > 2) args(2).toInt else 2
    val spark = Engine.session("graft-sweep")

    Bench.warmup(spark, dir) // shared with Bench — the mains can't drift

    // per-query isolation, like Bench: one failing (or mistyped) query
    // reports an err entry instead of discarding the whole run's timings
    val out = names.map { name =>
      try {
        val fn = SparkEntry.queries(name)
        val secs = (1 to reps).map { _ =>
          val t0 = System.nanoTime()
          fn(spark, dir).write.format("noop").mode("overwrite").save()
          (System.nanoTime() - t0) / 1e9
        }
        s""""$name":${Bench.f3(secs.min)}"""
      } catch {
        case e: Throwable =>
          val msg = Option(e.getMessage).getOrElse(e.getClass.getName)
            .take(120).replaceAll("[\"\\\\\\n\\r\\t]", " ")
          s""""$name":"ERR $msg""""
      }
    }
    println(s"""SWEEP ${out.mkString("{", ",", "}")}""")
    spark.stop()
  }
}
