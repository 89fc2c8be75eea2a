package graft

/** Benchmark main. Driver runs per-round with SPARK_GRAFT_SF_DIR set.
  *
  * Materialization is a `noop`-format write, NOT `count()`: count() lets
  * Catalyst prune every projection (to_json, regex, window columns, the
  * final sort's payload) so only scan+join skeletons would be timed. The
  * noop sink consumes every row of the final schema — measured work =
  * real work — while writing nothing.
  *
  * A failing query reports an `err` entry instead of a fake timing, so a
  * broken round can never masquerade as a fast one.
  */
object Bench {

  /** Per-query pinned reference times at sf0.1: per-query MINIMA of
    * two consecutive full round-8 runs on an IDLE machine (load 1.5/32
    * at start; singles 186.3 s and 186.0 s over 170 queries, 0 err) —
    * min-of-runs is the same noise discipline timeWithRetry applies.
    * These replace the round-5 two-tier budgets, whose 20 s
    * ceiling over 1.2–1.6 s queries let a 10× plan regression ship
    * silently. Regenerate with scripts/repin.py from an idle-run
    * bench_detail.json when a query's plan intentionally changes;
    * BenchBudgetSpec fails the build when any pin drifts >2× from the
    * committed idle snapshot (scripts/bench_pins.json). Queries absent
    * from the map (newly added this round) get no budget until pinned. */
  private[graft] val pinnedSeconds: Map[String, Double] = Map(
    "a10_kmv_sketch" -> 2.841, "a1_hashagg" -> 1.137,
    "a2_distinct" -> 0.652, "a3_approx_distinct" -> 1.818,
    "a3_hll_merge" -> 0.551, "a4_cube" -> 0.585,
    "a4_grouping_sets" -> 0.728, "a4_rollup" -> 0.611,
    "a5_filtered_agg" -> 0.484, "a6_approx_percentile" -> 2.427,
    "a6_stats" -> 2.212, "a6_tdigest" -> 2.078,
    "a7_collect" -> 0.789, "a8_pivot" -> 0.588,
    "a9_salted_agg" -> 0.712, "c1_upsert_latest" -> 0.595,
    "c2_scd2_intervals" -> 0.756, "c3_incremental_agg" -> 1.132,
    "c4_cdc_apply" -> 0.711, "c5_retractable_agg" -> 1.794,
    "flagship_pipeline" -> 0.483, "j10_bloom_semi" -> 0.978,
    "j11_salted_skew_join" -> 0.715, "j12_interval_overlap" -> 0.998,
    "j13_spatial_grid" -> 0.831, "j14_cobucketed_join" -> 0.821,
    "j1_semi_broadcast" -> 0.674, "j2_inner" -> 0.539,
    "j3_multiway" -> 1.486, "j4_full_outer" -> 0.456,
    "j4_left_outer" -> 0.374, "j5_anti" -> 0.326,
    "j6_sortmerge" -> 0.875, "j7_range" -> 0.752,
    "j8_cross" -> 0.258, "j9_asof" -> 0.701,
    "j9_asof_join" -> 0.628, "l10_drift" -> 0.863,
    "l10_profile" -> 0.36, "l10_zipf" -> 0.949,
    "l11_decontam" -> 1.235, "l11_semantic_decontam" -> 0.572,
    "l12_global_ids" -> 0.715, "l13_bfs" -> 1.943,
    "l13_hits" -> 5.155, "l13_kcore" -> 1.375,
    "l13_pagerank" -> 2.837, "l13_triangles" -> 1.025,
    "l14_fuzzy_join" -> 2.07, "l1_exact_dedup" -> 0.351,
    "l2_cc_star" -> 3.714, "l2_chunk_dedup" -> 1.269,
    "l2_cosine_neardup" -> 0.522, "l2_cosine_neardup_bucketed" -> 0.47,
    "l2_dedup_clusters" -> 2.331, "l2_incremental_dedup" -> 0.986,
    "l2_lsh_pairs" -> 1.282, "l2_minhash_estimate" -> 1.379,
    "l2_minhash_sigs" -> 1.643, "l2_ngram_jaccard" -> 6.515,
    "l2_simhash" -> 0.757, "l2_simhash_blocked" -> 3.435,
    "l2_simhash_hamming" -> 2.23, "l2_substring_dedup" -> 2.088,
    "l3_ann_ivf" -> 0.865, "l3_ann_ivfpq" -> 1.788,
    "l3_ann_lsh" -> 1.849, "l3_ann_pq" -> 1.519,
    "l3_ann_recall" -> 1.969, "l3_ann_trained" -> 2.696,
    "l3_cosine_topk" -> 0.346, "l3_jl_projection" -> 0.512,
    "l3_kmeans" -> 1.173, "l3_pca_power" -> 0.449,
    "l3_semantic_dedup" -> 1.48, "l4_bm25" -> 1.455,
    "l4_bpe_encode" -> 1.381, "l4_bpe_pair_stats" -> 0.771,
    "l4_bpe_train" -> 0.765, "l4_count_min" -> 0.562,
    "l4_fingerprint" -> 0.921, "l4_heavy_hitters" -> 0.537,
    "l4_lang_id" -> 0.513, "l4_lm_score" -> 1.492,
    "l4_pii_redact" -> 0.762, "l4_quality_score" -> 0.642,
    "l4_repetition" -> 1.799, "l4_repetition_quality" -> 1.329,
    "l4_term_freq" -> 0.575, "l4_tfidf" -> 0.834,
    "l4_token_stats" -> 0.57, "l5_histogram" -> 0.243,
    "l6_decode_audio" -> 1.291, "l6_decode_features" -> 0.405,
    "l6_decode_real" -> 1.316, "l6_multimodal_meta" -> 0.2,
    "l6_quantize_int8" -> 0.35, "l6_resize_framesample" -> 0.216,
    "l7_curation_pipeline" -> 0.736, "l8_bottomk_sample" -> 0.247,
    "l8_deterministic_sample" -> 0.164, "l8_deterministic_split" -> 0.218,
    "l8_mixture_weights" -> 0.266, "l8_stratified_sample" -> 0.151,
    "l8_weighted_sample" -> 0.246, "l9_sequence_packing" -> 0.355,
    "l9_shard_export" -> 1.007, "o1_topk" -> 0.14,
    "o2_limit" -> 0.133, "o3_union" -> 0.326,
    "o3_union_distinct" -> 0.389, "o4_except" -> 0.368,
    "o4_except_all" -> 0.533, "o4_intersect" -> 0.32,
    "o4_intersect_all" -> 0.396, "p10_map_hof" -> 1.667,
    "p10_maps" -> 1.039, "p11_envelope" -> 0.401,
    "p12_unpivot" -> 0.284, "p13_subqueries" -> 0.501,
    "p14_variant" -> 1.685, "p15_lateral" -> 0.351,
    "p16_try_functions" -> 3.122, "p1_prune" -> 0.62,
    "p2_filter" -> 0.364, "p3_inlist" -> 0.162,
    "p4_strings" -> 0.269, "p5_datetime" -> 0.476,
    "p6_math" -> 0.788, "p7_conditional" -> 0.208,
    "p8_json" -> 0.693, "p8_json_nested" -> 2.776,
    "p9_array_fns" -> 0.159, "p9_arrays" -> 0.246,
    "p9_explode" -> 0.174, "p9_posexplode" -> 0.162,
    "s10_vector_index" -> 1.26, "s10b_index_append" -> 1.723,
    "s11_schema_evolution" -> 0.76, "s12_compaction" -> 1.164,
    "s13_dpp_join" -> 1.288, "s14_zorder_layout" -> 1.128,
    "s15_stats_pruned_scan" -> 1.151, "s16_binaryfile_ingest" -> 1.051,
    "s17_xml_roundtrip" -> 1.362, "s18_corrupt_drop" -> 0.437,
    "s19_envelope_sink" -> 1.088, "s20_bson_dump" -> 1.452,
    "s21_mongo_extjson" -> 1.552, "s22_time_travel" -> 1.147,
    "s23_merge_on_read" -> 1.246, "s3_jdbc_roundtrip" -> 0.365,
    "s4_json_roundtrip" -> 0.61, "s5_kafka_envelope" -> 0.207,
    "s6_csv_roundtrip" -> 0.493, "s7_orc_roundtrip" -> 0.877,
    "s8_envelope_source" -> 0.66, "s9_partitioned_prune" -> 0.628,
    "t12_stream_envelope_sink" -> 1.19, "t13_stream_envelope_source" -> 1.627,
    "t1_tumbling" -> 0.438, "t2_sliding" -> 0.5,
    "t3_session" -> 0.785, "t4_watermark_closed" -> 0.468,
    "t5_dedup" -> 0.329, "t6_stateful_running" -> 0.549,
    "t7_stream_static" -> 0.569, "t8_foreachbatch_jdbc" -> 0.87,
    "t8c_exactly_once_jdbc" -> 1.749, "t9_stream_stream" -> 0.406,
    "t9_stream_stream_full" -> 0.502, "t9_stream_stream_outer" -> 0.368,
    "t9_stream_stream_semi" -> 0.352, "w10_seasonal_decomp" -> 0.515,
    "w11_ewma" -> 0.68, "w1_ranking" -> 0.857,
    "w2_analytic" -> 0.982, "w3_frames" -> 0.872,
    "w3_time_range" -> 0.623, "w4_topk_per_group" -> 0.408,
    "w4_topk_window_idiom" -> 0.451, "w5_distribution" -> 1.118,
    "w6_gap_fill" -> 0.841, "w7_funnel" -> 0.531,
    "w8_retention" -> 0.45, "w9_anomaly" -> 0.77)

  private def atReferenceSf(sfDir: String): Boolean =
    new java.io.File(sfDir).getName == "sf0.1"

  /** Budget = pinned × 5, floored at 1.5 s. The floor only lifts
    * sub-0.3 s queries, where a single GC pause or scheduler stall is
    * the same order as 5× the pinned time and would make the gate pure
    * noise; everything 0.3 s and up gets exactly 5×, so a ~5× plan
    * regression trips loudly. Noise immunity for genuine regressions vs
    * a busy machine comes from the confirmation re-run below, not from
    * padding the ceiling. */
  def budgetSeconds(name: String, sfDir: String): Option[Double] =
    if (!atReferenceSf(sfDir)) None
    else pinnedSeconds.get(name).map(t => math.max(t * 5.0, 1.5))

  /** Some(error message) when `sec` breaches the budget for `name`. */
  def checkBudget(name: String, sec: Double, sfDir: String): Option[String] =
    budgetSeconds(name, sfDir).collect {
      case b if sec > b =>
        f"time budget exceeded: $sec%.1f s > $b%.1f s ceiling (regression?)"
    }

  /** A first reading this far above the pin is as likely machine load as
    * a plan regression (round 5: the driver artifact recorded 18.1 s for
    * a 1.5 s query — a 12× phantom). Such readings get ONE confirmation
    * re-run and the min of the two is recorded: a real regression stays
    * slow on the warm re-run and still trips the budget; a busy-machine
    * artifact doesn't. One-shot wall-clock cannot tell these apart.
    *
    * Threshold: 1.5× pin for queries pinned ≥ 1 s (round 6 shipped a
    * 1.88×-pin single reading the 2× rule never challenged — the dead
    * band between 1.5× and 2×); sub-second pins keep the 2×-and-above-1s
    * rule, where scheduler jitter alone reaches 1.5× and a lower
    * threshold would re-run half the suite for nothing. */
  def noiseSuspect(name: String, sec: Double, sfDir: String): Boolean =
    atReferenceSf(sfDir) &&
      pinnedSeconds.get(name).exists { p =>
        sec > (if (p >= 1.0) 1.5 * p else math.max(2.0 * p, 1.0))
      }

  /** Record min-of-runs: run once; re-run only on a noise-suspect first
    * reading. Factored out of main so BenchBudgetSpec can drive it with
    * stub timers (noisy-then-fast must NOT breach; slow-both must). */
  def timeWithRetry(name: String, sfDir: String)(run: () => Double): Double = {
    val first = run()
    if (noiseSuspect(name, first, sfDir)) math.min(first, run()) else first
  }

  /** Untimed warmup: JVM + codegen + parquet-footer caches, so the
    * alphabetically-first query doesn't absorb startup cost. Also warms
    * the shared text kernels (regex tokenizer, portable md5, array
    * HOFs) on a tiny slice: their first-use JIT costs multiple seconds
    * and would otherwise land on whichever text query the alphabet
    * puts first (measured: l11_decontam cold 8.9 s → 3.1 s once
    * another query had JIT'd the same kernels). Steady-state
    * throughput is what the 100 TB target cares about. Shared with
    * [[Sweep]] so the two timing mains can't drift. */
  private[graft] def warmup(
      spark: org.apache.spark.sql.SparkSession, sfDir: String): Unit =
    try {
      spark.read.parquet(s"$sfDir/lineitem.parquet")
        .limit(10000)
        .groupBy("l_returnflag")
        .agg(org.apache.spark.sql.functions.sum(
          org.apache.spark.sql.functions.col("l_quantity")
            .cast(org.apache.spark.sql.types.DecimalType(18, 2))))
        .write.format("noop").mode("overwrite").save()
      import org.apache.spark.sql.functions._
      spark.read.parquet(s"$sfDir/documents.parquet").limit(100)
        .select(col("doc_id"), explode(expr(
          s"""transform(${graft.queries.Qh.toksExpr},
             |  t -> md5_prefix32(t, 0))""".stripMargin)).as("h"))
        .groupBy("h").count()
        .write.format("noop").mode("overwrite").save()
    } catch { case _: Throwable => () }

  /** Locale.ROOT: a comma-decimal default locale would emit 1,234 and
    * make the JSON unparseable by the driver. */
  private[graft] def f3(v: Double): String =
    String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Engine.session("graft-bench")

    def esc(s: String): String = s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => " "
      case c => c.toString
    }

    warmup(spark, sfDir)

    val names = SparkEntry.queries.keys.toSeq.sorted
    val timings = scala.collection.mutable.LinkedHashMap[String, Double]()
    val rowCounts = scala.collection.mutable.LinkedHashMap[String, Long]()
    val errors = scala.collection.mutable.LinkedHashMap[String, String]()
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      try {
        var lastRows = 0L
        var attempt = 0
        val sec = timeWithRetry(name, sfDir) { () =>
          attempt += 1
          // R10's progress surface: row counts ride the plan via observe
          // (CollectMetrics on the executors) — no second pass, no collect.
          // Observation names must be unique per execution, hence attempt.
          val obs = new org.apache.spark.sql.Observation(s"bench_${name}_$attempt")
          val t0 = System.nanoTime()
          fn(spark, sfDir)
            .observe(obs, org.apache.spark.sql.functions.count(
              org.apache.spark.sql.functions.lit(1)).as("rows_out"))
            .write.format("noop").mode("overwrite").save()
          val s = (System.nanoTime() - t0) / 1e9
          lastRows = obs.get("rows_out").asInstanceOf[Long]
          s
        }
        timings(name) = sec
        rowCounts(name) = lastRows
        checkBudget(name, sec, sfDir).foreach(msg => errors(name) = msg)
      } catch {
        case e: Throwable =>
          errors(name) = Option(e.getMessage).getOrElse(e.getClass.getName).take(200)
      }
    }
    val qs = timings.map { case (k, v) => s""""${esc(k)}":${f3(v)}""" }
      .mkString("{", ",", "}")
    val rps = rowCounts.map { case (k, n) =>
      val sec = timings.getOrElse(k, 0.0)
      s""""${esc(k)}":${f3(if (sec > 0) n / sec else 0.0)}"""
    }.mkString("{", ",", "}")
    val errJson = errors.map { case (k, v) => s""""${esc(k)}":"${esc(v)}"""" }
      .mkString("{", ",", "}")
    val total = timings.values.sum
    val full =
      s"""{"metric":"total","value":${f3(total)},"unit":"sec","queries":$qs,"rows_per_sec":$rps,"errors":$errJson,"n_ok":${timings.size},"n_err":${errors.size},"sf":"$sfDir"}"""
    // Full per-query detail: to a file + an EARLY stdout line. The driver
    // keeps only the last ~2000 chars of stdout, so a ~5 KB line there can
    // never be parsed (r02/r03 both recorded parsed=null). Humans and
    // round docs read bench_detail.json; the driver reads the compact
    // final line below.
    try {
      java.nio.file.Files.write(
        java.nio.file.Paths.get("bench_detail.json"),
        (full + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    } catch { case _: Throwable => () }
    println(full)

    // Compact contract line, printed LAST: headline queries only, hard
    // budget well under the tail window (sbt's [success] footer follows).
    val headline = Seq(
      "flagship_pipeline", "a1_hashagg", "a6_tdigest", "j1_semi_broadcast",
      "j2_inner", "j6_sortmerge", "j7_range", "j9_asof_join", "w1_ranking",
      "w4_topk_per_group", "o1_topk", "l1_exact_dedup", "l2_lsh_pairs",
      "l2_minhash_sigs", "l2_ngram_jaccard", "l2_dedup_clusters",
      "l3_ann_lsh", "l3_ann_ivfpq", "l3_kmeans", "l3_cosine_topk",
      "l4_tfidf", "l4_quality_score", "l6_decode_features",
      "l9_sequence_packing", "l11_decontam", "l13_pagerank",
      "s10_vector_index", "t1_tumbling", "t6_stateful_running", "p8_json"
    ).filter(timings.contains)
    val headJson = headline.map(k => s""""${esc(k)}":${f3(timings(k))}""")
      .mkString("{", ",", "}")
    // errors stay visible but bounded: count always, first 3 names only
    val errNames = errors.keys.take(3).map(k => s""""${esc(k)}"""")
      .mkString("[", ",", "]")
    var compact =
      s"""{"metric":"total","value":${f3(total)},"unit":"sec","queries":$headJson,"n_ok":${timings.size},"n_err":${errors.size},"err_names":$errNames,"detail":"bench_detail.json","sf":"$sfDir"}"""
    if (compact.length > 1600) // belt-and-braces: never outgrow the tail
      compact =
        s"""{"metric":"total","value":${f3(total)},"unit":"sec","queries":{"flagship_pipeline":${f3(timings.getOrElse("flagship_pipeline", 0.0))}},"n_ok":${timings.size},"n_err":${errors.size},"sf":"$sfDir"}"""
    println(compact)
    spark.stop()
  }
}
