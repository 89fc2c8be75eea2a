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

  /** Per-query wall-clock budgets at the driver's sf0.1 (5–8× the
    * round-5 measured times — generous enough for run noise, tight
    * enough that a plan-shape regression slowing a query ~5× fails the
    * bench loudly instead of shipping as a silent slowdown; the driver
    * only gates on the errors map). Other scale factors have no pinned
    * reference times, so no budget applies there. */
  private val heavyQueries = Set(
    "l13_pagerank", "l2_ngram_jaccard", "l3_ann_trained", "p8_json_nested",
    "l2_simhash_hamming", "l2_dedup_clusters", "a1_hashagg",
    "a6_approx_percentile", "a6_stats", "a6_tdigest", "l3_ann_lsh",
    "p10_map_hof", "l3_ann_ivfpq", "l3_ann_pq", "t8_foreachbatch_jdbc",
    "l11_decontam", "l2_lsh_pairs", "l2_minhash_sigs", "l3_kmeans",
    "l2_cosine_neardup", "s10_vector_index", "s10b_index_append",
    "l2_minhash_estimate", "t9_stream_stream_full", "s12_compaction")

  def budgetSeconds(name: String, sfDir: String): Option[Double] =
    if (new java.io.File(sfDir).getName != "sf0.1") None
    else Some(if (heavyQueries(name)) 20.0 else 10.0)

  /** Some(error message) when `sec` breaches the budget for `name`. */
  def checkBudget(name: String, sec: Double, sfDir: String): Option[String] =
    budgetSeconds(name, sfDir).collect {
      case b if sec > b =>
        f"time budget exceeded: $sec%.1f s > $b%.1f s ceiling (regression?)"
    }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Engine.session("graft-bench")

    def esc(s: String): String = s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => " "
      case c => c.toString
    }

    // untimed warmup: JVM + codegen + parquet-footer caches, so the
    // alphabetically-first query doesn't absorb startup cost
    try {
      spark.read.parquet(s"$sfDir/lineitem.parquet")
        .limit(10000)
        .groupBy("l_returnflag")
        .agg(org.apache.spark.sql.functions.sum(
          org.apache.spark.sql.functions.col("l_quantity")
            .cast(org.apache.spark.sql.types.DecimalType(18, 2))))
        .write.format("noop").mode("overwrite").save()
      // warm the shared text kernels (regex tokenizer, portable md5,
      // array HOFs) on a tiny slice: their first-use JIT costs multiple
      // seconds and would otherwise land on whichever text query the
      // alphabet puts first (measured: l11_decontam cold 8.9 s → 3.1 s
      // once another query had JIT'd the same kernels). Steady-state
      // throughput is what the 100 TB target cares about.
      import org.apache.spark.sql.functions._
      spark.read.parquet(s"$sfDir/documents.parquet").limit(100)
        .select(col("doc_id"), explode(expr(
          s"""transform(${graft.queries.Qh.toksExpr},
             |  t -> md5_prefix32(t, 0))""".stripMargin)).as("h"))
        .groupBy("h").count()
        .write.format("noop").mode("overwrite").save()
    } catch { case _: Throwable => () }

    val names = SparkEntry.queries.keys.toSeq.sorted
    val timings = scala.collection.mutable.LinkedHashMap[String, Double]()
    val rowCounts = scala.collection.mutable.LinkedHashMap[String, Long]()
    val errors = scala.collection.mutable.LinkedHashMap[String, String]()
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      val t0 = System.nanoTime()
      try {
        // R10's progress surface: row counts ride the plan via observe
        // (CollectMetrics on the executors) — no second pass, no collect
        val obs = new org.apache.spark.sql.Observation(s"bench_$name")
        fn(spark, sfDir)
          .observe(obs, org.apache.spark.sql.functions.count(
            org.apache.spark.sql.functions.lit(1)).as("rows_out"))
          .write.format("noop").mode("overwrite").save()
        timings(name) = (System.nanoTime() - t0) / 1e9
        rowCounts(name) = obs.get("rows_out").asInstanceOf[Long]
        checkBudget(name, timings(name), sfDir)
          .foreach(msg => errors(name) = msg)
      } catch {
        case e: Throwable =>
          errors(name) = Option(e.getMessage).getOrElse(e.getClass.getName).take(200)
      }
    }
    // Locale.ROOT: a comma-decimal default locale would emit 1,234 and
    // make the JSON unparseable by the driver
    def f3(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
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
