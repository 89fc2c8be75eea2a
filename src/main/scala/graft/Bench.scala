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
        .groupBy("l_returnflag").count()
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
    println(
      s"""{"metric":"total","value":${f3(total)},"unit":"sec","queries":$qs,"rows_per_sec":$rps,"errors":$errJson,"n_ok":${timings.size},"n_err":${errors.size},"sf":"$sfDir"}""")
    spark.stop()
  }
}
