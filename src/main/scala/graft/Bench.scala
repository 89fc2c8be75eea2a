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
    val errors = scala.collection.mutable.LinkedHashMap[String, String]()
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      val t0 = System.nanoTime()
      try {
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        timings(name) = (System.nanoTime() - t0) / 1e9
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
    val errJson = errors.map { case (k, v) => s""""${esc(k)}":"${esc(v)}"""" }
      .mkString("{", ",", "}")
    val total = timings.values.sum
    println(
      s"""{"metric":"total","value":${f3(total)},"unit":"sec","queries":$qs,"errors":$errJson,"n_ok":${timings.size},"n_err":${errors.size},"sf":"$sfDir"}""")
    spark.stop()
  }
}
