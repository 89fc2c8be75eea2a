package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}

/** Forked-JVM entry point for ConstrainedMemorySpec: run the heavy
  * operator shapes (sort-merge join, hash agg, window sort, AllPairs
  * n-gram join) under a DELIBERATELY tiny execution-memory pool and
  * prove they SPILL rather than OOM — the 100 TB contract: executor
  * memory never scales with data size, only the spill volume does.
  *
  * The constraint is layered: a 2g heap (the spec's fork arg) bounds
  * the JVM, and `spark.testing.memory` = 128 MB (minus 32 MB reserved)
  * shrinks the unified execution+storage pool to ~58 MB shared by 4
  * cores — far below what the sf0.1 sorts and joins materialize, so
  * every memory-hungry operator must take its spill path to finish.
  * Spill is observed from the engine's own task metrics
  * (memoryBytesSpilled + diskBytesSpilled) via a SparkListener.
  *
  * Prints one `CONSTRAINED {json}` line per query and a final
  * `CONSTRAINED_TOTAL {json}`; exits non-zero on any failure. Test
  * tooling only — not part of the library surface.
  */
object ConstrainedMemoryMain {

  private val defaultQueries = Seq(
    "j6_sortmerge", "a1_hashagg", "w1_ranking", "l2_ngram_jaccard")

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = if (args.length > 1) args.drop(1).toSeq else defaultQueries

    val spark = Engine.builder("graft-constrained")
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "8")
      // the tiny pool: 128 MB system − 32 MB reserved → ~58 MB unified
      .config("spark.testing.memory", (128L * 1024 * 1024).toString)
      .config("spark.testing.reservedMemory", (32L * 1024 * 1024).toString)
      // no planner-chosen broadcasts: HashedRelation builds can't spill,
      // so under a starved pool they'd OOM by design — shuffle joins
      // (which CAN spill) are the honest strategy at this budget
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.register(spark)
    graft.plans.TopKPerGroup.register(spark)

    val spilled = new java.util.concurrent.atomic.AtomicLong(0L)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
        val m = e.taskMetrics
        if (m != null) spilled.addAndGet(m.memoryBytesSpilled + m.diskBytesSpilled)
      }
    })
    // listener delivery is asynchronous — wait for the counter to go
    // quiet before attributing spill to a query
    def settledSpill(): Long = {
      var prev = -1L
      var cur = spilled.get()
      var waited = 0
      while (cur != prev && waited < 10000) {
        prev = cur; Thread.sleep(500); waited += 500; cur = spilled.get()
      }
      cur
    }

    var failed = false
    var ok = 0
    names.foreach { name =>
      val before = settledSpill()
      try {
        val obs = new org.apache.spark.sql.Observation(s"constrained_$name")
        val t0 = System.nanoTime()
        SparkEntry.queries(name)(spark, sfDir)
          .observe(obs, org.apache.spark.sql.functions.count(
            org.apache.spark.sql.functions.lit(1)).as("rows_out"))
          .write.format("noop").mode("overwrite").save()
        val sec = (System.nanoTime() - t0) / 1e9
        val rows = obs.get("rows_out").asInstanceOf[Long]
        val q = settledSpill() - before
        println(f"""CONSTRAINED {"query":"$name","sec":$sec%.1f,"rows":$rows,"spilled":$q}""")
        ok += 1
      } catch {
        case e: Throwable =>
          failed = true
          val msg = Option(e.getMessage).getOrElse(e.getClass.getName)
            .replaceAll("[\"\\n\\r]", " ").take(300)
          println(s"""CONSTRAINED {"query":"$name","err":"$msg"}""")
      }
    }
    println(s"""CONSTRAINED_TOTAL {"total_spilled":${settledSpill()},"n_ok":$ok}""")
    spark.stop()
    if (failed) sys.exit(1)
  }
}
