package graft

/** Dev scratchpad for plan inspection (not part of the engine surface). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = Engine.session("graft-scratch")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[scratch] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    val names = if (args.nonEmpty) args.toSeq else Seq("l2_ngram_jaccard")
    if (names == Seq("scan_ab")) {
      // A/B the vectorized commitlog snapshot scan against
      // spark.read.parquet on the SAME files, at the given fixture's
      // lineitem scale — the 100 TB-shaped throughput number
      import org.apache.spark.sql.functions._
      import spark.implicits._
      val root = java.nio.file.Files.createTempDirectory("scanab").toString
      val li = spark.read.parquet(s"$dir/lineitem.parquet")
      time("load commitlog table")(
        li.write.format("commitlog").option("path", root)
          .mode("append").save())
      val files = graft.sources.CommitLog
        .files(root, graft.sources.CommitLog.latestVersion(root))
        .flatMap(graft.sources.CommitLogSource.listParquet(root, _))
      def agg(df: org.apache.spark.sql.DataFrame) =
        df.agg(sum($"l_extendedprice"), sum(length($"l_returnflag")),
          max($"l_shipdate"), count(lit(1))).collect()
      (1 to 3).foreach { i =>
        time(s"commitlog scan $i")(
          agg(spark.read.format("commitlog").option("path", root).load()))
        time(s"parquet scan $i")(agg(spark.read.parquet(files: _*)))
      }
      spark.stop(); return
    }
    if (names == Seq("ngram_stages")) {
      import org.apache.spark.sql.functions._
      import spark.implicits._
      val base = Tables(spark, dir, "documents")
        .filter(length($"text") >= 4)
        .select($"doc_id", $"lang", $"source", $"text",
          explode(sequence(lit(0), length($"text") - 4)).as("i"))
      time("explode only")(base.write.format("noop").mode("overwrite").save())
      val grams = base.select($"doc_id", $"lang", $"source",
        (ascii(substring($"text", $"i" + 1, lit(1))) * 16777216 +
          ascii(substring($"text", $"i" + 2, lit(1))) * 65536 +
          ascii(substring($"text", $"i" + 3, lit(1))) * 256 +
          ascii(substring($"text", $"i" + 4, lit(1)))).as("gram"))
        .filter($"gram" % 4 === 0)
      time("gram codes")(grams.write.format("noop").mode("overwrite").save())
      val dist = grams.distinct()
      time("distinct")(dist.write.format("noop").mode("overwrite").save())
      time("checkpoint")(dist.localCheckpoint())
    } else names.foreach { name =>
      if (name.startsWith("explain:")) {
        val q = name.stripPrefix("explain:")
        println(s"[scratch] ===== $q =====")
        println(SparkEntry.queries(q)(spark, dir)
          .queryExecution.explainString(
            org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
      } else {
        val df = time(s"$name build")(SparkEntry.queries(name)(spark, dir))
        time(s"$name write")(df.write.format("noop").mode("overwrite").save())
      }
    }
    spark.stop()
  }
}
