package graft

import graft.queries.Dedup

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

    val name = args.headOption.getOrElse("l2_ngram_jaccard")
    val df = SparkEntry.queries(name)(spark, dir)
    time(name)(df.write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
