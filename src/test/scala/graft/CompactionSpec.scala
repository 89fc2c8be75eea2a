package graft

import org.apache.spark.sql.functions._

/** The s12 compaction contract the hash oracle can't see: the rewrite
  * actually reduces the file count and is a narrow (shuffle-free) plan. */
class CompactionSpec extends SparkSpec {

  test("compaction rewrites 64 landing files into at most 4, losslessly") {
    import spark.implicits._
    // run the decl (it writes landing + compacted under this JVM's ioDir)
    val out = SparkEntry.queries("s12_compaction")(spark, sf0001)
    assert(out.count() > 0)
    val base = graft.queries.Qh.ioDir("s12_compact")
    def parts(d: String): Int =
      Option(new java.io.File(d).listFiles()).getOrElse(Array.empty)
        .count(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
    assert(parts(s"$base/landing") == 64, "landing layout must show the small-file problem")
    assert(parts(s"$base/compacted") <= 4, "compaction must actually reduce file count")
    // lossless: same rows either side
    val a = spark.read.parquet(s"$base/landing")
    val b = spark.read.parquet(s"$base/compacted")
    assert(a.count() == b.count())
    assert(a.except(b).isEmpty && b.except(a).isEmpty)
    // narrow: the compaction read->coalesce->write plan has no exchange
    val p = spark.read.parquet(s"$base/landing").coalesce(4)
      .queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), s"compaction must not shuffle:\n$p")
  }
}
