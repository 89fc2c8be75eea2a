package graft

import org.apache.spark.sql.functions._

/** AQE runtime skew-join splitting — the AUTOMATIC complement of the
  * engine's explicit two-stage salting (j11_salted_skew_join,
  * a9_salted_agg). At 100 TB a hot key that was fine at planning time
  * shows up as one straggler partition at runtime; AQE's skew-join rule
  * re-plans the sort-merge join mid-query, splitting the oversized
  * partition into chunks that join against a replicated build side —
  * same result, no straggler. This suite pins (a) that the rule
  * actually fires on a skewed key distribution (`isSkew=true` on the
  * final adaptive plan's shuffle reads) and (b) that the re-planned
  * join is exactly correct — the licence for leaving moderate skew to
  * the runtime instead of hand-salting every join.
  *
  * Thresholds are lowered to make a local[4] fixture register as
  * "skewed" (production defaults are 256 MB-scale); a cloned session
  * keeps the overrides out of every other suite.
  */
class AqeSkewSpec extends SparkSpec {

  test("AQE splits the skewed partition at runtime and preserves the exact join result") {
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.adaptive.enabled", "true")
    s2.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    s2.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1.0")
    s2.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "4KB")
    s2.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "2KB")
    s2.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
    import s2.implicits._

    // one pathological key (50k of 60k rows on k=0), uniform right side:
    // every left row matches exactly 100 right rows
    val left = s2.range(0, 60000).select(
      when($"id" < 50000, 0L).otherwise($"id" % 100).as("k"),
      // md5 payload defeats shuffle compression so partition byte sizes
      // actually reflect the row skew
      md5($"id".cast("string")).as("v"))
    val right = s2.range(0, 10000).select(($"id" % 100).as("k"), $"id".as("w"))

    val joined = left.join(right, "k").select(sum(lit(1L)).as("n"))
    val n = joined.collect()(0).getLong(0)
    assert(n == 6000000L, s"re-planned join lost/duplicated rows: $n")

    val p = joined.queryExecution.executedPlan.toString
    assert(p.contains("isFinalPlan=true"), "AQE did not finalize")
    assert(p.contains("SortMergeJoin(skew=true)") || p.contains("skew=true"),
      s"skew rule did not fire:\n${p.take(1200)}")
  }
}
