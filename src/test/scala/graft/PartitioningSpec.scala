package graft

import org.apache.spark.sql.functions._

/** Hive-style partitioned output + partition pruning, and salted
  * two-phase aggregation for skewed keys — the remaining 100 TB
  * techniques not exercised by the declared queries. */
class PartitioningSpec extends SparkSpec {

  test("partitionBy output is pruned to one directory by a partition filter") {
    import spark.implicits._
    val out = "/tmp/graft_io/events_by_type"
    Tables(spark, sf0001, "events")
      .write.mode("overwrite").partitionBy("event_type").parquet(out)

    val one = spark.read.parquet(out).filter($"event_type" === "purchase")
    val plan = one.queryExecution.executedPlan.toString
    // partition filter must hit the scan's PartitionFilters, not a
    // post-scan Filter over all partitions
    assert(plan.contains("PartitionFilters") &&
      plan.replaceAll("\\s", "").contains("PartitionFilters:[isnotnull(event_type"),
      s"partition filter not pushed:\n$plan")

    // and the pruned count matches the unpartitioned filter
    val expected = Tables(spark, sf0001, "events")
      .filter($"event_type" === "purchase").count()
    assert(one.count() == expected)
  }

  test("salted two-phase aggregation equals direct aggregation") {
    import spark.implicits._
    // skew stand-in: aggregate value sums per event_type (5 hot keys).
    // Phase 1 aggregates on (key, salt) — spreading each hot key over
    // 8 tasks — phase 2 merges salt partials. Decimal sums make the
    // result exactly equal to the direct aggregation.
    val ev = Tables(spark, sf0001, "events")
    val direct = ev.groupBy($"event_type")
      .agg(sum($"value".cast("decimal(18,2)")).as("total"),
        count(lit(1)).as("n"))
    val salted = ev
      .withColumn("salt", pmod(hash($"event_id"), lit(8)))
      .groupBy($"event_type", $"salt")
      .agg(sum($"value".cast("decimal(18,2)")).as("ptotal"),
        count(lit(1)).as("pn"))
      .groupBy($"event_type")
      .agg(sum($"ptotal").as("total"), sum($"pn").as("n"))
    assert(salted.except(direct).count() == 0 &&
      direct.except(salted).count() == 0)
  }

  test("repartition + sortWithinPartitions keeps data clustered for writers") {
    import spark.implicits._
    val df = Tables(spark, sf0001, "events")
      .repartition(4, $"user_id")
      .sortWithinPartitions($"user_id", $"ts")
    // every partition is locally sorted by (user_id, ts)
    val ok = df.mapPartitions { it =>
      var prev: (Long, Long) = (Long.MinValue, Long.MinValue)
      var sorted = true
      it.foreach { r =>
        val cur = (r.getAs[Long]("user_id"), r.getAs[java.sql.Timestamp]("ts").getTime)
        if (cur._1 < prev._1 || (cur._1 == prev._1 && cur._2 < prev._2)) sorted = false
        prev = cur
      }
      Iterator single sorted
    }(org.apache.spark.sql.Encoders.scalaBoolean).collect()
    assert(ok.forall(identity))
  }
}
