package graft

import graft.functions.FreqItemsAgg.MgTopK
import org.apache.spark.sql.functions._

/** Misra–Gries guarantees: heavy hitters above n/capacity always
  * survive; exact when capacity ≥ vocabulary; partitioning-insensitive
  * through merge. */
class FreqItemsAggSpec extends SparkSpec {

  private def zipfy: Seq[String] =
    (1 to 26).flatMap { r =>
      val term = ('a' + r - 1).toChar.toString
      Seq.fill(math.max(1, 2000 / (r * r)))(term)
    }

  test("capacity >= vocab recovers the exact top-k") {
    val agg = MgTopK(64, 5)
    val buf = zipfy.foldLeft(agg.zero)(agg.reduce)
    assert(agg.finish(agg.merge(buf, agg.zero)).toSeq ==
      Seq("a", "b", "c", "d", "e"))
  }

  test("tight capacity still surfaces hitters above n/capacity") {
    // n = |zipfy| ~ 3300; capacity 8 -> threshold ~410; terms a (2000)
    // and b (500) are guaranteed survivors
    val agg = MgTopK(8, 3)
    val buf = zipfy.foldLeft(agg.zero)(agg.reduce)
    val top = agg.finish(agg.merge(buf, agg.zero)).toSeq
    assert(top.contains("a") && top.contains("b"), s"lost a hitter: $top")
  }

  test("partitioning-insensitive via udaf merge on a DataFrame") {
    import spark.implicits._
    val mg = udaf(MgTopK(64, 3))
    for (parts <- Seq(1, 7, 32)) {
      val top = zipfy.toDF("t").repartition(parts)
        .agg(mg($"t")).head.getSeq[String](0)
      assert(top == Seq("a", "b", "c"), s"$parts partitions -> $top")
    }
  }

  test("nulls are ignored; empty input yields empty top-k") {
    val agg = MgTopK(8, 3)
    assert(agg.finish(agg.zero).isEmpty)
    assert(agg.finish(agg.reduce(agg.zero, null)).isEmpty)
  }
}
