package graft

import graft.plans.TopKPerGroup
import org.apache.spark.sql.functions._

/** The custom two-phase top-k operator must return exactly the rows the
  * window idiom returns, with the pruned-partial plan shape. */
class TopKPerGroupSpec extends SparkSpec {

  test("matches window row_number top-k exactly (incl. tie-breaks)") {
    import spark.implicits._
    val orders = Tables(spark, sf001, "orders")
      .select($"o_custkey", $"o_orderkey", $"o_totalprice")
    val viaCustom = TopKPerGroup(
      orders,
      groupCols = Seq("o_custkey"),
      orderSpec = Seq(("o_totalprice", false), ("o_orderkey", true)),
      k = 3)
    val viaWindow = SparkEntry.queries("w4_topk_per_group")(spark, sf001)
    assert(viaCustom.count() == viaWindow.count())
    assert(viaCustom.except(viaWindow).count() == 0 &&
      viaWindow.except(viaCustom).count() == 0)
  }

  test("plan has partial+final custom nodes, one exchange, no WindowExec") {
    import spark.implicits._
    val df = TopKPerGroup(
      Tables(spark, sf0001, "orders")
        .select($"o_custkey", $"o_orderkey", $"o_totalprice"),
      Seq("o_custkey"), Seq(("o_totalprice", false), ("o_orderkey", true)), 3)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.linesIterator.count(_.contains("TopKPerGroup ")) == 2,
      s"expected partial+final custom nodes:\n$plan")
    // partial (true) must sit BELOW the exchange, final (false) above
    val lines = plan.linesIterator.toSeq
    val finalIdx = lines.indexWhere(l => l.contains("TopKPerGroup ") && l.contains("false"))
    val exchangeIdx = lines.indexWhere(_.contains("Exchange hashpartitioning"))
    val partialIdx = lines.indexWhere(l => l.contains("TopKPerGroup ") && l.contains("true"))
    assert(finalIdx < exchangeIdx && exchangeIdx < partialIdx,
      s"phases not split around the exchange:\n$plan")
    assert(!plan.contains("WindowExec") && !plan.contains("Window "),
      s"window crept in:\n$plan")
    assert(plan.contains("Exchange"), "final phase must cluster by group")
  }

  test("k larger than any group returns all rows; k=1 returns per-group min") {
    import spark.implicits._
    val orders = Tables(spark, sf0001, "orders")
      .select($"o_custkey", $"o_orderkey")
    val all = TopKPerGroup(orders, Seq("o_custkey"), Seq(("o_orderkey", true)), 1000000)
    assert(all.count() == orders.count())
    val k1 = TopKPerGroup(orders, Seq("o_custkey"), Seq(("o_orderkey", true)), 1)
    val expected = orders.groupBy($"o_custkey")
      .agg(min($"o_orderkey").as("o_orderkey"))
    assert(k1.count() == expected.count())
    assert(k1.except(expected).count() == 0)
  }
}
