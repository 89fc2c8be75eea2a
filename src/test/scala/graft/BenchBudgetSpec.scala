package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench's per-query time budgets: a deliberately-slowed query must
  * trip its ceiling (landing in the errors map the driver gates on),
  * while normal timings and non-reference scale factors must not. */
class BenchBudgetSpec extends AnyFunSuite {

  test("a deliberately slowed query trips its budget at sf0.1") {
    // current measured time ~3.7 s; simulate a 10× plan regression
    val slowed = Bench.checkBudget("l13_pagerank", 37.0, "/root/testdata/sf0.1")
    assert(slowed.isDefined, "10x-slowed heavy query must breach the 20 s ceiling")
    assert(slowed.get.contains("budget exceeded"))
    val slowedLight = Bench.checkBudget("o1_topk", 12.0, "/root/testdata/sf0.1")
    assert(slowedLight.isDefined, "slowed light query must breach the 10 s ceiling")
  }

  test("normal timings stay inside their budgets") {
    assert(Bench.checkBudget("l13_pagerank", 3.7, "/root/testdata/sf0.1").isEmpty)
    assert(Bench.checkBudget("o1_topk", 0.2, "/root/testdata/sf0.1").isEmpty)
    assert(Bench.checkBudget("unknown_new_query", 9.0, "/root/testdata/sf0.1").isEmpty)
  }

  test("budgets only apply at the pinned reference scale factor") {
    assert(Bench.checkBudget("l13_pagerank", 500.0, "/root/testdata/sf1.0").isEmpty)
    assert(Bench.checkBudget("l13_pagerank", 500.0, "/root/testdata/sf0.001").isEmpty)
  }
}
