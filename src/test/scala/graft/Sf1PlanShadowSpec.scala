package graft

import org.apache.spark.sql.execution.{FileSourceScanExec, SortExec}
import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.joins.{ShuffledHashJoinExec, SortMergeJoinExec}
import org.apache.spark.sql.functions._

/** The scale-critical plan gates, re-asserted against the 10× sf1
  * fixture (scripts/gen_sf1.py) instead of sf0.001. PlanSpec proves
  * the shapes at the smallest fixture; the sf1 sweep proves wall-time
  * scaling; this suite closes the remaining gap — that the SHAPES
  * themselves survive a 10×-bench-scale fixture (statistics, file
  * counts, and AQE thresholds all shift with size; a broadcast that
  * silently flips to a shuffle, or a bucketed layout that stops being
  * trusted, would pass sf0.001 gates and still sink the 100 TB plan).
  * Each test is `assume`-guarded: canceled (not passed, not failed)
  * on machines without the generated fixture. */
class Sf1PlanShadowSpec extends SparkSpec {

  private val sf1 = "/tmp/graft_sf1"
  private def fixturePresent: Boolean =
    new java.io.File(s"$sf1/lineitem.parquet").exists

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf1)
      .queryExecution.explainString(ExplainMode.fromString("formatted"))

  test("sf1: bounded dims still broadcast under the semi-join") {
    assume(fixturePresent, "sf1 fixture not generated")
    val p = plan("j1_semi_broadcast")
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftSemi"),
      s"dim stopped broadcasting at sf1:\n${p.take(800)}")
  }

  test("sf1: filters still reach the parquet scan") {
    assume(fixturePresent, "sf1 fixture not generated")
    val p = plan("p2_filter")
    val pushed = p.linesIterator.find(_.contains("PushedFilters")).getOrElse("")
    assert(pushed.contains("l_quantity") && pushed.contains("l_discount"),
      s"filters not pushed at sf1: $pushed")
  }

  test("sf1: funnel still scans the fact exactly once") {
    assume(fixturePresent, "sf1 fixture not generated")
    val p = plan("w7_funnel")
    val scans = p.linesIterator.count(_.trim.matches("""\(\d+\) Scan parquet\s*"""))
    assert(scans == 1, s"w7_funnel reads the fact $scans times at sf1")
  }

  test("sf1: co-bucketed fact join stays exchange- and sort-free on both sides") {
    assume(fixturePresent, "sf1 fixture not generated")
    val saved = Seq("spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.enabled").map(k => k -> spark.conf.get(k))
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val li = graft.queries.Joins.bucketedLineitem(spark, sf1)
      val o = graft.queries.Joins.bucketedOrders(spark, sf1)
      val joined = li.join(o, col("l_orderkey") === col("o_orderkey"))
      val joins = joined.queryExecution.executedPlan.collect {
        case j: SortMergeJoinExec => j
        case j: ShuffledHashJoinExec => j
      }
      assert(joins.nonEmpty, "expected a shuffled join over the bucketed facts")
      joins.foreach(_.children.foreach { side =>
        assert(side.collect { case x: ShuffleExchangeExec => x }.isEmpty,
          s"co-bucketed side re-shuffles at sf1:\n$side")
        assert(side.collect { case x: SortExec => x }.isEmpty,
          s"co-bucketed side re-sorts at sf1:\n$side")
      })
    } finally saved.foreach { case (k, v) => spark.conf.set(k, v) }
  }

  test("sf1: pagerank's bucketed adjacency side joins with no exchange and no sort") {
    assume(fixturePresent, "sf1 fixture not generated")
    val thr = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val e = graft.queries.Graph.edgeTable(spark, sf1)
      val nodes = e.select(col("src").as("node")).distinct()
      val r = nodes.withColumn("r", lit(1000000000L))
      val it = graft.queries.Graph.iterate(e, nodes, r, 7L)
      def bucketedLeaf(p: org.apache.spark.sql.execution.SparkPlan): Boolean =
        p.collectLeaves().exists {
          case f: FileSourceScanExec => f.relation.bucketSpec.isDefined
          case _ => false
        }
      val joins = it.queryExecution.sparkPlan.collect {
        case j: SortMergeJoinExec => j
        case j: ShuffledHashJoinExec => j
      }
      assert(joins.nonEmpty, "iteration lost its equi-join at sf1")
      joins.foreach(_.children.filter(bucketedLeaf).foreach { side =>
        assert(side.collect { case x: ShuffleExchangeExec => x }.isEmpty,
          s"bucketed edge side re-shuffles at sf1:\n$side")
        assert(side.collect { case x: SortExec => x }.isEmpty,
          s"bucketed edge side re-sorts at sf1:\n$side")
      })
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thr)
  }

  test("sf1: LSH band candidate self-join co-locates on the bucketed band table") {
    assume(fixturePresent, "sf1 fixture not generated")
    val thr = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val cand = graft.queries.Dedup.bandCandidates(spark, sf1)
      val joins = cand.queryExecution.sparkPlan.collect {
        case j: SortMergeJoinExec => j
        case j: ShuffledHashJoinExec => j
      }
      assert(joins.nonEmpty, "candidate generation lost its equi-join at sf1")
      joins.foreach(_.children.foreach { side =>
        assert(side.collect { case x: ShuffleExchangeExec => x }.isEmpty,
          s"band self-join side re-shuffles at sf1:\n$side")
      })
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thr)
  }

  test("sf1: join-driven dynamic partition pruning still fires") {
    assume(fixturePresent, "sf1 fixture not generated")
    val p = plan("s13_dpp_join")
    val pf = p.linesIterator.filter(_.contains("PartitionFilters")).mkString("\n")
    assert(pf.contains("dynamicpruningexpression"),
      s"fact scan not dynamically pruned at sf1: $pf")
  }
}
