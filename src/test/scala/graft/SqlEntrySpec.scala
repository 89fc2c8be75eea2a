package graft

/** SURVEY §3 entry point (2): `spark.sql` over the registered fixture
  * views must express the same pipelines as the DSL. */
class SqlEntrySpec extends SparkSpec {

  test("spark.sql over registered views reproduces the flagship semi-join") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    Tables.registerAll(spark, sf0001)
    val viaSql = spark.sql(
      """SELECT count(*) AS n FROM events
        |WHERE user_id IN (SELECT user_id FROM events WHERE event_type = 'signup')
        |""".stripMargin).head.getLong(0)
    val ev = Tables(spark, sf0001, "events")
    val allow = ev.filter($"event_type" === "signup").select($"user_id").distinct()
    val viaDsl = ev.join(broadcast(allow), Seq("user_id"), "left_semi").count()
    assert(viaSql == viaDsl)
  }

  test("SQL window + agg over views matches the w4 decl") {
    Tables.registerAll(spark, sf0001)
    val viaSql = spark.sql(
      """SELECT o_custkey, o_orderkey, o_totalprice FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders)
        |WHERE rn <= 3
        |ORDER BY o_custkey, o_orderkey""".stripMargin)
    val viaDsl = SparkEntry.queries("w4_topk_per_group")(spark, sf0001)
    assert(viaSql.except(viaDsl).count() == 0 && viaDsl.except(viaSql).count() == 0)
  }
}
