package graft

import graft.sources.EngineConfig

/** R1 config semantics: defaults on absent env, overrides honored. */
class EngineConfigSpec extends SparkSpec {

  private def env(m: Map[String, String]): EngineConfig.Env = m.get

  test("defaults mirror the reference's localhost fallback") {
    val k = EngineConfig.kafkaOptions(env(Map.empty))
    assert(k("kafka.bootstrap.servers") == "localhost:9092")
    val j = EngineConfig.jdbcOptions(env(Map.empty))
    assert(j("url").startsWith("jdbc:derby:memory"))
    assert(j("driver") == "org.apache.derby.jdbc.EmbeddedDriver")
    assert(EngineConfig.maxRecords(env(Map.empty)) == 250000)
  }

  test("env overrides land in the option maps") {
    val k = EngineConfig.kafkaOptions(env(Map(
      "GRAFT_KAFKA_BROKERS" -> "b1:9092,b2:9092",
      "GRAFT_KAFKA_TOPIC" -> "t")))
    assert(k("kafka.bootstrap.servers") == "b1:9092,b2:9092" && k("topic") == "t")
    val j = EngineConfig.jdbcOptions(env(Map(
      "GRAFT_JDBC_URL" -> "jdbc:postgresql://db:5432/x",
      "GRAFT_JDBC_SSL" -> "true",
      "GRAFT_JDBC_TABLE" -> "uf",
      "GRAFT_JDBC_DRIVER" -> "org.postgresql.Driver")))
    assert(j("url") == "jdbc:postgresql://db:5432/x;ssl=true")
    assert(j("dbtable") == "uf" && j("driver") == "org.postgresql.Driver")
    assert(EngineConfig.maxRecords(env(Map("GRAFT_MAX_RECORDS" -> "7"))) == 7)
  }

  test("the configured JDBC options drive a real round trip (Derby)") {
    import spark.implicits._
    val j = EngineConfig.jdbcOptions(env(Map.empty))
    val props = new java.util.Properties()
    props.setProperty("driver", j("driver"))
    Seq((1L, 0), (2L, 1)).toDF("user_id", "partition")
      .write.mode("overwrite").jdbc(j("url"), "cfg_rt", props)
    assert(spark.read.jdbc(j("url"), "cfg_rt", props).count() == 2)
  }
}
