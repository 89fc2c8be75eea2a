package graft.sources

/** Reference R1 (kafka-database-import.go:52-95,103-105), Spark form:
  * the reference assembles a connection string from six env vars with
  * defaults (scheme, host, ssl flag, optional params) plus KAFKA_TOPIC /
  * KAFKA_BROKERS. The engine's equivalent is option maps for
  * DataFrameReader/Writer, built once from the environment with the same
  * default-on-absent semantics (env names are engine-local, not the
  * reference's).
  */
object EngineConfig {

  /** Environment accessor, injectable for tests. */
  type Env = String => Option[String]
  val sysEnv: Env = k => sys.env.get(k)

  /** Kafka source/sink options (S2/S5). Defaults mirror the reference's
    * localhost fallback (:64-66). */
  def kafkaOptions(env: Env = sysEnv): Map[String, String] = {
    val brokers = env("GRAFT_KAFKA_BROKERS").getOrElse("localhost:9092")
    val topic = env("GRAFT_KAFKA_TOPIC").getOrElse("graft-events")
    Map(
      "kafka.bootstrap.servers" -> brokers,
      "topic" -> topic)
  }

  /** JDBC options (S3) — the reference's dormant Postgres leg made
    * concrete; ssl flag folded into the URL like the reference folds it
    * into its connection string (:71-83). */
  def jdbcOptions(env: Env = sysEnv): Map[String, String] = {
    val url = env("GRAFT_JDBC_URL")
      .getOrElse("jdbc:derby:memory:graftdb;create=true")
    val ssl = env("GRAFT_JDBC_SSL").map(_.toBoolean).getOrElse(false)
    val base = Map(
      "url" -> (if (ssl && !url.contains("ssl=")) s"$url;ssl=true" else url),
      "dbtable" -> env("GRAFT_JDBC_TABLE").getOrElse("user_filter"))
    env("GRAFT_JDBC_DRIVER") match {
      case Some(d) => base + ("driver" -> d)
      case None if url.startsWith("jdbc:derby") =>
        base + ("driver" -> "org.apache.derby.jdbc.EmbeddedDriver")
      case None => base
    }
  }

  /** Row cap for the batch export pipeline — the reference's MaxRecs
    * (:111), overridable, clean semantics (no off-by-one). */
  def maxRecords(env: Env = sysEnv): Int =
    env("GRAFT_MAX_RECORDS").map(_.toInt).getOrElse(250000)
}
