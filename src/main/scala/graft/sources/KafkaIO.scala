package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamReader

/** SURVEY §2.B S2/S5 — Kafka source/sink (reference R9 and its reverse).
  *
  * The reference writes every record to ONE fixed partition
  * (kafka-database-import.go:104,121) — its #1 scale ceiling. The engine
  * keys messages by user_id, so the Kafka broker distributes output
  * across partitions while preserving per-user ordering (the ordering
  * the as-of/session operators downstream rely on).
  *
  * This container ships no Kafka broker or spark-sql-kafka connector
  * (zero egress), so the live paths are constructed lazily and fail with
  * a clear message if the connector is absent; the serialization surface
  * (envelope bytes — exactly what would land on the wire) is covered by
  * the `s5_kafka_envelope` decl and its DuckDB oracle.
  */
object KafkaIO {

  /** R7+R8 envelope: key = user id (partitioning key), value = JSON
    * envelope {"data": ..., "source": "database"}. */
  def toEnvelope(events: DataFrame): DataFrame =
    events.select(
      col("user_id").cast("string").as("key"),
      to_json(
        struct(
          struct(col("event_id"), col("event_type"), col("user_id"), col("value")).as("data"),
          lit("database").as("source")),
        Map("ignoreNullFields" -> "false")).as("value"))

  /** Batch Kafka sink (R9 upgraded: keyed, batched, at-least-once). */
  def writeBatch(envelope: DataFrame, brokers: String, topic: String): Unit =
    envelope
      .selectExpr("CAST(key AS BINARY) AS key", "CAST(value AS BINARY) AS value")
      .write.format("kafka")
      .option("kafka.bootstrap.servers", brokers)
      .option("topic", topic)
      .save()

  /** Streaming Kafka source (S2 — the "import" direction). */
  def readStream(spark: SparkSession, brokers: String, topic: String): DataStreamReader =
    spark.readStream.format("kafka")
      .option("kafka.bootstrap.servers", brokers)
      .option("subscribe", topic)
      .option("startingOffsets", "earliest")

  /** Streaming Kafka sink with checkpointing (R9 + R12: at-least-once,
    * query.awaitTermination() replaces the reference's sleep-forever). */
  def writeStream(
      envelope: DataFrame, brokers: String, topic: String, checkpoint: String) =
    envelope
      .selectExpr("CAST(key AS BINARY) AS key", "CAST(value AS BINARY) AS value")
      .writeStream.format("kafka")
      .option("kafka.bootstrap.servers", brokers)
      .option("topic", topic)
      .option("checkpointLocation", checkpoint)
}
