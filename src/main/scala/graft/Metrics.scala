package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.functions._
import org.apache.spark.sql.util.QueryExecutionListener

/** Reference R10 (kafka-database-import.go:215-218,118,224), Spark form:
  * the reference logs every 1000th record and total wall-clock; the
  * engine observes row/byte counts declaratively (`observe` — collected
  * ON the executors with zero extra pass) and logs per-query wall-clock
  * through a QueryExecutionListener. No driver-side row loop — counters
  * ride the existing plan.
  */
object Metrics {

  /** Attach the standard progress observation to a DataFrame. The
    * metrics surface in QueryExecutionListener callbacks and in
    * `df.observe`-aware sinks (streaming progress too). */
  def observed(df: DataFrame, name: String = "graft_progress"): DataFrame =
    df.observe(name, count(lit(1)).as("rows_out"))

  /** Wall-clock + observed-metrics logger (R10's duration log, per query
    * instead of per job). Returns the listener so callers can remove it. */
  def addListener(spark: SparkSession): QueryExecutionListener = {
    val l = new QueryExecutionListener {
      override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit = {
        val observed = qe.observedMetrics
          .map { case (k, row) => s"$k=$row" }.mkString(" ")
        // the reference logs "imported %d records in %f seconds"
        System.err.println(
          f"[graft-metrics] $funcName%s ${durationNs / 1e9}%.3f s $observed%s")
      }
      override def onFailure(funcName: String, qe: QueryExecution, e: Exception): Unit =
        System.err.println(s"[graft-metrics] $funcName FAILED: ${e.getMessage}")
    }
    spark.listenerManager.register(l)
    l
  }
}
