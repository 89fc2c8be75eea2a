package graft

import org.apache.spark.sql.Observation
import org.apache.spark.sql.functions._

/** R10 instrumentation: observed metrics ride the plan and report the
  * true output row count; the listener fires per query. */
class MetricsSpec extends SparkSpec {

  test("observe() reports the flagship's output row count") {
    val obs = Observation("flagship_obs")
    val df = SparkEntry.entry(spark).observe(obs, count(lit(1)).as("n"))
    val n = df.count()
    assert(obs.get("n") == n, s"observed ${obs.get("n")} != counted $n")
    assert(n > 0)
  }

  test("QueryExecutionListener fires on success") {
    @volatile var fired = false
    val l = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(f: String, qe: org.apache.spark.sql.execution.QueryExecution,
          d: Long): Unit = fired = true
      override def onFailure(f: String, qe: org.apache.spark.sql.execution.QueryExecution,
          e: Exception): Unit = ()
    }
    spark.listenerManager.register(l)
    try {
      Tables(spark, sf0001, "region").count()
      // listener bus is async; poll briefly
      val deadline = System.nanoTime() + 10e9.toLong
      while (!fired && System.nanoTime() < deadline) Thread.sleep(50)
      assert(fired, "listener did not fire")
    } finally spark.listenerManager.unregister(l)
  }
}
