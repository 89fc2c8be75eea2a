package graft

import org.apache.spark.sql.functions._

/** SURVEY §2.B UDF surface: the scalar-UDF escape hatch exists and is
  * correct, and the engine's preference order (built-in > native
  * Expression > ScalaUDF) is justified — the UDF result must equal the
  * built-in's, and the plan shows the codegen-opaque ScalaUDF wrapper
  * that is the reason UDFs stay OUT of declared queries. */
class UdfSpec extends SparkSpec {

  test("scalar udf() registers and matches the built-in result") {
    import spark.implicits._
    val upperLen = udf((s: String) => if (s == null) -1 else s.toUpperCase.length)
    spark.udf.register("upper_len", upperLen)
    val viaUdf = Tables(spark, sf0001, "part")
      .select($"p_partkey", call_function("upper_len", $"p_name").as("n"))
    val viaBuiltin = Tables(spark, sf0001, "part")
      .select($"p_partkey", length(upper($"p_name")).as("n"))
    assert(viaUdf.except(viaBuiltin).count() == 0 &&
      viaBuiltin.except(viaUdf).count() == 0)
  }

  test("the UDF appears as a ScalaUDF (codegen-opaque) in the plan") {
    import spark.implicits._
    val plus1 = udf((x: Long) => x + 1)
    val plan = Tables(spark, sf0001, "region")
      .select(plus1($"r_regionkey".cast("long")))
      .queryExecution.executedPlan.toString
    assert(plan.contains("UDF") || plan.contains("ScalaUDF"))
  }
}
