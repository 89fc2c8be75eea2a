package graft

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.functions.{col, udaf}
import org.scalatest.funsuite.AnyFunSuite

/** Properties of the exact Gram accumulation the decl's oracle can't
  * isolate: the fixed-point quantization must make the aggregate
  * immune to partitioning (shuffle order), and the matrix must be
  * exactly symmetric (e_i·e_j and e_j·e_i quantize identically). */
class GramAggSpec extends AnyFunSuite with SparkSpec {

  private val d = graft.functions.GramAgg.Dim

  private def gram(nPartitions: Int): Array[Long] = {
    val gramAgg = udaf(graft.functions.GramAgg.agg,
      ExpressionEncoder[Array[Float]]())
    graft.queries.Qh.t(spark, "/root/testdata/sf0.001", "embeddings")
      .repartition(nPartitions)
      .agg(gramAgg(col("embedding")).as("g"))
      .collect()(0).getSeq[Long](0).toArray
  }

  test("the Gram matrix is partitioning-invariant — integer partials, exact merge") {
    val g1 = gram(1)
    val g8 = gram(8)
    assert(g1.sameElements(g8),
      "Gram accumulation must not depend on partitioning or merge order")
  }

  test("the Gram matrix is exactly symmetric") {
    val g = gram(4)
    for (i <- 0 until d; j <- 0 until i)
      assert(g(i * d + j) == g(j * d + i), s"asymmetry at ($i,$j)")
  }

  test("diagonal cells are positive — embeddings are non-degenerate") {
    val g = gram(2)
    assert((0 until d).forall(i => g(i * d + i) > 0))
  }
}
