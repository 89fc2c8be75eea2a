package graft

import org.apache.spark.sql.functions._

/** The native codegen expressions must be bit-identical to the
  * higher-order-function folds they replaced (same left-to-right double
  * accumulation) in BOTH execution paths (codegen and interpreted). */
class CosineSimSpec extends SparkSpec {

  private def hofDot = {
    import spark.implicits._
    (x: org.apache.spark.sql.Column, y: org.apache.spark.sql.Column) =>
      aggregate(zip_with(x, y, (a, b) => a.cast("double") * b.cast("double")),
        lit(0.0), (acc, v) => acc + v)
  }

  test("the extensions path exposes the full native-function surface") {
    val names = graft.functions.GraftFunctions.all.map(_._1).toSet
    assert(names == Set(
      "cosine_sim", "dot_product", "l2_sq", "l2_sq_at", "bin_word32",
      "intersect_count", // r16: the L2 pair-verify set-intersection count
      "md5_prefix32", "md5_words32", "bloom_filter_agg", "bloom_might_contain"))
    // builders resolve (spot-check arity wiring)
    val lit = org.apache.spark.sql.catalyst.expressions.Literal(1)
    val byName = graft.functions.GraftFunctions.all.toMap
    assert(byName("bin_word32")(Seq(lit, lit)).isInstanceOf[graft.functions.BinWord32])
    assert(byName("md5_prefix32")(Seq(lit, lit)).isInstanceOf[graft.functions.Md5Prefix32])
  }

  test("cosine_sim == HOF fold cosine, bit for bit") {
    import spark.implicits._
    val e = Tables(spark, sf0001, "embeddings").limit(100)
    val q = Tables(spark, sf0001, "embeddings").limit(100)
      .select($"vec_id".as("qid"), $"embedding".as("q_emb"))
    val d = hofDot
    val joined = e.join(q, $"vec_id" =!= $"qid")
    val bad = joined.select(
        call_function("cosine_sim", $"embedding", $"q_emb").as("native"),
        (d($"embedding", $"q_emb") /
          (sqrt(d($"embedding", $"embedding")) * sqrt(d($"q_emb", $"q_emb"))))
          .as("hof"))
      .filter($"native" =!= $"hof")
    assert(bad.count() == 0, "native cosine diverges from HOF fold")
  }

  test("l2_sq == HOF fold of squared diffs; l2_sq_at == slice form, bit for bit") {
    import spark.implicits._
    val e = Tables(spark, sf0001, "embeddings").limit(100)
    val q = Tables(spark, sf0001, "embeddings").limit(100)
      .select($"vec_id".as("qid"), $"embedding".as("q_emb"))
    val joined = e.join(q, $"vec_id" =!= $"qid")
    val hofL2 = aggregate(
      zip_with($"embedding", $"q_emb",
        (a, b) => (a.cast("double") - b.cast("double")) * (a.cast("double") - b.cast("double"))),
      lit(0.0), (acc, v) => acc + v)
    val badL2 = joined.select(
        call_function("l2_sq", $"embedding", $"q_emb").as("native"),
        hofL2.as("hof"))
      .filter($"native" =!= $"hof")
    assert(badL2.count() == 0, "l2_sq diverges from HOF fold")
    // l2_sq_at(x, y8, off) must equal l2_sq(slice(x, off+1, 8), y8) at
    // every subvector offset
    for (m <- 0 until 8) {
      val sub = slice($"q_emb", m * 8 + 1, 8)
      val bad = joined.select(
          call_function("l2_sq_at", $"embedding", sub, lit(m * 8)).as("at"),
          call_function("l2_sq", slice($"embedding", m * 8 + 1, 8), sub).as("sliced"))
        .filter($"at" =!= $"sliced")
      assert(bad.count() == 0, s"l2_sq_at diverges at offset ${m * 8}")
    }
  }

  test("dot_product == HOF fold, codegen and interpreted paths agree") {
    import spark.implicits._
    val e = Tables(spark, sf0001, "embeddings").limit(50)
    val d = hofDot
    def mismatches(): Long = e.select(
        call_function("dot_product", $"embedding", $"embedding").as("native"),
        d($"embedding", $"embedding").as("hof"))
      .filter($"native" =!= $"hof").count()
    assert(mismatches() == 0)
    val key = "spark.sql.codegen.wholeStage"
    val old = spark.conf.get(key)
    try {
      spark.conf.set(key, "false")
      assert(mismatches() == 0, "interpreted path diverges")
    } finally spark.conf.set(key, old)
  }

  test("cosine_sim rejects non-float-array inputs at analysis time") {
    import spark.implicits._
    val df = Seq((Seq(1, 2), Seq(3, 4))).toDF("a", "b")
    val ex = intercept[Exception] {
      df.select(call_function("cosine_sim", $"a", $"b")).collect()
    }
    assert(ex.getMessage.toLowerCase.contains("array<float>") ||
      ex.getMessage.toLowerCase.contains("cosine_sim"))
  }
}
