package graft

import graft.functions.MinHashAgg
import org.apache.spark.sql.functions._

/** The typed Aggregator must reproduce the expression-based minhash
  * signatures exactly (same hashes, one-pass buffer instead of 8
  * array_min scans). */
class MinHashAggSpec extends SparkSpec {

  test("Aggregator minhash == expression minhash on sf0.001") {
    import spark.implicits._

    // per (doc, shingle): the 8 md5-slice hash values, via the same SQL
    // expressions the decl uses
    val slices = (0 until 8).map(i =>
      expr(s"cast(conv(substring(md5(concat(sh, '#${i / 4}')), ${1 + 8 * (i % 4)}, 8), 16, 10) as bigint)"))
    val perShingle = Tables(spark, sf0001, "documents")
      .withColumn("toks", expr(graft.queries.Qh.toksExpr))
      .filter(size($"toks") >= 3)
      .withColumn("shingles",
        expr("""array_distinct(transform(sequence(0, size(toks) - 3),
               |  i -> concat(element_at(toks, i + 1), ' ', element_at(toks, i + 2), ' ', element_at(toks, i + 3))))""".stripMargin))
      .select($"doc_id", explode($"shingles").as("sh"))
      .select($"doc_id", array(slices: _*).as("s"))

    val viaAgg = perShingle.as[(Long, Array[Long])]
      .groupByKey(_._1)
      .mapValues(r => MinHashAgg.ShingleHashes(r._2))
      .agg(MinHashAgg.agg.toColumn)
      .toDF("doc_id", "sig")
      .select($"doc_id" +: (0 until 8).map(i => element_at($"sig", i + 1).as(s"sig$i")): _*)

    val viaExpr = SparkEntry.queries("l2_minhash_sigs")(spark, sf0001)

    assert(viaAgg.count() == viaExpr.count())
    val diff = viaAgg.except(viaExpr).count() + viaExpr.except(viaAgg).count()
    assert(diff == 0, s"$diff signature rows differ between Aggregator and expressions")
  }
}
