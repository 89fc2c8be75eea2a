package graft

import graft.queries.Similarity

/** ANN quality gates that a SQL oracle can't express: recall of the
  * LSH-bucketed path against the brute-force baseline. */
class SimilaritySpec extends SparkSpec {

  test("LSH ANN recall@3 vs brute force is well above random") {
    import spark.implicits._
    val brute = Similarity.bruteTopK(spark, sf001, 50, 3)
      .as[(Long, Long)].collect().toSet
    val ann = Similarity.decls.find(_.name == "l3_ann_lsh").get
      .build(spark, sf001)
      .select("query_id", "neighbor_id")
      .as[(Long, Long)].collect().toSet
    val hits = (ann & brute).size.toDouble
    val recall = hits / brute.size
    // 16 tables × 6 bits measured ≈ 0.6 recall on the fixture (i.i.d.
    // random vectors — LSH's worst case; clustered real embeddings do
    // better). Floor set conservatively below the measured value.
    assert(recall >= 0.40, f"ANN recall@3 = $recall%.3f — below floor")
    info(f"ANN recall@3 = $recall%.3f (${ann.size} ANN pairs, ${brute.size} brute pairs)")
  }

  test("hyperplanes are deterministic and balanced") {
    val p = Similarity.planes
    assert(p.size == Similarity.NTables * Similarity.NBits &&
      p.forall(_.size == Similarity.Dim))
    assert(p.flatten.forall(v => v == 1 || v == -1))
    // regenerating yields the same matrix (md5 is stable)
    assert(p == Similarity.planes)
    // no degenerate all-same plane
    assert(p.forall(row => row.toSet.size == 2))
  }
}
