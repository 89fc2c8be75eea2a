package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType
import graft.queries.Qh

/** L15 — leakage-safe split, integrated with the REAL near-dup
  * clusters: assigning by the minhash-LSH cluster label (the
  * l2_dedup_clusters output) guarantees no near-duplicate PAIR
  * straddles the train/eval boundary, while the naive row-level split
  * provably leaks on the same corpus. The decl's oracle pins the
  * exact-cluster counts; this spec pins the structural property on
  * the LSH clusters the pipeline actually produces. */
class ClusterSplitSpec extends SparkSpec {
  import spark.implicits._

  test("no LSH near-dup pair straddles the cluster-aware split; the naive split leaks") {
    val dir = sf001
    val labels = SparkEntry.queries("l2_dedup_clusters")(spark, dir)
      .select(col("doc_id"), col("component").as("cluster_id"))
    val split = labels
      .withColumn("split",
        when(Qh.phash($"cluster_id".cast(StringType), 17) % 10 <= 7, "train")
          .otherwise("eval"))
      .withColumn("naive",
        when(Qh.phash($"doc_id".cast(StringType), 17) % 10 <= 7, "train")
          .otherwise("eval"))
    val perCluster = split.groupBy($"cluster_id")
      .agg(countDistinct($"split").as("ns"),
        countDistinct($"naive").as("nn"),
        count(lit(1)).as("n"))
      .collect()
    assert(perCluster.forall(_.getLong(1) == 1L),
      "a cluster straddles the cluster-aware split")
    // the corpus really holds multi-doc near-dup clusters, and the
    // naive row split really leaks on them — otherwise this test
    // proves nothing
    val multi = perCluster.filter(_.getLong(3) > 1L)
    assert(multi.length > 5, s"fixture premise: ${multi.length} multi-doc clusters")
    assert(multi.exists(_.getLong(2) > 1L),
      "fixture premise: the naive split should straddle some cluster")
  }
}
