package graft

import graft.queries.Qh
import org.apache.spark.storage.StorageLevel

/** Qh.materialize mode contract: the durability mode is a config, and
  * every mode returns the same rows. `disk` is the long-cluster-run mode
  * (persist(DISK_ONLY) keeps lineage, so a lost executor recomputes
  * instead of failing the job — unlike localCheckpoint, whose blocks
  * die with their executor). */
class MaterializeSpec extends SparkSpec {

  private def withMode[A](mode: String)(body: => A): A = {
    spark.conf.set("spark.graft.materialize", mode)
    try body
    finally spark.conf.unset("spark.graft.materialize")
  }

  test("disk mode persists DISK_ONLY, keeps lineage, same rows as local") {
    val base = Tables(spark, sf0001, "documents").select("doc_id", "lang")
    val local = Qh.materialize(base).collect().toSet
    val disk = withMode("disk") {
      val d = Qh.materialize(base)
      assert(d.storageLevel == StorageLevel.DISK_ONLY,
        s"expected DISK_ONLY, got ${d.storageLevel}")
      val rows = d.collect().toSet
      d.unpersist()
      rows
    }
    assert(disk == local)
  }

  test("an LSH decl stays hash-identical under disk materialization") {
    val name = "l2_lsh_pairs"
    val q = graft.SparkEntry.queries(name)
    val local = q(spark, sf0001).collect().toSeq
    val disk = withMode("disk")(q(spark, sf0001).collect().toSeq)
    assert(disk == local, s"$name differs between materialize modes")
  }

  test("checkpoint mode truncates lineage and returns the same rows") {
    val base = Tables(spark, sf0001, "documents").select("doc_id", "source")
    val expected = base.collect().toSet
    val got = withMode("checkpoint")(Qh.materialize(base).collect().toSet)
    assert(got == expected)
  }
}
