package graft

import graft.queries.Multimodal

/** The mapPartitions decode path (stubbed codec, real plumbing). */
class MultimodalSpec extends SparkSpec {

  test("decode produces one feature row per media row, deterministic") {
    val a = Multimodal.decodeFeatures(spark, sf0001).collect()
    val b = Multimodal.decodeFeatures(spark, sf0001).collect()
    assert(a.length == Tables(spark, sf0001, "documents").count())
    assert(a.map(_.getLong(0)).sorted.sameElements(b.map(_.getLong(0)).sorted))
  }

  test("feature vectors have fixed width and normalized mass") {
    import spark.implicits._
    val feats = Multimodal.decodeFeatures(spark, sf0001)
      .select($"doc_id", $"feature", $"n_bytes").as[(Long, Seq[Float], Int)]
      .collect()
    assert(feats.forall(_._2.size == 8), "feature width must be 8")
    // histogram mass: sum(feature) * n_bytes == n_bytes (all bytes binned)
    feats.foreach { case (id, f, n) =>
      val mass = f.map(_.toDouble).sum * math.max(1, n)
      assert(math.abs(mass - n) < 1e-3, s"doc $id: histogram mass $mass != $n")
    }
  }

  test("binary payload survives the relational pipeline opaquely") {
    import spark.implicits._
    // filter + project + repartition must not disturb payload bytes
    val m = Multimodal.mediaTable(spark, sf0001)
    val before = m.select($"doc_id", $"payload").as[(Long, Array[Byte])]
      .collect().toMap
    val after = m.repartition(7)
      .filter($"channels" === 3)
      .select($"doc_id", $"payload").as[(Long, Array[Byte])]
      .collect().toMap
    assert(after.size == before.size)
    assert(after.forall { case (k, v) => java.util.Arrays.equals(v, before(k)) })
  }
}
