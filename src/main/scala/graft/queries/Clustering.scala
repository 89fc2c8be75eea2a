package graft.queries

import graft.operators.KMeansLloyd
import org.apache.spark.sql.functions._

/** SURVEY §2.B L3 (training side): distributed k-means — the coarse
  * quantizer trainer behind the IVF family. `l3_ann_ivf`/`l3_ann_ivfpq`
  * use deterministic stand-in centroids so their candidate-generation
  * oracles stay closed-form; this decl exercises the REAL training
  * loop ([[graft.operators.KMeansLloyd]]) end-to-end with an unrolled
  * DuckDB oracle — two full Lloyd iterations, each verified exactly
  * (fixed-point means, fold-identical distances, no tolerance band).
  */
object Clustering {

  private val K = 8
  private val Iters = 2
  private val Dim = 64

  /** One unrolled iteration: assignment to `cin` then fixed-point means
    * → `cout`. The mean is `sum(round_half_up(v·1e6)) / n / 1e6` with
    * the division order stated — integer sums are shuffle-order-proof,
    * and both engines run the identical double divisions. */
  private def oRound(n: Int, cin: String, aout: String, cout: String): String = {
    val d = KMeansLloyd.oL2sq("e.emb", "c.cemb")
    s"""d$n AS (
       |  SELECT e.vec_id, c.cid, $d AS d FROM e, $cin c),
       |$aout AS (
       |  SELECT vec_id, cid, d FROM (
       |    SELECT vec_id, cid, d,
       |      row_number() OVER (PARTITION BY vec_id ORDER BY d, cid) AS rn
       |    FROM d$n) WHERE rn = 1),
       |x$n AS (
       |  SELECT a.cid, t.i,
       |    CAST(floor(e.emb[t.i+1] * 1000000.0 + 0.5) AS BIGINT) AS s
       |  FROM $aout a JOIN e USING (vec_id), range($Dim) t(i)),
       |$cout AS (
       |  SELECT cid, list(mv ORDER BY i) AS cemb FROM (
       |    SELECT cid, i,
       |      (CAST(sum(s) AS DOUBLE) / CAST(count(*) AS DOUBLE)) / 1000000.0 AS mv
       |    FROM x$n GROUP BY cid, i) GROUP BY cid)""".stripMargin
  }

  private val oSql = {
    val d = KMeansLloyd.oL2sq("e.emb", "c.cemb")
    s"""WITH e AS (
       |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
       |  FROM embeddings),
       |c0 AS (
       |  SELECT CAST(vec_id AS INT) AS cid, emb AS cemb FROM e WHERE vec_id < $K),
       |${oRound(1, "c0", "a1", "c1")},
       |${oRound(2, "c1", "a2", "c2")},
       |d3 AS (
       |  SELECT e.vec_id, c.cid, $d AS d FROM e, c2 c),
       |a3 AS (
       |  SELECT vec_id, cid, d FROM (
       |    SELECT vec_id, cid, d,
       |      row_number() OVER (PARTITION BY vec_id ORDER BY d, cid) AS rn
       |    FROM d3) WHERE rn = 1)
       |SELECT vec_id, cid, ${Qh.oR6("d")} AS dist FROM a3
       |ORDER BY vec_id""".stripMargin
  }

  val decls: Seq[Decl] = Seq(
    Decl("l3_kmeans", oSql) { (s, dir) =>
      import s.implicits._
      val e = Qh.t(s, dir, "embeddings").select("vec_id", "embedding")
      val cents = KMeansLloyd.fit(e, KMeansLloyd.initByIds(e, K), Iters)
      KMeansLloyd.assign(e, cents)
        .select($"vec_id", $"cid", Qh.r6($"dist").as("dist"))
        .orderBy("vec_id")
    }
  )
}
