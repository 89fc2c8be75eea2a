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

  /** The trained-ANN oracle: the SAME unrolled two-iteration k-means
    * CTE as `l3_kmeans` (c2 = trained centroids), feeding the IVF CTE
    * from `l3_ann_ivf` — assignment = inverted lists, per-query top-2
    * probes, candidates from probed lists only, exact L2 rerank. */
  private val oSqlTrained = {
    val d = KMeansLloyd.oL2sq("e.emb", "c.cemb")
    val dp = KMeansLloyd.oL2sq("q.emb", "c.emb")
    s"""WITH e AS (
       |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
       |  FROM embeddings),
       |c0 AS (
       |  SELECT CAST(vec_id AS INT) AS cid, emb AS cemb FROM e WHERE vec_id < $K),
       |${oRound(1, "c0", "a1", "c1")},
       |${oRound(2, "c1", "a2", "c2")},
       |d3 AS (
       |  SELECT e.vec_id, c.cid, $d AS d FROM e, c2 c),
       |asg AS (
       |  SELECT vec_id, cid FROM (
       |    SELECT vec_id, cid,
       |      row_number() OVER (PARTITION BY vec_id ORDER BY d, cid) AS rn
       |    FROM d3) WHERE rn = 1),
       |probe AS (
       |  SELECT vec_id, cid FROM (
       |    SELECT vec_id, cid,
       |      row_number() OVER (PARTITION BY vec_id ORDER BY d, cid) AS rn
       |    FROM d3 WHERE vec_id < 10) WHERE rn <= 2),
       |cand AS (
       |  SELECT DISTINCT p.vec_id AS query_id, a.vec_id AS neighbor_id
       |  FROM probe p JOIN asg a ON a.cid = p.cid AND a.vec_id <> p.vec_id),
       |scored AS (
       |  SELECT query_id, neighbor_id, $dp AS d
       |  FROM cand
       |  JOIN e q ON q.vec_id = query_id
       |  JOIN e c ON c.vec_id = neighbor_id)
       |SELECT query_id, neighbor_id, ${Qh.oR6("d")} AS dist, rnk FROM (
       |  SELECT query_id, neighbor_id, d,
       |    row_number() OVER (PARTITION BY query_id ORDER BY d, neighbor_id) AS rnk
       |  FROM scored) WHERE rnk <= 3
       |ORDER BY query_id, rnk""".stripMargin
  }

  /** SemDeDup oracle: the SAME unrolled two-iteration k-means CTE as
    * `l3_kmeans` (so trained assignment is verified once, reused here),
    * then within-cluster pairwise cosine with the l2_cosine_neardup
    * determinism discipline (sequential-fold dot, per-pair rounding
    * before max). */
  private val oSqlSemDedup = {
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
       |  SELECT vec_id, cid FROM (
       |    SELECT vec_id, cid,
       |      row_number() OVER (PARTITION BY vec_id ORDER BY d, cid) AS rn
       |    FROM d3) WHERE rn = 1),
       |en AS (
       |  SELECT vec_id, embedding,
       |    sqrt(${Qh.oDot("embedding", "embedding")}) AS nrm
       |  FROM embeddings),
       |mx AS (
       |  SELECT b.vec_id,
       |    max(floor(${Qh.oDot("ea.embedding", "eb.embedding")}
       |      / (ea.nrm * eb.nrm) * 1000000 + 0.5) / 1000000.0) AS max_cos
       |  FROM a3 a JOIN a3 b ON a.cid = b.cid AND a.vec_id < b.vec_id
       |  JOIN en ea ON ea.vec_id = a.vec_id
       |  JOIN en eb ON eb.vec_id = b.vec_id
       |  GROUP BY b.vec_id)
       |SELECT a.vec_id, a.cid, mx.max_cos,
       |  coalesce(mx.max_cos >= 0.8, false) AS is_dup
       |FROM a3 a LEFT JOIN mx ON mx.vec_id = a.vec_id
       |ORDER BY a.vec_id""".stripMargin
  }

  /** PCA oracle: rebuild the exact integer Gram matrix relationally,
    * then replay the two power-iteration rounds as the same sequential
    * folds (list_reduce in index order = the engine's j-loop). v0 =
    * 0.125 = 1/√64, exact in binary on both engines. */
  private val oSqlPca: String = {
    val fold = (body: String) =>
      s"list_reduce(list_prepend(CAST(0 AS DOUBLE), $body), (a, b) -> a + b)"
    s"""WITH g AS (
       |  SELECT i.i AS i, j.j AS j,
       |    CAST(sum(CAST(floor(CAST(embedding[i.i+1] AS DOUBLE) * CAST(embedding[j.j+1] AS DOUBLE) * 1000000000000 + 0.5) AS BIGINT)) AS BIGINT) AS gij
       |  FROM embeddings, range(64) i(i), range(64) j(j)
       |  GROUP BY i.i, j.j),
       |gl AS (
       |  SELECT i, list(CAST(gij AS DOUBLE) ORDER BY j) AS grow FROM g GROUP BY i),
       |u1 AS (
       |  SELECT i, ${fold("list_transform(grow, x -> x * 0.125)")} AS u FROM gl),
       |n1 AS (
       |  SELECT sqrt(${fold("list_transform(ul, x -> x * x)")}) AS n
       |  FROM (SELECT list(u ORDER BY i) AS ul FROM u1)),
       |v1l AS (
       |  SELECT list(u / n1.n ORDER BY i) AS vl FROM u1, n1 GROUP BY n1.n),
       |u2 AS (
       |  SELECT i, ${fold("list_transform(range(64), j -> grow[j+1] * vl[j+1])")} AS u
       |  FROM gl, v1l),
       |n2 AS (
       |  SELECT sqrt(${fold("list_transform(ul, x -> x * x)")}) AS n
       |  FROM (SELECT list(u ORDER BY i) AS ul FROM u2))
       |SELECT u2.i AS dim,
       |  floor(u2.u / n2.n * 1000000 + 0.5) / 1000000.0 AS loading,
       |  floor(n2.n * 1000000 + 0.5) / 1000000.0 AS eigenvalue
       |FROM u2, n2
       |ORDER BY dim""".stripMargin
  }

  val decls: Seq[Decl] = Seq(
    Decl("l3_kmeans", oSql) { (s, dir) =>
      import s.implicits._
      val e = Qh.t(s, dir, "embeddings").select("vec_id", "embedding")
      val cents = KMeansLloyd.fit(e, KMeansLloyd.initByIds(e, K), Iters)
      KMeansLloyd.assign(e, cents)
        .select($"vec_id", $"cid", Qh.r6($"dist").as("dist"))
        .orderBy("vec_id")
    },

    // The ANN story composed end-to-end with NO stand-ins: train the
    // coarse quantizer (distributed Lloyd), write the corpus as a
    // hive-partitioned inverted-list index keyed by the TRAINED
    // assignment, then serve a query batch through partition-pruned
    // probes + exact L2 rerank. Train→index→serve is exactly the
    // production IVF lifecycle (FAISS train/add/search); every stage
    // here is the real operator — KMeansLloyd.fit, the s10 partitioned
    // layout, the pruned serve path.
    Decl("l3_ann_trained", oSqlTrained) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      import org.apache.spark.sql.types.{ArrayType, DoubleType}
      import s.implicits._
      val e = Qh.t(s, dir, "embeddings").select("vec_id", "embedding")
      // TRAIN: the real distributed Lloyd loop (same params as l3_kmeans)
      val cents = KMeansLloyd.fit(e, KMeansLloyd.initByIds(e, K), Iters)
      // BUILD: trained assignment → one parquet directory per list
      val path = Qh.ioDir("l3_trained_index")
      KMeansLloyd.assign(e, cents)
        .select($"vec_id", $"embedding", $"cid".as("list_id"))
        .write.mode("overwrite").partitionBy("list_id").parquet(path)
      // SERVE: per-query top-2 trained centroids — a NARROW map over
      // literal centroids (model params), no join
      val probeW = Window.partitionBy($"query_id").orderBy($"d", $"list_id")
      val centPairs = array(cents.map { case (cid, c) =>
        struct(lit(cid).as("cid"), KMeansLloyd.l2sq($"embedding", c).as("d"))
      }: _*)
      val probe = e.filter($"vec_id" < 10)
        .select($"vec_id".as("query_id"), explode(centPairs).as("p"))
        .select($"query_id", $"p.cid".as("list_id"), $"p.d".as("d"))
        .withColumn("rn", row_number().over(probeW))
        .filter($"rn" <= 2)
        .select($"query_id", $"list_id")
      // probe ids are nprobe·|queries| — bounded metadata, same serving
      // pattern as s10: collected so the index read gets a LITERAL
      // partition filter (pruning IS the list lookup)
      val probePairs = probe.collect().map(r => (r.getLong(0), r.getInt(1)))
      val probedLists = probePairs.map(_._2).distinct.sorted
      val index = s.read.parquet(path)
        .filter($"list_id".isin(probedLists: _*))
        .select($"vec_id".as("neighbor_id"), $"embedding".as("c_emb"), $"list_id")
      val probeDf = broadcast(s.createDataFrame(probePairs.toSeq)
        .toDF("query_id", "list_id"))
      val qe = e.filter($"vec_id" < 10)
        .select($"vec_id".as("query_id"), $"embedding".as("q_emb"))
      // exact L2 rerank within probed lists — same sequential fold as
      // the oracle (see KMeansLloyd.oL2sq)
      val l2pair = aggregate(
        zip_with(
          $"q_emb".cast(ArrayType(DoubleType)),
          $"c_emb".cast(ArrayType(DoubleType)),
          (x, y) => (x - y) * (x - y)),
        lit(0.0), (acc, t) => acc + t)
      val w = Window.partitionBy($"query_id").orderBy($"d", $"neighbor_id")
      index.join(probeDf, "list_id")
        .filter($"neighbor_id" =!= $"query_id")
        .select($"query_id", $"neighbor_id", $"c_emb").distinct()
        .join(broadcast(qe), "query_id")
        .select($"query_id", $"neighbor_id", l2pair.as("d"))
        .withColumn("rnk", row_number().over(w))
        .filter($"rnk" <= 3)
        .select($"query_id", $"neighbor_id", Qh.r6($"d").as("dist"), $"rnk")
        .orderBy("query_id", "rnk")
    },

    // L3s: SEMANTIC dedup — SemDeDup (Abbas et al. 2023,
    // arXiv:2303.09540): cluster the embedding space with the trained
    // coarse quantizer, then compare pairs ONLY within a cluster and
    // drop every vector that has a semantically-near smaller-id
    // neighbor (deterministic keep-min-id exemplar rule). This is the
    // missing rung between the exact near-dup tier (l2_cosine_neardup:
    // bounded blocking keys) and ANN (l3_ann_*: recall-traded): dup
    // candidates here come from LEARNED clusters, which track the data
    // distribution instead of a fixed quantizer grid. Scale story: k
    // grows with the corpus so cluster sizes stay bounded (the SemDeDup
    // paper runs k=50k over 5B embeddings) — pair volume is Σ cluster²,
    // never corpus²; training is the constant-shuffle KMeansLloyd loop,
    // assignment is a narrow map against literal centroids, and the
    // within-cluster self-join is an equi-join on cid (PlanSpec gates
    // no cartesian). Exactness discipline: same fold-identical dot +
    // per-pair r6 rounding as l2_cosine_neardup, max over rounded
    // values, so the hash compare is exact, no tolerance band.
    Decl("l3_semantic_dedup", oSqlSemDedup) { (s, dir) =>
      import s.implicits._
      val dot = (x: org.apache.spark.sql.Column, y: org.apache.spark.sql.Column) =>
        call_function("dot_product", x, y)
      val e = Qh.t(s, dir, "embeddings").select("vec_id", "embedding")
      // TRAIN + ASSIGN: the same distributed Lloyd loop as l3_kmeans
      val cents = KMeansLloyd.fit(e, KMeansLloyd.initByIds(e, K), Iters)
      val asg = Qh.materialize(
        KMeansLloyd.assign(e, cents).select($"vec_id", $"cid")
          .join(e.select($"vec_id", $"embedding",
            sqrt(dot($"embedding", $"embedding")).as("nrm")), "vec_id"))
      // within-cluster pairs only; per-vector max cosine to a SMALLER id
      val cos = Qh.r6(dot($"a.embedding", $"b.embedding") / ($"a.nrm" * $"b.nrm"))
      val mx = asg.as("a").join(asg.as("b"),
          $"a.cid" === $"b.cid" && $"a.vec_id" < $"b.vec_id")
        .select($"b.vec_id".as("vec_id"), cos.as("cos"))
        .groupBy($"vec_id").agg(max($"cos").as("max_cos"))
      asg.select($"vec_id", $"cid")
        .join(mx, Seq("vec_id"), "left")
        .select($"vec_id", $"cid", $"max_cos",
          coalesce($"max_cos" >= 0.8, lit(false)).as("is_dup"))
        .orderBy("vec_id")
    },

    // L3p: distributed PCA — top principal component of the embedding
    // Gram matrix by power iteration. The DISTRIBUTED part is the
    // one-pass exact Gram accumulation ([[graft.functions.GramAgg]]):
    // per-row outer products quantized to fixed-point BIGINTs (the
    // kmeans/w9 integer discipline applied to a matrix), merged
    // elementwise — a CONSTANT d²-long shuffle payload regardless of
    // corpus size, the covariance shape every distributed PCA uses.
    // The d×d result (4096 longs, bounded model state — the centroid-
    // collect pattern) is eigen-solved driver-side: two power-iteration
    // rounds from v0 = 1/√64 (exact in binary), every fold sequential
    // in index order so the oracle replays bit-identical arithmetic
    // (same discipline as KMeansLloyd's unrolled rounds). Output: the
    // 64 loadings of v₂ plus the |G·v₁| eigenvalue estimate, r6.
    // Whitening/variance diagnostics are the standard preprocessing
    // step before semantic dedup and ANN at corpus scale.
    Decl("l3_pca_power", oSqlPca) { (s, dir) =>
      import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
      import s.implicits._
      val d = graft.functions.GramAgg.Dim
      val gramAgg = udaf(graft.functions.GramAgg.agg,
        ExpressionEncoder[Array[Float]]())
      // bounded model-state collect: d² = 4096 longs
      val g = Qh.t(s, dir, "embeddings")
        .agg(gramAgg($"embedding").as("g"))
        .collect()(0).getSeq[Long](0).toArray
      def gRow(i: Int)(j: Int): Double = g(i * d + j).toDouble
      // power iteration — sequential folds mirrored in the oracle text
      val u1 = Array.tabulate(d) { i =>
        var acc = 0.0; var j = 0
        while (j < d) { acc += gRow(i)(j) * 0.125; j += 1 }; acc
      }
      val n1 = math.sqrt { var a = 0.0; var i = 0
        while (i < d) { a += u1(i) * u1(i); i += 1 }; a }
      val v1 = u1.map(_ / n1)
      val u2 = Array.tabulate(d) { i =>
        var acc = 0.0; var j = 0
        while (j < d) { acc += gRow(i)(j) * v1(j); j += 1 }; acc
      }
      val n2 = math.sqrt { var a = 0.0; var i = 0
        while (i < d) { a += u2(i) * u2(i); i += 1 }; a }
      def r6(x: Double): Double = math.floor(x * 1000000 + 0.5) / 1000000.0
      s.createDataFrame(
          (0 until d).map(i => (i.toLong, r6(u2(i) / n2), r6(n2))))
        .toDF("dim", "loading", "eigenvalue")
        .orderBy("dim")
    }
  )
}
