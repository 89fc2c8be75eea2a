package graft.queries

import org.apache.spark.sql.functions._

/** SURVEY §2.B L11 — train/eval DECONTAMINATION: flag training
  * documents that share any token n-gram with a held-out eval
  * set, the standard benchmark-leakage scrub (the n-gram-overlap
  * method described in the GPT-3 appendix — Brown et al. 2020 — and
  * the PaLM/Llama data cards; 4-grams here, matched to the fixture's
  * short high-entropy synthetic docs so real overlap exists to flag,
  * where published pipelines over natural text use 8–13).
  *
  * Scale shape: each side maps to distinct hashed n-grams (narrow —
  * grams are 32-bit portable hashes, not strings, so the exploded
  * rows are 16 bytes not ~60), then one inverted-index equi-join on
  * the gram hash. The eval side is tiny by construction (it's a
  * benchmark), so at 100 TB the join broadcasts the eval gram set and
  * the whole scrub is ONE narrow pass over the training corpus — no
  * shuffle touches the big side. Exactly the LSH-candidate discipline:
  * never all-pairs, block on equality of a derived key.
  */
object Decontam {

  private val N = 4 // gram length in tokens

  /** Exploded (doc_id, gram-hash) rows for docs matching `docFilter`.
    * Grams are hashed in-place by the native md5_prefix32 (the portable
    * hash contract) — the string gram never leaves the projection. */
  private def grams(df: org.apache.spark.sql.DataFrame) =
    df.withColumn("toks", expr(Qh.toksExpr))
      .filter(size(col("toks")) >= N)
      .select(col("doc_id"), explode(expr(
        s"""array_distinct(transform(sequence(0, size(toks) - $N),
           |  i -> md5_prefix32(array_join(slice(toks, i + 1, $N), ' '), 0)))""".stripMargin))
        .as("g"))

  private val oGrams =
    s"""SELECT doc_id, unnest(gs) AS g FROM (
       |  SELECT doc_id,
       |    list_distinct(list_transform(range(len(toks) - ${N - 1}),
       |      i -> CAST(concat('0x', substr(md5(concat(array_to_string(toks[i+1:i+$N], ' '), '#0')), 1, 8)) AS BIGINT))) AS gs
       |  FROM (SELECT doc_id, ${Qh.oToksExpr} AS toks FROM documents)
       |  WHERE len(toks) >= $N)""".stripMargin

  val decls: Seq[Decl] = Seq(

    // Contaminated-training-doc report: which train docs (doc_id >= 25)
    // overlap the eval set (doc_id < 25), how many distinct 4-grams
    // leak, and into how many eval docs.
    Decl(
      "l11_decontam",
      s"""WITH g AS ($oGrams),
         |tr AS (SELECT doc_id, g FROM g WHERE doc_id >= 25),
         |ev AS (SELECT doc_id, g FROM g WHERE doc_id < 25)
         |SELECT tr.doc_id AS train_doc,
         |  count(DISTINCT tr.g) AS n_shared_grams,
         |  count(DISTINCT ev.doc_id) AS n_eval_docs
         |FROM tr JOIN ev ON tr.g = ev.g
         |GROUP BY tr.doc_id
         |ORDER BY train_doc""".stripMargin) { (s, dir) =>
      import s.implicits._
      val g = grams(Qh.t(s, dir, "documents"))
      val tr = g.filter($"doc_id" >= 25)
        .select($"doc_id".as("train_doc"), $"g")
      val ev = g.filter($"doc_id" < 25)
        .select($"doc_id".as("eval_doc"), $"g")
      // eval side is the benchmark — broadcast it; the train side never
      // shuffles. The two distinct counts are computed in ONE pass with
      // no Expand (the default dual-countDistinct plan doubles every
      // joined row): the joined (train_doc, g, eval_doc) stream is
      // already distinct (grams are array_distinct'd per doc on both
      // sides), so per (train_doc, g) we fold the eval docs into a
      // bounded set (≤ |eval benchmark| ids), then per train_doc count
      // the gram groups and union the sets. Both shuffles are map-side
      // combined; shuffle payload is grams + tiny id-sets, not 2× the
      // hit stream.
      tr.join(broadcast(ev), "g")
        .groupBy($"train_doc", $"g")
        .agg(collect_set($"eval_doc").as("evs"))
        .groupBy($"train_doc")
        .agg(
          count(lit(1)).as("n_shared_grams"),
          size(array_distinct(flatten(collect_list($"evs"))))
            .cast("long").as("n_eval_docs"))
        .orderBy("train_doc")
    },

    // L11b: SEMANTIC decontamination (r7) — the embedding-space
    // complement of the n-gram scrub: paraphrased or lightly-rewritten
    // benchmark items share no n-grams but sit next to the eval point
    // in embedding space. For every eval vector (vec_id % 10 = 0
    // stands in for the benchmark) find its TOP-1 training neighbor
    // within the same label block (the coarse-quantizer blocking of
    // l2_cosine_neardup — never all-pairs) and report the match plus
    // the scrub verdict at the production 0.9 threshold. Deterministic
    // top-1: row_number over (cos DESC, train_vec) — no max_by tie
    // ambiguity. At 100 TB: a label-blocked equi-join (eval side tiny
    // → broadcast) + a per-eval-key window over bounded candidates.
    Decl(
      "l11_semantic_decontam",
      s"""WITH e AS (
         |  SELECT vec_id, label, embedding,
         |    sqrt(${Qh.oDot("embedding", "embedding")}) AS nrm
         |  FROM embeddings),
         |p AS (
         |  SELECT a.vec_id AS eval_vec, b.vec_id AS train_vec,
         |    ${Qh.oDot("a.embedding", "b.embedding")} / (a.nrm * b.nrm) AS cos
         |  FROM e a JOIN e b
         |    ON a.label = b.label
         |   AND a.vec_id % 10 = 0 AND b.vec_id % 10 <> 0),
         |r AS (
         |  SELECT eval_vec, train_vec, cos,
         |    row_number() OVER (
         |      PARTITION BY eval_vec ORDER BY cos DESC, train_vec) AS rn
         |  FROM p)
         |SELECT eval_vec, train_vec AS nearest_train,
         |  ${Qh.oR6("cos")} AS best_cos,
         |  cos >= 0.9 AS contaminated
         |FROM r WHERE rn = 1
         |ORDER BY eval_vec""".stripMargin) { (s, dir) =>
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val dot = (x: org.apache.spark.sql.Column, y: org.apache.spark.sql.Column) =>
        call_function("dot_product", x, y)
      val e = Qh.t(s, dir, "embeddings")
        .select($"vec_id", $"label", $"embedding",
          sqrt(dot($"embedding", $"embedding")).as("nrm"))
      val ev = e.filter($"vec_id" % 10 === 0)
        .select($"vec_id".as("eval_vec"), $"label",
          $"embedding".as("e_emb"), $"nrm".as("e_nrm"))
      val tr = e.filter($"vec_id" % 10 =!= 0)
        .select($"vec_id".as("train_vec"), $"label",
          $"embedding".as("t_emb"), $"nrm".as("t_nrm"))
      val w = Window.partitionBy($"eval_vec")
        .orderBy($"cos".desc, $"train_vec")
      broadcast(ev).join(tr, "label")
        .select($"eval_vec", $"train_vec",
          (dot($"e_emb", $"t_emb") / ($"e_nrm" * $"t_nrm")).as("cos"))
        .withColumn("rn", row_number().over(w))
        .filter($"rn" === 1)
        .select($"eval_vec", $"train_vec".as("nearest_train"),
          Qh.r6($"cos").as("best_cos"),
          ($"cos" >= 0.9).as("contaminated"))
        .orderBy("eval_vec")
    }
  )
}
