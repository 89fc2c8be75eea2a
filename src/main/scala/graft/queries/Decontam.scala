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
    }
  )
}
