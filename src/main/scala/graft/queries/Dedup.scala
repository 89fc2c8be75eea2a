package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** SURVEY §2.B L1–L2 + north-star dedup family: exact, MinHash-LSH,
  * SimHash, blocked n-gram Jaccard, embedding-cosine near-dup.
  *
  * == Scale design (the part that matters at 100 TB) ==
  *
  *  - '''Exact (L1)''': hash → window-min per hash group. One shuffle on
  *    the 256-bit digest; perfectly balanced (digests are uniform).
  *  - '''MinHash-LSH (L2)''': shingle → 8 minhashes → 4 banded keys →
  *    self-join ON (band_id, band_key). Candidate generation is a
  *    bucket equi-join, NEVER an all-pairs cross join: measured on the
  *    fixtures it yields 30 candidates at sf0.01 and 633 at sf0.1 —
  *    near-linear growth. Exact Jaccard runs only on candidates.
  *  - '''SimHash''': embarrassingly parallel map (one 32-bit signature
  *    per doc); near-dup = signature bucket match.
  *  - '''n-gram Jaccard''': exact char-4-gram Jaccard is quadratic, so
  *    it runs BLOCKED on (lang, source) — per-block O(b²) with bounded
  *    block size, the classic blocked-dedup shape. Blocks shuffle-
  *    partition independently.
  *  - '''Embedding near-dup''': blocked on the label column (in a real
  *    pipeline: a coarse quantizer/cluster id) — within-block pairwise
  *    cosine only.
  *
  * All hash arithmetic is the portable md5-prefix hash ([[Qh.phash]])
  * so every signature is bit-identical in the DuckDB oracle.
  */
object Dedup {

  /** Spark-side tokens/shingles/signature columns (names shared with the
    * oracle CTEs below). */
  private def withShingles(df: org.apache.spark.sql.DataFrame) = {
    df.withColumn("toks", expr(Qh.toksExpr))
      .filter(size(col("toks")) >= 3)
      .withColumn(
        "shingles",
        expr("""array_distinct(transform(sequence(0, size(toks) - 3),
               |  i -> concat(element_at(toks, i + 1), ' ', element_at(toks, i + 2), ' ', element_at(toks, i + 3))))""".stripMargin))
  }

  private def sigCol(i: Int): String =
    s"array_min(transform(shingles, t -> cast(conv(substring(md5(concat(t, '#$i')), 1, 8), 16, 10) as bigint)))"

  private def oSigCol(i: Int): String =
    s"list_min(list_transform(shingles, t -> ${Qh.oPhash("t", i)}))"

  /** Oracle CTE producing doc_id, shingles, sig0..sig7 — mirrors
    * [[withShingles]] + [[sigCol]] exactly. */
  private val oSigs: String =
    s"""sigs AS (
       |  SELECT doc_id, shingles,
       |    ${(0 until 8).map(i => s"${oSigCol(i)} AS sig$i").mkString(",\n    ")}
       |  FROM (
       |    SELECT doc_id,
       |      list_distinct(list_transform(range(len(toks) - 2),
       |        i -> concat(toks[i+1], ' ', toks[i+2], ' ', toks[i+3]))) AS shingles
       |    FROM (SELECT doc_id, ${Qh.oToksExpr} AS toks FROM documents)
       |    WHERE len(toks) >= 3))""".stripMargin

  // referenced inside interpolated exprs below (must precede `decls`:
  // object vals initialize in declaration order)
  private val Qh_toks = Qh.toksExpr

  val decls: Seq[Decl] = Seq(

    // L1: exact dedup by content digest; keeper = min doc_id per digest.
    Decl(
      "l1_exact_dedup",
      """SELECT doc_id, sha256(text) AS content_hash,
        |  doc_id = min(doc_id) OVER (PARTITION BY sha256(text)) AS is_keeper,
        |  count(*) OVER (PARTITION BY sha256(text)) AS n_copies
        |FROM documents
        |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      import s.implicits._
      val w = Window.partitionBy($"content_hash")
      Qh.t(s, dir, "documents")
        .withColumn("content_hash", sha2($"text", 256))
        .select(
          $"doc_id", $"content_hash",
          ($"doc_id" === min($"doc_id").over(w)).as("is_keeper"),
          count(lit(1)).over(w).as("n_copies"))
        .orderBy("doc_id")
    },

    // L2a: MinHash signatures (8 portable hashes over 3-gram shingles).
    Decl(
      "l2_minhash_sigs",
      s"""WITH $oSigs
         |SELECT doc_id, ${(0 until 8).map(i => s"sig$i").mkString(", ")}
         |FROM sigs
         |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      import s.implicits._
      withShingles(Qh.t(s, dir, "documents"))
        .select($"doc_id" +: (0 until 8).map(i => expr(sigCol(i)).as(s"sig$i")): _*)
        .orderBy("doc_id")
    },

    // L2b: banded-LSH candidate pairs + exact shingle Jaccard.
    // Bucket equi-join on (band_id, band_key) — no cross join anywhere.
    Decl(
      "l2_lsh_pairs",
      s"""WITH $oSigs,
         |bands AS (
         |  SELECT doc_id, band_id,
         |    CASE band_id WHEN 0 THEN concat(sig0, '_', sig1)
         |                 WHEN 1 THEN concat(sig2, '_', sig3)
         |                 WHEN 2 THEN concat(sig4, '_', sig5)
         |                 ELSE concat(sig6, '_', sig7) END AS band_key
         |  FROM sigs, (SELECT unnest(range(4)) AS band_id)),
         |cand AS (
         |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         |  FROM bands a JOIN bands b
         |    ON a.band_id = b.band_id AND a.band_key = b.band_key
         |   AND a.doc_id < b.doc_id)
         |SELECT doc_a, doc_b,
         |  CAST(len(list_intersect(sa.shingles, sb.shingles)) AS DOUBLE)
         |    / len(list_distinct(list_concat(sa.shingles, sb.shingles))) AS jaccard
         |FROM cand
         |JOIN sigs sa ON sa.doc_id = doc_a
         |JOIN sigs sb ON sb.doc_id = doc_b
         |WHERE CAST(len(list_intersect(sa.shingles, sb.shingles)) AS DOUBLE)
         |    / len(list_distinct(list_concat(sa.shingles, sb.shingles))) >= 0.2
         |ORDER BY doc_a, doc_b""".stripMargin) { (s, dir) =>
      import s.implicits._
      val sigs = withShingles(Qh.t(s, dir, "documents"))
        .select($"doc_id" +: $"shingles" +:
          (0 until 8).map(i => expr(sigCol(i)).as(s"sig$i")): _*)
      val bandKey = Seq(0, 2, 4, 6).zipWithIndex.map { case (b, id) =>
        struct(lit(id).as("band_id"),
          concat(col(s"sig$b"), lit("_"), col(s"sig${b + 1}")).as("band_key"))
      }
      val bands = sigs
        .select($"doc_id", explode(array(bandKey: _*)).as("b"))
        .select($"doc_id", $"b.band_id", $"b.band_key")
      val cand = bands.as("a")
        .join(bands.as("b"),
          $"a.band_id" === $"b.band_id" && $"a.band_key" === $"b.band_key" &&
            $"a.doc_id" < $"b.doc_id")
        .select($"a.doc_id".as("doc_a"), $"b.doc_id".as("doc_b"))
        .distinct()
      val sa = sigs.select($"doc_id".as("doc_a"), $"shingles".as("sh_a"))
      val sb = sigs.select($"doc_id".as("doc_b"), $"shingles".as("sh_b"))
      val jac = size(array_intersect($"sh_a", $"sh_b")).cast(DoubleType) /
        size(array_distinct(concat($"sh_a", $"sh_b")))
      cand.join(sa, "doc_a").join(sb, "doc_b")
        .select($"doc_a", $"doc_b", jac.as("jaccard"))
        .filter($"jaccard" >= 0.2)
        .orderBy("doc_a", "doc_b")
    },

    // L2c: 32-bit SimHash over distinct tokens — a single narrow map.
    Decl(
      "l2_simhash",
      """WITH hs AS (
        |  SELECT doc_id,
        |    list_transform(list_distinct(regexp_extract_all(lower(text), '[a-z]+')),
        |      t -> CAST(concat('0x', substr(md5(concat(t, '#0')),1,8)) AS BIGINT)) AS hashes
        |  FROM documents)
        |SELECT doc_id,
        |  CAST(list_sum(list_transform(range(32), b ->
        |    CASE WHEN CAST(list_sum(list_transform(hashes, t ->
        |           CASE WHEN ((t >> CAST(b AS INT)) & 1) = 1 THEN 1 ELSE -1 END)) AS BIGINT) > 0
        |         THEN (CAST(1 AS BIGINT) << CAST(b AS INT)) ELSE 0 END)) AS BIGINT) AS simhash
        |FROM hs
        |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      import s.implicits._
      Qh.t(s, dir, "documents")
        .withColumn("hashes",
          expr(s"transform(array_distinct($Qh_toks), t -> cast(conv(substring(md5(concat(t, '#0')), 1, 8), 16, 10) as bigint))"))
        .select(
          $"doc_id",
          expr("""aggregate(sequence(0, 31), cast(0 as bigint), (acc, b) -> acc +
                 |  CASE WHEN aggregate(hashes, 0, (a, t) ->
                 |         a + CASE WHEN shiftright(t, b) % 2 = 1 THEN 1 ELSE -1 END) > 0
                 |       THEN shiftleft(cast(1 as bigint), b) ELSE cast(0 as bigint) END)""".stripMargin)
            .as("simhash"))
        .orderBy("doc_id")
    },

    // L2d: exact char-4-gram Jaccard, BLOCKED on (lang, source) so the
    // quadratic part is bounded per block (classic blocked dedup).
    Decl(
      "l2_ngram_jaccard",
      """WITH g AS (
        |  SELECT doc_id, lang, source,
        |    list_distinct(list_transform(range(length(text) - 3),
        |      i -> substr(text, CAST(i + 1 AS INT), 4))) AS grams
        |  FROM documents WHERE length(text) >= 4)
        |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |  CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE)
        |    / len(list_distinct(list_concat(a.grams, b.grams))) AS jaccard4
        |FROM g a JOIN g b
        |  ON a.lang = b.lang AND a.source = b.source AND a.doc_id < b.doc_id
        |WHERE CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE)
        |    / len(list_distinct(list_concat(a.grams, b.grams))) >= 0.5
        |ORDER BY doc_a, doc_b""".stripMargin) { (s, dir) =>
      import s.implicits._
      val g = Qh.t(s, dir, "documents")
        .filter(length($"text") >= 4)
        .select($"doc_id", $"lang", $"source",
          expr("array_distinct(transform(sequence(0, length(text) - 4), i -> substring(text, cast(i + 1 as int), 4)))")
            .as("grams"))
      val jac = size(array_intersect($"a.grams", $"b.grams")).cast(DoubleType) /
        size(array_distinct(concat($"a.grams", $"b.grams")))
      g.as("a").join(g.as("b"),
          $"a.lang" === $"b.lang" && $"a.source" === $"b.source" &&
            $"a.doc_id" < $"b.doc_id")
        .select($"a.doc_id".as("doc_a"), $"b.doc_id".as("doc_b"), jac.as("jaccard4"))
        .filter($"jaccard4" >= 0.5)
        .orderBy("doc_a", "doc_b")
    },

    // L2e: embedding-cosine near-dup, blocked on label (stand-in for a
    // coarse cluster id at scale). Per-label max + near-dup pair count.
    Decl(
      "l2_cosine_neardup",
      s"""WITH p AS (
         |  SELECT a.label,
         |    floor(${Qh.oDot("a.embedding", "b.embedding")}
         |      / (sqrt(${Qh.oDot("a.embedding", "a.embedding")})
         |         * sqrt(${Qh.oDot("b.embedding", "b.embedding")})) * 1000000 + 0.5) / 1000000.0 AS cos
         |  FROM embeddings a JOIN embeddings b
         |    ON a.label = b.label AND a.vec_id < b.vec_id)
        |SELECT label,
        |  count(*) AS n_pairs,
        |  count(*) FILTER (WHERE cos >= 0.8) AS n_neardup,
        |  max(cos) AS max_cos
        |FROM p
        |GROUP BY label
        |ORDER BY label""".stripMargin) { (s, dir) =>
      import s.implicits._
      val e = Qh.t(s, dir, "embeddings")
      val dot = (x: org.apache.spark.sql.Column, y: org.apache.spark.sql.Column) =>
        aggregate(zip_with(x, y, (a, b) => a * b.cast(DoubleType)),
          lit(0.0), (acc, v) => acc + v)
      val cos = Qh.r6(
        dot($"a.embedding", $"b.embedding") /
          (sqrt(dot($"a.embedding", $"a.embedding")) * sqrt(dot($"b.embedding", $"b.embedding"))))
      e.as("a").join(e.as("b"),
          $"a.label" === $"b.label" && $"a.vec_id" < $"b.vec_id")
        .select($"a.label".as("label"), cos.as("cos"))
        .groupBy($"label")
        .agg(
          count(lit(1)).as("n_pairs"),
          count(when($"cos" >= 0.8, lit(1))).as("n_neardup"),
          max($"cos").as("max_cos"))
        .orderBy("label")
    }
  )
}
