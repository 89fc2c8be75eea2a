package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** SURVEY §2.B L4–L5 + north-star text-analysis family over `documents`:
  * term frequency, per-doc token stats, language-ID heuristic, quality
  * scoring, rolling-hash fingerprinting, corpus histograms.
  *
  * Every query is either a narrow map over the scan (per-doc stats —
  * scan-bandwidth-bound at 100 TB) or a single hash agg on a
  * well-distributed key (token, lang×source). No joins, no windows over
  * unbounded partitions. All arithmetic is portable (md5-prefix hashes,
  * explicit IEEE rounding) so the DuckDB oracle hash-matches.
  */
object TextAnalysis {

  private val stopwords = Seq("the", "a", "of", "and", "in", "to", "is")

  /** Count-min sketch geometry (l4_count_min): depth = independent
    * hash rows, width = buckets per row. 4×512 bounds the whole sketch
    * at 2048 cells regardless of corpus size. */
  private val CmsDepth = 4
  private val CmsWidth = 512

  /** The shared BPE training pipeline (l4_bpe_train selects from it,
    * l4_bpe_encode joins the corpus against it — one construction
    * site): word-frequency table → three (pair-count → argmax →
    * greedy-L2R fold) rounds. Returns the final vocab (w, freq, syms)
    * and the three one-row merge DataFrames (step, item, cnt). */
  private def bpeRounds(
      s: org.apache.spark.sql.SparkSession, dir: String)
      : (org.apache.spark.sql.DataFrame, Seq[org.apache.spark.sql.DataFrame]) = {
    import s.implicits._
    val vocab0 = Qh.materialize(
      Qh.t(s, dir, "documents")
        .select(explode(expr(Qh.toksExpr)).as("w"))
        .groupBy($"w").agg(count(lit(1)).as("freq"))
        .select($"w", $"freq", expr(
          "transform(sequence(1, length(w)), i -> substring(w, i, 1))")
          .as("syms")))
    def bestPair(v: org.apache.spark.sql.DataFrame) = v
      .filter(size($"syms") >= 2)
      .select($"freq", explode(expr(
        "transform(sequence(0, size(syms) - 2), " +
          "i -> named_struct('a', syms[i], 'b', syms[i + 1]))")).as("p"))
      .groupBy($"p.a".as("a"), $"p.b".as("b"))
      .agg(sum($"freq").as("cnt"))
      .orderBy($"cnt".desc, $"a", $"b").limit(1)
      .select($"a".as("ma"), $"b".as("mb"), $"cnt".as("mcnt"))
    // canonical greedy L2R merge application as a string fold
    val foldExpr =
      """split(aggregate(syms, CAST('' AS STRING), (acc, x) ->
        |  CASE WHEN acc = '' THEN x
        |       WHEN x = mb AND (acc = ma OR endswith(acc, concat(' ', ma)))
        |         THEN concat(substring(acc, 1, length(acc) - length(ma)), ma, mb)
        |       ELSE concat(acc, ' ', x) END), ' ')""".stripMargin
    var v = vocab0
    var merges = Seq.empty[org.apache.spark.sql.DataFrame]
    for (k <- 1 to 3) {
      val best = Qh.materialize(bestPair(v))
      merges :+= best.select(lit(k.toLong).as("step"),
        concat($"ma", lit(" "), $"mb").as("item"), $"mcnt".as("cnt"))
      v = Qh.materialize(
        v.crossJoin(broadcast(best))
          .select($"w", $"freq", expr(foldExpr).as("syms")))
    }
    (v, merges)
  }

  /** Oracle CTE chain shared by the two BPE decls: word-frequency
    * table v0 → rounds (pcK, bK, vK) for K = 1..3 (the DuckDB spelling
    * of [[bpeRounds]]' `aggregate` lambda). */
  private def oBpeRoundsCte: String = {
    def round(vin: String, k: Int): String =
      s"""pc$k AS (
         |  SELECT a, b, CAST(sum(freq) AS BIGINT) AS cnt FROM (
         |    SELECT freq,
         |      unnest(list_transform(range(1, len(syms)), i -> syms[i])) AS a,
         |      unnest(list_transform(range(1, len(syms)), i -> syms[i+1])) AS b
         |    FROM $vin WHERE len(syms) >= 2)
         |  GROUP BY a, b),
         |b$k AS (SELECT a AS ma, b AS mb, cnt AS mcnt FROM pc$k
         |        ORDER BY cnt DESC, a, b LIMIT 1),
         |v$k AS (
         |  SELECT w, freq, string_split(list_reduce(list_prepend('', syms), (acc, x) ->
         |    CASE WHEN acc = '' THEN x
         |         WHEN x = mb AND (acc = ma OR ends_with(acc, ' ' || ma))
         |           THEN substr(acc, 1, length(acc) - length(ma)) || ma || mb
         |         ELSE acc || ' ' || x END), ' ') AS syms
         |  FROM $vin CROSS JOIN b$k)""".stripMargin
    s"""v0 AS (
       |  SELECT w, CAST(count(*) AS BIGINT) AS freq,
       |    list_transform(range(1, length(w) + 1), i -> substr(w, i, 1)) AS syms
       |  FROM (SELECT unnest(${Qh.oToksExpr}) AS w FROM documents)
       |  GROUP BY w),
       |${round("v0", 1)},
       |${round("v1", 2)},
       |${round("v2", 3)}""".stripMargin
  }

  /** Oracle for l4_bpe_train (see [[oBpeRoundsCte]]). */
  private lazy val oBpeTrainSql: String =
    s"""WITH $oBpeRoundsCte,
       |tops AS (
       |  SELECT CAST(4 AS BIGINT) AS step, sym AS item,
       |    CAST(sum(freq) AS BIGINT) AS cnt
       |  FROM (SELECT freq, unnest(syms) AS sym FROM v3)
       |  GROUP BY sym ORDER BY cnt DESC, sym LIMIT 10)
       |SELECT step, item, cnt FROM (
       |  SELECT CAST(1 AS BIGINT) AS step, ma || ' ' || mb AS item, mcnt AS cnt FROM b1
       |  UNION ALL
       |  SELECT CAST(2 AS BIGINT), ma || ' ' || mb, mcnt FROM b2
       |  UNION ALL
       |  SELECT CAST(3 AS BIGINT), ma || ' ' || mb, mcnt FROM b3
       |  UNION ALL
       |  SELECT step, item, cnt FROM tops)
       |ORDER BY step, item""".stripMargin

  /** Oracle for l4_bpe_encode: join the corpus words to the trained
    * vocab's symbol splits, aggregate per doc (see [[oBpeRoundsCte]]). */
  private lazy val oBpeEncodeSql: String =
    s"""WITH $oBpeRoundsCte,
       |dw AS (SELECT doc_id, unnest(${Qh.oToksExpr}) AS w FROM documents)
       |SELECT dw.doc_id,
       |  CAST(count(*) AS BIGINT) AS n_words,
       |  CAST(sum(length(dw.w)) AS BIGINT) AS n_chars,
       |  CAST(sum(len(v3.syms)) AS BIGINT) AS n_symbols,
       |  ${Qh.oR6("CAST(sum(len(v3.syms)) AS DOUBLE) / CAST(sum(length(dw.w)) AS DOUBLE)")} AS ratio
       |FROM dw JOIN v3 ON dw.w = v3.w
       |GROUP BY dw.doc_id
       |ORDER BY dw.doc_id""".stripMargin

  private val oStopList = stopwords.map(w => s"'$w'").mkString("[", ", ", "]")

  val decls: Seq[Decl] = Seq(

    // L4a: global term frequency (tokenize → explode → hash agg).
    Decl(
      "l4_term_freq",
      s"""SELECT tok,
         |  count(*) AS tf,
         |  count(DISTINCT doc_id) AS df
         |FROM (SELECT doc_id, unnest(${Qh.oToksExpr}) AS tok FROM documents)
         |GROUP BY tok
         |ORDER BY tf DESC, tok
         |LIMIT 30""".stripMargin) { (s, dir) =>
      import s.implicits._
      Qh.t(s, dir, "documents")
        .select($"doc_id", explode(expr(Qh.toksExpr)).as("tok"))
        .groupBy($"tok")
        .agg(count(lit(1)).as("tf"), countDistinct($"doc_id").as("df"))
        .orderBy($"tf".desc, $"tok")
        .limit(30)
    },

    // L4b: per-doc token counting — whitespace tokens, regex (BPE-ish
    // pretokenizer class) tokens, distinct count, mean token length.
    Decl(
      "l4_token_stats",
      s"""SELECT doc_id,
         |  CAST(len(${Qh.oToksExpr}) AS BIGINT) AS n_tokens,
         |  CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS BIGINT) AS n_bpe_ish,
         |  CAST(len(list_distinct(${Qh.oToksExpr})) AS BIGINT) AS n_distinct,
         |  ${Qh.oR6(s"CAST(list_sum(list_transform(${Qh.oToksExpr}, t -> length(t))) AS DOUBLE) / len(${Qh.oToksExpr})")} AS mean_tok_len
         |FROM documents
         |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      import s.implicits._
      Qh.t(s, dir, "documents")
        .withColumn("toks", expr(Qh.toksExpr))
        .select(
          $"doc_id",
          size($"toks").cast(LongType).as("n_tokens"),
          size(expr("regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]', 0)"))
            .cast(LongType).as("n_bpe_ish"),
          size(array_distinct($"toks")).cast(LongType).as("n_distinct"),
          Qh.r6(aggregate($"toks", lit(0L), (acc, t) => acc + length(t))
            .cast(DoubleType) / size($"toks")).as("mean_tok_len"))
        .orderBy("doc_id")
    },

    // L4i: BPE PAIR STATS (r5) — adjacent character-pair frequencies
    // over the tokenized corpus, i.e. ONE merge-selection step of
    // byte-pair-encoding vocabulary training (Sennrich et al. 2016):
    // the distributed inner loop a tokenizer trainer runs per merge.
    // Narrow double-explode → one hash agg (map-side combined) →
    // TakeOrderedAndProject top-20 (count desc, pair asc — fully
    // deterministic). At 100 TB: shuffle carries only (pair, partial
    // count) — bounded by the pair alphabet, not the corpus.
    Decl(
      "l4_bpe_pair_stats",
      s"""SELECT pair, count(*) AS n FROM (
         |  SELECT unnest(list_transform(range(1, len(tok)), i -> substr(tok, i, 2))) AS pair
         |  FROM (SELECT unnest(${Qh.oToksExpr}) AS tok FROM documents)
         |  WHERE len(tok) >= 2)
         |GROUP BY pair
         |ORDER BY n DESC, pair
         |LIMIT 20""".stripMargin) { (s, dir) =>
      import s.implicits._
      Qh.t(s, dir, "documents")
        .select(explode(expr(Qh.toksExpr)).as("tok"))
        .filter(length($"tok") >= 2)
        .select(explode(expr(
          "transform(sequence(1, length(tok) - 1), i -> substring(tok, i, 2))")).as("pair"))
        .groupBy($"pair").agg(count(lit(1)).as("n"))
        .orderBy($"n".desc, $"pair")
        .limit(20)
    },

    // L4b2: TF-IDF — term frequency × ln(N/df), top-3 terms per doc.
    // Three hash aggs (tf on (doc,term), df on term, N scalar) + one
    // window; the df and N branches are broadcast — the full corpus
    // shuffles only once on (doc, term).
    Decl(
      "l4_tfidf",
      s"""WITH tf AS (
         |  SELECT doc_id, tok, count(*) AS tf
         |  FROM (SELECT doc_id, unnest(${Qh.oToksExpr}) AS tok FROM documents)
         |  GROUP BY doc_id, tok),
         |df AS (SELECT tok, count(DISTINCT doc_id) AS df FROM (SELECT doc_id, unnest(${Qh.oToksExpr}) AS tok FROM documents) GROUP BY tok),
         |n AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs FROM documents),
         |scored AS (
         |  SELECT tf.doc_id, tf.tok,
         |    ${Qh.oR6("CAST(tf.tf AS DOUBLE) * ln(n.n_docs / df.df)")} AS tfidf
         |  FROM tf JOIN df ON tf.tok = df.tok CROSS JOIN n)
         |SELECT doc_id, tok, tfidf FROM (
         |  SELECT doc_id, tok, tfidf,
         |    row_number() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, tok) AS rn
         |  FROM scored)
         |WHERE rn <= 3 AND doc_id < 100
         |ORDER BY doc_id, tok""".stripMargin) { (s, dir) =>
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val toks = Qh.t(s, dir, "documents")
        .select($"doc_id", explode(expr(Qh.toksExpr)).as("tok"))
      val tf = toks.groupBy($"doc_id", $"tok").agg(count(lit(1)).as("tf"))
      val df = toks.groupBy($"tok").agg(countDistinct($"doc_id").as("df"))
      val n = Qh.t(s, dir, "documents")
        .agg(count(lit(1)).cast(DoubleType).as("n_docs"))
      val w = Window.partitionBy($"doc_id").orderBy($"tfidf".desc, $"tok")
      tf.join(broadcast(df), "tok")
        .crossJoin(broadcast(n))
        .select($"doc_id", $"tok",
          Qh.r6($"tf".cast(DoubleType) * log($"n_docs" / $"df")).as("tfidf"))
        .withColumn("rn", row_number().over(w))
        .filter($"rn" <= 3 && $"doc_id" < 100)
        .select("doc_id", "tok", "tfidf")
        .orderBy("doc_id", "tok")
    },

    // L4c: language-ID heuristic — stopword-hit ratio over tokens
    // (n-gram-frequency heuristic; thresholds are part of the contract).
    Decl(
      "l4_lang_id",
      s"""SELECT doc_id, lang AS labeled_lang,
         |  ${Qh.oR6(s"CAST(len(list_filter(${Qh.oToksExpr}, t -> list_contains($oStopList, t))) AS DOUBLE) / len(${Qh.oToksExpr})")} AS stop_ratio,
         |  CASE WHEN CAST(len(list_filter(${Qh.oToksExpr}, t -> list_contains($oStopList, t))) AS DOUBLE) / len(${Qh.oToksExpr}) >= 0.15 THEN 'en'
         |       WHEN CAST(len(list_filter(${Qh.oToksExpr}, t -> list_contains($oStopList, t))) AS DOUBLE) / len(${Qh.oToksExpr}) >= 0.05 THEN 'und'
         |       ELSE 'other' END AS pred_lang
         |FROM documents
         |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      import s.implicits._
      val stops = typedLit(stopwords)
      // toks hoisted to a column: the tokenizer regex runs once per row
      // (an inline expr would re-tokenize per referencing expression)
      val ratio = size(filter($"toks", t => array_contains(stops, t)))
        .cast(DoubleType) / size($"toks")
      Qh.t(s, dir, "documents")
        .withColumn("toks", expr(Qh.toksExpr))
        .select(
          $"doc_id", $"lang".as("labeled_lang"),
          Qh.r6(ratio).as("stop_ratio"),
          when(ratio >= 0.15, "en")
            .when(ratio >= 0.05, "und")
            .otherwise("other").as("pred_lang"))
        .orderBy("doc_id")
    },

    // L4d: quality score — fixed formula over length / stopword ratio /
    // punctuation ratio / mean token length (the usual pretraining
    // heuristics, each a portable expression).
    Decl(
      "l4_quality_score",
      s"""WITH f AS (
         |  SELECT doc_id,
         |    least(CAST(length(text) AS DOUBLE), 500.0) / 500.0 AS len_score,
         |    CAST(len(list_filter(${Qh.oToksExpr}, t -> list_contains($oStopList, t))) AS DOUBLE) / len(${Qh.oToksExpr}) AS stop_ratio,
         |    CAST(length(text) - length(regexp_replace(text, '[^a-z ]', '', 'g')) AS DOUBLE) / length(text) AS punct_ratio,
         |    CAST(list_sum(list_transform(${Qh.oToksExpr}, t -> length(t))) AS DOUBLE) / len(${Qh.oToksExpr}) AS mtl
         |  FROM documents)
         |SELECT doc_id,
         |  ${Qh.oR6("0.3 * len_score + 0.4 * least(stop_ratio * 5.0, 1.0) + 0.2 * (1.0 - punct_ratio) + 0.1 * least(mtl / 8.0, 1.0)")} AS quality
         |FROM f
         |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      import s.implicits._
      val stops = typedLit(stopwords)
      val lenScore = least(length($"text").cast(DoubleType), lit(500.0)) / 500.0
      val stopRatio = size(filter($"toks", t => array_contains(stops, t)))
        .cast(DoubleType) / size($"toks")
      val punctRatio = (length($"text") -
        length(regexp_replace($"text", "[^a-z ]", ""))).cast(DoubleType) / length($"text")
      val mtl = aggregate($"toks", lit(0L), (acc, t) => acc + length(t))
        .cast(DoubleType) / size($"toks")
      Qh.t(s, dir, "documents")
        .withColumn("toks", expr(Qh.toksExpr))
        .select(
          $"doc_id",
          Qh.r6(lit(0.3) * lenScore + lit(0.4) * least(stopRatio * 5.0, lit(1.0)) +
            lit(0.2) * (lit(1.0) - punctRatio) + lit(0.1) * least(mtl / 8.0, lit(1.0)))
            .as("quality"))
        .orderBy("doc_id")
    },

    // L4e: document fingerprint — polynomial rolling hash over token
    // hashes (mod a sub-2^53 prime; fold order identical both engines).
    Decl(
      "l4_fingerprint",
      s"""SELECT doc_id,
         |  list_reduce(
         |    list_prepend(CAST(0 AS BIGINT),
         |      list_transform(${Qh.oToksExpr}, t -> ${Qh.oPhash("t", 0)})),
         |    (a, b) -> (a * 31 + b) % 9007199254740881) AS fingerprint
         |FROM documents
         |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      import s.implicits._
      Qh.t(s, dir, "documents")
        .select(
          $"doc_id",
          expr("""aggregate(regexp_extract_all(lower(text), '[a-z]+', 0),
                 |  cast(0 as bigint),
                 |  (a, t) -> (a * 31 + cast(conv(substring(md5(concat(t, '#0')), 1, 8), 16, 10) as bigint)) % 9007199254740881)""".stripMargin)
            .as("fingerprint"))
        .orderBy("doc_id")
    },

    // The composed training-data curation pipeline: quality-filter →
    // exact-dedup (keep lowest doc_id per digest) → per-language yield.
    // One narrow filter + one digest window + one hash agg: at 100 TB
    // the only shuffles are the digest partition and the tiny final agg.
    Decl(
      "l7_curation_pipeline",
      s"""WITH scored AS (
         |  SELECT doc_id, lang, text,
         |    0.3 * (least(CAST(length(text) AS DOUBLE), 500.0) / 500.0)
         |      + 0.4 * least(CAST(len(list_filter(${Qh.oToksExpr}, t -> list_contains($oStopList, t))) AS DOUBLE) / len(${Qh.oToksExpr}) * 5.0, 1.0)
         |      + 0.2 * (1.0 - CAST(length(text) - length(regexp_replace(text, '[^a-z ]', '', 'g')) AS DOUBLE) / length(text))
         |      + 0.1 * least(CAST(list_sum(list_transform(${Qh.oToksExpr}, t -> length(t))) AS DOUBLE) / len(${Qh.oToksExpr}) / 8.0, 1.0) AS quality
         |  FROM documents),
         |kept AS (
         |  SELECT doc_id, lang FROM (
         |    SELECT doc_id, lang,
         |      row_number() OVER (PARTITION BY sha256(text) ORDER BY doc_id) AS rn
         |    FROM scored WHERE quality >= 0.5)
         |  WHERE rn = 1)
         |SELECT lang, count(*) AS n_kept
         |FROM kept
         |GROUP BY lang
         |ORDER BY lang""".stripMargin) { (s, dir) =>
      import s.implicits._
      val stops = typedLit(stopwords)
      val lenScore = least(length($"text").cast(DoubleType), lit(500.0)) / 500.0
      val stopRatio = size(filter($"toks", t => array_contains(stops, t)))
        .cast(DoubleType) / size($"toks")
      val punctRatio = (length($"text") -
        length(regexp_replace($"text", "[^a-z ]", ""))).cast(DoubleType) / length($"text")
      val mtl = aggregate($"toks", lit(0L), (acc, t) => acc + length(t))
        .cast(DoubleType) / size($"toks")
      val quality = lit(0.3) * lenScore + lit(0.4) * least(stopRatio * 5.0, lit(1.0)) +
        lit(0.2) * (lit(1.0) - punctRatio) + lit(0.1) * least(mtl / 8.0, lit(1.0))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(sha2($"text", 256)).orderBy($"doc_id")
      Qh.t(s, dir, "documents")
        .withColumn("toks", expr(Qh.toksExpr))
        .filter(quality >= 0.5)
        .withColumn("rn", row_number().over(w))
        .filter($"rn" === 1)
        .groupBy($"lang")
        .agg(count(lit(1)).as("n_kept"))
        .orderBy("lang")
    },

    // Reproducible train/val/test split via the portable content hash —
    // the deterministic alternative to rand()-based sampling (stable
    // across runs, engines, and cluster sizes; the property a training
    // pipeline actually needs). Split = hash(doc_id) mod 10: 0-7 train,
    // 8 val, 9 test; stratification verified per language.
    Decl(
      "l8_deterministic_split",
      s"""SELECT lang,
         |  count(*) FILTER (WHERE ${Qh.oPhash("CAST(doc_id AS VARCHAR)", 7)} % 10 <= 7) AS n_train,
         |  count(*) FILTER (WHERE ${Qh.oPhash("CAST(doc_id AS VARCHAR)", 7)} % 10 = 8) AS n_val,
         |  count(*) FILTER (WHERE ${Qh.oPhash("CAST(doc_id AS VARCHAR)", 7)} % 10 = 9) AS n_test
         |FROM documents
         |GROUP BY lang
         |ORDER BY lang""".stripMargin) { (s, dir) =>
      import s.implicits._
      val bucket = Qh.phash($"doc_id".cast(StringType), 7) % 10
      Qh.t(s, dir, "documents")
        .withColumn("b", bucket)
        .groupBy($"lang")
        .agg(
          count(when($"b" <= 7, lit(1))).as("n_train"),
          count(when($"b" === 8, lit(1))).as("n_val"),
          count(when($"b" === 9, lit(1))).as("n_test"))
        .orderBy("lang")
    },

    // Deterministic ~10% sample by the same hash — reproducible
    // subsetting without rand() (rows, not just counts, are stable).
    Decl(
      "l8_deterministic_sample",
      s"""SELECT doc_id, lang
         |FROM documents
         |WHERE ${Qh.oPhash("CAST(doc_id AS VARCHAR)", 11)} % 100 < 10
         |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      import s.implicits._
      Qh.t(s, dir, "documents")
        .filter(Qh.phash($"doc_id".cast(StringType), 11) % 100 < 10)
        .select($"doc_id", $"lang")
        .orderBy("doc_id")
    },

    // L8c: STRATIFIED sampling with per-stratum rates — the data-mixture
    // knob (downsample the over-represented language, keep the rest):
    // each stratum gets its own deterministic hash-threshold rate, so
    // the output mixture hits the target ratios reproducibly at any
    // parallelism — rows, not just counts, are stable across engines,
    // runs, and cluster sizes. Narrow filter; no shuffle, no rand().
    Decl(
      "l8_stratified_sample",
      s"""SELECT doc_id, lang
         |FROM documents
         |WHERE ${Qh.oPhash("CAST(doc_id AS VARCHAR)", 13)} % 100 <
         |  CASE lang WHEN 'en' THEN 10 WHEN 'de' THEN 25 ELSE 40 END
         |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      import s.implicits._
      val rate = when($"lang" === "en", 10)
        .when($"lang" === "de", 25).otherwise(40)
      Qh.t(s, dir, "documents")
        .filter(Qh.phash($"doc_id".cast(StringType), 13) % 100 < rate)
        .select($"doc_id", $"lang")
        .orderBy("doc_id")
    },

    // L8e: BOTTOM-K SAMPLE per stratum — k docs with the smallest
    // portable hash per language (Cohen & Kaplan bottom-k sketches): a
    // fixed-SIZE uniform sample without replacement, where the
    // hash-threshold decls above give a fixed RATE. Mergeable by
    // construction (the bottom-k of a union is the bottom-k of the
    // parts' bottom-k's), so it runs as per-partition top-k + merge —
    // the TopKWindowRewrite rule lowers this window idiom onto the
    // custom two-phase TopKPerGroup physical operator: no full sort, no
    // full shuffle of the losers, exactly the 100-TB sampling shape.
    Decl(
      "l8_bottomk_sample",
      s"""SELECT lang, doc_id, smp_key FROM (
         |  SELECT lang, doc_id,
         |    ${Qh.oPhash("CAST(doc_id AS VARCHAR)", 17)} AS smp_key,
         |    row_number() OVER (PARTITION BY lang
         |      ORDER BY ${Qh.oPhash("CAST(doc_id AS VARCHAR)", 17)}, doc_id) AS rn
         |  FROM documents)
         |WHERE rn <= 5
         |ORDER BY lang, smp_key, doc_id""".stripMargin) { (s, dir) =>
      import s.implicits._
      val w = Window
        .partitionBy($"lang")
        .orderBy($"smp_key".asc, $"doc_id".asc)
      Qh.t(s, dir, "documents")
        .select(
          $"lang",
          $"doc_id",
          Qh.phash($"doc_id".cast(StringType), 17).as("smp_key"))
        .withColumn("rn", row_number().over(w))
        .filter($"rn" <= 5)
        .select($"lang", $"doc_id", $"smp_key")
        .orderBy("lang", "smp_key", "doc_id")
    },

    // L8f: WEIGHTED sample without replacement per stratum — the
    // Efraimidis–Spirakis (2006) A-ES scheme made deterministic: each
    // doc draws u ∈ (0,1) from the portable hash and gets the
    // exponential key -ln(u)/w with w = n_chars (longer docs
    // proportionally likelier); the k SMALLEST keys per lang are the
    // sample. This is the scheme's distributed strength: keys are
    // independent per row (one narrow map), selection is bottom-k —
    // which the W4 rewrite lowers onto the bounded-heap TopKPerGroup,
    // so losers never cross the exchange. ln (not pow: libm pow is not
    // cross-engine bit-stable, the l8_mixture_weights lesson) over
    // identical doubles; the reported key is fixed-point-rounded at
    // 1e-12, selection uses the raw key with doc_id tiebreak.
    Decl(
      "l8_weighted_sample",
      s"""SELECT lang, doc_id, n_chars,
         |  ${Qh.oR("-ln((%s %% 1048576 + 0.5) / 1048576.0) / CAST(n_chars AS DOUBLE)".format(Qh.oPhash("CAST(doc_id AS VARCHAR)", 23)), 1000000000000L)} AS es_key
         |FROM (
         |  SELECT lang, doc_id, n_chars,
         |    row_number() OVER (PARTITION BY lang
         |      ORDER BY -ln((${Qh.oPhash("CAST(doc_id AS VARCHAR)", 23)} % 1048576 + 0.5) / 1048576.0) / CAST(n_chars AS DOUBLE), doc_id) AS rn
         |  FROM documents)
         |WHERE rn <= 5
         |ORDER BY lang, doc_id""".stripMargin) { (s, dir) =>
      import s.implicits._
      val w = Window.partitionBy($"lang").orderBy($"es_key".asc, $"doc_id".asc)
      Qh.t(s, dir, "documents")
        .select($"lang", $"doc_id", $"n_chars",
          (-log((Qh.phash($"doc_id".cast(StringType), 23) % 1048576 + lit(0.5))
            / 1048576.0) / $"n_chars".cast(DoubleType)).as("es_key"))
        .withColumn("rn", row_number().over(w))
        .filter($"rn" <= 5)
        .select($"lang", $"doc_id", $"n_chars",
          Qh.r($"es_key", 1000000000000L).as("es_key"))
        .orderBy("lang", "doc_id")
    },

    // L8d: DOMAIN-MIXTURE WEIGHTS — temperature-scaled sampling weights
    // per (lang, source) block, the standard fix for over-represented
    // domains when composing a training mixture (the p^α reweighting of
    // multilingual BERT / XLM-R; α = 0.5 here because IEEE-754 sqrt is
    // EXACTLY rounded — bit-identical in Spark and DuckDB — where
    // libm pow is not). Weights are wq/Σwq with wq the 1e-6 fixed-point
    // sqrt(count): integer sum is order-proof, and both engines divide
    // identical doubles. One tiny agg + a single-partition window over
    // the low-cardinality block set — the big table is scanned once.
    Decl(
      "l8_mixture_weights",
      """WITH c AS (
        |  SELECT lang, source, count(*) AS n
        |  FROM documents GROUP BY lang, source),
        |w AS (
        |  SELECT lang, source, n,
        |    CAST(floor(sqrt(CAST(n AS DOUBLE)) * 1000000 + 0.5) AS BIGINT) AS wq
        |  FROM c)
        |SELECT lang, source, n,
        |  floor(CAST(wq AS DOUBLE) / CAST(sum(wq) OVER () AS DOUBLE) * 1000000 + 0.5)
        |    / 1000000.0 AS weight
        |FROM w ORDER BY lang, source""".stripMargin) { (s, dir) =>
      import s.implicits._
      val c = Qh.t(s, dir, "documents")
        .groupBy($"lang", $"source").agg(count(lit(1)).as("n"))
      c.withColumn("wq",
          floor(sqrt($"n".cast("double")) * 1000000 + 0.5).cast("long"))
        .withColumn("tot", sum($"wq").over(Window.partitionBy()))
        .select($"lang", $"source", $"n",
          Qh.r6($"wq".cast("double") / $"tot".cast("double")).as("weight"))
        .orderBy("lang", "source")
    },

    // L12: GLOBAL CONTIGUOUS IDS in a total key order — without the
    // single-reducer global sort that row_number() OVER (ORDER BY …)
    // costs at 100 TB. Two-phase block-offset numbering: per-block
    // counts (one tiny agg — block keys are low-cardinality model-style
    // metadata), cumulative offsets derived in-engine and broadcast
    // back, then each block ranks LOCALLY and adds its offset. The only
    // shuffle of the big table is the per-block window partition — no
    // stage ever funnels all rows through one task. Same ids as the
    // naive global sort, bit for bit (the oracle IS the naive form).
    Decl(
      "l12_global_ids",
      """SELECT doc_id,
        |  row_number() OVER (ORDER BY lang, source, doc_id) - 1 AS gid
        |FROM documents
        |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      import s.implicits._
      val docs = Qh.t(s, dir, "documents").select($"doc_id", $"lang", $"source")
      // phase 1: block counts → cumulative offsets, derived IN-ENGINE
      // via a running sum over the tiny aggregate (single-partition
      // window is fine: block keys are low-cardinality metadata). This
      // keeps the block order Spark's own binary-UTF-8 string sort —
      // identical to the oracle's — where a driver-side Scala sortBy
      // would compare UTF-16 code units and diverge beyond ASCII. Null
      // block keys are rejected up front: Spark orders nulls first,
      // DuckDB last, so they have no portable position.
      val counts = docs.groupBy($"lang", $"source").agg(count(lit(1)).as("cnt"))
      val nNullKeys = counts.filter($"lang".isNull || $"source".isNull).count()
      require(nNullKeys == 0,
        s"l12_global_ids: $nNullKeys block(s) with NULL lang/source — no portable total order")
      val wOff = Window.orderBy($"lang", $"source")
        .rowsBetween(Window.unboundedPreceding, -1)
      val offDf = counts.select($"lang", $"source",
        coalesce(sum($"cnt").over(wOff), lit(0L)).as("off"))
      // phase 2: local rank within block + broadcast offset
      val w = Window.partitionBy($"lang", $"source").orderBy($"doc_id")
      docs.withColumn("local_rn", row_number().over(w))
        .join(broadcast(offDf), Seq("lang", "source"))
        .select($"doc_id", ($"off" + $"local_rn" - 1).as("gid"))
        .orderBy("doc_id")
    },

    // L4g: PII redaction — the scrubbing pass every training-data
    // pipeline runs before anything else. The fixture text is synthetic
    // word soup, so both engines first plant deterministic PII (an email
    // and a short phone derived from doc_id), then redact emails and
    // phone-shaped digit runs with the SAME regexes; output pins the
    // redacted text's fingerprint and the per-doc replacement counts, so
    // a pattern mismatch on either engine breaks the hash. Narrow map —
    // scan-bandwidth-bound at 100 TB. (DuckDB regexp_replace needs the
    // 'g' flag; Spark's is global by default.)
    Decl(
      "l4_pii_redact", {
        val planted = "concat(text, ' contact user', CAST(doc_id AS VARCHAR), " +
          "'@example.com or 555-', substr(CAST(1000 + doc_id % 9000 AS VARCHAR), 1, 4))"
        // [.] instead of \. : backslash escapes are parsed differently by
        // Spark SQL string literals vs DuckDB's — a character class is
        // identical in both
        s"""SELECT doc_id,
           |  ${Qh.oPhash(
                 s"regexp_replace(regexp_replace($planted, '[a-z0-9._%+-]+@[a-z0-9.-]+[.][a-z]{2,}', '<EMAIL>', 'g'), '[0-9]{3}-[0-9]{4}', '<PHONE>', 'g')",
                 3)} AS redacted_fp,
           |  CAST(len(regexp_extract_all($planted, '[a-z0-9._%+-]+@[a-z0-9.-]+[.][a-z]{2,}')) AS BIGINT) AS n_emails,
           |  CAST(len(regexp_extract_all($planted, '[0-9]{3}-[0-9]{4}')) AS BIGINT) AS n_phones
           |FROM documents
           |ORDER BY doc_id""".stripMargin
      }) { (s, dir) =>
      import s.implicits._
      val emailRe = "[a-z0-9._%+-]+@[a-z0-9.-]+[.][a-z]{2,}"
      val phoneRe = "[0-9]{3}-[0-9]{4}"
      val planted = concat($"text", lit(" contact user"), $"doc_id".cast(StringType),
        lit("@example.com or 555-"),
        substring((lit(1000) + $"doc_id" % 9000).cast(StringType), 1, 4))
      Qh.t(s, dir, "documents")
        .withColumn("planted", planted)
        .select(
          $"doc_id",
          Qh.phash(
            regexp_replace(regexp_replace($"planted", emailRe, "<EMAIL>"),
              phoneRe, "<PHONE>"), 3).as("redacted_fp"),
          size(expr(s"regexp_extract_all(planted, '$emailRe', 0)"))
            .cast(LongType).as("n_emails"),
          size(expr(s"regexp_extract_all(planted, '$phoneRe', 0)"))
            .cast(LongType).as("n_phones"))
        .orderBy("doc_id")
    },

    // L4h: repetition-based quality filters — the Gopher/C4 rules
    // (Rae et al. 2021 "Scaling Language Models" App. A; Raffel et al.
    // 2020): duplicate-token fraction and most-frequent-bigram fraction,
    // with the standard keep/drop verdict. Bigram counting is explode →
    // (doc, bigram) partial+final hash agg → per-doc max — two
    // well-distributed aggs, no windows over unbounded partitions;
    // at 100 TB the (doc, bigram) key is near-unique so partial combine
    // does the heavy lifting map-side.
    Decl(
      "l4_repetition_quality",
      s"""WITH toks AS (
         |  SELECT doc_id, ${Qh.oToksExpr} AS toks FROM documents),
         |base AS (
         |  SELECT doc_id,
         |    1.0 - CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks) AS dup_tok_frac
         |  FROM toks WHERE len(toks) >= 2),
         |bg AS (
         |  SELECT doc_id, tok || '_' || next_tok AS bigram
         |  FROM (SELECT doc_id, unnest(toks[1:len(toks)-1]) AS tok,
         |               unnest(toks[2:len(toks)]) AS next_tok
         |        FROM toks WHERE len(toks) >= 2)),
         |bgc AS (
         |  SELECT doc_id, count(*) AS c FROM bg GROUP BY doc_id, bigram),
         |top AS (
         |  SELECT doc_id, max(c) AS top_c, CAST(sum(c) AS DOUBLE) AS n_bigrams
         |  FROM bgc GROUP BY doc_id)
         |SELECT b.doc_id,
         |  ${Qh.oR6("b.dup_tok_frac")} AS dup_tok_frac,
         |  ${Qh.oR6("t.top_c / t.n_bigrams")} AS top_bigram_frac,
         |  (b.dup_tok_frac <= 0.65 AND t.top_c / t.n_bigrams <= 0.08) AS keep
         |FROM base b JOIN top t ON b.doc_id = t.doc_id
         |ORDER BY b.doc_id""".stripMargin) { (s, dir) =>
      import s.implicits._
      val toks = Qh.t(s, dir, "documents")
        .select($"doc_id", expr(Qh.toksExpr).as("toks"))
        .filter(size($"toks") >= 2)
      val base = toks.select(
        $"doc_id",
        (lit(1.0) - size(array_distinct($"toks")).cast(DoubleType) / size($"toks"))
          .as("dup_tok_frac"))
      val bigrams = toks.select($"doc_id",
          explode(zip_with(
            slice($"toks", lit(1), size($"toks") - 1),
            slice($"toks", lit(2), size($"toks") - 1),
            (a, b) => concat(a, lit("_"), b))).as("bigram"))
      val top = bigrams.groupBy($"doc_id", $"bigram").agg(count(lit(1)).as("c"))
        .groupBy($"doc_id")
        .agg(max($"c").as("top_c"), sum($"c").cast(DoubleType).as("n_bigrams"))
      base.join(top, "doc_id")
        .select(
          $"doc_id",
          Qh.r6($"dup_tok_frac").as("dup_tok_frac"),
          Qh.r6($"top_c" / $"n_bigrams").as("top_bigram_frac"),
          // thresholds sit inside this corpus's metric range so the
          // verdict actually discriminates (both sides compute the
          // identical doubles, so the comparison is engine-stable)
          ($"dup_tok_frac" <= 0.65 && $"top_c" / $"n_bigrams" <= 0.08).as("keep"))
        .orderBy("doc_id")
    },

    // L9: sequence packing — concat-and-chunk documents into fixed
    // token-budget training sequences (the GPT-style pretraining batch
    // layout). Each doc gets (seq_id, offset) from the running token
    // count; docs may straddle a boundary, exactly like the real
    // packer. Partitioned BY SOURCE (the shard key): the cumulative sum
    // is a window per source, never one global single-partition sort —
    // the shape that survives 100 TB. Budget = 512 whitespace tokens.
    Decl(
      "l9_sequence_packing",
      s"""SELECT doc_id, source, n_toks,
         |  CAST(floor((cum - n_toks) / 512) AS BIGINT) AS seq_id,
         |  CAST((cum - n_toks) % 512 AS BIGINT) AS offset_in_seq
         |FROM (
         |  SELECT doc_id, source, len(${Qh.oToksExpr}) AS n_toks,
         |    sum(len(${Qh.oToksExpr})) OVER (
         |      PARTITION BY source ORDER BY doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
         |  FROM documents)
         |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy($"source").orderBy($"doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Qh.t(s, dir, "documents")
        .select($"doc_id", $"source", size(expr(Qh.toksExpr)).as("n_toks"))
        .withColumn("cum", sum($"n_toks").over(w))
        .select(
          $"doc_id", $"source", $"n_toks".cast(LongType).as("n_toks"),
          floor(($"cum" - $"n_toks") / 512).cast(LongType).as("seq_id"),
          (($"cum" - $"n_toks") % 512).cast(LongType).as("offset_in_seq"))
        .orderBy("doc_id")
    },

    // L9b: SHARD EXPORT — the training-data delivery format: documents
    // written as JSONL shards with a BOUNDED record count per file
    // (`maxRecordsPerFile` — the knob that keeps loader workers
    // balanced and shard-resumable at 100 TB), partitioned by the
    // source shard key. The decl re-reads the exported shards and
    // aggregates; the oracle aggregates the ORIGINAL table, so any doc
    // lost, duplicated, or text-mangled by the JSON round trip breaks
    // the hash. The per-file bound itself is checked in-engine
    // (input_file_name groupBy — bounded metadata, shard count ≈ 8)
    // and shipped as a boolean the oracle pins TRUE.
    Decl(
      "l9_shard_export",
      """SELECT count(*) AS n_docs,
        |  CAST(sum(length(text)) AS BIGINT) AS total_chars,
        |  count(DISTINCT lang) AS n_langs,
        |  TRUE AS shards_bounded
        |FROM documents""".stripMargin) { (s, dir) =>
      import s.implicits._
      val path = Qh.ioDir("l9_shards")
      Qh.t(s, dir, "documents")
        .select($"doc_id", $"text", $"lang", $"source")
        .repartition($"source")
        .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
        .option("maxRecordsPerFile", 100)
        .json(path)
      val schema = StructType(Seq(
        StructField("doc_id", LongType),
        StructField("text", StringType),
        StructField("lang", StringType),
        StructField("source", StringType)))
      val back = s.read.schema(schema).json(path)
      val maxPerShard = back.groupBy(input_file_name()).count()
        .agg(max($"count")).head.getLong(0)
      back.agg(
          count(lit(1)).as("n_docs"),
          sum(length($"text")).cast(LongType).as("total_chars"),
          countDistinct($"lang").as("n_langs"))
        .withColumn("shards_bounded", lit(maxPerShard <= 100))
    },

    // L4i: heavy hitters via a Misra–Gries mergeable summary
    // (FreqItemsAgg) under the a3-style tolerance contract: the oracle
    // pins the EXACT top-5 terms (+TRUE); the engine also computes the
    // exact top-5 and asserts each is inside the sketch's top-5 (MG
    // guarantees it whenever tf > n/capacity — amply true for top
    // terms here). O(capacity) partials instead of a full (term, count)
    // shuffle — the third sketch of the toolkit after HLL and t-digest.
    Decl(
      "l4_heavy_hitters",
      s"""SELECT tok, tf, TRUE AS in_sketch_top5 FROM (
         |  SELECT tok, count(*) AS tf
         |  FROM (SELECT unnest(${Qh.oToksExpr}) AS tok FROM documents)
         |  GROUP BY tok
         |  ORDER BY tf DESC, tok
         |  LIMIT 5)
         |ORDER BY tf DESC, tok""".stripMargin) { (s, dir) =>
      import s.implicits._
      val toks = Qh.t(s, dir, "documents")
        .select(explode(expr(Qh.toksExpr)).as("tok"))
      val exactTop = toks.groupBy($"tok").agg(count(lit(1)).as("tf"))
        .orderBy($"tf".desc, $"tok").limit(5)
      val mg = udaf(graft.functions.FreqItemsAgg.MgTopK(capacity = 64, k = 5))
      val sketchTop = toks.agg(mg($"tok").as("sketch_top5"))
      exactTop.crossJoin(broadcast(sketchTop))
        .select($"tok", $"tf",
          array_contains($"sketch_top5", $"tok").as("in_sketch_top5"))
        .orderBy($"tf".desc, $"tok")
    },

    // L4j: COUNT-MIN sketch (Cormode–Muthukrishnan 2005) — the
    // point-query frequency sketch next to Misra–Gries's top-k: fixed
    // O(depth × width) memory, mergeable by cell-wise addition, answers
    // est(t) = min_d cells[d][h_d(t)] with est ≥ exact always and
    // est ≤ exact + εN w.h.p. Everything here is RELATIONAL, which is
    // what makes it exactly checkable: with the portable hash the
    // sketch is a pure function of the term-frequency table, so DuckDB
    // rebuilds the identical 4×512 cell grid and the identical
    // estimates — overcount included — and the driver hash-compares
    // all of it, no tolerance band. Scale shape: ONE map-side-combined
    // (token → tf) agg is the only corpus-sized shuffle (shared shape
    // with l4_term_freq); the 4-row-per-token bucket explode runs over
    // the AGGREGATED table, the cell grid is ≤ 2048 rows, and serving
    // joins the broadcast grid — at 100 TB the sketch is what ships to
    // the driver/monitoring, never the term table.
    Decl(
      "l4_count_min",
      {
        val perD = (0 until CmsDepth).map(d =>
          s"SELECT tok, tf, $d AS d, ${Qh.oPhash("tok", 900 + d)} % $CmsWidth AS bucket FROM tf")
          .mkString("\n         UNION ALL\n         ")
        s"""WITH tf AS (
           |  SELECT tok, count(*) AS tf
           |  FROM (SELECT unnest(${Qh.oToksExpr}) AS tok FROM documents)
           |  GROUP BY tok),
           |buckets AS (
           |  $perD),
           |cells AS (
           |  SELECT d, bucket, CAST(sum(tf) AS BIGINT) AS cnt
           |  FROM buckets GROUP BY d, bucket),
           |top AS (
           |  SELECT tok, tf FROM tf ORDER BY tf DESC, tok LIMIT 30)
           |SELECT t.tok, t.tf AS exact, min(c.cnt) AS est,
           |  min(c.cnt) - t.tf AS overcount
           |FROM top t
           |JOIN buckets b ON b.tok = t.tok
           |JOIN cells c ON c.d = b.d AND c.bucket = b.bucket
           |GROUP BY t.tok, t.tf
           |ORDER BY exact DESC, t.tok""".stripMargin
      }) { (s, dir) =>
      import s.implicits._
      // the one corpus-sized agg: (token → tf), map-side combined
      val tf = Qh.materialize(
        Qh.t(s, dir, "documents")
          .select(explode(expr(Qh.toksExpr)).as("tok"))
          .groupBy($"tok").agg(count(lit(1)).as("tf")))
      // sketch build FROM the term table: 4 bucket rows per term, then
      // the bounded cell grid (≤ depth × width rows)
      val bucketCols = (0 until CmsDepth).map(d =>
        struct(lit(d).as("d"), (Qh.phash($"tok", 900 + d) % CmsWidth).as("bucket")))
      val buckets = tf.select($"tok", $"tf",
          explode(array(bucketCols: _*)).as("b"))
        .select($"tok", $"tf", $"b.d", $"b.bucket")
      val cells = buckets.groupBy($"d", $"bucket")
        .agg(sum($"tf").cast(LongType).as("cnt"))
      // point queries: the exact top-30 terms, served off the broadcast
      // cell grid — est = min over the 4 probed cells
      val top = tf.orderBy($"tf".desc, $"tok").limit(30)
      top.join(buckets.drop("tf"), "tok")
        .join(broadcast(cells), Seq("d", "bucket"))
        .groupBy($"tok", $"tf")
        .agg(min($"cnt").as("est"))
        .select($"tok", $"tf".as("exact"), $"est",
          ($"est" - $"tf").as("overcount"))
        .orderBy($"exact".desc, $"tok")
    },

    // L4k: BM25 ranked retrieval (Robertson–Spärck Jones, k1=1.2,
    // b=0.75) — the serving half of the inverted index TF-IDF only
    // summarizes: score every document against a query set and return
    // the top-10 per query. Queries are DATA-DERIVED so the decl is
    // meaningful at every fixture scale: per language, the 3 highest-
    // frequency non-stopword terms (deterministic tie-break) form that
    // language's query. Scale shape: the (doc, term) postings agg is
    // the one corpus-sized shuffle (materialized once, reused by dl /
    // df / scoring); the query set is bounded (3 × |langs|) and meets
    // the postings in a broadcast equi-join on term; corpus stats
    // (N, avgdl) ride along as a one-row broadcast; per-query top-10
    // is the bounded-heap window idiom. Determinism: ln + the
    // dl/avgdl division are IEEE-identical on identical integers, each
    // per-term score is r6-rounded then DECIMAL-summed (the l4_lm_score
    // discipline), so the hash compare is exact.
    Decl(
      "l4_bm25",
      s"""WITH dt AS (
         |  SELECT doc_id, tok, count(*) AS f
         |  FROM (SELECT doc_id, unnest(${Qh.oToksExpr}) AS tok FROM documents)
         |  GROUP BY doc_id, tok),
         |dl AS (
         |  SELECT doc_id, CAST(sum(f) AS BIGINT) AS dl FROM dt GROUP BY doc_id),
         |nn AS (
         |  SELECT count(*) AS n, CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl FROM dl),
         |df AS (
         |  SELECT tok, count(*) AS df FROM dt GROUP BY tok),
         |lt AS (
         |  SELECT d.lang, t.tok, CAST(sum(t.f) AS BIGINT) AS cnt
         |  FROM dt t JOIN documents d USING (doc_id)
         |  WHERE NOT list_contains($oStopList, t.tok)
         |  GROUP BY d.lang, t.tok),
         |qt AS (
         |  SELECT lang, tok FROM (
         |    SELECT lang, tok,
         |      row_number() OVER (PARTITION BY lang ORDER BY cnt DESC, tok) AS rn
         |    FROM lt) WHERE rn <= 3),
         |sc AS (
         |  SELECT q.lang AS qlang, t.doc_id,
         |    ${Qh.oR6("ln((nn.n - df.df + 0.5) / (df.df + 0.5) + 1.0)" +
                " * (t.f * 2.2) / (t.f + 1.2 * (1.0 - 0.75 + 0.75 * (dl.dl / nn.avgdl)))")} AS s
         |  FROM qt q
         |  JOIN dt t ON t.tok = q.tok
         |  JOIN dl ON dl.doc_id = t.doc_id
         |  JOIN df ON df.tok = q.tok
         |  CROSS JOIN nn),
         |agg AS (
         |  SELECT qlang, doc_id,
         |    CAST(sum(CAST(s AS DECIMAL(18, 6))) AS DOUBLE) AS score
         |  FROM sc GROUP BY qlang, doc_id)
         |SELECT qlang, doc_id, score, rnk FROM (
         |  SELECT qlang, doc_id, score,
         |    row_number() OVER (PARTITION BY qlang ORDER BY score DESC, doc_id) AS rnk
         |  FROM agg) WHERE rnk <= 10
         |ORDER BY qlang, rnk""".stripMargin) { (s, dir) =>
      import s.implicits._
      // postings: the one corpus-sized agg, reused by dl/df/lt/scoring
      val dt = Qh.materialize(
        Qh.t(s, dir, "documents")
          .select($"doc_id", explode(expr(Qh.toksExpr)).as("tok"))
          .groupBy($"doc_id", $"tok").agg(count(lit(1)).as("f")))
      val dl = dt.groupBy($"doc_id").agg(sum($"f").cast(LongType).as("dl"))
      val nn = dl.agg(count(lit(1)).as("n"),
        (sum($"dl").cast(DoubleType) / count(lit(1))).as("avgdl"))
      val dfT = dt.groupBy($"tok").agg(count(lit(1)).as("df"))
      // data-derived query set: top-3 non-stopword terms per language
      val lt = dt.filter(!$"tok".isin(stopwords: _*))
        .join(Qh.t(s, dir, "documents").select($"doc_id", $"lang"), "doc_id")
        .groupBy($"lang", $"tok").agg(sum($"f").cast(LongType).as("cnt"))
      val qw = Window.partitionBy($"lang").orderBy($"cnt".desc, $"tok")
      val qt = lt.withColumn("rn", row_number().over(qw)).filter($"rn" <= 3)
        .select($"lang", $"tok")
      // score: idf * saturated-tf, identical parenthesization as the SQL
      val sCol = Qh.r6(
        log((($"n" - $"df" + 0.5) / ($"df" + 0.5)) + 1.0) *
          ($"f" * 2.2) /
          ($"f" + lit(1.2) * (lit(1.0) - 0.75 + lit(0.75) * ($"dl" / $"avgdl"))))
      // query terms carry their df — the broadcast side stays 3×|langs|
      val sc = broadcast(qt.select($"lang".as("qlang"), $"tok").join(dfT, "tok"))
        .join(dt, "tok")
        .join(dl, "doc_id")
        .crossJoin(broadcast(nn))
        .select($"qlang", $"doc_id", sCol.as("s"))
      val agg = sc.groupBy($"qlang", $"doc_id")
        .agg(sum($"s".cast(DecimalType(18, 6))).cast(DoubleType).as("score"))
      val rw = Window.partitionBy($"qlang").orderBy($"score".desc, $"doc_id")
      agg.withColumn("rnk", row_number().over(rw)).filter($"rnk" <= 10)
        .select($"qlang", $"doc_id", $"score", $"rnk")
        .orderBy("qlang", "rnk")
    },

    // L10: corpus profiling — the ANALYZE-style health check a pipeline
    // runs before training: row/null/distinct counts and value ranges
    // per column, one scan, one partial+final agg (distincts partial-
    // aggregate per group like any countDistinct).
    Decl(
      "l10_profile",
      s"""SELECT count(*) AS n_rows,
         |  count(text) AS text_nonnull,
         |  count(DISTINCT lang) AS n_langs,
         |  count(DISTINCT source) AS n_sources,
         |  min(n_chars) AS min_chars,
         |  max(n_chars) AS max_chars,
         |  CAST(sum(n_chars) AS BIGINT) AS total_chars,
         |  count(*) FILTER (WHERE length(text) = n_chars) AS len_consistent
         |FROM documents""".stripMargin) { (s, dir) =>
      import s.implicits._
      Qh.t(s, dir, "documents")
        .agg(
          count(lit(1)).as("n_rows"),
          count($"text").as("text_nonnull"),
          countDistinct($"lang").as("n_langs"),
          countDistinct($"source").as("n_sources"),
          min($"n_chars").as("min_chars"),
          max($"n_chars").as("max_chars"),
          sum($"n_chars").as("total_chars"),
          count(when(length($"text") === $"n_chars", lit(1))).as("len_consistent"))
    },

    // L5: corpus histograms — lang × source counts + n_chars stats.
    Decl(
      "l5_histogram",
      """SELECT lang, source,
        |  count(*) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS total_chars,
        |  min(n_chars) AS min_chars,
        |  max(n_chars) AS max_chars
        |FROM documents
        |GROUP BY lang, source
        |ORDER BY lang, source""".stripMargin) { (s, dir) =>
      import s.implicits._
      Qh.t(s, dir, "documents")
        .groupBy($"lang", $"source")
        .agg(
          count(lit(1)).as("n_docs"),
          sum($"n_chars").as("total_chars"),
          min($"n_chars").as("min_chars"),
          max($"n_chars").as("max_chars"))
        .orderBy("lang", "source")
    },

    // L4k: BPE VOCABULARY TRAINING LOOP — three unrolled merge rounds
    // of Sennrich et al. (2016), the full inner loop where
    // l4_bpe_pair_stats is one round's selection half. BPE trains on
    // the WORD-FREQUENCY table, not the raw corpus (the standard
    // compression: pair statistics are identical, input shrinks from
    // corpus-sized to vocab-sized after ONE corpus scan). Per round:
    // adjacent-symbol pair counts weighted by word freq (narrow
    // explode + one hash agg), the argmax pair (count desc, pair asc —
    // total-order deterministic; TakeOrdered 1), then the merge
    // applied to every word as a canonical greedy left-to-right FOLD
    // over its symbol array (`aggregate` HOF with the best pair
    // cross-joined as a one-row broadcast — the tfidf scalar pattern).
    // Both engines run the textually-identical fold ('a b a b' with
    // merge (a,b) → 'ab ab'; 'a a a' with (a,a) → 'aa a'), so the
    // oracle replays the same three rounds as unrolled CTEs. Output:
    // the three chosen merges (steps 1-3) + the top-10 surviving
    // symbols by weighted count (step 4). At 100 TB: one corpus scan,
    // then all rounds run on the vocab table — the reason production
    // tokenizer training is feasible at all.
    Decl("l4_bpe_train", oBpeTrainSql) { (s, dir) =>
      import s.implicits._
      val (v, merges) = bpeRounds(s, dir)
      val symCounts = v
        .select($"freq", explode($"syms").as("sym"))
        .groupBy($"sym").agg(sum($"freq").as("cnt"))
        .orderBy($"cnt".desc, $"sym").limit(10)
        .select(lit(4L).as("step"), $"sym".as("item"), $"cnt")
      merges.reduce(_ unionAll _).unionAll(symCounts)
        .orderBy("step", "item")
    },

    // L4k2: BPE ENCODING (the serving half of l4_bpe_train): apply the
    // trained merge table to the whole corpus. The encoder is a JOIN,
    // not a re-computation — every document word equi-joins the final
    // vocab's (word → symbol split), the split was computed ONCE at
    // training; per-doc stats (chars vs encoded symbols) fall out of
    // one doc-keyed agg. At 100 TB this is exactly how corpus
    // tokenization deploys: the vocab table broadcasts (it is
    // vocabulary-sized), the corpus streams through map-side. Output:
    // per-doc word/char/symbol counts + the 1e-6-rounded compression
    // ratio (symbols per char; < 1 once merges bite).
    Decl("l4_bpe_encode", oBpeEncodeSql) { (s, dir) =>
      import s.implicits._
      val (v, _) = bpeRounds(s, dir)
      Qh.t(s, dir, "documents")
        .select($"doc_id", explode(expr(Qh.toksExpr)).as("w"))
        .join(broadcast(v.select($"w", $"syms")), Seq("w"))
        .groupBy($"doc_id")
        .agg(
          count(lit(1)).as("n_words"),
          sum(length($"w")).cast(LongType).as("n_chars"),
          sum(size($"syms")).cast(LongType).as("n_symbols"))
        .select($"doc_id", $"n_words", $"n_chars", $"n_symbols",
          Qh.r6($"n_symbols".cast(DoubleType) / $"n_chars".cast(DoubleType))
            .as("ratio"))
        .orderBy("doc_id")
    },

    // L4j: BIGRAM-LM QUALITY SCORE — the perplexity-style filter of the
    // CCNet pipeline (Wenzek et al. 2020): train an add-k-smoothed
    // bigram language model on the corpus, score every document by its
    // mean log P(w_i | w_{i-1}), low scores = boilerplate/gibberish.
    // Shape at 100 TB: tokenize is a narrow map; the bigram/unigram
    // count tables are single hash aggs on well-distributed token keys;
    // scoring joins the doc-bigram stream to the count tables on those
    // SAME keys, so the count agg's output partitioning is reused (no
    // second exchange on the build side); the vocab size is a one-row
    // broadcast. The multiply-consumed bigram and unigram subtrees are
    // materialized once (Catalyst does not reuse exchanges across
    // consumers — the LSH-signature lesson). Determinism: each log-prob
    // is IEEE-rounded at 6 decimals, the per-doc mean is an exact
    // DECIMAL sum over those rounded terms (order-independent) divided
    // by the count — both engines run identical instructions.
    Decl(
      "l4_lm_score",
      s"""WITH d AS (SELECT doc_id, ${Qh.oToksExpr} AS t FROM documents),
         |bg AS (
         |  SELECT doc_id,
         |    unnest(list_transform(range(1, len(t)), i -> t[i])) AS w1,
         |    unnest(list_transform(range(1, len(t)), i -> t[i+1])) AS w2
         |  FROM d WHERE len(t) >= 2),
         |uni AS (
         |  SELECT tok, count(*) AS n1
         |  FROM (SELECT unnest(${Qh.oToksExpr}) AS tok FROM documents)
         |  GROUP BY tok),
         |big AS (SELECT w1, w2, count(*) AS n2 FROM bg GROUP BY w1, w2),
         |v AS (SELECT CAST(count(*) AS DOUBLE) AS v FROM uni),
         |scored AS (
         |  SELECT bg.doc_id,
         |    ${Qh.oR6("ln((big.n2 + 0.5) / (uni.n1 + 0.5 * v.v))")} AS lp
         |  FROM bg
         |  JOIN big ON bg.w1 = big.w1 AND bg.w2 = big.w2
         |  JOIN uni ON bg.w1 = uni.tok
         |  CROSS JOIN v)
         |SELECT doc_id,
         |  CAST(count(*) AS BIGINT) AS n_bigrams,
         |  ${Qh.oR6(s"(${Qh.oSum6("lp")} / count(*))")} AS avg_logprob
         |FROM scored
         |GROUP BY doc_id
         |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      import s.implicits._
      val docs = Qh.t(s, dir, "documents")
      val bg = Qh.materialize(
        docs.select($"doc_id", expr(Qh.toksExpr).as("t"))
          .filter(size($"t") >= 2)
          .select($"doc_id", explode(expr(
            "transform(sequence(0, size(t) - 2), " +
              "i -> named_struct('w1', t[i], 'w2', t[i + 1]))")).as("b"))
          .select($"doc_id", $"b.w1".as("w1"), $"b.w2".as("w2")))
      val uni = Qh.materialize(
        docs.select(explode(expr(Qh.toksExpr)).as("tok"))
          .groupBy($"tok").agg(count(lit(1)).as("n1")))
      val big = bg.groupBy($"w1", $"w2").agg(count(lit(1)).as("n2"))
      val v = uni.agg(count(lit(1)).cast(DoubleType).as("v"))
      bg.join(big, Seq("w1", "w2"))
        .join(uni.withColumnRenamed("tok", "w1"), Seq("w1"))
        .crossJoin(broadcast(v))
        .select($"doc_id",
          Qh.r6(log(($"n2" + lit(0.5)) / ($"n1" + lit(0.5) * $"v"))).as("lp"))
        .groupBy($"doc_id")
        .agg(
          count(lit(1)).cast(LongType).as("n_bigrams"),
          Qh.r6(Qh.sumd6($"lp") / count(lit(1))).as("avg_logprob"))
        .orderBy("doc_id")
    },

    // L4m: REPETITION filters (Rae et al. 2021, "Scaling Language
    // Models: … Gopher" §A1.1) — the n-gram repetition members of the
    // Gopher quality rule set, next to the length/stopword members
    // l4_quality already applies: (a) the fraction of tokens covered by
    // the single most frequent 2-gram (their "top n-gram character
    // fraction"), (b) the fraction of 3-gram instances that are
    // repeats of an earlier 3-gram in the same doc ("duplicate n-gram
    // fraction"). Both are DOC-LOCAL: the per-doc gram multiset is
    // sorted and the max multiplicity read off as the longest run
    // (max gap between consecutive run-start positions) — identical
    // O(n log n) integer array ops in both engines, so
    // no (doc, gram) shuffle exists at all. The whole query is a
    // narrow map over the scan + the output sort: scan-bandwidth-bound
    // at 100 TB, the ideal quality-filter shape (corpus-sized groupBys
    // for per-DOC stats are the anti-pattern this decl avoids).
    // Thresholds are fixture-calibrated (Gopher's published 0.20 /
    // 0.18-sliding-by-n keep everything here); integer counts + one
    // r6-rounded division keep the hash compare exact.
    Decl(
      "l4_repetition",
      s"""WITH t AS (
         |  SELECT doc_id, ${Qh.oToksExpr} AS toks FROM documents),
         |g AS (
         |  SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_toks,
         |    list_transform(range(len(toks) - 1),
         |      i -> toks[i+1] || ' ' || toks[i+2]) AS g2,
         |    list_transform(range(len(toks) - 2),
         |      i -> toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3]) AS g3
         |  FROM t WHERE len(toks) >= 3),
         |srt AS (
         |  SELECT doc_id, n_toks, g3, list_sort(g2) AS sg FROM g),
         |st AS (
         |  SELECT doc_id, n_toks, g3, sg,
         |    list_filter(list_transform(range(1, len(sg) + 1),
         |      i -> CASE WHEN i = 1 THEN i
         |                WHEN sg[i] <> sg[i-1] THEN i ELSE 0 END),
         |      p -> p > 0) AS starts
         |  FROM srt),
         |r AS (
         |  SELECT doc_id, n_toks,
         |    CAST(list_aggregate(
         |      list_transform(range(len(starts)),
         |        k -> (CASE WHEN k = len(starts) - 1 THEN len(sg) + 1
         |                   ELSE starts[k+2] END) - starts[k+1]),
         |      'max') AS BIGINT) AS top2_cnt,
         |    CAST(len(g3) AS BIGINT) AS n3,
         |    CAST(len(list_distinct(g3)) AS BIGINT) AS d3
         |  FROM st)
         |SELECT doc_id, n_toks, top2_cnt,
         |  ${Qh.oR6("2.0 * top2_cnt / n_toks")} AS top2_score,
         |  ${Qh.oR6("CAST(n3 - d3 AS DOUBLE) / CAST(n3 AS DOUBLE)")} AS dup3_frac,
         |  (${Qh.oR6("2.0 * top2_cnt / n_toks")} <= 0.1
         |   AND ${Qh.oR6("CAST(n3 - d3 AS DOUBLE) / CAST(n3 AS DOUBLE)")} <= 0.02) AS keep
         |FROM r ORDER BY doc_id""".stripMargin) { (s, dir) =>
      import s.implicits._
      // max 2-gram multiplicity = longest run in the SORTED per-doc
      // gram list (equal grams are adjacent after the sort), read off
      // as the max difference between consecutive run-start positions
      // — integer-only array ops, identical in both engines (struct
      // folds are avoided deliberately: DuckDB 1.0 mis-evaluates
      // sibling struct fields that share a subexpression in
      // list_reduce lambdas)
      val startsExpr =
        """filter(transform(sequence(1, size(sg)),
          |  i -> IF(i = 1, i,
          |         IF(element_at(sg, i) != element_at(sg, i - 1), i, 0))),
          |  p -> p > 0)""".stripMargin
      val maxRunExpr =
        """CAST(array_max(transform(sequence(0, size(starts) - 1),
          |  k -> IF(k = size(starts) - 1, size(sg) + 1,
          |          element_at(starts, k + 2)) - element_at(starts, k + 1)))
          |  AS BIGINT)""".stripMargin
      Qh.t(s, dir, "documents")
        .select($"doc_id", expr(Qh.toksExpr).as("toks"))
        .filter(size($"toks") >= 3)
        .select($"doc_id",
          size($"toks").cast(LongType).as("n_toks"),
          expr("transform(sequence(0, size(toks) - 2), " +
            "i -> concat(toks[i], ' ', toks[i + 1]))").as("g2"),
          expr("transform(sequence(0, size(toks) - 3), " +
            "i -> concat(toks[i], ' ', toks[i + 1], ' ', toks[i + 2]))").as("g3"))
        .withColumn("sg", array_sort($"g2"))
        .withColumn("starts", expr(startsExpr))
        .select($"doc_id", $"n_toks",
          expr(maxRunExpr).as("top2_cnt"),
          size($"g3").cast(LongType).as("n3"),
          size(array_distinct($"g3")).cast(LongType).as("d3"))
        .select($"doc_id", $"n_toks", $"top2_cnt",
          Qh.r6(lit(2.0) * $"top2_cnt" / $"n_toks").as("top2_score"),
          Qh.r6(($"n3" - $"d3").cast(DoubleType) / $"n3".cast(DoubleType))
            .as("dup3_frac"))
        .withColumn("keep", $"top2_score" <= 0.1 && $"dup3_frac" <= 0.02)
        .orderBy("doc_id")
    },

    // L10b: CORPUS DRIFT — Jensen–Shannon divergence between the token
    // distributions of two source cohorts, per language (Lin 1991; the
    // standard "did this ingest batch change the data?" monitor in a
    // training-data pipeline, next to l10_profile's point-in-time
    // snapshot). Cohorts split by source hash so the decl is
    // data-derived at every scale. Shape: ONE (lang, token) agg with
    // both cohort counts as conditional sums (map-side combined — the
    // cohort split costs nothing extra), per-lang totals broadcast
    // back, then per-token JS terms and a per-lang sum. Determinism:
    // p and q are double divisions of identical integers, each JS term
    // is fixed-point-rounded at 1e-12 (the terms are ~1e-4 — the
    // l4_lm r6-per-term discipline, rescaled) and summed as exact
    // DECIMAL(28,12), so the hash compare is exact. At 100 TB this is
    // the l4_term_freq scan + a vocab-sized tail.
    Decl(
      "l10_drift",
      s"""WITH tf AS (
         |  SELECT lang, tok,
         |    CAST(sum(CASE WHEN ${Qh.oPhash("source", 61)} % 2 = 0
         |                  THEN 1 ELSE 0 END) AS BIGINT) AS tfa,
         |    CAST(sum(CASE WHEN ${Qh.oPhash("source", 61)} % 2 = 0
         |                  THEN 0 ELSE 1 END) AS BIGINT) AS tfb
         |  FROM (SELECT lang, source, unnest(${Qh.oToksExpr}) AS tok
         |        FROM documents)
         |  GROUP BY lang, tok),
         |tot AS (
         |  SELECT lang, CAST(sum(tfa) AS BIGINT) AS ta,
         |    CAST(sum(tfb) AS BIGINT) AS tb
         |  FROM tf GROUP BY lang),
         |pq AS (
         |  SELECT f.lang, CAST(f.tfa AS DOUBLE) / CAST(t.ta AS DOUBLE) AS p,
         |         CAST(f.tfb AS DOUBLE) / CAST(t.tb AS DOUBLE) AS q
         |  FROM tf f JOIN tot t USING (lang)),
         |terms AS (
         |  SELECT lang,
         |    ${Qh.oR("CASE WHEN p > 0 THEN p * ln(p / ((p + q) / 2.0)) ELSE 0 END * 0.5 + CASE WHEN q > 0 THEN q * ln(q / ((p + q) / 2.0)) ELSE 0 END * 0.5", 1000000000000L)} AS t
         |  FROM pq)
         |SELECT m.lang, t2.ta, t2.tb,
         |  ${Qh.oR6("CAST(sum(CAST(m.t AS DECIMAL(28,12))) AS DOUBLE)")} AS js_div,
         |  CAST(count(*) AS BIGINT) AS n_tokens
         |FROM terms m JOIN tot t2 USING (lang)
         |GROUP BY m.lang, t2.ta, t2.tb
         |ORDER BY m.lang""".stripMargin) { (s, dir) =>
      import s.implicits._
      val tf = Qh.materialize(
        Qh.t(s, dir, "documents")
          .select($"lang",
            (Qh.phash($"source", 61) % 2 === 0).as("isa"),
            explode(expr(Qh.toksExpr)).as("tok"))
          .groupBy($"lang", $"tok")
          .agg(
            sum(when($"isa", 1L).otherwise(0L)).as("tfa"),
            sum(when($"isa", 0L).otherwise(1L)).as("tfb")))
      val tot = tf.groupBy($"lang")
        .agg(sum($"tfa").as("ta"), sum($"tfb").as("tb"))
      val half = ($"p" + $"q") / lit(2.0)
      val term =
        when($"p" > 0, $"p" * log($"p" / half)).otherwise(lit(0.0)) * 0.5 +
          when($"q" > 0, $"q" * log($"q" / half)).otherwise(lit(0.0)) * 0.5
      tf.join(broadcast(tot), "lang")
        .select($"lang",
          ($"tfa".cast(DoubleType) / $"ta".cast(DoubleType)).as("p"),
          ($"tfb".cast(DoubleType) / $"tb".cast(DoubleType)).as("q"))
        .select($"lang", Qh.r(term, 1000000000000L).as("t"))
        .groupBy($"lang")
        .agg(
          Qh.r6(sum($"t".cast(DecimalType(28, 12))).cast(DoubleType)).as("js_div"),
          count(lit(1)).as("n_tokens"))
        .join(broadcast(tot), "lang")
        .select($"lang", $"ta", $"tb", $"js_div", $"n_tokens")
        .orderBy("lang")
    },

    // L10d: KOLMOGOROV–SMIRNOV two-sample drift test — the proper
    // statistical companion to l10_drift's JS divergence: D = sup over
    // x of |ECDF_A(x) − ECDF_B(x)| for the per-doc TOKEN-COUNT
    // distribution, cohorts split by the same source hash as
    // l10_drift. JS asks "did the token MIX move"; KS asks "did the
    // document LENGTH distribution move" — the two failure modes of an
    // ingest pipeline (content drift vs truncation/concatenation
    // bugs). Everything is integer until one final division: the sup
    // is max |cumA·nB − cumB·nA| over the VALUE-DOMAIN-sized distinct
    // count table (the cumsum window runs on lang × distinct-length —
    // hundreds of rows, never the corpus), and D divides once at the
    // end — exact cross-engine with no per-step rounding.
    Decl(
      "l10_ks_drift",
      s"""WITH d AS (
         |  SELECT lang,
         |    CASE WHEN ${Qh.oPhash("source", 61)} % 2 = 0 THEN 0 ELSE 1 END AS cohort,
         |    len(${Qh.oToksExpr}) AS v
         |  FROM documents),
         |c AS (
         |  SELECT lang, v,
         |    CAST(sum(CASE WHEN cohort = 0 THEN 1 ELSE 0 END) AS BIGINT) AS ca,
         |    CAST(sum(CASE WHEN cohort = 1 THEN 1 ELSE 0 END) AS BIGINT) AS cb
         |  FROM d GROUP BY lang, v),
         |t AS (
         |  SELECT lang, CAST(sum(ca) AS BIGINT) AS na,
         |    CAST(sum(cb) AS BIGINT) AS nb
         |  FROM c GROUP BY lang),
         |cum AS (
         |  SELECT lang, v,
         |    sum(ca) OVER (PARTITION BY lang ORDER BY v) AS cuma,
         |    sum(cb) OVER (PARTITION BY lang ORDER BY v) AS cumb
         |  FROM c)
         |SELECT cum.lang, t.na, t.nb,
         |  ${Qh.oR6("CAST(max(abs(cuma * nb - cumb * na)) AS DOUBLE) / (CAST(na AS DOUBLE) * CAST(nb AS DOUBLE))")} AS ks
         |FROM cum JOIN t ON t.lang = cum.lang
         |GROUP BY cum.lang, t.na, t.nb
         |ORDER BY cum.lang""".stripMargin) { (s, dir) =>
      import s.implicits._
      val counts = Qh.t(s, dir, "documents")
        .select($"lang",
          (Qh.phash($"source", 61) % 2 === 0).as("isa"),
          size(expr(Qh.toksExpr)).cast(LongType).as("v"))
        .groupBy($"lang", $"v")
        .agg(
          sum(when($"isa", 1L).otherwise(0L)).as("ca"),
          sum(when($"isa", 0L).otherwise(1L)).as("cb"))
      val tot = counts.groupBy($"lang")
        .agg(sum($"ca").as("na"), sum($"cb").as("nb"))
      val byV = org.apache.spark.sql.expressions.Window
        .partitionBy($"lang").orderBy($"v")
      counts
        .withColumn("cuma", sum($"ca").over(byV))
        .withColumn("cumb", sum($"cb").over(byV))
        .join(broadcast(tot), "lang")
        .groupBy($"lang", $"na", $"nb")
        .agg(Qh.r6(
          max(abs($"cuma" * $"nb" - $"cumb" * $"na")).cast(DoubleType) /
            ($"na".cast(DoubleType) * $"nb".cast(DoubleType))).as("ks"))
        .select($"lang", $"na", $"nb", $"ks")
        .orderBy("lang")
    },

    // L10c: ZIPF rank–frequency fit per language — the power-law
    // diagnostic (Zipf 1949) next to l10_profile's health check and
    // l10_drift's divergence monitor: fit ln f = slope·ln r + b by
    // closed-form least squares over the ranked term table; a corpus
    // whose slope drifts from its baseline has changed its token
    // distribution's SHAPE (dedup artifacts, boilerplate floods, or
    // template spam all flatten/steepen the curve). Shape: the (lang,
    // token) frequency agg is the one corpus-sized shuffle (the
    // l4_term_freq scan); ranking and the moment sums run on the
    // VOCAB-sized table. Determinism: ln over identical doubles, every
    // x/y/xy/xx term fixed-point-rounded at 1e-12 then DECIMAL-summed
    // (the l10_drift discipline), and both engines evaluate the same
    // closed-form slope/intercept division on identical doubles.
    Decl(
      "l10_zipf",
      s"""WITH tf AS (
         |  SELECT lang, tok, CAST(count(*) AS BIGINT) AS f
         |  FROM (SELECT lang, unnest(${Qh.oToksExpr}) AS tok FROM documents)
         |  GROUP BY lang, tok),
         |rk AS (
         |  SELECT lang, tok, f,
         |    row_number() OVER (PARTITION BY lang ORDER BY f DESC, tok) AS r
         |  FROM tf),
         |xy AS (
         |  SELECT lang,
         |    ${Qh.oR("ln(CAST(r AS DOUBLE))", 1000000000000L)} AS x,
         |    ${Qh.oR("ln(CAST(f AS DOUBLE))", 1000000000000L)} AS y
         |  FROM rk),
         |mo AS (
         |  SELECT lang, CAST(count(*) AS DOUBLE) AS n,
         |    CAST(sum(CAST(x AS DECIMAL(28,12))) AS DOUBLE) AS sx,
         |    CAST(sum(CAST(y AS DECIMAL(28,12))) AS DOUBLE) AS sy,
         |    CAST(sum(CAST(${Qh.oR("x * y", 1000000000000L)} AS DECIMAL(28,12))) AS DOUBLE) AS sxy,
         |    CAST(sum(CAST(${Qh.oR("x * x", 1000000000000L)} AS DECIMAL(28,12))) AS DOUBLE) AS sxx
         |  FROM xy GROUP BY lang)
         |SELECT lang, CAST(n AS BIGINT) AS n_terms,
         |  ${Qh.oR6("(n * sxy - sx * sy) / (n * sxx - sx * sx)")} AS slope,
         |  ${Qh.oR6("(sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n")} AS intercept
         |FROM mo ORDER BY lang""".stripMargin) { (s, dir) =>
      import s.implicits._
      val tf = Qh.t(s, dir, "documents")
        .select($"lang", explode(expr(Qh.toksExpr)).as("tok"))
        .groupBy($"lang", $"tok").agg(count(lit(1)).as("f"))
      val wr = Window.partitionBy($"lang").orderBy($"f".desc, $"tok")
      val fp = 1000000000000L
      val xy = tf.withColumn("r", row_number().over(wr))
        .select($"lang",
          Qh.r(log($"r".cast(DoubleType)), fp).as("x"),
          Qh.r(log($"f".cast(DoubleType)), fp).as("y"))
      val mo = xy.groupBy($"lang").agg(
        count(lit(1)).cast(DoubleType).as("n"),
        sum($"x".cast(DecimalType(28, 12))).cast(DoubleType).as("sx"),
        sum($"y".cast(DecimalType(28, 12))).cast(DoubleType).as("sy"),
        sum(Qh.r($"x" * $"y", fp).cast(DecimalType(28, 12)))
          .cast(DoubleType).as("sxy"),
        sum(Qh.r($"x" * $"x", fp).cast(DecimalType(28, 12)))
          .cast(DoubleType).as("sxx"))
      val slope = ($"n" * $"sxy" - $"sx" * $"sy") /
        ($"n" * $"sxx" - $"sx" * $"sx")
      mo.select($"lang", $"n".cast(LongType).as("n_terms"),
          Qh.r6(slope).as("slope"),
          Qh.r6(($"sy" - slope * $"sx") / $"n").as("intercept"))
        .orderBy("lang")
    },

    // L9c: WEIGHTED MIXTURE INTERLEAVE — the deterministic epoch ORDER
    // a training dataloader consumes: stride scheduling (the classic
    // weighted-fair-queueing discipline) over per-language streams
    // with target weights en:4 de:2 others:1 — doc at within-stream
    // rank r is served at virtual time r/w, so the merged order holds
    // each stream to its weight at every prefix, not just in
    // expectation (what samplers give). vt = r/w with w ∈ {4,2,1} is
    // an exact binary division — bit-identical cross-engine with no
    // rounding discipline needed. The first 200 positions of the epoch
    // are declared; only docs at within-stream rank ≤ 200·max_w/min_w
    // = 800 can reach them (vt cutoff ≤ 200), so the engine cuts each
    // stream on the BOUNDED-HEAP TopKPerGroup operator FIRST — no
    // full-corpus window sort, no skewed lang-partitioned sort; the
    // stride merge then runs on ≤ 800·n_langs survivors. At 100 TB
    // serving a full epoch order this way is a range-partitioned sort
    // on vt; the prefix form here is the bounded probe of the same
    // discipline (PlanSpec pins TopKPerGroupExec + no full Window
    // before it).
    Decl(
      "l9_mixture_interleave",
      """WITH r AS (
        |  SELECT doc_id, lang,
        |    row_number() OVER (PARTITION BY lang ORDER BY doc_id) AS r
        |  FROM documents),
        |v AS (
        |  SELECT doc_id, lang,
        |    CAST(r AS DOUBLE) / (CASE WHEN lang = 'en' THEN 4.0
        |                              WHEN lang = 'de' THEN 2.0
        |                              ELSE 1.0 END) AS vt
        |  FROM r),
        |s AS (
        |  SELECT doc_id, lang, vt,
        |    row_number() OVER (ORDER BY vt, lang, doc_id) AS global_pos
        |  FROM v)
        |SELECT CAST(global_pos AS BIGINT) AS global_pos, lang, doc_id, vt
        |FROM s WHERE global_pos <= 200
        |ORDER BY global_pos""".stripMargin) { (s, dir) =>
      import s.implicits._
      val survivors = graft.plans.TopKPerGroup(
        Qh.t(s, dir, "documents").select($"doc_id", $"lang"),
        groupCols = Seq("lang"),
        orderSpec = Seq(("doc_id", true)),
        k = 800)
      val byLang = org.apache.spark.sql.expressions.Window
        .partitionBy($"lang").orderBy($"doc_id")
      val merged = survivors
        .withColumn("r", row_number().over(byLang))
        .withColumn("vt", $"r".cast(DoubleType) /
          when($"lang" === "en", 4.0)
            .when($"lang" === "de", 2.0).otherwise(1.0))
        .orderBy($"vt", $"lang", $"doc_id")
        .limit(200)
      merged
        .withColumn("global_pos",
          row_number().over(org.apache.spark.sql.expressions.Window
            .orderBy($"vt", $"lang", $"doc_id")).cast(LongType))
        .select($"global_pos", $"lang", $"doc_id", $"vt")
        .orderBy("global_pos")
    },

    // L4n: PMI PHRASE MINING — pointwise mutual information over
    // adjacent token pairs, the classic collocation detector (word2vec
    // phrase pass, Mikolov et al. 2013): PMI = ln(p(ab)/(p(a)p(b))),
    // high when a bigram co-occurs far above chance — the phrases a
    // tokenizer or n-gram vocabulary should treat as units. Corpus
    // side is two hash aggs (vocab-sized unigrams, (w1,w2)-keyed
    // bigrams with partial combine), unigram counts joined back twice
    // (unhinted — AQE broadcasts iff the vocab is actually small),
    // totals a one-row broadcast, top-50 a TakeOrdered — no sort of
    // the full bigram table, no cartesian beyond the one-row totals. The c_ab >= 5 floor is the standard
    // noise gate (PMI is maximized by hapax pairs without it). ln
    // rides the r6 discipline BM25 proved cross-engine-stable; the
    // division shapes are kept identical on both sides so the doubles
    // match bit-for-bit.
    Decl(
      "l4_pmi_phrases",
      s"""WITH d AS (SELECT doc_id, ${Qh.oToksExpr} AS t FROM documents),
         |bg AS (
         |  SELECT unnest(list_transform(range(1, len(t)), i -> t[i])) AS w1,
         |    unnest(list_transform(range(1, len(t)), i -> t[i+1])) AS w2
         |  FROM d WHERE len(t) >= 2),
         |uni AS (SELECT unnest(t) AS tok FROM d),
         |uc AS (SELECT tok, count(*) AS c FROM uni GROUP BY tok),
         |tot AS (
         |  SELECT (SELECT CAST(count(*) AS DOUBLE) FROM uni) AS m_toks,
         |    (SELECT CAST(count(*) AS DOUBLE) FROM bg) AS n_bg),
         |cab AS (
         |  SELECT w1, w2, count(*) AS c_ab FROM bg
         |  GROUP BY w1, w2 HAVING count(*) >= 5)
         |SELECT w1, w2, CAST(c_ab AS BIGINT) AS c_ab,
         |  ${Qh.oR6("ln((CAST(c_ab AS DOUBLE) / n_bg) / " +
            "((CAST(a.c AS DOUBLE) / m_toks) * (CAST(b.c AS DOUBLE) / m_toks)))")} AS pmi
         |FROM cab
         |JOIN uc a ON a.tok = w1
         |JOIN uc b ON b.tok = w2
         |CROSS JOIN tot
         |ORDER BY pmi DESC, w1, w2
         |LIMIT 50""".stripMargin) { (s, dir) =>
      import s.implicits._
      val toks = Qh.t(s, dir, "documents")
        .select(expr(Qh.toksExpr).as("toks"))
      val bigrams = toks.filter(size($"toks") >= 2)
        .select(explode(zip_with(
          slice($"toks", lit(1), size($"toks") - 1),
          slice($"toks", lit(2), size($"toks") - 1),
          (a, b) => struct(a.as("w1"), b.as("w2")))).as("bg"))
        .select($"bg.w1".as("w1"), $"bg.w2".as("w2"))
      val uni = toks.select(explode($"toks").as("tok"))
        .groupBy($"tok").agg(count(lit(1)).as("c"))
      val totals = uni.agg(sum($"c").cast(DoubleType).as("m_toks"))
        .crossJoin(bigrams.agg(count(lit(1)).cast(DoubleType).as("n_bg")))
      // The unigram joins carry NO broadcast hint: the unigram table is
      // vocab-sized, and a 100 TB multilingual corpus holds 10⁷–10⁸
      // distinct tokens — force-broadcasting that OOMs the driver. Both
      // joins key on the surviving-bigram side's own columns, so the
      // static plan is a pair of shuffled hash joins whose build side is
      // the threshold-gated cab table, and AQE converts to broadcast at
      // runtime exactly when the unigram table is genuinely small (it is
      // at fixture scale). Only the one-row totals keep an explicit
      // broadcast — always safe by construction.
      bigrams.groupBy($"w1", $"w2").agg(count(lit(1)).as("c_ab"))
        .filter($"c_ab" >= 5)
        .join(uni.select($"tok".as("w1"), $"c".as("c_a")), "w1")
        .join(uni.select($"tok".as("w2"), $"c".as("c_b")), "w2")
        .crossJoin(broadcast(totals))
        .select($"w1", $"w2", $"c_ab",
          Qh.r6(log(($"c_ab".cast(DoubleType) / $"n_bg") /
            (($"c_a".cast(DoubleType) / $"m_toks") *
              ($"c_b".cast(DoubleType) / $"m_toks")))).as("pmi"))
        .orderBy($"pmi".desc, $"w1", $"w2")
        .limit(50)
    },

    // L15: LEAKAGE-SAFE SPLIT — train/eval assignment BY CLUSTER, not by
    // row: every member of a duplicate cluster lands in the same split,
    // so no copy of an eval document can sit in train (the train/test
    // contamination a row-level split causes whenever the corpus holds
    // duplicates — which at 100 TB it always does). Corpus: each doc
    // replicated 1–3× exactly (deterministic, both engines build the
    // same multiset); cluster = content hash, representative = min id,
    // split = portable hash OF THE REPRESENTATIVE. The 'naive_leak' leg
    // quantifies what the row-level split would have leaked (clusters
    // straddling the boundary) — positive by construction, zero under
    // the cluster split. Scale: one shuffle keyed on the content hash
    // (window min + the straddle agg share the exchange under AQE);
    // the split itself is a map-side hash — no global state.
    Decl(
      "l15_cluster_split",
      s"""WITH corpus AS (
         |  SELECT doc_id * 10 + unnest(generate_series(0, doc_id % 3)) AS copy_id,
         |    text
         |  FROM documents),
         |clustered AS (
         |  SELECT copy_id, md5(text) AS h,
         |    min(copy_id) OVER (PARTITION BY md5(text)) AS rep
         |  FROM corpus),
         |assigned AS (
         |  SELECT copy_id, h,
         |    CASE WHEN ${Qh.oPhash("CAST(rep AS VARCHAR)", 17)} % 10 <= 7
         |      THEN 'train' ELSE 'eval' END AS split,
         |    CASE WHEN ${Qh.oPhash("CAST(copy_id AS VARCHAR)", 17)} % 10 <= 7
         |      THEN 'train' ELSE 'eval' END AS naive_split
         |  FROM clustered)
         |SELECT 'cluster' AS leg, split, CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(count(DISTINCT h) AS BIGINT) AS n_clusters
         |FROM assigned GROUP BY split
         |UNION ALL
         |SELECT 'naive_leak', '-', CAST(count(*) AS BIGINT),
         |  CAST(count(DISTINCT h) AS BIGINT)
         |FROM assigned WHERE h IN (
         |  SELECT h FROM assigned GROUP BY h
         |  HAVING count(DISTINCT naive_split) > 1)
         |ORDER BY leg, split""".stripMargin) { (s, dir) =>
      import s.implicits._
      // ONE shuffle keyed on the content hash: the corpus collapses to
      // one row per cluster (rep, size, naive-split spread) in a single
      // map-side-combined agg; every leg then derives from the
      // cluster-level frame (corpus-of-clusters-sized, not corpus-sized)
      val corpus = Qh.t(s, dir, "documents")
        .select($"doc_id", $"text")
        .withColumn("k", explode(sequence(lit(0L), $"doc_id" % 3)))
        .select(($"doc_id" * 10 + $"k").as("copy_id"), $"text")
      val clusters = corpus
        .withColumn("h", md5($"text"))
        .withColumn("naive_train",
          (Qh.phash($"copy_id".cast(StringType), 17) % 10 <= 7)
            .cast("long"))
        .groupBy($"h")
        .agg(count(lit(1)).as("n"), min($"copy_id").as("rep"),
          sum($"naive_train").as("n_naive_train"))
        .withColumn("split",
          when(Qh.phash($"rep".cast(StringType), 17) % 10 <= 7, "train")
            .otherwise("eval"))
      // both legs in ONE pass over the cluster frame (a second consumer
      // would recompute the corpus shuffle): each cluster contributes
      // its ('cluster', split) row and a ('naive_leak', '-') row whose
      // n is NULL unless the naive row-split straddles it — the agg
      // counts/sums only non-null n, so the naive_leak group is
      // UNCONDITIONAL (a straddle-free corpus yields (0, 0), exactly
      // the oracle's ungrouped-aggregate row, instead of a missing one)
      clusters
        .select(explode(array(
          struct(lit("cluster").as("leg"), $"split", $"n"),
          struct(lit("naive_leak").as("leg"), lit("-").as("split"),
            when($"n_naive_train" > 0 && $"n_naive_train" < $"n", $"n")
              .as("n")))).as("r"))
        .groupBy($"r.leg".as("leg"), $"r.split".as("split"))
        .agg(coalesce(sum($"r.n"), lit(0L)).cast("long").as("n_docs"),
          count($"r.n").as("n_clusters"))
        .orderBy("leg", "split")
    },

    // L16: PII DETECTION + REDACTION — the scrub stage every
    // training-data pipeline runs before anything else sees the text:
    // pattern-classes (email, NANP-style phone, IPv4) detected with
    // RE2-safe regexes (no backreferences — identical semantics in
    // Spark's Java regex and the oracle's RE2), replaced with typed
    // placeholders, and PROFILED per source (docs touched, hits per
    // class, characters removed — the redaction-rate report that
    // decides whether a source is quarantined). The PII is seeded
    // deterministically from doc_id so the decl is self-contained and
    // every count is oracle-checkable. Scale: pure narrow projection —
    // codegen'd regexp_replace/extract_all, no shuffle before the
    // per-source agg, pushdown-friendly.
    Decl(
      "l16_pii_redact",
      s"""WITH seeded AS (
         |  SELECT doc_id, source,
         |    text ||
         |      CASE WHEN doc_id % 7 = 0
         |        THEN ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com now'
         |        ELSE '' END ||
         |      CASE WHEN doc_id % 11 = 0
         |        THEN ' call +1-555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') || ' today'
         |        ELSE '' END ||
         |      CASE WHEN doc_id % 13 = 0
         |        THEN ' from 10.' || CAST(doc_id % 256 AS VARCHAR) || '.0.' || CAST(doc_id % 100 AS VARCHAR)
         |        ELSE '' END
         |      AS text
         |  FROM documents),
         |redacted AS (
         |  SELECT doc_id, source, text,
         |    regexp_replace(
         |      regexp_replace(
         |        regexp_replace(text,
         |          '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '[EMAIL]', 'g'),
         |        '\\+1-555-[0-9]{4}', '[PHONE]', 'g'),
         |      '10\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}', '[IP]', 'g') AS clean,
         |    len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}')) AS n_email,
         |    len(regexp_extract_all(text, '\\+1-555-[0-9]{4}')) AS n_phone,
         |    len(regexp_extract_all(text, '10\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}')) AS n_ip
         |  FROM seeded)
         |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(count(*) FILTER (WHERE clean <> text) AS BIGINT) AS n_redacted,
         |  CAST(sum(n_email) AS BIGINT) AS emails,
         |  CAST(sum(n_phone) AS BIGINT) AS phones,
         |  CAST(sum(n_ip) AS BIGINT) AS ips,
         |  CAST(sum(len(text) - len(clean)) AS BIGINT) AS chars_removed
         |FROM redacted GROUP BY source ORDER BY source""".stripMargin) { (s, dir) =>
      import s.implicits._
      val email = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
      val phone = "\\+1-555-[0-9]{4}"
      val ip = "10\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}"
      val seeded = Qh.t(s, dir, "documents").select($"doc_id", $"source",
        concat($"text",
          when($"doc_id" % 7 === 0, concat(lit(" contact user"),
            $"doc_id".cast(StringType), lit("@example.com now")))
            .otherwise(lit("")),
          when($"doc_id" % 11 === 0, concat(lit(" call +1-555-"),
            lpad(($"doc_id" % 10000).cast(StringType), 4, "0"),
            lit(" today"))).otherwise(lit("")),
          when($"doc_id" % 13 === 0, concat(lit(" from 10."),
            ($"doc_id" % 256).cast(StringType), lit(".0."),
            ($"doc_id" % 100).cast(StringType))).otherwise(lit("")))
          .as("text"))
      seeded
        .withColumn("clean", regexp_replace(regexp_replace(regexp_replace(
          $"text", email, "[EMAIL]"), phone, "[PHONE]"), ip, "[IP]"))
        .withColumn("n_email", size(regexp_extract_all($"text", lit(email), lit(0))))
        .withColumn("n_phone", size(regexp_extract_all($"text", lit(phone), lit(0))))
        .withColumn("n_ip", size(regexp_extract_all($"text", lit(ip), lit(0))))
        .groupBy($"source")
        .agg(count(lit(1)).as("n_docs"),
          count(when($"clean" =!= $"text", lit(1))).as("n_redacted"),
          sum($"n_email").cast("long").as("emails"),
          sum($"n_phone").cast("long").as("phones"),
          sum($"n_ip").cast("long").as("ips"),
          sum(length($"text") - length($"clean")).cast("long")
            .as("chars_removed"))
        .orderBy("source")
    }
  )
}
