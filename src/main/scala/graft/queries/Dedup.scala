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
  *
  * Algorithms (published work): MinHash — Broder, "On the resemblance
  * and containment of documents" (1997); banded LSH — Leskovec/
  * Rajaraman/Ullman, "Mining of Massive Datasets" ch.3; SimHash —
  * Charikar, "Similarity estimation techniques from rounding
  * algorithms" (STOC 2002); winnowed n-gram sampling — Schleimer/
  * Wilkerson/Aiken, "Winnowing: Local Algorithms for Document
  * Fingerprinting" (SIGMOD 2003).
  */
object Dedup {

  /** doc_id mirror modulus for the survivor-election packing. */
  private[graft] val ElectionM = 1000000000000L

  /** The survivor-election packing key `q6 * 1e12 + (1e12-1 - doc_id)`
    * (l2_survivor_selection), with its CONTRACT ENFORCED in the plan:
    * q6 must sit in [0, 1e6] (the quality score is a convex combination
    * of [0,1] terms scaled by 1e6) and doc_id in [0, 1e12). Packing an
    * out-of-contract row would not overflow or error — it would
    * silently elect the WRONG survivor (a doc_id >= 1e12 bleeds into
    * the quality digits; a q6 > 1e6 outranks every legitimate score) —
    * so the guard is a plan-resident `assert_true`: in-contract rows
    * pay one codegen'd range check and pack to the identical key
    * (decl hash unchanged), out-of-contract rows fail the job loudly. */
  private[graft] def electionKey(
      q6: org.apache.spark.sql.Column,
      docId: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val M = ElectionM
    val guard = assert_true(
      docId.between(0L, M - 1) && q6.between(0L, 1000000L),
      format_string(
        "survivor-election packing contract violated: need doc_id in " +
          "[0, 1e12) and q6 in [0, 1e6], got doc_id=%d, q6=%d",
        docId, q6))
    // assert_true is NULL whenever it returns at all, so the coalesce
    // always yields the packed key — but keeps the guard in the plan
    coalesce(guard.cast(LongType), q6 * M + (lit(M - 1) - docId))
  }

  /** Spark-side tokens/shingles/digest columns (names shared with the
    * oracle CTEs below). Each shingle is md5-digested TWICE (seeds 0,1);
    * each digest then yields four independent 32-bit minhashes by hex
    * slicing — 8 signatures for 2 md5 calls per shingle. The digest
    * arrays are separate projections so the 8 sig expressions reuse them
    * instead of re-hashing (CollapseProject keeps expensive multiply-
    * referenced expressions un-inlined). */
  private def withShingles(df: org.apache.spark.sql.DataFrame) = {
    df.withColumn("toks", expr(Qh.toksExpr))
      .filter(size(col("toks")) >= 3)
      .withColumn(
        "shingles",
        expr("""array_distinct(transform(sequence(0, size(toks) - 3),
               |  i -> concat(element_at(toks, i + 1), ' ', element_at(toks, i + 2), ' ', element_at(toks, i + 3))))""".stripMargin))
      // native md5_words32: the 4 hash words per digest straight from
      // the bytes (same values as the oracle's hex slicing — see
      // PortableHashSpec), skipping hex-encode + substring + conv in
      // the innermost per-shingle loop
      .withColumn("d0", expr("transform(shingles, t -> md5_words32(t, 0))"))
      .withColumn("d1", expr("transform(shingles, t -> md5_words32(t, 1))"))
  }

  private def sigCol(i: Int): String =
    s"array_min(transform(d${i / 4}, w -> element_at(w, ${i % 4 + 1})))"

  private def oSigCol(i: Int): String =
    s"list_min(list_transform(d${i / 4}, h -> CAST(concat('0x', substr(h, ${1 + 8 * (i % 4)}, 8)) AS BIGINT)))"

  /** Oracle CTE producing doc_id, shingles, sig0..sig7 — mirrors
    * [[withShingles]] + [[sigCol]] exactly. */
  private val oSigs: String =
    s"""sigs AS (
       |  SELECT doc_id, shingles,
       |    ${(0 until 8).map(i => s"${oSigCol(i)} AS sig$i").mkString(",\n    ")}
       |  FROM (
       |    SELECT doc_id, shingles,
       |      list_transform(shingles, t -> md5(concat(t, '#0'))) AS d0,
       |      list_transform(shingles, t -> md5(concat(t, '#1'))) AS d1
       |    FROM (
       |      SELECT doc_id,
       |        list_distinct(list_transform(range(len(toks) - 2),
       |          i -> concat(toks[i+1], ' ', toks[i+2], ' ', toks[i+3]))) AS shingles
       |      FROM (SELECT doc_id, ${Qh.oToksExpr} AS toks FROM documents)
       |      WHERE len(toks) >= 3)))""".stripMargin

  // referenced inside interpolated exprs below (must precede `decls`:
  // object vals initialize in declaration order)
  private val Qh_toks = Qh.toksExpr

  /** Oracle CTE chain ending in `cand(doc_a, doc_b)` — the banded-LSH
    * candidate pairs (shared by the pairs/cluster/estimate decls). */
  private lazy val oCandCte: String =
    s"""$oSigs,
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
       |   AND a.doc_id < b.doc_id)"""

  /** Oracle CTE chain ending in `pairs(doc_a, doc_b, jaccard)` — the
    * banded-LSH near-dup pairs with exact Jaccard ≥ 0.2 (mirrors
    * [[lshPairs]]). Shared by l2_lsh_pairs and l2_dedup_clusters. */
  private lazy val oPairsCte: String =
    s"""$oCandCte,
       |pairs AS (
       |  SELECT doc_a, doc_b,
       |    CAST(len(list_intersect(sa.shingles, sb.shingles)) AS DOUBLE)
       |      / (len(sa.shingles) + len(sb.shingles) - len(list_intersect(sa.shingles, sb.shingles))) AS jaccard
       |  FROM cand
       |  JOIN sigs sa ON sa.doc_id = doc_a
       |  JOIN sigs sb ON sb.doc_id = doc_b
       |  WHERE CAST(len(list_intersect(sa.shingles, sb.shingles)) AS DOUBLE)
       |      / (len(sa.shingles) + len(sb.shingles) - len(list_intersect(sa.shingles, sb.shingles))) >= 0.2)""".stripMargin

  /** LARGE-STAR step (Kiveris et al. 2014) over a canonically-oriented
    * (u > v) edge set: around every node x (both orientations), link
    * each strictly-larger neighbor to the minimum of x's closed
    * neighborhood. Output keeps the canonical orientation. One groupBy
    * + one equi-join — per-round shuffles are bounded and plan-gated
    * (PlanSpec), never a cartesian. */
  private[graft] def largeStar(edges: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    import edges.sparkSession.implicits._
    val sym = edges.select($"u".as("x"), $"v".as("y"))
      .union(edges.select($"v".as("x"), $"u".as("y")))
    val mins = sym.groupBy($"x").agg(min($"y").as("mn"))
      .select($"x", least($"x", $"mn").as("m"))
    sym.join(mins, "x").filter($"y" > $"x")
      .select($"y".as("u"), $"m".as("v"))
      .distinct()
  }

  /** SMALL-STAR step: around every node u (edges already u > v), link
    * u and each smaller neighbor to u's minimum neighbor. */
  private[graft] def smallStar(edges: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    import edges.sparkSession.implicits._
    val smins = edges.groupBy($"u").agg(min($"v").as("m"))
    edges.join(smins, "u")
      .select(explode(array(
        struct($"u".as("a"), $"m".as("b")),
        struct($"v".as("a"), $"m".as("b")))).as("e"))
      .select($"e.a".as("u"), $"e.b".as("v"))
      .filter($"u" =!= $"v")
      .distinct()
  }

  /** Large-star/small-star contraction TO FIXPOINT — the convergence
    * driver behind the l2_cc_star decl, reusable on any canonically
    * (u > v)-oriented edge set. Each round materializes the shrinking
    * edge frontier and releases the previous one (bounded lineage and
    * storage, the pageRankUntil discipline); termination is detected as
    * edge-set equality, never assumed. O(log² n) rounds regardless of
    * component shape — CcStarSpec pins a 64-deep chain converging in
    * far fewer rounds than its diameter, with the result equal to the
    * union-find model. Returns (starEdges, rounds): at the fixpoint
    * every non-root u points directly at its component minimum v. */
  def ccUntil(edges0: org.apache.spark.sql.DataFrame, maxRounds: Int = 30)
      : (org.apache.spark.sql.DataFrame, Int) = {
    var edges = Qh.materialize(edges0)
    // the fixpoint test is EXACT but staged cheap-first (r16): both
    // frames are distinct edge SETS, so |ss| == |edges| plus ss ⊆ edges
    // is set equality — a round that changed the edge count (the common
    // case while contracting) pays two O(1)-ish counts on materialized
    // frames and SKIPS the anti-join entirely; only a count-stable
    // round runs ONE except (the old form ran two both ways each round)
    var nEdges = edges.count()
    var converged = false
    var rounds = 0
    while (!converged && rounds < maxRounds) {
      val ls = Qh.materialize(largeStar(edges))
      val ss = Qh.materialize(smallStar(ls))
      Qh.release(ls)
      val nSs = ss.count()
      converged = nSs == nEdges && ss.except(edges).isEmpty
      Qh.release(edges) // fixpoint check was its last reader
      edges = ss
      nEdges = nSs
      rounds += 1
    }
    (edges, rounds)
  }

  /** The component-closure oracle shared by l2_dedup_clusters and
    * l2_cc_star: near-dup pairs (the [[oPairsCte]] chain) symmetrized
    * into an edge list, transitive closure stated as a recursive CTE,
    * each doc labeled with its component's min doc_id. TWO independent
    * engine schedules hash against this one statement — min-label
    * propagation and the large-star/small-star contraction — so a green
    * run is a machine check that both compute the same components. */
  private lazy val oClustersSql: String =
    s"""WITH RECURSIVE $oPairsCte,
       |edges AS (
       |  SELECT doc_a AS src, doc_b AS dst FROM pairs
       |  UNION ALL
       |  SELECT doc_b, doc_a FROM pairs),
       |reach(v, l) AS (
       |  SELECT doc_id, doc_id FROM documents
       |  UNION
       |  SELECT e.dst, r.l FROM reach r JOIN edges e ON e.src = r.v)
       |SELECT v AS doc_id, min(l) AS component, min(l) = v AS is_canonical
       |FROM reach
       |GROUP BY v
       |ORDER BY doc_id""".stripMargin

  /** Materialized (doc_id, shingles, sig0..sig7) signature table —
    * built ONCE per run (Qh.materialize — durability mode is a config:
    * localCheckpoint for local bench, DISK_ONLY persist / reliable
    * checkpoint for long cluster runs) and reused by the band self-join
    * + both jaccard sides, instead of recomputing the md5 pipeline per
    * consumer. */
  private def materializedSigs(
      s: org.apache.spark.sql.SparkSession, dir: String)
      : org.apache.spark.sql.DataFrame = {
    import s.implicits._
    // tSpread: the shingle + 2×md5-per-shingle pipeline is the L2
    // family's dominant map-side cost and ran entirely on the
    // single-row-group scan task (r16 profile: 0.6 s serial per query)
    Qh.materialize(
      withShingles(Qh.tSpread(s, dir, "documents"))
        .select($"doc_id" +: $"shingles" +:
          (0 until 8).map(i => expr(sigCol(i)).as(s"sig$i")): _*))
  }

  /** One row per (doc, band): `band` packs band_id + the two member
    * sigs into a single string key ("<id>:<sigA>_<sigB>"), so a bucket
    * spec on the one column covers the entire candidate-join key. THE
    * single band-construction site, mirroring [[oCandCte]]'s bands CTE
    * — a band-config change can never desync the three decls that share
    * the one oracle CTE. */
  private def bandsOf(sigs: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    import sigs.sparkSession.implicits._
    val bandKey = Seq(0, 2, 4, 6).zipWithIndex.map { case (b, id) =>
      concat(lit(s"$id:"), col(s"sig$b"), lit("_"), col(s"sig${b + 1}"))
    }
    sigs.select($"doc_id", explode(array(bandKey: _*)).as("band"))
  }

  /** Candidate pairs (doc_a < doc_b) from a (doc_id, band) table: bucket
    * equi-join on the band key → distinct. */
  private def selfJoinCandidates(bands: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    import bands.sparkSession.implicits._
    bands.as("a")
      .join(bands.as("b"),
        $"a.band" === $"b.band" && $"a.doc_id" < $"b.doc_id")
      .select($"a.doc_id".as("doc_a"), $"b.doc_id".as("doc_b"))
      .distinct()
  }

  /** Banded-LSH candidate pairs read from the PERSISTED band table —
    * bucketed + sorted on `band`, one file per bucket, so the
    * candidate self-join co-locates on the bucketing and neither side
    * shuffles (PlanSpec pins no Exchange under the join). At 100 TB
    * this is the production layout: signatures are banded once at
    * ingest; every subsequent dedup run (new-batch-vs-corpus, changed
    * thresholds, re-clustering) pays zero signature recompute and zero
    * candidate-join shuffle. */
  private[graft] def bandCandidates(
      s: org.apache.spark.sql.SparkSession, dir: String)
      : org.apache.spark.sql.DataFrame =
    selfJoinCandidates(bandTableDf(s, dir))

  /** The persisted bucketed band table itself — (doc_id, band); built
    * once per (JVM, input) via the shared [[Qh.bucketedTable]]
    * machinery (the PageRank adjacency pattern). */
  private[graft] def bandTableDf(
      s: org.apache.spark.sql.SparkSession, dir: String)
      : org.apache.spark.sql.DataFrame = {
    import s.implicits._
    Qh.bucketedTable(s, "lsh_bands", dir, 32, Seq("band"))(
      bandsOf(withShingles(Qh.tSpread(s, dir, "documents"))
        .select($"doc_id" +:
          (0 until 8).map(i => expr(sigCol(i)).as(s"sig$i")): _*)))
  }

  /** Banded-LSH near-dup pairs (doc_a < doc_b, exact Jaccard ≥ 0.2),
    * ordered — mirrors [[oPairsCte]]. */
  private def lshPairs(s: org.apache.spark.sql.SparkSession, dir: String)
      : org.apache.spark.sql.DataFrame = {
    import s.implicits._
    val sigs = materializedSigs(s, dir)
    val cand = bandCandidates(s, dir)
    val sa = sigs.select($"doc_id".as("doc_a"), $"shingles".as("sh_a"))
    val sb = sigs.select($"doc_id".as("doc_b"), $"shingles".as("sh_b"))
    val ni = call_function("intersect_count", $"sh_a", $"sh_b")
    val jac = ni.cast(DoubleType) / (size($"sh_a") + size($"sh_b") - ni)
    cand.join(sa, "doc_a").join(sb, "doc_b")
      .select($"doc_a", $"doc_b", jac.as("jaccard"))
      .filter($"jaccard" >= 0.2)
      .orderBy("doc_a", "doc_b")
  }

  /** (doc_id, simhash): 32-bit Charikar signature — one hash per
    * distinct token, then a single partial+final agg with 32 per-bit ±1
    * sums. Shared by l2_simhash (signatures) and l2_simhash_hamming
    * (band-blocked near-dup pairs). */
  private def simhash32(s: org.apache.spark.sql.SparkSession, dir: String)
      : org.apache.spark.sql.DataFrame = {
    import s.implicits._
    // tSpread: tokenize + per-token md5 otherwise serialize on the
    // single-row-group scan task (r16)
    val tok = Qh.tSpread(s, dir, "documents")
      .select($"doc_id", explode(array_distinct(expr(Qh_toks))).as("t"))
      .select($"doc_id", Qh.phash($"t", 0).as("h"))
    val bitSums = (0 until 32).map(b =>
      sum(when(expr(s"shiftright(h, $b) % 2 = 1"), 1).otherwise(-1)).as(s"s$b"))
    val combine = (0 until 32)
      .map(b => when(col(s"s$b") > 0, lit(1L << b)).otherwise(0L))
      .reduce(_ + _)
    tok.groupBy($"doc_id")
      .agg(bitSums.head, bitSums.tail: _*)
      .select($"doc_id", combine.cast(LongType).as("simhash"))
  }

  /** (doc_id, simhash) with a 64-BIT fingerprint — the Manku et al.
    * production width: bits 0–31 from phash(tok, 0), bits 32–63 from
    * the independent phash(tok, 1). Wider fingerprint → 16-bit bands →
    * 65536 candidate buckets, which is what keeps the Hamming-band join
    * linear-ish at corpus scale (8-bit bands of a 32-bit signature give
    * 256 buckets and an O(n²/256) pair stream). */
  private def simhash64(s: org.apache.spark.sql.SparkSession, dir: String)
      : org.apache.spark.sql.DataFrame = {
    import s.implicits._
    // tSpread: tokenize + 2 md5 per token — see simhash32 (r16)
    val tok = Qh.tSpread(s, dir, "documents")
      .select($"doc_id", explode(array_distinct(expr(Qh_toks))).as("t"))
      .select($"doc_id", Qh.phash($"t", 0).as("h0"), Qh.phash($"t", 1).as("h1"))
    val bitSums = (0 until 64).map { b =>
      val src = if (b < 32) s"h0, $b" else s"h1, ${b - 32}"
      sum(when(expr(s"shiftright($src) % 2 = 1"), 1).otherwise(-1)).as(s"s$b")
    }
    val combine = (0 until 64)
      .map(b => when(col(s"s$b") > 0, lit(1L << b)).otherwise(0L))
      .reduce(_ + _)
    tok.groupBy($"doc_id")
      .agg(bitSums.head, bitSums.tail: _*)
      .select($"doc_id", combine.cast(LongType).as("simhash"))
  }

  /** Oracle CTE `sh64(doc_id, simhash)` mirroring [[simhash64]]. */
  private val oSimhash64Cte: String = {
    val bitSums = (0 until 64).map { b =>
      val src = if (b < 32) s"(h0 >> $b)" else s"(h1 >> ${b - 32})"
      s"sum(CASE WHEN ($src & 1) = 1 THEN 1 ELSE -1 END) AS s$b"
    }.mkString(",\n      ")
    val combine = (0 until 64)
      .map { b =>
        // bit 63: DuckDB overflow-checks 1<<63, so state the sign bit as
        // the min-long literal (the sum of bits 0..62 is < 2^63, so the
        // final addition cannot overflow on either engine)
        val v = if (b == 63) "CAST(-9223372036854775807 - 1 AS BIGINT)"
                else s"(CAST(1 AS BIGINT) << $b)"
        s"CASE WHEN s$b > 0 THEN $v ELSE 0 END"
      }
      .mkString(" + ")
    s"""sh64 AS (
       |  SELECT doc_id, CAST($combine AS BIGINT) AS simhash
       |  FROM (
       |    SELECT doc_id,
       |      $bitSums
       |    FROM (
       |      SELECT doc_id, ${Qh.oPhash("t", 0)} AS h0, ${Qh.oPhash("t", 1)} AS h1
       |      FROM (SELECT doc_id, unnest(list_distinct(${Qh.oToksExpr})) AS t FROM documents))
       |    GROUP BY doc_id))""".stripMargin
  }

  /** Oracle CTE `sh(doc_id, simhash)` mirroring [[simhash32]]. */
  private val oSimhashCte: String = {
    val bitSums = (0 until 32)
      .map(b => s"sum(CASE WHEN ((h >> $b) & 1) = 1 THEN 1 ELSE -1 END) AS s$b")
      .mkString(",\n      ")
    val combine = (0 until 32)
      .map(b => s"CASE WHEN s$b > 0 THEN (CAST(1 AS BIGINT) << $b) ELSE 0 END")
      .mkString(" + ")
    s"""sh AS (
       |  SELECT doc_id, CAST($combine AS BIGINT) AS simhash
       |  FROM (
       |    SELECT doc_id,
       |      $bitSums
       |    FROM (
       |      SELECT doc_id, ${Qh.oPhash("t", 0)} AS h
       |      FROM (SELECT doc_id, unnest(list_distinct(${Qh.oToksExpr})) AS t FROM documents))
       |    GROUP BY doc_id))""".stripMargin
  }

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
      withShingles(Qh.tSpread(s, dir, "documents"))
        .select($"doc_id" +: (0 until 8).map(i => expr(sigCol(i)).as(s"sig$i")): _*)
        .orderBy("doc_id")
    },

    // L2b: banded-LSH candidate pairs + exact shingle Jaccard.
    // Bucket equi-join on (band_id, band_key) — no cross join anywhere.
    Decl(
      "l2_lsh_pairs",
      s"""WITH $oPairsCte
         |SELECT doc_a, doc_b, jaccard FROM pairs
         |ORDER BY doc_a, doc_b""".stripMargin) { (s, dir) =>
      lshPairs(s, dir)
    },

    // L2b1: SKETCH ACCURACY (r5) — the MinHash Jaccard ESTIMATE
    // (fraction of equal signature slots, Broder's estimator) next to
    // the exact shingle Jaccard for every LSH candidate pair, plus the
    // absolute error. This is the sketch-quality report a production
    // dedup pipeline ships with its threshold choice: it shows, from
    // data, how far k=8 minhashes deviate from the true similarity
    // (E[est] = J, sd = sqrt(J(1-J)/8)). All arithmetic is exact
    // (integer counts, one double division with identical operands on
    // both engines; r6-rounded output).
    Decl(
      "l2_minhash_estimate",
      s"""WITH ${oCandCte.stripMargin},
         |est AS (
         |  SELECT doc_a, doc_b,
         |    (${(0 until 8).map(i => s"(CASE WHEN sa.sig$i = sb.sig$i THEN 1 ELSE 0 END)").mkString(" + ")}) / 8.0 AS est_jaccard,
         |    CAST(len(list_intersect(sa.shingles, sb.shingles)) AS DOUBLE)
         |      / (len(sa.shingles) + len(sb.shingles) - len(list_intersect(sa.shingles, sb.shingles))) AS jaccard
         |  FROM cand
         |  JOIN sigs sa ON sa.doc_id = doc_a
         |  JOIN sigs sb ON sb.doc_id = doc_b)
         |SELECT doc_a, doc_b, est_jaccard,
         |  ${Qh.oR6("jaccard")} AS jaccard,
         |  ${Qh.oR6("abs(est_jaccard - jaccard)")} AS abs_err
         |FROM est
         |ORDER BY doc_a, doc_b""".stripMargin) { (s, dir) =>
      import s.implicits._
      val sigs = materializedSigs(s, dir)
      val cand = bandCandidates(s, dir)
      val sa = sigs.select($"doc_id".as("doc_a") +: $"shingles".as("sh_a") +:
        (0 until 8).map(i => col(s"sig$i").as(s"a_sig$i")): _*)
      val sb = sigs.select($"doc_id".as("doc_b") +: $"shingles".as("sh_b") +:
        (0 until 8).map(i => col(s"sig$i").as(s"b_sig$i")): _*)
      val estCol = (0 until 8)
        .map(i => when(col(s"a_sig$i") === col(s"b_sig$i"), 1).otherwise(0))
        .reduce(_ + _).cast(DoubleType) / 8.0
      val ni = call_function("intersect_count", $"sh_a", $"sh_b")
      val jac = ni.cast(DoubleType) / (size($"sh_a") + size($"sh_b") - ni)
      cand.join(sa, "doc_a").join(sb, "doc_b")
        .select($"doc_a", $"doc_b", estCol.as("est_jaccard"), jac.as("jaccard"))
        .select($"doc_a", $"doc_b", $"est_jaccard",
          Qh.r6($"jaccard").as("jaccard"),
          Qh.r6(abs($"est_jaccard" - $"jaccard")).as("abs_err"))
        .orderBy("doc_a", "doc_b")
    },

    // L2b3: INCREMENTAL dedup (r7) — the other half of the production
    // workflow the persisted band table exists for: a NEW ingest batch
    // (here: doc_id % 10 = 0 stands in for the arriving shard) is
    // near-dup-checked AGAINST THE EXISTING CORPUS without recomputing
    // or reshuffling anything corpus-sized. New-batch signatures are a
    // narrow map over the batch; candidates come from newBands ⋈ the
    // bucketed corpus band table (per-batch work ∝ batch size + matched
    // buckets, never corpus²); exact Jaccard verifies only the matched
    // candidates — the "fetch matched docs from the store" step, played
    // here by reading the corpus docs' shingles for candidate ids only.
    // At 100 TB this decl is the daily-ingest path: band once at
    // ingest, append to the band table (the S10b pattern), dedup each
    // arriving batch in time proportional to the batch.
    Decl(
      "l2_incremental_dedup",
      s"""WITH $oSigs,
         |bands AS (
         |  SELECT doc_id, band_id,
         |    CASE band_id WHEN 0 THEN concat(sig0, '_', sig1)
         |                 WHEN 1 THEN concat(sig2, '_', sig3)
         |                 WHEN 2 THEN concat(sig4, '_', sig5)
         |                 ELSE concat(sig6, '_', sig7) END AS band_key
         |  FROM sigs, (SELECT unnest(range(4)) AS band_id)),
         |cand AS (
         |  SELECT DISTINCT a.doc_id AS new_doc, b.doc_id AS corpus_doc
         |  FROM bands a JOIN bands b
         |    ON a.band_id = b.band_id AND a.band_key = b.band_key
         |  WHERE a.doc_id % 10 = 0 AND b.doc_id % 10 <> 0)
         |SELECT new_doc, corpus_doc,
         |  CAST(len(list_intersect(sa.shingles, sb.shingles)) AS DOUBLE)
         |    / (len(sa.shingles) + len(sb.shingles) - len(list_intersect(sa.shingles, sb.shingles))) AS jaccard
         |FROM cand
         |JOIN sigs sa ON sa.doc_id = new_doc
         |JOIN sigs sb ON sb.doc_id = corpus_doc
         |WHERE CAST(len(list_intersect(sa.shingles, sb.shingles)) AS DOUBLE)
         |    / (len(sa.shingles) + len(sb.shingles) - len(list_intersect(sa.shingles, sb.shingles))) >= 0.2
         |ORDER BY new_doc, corpus_doc""".stripMargin) { (s, dir) =>
      import s.implicits._
      // the arriving batch: fresh narrow signatures (the ingest path)
      val newSigs = Qh.materialize(
        withShingles(Qh.tSpread(s, dir, "documents").filter($"doc_id" % 10 === 0))
          .select($"doc_id" +: $"shingles" +:
            (0 until 8).map(i => expr(sigCol(i)).as(s"sig$i")): _*))
      // the corpus: the PERSISTED band table, filtered — zero recompute
      val corpusBands = bandTableDf(s, dir).filter($"doc_id" % 10 =!= 0)
      val cand = bandsOf(newSigs).as("a")
        .join(corpusBands.as("b"), $"a.band" === $"b.band")
        .select($"a.doc_id".as("new_doc"), $"b.doc_id".as("corpus_doc"))
        .distinct()
      val sa = newSigs.select($"doc_id".as("new_doc"), $"shingles".as("sh_a"))
      // candidate verification fetches corpus shingles by id (stand-in
      // for the doc-store lookup; only matched candidates are read).
      // MATERIALIZED (r16): the jaccard join condition infers an
      // isnotnull(sh_b) constraint, and on a lazy subtree that filter
      // is pushed below the projection where it re-derives the whole
      // shingle pipeline per row (measured 8.8 s serial); the
      // checkpoint makes it a plain column test.
      val sb = Qh.materialize(
        withShingles(Qh.tSpread(s, dir, "documents")
            .filter($"doc_id" % 10 =!= 0))
          .select($"doc_id".as("corpus_doc"), $"shingles".as("sh_b")))
      val ni = call_function("intersect_count", $"sh_a", $"sh_b")
      val jac = ni.cast(DoubleType) / (size($"sh_a") + size($"sh_b") - ni)
      cand.join(sa, "new_doc").join(sb, "corpus_doc")
        .select($"new_doc", $"corpus_doc", jac.as("jaccard"))
        .filter($"jaccard" >= 0.2)
        .orderBy("new_doc", "corpus_doc")
    },

    // L2b4 / S85: STREAMING near-dup ADMISSION — the ingestion-time
    // form of LSH dedup as ONE stateful operator
    // (Streams.lshAdmit: flatMapGroupsWithState keyed by band bucket,
    // state = the bucket's signature index; per-doc work ∝ bucket
    // occupancy, never corpus size). flatMapGroupsWithState executes
    // in BOTH modes, so this decl runs the SAME function as a batch
    // (each bucket in one invocation, doc_id order = arrival order)
    // while StreamingDedupSpec drives it incrementally over
    // MemoryStream epochs with state carrying the index across
    // micro-batches. Semantics are order-independent at the doc-set
    // level — dup(d) ⇔ some smaller doc shares a band with signature
    // agreement ≥ 6/8 — which is exactly the closed form the oracle
    // states.
    Decl(
      "l2_stream_dedup",
      s"""WITH $oSigs,
         |bands AS (
         |  SELECT doc_id, band_id,
         |    CASE band_id WHEN 0 THEN concat(sig0, '_', sig1)
         |                 WHEN 1 THEN concat(sig2, '_', sig3)
         |                 WHEN 2 THEN concat(sig4, '_', sig5)
         |                 ELSE concat(sig6, '_', sig7) END AS band_key
         |  FROM sigs, (SELECT unnest(range(4)) AS band_id)),
         |hits AS (
         |  SELECT b.doc_id AS doc_id, MIN(a.doc_id) AS dup_of
         |  FROM bands a JOIN bands b
         |    ON a.band_id = b.band_id AND a.band_key = b.band_key
         |      AND a.doc_id < b.doc_id
         |  JOIN sigs sa ON sa.doc_id = a.doc_id
         |  JOIN sigs sb ON sb.doc_id = b.doc_id
         |  WHERE ${(0 until 8).map(i =>
             s"(CASE WHEN sa.sig$i = sb.sig$i THEN 1 ELSE 0 END)")
             .mkString(" + ")} >= 6
         |  GROUP BY b.doc_id)
         |SELECT d.doc_id, h.dup_of IS NOT NULL AS is_dup, h.dup_of
         |FROM (SELECT doc_id FROM sigs) d
         |LEFT JOIN hits h USING (doc_id)
         |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      import s.implicits._
      import graft.streaming.Streams
      val sigs = materializedSigs(s, dir)
      val rows = bandsOf(sigs)
        .join(sigs.select($"doc_id" +:
          (0 until 8).map(i => col(s"sig$i")): _*), "doc_id")
        .select($"doc_id", $"band".as("key"),
          array((0 until 8).map(i => col(s"sig$i")): _*).as("sigs"))
        .as[Streams.BandRow]
      val hits = Streams.lshAdmit(rows, minAgree = 0.75).toDF()
      Streams.admissionVerdicts(sigs, hits)
        .orderBy("doc_id")
    },

    // L2b2: connected-components dedup CLUSTERING — the step after pair
    // mining in every production dedup pipeline: near-dup pairs form a
    // graph; each doc keeps the MIN doc_id of its component as the
    // canonical id (transitive closure, so a~b~c collapses to one
    // cluster even when a~c was never a candidate pair). Engine side is
    // iterative min-label propagation over the edge list — each round
    // one equi-join + one min-agg, O(diameter) rounds (near-dup
    // clusters are shallow; production uses the same loop or its
    // large-star/small-star variant, Kiveris et al. 2014). The round
    // boundary materializes via Qh.materialize so lineage stays flat.
    // The oracle states the same closure as a recursive CTE — SHARED
    // with l2_cc_star, so a hash match on both machine-checks the two
    // schedules against one statement of the transitive closure.
    Decl(
      "l2_dedup_clusters",
      oClustersSql) { (s, dir) =>
      import s.implicits._
      val pairs = lshPairs(s, dir)
      val edges = Qh.materialize(
        pairs.select($"doc_a".as("src"), $"doc_b".as("dst"))
          .union(pairs.select($"doc_b".as("src"), $"doc_a".as("dst"))))
      var labels = Qh.materialize(
        Qh.t(s, dir, "documents").select($"doc_id".as("v"), $"doc_id".as("l")))
      // fixpoint scalar (r16): per-node labels are MONOTONE
      // NON-INCREASING under min-propagation and the node set is fixed
      // (every doc seeds its own label; prop targets are existing
      // nodes), so Σl unchanged ⟺ no label changed — the same
      // two-scalar discipline as Graph.bfsUntil, replacing the
      // per-round diff join + isEmpty action with one tiny agg
      def sig(df: org.apache.spark.sql.DataFrame): Long =
        df.agg(sum($"l")).head.getLong(0)
      var labelSum = sig(labels)
      var converged = false
      var rounds = 0
      while (!converged && rounds < 20) {
        val prop = edges.join(labels, $"src" === $"v")
          .select($"dst".as("v"), $"l")
        val next = Qh.materialize(
          labels.union(prop).groupBy($"v").agg(min($"l").as("l")))
        val nextSum = sig(next)
        converged = nextSum == labelSum
        Qh.release(labels) // convergence check was its last reader
        labels = next
        labelSum = nextSum
        rounds += 1
      }
      labels.select($"v".as("doc_id"), $"l".as("component"),
          ($"l" === $"v").as("is_canonical"))
        .orderBy("doc_id")
    },

    // L2b4: the SAME component labels through the LARGE-STAR /
    // SMALL-STAR schedule (Kiveris et al., "Connected Components in
    // MapReduce and Beyond", SoCC 2014) — the round-count dial for the
    // clustering step. Min-label propagation needs O(diameter) rounds:
    // fine for shallow near-dup clusters, unbounded for chain-shaped
    // components (substring-overlap chains at web scale run hundreds of
    // hops deep). The star schedule contracts whole paths per round —
    // large-star hangs every larger neighbor off the neighborhood min,
    // small-star re-hangs the smaller ones — converging in O(log² n)
    // rounds REGARDLESS of component shape, with per-round work one
    // groupBy + one join over the current edge set (which only shrinks
    // toward the final star). Termination is detected, not assumed:
    // the loop exits when the edge set reaches its fixpoint. The
    // oracle is deliberately the IDENTICAL recursive-CTE closure
    // shared with l2_dedup_clusters — a hash match machine-checks that
    // the two schedules compute the same components.
    Decl("l2_cc_star", oClustersSql) { (s, dir) =>
      import s.implicits._
      val pairs = lshPairs(s, dir)
      // canonical orientation (u > v) — both star steps preserve it
      val (edges, _) = ccUntil(
        pairs.select(greatest($"doc_a", $"doc_b").as("u"),
            least($"doc_a", $"doc_b").as("v"))
          .distinct())
      // at the fixpoint every non-root points directly at its
      // component's min; docs outside any pair label themselves
      Qh.t(s, dir, "documents").select($"doc_id")
        .join(edges.select($"u".as("doc_id"), $"v".as("root")),
          Seq("doc_id"), "left")
        .select($"doc_id",
          coalesce($"root", $"doc_id").as("component"),
          (coalesce($"root", $"doc_id") === $"doc_id").as("is_canonical"))
        .orderBy("doc_id")
    },

    // L2b5: QUALITY-AWARE SURVIVOR SELECTION — the step between
    // clustering and training-set assembly in a real curation
    // pipeline: min-doc_id canonicals (l2_dedup_clusters) keep an
    // ARBITRARY member of each near-dup cluster, but the copy worth
    // training on is the best one — so each cluster elects the member
    // with the highest quality score (length + punctuation members of
    // the l4 score family; rounded to 6 decimals BEFORE ranking so the
    // election key is cross-engine exact), doc_id ascending as the
    // deterministic tiebreak. Engine side: the ccUntil component
    // labels joined to a narrow per-doc score, then ONE hash agg per
    // component — the (quality, doc_id) election key is PACKED into a
    // single BIGINT (quality-major, doc_id mirrored so smaller ids
    // rank higher), so the whole election is a plain codegen'd
    // max+count HashAggregate with map-side partial combine: no struct
    // ordering key (which demotes max_by to SortAggregate), no window
    // sort, one exchange. Packing contract: q6 ∈ [0, 1e6] (the score
    // is a convex combination of [0,1] terms) and doc_id < 1e12 — a
    // trillion docs, an order above any 100 TB corpus. The oracle
    // restates the election as a window rank over the shared
    // recursive-CTE closure — two different schedules, one statement
    // of the policy; a hash match machine-checks the election.
    Decl(
      "l2_survivor_selection",
      s"""WITH RECURSIVE $oPairsCte,
         |edges AS (
         |  SELECT doc_a AS src, doc_b AS dst FROM pairs
         |  UNION ALL
         |  SELECT doc_b, doc_a FROM pairs),
         |reach(v, l) AS (
         |  SELECT doc_id, doc_id FROM documents
         |  UNION
         |  SELECT e.dst, r.l FROM reach r JOIN edges e ON e.src = r.v),
         |comp AS (SELECT v AS doc_id, min(l) AS component FROM reach GROUP BY v),
         |f AS (
         |  SELECT doc_id,
         |    ${Qh.oR6("0.6 * least(CAST(length(text) AS DOUBLE), 500.0) / 500.0 " +
              "+ 0.4 * (1.0 - CAST(length(text) - length(regexp_replace(text, '[^a-z ]', '', 'g')) AS DOUBLE) / length(text))")} AS quality
         |  FROM documents),
         |r AS (
         |  SELECT c.component, c.doc_id, f.quality,
         |    row_number() OVER (PARTITION BY c.component
         |                       ORDER BY f.quality DESC, c.doc_id) AS rn,
         |    count(*) OVER (PARTITION BY c.component) AS cluster_size
         |  FROM comp c JOIN f ON f.doc_id = c.doc_id)
         |SELECT component, doc_id AS survivor, quality, cluster_size
         |FROM r WHERE rn = 1
         |ORDER BY component""".stripMargin) { (s, dir) =>
      import s.implicits._
      val pairs = lshPairs(s, dir)
      val (edges, _) = ccUntil(
        pairs.select(greatest($"doc_a", $"doc_b").as("u"),
            least($"doc_a", $"doc_b").as("v"))
          .distinct())
      val lenScore = least(length($"text").cast(DoubleType), lit(500.0)) / 500.0
      val punctRatio = (length($"text") -
        length(regexp_replace($"text", "[^a-z ]", ""))).cast(DoubleType) / length($"text")
      // integer election key: q6 * 1e12 + (1e12-1 - doc_id)
      val q6 = floor((lit(0.6) * lenScore + lit(0.4) * (lit(1.0) - punctRatio))
        * 1000000.0 + lit(0.5)).cast(LongType)
      val scored = Qh.t(s, dir, "documents")
        .select($"doc_id", electionKey(q6, $"doc_id").as("key"))
      scored
        .join(edges.select($"u".as("doc_id"), $"v".as("root")),
          Seq("doc_id"), "left")
        .select(coalesce($"root", $"doc_id").as("component"), $"key")
        .groupBy($"component")
        .agg(max($"key").as("k"), count(lit(1)).as("cluster_size"))
        .select($"component",
          (lit(ElectionM - 1) - ($"k" % ElectionM)).as("survivor"),
          (expr(s"k div $ElectionM").cast(DoubleType) / 1000000.0).as("quality"),
          $"cluster_size")
        .orderBy("component")
    },

    // L2c: 32-bit SimHash — explode distinct tokens (ONE hash per token),
    // then a single hash-agg over doc_id with 32 per-bit ±1 sums. At
    // scale this is a partial+final agg keyed on doc_id: the classic
    // shape, no per-row re-evaluation of the token list per bit.
    Decl(
      "l2_simhash",
      s"""WITH $oSimhashCte
         |SELECT doc_id, simhash FROM sh
         |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      simhash32(s, dir).orderBy("doc_id")
    },

    // L2c2: SimHash near-dup PAIRS via Hamming-band blocking (Manku/
    // Jain/Sarma, "Detecting Near-Duplicates for Web Crawling", WWW
    // 2007), at the production width: 64-bit fingerprint, 4 disjoint
    // 16-BIT bands. Pigeonhole: two signatures within Hamming distance
    // 3 agree on at least one band, so candidates come from a bucket
    // equi-join on (band_id, band_value) over 65536 buckets — the pair
    // stream stays near-linear (an 8-bit banding of a 32-bit signature
    // was measured 40M pairs at sf0.1; this is ~150k). Exact popcount
    // runs only on candidates, BEFORE the pair-dedup, so the distinct
    // sees only the rare survivors.
    Decl(
      "l2_simhash_hamming",
      s"""WITH $oSimhash64Cte,
         |bands AS (
         |  SELECT doc_id, simhash, band_id,
         |    (simhash >> (band_id * 16)) & 65535 AS band_val
         |  FROM sh64, (SELECT unnest(range(4)) AS band_id)),
         |cand AS (
         |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |    a.simhash AS sh_a, b.simhash AS sh_b
         |  FROM bands a JOIN bands b
         |    ON a.band_id = b.band_id AND a.band_val = b.band_val
         |   AND a.doc_id < b.doc_id)
         |SELECT doc_a, doc_b,
         |  CAST(bit_count(xor(sh_a, sh_b)) AS BIGINT) AS hamming
         |FROM cand
         |WHERE bit_count(xor(sh_a, sh_b)) <= 3
         |ORDER BY doc_a, doc_b""".stripMargin) { (s, dir) =>
      import s.implicits._
      val sh = Qh.materialize(simhash64(s, dir))
      val bandCols = (0 until 4).map(b =>
        struct(lit(b).as("band_id"),
          shiftright($"simhash", 16 * b).bitwiseAND(65535).as("band_val")))
      val bands = sh.select($"doc_id", $"simhash",
          explode(array(bandCols: _*)).as("bk"))
        .select($"doc_id", $"simhash", $"bk.band_id", $"bk.band_val")
      val a = bands.select($"doc_id".as("doc_a"), $"simhash".as("sh_a"),
        $"band_id", $"band_val")
      val b = bands.select($"doc_id".as("doc_b"), $"simhash".as("sh_b"),
        $"band_id", $"band_val")
      a.join(b, Seq("band_id", "band_val"))
        .filter($"doc_a" < $"doc_b")
        .select($"doc_a", $"doc_b",
          expr("cast(bit_count(sh_a ^ sh_b) as bigint)").as("hamming"))
        .filter($"hamming" <= 3)
        .distinct()
        .orderBy("doc_a", "doc_b")
    },

    // L2c3: the SAME pair set as l2_simhash_hamming through the
    // BLOCK-COMBINATION candidate schedule — the scale dial the sf1
    // sweep (SWEEP_sf1.md lesson 2) names for corpora where the 4×16
    // banding's residual n²/65536-per-band collision term turns over.
    // The 64-bit fingerprint splits into 6 blocks (11,11,11,11,10,10
    // bits); candidates come from an equi-join keyed on each of the
    // C(6,3)=20 block TRIPLES (~32-bit buckets). Pigeonhole: Hamming
    // distance ≤ 3 dirties at most 3 blocks, so at least 3 blocks are
    // clean and some clean triple collides — recall stays EXACT. The
    // trade vs 4×16: 5× more index rows (20n vs 4n, linear) for 2¹⁶×
    // fewer random bucket collisions (quadratic) — the 100 TB direction.
    // The oracle is deliberately the INDEPENDENT 4×16-band schedule
    // (shared SQL with l2_simhash_hamming): a hash match is a machine
    // check that the two schedules generate identical exact pair sets.
    Decl(
      "l2_simhash_blocked",
      s"""WITH $oSimhash64Cte,
         |bands AS (
         |  SELECT doc_id, simhash, band_id,
         |    (simhash >> (band_id * 16)) & 65535 AS band_val
         |  FROM sh64, (SELECT unnest(range(4)) AS band_id)),
         |cand AS (
         |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |    a.simhash AS sh_a, b.simhash AS sh_b
         |  FROM bands a JOIN bands b
         |    ON a.band_id = b.band_id AND a.band_val = b.band_val
         |   AND a.doc_id < b.doc_id)
         |SELECT doc_a, doc_b,
         |  CAST(bit_count(xor(sh_a, sh_b)) AS BIGINT) AS hamming
         |FROM cand
         |WHERE bit_count(xor(sh_a, sh_b)) <= 3
         |ORDER BY doc_a, doc_b""".stripMargin) { (s, dir) =>
      import s.implicits._
      val sh = Qh.materialize(simhash64(s, dir))
      // block b occupies bits [off(b), off(b)+width(b))
      val layout = Seq((0, 11), (11, 11), (22, 11), (33, 11), (44, 10), (54, 10))
      def blockVal(b: Int): org.apache.spark.sql.Column =
        shiftright($"simhash", layout(b)._1)
          .bitwiseAND((1L << layout(b)._2) - 1)
      val triples = for {
        i <- 0 until 6; j <- (i + 1) until 6; k <- (j + 1) until 6
      } yield (i, j, k)
      val keyCols = triples.zipWithIndex.map { case ((i, j, k), t) =>
        // 21-bit slots: values < 2^11, so the packed key fits in 63 bits
        struct(lit(t).as("t_id"),
          (blockVal(i) * lit(1L << 42) + blockVal(j) * lit(1L << 21)
            + blockVal(k)).as("bucket"))
      }
      val idx = sh.select($"doc_id", $"simhash",
          explode(array(keyCols: _*)).as("bk"))
        .select($"doc_id", $"simhash", $"bk.t_id", $"bk.bucket")
      val a = idx.select($"doc_id".as("doc_a"), $"simhash".as("sh_a"),
        $"t_id", $"bucket")
      val b = idx.select($"doc_id".as("doc_b"), $"simhash".as("sh_b"),
        $"t_id", $"bucket")
      a.join(b, Seq("t_id", "bucket"))
        .filter($"doc_a" < $"doc_b")
        .select($"doc_a", $"doc_b",
          expr("cast(bit_count(sh_a ^ sh_b) as bigint)").as("hamming"))
        .filter($"hamming" <= 3)
        .distinct()
        .orderBy("doc_a", "doc_b")
    },

    // L2d: winnowed char-4-gram Jaccard with EXACT PREFIX FILTERING
    // (AllPairs, Bayardo/Ma/Srikant WWW'07; prefix length per PPJoin,
    // Xiao et al.), BLOCKED on (lang, source). Grams are packed into
    // injective 32-bit int codes (4 ascii bytes — no hashing, no
    // collisions) and winnowed (code % 4 == 0 — MOSS-style
    // deterministic sampling). Candidate generation joins the inverted
    // index over each doc's PREFIX only: grams globally ordered by
    // (document frequency asc, gram asc), first n-⌈t·n⌉+1 kept. Any
    // pair with J ≥ t shares a gram in both prefixes (pigeonhole), so
    // recall is exact — but the posting lists that drive the join are
    // the RARE grams; the round-8 sf1 sweep measured the unfiltered
    // index join superlinear (exponent 1.24: common-gram posting lists
    // grow 10×, their pair volume 100×) and this shape restores ~linear.
    // Exact |A∩B| then runs per CANDIDATE (array_intersect of the two
    // per-doc sorted gram arrays) — bounded by candidate volume, which
    // prefix filtering keeps near-linear, times O(|doc grams|) each.
    Decl(
      "l2_ngram_jaccard",
      """WITH g AS (
        |  SELECT doc_id, lang, source,
        |    list_filter(
        |      list_distinct(list_transform(range(length(text) - 3),
        |        i -> ascii(text[i+1]) * 16777216 + ascii(text[i+2]) * 65536
        |             + ascii(text[i+3]) * 256 + ascii(text[i+4]))),
        |      c -> c % 4 = 0) AS grams
        |  FROM documents WHERE length(text) >= 4),
        |sized AS (SELECT doc_id, lang, source, grams, len(grams) AS n FROM g WHERE len(grams) > 0),
        |inv AS (SELECT doc_id, lang, source, n, unnest(grams) AS gram FROM sized),
        |ni AS (
        |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |    max(a.n) AS na, max(b.n) AS nb, count(*) AS n_shared
        |  FROM inv a JOIN inv b
        |    ON a.lang = b.lang AND a.source = b.source AND a.gram = b.gram
        |   AND a.doc_id < b.doc_id
        |  GROUP BY a.doc_id, b.doc_id)
        |SELECT doc_a, doc_b,
        |  CAST(n_shared AS DOUBLE) / (na + nb - n_shared) AS jaccard4
        |FROM ni
        |WHERE CAST(n_shared AS DOUBLE) / (na + nb - n_shared) >= 0.5
        |ORDER BY doc_a, doc_b""".stripMargin) { (s, dir) =>
      import s.implicits._
      // positions exploded BEFORE the gram code is computed: each
      // (doc, i) row builds its 4-byte code in whole-stage codegen —
      // no interpreted lambda in the hot path (HOF transform over ~440
      // chars per doc was ~10x slower than this shape).
      // gram code = 4 bytes big-endian. Positional substring on a STRING
      // is O(position) (UTF8 codepoint walk -> O(L^2) per doc); on BINARY
      // it is an O(1) byte slice, so the code is read via
      // hex(substring(binary)). Identical values on ASCII text, which is
      // the packing the oracle states with ascii(text[i]) arithmetic.
      // tSpread: the per-position gram-code explode is the map-heavy
      // first stage and ran on the single-row-group scan task (r16)
      val gramRows = Qh.tSpread(s, dir, "documents")
        .filter(length($"text") >= 4)
        .select($"doc_id", $"lang", $"source",
          $"text".cast(BinaryType).as("bin"),
          explode(sequence(lit(0), length($"text") - 4)).as("i"))
        .select($"doc_id", $"lang", $"source",
          // native bin_word32 ≡ conv(hex(substring(bin, i+1, 4)), 16, 10)
          // without the hex round trip (PortableHashSpec pins equality)
          expr("bin_word32(bin, i)").as("gram"))
        .filter($"gram" % 4 === 0)
        .distinct()
      // global document frequency per gram — the prefix ORDER. The join
      // back shuffles on gram (vocabulary-sized side, never broadcast-
      // assumed); the per-doc agg then re-keys on doc_id with map-side
      // combine. array_sort over struct(df, gram) makes the collect
      // order deterministic (total order — gram codes are injective).
      val df_ = gramRows.groupBy($"gram").agg(count(lit(1)).as("df"))
      val docG = Qh.materialize(
        gramRows.join(df_, "gram")
          .groupBy($"doc_id", $"lang", $"source")
          .agg(array_sort(collect_list(struct($"df", $"gram"))).as("gsort"))
          .select($"doc_id", $"lang", $"source",
            expr("transform(gsort, x -> x.gram)").as("grams"),
            size($"gsort").as("n")))
      // prefix = first n - ceil(t*n) + 1 grams, t = 0.5; a J≥t pair
      // shares a gram in BOTH prefixes, so the candidate join is exact
      val pre = docG.select($"doc_id", $"lang", $"source",
        explode(expr(
          "slice(grams, 1, n - cast(ceil(n * 0.5) as int) + 1)")).as("gram"))
      val cand = pre.as("a").join(pre.as("b"),
          $"a.lang" === $"b.lang" && $"a.source" === $"b.source" &&
            $"a.gram" === $"b.gram" && $"a.doc_id" < $"b.doc_id")
        .select($"a.doc_id".as("doc_a"), $"b.doc_id".as("doc_b"))
        .distinct()
      val ga = docG.select($"doc_id".as("doc_a"), $"grams".as("g_a"), $"n".as("na"))
      val gb = docG.select($"doc_id".as("doc_b"), $"grams".as("g_b"), $"n".as("nb"))
      val ni = call_function("intersect_count", $"g_a", $"g_b")
      val jac = ni.cast(DoubleType) / ($"na" + $"nb" - ni)
      cand.join(ga, "doc_a").join(gb, "doc_b")
        .select($"doc_a", $"doc_b", jac.as("jaccard4"))
        .filter($"jaccard4" >= 0.5)
        .orderBy("doc_a", "doc_b")
    },

    // L2e: embedding-cosine near-dup, blocked on label (stand-in for a
    // coarse cluster id at scale). Norms are precomputed ONCE per vector
    // (one dot per pair instead of three -- 3x less per-pair work; at
    // scale the normalized table is materialized once and reused).
    Decl(
      "l2_cosine_neardup",
      s"""WITH e AS (
         |  SELECT vec_id, label, embedding,
         |    sqrt(${Qh.oDot("embedding", "embedding")}) AS nrm
         |  FROM embeddings),
         |p AS (
         |  SELECT a.label,
         |    floor(${Qh.oDot("a.embedding", "b.embedding")}
         |      / (a.nrm * b.nrm) * 1000000 + 0.5) / 1000000.0 AS cos
         |  FROM e a JOIN e b
         |    ON a.label = b.label AND a.vec_id < b.vec_id)
         |SELECT label,
         |  count(*) AS n_pairs,
         |  count(*) FILTER (WHERE cos >= 0.8) AS n_neardup,
         |  max(cos) AS max_cos
         |FROM p
         |GROUP BY label
         |ORDER BY label""".stripMargin) { (s, dir) =>
      import s.implicits._
      // native dot_product (graft.functions.DotProduct): fused codegen
      // loop, same left-to-right accumulation as the oracle's fold
      val dot = (x: org.apache.spark.sql.Column, y: org.apache.spark.sql.Column) =>
        call_function("dot_product", x, y)
      val e = Qh.t(s, dir, "embeddings")
        .select($"vec_id", $"label", $"embedding",
          sqrt(dot($"embedding", $"embedding")).as("nrm"))
      val cos = Qh.r6(dot($"a.embedding", $"b.embedding") / ($"a.nrm" * $"b.nrm"))
      e.as("a").join(e.as("b"),
          $"a.label" === $"b.label" && $"a.vec_id" < $"b.vec_id")
        .select($"a.label".as("label"), cos.as("cos"))
        .groupBy($"label")
        .agg(
          count(lit(1)).as("n_pairs"),
          count(when($"cos" >= 0.8, lit(1))).as("n_neardup"),
          max($"cos").as("max_cos"))
        .orderBy("label")
    },

    // L2e2: the SAME exact pair-counting plan as l2_cosine_neardup with
    // a TUNABLE-CARDINALITY blocking key — the scale dial the sf1 sweep
    // (SWEEP_sf1.md lesson 3) names for the label-blocked decl's
    // output-quadratic growth. Blocks come from a fixed 8-plane sign
    // quantizer (sign of dims 1..8 → 256 cells) instead of the bounded
    // `label` dim: at a fixed corpus the cells are coarse clusters; as
    // the corpus grows the plane count k is the dial (cells = 2^k, block
    // size ~n/2^k held constant → the same plan stays linear in rows).
    // Within a cell the work is EXACT (precomputed norms, one fused
    // dot per pair) — this is the verification tier; the ANN family
    // (l3_ann_*) remains the recall-traded scale path for similarity.
    Decl(
      "l2_cosine_neardup_bucketed",
      s"""WITH e AS (
         |  SELECT vec_id,
         |    ${(0 until 8).map(i =>
                s"(CASE WHEN embedding[${i + 1}] > 0 THEN ${1 << i} ELSE 0 END)")
                .mkString(" + ")} AS cell,
         |    embedding,
         |    sqrt(${Qh.oDot("embedding", "embedding")}) AS nrm
         |  FROM embeddings),
         |p AS (
         |  SELECT a.cell,
         |    floor(${Qh.oDot("a.embedding", "b.embedding")}
         |      / (a.nrm * b.nrm) * 1000000 + 0.5) / 1000000.0 AS cos
         |  FROM e a JOIN e b
         |    ON a.cell = b.cell AND a.vec_id < b.vec_id)
         |SELECT cell,
         |  count(*) AS n_pairs,
         |  count(*) FILTER (WHERE cos >= 0.8) AS n_neardup,
         |  max(cos) AS max_cos
         |FROM p
         |GROUP BY cell
         |ORDER BY cell""".stripMargin) { (s, dir) =>
      import s.implicits._
      val dot = (x: org.apache.spark.sql.Column, y: org.apache.spark.sql.Column) =>
        call_function("dot_product", x, y)
      val cell = (0 until 8)
        .map(i => when(element_at($"embedding", i + 1) > 0f, lit(1 << i))
          .otherwise(lit(0)))
        .reduce(_ + _)
      val e = Qh.t(s, dir, "embeddings")
        .select($"vec_id", cell.as("cell"), $"embedding",
          sqrt(dot($"embedding", $"embedding")).as("nrm"))
      val cos = Qh.r6(dot($"a.embedding", $"b.embedding") / ($"a.nrm" * $"b.nrm"))
      e.as("a").join(e.as("b"),
          $"a.cell" === $"b.cell" && $"a.vec_id" < $"b.vec_id")
        .select($"a.cell".as("cell"), cos.as("cos"))
        .groupBy($"cell")
        .agg(
          count(lit(1)).as("n_pairs"),
          count(when($"cos" >= 0.8, lit(1))).as("n_neardup"),
          max($"cos").as("max_cos"))
        .orderBy("cell")
    },

    // L2e3: ADAPTIVE-SPLIT cosine near-dup — the missing notch on the
    // L2e2 dial. A fixed k-plane quantizer holds block size ~n/2^k
    // only while the data cooperates; a skewed or grown cell turns
    // quadratic quietly (the sf1 sweep measured exponent 1.19 on the
    // label-blocked decl — quadratic in its declared output). Here the
    // blocking is SIZE-DRIVEN: cells come from the same 8-plane sign
    // quantizer, and any cell over the block cap RE-BLOCKS on 4 more
    // planes (16× finer) — so block size is bounded by construction,
    // pair volume stays ~linear in rows, and the same two-level rule
    // recurses to more planes as the corpus grows (the cap, not the
    // plane count, is the invariant). The cap is 5 at fixture scale so
    // BOTH paths — split and unsplit cells — are exercised and
    // hash-checked at every SF (production would cap in the thousands;
    // the mechanism is scale-free). The split decision is one ≤256-row
    // broadcast join back onto the vectors; within a final cell the
    // work stays EXACT (precomputed norms, one fused dot per pair).
    // Pairs that straddle a split boundary are intentionally out of
    // the declared output — same contract as every blocked decl; the
    // ANN family remains the recall-traded path.
    Decl(
      "l2_cosine_neardup_adaptive",
      s"""WITH e AS (
         |  SELECT vec_id,
         |    ${(0 until 8).map(i =>
                s"(CASE WHEN embedding[${i + 1}] > 0 THEN ${1 << i} ELSE 0 END)")
                .mkString(" + ")} AS c8,
         |    ${(8 until 12).map(i =>
                s"(CASE WHEN embedding[${i + 1}] > 0 THEN ${1 << i} ELSE 0 END)")
                .mkString(" + ")} AS hi4,
         |    embedding,
         |    sqrt(${Qh.oDot("embedding", "embedding")}) AS nrm
         |  FROM embeddings),
         |sz AS (SELECT c8, count(*) AS csz FROM e GROUP BY c8),
         |f AS (
         |  SELECT e.vec_id, e.embedding, e.nrm,
         |    CASE WHEN sz.csz > 5 THEN e.c8 + e.hi4 ELSE e.c8 END AS cell
         |  FROM e JOIN sz USING (c8)),
         |p AS (
         |  SELECT a.cell,
         |    floor(${Qh.oDot("a.embedding", "b.embedding")}
         |      / (a.nrm * b.nrm) * 1000000 + 0.5) / 1000000.0 AS cos
         |  FROM f a JOIN f b
         |    ON a.cell = b.cell AND a.vec_id < b.vec_id)
         |SELECT cell,
         |  count(*) AS n_pairs,
         |  count(*) FILTER (WHERE cos >= 0.8) AS n_neardup,
         |  max(cos) AS max_cos
         |FROM p
         |GROUP BY cell
         |ORDER BY cell""".stripMargin) { (s, dir) =>
      import s.implicits._
      val dot = (x: org.apache.spark.sql.Column, y: org.apache.spark.sql.Column) =>
        call_function("dot_product", x, y)
      def planes(lo: Int, hi: Int) = (lo until hi)
        .map(i => when(element_at($"embedding", i + 1) > 0f, lit(1 << i))
          .otherwise(lit(0)))
        .reduce(_ + _)
      val e = Qh.t(s, dir, "embeddings")
        .select($"vec_id", planes(0, 8).as("c8"), planes(8, 12).as("hi4"),
          $"embedding", sqrt(dot($"embedding", $"embedding")).as("nrm"))
      // split decision: ≤256 cell counts, broadcast back — the re-key
      // costs one map-side join, never a second shuffle of the vectors
      val sz = e.groupBy($"c8").agg(count(lit(1)).as("csz"))
      val f = e.join(broadcast(sz), "c8")
        .select($"vec_id", $"embedding", $"nrm",
          when($"csz" > 5, $"c8" + $"hi4").otherwise($"c8").as("cell"))
      val cos = Qh.r6(dot($"a.embedding", $"b.embedding") / ($"a.nrm" * $"b.nrm"))
      f.as("a").join(f.as("b"),
          $"a.cell" === $"b.cell" && $"a.vec_id" < $"b.vec_id")
        .select($"a.cell".as("cell"), cos.as("cos"))
        .groupBy($"cell")
        .agg(
          count(lit(1)).as("n_pairs"),
          count(when($"cos" >= 0.8, lit(1))).as("n_neardup"),
          max($"cos").as("max_cos"))
        .orderBy("cell")
    },

    // L2g: EXACT DUPLICATED-SPAN detection — the fixed-width-window
    // approximation of suffix-array substring dedup (Lee et al. 2021,
    // "Deduplicating Training Data Makes Language Models Better"): a
    // span is duplicated iff its 8-token window text recurs VERBATIM in
    // another document. Every window is hashed (portable md5 prefix) in
    // a narrow explode; the duplicated-hash set is one hash-keyed
    // aggregation (map-side combined, count-distinct over doc_id); the
    // per-doc duplicated-span coverage comes from a semi-join of window
    // instances against that set. No all-pairs anywhere — total work is
    // O(total tokens) + two hash shuffles, the shape that holds at
    // 100 TB where the suffix array itself would not distribute.
    Decl(
      "l2_substring_dedup",
      s"""WITH toks AS (
         |  SELECT doc_id, ${Qh.oToksExpr} AS toks FROM documents),
         |wins AS (
         |  SELECT doc_id,
         |    unnest(list_transform(range(len(toks) - 7),
         |      i -> ${Qh.oPhash("array_to_string(toks[i+1:i+8], ' ')", 21)})) AS h
         |  FROM toks WHERE len(toks) >= 8),
         |dup AS (
         |  SELECT h FROM wins GROUP BY h HAVING count(DISTINCT doc_id) >= 2),
         |per AS (
         |  SELECT doc_id, count(*) AS n_dup
         |  FROM wins WHERE h IN (SELECT h FROM dup) GROUP BY doc_id)
         |SELECT t.doc_id,
         |  CAST(len(t.toks) - 7 AS BIGINT) AS n_spans,
         |  CAST(coalesce(p.n_dup, 0) AS BIGINT) AS n_dup_spans,
         |  floor(CAST(coalesce(p.n_dup, 0) AS DOUBLE)
         |    / CAST(len(t.toks) - 7 AS DOUBLE) * 10000 + 0.5) / 10000.0 AS dup_frac
         |FROM toks t LEFT JOIN per p USING (doc_id)
         |WHERE len(t.toks) >= 8
         |ORDER BY t.doc_id""".stripMargin) { (s, dir) =>
      duplicatedSpanStats(
        Qh.t(s, dir, "documents").select(col("doc_id"), col("text")), 8)
    },

    // L2j: CONTENT-DEFINED CHUNKING dedup (Muthitacharoen/Chen/
    // Mazières, SOSP 2001 LBFS — the storage-dedup classic, reused for
    // passage-level training-data dedup): chunk boundaries are cut
    // where a token's hash hits 0 mod 8 (expected chunk ≈ 8 tokens),
    // so boundaries are a function of CONTENT, not position — an
    // insertion reshapes only the chunk it lands in, where
    // l2_substring_dedup's fixed windows all shift downstream of the
    // edit. Chunking is DOC-LOCAL and fold-free in both engines:
    // boundary positions via one transform+filter, chunks sliced
    // between consecutive boundaries — O(tokens), a narrow map over
    // the scan. Downstream is the shared dupUnitStats shape
    // (duplicated-hash agg + semi-join): O(total chunks) + two hash
    // shuffles, never all-pairs. 100 TB: identical plan; the expected
    // chunk size (the mod base) is the granularity dial.
    Decl(
      "l2_chunk_dedup",
      s"""WITH t AS (
         |  SELECT doc_id, ${Qh.oToksExpr} AS toks FROM documents),
         |seg AS (
         |  SELECT doc_id, toks,
         |    list_filter(list_transform(range(1, len(toks) + 1),
         |      i -> CASE WHEN ${Qh.oPhash("toks[i]", 31)} % 8 = 0
         |                THEN i ELSE 0 END), p -> p > 0) AS bp
         |  FROM t WHERE len(toks) >= 1),
         |ch AS (
         |  SELECT doc_id,
         |    list_filter(
         |      list_transform(range(len(bp) + 1),
         |        k -> array_to_string(
         |          toks[CASE WHEN k = 0 THEN 1 ELSE bp[k] + 1 END :
         |               CASE WHEN k = len(bp) THEN len(toks)
         |                    ELSE bp[k+1] END], ' ')),
         |      x -> x <> '') AS chunks
         |  FROM seg),
         |c AS (SELECT doc_id, unnest(chunks) AS chunk FROM ch),
         |h AS (SELECT doc_id, ${Qh.oPhash("chunk", 37)} AS h FROM c),
         |dup AS (
         |  SELECT h FROM h GROUP BY h HAVING count(DISTINCT doc_id) >= 2),
         |per AS (
         |  SELECT doc_id, count(*) AS n_dup
         |  FROM h WHERE h IN (SELECT h FROM dup) GROUP BY doc_id),
         |nc AS (SELECT doc_id, CAST(len(chunks) AS BIGINT) AS n_chunks FROM ch)
         |SELECT n.doc_id, n.n_chunks,
         |  CAST(coalesce(p.n_dup, 0) AS BIGINT) AS n_dup_chunks,
         |  ${Qh.oR4("CAST(coalesce(p.n_dup, 0) AS DOUBLE) / CAST(n.n_chunks AS DOUBLE)")} AS dup_frac
         |FROM nc n LEFT JOIN per p USING (doc_id)
         |ORDER BY n.doc_id""".stripMargin) { (s, dir) =>
      import s.implicits._
      // 1-based boundary positions (token i closes its chunk), then
      // chunks sliced between zipped (start, end) position pairs — the
      // zip_with form keeps each bp reference OUTSIDE the lambda (an
      // element_at(bp, k)-per-element form re-evaluates the inlined bp
      // subtree per element: measured 6× slower). The empty tail
      // segment (a boundary on the last token) filters out.
      val bpExpr =
        """filter(transform(sequence(1, size(toks)),
          |  i -> IF(md5_prefix32(element_at(toks, i), 31) % 8 = 0, i, 0)),
          |  p -> p > 0)""".stripMargin
      val chunksExpr =
        """filter(zip_with(
          |  concat(array(0), bp),
          |  concat(bp, array(size(toks))),
          |  (s, e) -> array_join(slice(toks, s + 1, e - s), ' ')),
          |  x -> x != '')""".stripMargin
      // materialized once: both consumers (instances + per-doc counts)
      // read the chunk table instead of re-running the chunking map
      val ch = Qh.materialize(Qh.t(s, dir, "documents")
        .select($"doc_id", expr(Qh.toksExpr).as("toks"))
        .filter(size($"toks") >= 1)
        .withColumn("bp", expr(bpExpr))
        .select($"doc_id", expr(chunksExpr).as("chunks")))
      dupUnitStats(
        ch.select($"doc_id", explode($"chunks").as("chunk"))
          .select($"doc_id", Qh.phash($"chunk", 37).as("h")),
        ch.select($"doc_id", size($"chunks").cast("bigint").as("n_chunks")),
        "n_chunks", "n_dup_chunks")
    }
  ) :+ fuzzyJoinDecl

  /** L14: FUZZY ENTITY MATCHING (record linkage) — the entity-level
    * complement of the document near-dup family: candidate pairs from
    * a cheap blocking key (leading name token + size — the classic
    * blocking discipline: compare only within blocks, never all-pairs),
    * scored with exact Levenshtein edit distance (both engines run the
    * same textbook DP, so distances are integer-identical). At 100 TB
    * the blocking join IS the scale story: pair volume is Σ block² not
    * corpus², and the block key is tunable like an LSH band. */
  // lazy: declared below `decls`, which references it (object vals
  // initialize in declaration order — same note as the oSigs vals)
  private lazy val fuzzyJoinDecl: Decl = Decl(
    "l14_fuzzy_join",
    """WITH p AS (
      |  SELECT p_partkey, p_name, p_size,
      |    split_part(p_name, ' ', 1) AS tok
      |  FROM part)
      |SELECT a.p_partkey AS part_a, b.p_partkey AS part_b,
      |  a.p_name AS name_a, b.p_name AS name_b,
      |  CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS dist
      |FROM p a JOIN p b
      |  ON a.tok = b.tok AND a.p_size = b.p_size
      | AND a.p_partkey < b.p_partkey
      |WHERE levenshtein(a.p_name, b.p_name) <= 2
      |ORDER BY part_a, part_b""".stripMargin) { (s, dir) =>
    import s.implicits._
    val p = Qh
      .tSpread(s, dir, "part")
      .select(
        $"p_partkey", $"p_name", $"p_size",
        substring_index($"p_name", " ", 1).as("tok"))
    p.as("a")
      .join(
        p.as("b"),
        $"a.tok" === $"b.tok" && $"a.p_size" === $"b.p_size" &&
          $"a.p_partkey" < $"b.p_partkey")
      .filter(levenshtein($"a.p_name", $"b.p_name") <= 2)
      .select(
        $"a.p_partkey".as("part_a"),
        $"b.p_partkey".as("part_b"),
        $"a.p_name".as("name_a"),
        $"b.p_name".as("name_b"),
        levenshtein($"a.p_name", $"b.p_name").cast("bigint").as("dist"))
      .orderBy("part_a", "part_b")
  }

  /** Per-document duplicated-span coverage: for each `w`-token window
    * of `docs.text`, the span is duplicated iff its window text recurs
    * verbatim in ANOTHER document. Returns one row per doc with ≥ w
    * tokens: (doc_id, n_spans, n_dup_spans, dup_frac).
    *
    * Narrow window explode → one hash-keyed count-distinct agg for the
    * duplicated-hash set → semi-join coverage. O(total tokens) plus two
    * hash shuffles; no all-pairs. PropertySpec checks it against a
    * brute-force model on random token streams. */
  def duplicatedSpanStats(docs: org.apache.spark.sql.DataFrame, w: Int)
      : org.apache.spark.sql.DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    val toks = docs
      .withColumn("toks", expr(Qh.toksExpr))
      .filter(size($"toks") >= w)
    // window instances (positions matter: a span duplicated at three
    // positions contributes three to the doc's duplicated coverage)
    val wins =
      toks.select(
        $"doc_id",
        explode(expr(
          s"""transform(sequence(0, size(toks) - $w),
             |  i -> md5_prefix32(array_join(slice(toks, i + 1, $w), ' '), 21))""".stripMargin))
          .as("h"))
    dupUnitStats(
      wins,
      toks.select($"doc_id", (size($"toks") - (w - 1)).cast("bigint").as("n_spans")),
      "n_spans", "n_dup_spans")
  }

  /** Per-doc duplicated-unit coverage, the downstream shared by the
    * span (fixed windows, above) and chunk (content-defined,
    * l2_chunk_dedup) dedup decls: `units` is (doc_id, h) instances,
    * `counts` is (doc_id, <nCol>) per-doc totals. The duplicated-hash
    * set is one hash-keyed aggregation (map-side combined,
    * count-distinct over doc_id); per-doc coverage is a semi-join of
    * instances against that set. O(total units) + two hash shuffles. */
  private def dupUnitStats(
      units: org.apache.spark.sql.DataFrame,
      counts: org.apache.spark.sql.DataFrame,
      nCol: String, dupCol: String): org.apache.spark.sql.DataFrame = {
    val s = units.sparkSession
    import s.implicits._
    val u = Qh.materialize(units)
    val dup = u
      .groupBy($"h")
      .agg(countDistinct($"doc_id").as("nd"))
      .filter($"nd" >= 2)
      .select($"h")
    val per = u
      .join(dup, Seq("h"), "left_semi")
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_dup"))
    counts
      .join(per, Seq("doc_id"), "left_outer")
      .select(
        $"doc_id",
        col(nCol),
        coalesce($"n_dup", lit(0L)).cast("bigint").as(dupCol),
        Qh.r4(coalesce($"n_dup", lit(0L)).cast(DoubleType) /
          col(nCol).cast(DoubleType)).as("dup_frac"))
      .orderBy("doc_id")
  }
}
