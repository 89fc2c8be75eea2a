package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.ExplainMode

/** Physical-plan assertions: the scale properties the Scaladocs claim
  * (pushdown, pruning, broadcast shapes, no cartesian products) are
  * checked here so a regression in plan shape fails CI, not a 100 TB
  * run. Explains are pre-AQE initial plans — structural hints and
  * join strategies are visible there. */
class PlanSpec extends SparkSpec {

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf0001)
      .queryExecution.explainString(ExplainMode.fromString("formatted"))

  private def planOf(df: DataFrame): String =
    df.queryExecution.explainString(ExplainMode.fromString("formatted"))

  test("hot scan paths stay inside whole-stage codegen") {
    // the 100 TB throughput story assumes fused codegen pipelines; an
    // interpreted expression slipping into a hot path (non-codegen UDF,
    // CodegenFallback expr) would silently cost 2-10x scan throughput
    for (q <- Seq("p1_prune", "p2_filter", "a1_hashagg", "j2_inner",
        "l4_quality_score", "l1_exact_dedup")) {
      // AQE only materializes codegen stages in the FINAL plan — run
      // the query (tiny sf), then look for the "*(n)" stage markers
      val df = SparkEntry.queries(q)(spark, sf0001)
      df.collect() // an action on THIS QueryExecution (write would clone it)
      val p = df.queryExecution.executedPlan.toString
      assert(p.contains("isFinalPlan=true"), s"$q: AQE did not finalize")
      assert(p.contains("*("),
        s"$q lost whole-stage codegen:\n${p.take(600)}")
    }
  }

  test("p1: projection prunes the parquet read schema to 3 columns") {
    val p = plan("p1_prune")
    assert(p.contains("ReadSchema"))
    val read = p.linesIterator.find(_.contains("ReadSchema")).get
    assert(read.contains("l_orderkey") && read.contains("l_extendedprice"))
    assert(!read.contains("l_quantity") && !read.contains("l_shipdate"),
      s"scan reads pruned columns: $read")
  }

  test("p2: filter is pushed down to the parquet scan") {
    val p = plan("p2_filter")
    val pushed = p.linesIterator.find(_.contains("PushedFilters")).getOrElse("")
    assert(pushed.contains("l_quantity") && pushed.contains("l_discount"),
      s"filters not pushed: $pushed")
  }

  test("j1: semi-join broadcasts the filtered dimension") {
    val p = plan("j1_semi_broadcast")
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftSemi"),
      "expected broadcast left-semi join")
  }

  test("j6: MERGE hint forces a sort-merge join") {
    assert(plan("j6_sortmerge").contains("SortMergeJoin"))
  }

  test("no hard broadcast hint on customer (scales with sf; AQE decides)") {
    // the LOGICAL plan must not carry a ResolvedHint on customer for
    // j2/j3 — physical BHJ chosen by size/AQE is fine
    for (q <- Seq("j2_inner", "j3_multiway")) {
      val lp = SparkEntry.queries(q)(spark, sf0001)
        .queryExecution.optimizedPlan.toString
      assert(!lp.contains("ResolvedHint"), s"$q: unexpected broadcast hint\n$lp")
    }
  }

  test("pair-generating LLM ops contain no cartesian product or BNLJ") {
    for (q <- Seq("l2_lsh_pairs", "l2_ngram_jaccard", "l2_cosine_neardup",
      "l2_cosine_neardup_bucketed", "l2_cosine_neardup_adaptive",
      "l2_simhash_blocked",
      "j7_range", "l2_substring_dedup", "l13_triangles",
      "w7_funnel", "w8_retention", "j13_spatial_grid",
      "l6_phash_dedup", "l6_audio_fp_dedup")) {
      val p = plan(q)
      assert(!p.contains("CartesianProduct"), s"$q: cartesian product!")
      assert(!p.contains("BroadcastNestedLoopJoin"), s"$q: BNLJ!")
    }
    // l3_ann_lsh: signatures are map-side projections over literal
    // hyperplanes — no join of any kind before the candidate equi-join.
    val p = plan("l3_ann_lsh")
    assert(!p.contains("CartesianProduct"), "l3_ann_lsh: cartesian product!")
    assert(!p.contains("BroadcastNestedLoopJoin"), "l3_ann_lsh: BNLJ!")
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin") ||
      p.contains("BroadcastHashJoin"), "l3_ann_lsh: candidate join is not equi")
  }

  test("l2 scale-dial variants: candidates from hash/merge equi-joins on the dial key") {
    // l2_simhash_blocked: the C(6,3) triple index is a narrow Generate
    // over map-side bit slicing; candidates come from an equi-join on
    // (t_id, bucket) — never a BNLJ on popcount.
    val pb = plan("l2_simhash_blocked")
    assert(pb.contains("Generate"), "triple index must be an explode")
    assert(pb.contains("SortMergeJoin") || pb.contains("ShuffledHashJoin") ||
      pb.contains("BroadcastHashJoin"), "blocked candidate join is not equi")
    // l2_cosine_neardup_bucketed: the quantizer cell is a map-side
    // projection; the pair join is an equi-join on it.
    val pc = plan("l2_cosine_neardup_bucketed")
    assert(pc.contains("SortMergeJoin") || pc.contains("ShuffledHashJoin") ||
      pc.contains("BroadcastHashJoin"), "bucketed cosine join is not equi")
    assert(pc.contains("dot_product"), "fused dot_product missing from plan")
  }

  test("l3 LSH signature generation is narrow (no Exchange before the candidate join)") {
    val e = Tables(spark, sf0001, "embeddings")
    val p = planOf(graft.queries.Similarity.sigs(spark, e))
    assert(!p.contains("Exchange"),
      s"LSH signature step shuffles — must be a pure map-side projection:\n$p")
  }

  test("ivfpq: candidates come from the list-id equi-join, never a cartesian") {
    val p = plan("l3_ann_ivfpq")
    assert(!p.contains("CartesianProduct"), "l3_ann_ivfpq: cartesian product!")
    // the 16-row centroid dim is the only BNLJ (bounded by construction);
    // the probe/list joins must be hash/merge equi-joins
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin") ||
      p.contains("BroadcastHashJoin"), "l3_ann_ivfpq: list join is not equi")
  }

  test("j10: bloom pre-filter sits on the fact side before the semi-join") {
    val p = plan("j10_bloom_semi")
    assert(p.contains("might_contain"),
      s"bloom probe missing from the physical plan:\n$p")
    assert(p.contains("LeftSemi"), "exact semi-join must remain for FP scrub")
  }

  test("j8 is the only declared cross join") {
    val p = plan("j8_cross")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("CartesianProduct"))
  }

  test("j13: spatial join is a cell equi-join with a narrow neighbor Generate") {
    val p = plan("j13_spatial_grid")
    assert(p.contains("Generate"),
      "probe-side 3x3 fanout must be an explode, not a join")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "spatial blocking must keep the join an equi-join, never all-pairs")
  }

  test("p15: correlated LATERAL decorrelates to one windowed equi-join") {
    // the engine must run the correlated LIMIT subquery as ONE pass
    // (window rank + join), never re-executed per outer row; the W4
    // bounded-heap rewrite should fire under the decorrelated rank
    val p = plan("p15_lateral")
    assert(p.contains("TopKPerGroup"),
      s"expected the W4 bounded-heap rewrite under the decorrelated rank:\n${p.take(600)}")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "lateral must not plan as per-outer-row re-execution")
  }

  test("l4_lm_score: count-table joins stay equi-joins; only the vocab scalar nested-loops") {
    val p = plan("l4_lm_score")
    assert(!p.contains("CartesianProduct"), "lm score: cartesian product!")
    // the one-row vocab broadcast is the single permitted BNLJ; the
    // bigram/unigram count joins must stay hash/merge equi-joins
    // (formatted explain lists each node twice: tree + detail header)
    val bnlj = "BroadcastNestedLoopJoin".r.findAllMatchIn(p).size
    assert(bnlj <= 2, s"lm score: more than one nested-loop join in\n${p.take(800)}")
  }

  test("s9: partition-column filter prunes via directory names, not row filters") {
    val p = plan("s9_partitioned_prune")
    val pf = p.linesIterator.find(_.contains("PartitionFilters")).getOrElse("")
    assert(pf.contains("event_type") && pf.contains("click"),
      s"partition filter not applied from directory layout: $pf")
    // the partition column never appears as a pushed DATA filter — the
    // scan must not open non-matching files at all
    val pushed = p.linesIterator.find(_.contains("PushedFilters")).getOrElse("")
    assert(!pushed.contains("event_type"), s"partition filter degraded to data filter: $pushed")
  }

  test("j11: salted join replicates the dim via a narrow generator (no extra shuffle)") {
    val p = plan("j11_salted_skew_join")
    assert(p.contains("Generate"), "dim-side salt replication must be an explode, not a join")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"),
      "salting must keep the join an equi-join")
  }

  test("l11b: semantic decontam broadcasts the eval side; no cartesian") {
    val p = plan("l11_semantic_decontam")
    assert(p.contains("BroadcastHashJoin"),
      s"eval side must broadcast — the train corpus is the big side:\n${p.take(600)}")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "semantic decontam must stay a label-blocked equi-join, never all-pairs")
  }

  test("l11: decontamination broadcasts the eval gram set; train side never shuffles") {
    val p = plan("l11_decontam")
    assert(p.contains("BroadcastHashJoin"), "eval side must broadcast")
    assert(!p.contains("SortMergeJoin"),
      "train corpus must not sort-shuffle for the contamination probe")
  }

  test("l13: the iteration join never shuffles the bucketed edge side") {
    // the 100 TB claim: ranks may be too big to broadcast, so pin the
    // co-location path — broadcast disabled, the bucketed adjacency
    // table must join with no exchange (and no sort: one sorted file
    // per bucket) anywhere on its side
    val thr = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      import org.apache.spark.sql.execution.FileSourceScanExec
      import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
      import org.apache.spark.sql.execution.joins.{ShuffledHashJoinExec, SortMergeJoinExec}
      import org.apache.spark.sql.functions._
      val e = graft.queries.Graph.edgeTable(spark, sf0001)
      val nodes = e.select(col("src").as("node")).distinct()
      val r = nodes.withColumn("r", lit(1000000000L))
      val it = graft.queries.Graph.iterate(e, nodes, r, 7L)
      def hasBucketedLeaf(p: org.apache.spark.sql.execution.SparkPlan): Boolean =
        p.collectLeaves().exists {
          case f: FileSourceScanExec => f.relation.bucketSpec.isDefined
          case _ => false
        }
      val joins = it.queryExecution.sparkPlan.collect {
        case j: SortMergeJoinExec => j
        case j: ShuffledHashJoinExec => j
      }.filter(hasBucketedLeaf)
      assert(joins.nonEmpty, "expected shuffled joins over the bucketed edge table")
      joins.foreach { j =>
        val edgeSides = j.children.filter(hasBucketedLeaf)
        assert(edgeSides.nonEmpty)
        edgeSides.foreach { side =>
          assert(side.collect { case x: ShuffleExchangeExec => x }.isEmpty,
            s"bucketed edge side re-shuffles:\n$j")
        }
      }
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thr)
  }

  test("j14: co-bucketed fact join runs with no exchange and no sort on either side") {
    // both facts persisted bucketed+sorted on the join key, one file
    // per bucket: the join must consume the layout directly — shuffle
    // paid once at ingest, never again (broadcast disabled so the
    // small fixture can't cheat the claim)
    // assert on the EXECUTED plan (EnsureRequirements has run — the
    // bare sparkPlan never carries the inserted exchanges/sorts, so a
    // check there is vacuous); AQE off so the tree is direct
    val saved = Seq("spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.enabled").map(k => k -> spark.conf.get(k))
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      import org.apache.spark.sql.execution.SortExec
      import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
      import org.apache.spark.sql.execution.joins.{ShuffledHashJoinExec, SortMergeJoinExec}
      import org.apache.spark.sql.functions._
      val li = graft.queries.Joins.bucketedLineitem(spark, sf0001)
      val o = graft.queries.Joins.bucketedOrders(spark, sf0001)
      val joined = li.join(o, col("l_orderkey") === col("o_orderkey"))
      val joins = joined.queryExecution.executedPlan.collect {
        case j: SortMergeJoinExec => j
        case j: ShuffledHashJoinExec => j
      }
      assert(joins.nonEmpty, "expected a shuffled join over the bucketed facts")
      joins.foreach { j =>
        j.children.foreach { side =>
          assert(side.collect { case x: ShuffleExchangeExec => x }.isEmpty,
            s"co-bucketed side re-shuffles:\n$j")
          assert(side.collect { case x: SortExec => x }.isEmpty,
            s"co-bucketed side re-sorts (bucket sort order not trusted):\n$j")
        }
      }
    } finally saved.foreach { case (k, v) => spark.conf.set(k, v) }
  }

  test("l2 LSH candidate self-join co-locates on the bucketed band table — no shuffle") {
    // the 100 TB dedup layout: banded signatures persisted bucketed +
    // sorted on the band key, so repeated dedup runs join candidates
    // with no exchange on either side
    val thr = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      import org.apache.spark.sql.execution.FileSourceScanExec
      import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
      import org.apache.spark.sql.execution.joins.{ShuffledHashJoinExec, SortMergeJoinExec}
      val cand = graft.queries.Dedup.bandCandidates(spark, sf0001)
      def bucketedLeaf(p: org.apache.spark.sql.execution.SparkPlan): Boolean =
        p.collectLeaves().exists {
          case f: FileSourceScanExec => f.relation.bucketSpec.isDefined
          case _ => false
        }
      val joins = cand.queryExecution.sparkPlan.collect {
        case j: SortMergeJoinExec => j
        case j: ShuffledHashJoinExec => j
      }
      assert(joins.nonEmpty, "candidate generation lost its equi-join")
      joins.foreach { j =>
        assert(j.children.forall(bucketedLeaf),
          s"candidate join side does not read the bucketed band table:\n$j")
        j.children.foreach { side =>
          assert(side.collect { case x: ShuffleExchangeExec => x }.isEmpty,
            s"bucketed band side re-shuffles:\n$j")
        }
      }
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thr)
  }

  test("l2 incremental dedup: the corpus band side joins without reshuffling") {
    // the daily-ingest contract: per-batch dedup work is batch-sized —
    // the corpus side must come off the bucketed band table with no
    // exchange; only the (small) new-batch side may shuffle to align
    val thr = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      import org.apache.spark.sql.execution.FileSourceScanExec
      import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
      import org.apache.spark.sql.execution.joins.{ShuffledHashJoinExec, SortMergeJoinExec}
      val df = SparkEntry.queries("l2_incremental_dedup")(spark, sf0001)
      def bucketedLeaf(p: org.apache.spark.sql.execution.SparkPlan): Boolean =
        p.collectLeaves().exists {
          case f: FileSourceScanExec => f.relation.bucketSpec.isDefined
          case _ => false
        }
      val joins = df.queryExecution.sparkPlan.collect {
        case j: SortMergeJoinExec => j
        case j: ShuffledHashJoinExec => j
      }.filter(j => j.children.exists(bucketedLeaf))
      assert(joins.nonEmpty, "candidate join no longer reads the bucketed band table")
      joins.foreach { j =>
        j.children.filter(bucketedLeaf).foreach { side =>
          assert(side.collect { case x: ShuffleExchangeExec => x }.isEmpty,
            s"corpus band side re-shuffles — batch dedup went corpus-sized:\n$j")
        }
      }
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thr)
  }

  test("kmeans: assignment is a narrow map over literal centroids (no join, no shuffle)") {
    val e = graft.queries.Qh.t(spark, sf0001, "embeddings").select("vec_id", "embedding")
    val cents = graft.operators.KMeansLloyd.initByIds(e, 8)
    val p = planOf(graft.operators.KMeansLloyd.assign(e, cents))
    assert(!p.contains("Exchange") && !p.contains("Join"),
      s"assignment must be shuffle-free:\n$p")
  }

  test("c1: upsert-latest compacts with partial+final max_by, not a window sort") {
    val p = plan("c1_upsert_latest")
    assert(p.contains("partial_max_by") || p.contains("partial max_by")
      || (p.contains("max_by") && p.contains("HashAggregate")),
      s"expected hash-agg max_by compaction:\n${p.take(800)}")
    assert(!p.contains("RunningWindowFunction") && !p.contains("row_number"),
      "compaction must not pay a per-key window sort")
  }

  test("c3: the refreshed view is served from the MV alone — no fixture rescan") {
    // the incremental-maintenance contract: after the merge, reading the
    // aggregate NEVER touches the fact table again (cost ∝ |MV|)
    val p = plan("c3_incremental_agg")
    assert(p.contains("c3_mv"), s"expected the MV scan:\n${p.take(600)}")
    assert(!p.contains("events.parquet"),
      "serving the refreshed aggregate must not rescan the fact fixture")
  }

  test("s13: join-driven filter prunes fact partitions dynamically (DPP)") {
    val p = plan("s13_dpp_join")
    // the filter on the dim's derived attribute must reach the FACT scan
    // as a runtime partition filter — join-driven, not a literal
    val pf = p.linesIterator.filter(_.contains("PartitionFilters")).mkString("\n")
    assert(pf.contains("dynamicpruningexpression"),
      s"fact scan not dynamically pruned — at 100 TB this scans every date dir: $pf")
    assert(pf.contains("event_date"),
      s"dynamic pruning not keyed on the partition column: $pf")
  }

  test("s10: probing the vector index is partition pruning on list_id") {
    val p = plan("s10_vector_index")
    val pf = p.linesIterator.filter(_.contains("PartitionFilters")).mkString("\n")
    assert(pf.contains("list_id"),
      s"index probe must prune inverted-list directories: $pf")
  }

  test("l3_ann_trained: serving the TRAINED index is partition pruning on list_id") {
    val p = plan("l3_ann_trained")
    val pf = p.linesIterator.filter(_.contains("PartitionFilters")).mkString("\n")
    assert(pf.contains("list_id"),
      s"trained-index probe must prune inverted-list directories: $pf")
  }

  test("a1: aggregation is partial+final (map-side combine)") {
    val p = plan("a1_hashagg")
    assert(p.linesIterator.count(_.contains("HashAggregate")) >= 2,
      "expected partial + final HashAggregate")
  }

  test("l2_cc_star: one star round is bounded equi-join+agg work — no cartesian") {
    // the round-count dial's per-round cost claim: large-star then
    // small-star is groupBy + equi-join (+ distinct) each — a cartesian
    // or nested-loop sneaking in would make every round corpus²
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import spark.implicits._
    val edges = Seq((5L, 1L), (7L, 3L), (9L, 5L), (9L, 2L)).toDF("u", "v")
    val round = graft.queries.Dedup.smallStar(graft.queries.Dedup.largeStar(edges))
    val p = planOf(round)
    assert(!p.contains("CartesianProduct") && !p.contains("NestedLoop"),
      s"star round must stay equi-join shaped:\n$p")
    val shuffles = round.queryExecution.sparkPlan.collect {
      case e: ShuffleExchangeExec => e
    }
    assert(shuffles.size <= 8,
      s"star round shuffle count grew past its bounded shape: ${shuffles.size}")
  }

  test("l2_survivor_selection: the election is one codegen'd hash agg — no window, no struct-key sort") {
    // the decl's plan claim: the packed-BIGINT election key keeps the
    // survivor vote a plain max+count HashAggregate (a struct ordering
    // key would demote it to SortAggregate; a Window election would
    // add a per-partition sort), and any cartesian would break the
    // whole family's blocking contract
    val p = plan("l2_survivor_selection")
    assert(!p.contains("Window"),
      s"election must be aggregate-shaped, not a window sort:\n${p.take(800)}")
    assert(!p.contains("SortAggregate"),
      "packed election key lost hash-aggregability")
    assert(!p.contains("CartesianProduct") && !p.contains("NestedLoop"))
    assert(p.linesIterator.count(_.contains("HashAggregate")) >= 2,
      "expected partial + final HashAggregate for the election")
  }

  test("s22c: the change-feed fold is scan → union → one signed agg — no join") {
    // incremental consumption must not re-read or join against the
    // table: each version's delta scans once, the signed union feeds a
    // single map-side-combined aggregate
    val p = plan("s22c_change_feed")
    assert(!p.contains("Join"), s"change-feed fold must not join:\n${p.take(800)}")
    assert(p.contains("Union"), "expected the signed union of delta batches")
    assert(p.linesIterator.count(_.contains("HashAggregate")) >= 2,
      "expected partial + final HashAggregate")
  }

  test("l9_mixture_interleave: streams cut on the bounded heap, never a full-corpus window sort") {
    // the stride-merge prefix only needs within-stream ranks <= 800, so
    // the corpus must hit the TopKPerGroup operator first; the windows
    // that follow run on the bounded survivor set
    val p = plan("l9_mixture_interleave")
    assert(p.contains("TopKPerGroup"),
      s"per-stream cut must ride the bounded-heap operator:\n${p.take(600)}")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"))
  }

  test("l4_pmi_phrases: unhinted unigram joins, one-row totals, bounded top-50") {
    // the unigram table is vocab-sized (10⁷–10⁸ tokens at 100 TB), so
    // it must NOT carry a hard broadcast hint — AQE broadcasts at
    // runtime iff the vocab is actually small; the top-50 stays a
    // bounded TakeOrdered, never a full sort of the bigram table
    val p = plan("l4_pmi_phrases")
    assert(p.contains("TakeOrderedAndProject"),
      s"top-50 must be a bounded TakeOrdered, not a global sort:\n${p.take(600)}")
    assert(!p.contains("CartesianProduct"), "only the one-row totals may nested-loop")
    val lp = SparkEntry.queries("l4_pmi_phrases")(spark, sf0001)
      .queryExecution.optimizedPlan.toString
    // exactly the totals' one-row hint may survive (its two inputs each
    // carry one side of the hinted cross join); a hint on either
    // vocab-sized unigram join would OOM the driver at corpus scale
    val hinted = lp.linesIterator.count(_.contains("strategy=broadcast"))
    assert(hinted <= 1,
      s"expected at most the one-row totals hint, found $hinted:\n$lp")
  }

  test("l2_cosine_neardup_adaptive: the split decision rides a broadcast, pairs stay an equi-join") {
    // the over-cap re-block is a ≤256-row cell-count table joined back
    // onto the vectors — it must broadcast (a shuffle there would cost
    // a second corpus exchange just to pick block ids); the pair join
    // itself stays a cell equi-join (no cartesian — gated in the
    // pair-generating sweep above)
    val p = plan("l2_cosine_neardup_adaptive")
    assert(p.contains("BroadcastHashJoin"),
      s"cell-size join must broadcast:\n${p.take(800)}")
  }

  test("l3_semantic_dedup: within-cluster pairs come from an equi-join on cid") {
    // SemDeDup's scale contract: pair volume is Σ cluster², driven by a
    // cid equi-join — never an all-pairs cartesian; assignment stays a
    // narrow map (gated separately by the kmeans assignment test)
    val p = plan("l3_semantic_dedup")
    assert(!p.contains("CartesianProduct") && !p.contains("NestedLoop"),
      s"semantic dedup lost its cid blocking:\n$p")
    assert(p.contains("Join"), "expected the within-cluster pair join")
  }

  test("l4_count_min: one corpus agg; estimates serve off the broadcast cell grid") {
    val p = plan("l4_count_min")
    // the (token → tf) agg is partial+final (map-side combined)
    assert(p.linesIterator.count(_.contains("HashAggregate")) >= 2,
      "tf aggregation lost its partial+final shape")
    // the ≤2048-cell sketch joins broadcast — the corpus-sized side
    // must never shuffle to meet it
    assert(p.contains("BroadcastHashJoin"),
      s"cell-grid join is not broadcast:\n$p")
  }

  test("l4_bm25: queries meet the postings broadcast; top-10 rides the bounded heap") {
    val p = plan("l4_bm25")
    // the bounded (3 × |langs|) query set must broadcast to the
    // corpus-sized postings — a shuffled join here would re-shuffle
    // the whole postings table per query-set refresh
    assert(p.contains("BroadcastHashJoin"),
      s"query-term join is not broadcast:\n$p")
    // the one-row (N, avgdl) stats join may plan as a broadcast nested
    // loop — that's the broadcast scalar, fine; a cartesian is not
    assert(!p.contains("CartesianProduct"), s"unexpected cartesian:\n$p")
    // per-query top-10: the window idiom lowers onto TopKPerGroupExec
    assert(p.linesIterator.count(_.contains("TopKPerGroup")) >= 2,
      s"per-query top-10 not on the bounded-heap operator:\n$p")
  }

  test("l3_pca_power: the Gram aggregation is partial+final with a constant buffer") {
    // the covariance shape: per-partition d²-long partials merged
    // map-side — the shuffle payload must be the agg buffer, never rows
    import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
    import org.apache.spark.sql.functions.{col, udaf}
    val gramAgg = udaf(graft.functions.GramAgg.agg,
      ExpressionEncoder[Array[Float]]())
    val p = planOf(graft.queries.Qh.t(spark, sf0001, "embeddings")
      .agg(gramAgg(col("embedding")).as("g")))
    assert(p.linesIterator.count(_.contains("Aggregate")) >= 2,
      s"Gram agg lost its partial+final shape:\n$p")
  }

  test("o1: top-k compiles to TakeOrderedAndProject, not a global sort") {
    val p = plan("o1_topk")
    assert(p.contains("TakeOrderedAndProject"), s"global sort for top-k:\n$p")
  }

  test("plain window top-k idiom is rewritten onto the custom bounded-heap operator") {
    // user-written row_number()+filter — no DSL call — must plan to
    // partial+final TopKPerGroupExec via the TopKWindowRewrite rule
    val p = plan("w4_topk_window_idiom")
    assert(p.linesIterator.count(_.contains("TopKPerGroup")) >= 2,
      s"window idiom not rewritten to TopKPerGroupExec:\n$p")
  }

  test("the rewrite fires inside the ANN top-k tails too") {
    val p = plan("l3_cosine_topk")
    assert(p.contains("TopKPerGroup"),
      "rnk<=3 filter in l3_cosine_topk should run on the bounded-heap operator")
  }

  test("w7/w8: funnel and retention scan the fact exactly once") {
    // the three funnel stages are chained windows over ONE user-keyed
    // exchange — the naive per-stage-join form scans the fact 3×
    for (q <- Seq("w7_funnel", "w8_retention")) {
      val p = plan(q)
      // count the formatted plan's per-node detail headers — the tree
      // section repeats the same node, so raw substring counts double
      val scans = p.linesIterator.count(_.trim.matches("""\(\d+\) Scan parquet\s*"""))
      assert(scans == 1, s"$q reads the fact $scans times:\n$p")
    }
  }

  test("p13: correlated subqueries decorrelate to joins (no per-row re-execution)") {
    val p = plan("p13_subqueries")
    assert(p.contains("LeftSemi"), s"EXISTS did not become a semi-join:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"correlated subquery planned a nested loop:\n$p")
  }

  test("bottom-k sampling runs on the bounded-heap operator, not a window sort") {
    // the mergeability claim in the l8_bottomk_sample scaladoc: the
    // window idiom must lower onto partial+final TopKPerGroupExec so
    // losers never cross the exchange
    for (q <- Seq("l8_bottomk_sample", "l8_weighted_sample")) {
      val p = plan(q)
      assert(p.linesIterator.count(_.contains("TopKPerGroup")) >= 2,
        s"$q not on the bounded-heap operator:\n$p")
    }
  }

  test("w9: rolling z-score runs on ONE user-keyed exchange and ONE window") {
    // the docstring's shape claim: one exchange + one in-partition sort
    // serves all three trailing aggs (count/sum/sum²) — Catalyst must
    // collapse them into a single Window over a single hashpartitioning
    val p = SparkEntry.queries("w9_anomaly")(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(p.linesIterator.count(_.contains("Exchange hashpartitioning")) == 1,
      s"w9: expected exactly one user-keyed exchange:\n$p")
    assert(p.linesIterator.count(_.contains("Window [")) == 1,
      s"w9: trailing aggs did not collapse into one Window:\n$p")
    // only other exchange: the final presentation orderBy
    assert(p.linesIterator.count(_.contains("Exchange")) == 2,
      s"w9: unexpected extra shuffle:\n$p")
  }

  test("w10: after the one daily hash agg, the decomposition never rescans the fact") {
    // the heavy step is ONE fact-sized agg (materialized); grid bounds,
    // densify, windows, and the seasonal join all run on the days-sized
    // series — and the seasonal means join back via broadcast
    val p = plan("w10_seasonal_decomp")
    val scans = p.linesIterator.count(_.trim.matches("""\(\d+\) Scan parquet\s*"""))
    assert(scans == 0, s"w10 rescans the fact $scans times after the daily agg:\n$p")
    assert(p.contains("BroadcastHashJoin"),
      s"w10: seasonal means must broadcast back onto the series:\n$p")
  }

  test("l4_bpe_train: serving the vocab never rescans the corpus; argmax is TakeOrdered") {
    // ONE corpus scan happened at word-frequency materialization; the
    // decl's output (merges + top symbols) runs on vocab-sized tables
    val p = plan("l4_bpe_train")
    val scans = p.linesIterator.count(_.trim.matches("""\(\d+\) Scan parquet\s*"""))
    assert(scans == 0, s"l4_bpe_train rescans the corpus $scans times:\n$p")
    assert(p.contains("TakeOrderedAndProject"),
      s"top-symbol selection should be TakeOrdered, not a global sort:\n$p")
  }

  test("l4_bpe_encode: corpus streams map-side through a broadcast vocab join") {
    // the serving claim: vocab (vocabulary-sized) broadcasts, the
    // corpus is scanned once and never shuffles before the join
    val p = plan("l4_bpe_encode")
    val scans = p.linesIterator.count(_.trim.matches("""\(\d+\) Scan parquet\s*"""))
    assert(scans == 1, s"l4_bpe_encode scans the corpus $scans times:\n$p")
    assert(p.contains("BroadcastHashJoin"),
      s"vocab join must broadcast (corpus stays map-side):\n$p")
  }

  test("l4_lm_score: scoring scans the corpus exactly once (count tables materialized)") {
    // the docstring's materialize-once claim: bigram/unigram count
    // tables are consumed multiple times but built once — the served
    // plan reads the corpus for the doc-bigram stream only
    val p = plan("l4_lm_score")
    // the doc-bigram stream is materialized alongside the count tables,
    // so SERVING the scores touches no parquet at all — the corpus was
    // scanned exactly once, at materialization
    val scans = p.linesIterator.count(_.trim.matches("""\(\d+\) Scan parquet\s*"""))
    assert(scans == 0, s"l4_lm_score rescans the corpus $scans times at serve:\n$p")
  }

  test("t13: streaming envelope read plans a full-schema scan with the filter above it") {
    // Spark plans streaming v2 scans WITHOUT operator pushdown, so the
    // micro-batch EnvelopeScan must carry the FULL envelope schema and
    // the query's filter must sit above it — pinned so a Spark upgrade
    // that adds streaming pushdown (or a regression that silently drops
    // the filter) surfaces here
    import spark.implicits._
    val land = java.nio.file.Files.createTempDirectory("t13_plan_land").toString
    val ckpt = java.nio.file.Files.createTempDirectory("t13_plan_ckpt").toString
    graft.sources.KafkaIO.toEnvelope(Tables(spark, sf0001, "events").limit(50))
      .select($"value").write.mode("overwrite").text(land)
    val q = spark.readStream.format("graft.sources.EnvelopeSource")
      .option("path", land).load()
      .filter($"event_type" =!= "signup")
      .groupBy($"event_type")
      .agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("n"),
        org.apache.spark.sql.functions.sum($"value").as("tv"))
      .writeStream.format("memory").queryName("t13_plan_out")
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .outputMode("complete").start()
    try q.awaitTermination() finally q.stop()
    val exec = q.asInstanceOf[
        org.apache.spark.sql.execution.streaming.runtime.StreamingQueryWrapper]
      .streamingQuery.lastExecution.executedPlan.toString
    val scanLine = exec.linesIterator.find(_.contains("EnvelopeScan"))
      .getOrElse(fail(s"no EnvelopeScan in streaming plan:\n$exec"))
    assert(scanLine.contains("event_type") && scanLine.contains("value")
        && scanLine.contains("event_id"),
      s"streaming scan must read the full envelope schema: $scanLine")
    assert(exec.contains("Filter") && exec.contains("signup"),
      s"the stream's filter must sit above the scan:\n$exec")
  }

  test("CBO: with ANALYZE stats, the join reorders to the selective dimension first") {
    // j3_multiway's order is AUTHORED (fact-first, dims broadcast); this
    // pins the optimizer's own cost-based reorder: catalog tables with
    // column stats + CBO on → the (filtered) customer⋈orders join runs
    // FIRST even though the query text joins lineitem⋈orders first.
    // Without CBO the authored order survives — the contrast proves the
    // reorder is stats-driven, not heuristic.
    import org.apache.spark.sql.catalyst.plans.logical.{Join, LogicalPlan}
    val db = "cbo_demo"
    spark.sql(s"CREATE DATABASE IF NOT EXISTS $db")
    val cboKeys = Seq("spark.sql.cbo.enabled", "spark.sql.cbo.joinReorder.enabled")
    val saved = cboKeys.map(k => k -> spark.conf.getOption(k))
    try {
      for (t <- Seq("customer", "orders", "lineitem")) {
        spark.sql(s"DROP TABLE IF EXISTS $db.$t")
        spark.sql(
          s"CREATE TABLE $db.$t USING parquet LOCATION '$sf0001/$t.parquet'")
        spark.sql(s"ANALYZE TABLE $db.$t COMPUTE STATISTICS FOR ALL COLUMNS")
      }
      def query() = spark.sql(
        s"""SELECT c_name, sum(l_extendedprice) AS rev
           |FROM $db.lineitem
           |JOIN $db.orders ON l_orderkey = o_orderkey
           |JOIN $db.customer ON o_custkey = c_custkey
           |WHERE c_mktsegment = 'BUILDING'
           |GROUP BY c_name""".stripMargin)
      // the innermost join (no Join children) is where the plan starts
      def innermost(p: LogicalPlan): LogicalPlan = {
        val joins = p.collect { case j: Join => j }
        joins.filter(j => j.children.forall(c => c.collect { case x: Join => x }.isEmpty))
          .headOption.getOrElse(fail(s"no innermost join in:\n$p"))
      }
      cboKeys.foreach(spark.conf.set(_, "true"))
      val withCbo = innermost(query().queryExecution.optimizedPlan).toString
      assert(withCbo.contains("customer") && withCbo.contains("orders")
          && !withCbo.contains("lineitem"),
        s"CBO did not start from the selective customer⋈orders join:\n$withCbo")
      cboKeys.foreach(spark.conf.set(_, "false"))
      val noCbo = innermost(query().queryExecution.optimizedPlan).toString
      assert(noCbo.contains("lineitem") && noCbo.contains("orders"),
        s"without CBO the authored lineitem-first order should survive:\n$noCbo")
    } finally {
      saved.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None) => spark.conf.unset(k)
      }
      spark.sql(s"DROP DATABASE IF EXISTS $db CASCADE")
    }
  }

  test("l4_repetition: doc-local repetition stats never shuffle a (doc, gram) pair") {
    // the scaladoc's claim: per-doc gram stats are computed inside the
    // row (sort + run-length over an array), so the plan has no
    // aggregate, no join, and no hash exchange — only the output
    // ORDER BY's range partitioning
    val p = plan("l4_repetition")
    assert(!p.contains("HashAggregate") && !p.contains("Join"),
      s"repetition stats left the narrow map:\n$p")
    assert(!p.contains("hashpartitioning"),
      s"unexpected hash exchange:\n$p")
  }

  test("l2_chunk_dedup: chunking is map-side; downstream is hash-keyed, never all-pairs") {
    val p = plan("l2_chunk_dedup")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"chunk dedup planned an all-pairs join:\n$p")
    // instances vs duplicated-hash set must be the semi-join shape
    assert(p.contains("LeftSemi"), s"dup-set join is not a semi-join:\n$p")
  }

  test("a10: KMV bottom-k runs on the bounded-heap operator; no cartesian in the algebra") {
    val p = plan("a10_kmv_sketch")
    // per-lang bottom-64 is the window idiom TopKWindowRewrite lowers
    // onto partial+final TopKPerGroupExec (KMV's mergeability claim)
    assert(p.linesIterator.count(_.contains("TopKPerGroup")) >= 2,
      s"per-lang bottom-k not on the bounded-heap operator:\n$p")
    // lang-pair generation is a deliberate broadcast nested loop over
    // the |langs|-sized sketch summary — a cartesian over DATA is not
    assert(!p.contains("CartesianProduct"),
      s"cartesian in the sketch algebra:\n$p")
  }

  test("l3_jl_projection: projection is a narrow map; pairing is one equi-join") {
    val p = plan("l3_jl_projection")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"JL pairing planned an all-pairs join:\n$p")
    // 16 components per side are plain projections over the scan — the
    // crossJoin(broadcast(planes)) + groupBy anti-shape would Generate
    assert(!p.contains("Generate"), s"projection should not explode:\n$p")
  }

  test("l13_hits: each half-step reads its own adjacency orientation; no cartesian") {
    // the auth step joins on src over the src-bucketed table, the hub
    // step on dst over the dst-bucketed one — both orientations must
    // appear in the plan (a single-layout plan would reshuffle the
    // fact-sized edge side every iteration). The one-row Σraw
    // normalizers ride as broadcast nested loops; a cartesian over
    // data would not be one.
    val p = plan("l13_hits")
    // src table is pr_edges_<pid>_<hash>, dst is pr_edges_dst_<pid>_<hash>
    assert(p.matches("(?s).*pr_edges_\\d.*") && p.contains("pr_edges_dst_"),
      s"expected both bucketed adjacency orientations in the plan:\n$p")
    assert(!p.contains("CartesianProduct"), s"cartesian in HITS:\n$p")
  }

  test("l13_bfs: relaxation joins read the bucketed adjacency; no cartesian") {
    val p = plan("l13_bfs")
    assert(p.matches("(?s).*pr_edges_\\d.*"),
      s"BFS must relax over the bucketed adjacency:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"non-equi join in BFS:\n$p")
  }

  test("s23: the deletion-vector reconcile is a broadcast anti-join on (file, pos)") {
    // merge-on-read's scale contract: the DV side is deletes-sized and
    // must broadcast; a shuffled anti-join would re-shuffle the data
    // files on every read
    val p = plan("s23_merge_on_read")
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftAnti"),
      s"DV reconcile should be a broadcast left-anti join:\n$p")
    assert(!p.contains("CartesianProduct"), s"cartesian in MOR read:\n$p")
  }

  test("l10_drift: one corpus-sized agg carries both cohorts; totals broadcast back") {
    // the cohort split must ride the SAME (lang, token) aggregation as
    // conditional sums — a per-cohort scan or join would read the
    // corpus twice. The tf table is Qh.materialize'd (computed once by
    // construction), so the serve plan must contain NO parquet scan at
    // all: both consumers read the checkpoint, never the corpus.
    val p = plan("l10_drift")
    val scans = p.linesIterator.count(_.trim.matches("""\(\d+\) Scan parquet\s*"""))
    assert(scans == 0, s"drift re-reads the corpus $scans times past the materialize:\n$p")
    assert(p.contains("BroadcastHashJoin"), s"per-lang totals not broadcast:\n$p")
  }

  test("w11: EWMA is one user-keyed agg + fold — no join, no window, no extra exchange") {
    // the recursive smoother runs as a per-key ordered fold AFTER one
    // collect agg; a join- or window-shaped plan would mean the fold
    // escaped into a per-step self-join (the O(n²) anti-form)
    val p = plan("w11_ewma")
    assert(!p.contains("Join") && !p.contains("Window"),
      s"EWMA fold left the single-agg shape:\n$p")
    val exchanges = p.linesIterator.count(_.trim.matches("""\(\d+\) Exchange\s*"""))
    assert(exchanges <= 2, s"EWMA shuffles more than agg+sort:\n$p")
  }

  test("l10_zipf: one corpus scan; ranking and moments run on the vocab-sized table") {
    val p = plan("l10_zipf")
    val scans = p.linesIterator.count(_.trim.matches("""\(\d+\) Scan parquet\s*"""))
    assert(scans == 1, s"zipf reads the corpus $scans times:\n$p")
    assert(!p.contains("Join"), s"unexpected join in the fit:\n$p")
  }

  test("l15_cluster_split: one corpus scan, one content-hash exchange, no join") {
    // the split is a map-side hash and BOTH report legs must derive
    // from the one cluster-level agg (a second consumer would recompute
    // the corpus shuffle; a join-shaped leak check would re-read it)
    val p = plan("l15_cluster_split")
    val scans = p.linesIterator.count(_.trim.matches("""\(\d+\) Scan parquet\s*"""))
    assert(scans == 1, s"cluster split reads the corpus $scans times:\n$p")
    assert(!p.contains("Join"), s"unexpected join in the split:\n$p")
  }

  test("l16_pii_redact: narrow regex projection, no shuffle before the source agg") {
    val p = plan("l16_pii_redact")
    val scans = p.linesIterator.count(_.trim.matches("""\(\d+\) Scan parquet\s*"""))
    assert(scans == 1, s"redaction reads the corpus $scans times:\n$p")
    assert(!p.contains("Join") && !p.contains("Window"),
      s"redaction left the narrow-projection shape:\n$p")
    val exchanges = p.linesIterator.count(_.trim.matches("""\(\d+\) Exchange\s*"""))
    assert(exchanges <= 2, s"redaction shuffles more than agg+sort:\n$p")
  }

  test("flagship fact side is shuffle-free (broadcast semi + narrow maps)") {
    val p = planOf(SparkEntry.entry(spark))
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftSemi"))
    // in the formatted tree the STREAMED (fact) branch lines carry the
    // ':' margin; only the broadcast (dim) branch may contain exchanges.
    // (The dim branch legitimately shuffles for its distinct.)
    val factBranchExchanges = p.linesIterator
      .filter(l => l.trim.startsWith(":") && l.contains("Exchange"))
    assert(factBranchExchanges.isEmpty,
      s"fact side shuffles:\n${factBranchExchanges.mkString("\n")}\n$p")
  }
}
