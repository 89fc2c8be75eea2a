package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Distributed Lloyd's k-means over an embedding column — the trainer
  * that produces the IVF coarse-quantizer centroids (`l3_ann_ivf` /
  * `l3_ann_ivfpq` consume exactly this kind of model; their in-repo
  * decls use deterministic stand-in centroids so their oracles stay
  * closed-form, and THIS operator is the production path that fits the
  * real ones — `l3_ann_trained` composes the full train → partitioned
  * index → pruned-serve lifecycle with NO stand-ins, oracle-checked).
  *
  * Execution shape per iteration (the classic scalable k-means layout —
  * Lloyd 1957/1982; same data-parallel decomposition as MLlib's
  * implementation, rebuilt here Spark-SQL-native):
  *
  *  - '''Assignment''' is a NARROW map: the k centroids are model
  *    parameters (driver-side literals, like the LSH planes), so each
  *    row computes k fused-fold L2 distances and an argmin in one
  *    projection — no join, no shuffle, no UDF.
  *  - '''Update''' is one partial-aggregated shuffle: `posexplode` the
  *    64-dim vectors (narrow, 64× rows), `groupBy(cid, pos)` with
  *    map-side combine — the shuffle carries only k·64·numPartitions
  *    partial sums regardless of corpus size, then k·64 tiny rows are
  *    collected as the next iteration's literals. At 100 TB the corpus
  *    scan dominates; the shuffle is constant-size.
  *
  * == Cross-engine determinism (the oracle contract) ==
  *
  * Centroid means are computed in FIXED-POINT: each element is rounded
  * half-up at 1e-6 to an exact BIGINT, summed (integer addition is
  * associative — no shuffle-order drift), and divided back in a fixed
  * operation order (`sum / n / 1e6`). Distances are pure per-row left
  * folds over doubles. Every arithmetic step is bit-identical in Spark
  * and DuckDB, so a hash-compare of assignments after ANY number of
  * iterations is exact — no tolerance band needed.
  */
object KMeansLloyd {

  /** Squared L2 as the same sequential left fold the oracle states:
    * `((0 + t1) + t2) + …` with `ti = (x_i - y_i)^2` — see
    * [[graft.queries.Qh.oDot]] for why the fold must be explicit. */
  def l2sq(emb: Column, cent: Seq[Double]): Column = {
    val c = array(cent.map(lit): _*)
    aggregate(
      zip_with(emb.cast(ArrayType(DoubleType)), c,
        (x, y) => (x - y) * (x - y)),
      lit(0.0), (acc, t) => acc + t)
  }

  /** Oracle-side fold over two DOUBLE-list columns (same shape). */
  def oL2sq(x: String, y: String): String =
    s"list_reduce(list_prepend(CAST(0 AS DOUBLE), list_transform(range(len($x)), i -> ($x[i+1] - $y[i+1]) * ($x[i+1] - $y[i+1]))), (a, b) -> a + b)"

  /** (vec_id, embedding, cid, dist): nearest centroid per row, ties →
    * smallest cid (matches the oracle's `row_number ORDER BY d, cid`).
    * Distances are staged as named columns so each fold appears once in
    * the tree (the l3_ann_pq lesson: inlining k-way least() into the
    * when-chain copies the fold subtree k² times — pure codegen bloat).
    * `least() === d_i` equality is safe: the min IS one of the staged
    * values bit-exactly. */
  def assign(e: DataFrame, cents: Seq[(Int, Seq[Double])]): DataFrame = {
    val cids = cents.map(_._1).sorted
    val byId = cents.toMap
    val withD = e.select(col("vec_id") +: col("embedding") +:
      cids.map(cid => l2sq(col("embedding"), byId(cid)).as(s"_d_$cid")): _*)
    val mn = least(cids.map(cid => col(s"_d_$cid")): _*)
    val cidCol = cids.tail
      .foldLeft(when(col(s"_d_${cids.head}") === col("_mn"), cids.head)) {
        (acc, cid) => acc.when(col(s"_d_$cid") === col("_mn"), cid)
      }.otherwise(-1)
    withD.withColumn("_mn", mn)
      .select(col("vec_id"), col("embedding"),
        cidCol.as("cid"), col("_mn").as("dist"))
  }

  /** One Lloyd step: fixed-point elementwise means of each cluster.
    * Returns the new centroids (clusters that lost every member drop
    * out, identically on both engines). */
  def step(e: DataFrame, cents: Seq[(Int, Seq[Double])]): Seq[(Int, Seq[Double])] = {
    val a = assign(e, cents)
    val rows = a
      .select(col("cid"), posexplode(col("embedding")).as(Seq("pos", "v")))
      .groupBy("cid", "pos")
      .agg(((sum(floor(col("v").cast(DoubleType) * lit(1000000.0) + lit(0.5)))
        .cast(DoubleType) / count(lit(1)).cast(DoubleType)) / lit(1000000.0))
        .as("mv"))
      .collect()
    rows.groupBy(_.getInt(0)).toSeq
      .map { case (cid, rs) =>
        cid -> rs.sortBy(_.getInt(1)).map(_.getDouble(2)).toSeq
      }
      .sortBy(_._1)
  }

  /** `iters` full Lloyd iterations from `init`. */
  def fit(e: DataFrame, init: Seq[(Int, Seq[Double])], iters: Int): Seq[(Int, Seq[Double])] =
    (0 until iters).foldLeft(init)((c, _) => step(e, c))

  /** Fixed-point centroid displacement between two models: max over
    * clusters and dims of the 1e-6-unit integer difference — an EXACT
    * Long, so the convergence test is bit-deterministic across runs
    * (no float-noise flakes). A cluster present in only one model
    * (emptied out) reports Long.MaxValue: never converged. */
  def deltaFp(a: Seq[(Int, Seq[Double])], b: Seq[(Int, Seq[Double])]): Long = {
    val bm = b.toMap
    val ds = a.map { case (cid, va) =>
      bm.get(cid) match {
        case Some(vb) if vb.size == va.size =>
          va.lazyZip(vb).map((x, y) =>
            math.abs(math.round(x * 1e6) - math.round(y * 1e6))).max
        case _ => Long.MaxValue
      }
    }
    if (a.size != b.size || ds.isEmpty) Long.MaxValue else ds.max
  }

  /** Convergence-mode training — the production driver loop the
    * fixed-iteration oracle decls deliberately don't use (their
    * contract needs a closed-form unrolled CTE): iterate until the
    * centroid displacement falls to `tolFp` (in 1e-6 element units) or
    * `maxIters` is hit. Returns (model, iterationsRun). Per-iteration
    * cost is identical to [[step]]; the delta is computed driver-side
    * over the k·dim model — no extra cluster work. */
  def fitUntil(
      e: DataFrame, init: Seq[(Int, Seq[Double])],
      maxIters: Int, tolFp: Long): (Seq[(Int, Seq[Double])], Int) = {
    var cur = init
    var i = 0
    while (i < maxIters) {
      val next = step(e, cur)
      i += 1
      val d = deltaFp(next, cur)
      cur = next
      if (d <= tolFp) return (cur, i)
    }
    (cur, i)
  }

  /** Deterministic init: the k lowest-vec_id embeddings (a documented
    * stand-in for k-means++ sampling — init choice is orthogonal to the
    * distributed iteration machinery being exercised). */
  def initByIds(e: DataFrame, k: Int): Seq[(Int, Seq[Double])] = {
    val cents = e.filter(col("vec_id") < k)
      .select(col("vec_id"), col("embedding").cast(ArrayType(DoubleType)))
      .collect()
      .map(r => (r.getLong(0).toInt, r.getSeq[Double](1).toSeq))
      .sortBy(_._1)
      .toSeq
    require(cents.size == k,
      s"initByIds needs vec_ids 0..${k - 1} all present; found ${cents.size} of $k " +
        s"(ids ${cents.map(_._1).mkString(",")}) — bad fixture?")
    cents
  }

  /** Total SSE of an assignment — the convergence diagnostic (exact
    * decimal-free double sum is fine here: diagnostic, not oracle). */
  def sse(e: DataFrame, cents: Seq[(Int, Seq[Double])]): Double =
    assign(e, cents).agg(sum(col("dist"))).collect()(0).getDouble(0)
}
