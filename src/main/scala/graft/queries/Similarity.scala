package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** SURVEY §2.B L3 + north-star similarity search over embeddings.
  *
  * Two paths, per the scale brief:
  *
  *  - '''Brute-force top-k (baseline)''': a SMALL broadcast query set ×
  *    the full corpus — one narrow pass over the corpus per batch of
  *    queries, cosine via codegen'd higher-order functions, top-k by
  *    window. Correct at any corpus size as long as the QUERY side is
  *    bounded (it is broadcast). A corpus×corpus cross join is the
  *    scale-killer this module deliberately avoids.
  *
  *  - '''LSH-bucketed ANN (scale path)''': 8 random-hyperplane sign bits
  *    → 256 buckets; queries probe only their own bucket, so per-query
  *    work drops from O(N) to O(N/256). The hyperplanes are a fixed
  *    deterministic ±1 matrix generated from md5 (model parameters, not
  *    data), embedded as literals in BOTH the Spark plan and the oracle
  *    SQL so results hash-match. Recall vs the brute-force baseline is
  *    asserted in SimilaritySpec.
  *
  * Cosine determinism: dot products fold left-to-right in both engines'
  * list primitives; results are rounded (r6) BEFORE ranking/thresholding
  * so last-ulp drift can't flip an ordering.
  */
object Similarity {

  val Dim = 64
  val NPlanes = 8

  /** Deterministic ±1 hyperplanes: sign of bit 0 of md5("plane_j_i").
    * Generated in Scala, embedded as literals on both engines. */
  lazy val planes: Seq[Seq[Int]] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    (0 until NPlanes).map { j =>
      (0 until Dim).map { i =>
        val h = md.digest(s"plane_${j}_$i".getBytes("UTF-8"))
        if ((h(0) & 1) == 1) 1 else -1
      }
    }
  }

  private def dot(x: Column, y: Column): Column =
    aggregate(zip_with(x, y, (a, b) => a.cast(DoubleType) * b.cast(DoubleType)),
      lit(0.0), (acc, v) => acc + v)

  private def cosine(a: Column, b: Column): Column =
    Qh.r6(dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b))))

  private val oCos =
    s"""floor(${Qh.oDot("q.embedding", "c.embedding")}
       |      / (sqrt(${Qh.oDot("q.embedding", "q.embedding")})
       |         * sqrt(${Qh.oDot("c.embedding", "c.embedding")})) * 1000000 + 0.5) / 1000000.0""".stripMargin

  /** Signature CTE fragment for the oracle: bucket id from plane signs. */
  private def oSig(alias: String): String = {
    val bits = planes.zipWithIndex.map { case (p, j) =>
      val lit = "[" + p.mkString(", ") + "]"
      s"(CASE WHEN ${Qh.oDot(s"$alias.embedding", lit)} > 0 THEN ${1 << j} ELSE 0 END)"
    }
    bits.mkString(" + ")
  }

  /** Spark-side bucket id. */
  private def sigCol(emb: Column): Column =
    planes.zipWithIndex.map { case (p, j) =>
      when(dot(emb, typedLit(p)) > 0, lit(1 << j)).otherwise(lit(0))
    }.reduce(_ + _)

  val decls: Seq[Decl] = Seq(

    // Brute-force cosine top-3 for query vectors vec_id < 5.
    Decl(
      "l3_cosine_topk",
      s"""WITH scored AS (
         |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         |    $oCos AS cos
         |  FROM embeddings q JOIN embeddings c ON q.vec_id <> c.vec_id
         |  WHERE q.vec_id < 5)
         |SELECT query_id, neighbor_id, cos, rnk FROM (
         |  SELECT query_id, neighbor_id, cos,
         |    row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rnk
         |  FROM scored)
         |WHERE rnk <= 3
         |ORDER BY query_id, rnk""".stripMargin) { (s, dir) =>
      import s.implicits._
      val e = Qh.t(s, dir, "embeddings")
      val q = e.filter($"vec_id" < 5)
        .select($"vec_id".as("query_id"), $"embedding".as("q_emb"))
      val w = Window.partitionBy($"query_id").orderBy($"cos".desc, $"neighbor_id")
      e.join(broadcast(q), $"vec_id" =!= $"query_id")
        .select($"query_id", $"vec_id".as("neighbor_id"),
          cosine($"q_emb", $"embedding").as("cos"))
        .withColumn("rnk", row_number().over(w))
        .filter($"rnk" <= 3)
        .orderBy("query_id", "rnk")
    },

    // LSH-bucketed ANN: queries vec_id < 50 probe only their own
    // hyperplane-sign bucket. Equi-join on bucket — per-query work is
    // O(corpus / 2^8), the shape that survives a 1000× corpus.
    Decl(
      "l3_ann_lsh",
      s"""WITH sigs AS (
         |  SELECT x.vec_id, x.embedding, ${oSig("x")} AS bucket
         |  FROM embeddings x),
         |scored AS (
         |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         |    $oCos AS cos
         |  FROM sigs q JOIN sigs c
         |    ON q.bucket = c.bucket AND q.vec_id <> c.vec_id
         |  WHERE q.vec_id < 50)
         |SELECT query_id, neighbor_id, cos, rnk FROM (
         |  SELECT query_id, neighbor_id, cos,
         |    row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rnk
         |  FROM scored)
         |WHERE rnk <= 3
         |ORDER BY query_id, rnk""".stripMargin) { (s, dir) =>
      import s.implicits._
      val e = Qh.t(s, dir, "embeddings")
        .withColumn("bucket", sigCol($"embedding"))
      val q = e.filter($"vec_id" < 50)
        .select($"vec_id".as("query_id"), $"embedding".as("q_emb"), $"bucket")
      val w = Window.partitionBy($"query_id").orderBy($"cos".desc, $"neighbor_id")
      e.join(broadcast(q), e("bucket") === q("bucket") && $"vec_id" =!= $"query_id")
        .select($"query_id", $"vec_id".as("neighbor_id"),
          cosine($"q_emb", $"embedding").as("cos"))
        .withColumn("rnk", row_number().over(w))
        .filter($"rnk" <= 3)
        .orderBy("query_id", "rnk")
    }
  )

  /** Brute-force ids for recall measurement (used by SimilaritySpec). */
  def bruteTopK(s: SparkSession, dir: String, nQueries: Int, k: Int): DataFrame = {
    import s.implicits._
    val e = Qh.t(s, dir, "embeddings")
    val q = e.filter($"vec_id" < nQueries)
      .select($"vec_id".as("query_id"), $"embedding".as("q_emb"))
    val w = Window.partitionBy($"query_id").orderBy($"cos".desc, $"neighbor_id")
    e.join(broadcast(q), $"vec_id" =!= $"query_id")
      .select($"query_id", $"vec_id".as("neighbor_id"),
        cosine($"q_emb", $"embedding").as("cos"))
      .withColumn("rnk", row_number().over(w))
      .filter($"rnk" <= k)
      .select("query_id", "neighbor_id")
  }
}
