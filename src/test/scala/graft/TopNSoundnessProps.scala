package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Property-style END-TO-END soundness of the top-N file cut under the
  * full cross of hazards: NULLS (counted per batch since r15), NaN
  * (writer marks hi = +Inf), overlapping boxes, all-null batches, and
  * both directions × both null orderings. The oracle is a Scala-side
  * replica of Spark's total order (`java.lang.Double.compare` places
  * NaN above +Infinity, exactly like Spark and the manifest
  * contract); every query's collected multiset must equal the
  * oracle's top-k arrangement — if the cut ever pruned a file holding
  * a top-k row, some multiset here diverges. */
class TopNSoundnessProps extends SparkSpec {
  import spark.implicits._

  private def mkTable(seed: Int): (String, Seq[Option[Double]]) = {
    val rnd = new scala.util.Random(seed)
    val root = java.nio.file.Files.createTempDirectory(s"tnp_$seed").toString
    val all = scala.collection.mutable.Buffer.empty[Option[Double]]
    val nBatches = 3 + rnd.nextInt(3)
    (0 until nBatches).foreach { b =>
      val n = 5 + rnd.nextInt(30)
      val vals: Seq[Option[Double]] = (0 until n).map { _ =>
        rnd.nextInt(10) match {
          case 0 | 1 => None // nulls
          case 2 if seed % 2 == 0 => Some(Double.NaN)
          case _ =>
            // clustered around a per-batch center so boxes overlap
            // but differ; exact halves keep cross-engine determinism
            Some((b * 20 + rnd.nextInt(40)) / 2.0)
        }
      }
      all ++= vals
      vals.toDF("v").repartition(1)
        .write.format("commitlog").option("path", root)
        .mode("append").save()
    }
    (root, all.toSeq)
  }

  /** Spark's total order over Option[Double]: None placed by the null
    * ordering, values by java.lang.Double.compare (NaN greatest). */
  private def expected(
      all: Seq[Option[Double]], desc: Boolean, nullsFirst: Boolean,
      k: Int): Seq[Option[Double]] = {
    val (nulls, vals) = all.partition(_.isEmpty)
    val sorted = vals.sortWith { (a, b) =>
      val c = java.lang.Double.compare(a.get, b.get)
      if (desc) c > 0 else c < 0
    }
    val arranged = if (nullsFirst) nulls ++ sorted else sorted ++ nulls
    arranged.take(k)
  }

  /** NaN-safe multiset key. */
  private def key(vs: Seq[Option[Double]]): Map[Option[Long], Int] =
    vs.map(_.map(java.lang.Double.doubleToLongBits))
      .groupBy(identity).view.mapValues(_.size).toMap

  // ---- STRING domain (r16): the same cut over S73's byte-lex bounds

  private def mkStrTable(seed: Int): (String, Seq[Option[String]]) = {
    val rnd = new scala.util.Random(seed)
    val root = java.nio.file.Files.createTempDirectory(s"tnps_$seed").toString
    val all = scala.collection.mutable.Buffer.empty[Option[String]]
    // include multi-byte UTF-8 (é = 0xc3 0xa9) — byte-lex order must
    // hold through encode, and a shared 40-char prefix on some
    // batches forces bound truncation at StrCap
    val alphabet = "abmzAZ09é"
    def word(max: Int): String =
      (0 until rnd.nextInt(max)).map(_ =>
        alphabet(rnd.nextInt(alphabet.length))).mkString
    val nBatches = 3 + rnd.nextInt(3)
    (0 until nBatches).foreach { b =>
      val longPrefix = if (rnd.nextInt(3) == 0) "p" * 40 else ""
      val n = 5 + rnd.nextInt(30)
      val vals: Seq[Option[String]] = (0 until n).map { _ =>
        rnd.nextInt(10) match {
          case 0 | 1 => None
          case 2 => Some("") // empty string: a legal zero-byte bound
          case _ => Some(longPrefix + word(12))
        }
      }
      all ++= vals
      vals.toDF("v").repartition(1)
        .write.format("commitlog").option("path", root)
        .mode("append").save()
    }
    (root, all.toSeq)
  }

  /** Spark's string order is UNSIGNED BYTE-LEX over UTF-8 — NOT
    * String.compareTo (UTF-16 code units diverge past the BMP and on
    * high bytes); the oracle must replicate the engine's collation. */
  private def strExpected(
      all: Seq[Option[String]], desc: Boolean, nullsFirst: Boolean,
      k: Int): Seq[Option[String]] = {
    val (nulls, vals) = all.partition(_.isEmpty)
    val sorted = vals.sortWith { (a, b) =>
      val c = java.util.Arrays.compareUnsigned(
        a.get.getBytes("UTF-8"), b.get.getBytes("UTF-8"))
      if (desc) c > 0 else c < 0
    }
    val arranged = if (nullsFirst) nulls ++ sorted else sorted ++ nulls
    arranged.take(k)
  }

  test("string top-k multisets match the byte-lex oracle across all quadrants") {
    (1 to 6).foreach { seed =>
      val (root, all) = mkStrTable(seed)
      def tbl = spark.read.format("commitlog").option("path", root).load()
      val orders = Seq(
        ("desc_nl", $"v".desc, true, false),
        ("desc_nf", $"v".desc_nulls_first, true, true),
        ("asc_nf", $"v".asc, false, true),
        ("asc_nl", $"v".asc_nulls_last, false, false))
      for ((tag, ord, desc, nf) <- orders; k <- Seq(1, 3, 7, 25)) {
        val got = tbl.orderBy(ord).limit(k).select($"v").collect()
          .map(r => if (r.isNullAt(0)) None else Some(r.getString(0))).toSeq
        val want = strExpected(all, desc, nf, k)
        val asKey = (vs: Seq[Option[String]]) =>
          vs.groupBy(identity).view.mapValues(_.size).toMap
        assert(asKey(got) == asKey(want),
          s"seed=$seed $tag k=$k:\n got=${got.sortBy(_.toString)}\n" +
            s" want=${want.sortBy(_.toString)}")
      }
    }
  }

  test("top-k multisets match the total-order oracle across all quadrants") {
    (1 to 6).foreach { seed =>
      val (root, all) = mkTable(seed)
      def tbl = spark.read.format("commitlog").option("path", root).load()
      val orders = Seq(
        ("desc_nl", $"v".desc, true, false),
        ("desc_nf", $"v".desc_nulls_first, true, true),
        ("asc_nf", $"v".asc, false, true),
        ("asc_nl", $"v".asc_nulls_last, false, false))
      for ((tag, ord, desc, nf) <- orders; k <- Seq(1, 3, 7, 25)) {
        val got = tbl.orderBy(ord).limit(k).select($"v").collect()
          .map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0))).toSeq
        val want = expected(all, desc, nf, k)
        assert(key(got) == key(want),
          s"seed=$seed $tag k=$k:\n got=${got.sortBy(_.map(_.toString))}\n" +
            s" want=${want.sortBy(_.map(_.toString))}")
      }
    }
  }
}
