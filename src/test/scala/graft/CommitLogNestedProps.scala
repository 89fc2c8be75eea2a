package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalacheck.{Gen, Prop, Properties}

/** ScalaCheck law for the nested table format (S51): ARBITRARY rows of
  * a nested-rich schema — nullable arrays with null elements, a struct
  * holding its own array, binary blobs, decimals-in-arrays,
  * timestamps — survive the sink's group writer and read back
  * IDENTICALLY through BOTH legs: the vectorized columnar reader
  * (plain snapshot scan) and the row-at-a-time group reader (forced
  * via the `_row_pos` metadata column). One law, adversarial values —
  * the hand-written CommitLogNestedSpec cases instantiate it. */
object CommitLogNestedProps extends Properties("graft.commitlognested") {

  private lazy val spark = SparkSpec.session

  private val schema = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("emb", ArrayType(FloatType, containsNull = true)),
    StructField("payload", BinaryType),
    StructField("tags", ArrayType(StringType, containsNull = true)),
    StructField("meta", StructType(Seq(
      StructField("src", StringType),
      StructField("dim", IntegerType),
      StructField("w", ArrayType(DoubleType, containsNull = true))))),
    StructField("amts", ArrayType(DecimalType(12, 2), containsNull = true)),
    StructField("wide", DecimalType(38, 10)),
    StructField("ts", TimestampType),
    StructField("props", MapType(StringType, IntegerType,
      valueContainsNull = true)),
    StructField("vecs", MapType(StringType,
      ArrayType(DoubleType, containsNull = true)))))

  private val genFloat: Gen[Any] = Gen.frequency(
    8 -> Gen.chooseNum(-1e6f, 1e6f).map(f => f: Any),
    1 -> Gen.oneOf(Float.MinPositiveValue, Float.MaxValue,
      Float.NegativeInfinity, Float.NaN).map(f => f: Any),
    1 -> Gen.const(null: Any))

  private val genStr: Gen[Any] = Gen.frequency(
    6 -> Gen.alphaNumStr.map(s => s.take(12): Any),
    1 -> Gen.const("héllo⚡"), // non-ASCII survives both legs
    1 -> Gen.const(""),
    1 -> Gen.const(null: Any))

  private def arr(g: Gen[Any]): Gen[Any] = Gen.frequency(
    6 -> Gen.choose(0, 6).flatMap(n => Gen.listOfN(n, g).map(_.toSeq: Any)),
    1 -> Gen.const(Seq.empty[Any]: Any),
    1 -> Gen.const(null: Any))

  private val genRow: Gen[Long => Row] = for {
    emb <- arr(genFloat)
    pay <- Gen.frequency(
      6 -> Gen.choose(0, 16).flatMap(n =>
        Gen.listOfN(n, Gen.chooseNum(Byte.MinValue, Byte.MaxValue))
          .map(_.toArray: Any)),
      1 -> Gen.const(Array.empty[Byte]: Any),
      1 -> Gen.const(null: Any))
    tags <- arr(genStr)
    meta <- Gen.frequency(
      5 -> (for {
        s <- genStr; d <- Gen.frequency(
          5 -> Gen.chooseNum(-1000, 1000).map(i => i: Any),
          1 -> Gen.const(null: Any))
        w <- arr(Gen.frequency(
          6 -> Gen.chooseNum(-1e9, 1e9).map(d => d: Any),
          1 -> Gen.const(null: Any)))
      } yield Row(s, d, w): Any),
      1 -> Gen.const(null: Any))
    amts <- arr(Gen.frequency(
      6 -> Gen.chooseNum(-999999L, 999999L)
        .map(c => new java.math.BigDecimal(java.math.BigInteger.valueOf(c), 2): Any),
      1 -> Gen.const(null: Any)))
    // wide decimal: a 28-digit unscaled value straddling 2^53, scale 10
    wide <- Gen.frequency(
      6 -> (for {
        hi <- Gen.chooseNum(-999999999999999L, 999999999999999L)
        lo <- Gen.chooseNum(0L, 9999999999999L)
      } yield new java.math.BigDecimal(
        java.math.BigInteger.valueOf(hi)
          .multiply(java.math.BigInteger.valueOf(10000000000000L))
          .add(java.math.BigInteger.valueOf(if (hi < 0) -lo else lo)),
        10): Any),
      1 -> Gen.const(new java.math.BigDecimal(
        new java.math.BigInteger("9" * 38), 10): Any),
      1 -> Gen.const(null: Any))
    ts <- Gen.frequency(
      6 -> Gen.chooseNum(0L, 4102444800000L)
        .map(ms => new java.sql.Timestamp(ms): Any),
      1 -> Gen.const(null: Any))
    // map keys are non-null by Spark's invariant; values may be null
    props <- Gen.frequency(
      5 -> Gen.choose(0, 5).flatMap(n => Gen.listOfN(n, for {
        k <- Gen.alphaNumStr.map(s => "k" + s.take(6))
        v <- Gen.frequency(
          5 -> Gen.chooseNum(-1000, 1000).map(i => i: Any),
          1 -> Gen.const(null: Any))
      } yield (k, v)).map(_.toMap: Any)),
      1 -> Gen.const(Map.empty[String, Any]: Any),
      1 -> Gen.const(null: Any))
    vecs <- Gen.frequency(
      5 -> Gen.choose(0, 3).flatMap(n => Gen.listOfN(n, for {
        k <- Gen.oneOf("w", "x", "y", "zz")
        v <- arr(Gen.frequency(
          6 -> Gen.chooseNum(-1e9, 1e9).map(d => d: Any),
          1 -> Gen.const(null: Any)))
      } yield (k, v)).map(_.toMap: Any)),
      1 -> Gen.const(null: Any))
  } yield (id: Long) => Row(id, emb, pay, tags, meta, amts, wide, ts, props, vecs)

  /** Canonical form for cross-leg comparison (Seq kinds and byte-array
    * identity differ; values must not). */
  private def canon(v: Any): Any = v match {
    case null => null
    case b: Array[Byte] => b.toSeq
    case s: scala.collection.Seq[_] => s.map(canon).toList
    case m: scala.collection.Map[_, _] =>
      m.map { case (k, mv) => (canon(k), canon(mv)) }
        .toList.sortBy(_._1.toString)
    case r: Row => r.toSeq.map(canon).toList
    case f: Float if f.isNaN => "NaN:f"
    case d: Double if d.isNaN => "NaN:d"
    case other => other
  }

  private def canonRows(rows: Array[Row]): Seq[Any] =
    rows.sortBy(_.getLong(0)).map(canon).toSeq

  property("rows survive sink write + both read legs byte-for-byte") =
    Prop.forAllNoShrink(Gen.choose(1, 12).flatMap(n =>
      Gen.listOfN(n, genRow))) { mks =>
      val root = java.nio.file.Files.createTempDirectory("clnp").toString
      val rows = mks.zipWithIndex.map { case (mk, i) => mk(i.toLong) }
      val df = spark.createDataFrame(
        java.util.Arrays.asList(rows: _*), schema)
      df.write.format("commitlog").option("path", root)
        .mode("append").save()
      val expected = canonRows(rows.toArray)
      val columnar = spark.read.format("commitlog").option("path", root)
        .load()
      val viaColumnar = canonRows(columnar.collect())
      // the metadata column forces the row-at-a-time leg — it must be
      // COLLECTED (a dropped column would be pruned back out and the
      // scan would plan columnar again), so strip it after the fact
      val viaRowLeg = canonRows(
        columnar.select(
          (schema.fieldNames.map(org.apache.spark.sql.functions.col) :+
            org.apache.spark.sql.functions.col("_row_pos")): _*)
          .collect()
          .map(r => Row(r.toSeq.dropRight(1): _*)))
      val okC = viaColumnar == expected
      val okR = viaRowLeg == expected
      if (!okC || !okR) {
        println(s"MISMATCH columnar=$okC rowleg=$okR")
        expected.zip(viaColumnar).zip(viaRowLeg).foreach { case ((e, c), r) =>
          if (e != c || e != r) println(s" want $e\n gotC $c\n gotR $r")
        }
      }
      okC && okR
    }
}
