package graft

import graft.functions.{BinWord32, CosineSim, DotProduct, L2Sq, L2SqAt, PortableHash}
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Prop, Properties}

/** ScalaCheck laws for the native expressions, evaluated directly at
  * the Catalyst `eval` layer (no Spark jobs — hundreds of generated
  * cases in milliseconds). */
object ExpressionProps extends Properties("graft.expressions") {

  private val vecGen: Gen[Array[Float]] =
    Gen.containerOfN[Array, Float](64,
      Gen.chooseNum(-10.0f, 10.0f).suchThat(f => !f.isNaN))
      .suchThat(v => v.exists(x => math.abs(x) > 1e-3))

  private def lit(v: Array[Float]): Literal =
    Literal.create(ArrayData.toArrayData(v), ArrayType(FloatType))

  private def cos(a: Array[Float], b: Array[Float]): Double =
    CosineSim(lit(a), lit(b)).eval(null).asInstanceOf[Double]

  private def dot(a: Array[Float], b: Array[Float]): Double =
    DotProduct(lit(a), lit(b)).eval(null).asInstanceOf[Double]

  property("cosine is symmetric") = Prop.forAll(vecGen, vecGen) { (a, b) =>
    cos(a, b) == cos(b, a)
  }

  property("cosine is bounded in [-1, 1] (up to 1 ulp)") =
    Prop.forAll(vecGen, vecGen) { (a, b) =>
      val c = cos(a, b)
      c >= -1.0 - 1e-9 && c <= 1.0 + 1e-9
    }

  property("cosine self-similarity is 1") = Prop.forAll(vecGen) { a =>
    math.abs(cos(a, a) - 1.0) < 1e-9
  }

  property("cosine is invariant under positive scaling") =
    Prop.forAll(vecGen, Gen.chooseNum(0.1f, 8.0f)) { (a, s) =>
      val scaled = a.map(_ * s)
      math.abs(cos(a, scaled) - 1.0) < 1e-6
    }

  property("dot product distributes over element negation") =
    Prop.forAll(vecGen, vecGen) { (a, b) =>
      dot(a.map(-_), b) == -dot(a, b)
    }

  private def l2(a: Array[Float], b: Array[Float]): Double =
    L2Sq(lit(a), lit(b)).eval(null).asInstanceOf[Double]

  property("l2_sq is symmetric, non-negative, zero on self") =
    Prop.forAll(vecGen, vecGen) { (a, b) =>
      l2(a, b) == l2(b, a) && l2(a, b) >= 0.0 && l2(a, a) == 0.0
    }

  property("l2_sq_at(x, sub, off) == l2_sq(slice, sub) at every offset") =
    Prop.forAll(vecGen, Gen.chooseNum(0, 7)) { (a, m) =>
      val sub = a.slice(m * 8, m * 8 + 8).map(_ + 0.5f)
      val at = L2SqAt(lit(a), lit(sub),
        Literal.create(m * 8, IntegerType)).eval(null).asInstanceOf[Double]
      at == l2(a.slice(m * 8, m * 8 + 8), sub)
    }

  private val strGen: Gen[String] = Gen.oneOf(
    Gen.alphaNumStr, Gen.asciiPrintableStr,
    Gen.listOf(Gen.oneOf[String]("α", "日", "é", "💡", "a", " ")).map(_.mkString))

  property("md5_prefix32 equals word 0 of md5_words32 and fits u32") =
    Prop.forAll(strGen, Gen.chooseNum(0, 99)) { (s, seed) =>
      val u = UTF8String.fromString(s)
      val p = PortableHash.prefix(u, seed)
      val w = PortableHash.words(u, seed)
      p == w.getLong(0) && p >= 0 && p <= 0xffffffffL &&
        (0 until 4).forall(j => w.getLong(j) >= 0 && w.getLong(j) <= 0xffffffffL)
    }

  property("md5 words match reference MessageDigest hex slices") =
    Prop.forAll(strGen, Gen.chooseNum(0, 9)) { (s, seed) =>
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s"$s#$seed".getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString
      val w = PortableHash.words(UTF8String.fromString(s), seed)
      (0 until 4).forall(j =>
        w.getLong(j) == java.lang.Long.parseLong(hex.substring(8 * j, 8 * j + 8), 16))
    }

  property("bin_word32 equals big-endian fold incl. short tails") =
    Prop.forAll(Gen.nonEmptyListOf(Gen.chooseNum(-128, 127).map(_.toByte))) { bl =>
      val bytes = bl.toArray
      (0 until bytes.length).forall { pos =>
        val expect = bytes.slice(pos, pos + 4)
          .foldLeft(0L)((acc, b) => (acc << 8) | (b & 0xffL))
        BinWord32.word(bytes, pos) == expect
      }
    }

  property("jaccard n_shared/(na+nb-n_shared) is bounded and symmetric") =
    Prop.forAll(Gen.chooseNum(0, 100), Gen.chooseNum(0, 100), Gen.chooseNum(0, 100)) {
      (naRaw, nbRaw, sharedRaw) =>
        val na = math.max(1, naRaw)
        val nb = math.max(1, nbRaw)
        val ni = math.min(sharedRaw, math.min(na, nb))
        val j = ni.toDouble / (na + nb - ni)
        val jSym = ni.toDouble / (nb + na - ni)
        j >= 0.0 && j <= 1.0 && j == jSym
    }
}
