package graft

import graft.functions.{CosineSim, DotProduct}
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
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
