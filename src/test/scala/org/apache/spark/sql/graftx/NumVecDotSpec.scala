package org.apache.spark.sql.graftx

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** `NumVecDot` replaced the interpreted `aggregate(zip_with(x·y))`
  * fold under `SimilarityOps.dotD` — every IVF/PQ probe ranking,
  * assignment, and ADC-table hash rides on that arithmetic, so the
  * replacement must be BIT-identical, not merely close: double
  * accumulation in index order, zip_with's null-padding on length
  * mismatch, the fold's null-absorption on null elements, IEEE NaN
  * propagation. This spec evaluates both forms side by side over the
  * same rows (generated: float/double element-type mixes, denormals,
  * NaN/Inf, empty arrays, mismatched lengths, plus explicit null
  * slots) and asserts bit equality per row via `doubleToLongBits` —
  * the CANONICAL-NaN comparison (still separates ±0.0): NaN payload
  * bits are not observable engine state (x86 emits its negative
  * "real indefinite" QNaN for Inf·0 while quietized input NaNs keep
  * their sign, and Spark's own UnsafeRow writer canonicalizes NaN on
  * write), so raw-bit NaN comparison flaked on which evaluation path
  * a row happened to take, not on any arithmetic difference.
  */
class NumVecDotSpec extends graft.SparkSpec {
  import spark.implicits._

  private def hof(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  /** true iff native and fold agree in null-ness and raw bits per row. */
  private def agrees(df: org.apache.spark.sql.DataFrame): Boolean = {
    val bad = df.select(col("a"), col("b"),
      GraftFunctions.numVecDot(col("a"), col("b")).as("native"),
      hof(col("a"), col("b")).as("fold")).collect().filterNot { r =>
      (r.isNullAt(2), r.isNullAt(3)) match {
        case (true, true) => true
        case (false, false) =>
          java.lang.Double.doubleToLongBits(r.getDouble(2)) ==
            java.lang.Double.doubleToLongBits(r.getDouble(3))
        case _ => false
      }
    }
    bad.foreach { r =>
      def bits(i: Int) = if (r.isNullAt(i)) "NULL"
        else s"${r.getDouble(i)}/0x${java.lang.Long.toHexString(
          java.lang.Double.doubleToRawLongBits(r.getDouble(i)))}"
      System.err.println(s"[NumVecDotSpec] DIVERGED a=${r.getSeq[Any](0)} " +
        s"b=${r.getSeq[Any](1)} native=${bits(2)} fold=${bits(3)}")
    }
    bad.isEmpty
  }

  private def check(p: Prop): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(8).withMaxSize(12), p)
    assert(res.passed, res.status.toString)
  }

  private val element: Gen[Double] = Gen.oneOf(
    Gen.choose(-1e3, 1e3),
    Gen.oneOf(0.0, -0.0, 1e-310, Double.NaN,
      Double.PositiveInfinity, Double.NegativeInfinity, 1e308))

  private val pair: Gen[(Seq[Double], Seq[Double])] = for {
    n <- Gen.choose(0, 9)
    extra <- Gen.oneOf(0, 0, 0, 1) // occasional length mismatch
    a <- Gen.listOfN(n, element)
    b <- Gen.listOfN(n + extra, element)
  } yield (a, b)

  private val pairs: Gen[List[(Seq[Double], Seq[Double])]] =
    Gen.nonEmptyListOf(pair)

  test("property: float x float bit-identical to the HOF fold (incl. NaN/Inf/mismatch)") {
    check(Prop.forAll(pairs) { ps =>
      agrees(ps.map { case (a, b) =>
        (a.map(_.toFloat).toArray, b.map(_.toFloat).toArray)
      }.toDF("a", "b"))
    })
  }

  test("property: double x double and float x double mixes bit-identical to the fold") {
    check(Prop.forAll(pairs) { ps =>
      agrees(ps.map { case (a, b) => (a.toArray, b.toArray) }.toDF("a", "b")) &&
        agrees(ps.map { case (a, b) => (a.map(_.toFloat).toArray, b.toArray) }
          .toDF("a", "b"))
    })
  }

  test("null elements absorb to null exactly like the fold") {
    val df = Seq(
      (Array[java.lang.Double](1.0, null, 3.0), Array[java.lang.Double](1.0, 2.0, 3.0)),
      (Array[java.lang.Double](1.0, 2.0), Array[java.lang.Double](null, null)),
      (Array[java.lang.Double](), Array[java.lang.Double]())
    ).toDF("a", "b")
    assert(agrees(df))
  }
}
