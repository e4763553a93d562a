package graft.operators

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import graft.SparkSpec

/** ScalaCheck property tests promised by SURVEY §5: dedup idempotence,
  * pivot⁻¹ = unpivot roundtrip, null-default totality. Generators stay
  * tiny (each property evaluation is a Spark job).
  */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private def check(p: Prop): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(10).withMaxSize(12), p)
    assert(res.passed, res.status.toString)
  }

  private val rowGen = for {
    k <- Gen.choose(0, 3)
    seq <- Gen.choose(0, 50)
    v <- Gen.choose(-100, 100).map(_ / 4.0)
  } yield (k, seq, v)

  private val rowsGen = Gen.nonEmptyListOf(rowGen)

  test("property: dedupKeepFirst is idempotent") {
    check(Prop.forAll(rowsGen) { rows =>
      val df = rows.toDF("k", "seq", "v")
      val once = RelationalOps.dedupKeepFirst(df, Seq("k"), Seq(col("seq"), col("v")))
      val twice = RelationalOps.dedupKeepFirst(once, Seq("k"), Seq(col("seq"), col("v")))
      once.collect().toSet == twice.collect().toSet
    })
  }

  test("property: unpivot(pivotAvg(x)) == direct long-form aggregation") {
    val domain = Seq("a", "b", "c")
    val pRowGen = for {
      k <- Gen.choose(0, 2)
      p <- Gen.oneOf(domain)
      v <- Gen.choose(0, 100).map(_ / 2.0)
    } yield (k, p, v)
    check(Prop.forAll(Gen.nonEmptyListOf(pRowGen)) { rows =>
      val df = rows.toDF("k", "p", "v")
      val wide = RelationalOps.pivotAvg(df, Seq("k"), "p", domain, "v")
      val back = wide.unpivot(Array(col("k")), domain.map(col).toArray, "p", "v")
        .filter(col("v").isNotNull)
        .collect().map(r => (r.getInt(0), r.getString(1), r.getDouble(2))).toSet
      val direct = df.groupBy("k", "p").agg(avg("v").as("v"))
        .collect().map(r => (r.getInt(0), r.getString(1), r.getDouble(2))).toSet
      back == direct
    })
  }

  test("property: fillDefaults leaves no nulls in filled columns") {
    val optRowGen = for {
      s <- Gen.option(Gen.alphaStr.map(_.take(5)))
      d <- Gen.option(Gen.choose(-10.0, 10.0))
    } yield (s, d)
    check(Prop.forAll(Gen.nonEmptyListOf(optRowGen)) { rows =>
      val df = rows.toDF("s", "d")
      val filled = RelationalOps.fillDefaults(df, Map("s" -> "Unknown"), Map("d" -> 0.0))
      filled.filter(col("s").isNull || col("d").isNull).count() == 0L
    })
  }
}
