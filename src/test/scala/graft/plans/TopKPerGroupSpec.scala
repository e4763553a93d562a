package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftx.GraftPlans

class TopKPerGroupSpec extends SparkSpec {
  import spark.implicits._

  private def sample = (1 to 1000)
    .map(i => (i.toLong, s"g${i % 7}", (i * 37 % 501).toDouble))
    .toDF("id", "grp", "v")

  test("matches the window row_number formulation exactly") {
    val df = sample
    val got = GraftPlans.topKPerGroup(df,
      Seq("grp"), Seq("v" -> false, "id" -> true), k = 5)
      .select("id", "grp", "v").as[(Long, String, Double)].collect().toSet
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("grp").orderBy(col("v").desc, col("id"))
    val want = df.withColumn("rn", row_number().over(w)).filter(col("rn") <= 5)
      .select("id", "grp", "v").as[(Long, String, Double)].collect().toSet
    assert(got == want)
  }

  test("plan is the two-stage heap exec with one exchange and NO sort") {
    val df = sample
    val plan = GraftPlans.topKPerGroup(df,
      Seq("grp"), Seq("v" -> false, "id" -> true), k = 3)
      .queryExecution.executedPlan.toString
    // physical nodeName strips the Exec suffix; partial + final stages
    assert("TopKPerGroup".r.findAllIn(plan).size == 2, plan)
    assert(plan.contains("Exchange"), plan)
    assert(!plan.contains("Sort "), plan) // the point: no sort anywhere
    assert(!plan.contains("Window"), plan)
  }

  test("groups smaller than k emit all their rows; k=1 is per-group argmax") {
    val df = Seq((1L, "a", 5.0), (2L, "a", 7.0), (3L, "b", 1.0)).toDF("id", "grp", "v")
    val top1 = GraftPlans.topKPerGroup(df, Seq("grp"), Seq("v" -> false, "id" -> true), 1)
      .select("id").as[Long].collect().toSet
    assert(top1 == Set(2L, 3L))
    val top9 = GraftPlans.topKPerGroup(df, Seq("grp"), Seq("v" -> false, "id" -> true), 9)
    assert(top9.count() == 3)
  }

  test("ties break deterministically through the total order") {
    val df = Seq((1L, "a", 5.0), (2L, "a", 5.0), (3L, "a", 5.0)).toDF("id", "grp", "v")
    val got = GraftPlans.topKPerGroup(df, Seq("grp"), Seq("v" -> false, "id" -> true), 2)
      .select("id").as[Long].collect().toSet
    assert(got == Set(1L, 2L)) // lowest ids win the tie
  }

  // ---- the PACKED long-pool heap (all-fixed-width schemas) ----
  // The tests above carry a STRING group column, so they exercise the
  // copied-row object heap; an all-numeric schema takes the packed
  // path (the ANN candidate shape that OOM'd the 20M decade on object
  // entries). Parity between the two implementations is the contract.

  private def fixedSample = (1 to 2000)
    .map(i => (i.toLong, (i % 13).toLong,
      if (i % 41 == 0) None else Some((i * 37 % 501).toDouble)))
    .toDF("id", "grp", "v")

  test("packed path: matches the window formulation, nulls included") {
    val df = fixedSample
    val got = GraftPlans.topKPerGroup(df,
      Seq("grp"), Seq("v" -> false, "id" -> true), k = 7)
      .select("id").as[Long].collect().toSet
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("grp").orderBy(col("v").desc, col("id"))
    val want = df.withColumn("rn", row_number().over(w)).filter(col("rn") <= 7)
      .select("id").as[Long].collect().toSet
    assert(got == want)
  }

  test("packed and object heaps agree row for row") {
    val df = fixedSample
    def ids(d: org.apache.spark.sql.DataFrame) = GraftPlans.topKPerGroup(d,
      Seq("grp"), Seq("v" -> false, "id" -> true), k = 5)
      .select("id").as[Long].collect().toSet
    // appending a string column flips the schema to var-width → the
    // object path; the selection itself must not move
    assert(ids(df) == ids(df.withColumn("s", concat(lit("x"), col("id")))))
  }

  test("packed path: ties, k=1 argmax, groups smaller than k") {
    val df = Seq((1L, 9L, 5.0), (2L, 9L, 5.0), (3L, 9L, 5.0), (4L, 8L, 1.0))
      .toDF("id", "grp", "v")
    val top2 = GraftPlans.topKPerGroup(df, Seq("grp"), Seq("v" -> false, "id" -> true), 2)
      .select("id").as[Long].collect().toSet
    assert(top2 == Set(1L, 2L, 4L)) // ids 1,2 win the tie; group 8 emits its 1 row
    val top1 = GraftPlans.topKPerGroup(df, Seq("grp"), Seq("v" -> false, "id" -> true), 1)
      .select("id").as[Long].collect().toSet
    assert(top1 == Set(1L, 4L))
  }

  test("packed path: schemas past 64 fields use the two-word null bitset") {
    val wide = (1 to 300).map(i => (i.toLong, (i % 5).toLong, (i * 31 % 97).toDouble))
      .toDF("id", "grp", "v")
      .select(Seq(col("id"), col("grp"), col("v")) ++
        (0 until 67).map(j => (col("id") * (j + 2) % 89).as(s"p$j")): _*)
    val got = GraftPlans.topKPerGroup(wide,
      Seq("grp"), Seq("v" -> false, "id" -> true), k = 4)
      .select("id").as[Long].collect().toSet
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("grp").orderBy(col("v").desc, col("id"))
    val want = wide.withColumn("rn", row_number().over(w)).filter(col("rn") <= 4)
      .select("id").as[Long].collect().toSet
    assert(got == want)
  }
}
