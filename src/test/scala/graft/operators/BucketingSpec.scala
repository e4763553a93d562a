package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import graft.SparkSpec

/** The co-located join story for 100 TB: two tables bucketed on the
  * join key join WITHOUT any shuffle exchange — the physical plan must
  * contain zero ShuffleExchange nodes. This is the layout discipline
  * (pre-bucketed fact tables) that turns the engine's big joins from
  * full-network shuffles into local merges on a real cluster.
  */
class BucketingSpec extends SparkSpec {
  import spark.implicits._

  test("bucketed tables join with zero shuffle exchanges") {
    val facts = (1 to 10000).map(i => (i.toLong % 500, i.toDouble)).toDF("k", "v")
    val dims = (1 to 500).map(i => (i.toLong, s"name$i")).toDF("k", "name")
    facts.write.mode("overwrite").bucketBy(8, "k").sortBy("k").saveAsTable("b_facts")
    dims.write.mode("overwrite").bucketBy(8, "k").sortBy("k").saveAsTable("b_dims")

    // disable broadcast so the join would otherwise shuffle both sides
    val joined = spark.table("b_facts").hint("merge")
      .join(spark.table("b_dims").hint("merge"), "k")
      .groupBy("name").agg(sum("v"))
    val exchanges = joined.queryExecution.executedPlan.collect {
      case e: ShuffleExchangeExec => e
    }
    // one exchange for the final groupBy("name") is expected; the JOIN
    // itself must not shuffle either bucketed side
    val joinSideExchanges = exchanges.filterNot(
      _.outputPartitioning.toString.contains("name"))
    assert(joinSideExchanges.isEmpty,
      s"join of bucketed tables should not shuffle, got:\n${joined.queryExecution.executedPlan}")
    assert(joined.count() == 499) // keys 1..499 intersect (facts: 0..499, dims: 1..500)
  }
}
