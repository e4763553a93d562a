package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MlGateSpec extends SparkSpec {
  import spark.implicits._

  private val good = (1 to 60).map { i =>
    (i.toLong, s"document $i contains plenty useful informative tokens " * 8)
  }
  private val spam = (61 to 120).map { i =>
    (i.toLong, "the the the of of and !!! ??? ### " * 3)
  }

  test("classifier trained on weak heuristic labels separates good from spam") {
    val ref = (good ++ spam).toDF("doc_id", "text")
    val model = MlGate.train(ref, "text", tau = 0.1)
    val scored = MlGate.score(model, ref, "text")
      .select("doc_id", "prediction").as[(Long, Double)].collect().toMap
    val accGood = good.count { case (id, _) => scored(id) == 1.0 }
    val accSpam = spam.count { case (id, _) => scored(id) == 0.0 }
    assert(accGood >= 57, s"good kept: $accGood/60")
    assert(accSpam >= 57, s"spam dropped: $accSpam/60")
  }

  test("gate generalizes to unseen docs of each kind") {
    val ref = (good ++ spam).toDF("doc_id", "text")
    val model = MlGate.train(ref, "text", tau = 0.1)
    val unseen = Seq(
      (900L, "a fresh clean paragraph with many varied informative words " * 10),
      (901L, "??? !!! ### the the the of of of " * 4)).toDF("doc_id", "text")
    val got = MlGate.score(model, unseen, "text")
      .select("doc_id", "prediction").as[(Long, Double)].collect().toMap
    assert(got(900L) == 1.0 && got(901L) == 0.0, got.toString)
  }

  test("scoring is a no-shuffle projection (model broadcast into the plan)") {
    val ref = (good ++ spam).toDF("doc_id", "text")
    val model = MlGate.train(ref, "text", tau = 0.1)
    val plan = MlGate.score(model, ref, "text")
      .select("doc_id", "prediction").queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }
}
