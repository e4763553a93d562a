package graft.io

import java.nio.file.Files
import graft.SparkSpec

/** The Athena-protocol analogue (`utils/athena_utils.py:38-145`):
  * submit → poll → fetch string-typed rows with header; failures land
  * as FAILED with a reason instead of throwing at the caller;
  * cancellation reaches a terminal CANCELLED state.
  */
class AsyncQuerySpec extends SparkSpec {

  private def outDir: String =
    Files.createTempDirectory("graft_async").toString

  test("submit -> waitFor -> fetchResults: header first, every value a string") {
    import spark.implicits._
    Seq((1L, "a"), (2L, "b"), (3L, "a")).toDF("k", "tag")
      .createOrReplaceTempView("async_t")
    val id = AsyncQuery.submit(spark,
      "SELECT tag, count(*) AS n FROM async_t GROUP BY tag ORDER BY tag", outDir)
    assert(AsyncQuery.waitFor(id) == AsyncQuery.Succeeded)
    val rows = AsyncQuery.fetchResults(spark, id)
    assert(rows.head == Seq("tag", "n"))
    assert(rows.tail.toSet == Set(Seq("a", "2"), Seq("b", "1")))
    // every value is string-typed — the Athena result contract
    rows.flatten.foreach(v => assert(v.isInstanceOf[String]))
    AsyncQuery.forget(id)
  }

  test("resultsDf keeps processing distributed and string-typed") {
    import spark.implicits._
    Seq(10L, 20L).toDF("v").createOrReplaceTempView("async_u")
    val id = AsyncQuery.submit(spark, "SELECT v FROM async_u", outDir)
    assert(AsyncQuery.waitFor(id) == AsyncQuery.Succeeded)
    val df = AsyncQuery.resultsDf(spark, id)
    assert(df.schema.fields.forall(_.dataType ==
      org.apache.spark.sql.types.StringType))
    assert(df.as[String].collect().toSet == Set("10", "20"))
    AsyncQuery.forget(id)
  }

  test("a broken query lands as FAILED with a reason, not a throw") {
    val id = AsyncQuery.submit(spark, "SELECT * FROM table_that_does_not_exist", outDir)
    AsyncQuery.waitFor(id) match {
      case AsyncQuery.Failed(reason) =>
        assert(reason.toLowerCase.contains("table_that_does_not_exist"))
      case other => fail(s"expected Failed, got $other")
    }
    // fetch on a non-succeeded query is refused (the reference raises)
    intercept[IllegalArgumentException] {
      AsyncQuery.fetchResults(spark, id)
    }
    AsyncQuery.forget(id)
  }

  test("cancel reaches a terminal CANCELLED state") {
    import spark.implicits._
    // a slow-enough query: cross join inflates work so cancel lands
    // while RUNNING on at least some machines; if it finishes first,
    // cancel is a documented no-op and the state stays SUCCEEDED
    spark.range(2000000).toDF("a").createOrReplaceTempView("async_big")
    val id = AsyncQuery.submit(spark,
      "SELECT count(*) FROM async_big x JOIN async_big y ON x.a % 97 = y.a % 97",
      outDir)
    AsyncQuery.cancel(spark, id)
    // the CAS protocol makes CANCELLED sticky: even a cancel landing
    // before the runner thread starts must win (the runner's
    // Queued→Running CAS fails and it never executes)
    val terminal = AsyncQuery.waitFor(id, timeoutMs = 60000L)
    assert(terminal == AsyncQuery.Cancelled)
    // and it stays terminal — no late transition back to RUNNING
    Thread.sleep(200)
    assert(AsyncQuery.status(id) == AsyncQuery.Cancelled)
    AsyncQuery.forget(id)
  }

  test("unknown id is rejected") {
    intercept[IllegalArgumentException] { AsyncQuery.status("nope") }
  }
}
