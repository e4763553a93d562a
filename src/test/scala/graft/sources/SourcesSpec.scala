package graft.sources

import java.nio.file.Files
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.SparkSpec

class PagedJsonSourceSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("id", LongType),
    StructField("name", StringType),
    StructField("active", BooleanType),
    StructField("score", DoubleType)))

  private def writePages(n: Int, perPage: Int): String = {
    val dir = Files.createTempDirectory("pages")
    (0 until n).foreach { p =>
      val lines = (0 until perPage).map { i =>
        val id = p * perPage + i
        s"""{"id": $id, "name": "loc$id", "active": ${id % 2 == 0}, "score": ${id * 1.5}}"""
      }
      Files.writeString(dir.resolve(f"page_$p%03d.json"), lines.mkString("\n"))
    }
    dir.toString
  }

  private def read(dir: String) =
    spark.read.format(classOf[PagedJsonSource].getName)
      .schema(schema).option("path", dir).load()

  test("each page is one input partition; all rows arrive") {
    val dir = writePages(5, 10)
    val df = read(dir)
    assert(df.count() == 50)
    assert(df.rdd.getNumPartitions == 5)
    assert(df.agg(sum("id")).head().getLong(0) == (0 until 50).sum)
    assert(df.filter(col("active")).count() == 25)
  }

  test("column pruning pushes into the scan") {
    val dir = writePages(2, 5)
    val df = read(dir).select("id")
    val scans = df.queryExecution.executedPlan.collect {
      case b: BatchScanExec => b.scan.readSchema().fieldNames.toSeq
    }
    assert(scans == Seq(Seq("id")), s"expected pruned scan, got $scans")
  }

  test("explicit schema is mandatory") {
    val dir = writePages(1, 1)
    val e = intercept[Exception] {
      spark.read.format(classOf[PagedJsonSource].getName)
        .option("path", dir).load()
    }
    assert(e.getMessage.contains("explicit schema"))
  }
}

class RestFanoutSpec extends SparkSpec {
  import spark.implicits._

  test("distributed per-key fetch with stub fetcher feeds the pipeline") {
    val ids = spark.createDataset(Seq(1L, 2L, 3L).map(java.lang.Long.valueOf))
    val fetcher = (id: Long) => Seq(
      s"""{"location_id": $id, "sensor_id": ${id * 10}, "datetime": "2024-01-15T10:00:00+07:00", "parameter": "pm25", "value": ${id * 1.0}, "unit": "u", "extracted_at": "2024-01-15T11:00:00", "location_name": "L$id", "city": "C$id", "timezone": "tz", "country": "VN", "latitude": 1.0, "longitude": 2.0}""")
    val records = RestFanout.fetchPerKey(ids, fetcher)
    val raw = RestFanout.parsed(spark, records, graft.pipeline.AqSchemas.rawMeasurement)
    val mart = graft.pipeline.AqPipeline.transform(raw)
    assert(mart.count() == 3)
    assert(mart.select("pm25").as[Double].collect().sorted.toSeq == Seq(1.0, 2.0, 3.0))
  }

  test("per-partition rate limiting spaces out calls") {
    val ids = spark.createDataset(Seq(1L, 2L, 3L, 4L).map(java.lang.Long.valueOf))
      .repartition(1) // force serial within one partition
    val t0 = System.currentTimeMillis()
    RestFanout.fetchPerKey(ids, id => Seq(s"""{"id": $id}"""), minIntervalMs = 50L)
      .collect()
    // 4 calls with >=50ms spacing (first is free) => at least ~150ms
    assert(System.currentTimeMillis() - t0 >= 150L)
  }

  test("resilient fetch: flaky key retried with backoff, dead key quarantined, partition survives") {
    FlakyFetcher.calls.clear()
    FlakyFetcher.sleeps.clear()
    val ids = spark.createDataset(Seq(1L, 2L, 3L).map(java.lang.Long.valueOf))
      .repartition(1)
    val outcomes = RestFanout.fetchPerKeyResilient(ids, FlakyFetcher.fetch,
      maxAttempts = 3, baseBackoffMs = 1L, sleeper = FlakyFetcher.recordSleep).collect()
    val byId = outcomes.map(o => o.id -> o).toMap
    assert(byId(1L).ok && byId(1L).attempts == 1 && byId(1L).records == Seq("""{"id": 1}"""))
    // id 2 fails twice, succeeds on attempt 3
    assert(byId(2L).ok && byId(2L).attempts == 3 && byId(2L).records == Seq("""{"id": 2}"""))
    // id 3 always fails -> quarantined, other keys unaffected
    assert(!byId(3L).ok && byId(3L).attempts == 3)
    assert(byId(3L).error.contains("dead key"))
    // exponential: sleeps 1ms then 2ms for id 2's retries (and id 3's)
    import scala.jdk.CollectionConverters._
    assert(FlakyFetcher.sleeps.asScala.toSeq.sorted == Seq(1L, 1L, 2L, 2L))
  }

  test("records()/quarantined() split a resilient fan-out") {
    FlakyFetcher.calls.clear()
    val ids = spark.createDataset(Seq(1L, 2L, 3L).map(java.lang.Long.valueOf)).repartition(1)
    val outcomes = RestFanout.fetchPerKeyResilient(ids, FlakyFetcher.fetch,
      maxAttempts = 3, baseBackoffMs = 1L, sleeper = _ => ())
    assert(RestFanout.records(outcomes).collect().sorted.toSeq ==
      Seq("""{"id": 1}""", """{"id": 2}"""))
    assert(RestFanout.quarantined(outcomes).collect().map(_.id).toSeq == Seq(3L))
  }
}

/** Executor-side flaky stub (static state is visible in local mode):
  * id 2 throws on its first two attempts; id 3 always throws.
  */
object FlakyFetcher {
  val calls = new java.util.concurrent.ConcurrentHashMap[Long, Integer]()
  val sleeps = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
  def recordSleep(ms: Long): Unit = sleeps.add(ms)
  def fetch(id: Long): Seq[String] = {
    val n = calls.merge(id, 1, (a, b) => a + b)
    if (id == 3L) throw new RuntimeException(s"dead key $id")
    if (id == 2L && n <= 2) throw new RuntimeException(s"flaky key $id attempt $n")
    Seq(s"""{"id": $id}""")
  }
}
