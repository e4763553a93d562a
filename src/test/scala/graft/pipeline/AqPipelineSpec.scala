package graft.pipeline

import java.nio.file.Files
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import graft.SparkSpec

/** Per-operator tests for the air-quality transform chain, covering
  * the reference's own edge cases (FIXTURES.md §1):
  * exact duplicates, same-key-different-value (pivot-mean), all-null
  * metadata (VoidType class), mixed timezone offsets, invalid
  * datetime, UTC-day partition boundary, idempotent re-write.
  */
class AqPipelineSpec extends SparkSpec {
  import spark.implicits._

  private def rawDf(rows: Seq[String]) = {
    val ds = spark.createDataset(rows)
    spark.read.schema(AqSchemas.rawMeasurement).json(ds)
  }

  private val base =
    """{"location_id": 18, "sensor_id": 37, "datetime": "2024-01-15T10:00:00+07:00",
      | "parameter": "pm25", "value": 45.5, "unit": "ug/m3",
      | "extracted_at": "2024-01-15T11:00:00", "location_name": "SPARTAN",
      | "city": "Hanoi", "timezone": "Asia/Bangkok", "country": "VN",
      | "latitude": 21.0285, "longitude": 105.8542}""".stripMargin.replaceAll("\n", "")

  test("F1: ISO-8601 offsets normalize to UTC") {
    val df = AqPipeline.parseTimestamps(rawDf(Seq(base)))
    val ts = df.select("datetime").as[java.sql.Timestamp].head()
    assert(ts.toInstant.toString == "2024-01-15T03:00:00Z") // 10:00+07:00
  }

  test("F2/F3: partition columns zero-padded from UTC datetime") {
    val df = AqPipeline.parseTimestamps(rawDf(Seq(base)))
    assert(df.select("year", "month", "day").head() == Row("2024", "01", "15"))
  }

  test("TZ boundary: 02:00+07:00 lands on the PREVIOUS UTC day") {
    val row = base.replace("2024-01-15T10:00:00+07:00", "2024-01-15T02:00:00+07:00")
    val df = AqPipeline.parseTimestamps(rawDf(Seq(row)))
    assert(df.select("day").head().getString(0) == "14")
  }

  test("P9: unparseable datetime rows are dropped") {
    val bad = base.replace("2024-01-15T10:00:00+07:00", "not-a-date")
    assert(AqPipeline.parseTimestamps(rawDf(Seq(base, bad))).count() == 1)
  }

  test("W1: dedup keeps the freshest extraction, deterministically") {
    val older = base.replace("\"value\": 45.5", "\"value\": 1.0")
      .replace("2024-01-15T11:00:00", "2024-01-15T09:00:00")
    val df = AqPipeline.deduplicate(AqPipeline.parseTimestamps(rawDf(Seq(older, base))))
    assert(df.count() == 1)
    assert(df.select("value").head().getDouble(0) == 45.5)
  }

  test("A1: pivot pins all pollutant columns and means duplicates") {
    val v2 = base.replace("\"value\": 45.5", "\"value\": 54.5")
      .replace("\"sensor_id\": 37", "\"sensor_id\": 38")
    val wide = AqPipeline.pivotParameters(
      AqPipeline.parseTimestamps(rawDf(Seq(base, v2))))
    assert(AqSchemas.parameters.forall(wide.columns.contains))
    assert(wide.select("pm25").head().getDouble(0) == 50.0)
    assert(wide.select("pm10").head().isNullAt(0))
  }

  test("VoidType class: all-null metadata survives with defaults") {
    val nul = base
      .replace("\"city\": \"Hanoi\"", "\"city\": null")
      .replace("\"country\": \"VN\"", "\"country\": null")
      .replace("\"latitude\": 21.0285", "\"latitude\": null")
      .replace("\"longitude\": 105.8542", "\"longitude\": null")
    val mart = AqPipeline.transform(rawDf(Seq(nul)))
    val r = mart.select("city_name", "country_code", "latitude", "longitude").head()
    assert(r == Row("Unknown", "VN", 0.0, 0.0))
  }

  test("golden schema: transform output matches the reference contract") {
    val mart = AqPipeline.transform(rawDf(Seq(base)))
    val expected = AqSchemas.mart.fields.map(f => (f.name, f.dataType)).toSeq
    val actual = mart.schema.fields.map(f => (f.name, f.dataType)).toSeq
    assert(actual == expected)
  }

  test("K1: partitioned write is idempotent (dynamic overwrite, not append)") {
    val out = Files.createTempDirectory("aq_mart").toString
    val mart = AqPipeline.transform(rawDf(Seq(base)))
    AqPipeline.writeMart(mart, out)
    AqPipeline.writeMart(mart, out) // re-run must not double rows
    assert(spark.read.parquet(out).count() == 1)
    val partDir = new java.io.File(s"$out/year=2024/month=01/day=15")
    assert(partDir.isDirectory, "hive partition layout expected")
  }

  test("A3: validation audit is a single-pass single-row report") {
    val mart = AqPipeline.transform(rawDf(Seq(base)))
    val audit = AqPipeline.validate(mart).head()
    assert(audit.getAs[Long]("row_count") == 1L)
    assert(audit.getAs[Long]("distinct_keys") == 1L)
    assert(audit.getAs[Long]("null_location_id") == 0L)
  }

  test("A10: generalized audit flags duplicate keys and null criticals") {
    import spark.implicits._
    val df = Seq(
      (1L, "a", Some("x")), (1L, "a", Some("y")), // dup key
      (2L, "b", None)                             // null critical
    ).toDF("k1", "k2", "attr")
    val bad = AqPipeline.validate(df, "bad", Seq("k1", "k2"), Seq("attr")).head()
    assert(bad.getAs[String]("stage") == "bad")
    assert(bad.getAs[Long]("row_count") == 3L)
    assert(bad.getAs[Long]("distinct_keys") == 2L)
    assert(bad.getAs[Long]("dup_rows") == 1L)
    assert(bad.getAs[Long]("null_critical") == 1L)
    assert(!bad.getAs[Boolean]("consistent"))
    val clean = Seq((1L, "a", "x"), (2L, "b", "y")).toDF("k1", "k2", "attr")
    val ok = AqPipeline.validate(clean, "ok", Seq("k1", "k2"), Seq("attr")).head()
    assert(ok.getAs[Boolean]("consistent") && ok.getAs[Long]("dup_rows") == 0L)
  }

  test("AQI: EPA breakpoint interpolation + level + dominant pollutant") {
    val rows = Seq(
      base, // pm25 45.5 → AQI in (101,150]
      base.replace("\"parameter\": \"pm25\"", "\"parameter\": \"o3\"")
        .replace("\"value\": 45.5", "\"value\": 10.0")
        .replace("\"location_id\": 18", "\"location_id\": 19"))
    val mart = AqPipeline.transform(rawDf(rows), aqi = true)
    val r18 = mart.filter($"location_id" === "18")
      .select("aqi", "aqi_level", "dominant_pollutant").head()
    // (150-101)/(55.4-35.5)*(45.5-35.5)+101 = 125.62...
    assert(math.abs(r18.getDouble(0) - 125.6231155778894) < 1e-9)
    assert(r18.getString(1) == "Unhealthy for Sensitive Groups")
    assert(r18.getString(2) == "pm25")
    val r19 = mart.filter($"location_id" === "19")
      .select("aqi", "aqi_level", "dominant_pollutant").head()
    // o3 uses its own EPA table: (50-0)/(54-0)*(10-0)+0
    assert(math.abs(r19.getDouble(0) - (50.0 / 54.0 * 10.0)) < 1e-9)
    assert(r19.getString(1) == "Good")
    assert(r19.getString(2) == "o3")
  }

  test("AQI edge cases: null and negative concentrations") {
    import org.apache.spark.sql.functions.col
    val df = Seq((Some(-5.0), 1), (None, 2)).toDF("c", "id")
      .select(graft.functions.Aqi.pm25Aqi(col("c")).as("aqi"))
    assert(df.collect().forall(_.isNullAt(0)))
  }
}

/** Nested-dimension ingestion (FIXTURES §2) + the city-override
  * lookup, and the reference's data-quality invariant suite
  * (tests/test_glue_transformation.py) applied to our mart.
  */
class AqDimensionSpec extends graft.SparkSpec {
  import org.apache.spark.sql.functions._
  import spark.implicits._

  private val locJson =
    """{"id": 18, "name": "SPARTAN", "locality": null, "timezone": "Asia/Bangkok",
      | "country": {"id": 56, "code": "VN", "name": "Vietnam"},
      | "isMobile": false, "isMonitor": true,
      | "sensors": [
      |   {"id": 37, "name": "pm25", "parameter": {"id": 2, "name": "pm25", "units": "ug/m3", "displayName": "PM2.5"}},
      |   {"id": 38, "name": "pm10", "parameter": {"id": 3, "name": "pm10", "units": "ug/m3", "displayName": "PM10"}}],
      | "coordinates": {"latitude": 21.048, "longitude": 105.8},
      | "datetimeLast": {"utc": "2026-01-01T00:00:00Z", "local": "2026-01-01T07:00:00+07:00"}}
      |""".stripMargin.replaceAll("\n", "")

  private def locations = spark.read.schema(AqSchemas.location)
    .json(spark.createDataset(Seq(locJson)))

  test("sensorLookup explodes sensors[] into a flat broadcastable dim") {
    val dim = AqPipeline.sensorLookup(locations)
    assert(dim.count() == 2)
    val r = dim.filter($"sensor_id" === 38).head()
    assert(r.getAs[String]("parameter") == "pm10")
    assert(r.getAs[Long]("location_id") == 18L)
    assert(r.getAs[String]("country") == "VN")
  }

  test("cityWithOverride: locality > static map > Unknown") {
    val dim = AqPipeline.sensorLookup(locations)
      .withColumn("city", AqPipeline.cityWithOverride(Map(18L -> "Hanoi")))
    assert(dim.select("city").head().getString(0) == "Hanoi") // locality null → map
    val noMap = AqPipeline.sensorLookup(locations)
      .withColumn("city", AqPipeline.cityWithOverride(Map.empty))
    assert(noMap.select("city").head().getString(0) == "Unknown")
  }
}

class MartInvariantsSpec extends graft.SparkSpec {
  import org.apache.spark.sql.functions._

  // the reference's own data-quality suite, applied to the mart our
  // pipeline produces from the synthetic events flow (pipe_mart)
  private lazy val mart =
    graft.queries.PipelineQueries.martPipeline(spark, "/root/testdata/sf0.001").cache()

  test("invariant: unique (user, hour) keys") {
    assert(mart.groupBy("user_id", "hour").count().filter(col("count") > 1).count() == 0)
  }

  test("invariant: no nulls in critical columns") {
    assert(mart.filter(col("user_id").isNull || col("hour").isNull ||
      col("user_name").isNull || col("segment").isNull).count() == 0)
  }

  test("invariant: pivoted values non-negative where present") {
    val anyNeg = graft.queries.PipelineQueries.eventTypes
      .map(c => col(c) < 0).reduce(_ || _)
    assert(mart.filter(anyNeg).count() == 0)
  }

  test("invariant: metadata consistent per user") {
    assert(mart.select("user_id", "user_name", "segment").distinct()
      .groupBy("user_id").count().filter(col("count") > 1).count() == 0)
  }
}

class PipelineMetricsSpec extends graft.SparkSpec {
  import spark.implicits._

  test("observe-based telemetry: stage counts without extra jobs") {
    val listener = PipelineMetrics.attach(spark)
    try {
      val df = Seq((1, Some("a")), (2, None), (3, Some("c")))
        .toDF("id", "v")
      val staged = PipelineMetrics.observed(df, "stage_raw", nullCols = Seq("v"))
        .filter($"id" > 0)
      staged.write.format("noop").mode("overwrite").save() // ONE action
      // listener callbacks are async — wait briefly
      var tries = 0
      while (!listener.collected.contains("stage_raw") && tries < 50) {
        Thread.sleep(100); tries += 1
      }
      val m = listener.collected("stage_raw")
      assert(m("rows") == 3L)
      assert(m("null_v") == 1L)
    } finally spark.listenerManager.unregister(listener)
  }
}

class QuarantineSpec extends graft.SparkSpec {
  test("PERMISSIVE quarantine: corrupt NDJSON lines split out, good rows flow") {
    import java.nio.file.Files
    val dir = Files.createTempDirectory("quarantine")
    val good =
      """{"location_id": 1, "sensor_id": 2, "datetime": "2024-01-15T10:00:00+07:00", "parameter": "pm25", "value": 1.5, "unit": "u", "extracted_at": "x", "location_name": "n", "city": "c", "timezone": "tz", "country": "VN", "latitude": 1.0, "longitude": 2.0}"""
    Files.writeString(dir.resolve("f.json"),
      Seq(good, """{"location_id": BROKEN!!!""", good).mkString("\n"))
    val (g, b) = AqPipeline.readRawQuarantine(spark, dir.toString)
    assert(g.count() == 2)
    assert(b.count() == 1)
    assert(b.head().getString(0).contains("BROKEN"))
  }
}

class TypedAndPruningSpec extends graft.SparkSpec {
  import org.apache.spark.sql.functions._

  private val rec =
    """{"location_id": 18, "sensor_id": 37, "datetime": "2024-01-15T10:00:00+07:00", "parameter": "pm25", "value": 45.5, "unit": "u", "extracted_at": "e", "location_name": "n", "city": "c", "timezone": "tz", "country": "VN", "latitude": 1.0, "longitude": 2.0}"""

  test("typed Dataset[Measurement] surface (SURVEY §1.4)") {
    import spark.implicits._
    val raw = spark.read.schema(AqSchemas.rawMeasurement)
      .json(spark.createDataset(Seq(rec)))
    val ds = AqPipeline.typedMeasurements(raw)
    val m = ds.head()
    assert(m.parameter.contains("pm25") && m.value.contains(45.5))
    // typed filter still compiles down to the same relational plan
    assert(ds.filter(_.country.contains("VN")).count() == 1)
  }

  test("K4: raw archive lands verbatim lines under extraction-hour paths and replays") {
    import java.nio.file.{Files, Paths}
    val out = Files.createTempDirectory("rawzone").toString
    val first = rec.replace("\"extracted_at\": \"e\"",
      "\"extracted_at\": \"2024-01-15 11:05:00\"")
    val lines = Seq(
      first,
      first.replace("\"sensor_id\": 37", "\"sensor_id\": 38")
        .replace("2024-01-15 11:05:00", "2024-01-15 12:30:00"))
    import spark.implicits._
    val records = lines.toDF("raw")
      .withColumn("extracted_at",
        to_timestamp(get_json_object(col("raw"), "$.extracted_at")))
    AqPipeline.archiveRaw(records, "raw", "extracted_at", out)

    // wall-clock extraction-time layout, hour grain
    assert(Files.exists(Paths.get(s"$out/year=2024/month=01/day=15/hour=11")))
    assert(Files.exists(Paths.get(s"$out/year=2024/month=01/day=15/hour=12")))
    // bytes preserved verbatim
    val back = spark.read.textFile(out).collect().sorted
    assert(back.toSeq == lines.sorted)
    // the archive replays straight through the standard scan + transform
    val replay = AqPipeline.transform(AqPipeline.readRaw(spark, out))
    assert(replay.count() == 1) // same (location, datetime) key, deduped
    // append-only: a second archive run adds, never overwrites
    AqPipeline.archiveRaw(records.limit(1), "raw", "extracted_at", out)
    assert(spark.read.textFile(out).count() == 3)
  }

  test("K4: archived raw lines replay under an EVOLVED schema (new column arrives as null)") {
    import java.nio.file.Files
    val out = Files.createTempDirectory("rawevolve").toString
    import spark.implicits._
    val records = Seq(rec.replace("\"extracted_at\": \"e\"",
        "\"extracted_at\": \"2024-01-15 09:00:00\"")).toDF("raw")
      .withColumn("extracted_at",
        to_timestamp(get_json_object(col("raw"), "$.extracted_at")))
    AqPipeline.archiveRaw(records, "raw", "extracted_at", out)

    // a later schema revision adds a column the old lines never had:
    // replay parses cleanly, the new field is null, old fields intact
    val evolved = org.apache.spark.sql.types.StructType(
      AqSchemas.rawMeasurement :+ org.apache.spark.sql.types.StructField(
        "sensor_firmware", org.apache.spark.sql.types.StringType))
    val replayed = spark.read.schema(evolved).json(out)
    assert(replayed.count() == 1)
    val row = replayed.head()
    assert(row.getAs[Any]("sensor_firmware") == null)
    assert(row.getAs[Long]("location_id") == 18L)
  }

  test("P11: year/month predicates prune hive partitions at the file level") {
    import java.nio.file.Files
    val out = Files.createTempDirectory("prune").toString
    val recs = (1 to 3).map(m => rec.replace("2024-01-15", f"2024-0$m%d-15"))
    val raw = spark.read.schema(AqSchemas.rawMeasurement)
      .json(spark.createDataset(recs)(org.apache.spark.sql.Encoders.STRING))
    AqPipeline.writeMart(AqPipeline.transform(raw), out)
    AqPipeline.registerMart(spark, out, "prune_mart")

    val pruned = spark.table("prune_mart").filter(col("month") === "02")
    val scan = pruned.queryExecution.executedPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.head
    assert(scan.relation.location.inputFiles.length == 3, "3 month partitions on disk")
    assert(scan.metadata("PartitionFilters").contains("month"),
      s"partition filter missing: ${scan.metadata("PartitionFilters")}")
    assert(scan.inputRDDs().head.partitions.length <= 1, "only one partition dir should be read")
    assert(pruned.count() == 1)
  }
}
