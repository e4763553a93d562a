package graft.io

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.Row

/** Regression guard for the round-5 testdata incident: the driver
  * regenerated `events.parquet` from TIMESTAMP(NANOS) to plain
  * timestamp[us] and the unconditional nanos-as-long conversion in
  * `Tables.load` broke every events query. `Tables.normalizeEventsTs`
  * must accept every physical encoding the driver has ever shipped —
  * nanos-as-long (LongType under the legacy conf), TIMESTAMP_NTZ
  * (micros, not adjusted to UTC), and plain TimestampType — and
  * produce the SAME microsecond TimestampType instants for all three.
  */
class EventsTsFormatSpec extends graft.SparkSpec {

  // 2024-01-15T10:30:00.123456Z and one second later, as epoch micros.
  private val micros = Seq(1705314600123456L, 1705314601123456L)

  private def writeFixture(schemaTs: DataType, rows: Seq[Row]): String = {
    val dir = java.nio.file.Files.createTempDirectory("events_fmt").toString
    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("ts", schemaTs)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1), schema)
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  private def instants(dir: String): Seq[Long] = {
    val df = graft.Tables.load(spark, dir, "events")
    assert(df.schema("ts").dataType == TimestampType,
      s"normalizeEventsTs must yield TimestampType, got ${df.schema("ts").dataType}")
    df.orderBy("event_id").select(unix_micros(col("ts")))
      .collect().map(_.getLong(0)).toSeq
  }

  test("nanos-as-long encoding normalizes to micros TimestampType") {
    // A real TIMESTAMP(NANOS) parquet file reads as LongType under
    // spark.sql.legacy.parquet.nanosAsLong — a plain INT64 column
    // exercises the identical LongType branch.
    val dir = writeFixture(LongType,
      micros.zipWithIndex.map { case (us, i) => Row(i.toLong, us * 1000L) })
    assert(instants(dir) == micros)
  }

  test("timestamp_ntz (timestamp[us]) encoding normalizes identically") {
    // The current testdata generation: parquet timestamp[us] without
    // isAdjustedToUTC → Spark reads TIMESTAMP_NTZ. Session TZ is UTC,
    // so the NTZ→TZ cast preserves the wall clock exactly.
    val dir = writeFixture(TimestampNTZType,
      micros.zipWithIndex.map { case (us, i) =>
        Row(i.toLong, java.time.LocalDateTime.ofEpochSecond(
          us / 1000000L, (us % 1000000L).toInt * 1000, java.time.ZoneOffset.UTC))
      })
    assert(instants(dir) == micros)
  }

  test("plain TimestampType encoding passes through untouched") {
    val dir = writeFixture(TimestampType,
      micros.zipWithIndex.map { case (us, i) =>
        val t = new Timestamp(us / 1000L); t.setNanos((us % 1000000L).toInt * 1000)
        Row(i.toLong, t)
      })
    assert(instants(dir) == micros)
  }

  test("all three encodings agree on the real loader path") {
    val asLong = writeFixture(LongType,
      micros.zipWithIndex.map { case (us, i) => Row(i.toLong, us * 1000L) })
    val asNtz = writeFixture(TimestampNTZType,
      micros.zipWithIndex.map { case (us, i) =>
        Row(i.toLong, java.time.LocalDateTime.ofEpochSecond(
          us / 1000000L, (us % 1000000L).toInt * 1000, java.time.ZoneOffset.UTC))
      })
    assert(instants(asLong) == instants(asNtz))
  }
}
