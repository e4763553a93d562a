package graft.pipeline

import org.apache.spark.sql.types._

/** Explicit schemas for the air-quality pipeline — the engine never
  * infers schemas at a boundary (SURVEY §1.3: the reference's VoidType
  * bug class disappears by construction).
  */
object AqSchemas {

  /** Canonical long-format record as a case class (SURVEY §1.4):
    * the typed `Dataset[Measurement]` surface for the ingest layer —
    * compile-time field checks where the schema is static.
    */
  case class Measurement(
      location_id: Option[Long], sensor_id: Option[Long],
      datetime: Option[String], parameter: Option[String],
      value: Option[Double], unit: Option[String],
      extracted_at: Option[String], location_name: Option[String],
      city: Option[String], timezone: Option[String],
      country: Option[String], latitude: Option[Double],
      longitude: Option[Double])

  /** Canonical long-format measurement record as landed in NDJSON
    * (FIXTURES.md §1; reference fields built at
    * `extract_api.py:249-255,311-318,412-421`).
    */
  val rawMeasurement: StructType = StructType(Seq(
    StructField("location_id", LongType),
    StructField("sensor_id", LongType),
    StructField("datetime", StringType), // ISO-8601 with offset → F1 cast
    StructField("parameter", StringType),
    StructField("value", DoubleType),
    StructField("unit", StringType),
    StructField("extracted_at", StringType),
    StructField("location_name", StringType),
    StructField("city", StringType),
    StructField("timezone", StringType),
    StructField("country", StringType),
    StructField("latitude", DoubleType),
    StructField("longitude", DoubleType)))

  /** Pinned pollutant pivot domain (reference `utils/constants.py:150`,
    * `doc/GLUE_JOBS_GUIDE.md:147-153`).
    */
  val parameters: Seq[String] = Seq("pm25", "pm10", "no2", "so2", "o3", "co", "bc")

  /** The 15(+bc)-column golden mart schema asserted by the reference's
    * own tests (`tests/test_glue_output_schema.py:97-113`; FIXTURES §4).
    */
  val mart: StructType = StructType(
    Seq(
      StructField("location_id", StringType, nullable = false),
      StructField("datetime", TimestampType, nullable = false)) ++
      parameters.map(p => StructField(p, DoubleType)) ++
      Seq(
        StructField("city_name", StringType),
        StructField("country_code", StringType, nullable = false),
        StructField("latitude", DoubleType),
        StructField("longitude", DoubleType),
        StructField("year", StringType),
        StructField("month", StringType),
        StructField("day", StringType)))

  /** Nested locations dimension (FIXTURES §2; API shape consumed at
    * `extract_api.py:376-404`).
    */
  val location: StructType = StructType(Seq(
    StructField("id", LongType),
    StructField("name", StringType),
    StructField("locality", StringType),
    StructField("timezone", StringType),
    StructField("country", StructType(Seq(
      StructField("id", LongType),
      StructField("code", StringType),
      StructField("name", StringType)))),
    StructField("isMobile", BooleanType),
    StructField("isMonitor", BooleanType),
    StructField("sensors", ArrayType(StructType(Seq(
      StructField("id", LongType),
      StructField("name", StringType),
      StructField("parameter", StructType(Seq(
        StructField("id", LongType),
        StructField("name", StringType),
        StructField("units", StringType),
        StructField("displayName", StringType)))))))),
    StructField("coordinates", StructType(Seq(
      StructField("latitude", DoubleType),
      StructField("longitude", DoubleType)))),
    StructField("datetimeLast", StructType(Seq(
      StructField("utc", StringType),
      StructField("local", StringType))))))
}
