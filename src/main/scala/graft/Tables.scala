package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-provided synthetic tables
  * (`/root/testdata/sf*`, see TESTDATA.md). Parquet carries its own
  * schema; no inference hazards (SURVEY §1.3).
  *
  * `events.ts` is written as parquet TIMESTAMP(NANOS), which Spark's
  * vectorized reader rejects outright. We read it via the
  * nanos-as-long escape hatch and convert to microsecond TimestampType
  * with exact integer division (a double roundtrip would corrupt
  * epoch-nanos > 2^53) — the same truncation DuckDB applies when
  * casting TIMESTAMP_NS to TIMESTAMP.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    if (name == "events") {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      spark.read.parquet(s"$dir/$name.parquet")
        .withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
    } else spark.read.parquet(s"$dir/$name.parquet")
  }

  /** Register every table as a temp view so `spark.sql` queries use the
    * same names the DuckDB oracle sees.
    */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
