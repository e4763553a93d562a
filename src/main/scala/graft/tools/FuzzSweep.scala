package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

import graft.queries.QueryFuzz

/** Value-level CROSS-ENGINE sweep of the differential fuzzer: render
  * every seed of a generator family both ways, write the DataFrame
  * result as parquet and the SQL rendering into `oracle_sql.json` —
  * the exact artifact shape `graft.Verify` produces — so the existing
  * DuckDB gate mimic (`tools/check.py <sfDir> <outDir>`: columns
  * sorted by name, rows sorted, exact value equality) compares ALL
  * seeds, not just the fixed gate dozen.
  *
  * The in-process `QueryFuzzSpec` sweep proves the two renderings
  * mean the same query to SPARK; this instrument proves them against
  * a SECOND engine at every seed — it is how the v3 rollup-over-empty
  * divergence was found (seeds 41/63; see BENCHNOTES round 13).
  *
  * Usage: tools/run_main.sh graft.tools.FuzzSweep v3 \
  *          /root/testdata/sf0.01 /tmp/fuzz_sweep_v3 100
  */
object FuzzSweep {
  def main(args: Array[String]): Unit = {
    val gen = args(0) match {
      case "v1" => QueryFuzz.generate _
      case "v2" => QueryFuzz.generateV2 _
      case "v3" => QueryFuzz.generateV3 _
      case other => sys.error(s"unknown generator family: $other")
    }
    val sfDir = args(1)
    val outDir = args(2)
    val nSeeds = if (args.length > 3) args(3).toInt else 100
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .withExtensions(new graft.GraftExtensions)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()

    val sqls = Seq.newBuilder[(String, String)]
    var failed = 0
    for (seed <- 1 to nSeeds) {
      val name = f"${args(0)}%s_$seed%03d"
      val fq = gen(seed.toLong)
      try {
        QueryFuzz.toDataFrame(fq, spark, sfDir)
          .coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
        sqls += name -> QueryFuzz.toSql(fq)
      } catch { case e: Throwable =>
        failed += 1
        System.err.println(s"[fuzz-sweep] $name FAILED: ${e.getMessage}")
      }
    }
    // same escape as graft.Verify's oracle dump (quote + backslash +
    // all control chars — generated SQL embeds newlines)
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = sqls.result().map { case (k, v) => s"${q(k)}: ${q(v)}" }
      .mkString("{\n", ",\n", "\n}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    println(s"""{"probe":"fuzz_sweep","family":"${args(0)}","sf":"$sfDir",""" +
      s""""seeds":$nSeeds,"written":${sqls.result().size},"failed":$failed}""")
    spark.stop()
    if (failed > 0) sys.exit(1)
  }
}
