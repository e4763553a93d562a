package graft.queries

/** Differential sweep of the query generator: for 100 fixed seeds the
  * DataFrame rendering and the SQL rendering (run through `spark.sql`
  * over the same registered views) must produce identical multisets.
  * This pins that the two renderers MEAN the same query — the
  * precondition for the fixed-seed oracle rows in [[FuzzQueries]],
  * where the SQL side runs in DuckDB and any mismatch is a real
  * cross-engine divergence rather than a renderer bug. 100 in-process
  * seeds ≫ the 12 gate seeds: renderer bugs are overwhelmingly
  * shape-dependent, so sweeping every shape × predicate × join
  * combination the generator can emit is the cheap half of the
  * differential; the expensive half (a second engine) rides on the
  * driver's DuckDB run.
  */
class QueryFuzzSpec extends graft.SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def sweep(gen: Long => QueryFuzz.FuzzQuery, seeds: Range.Inclusive): Unit = {
    graft.Tables.registerAll(spark, sf)
    val failures = Seq.newBuilder[String]
    for (seed <- seeds) {
      val fq = gen(seed.toLong)
      val sql = QueryFuzz.toSql(fq)
      try {
        val viaDf = QueryFuzz.toDataFrame(fq, spark, sf)
          .collect().map(_.toString).sorted.toSeq
        val viaSql = spark.sql(sql)
          .collect().map(_.toString).sorted.toSeq
        if (viaDf != viaSql) {
          val diff = (viaDf.diff(viaSql).take(3), viaSql.diff(viaDf).take(3))
          failures += s"seed $seed: ${viaDf.size} vs ${viaSql.size} rows; " +
            s"df-only=${diff._1}, sql-only=${diff._2}\nSQL:\n$sql"
        }
      } catch {
        case e: Throwable =>
          failures += s"seed $seed threw ${e.getClass.getSimpleName}: " +
            s"${e.getMessage}\nSQL:\n$sql"
      }
    }
    val fs = failures.result()
    assert(fs.isEmpty, s"${fs.size} seeds diverged:\n${fs.mkString("\n---\n")}")
  }

  test("100 seeds: DataFrame rendering == spark.sql(SQL rendering)") {
    sweep(QueryFuzz.generate, 1 to 100)
  }

  test("100 v2 seeds (semi/anti, HAVING, set ops): DataFrame == spark.sql") {
    sweep(QueryFuzz.generateV2, 1 to 100)
  }
}
