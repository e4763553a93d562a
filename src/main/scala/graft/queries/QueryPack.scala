package graft.queries

import scala.collection.mutable
import org.apache.spark.sql.{DataFrame, SparkSession}

/** A named query with an optional DuckDB oracle.
  *
  * The driver contract (SparkEntry): every operator claimed done has a
  * `queries` entry; those with ANSI-SQL-expressible semantics also carry
  * an `oracleSql` string the driver runs in DuckDB over the same parquet
  * tables. Column names/ordering conventions:
  *   - every computed column is aliased identically on both sides;
  *   - both sides ORDER BY a deterministic key (driver may sort anyway);
  *   - double aggregates are rounded (4dp) on both sides so partial-agg
  *     summation order can't flip low bits;
  *   - `events.ts` is nanosecond precision in parquet; Spark reads it at
  *     microsecond precision, so oracles CAST it before use;
  *   - integer SUMs are CAST(... AS BIGINT) in DuckDB (it widens to
  *     HUGEINT by default, Spark to LongType).
  */
abstract class QueryPack {
  private val defs =
    mutable.LinkedHashMap[String, ((SparkSession, String) => DataFrame, Option[String])]()

  /** Register a query; `oracle = null` → rows-only check (non-SQL op). */
  protected def q(name: String, oracle: String)
                 (run: (SparkSession, String) => DataFrame): Unit =
    defs(name) = (run, Option(oracle))

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    defs.view.mapValues(_._1).toMap

  def oracles: Map[String, String] =
    defs.collect { case (n, (_, Some(sql))) => n -> sql }.toMap

  def names: Seq[String] = defs.keys.toSeq
}
