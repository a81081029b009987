package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** A named bundle of driver-checkable queries.
  *
  * Every entry in `queries` is a Spark DataFrame program over the
  * TESTDATA.md parquet tables; `oracles` carries the equivalent ANSI SQL
  * the driver runs in DuckDB over the same files. The driver's compare
  * sorts columns by name and hashes values, so:
  *   - every computed column is aliased identically on both sides,
  *   - every query ends in a total ORDER BY (deterministic row order),
  *   - floating aggregates are round()ed so summation-order noise
  *     between engines cannot flip a bit.
  * Queries with no SQL-expressible oracle (custom expressions, ML-style
  * ops) appear in `queries` only — the driver records a rows-only check.
  */
trait QueryPack {
  type QueryFn = (SparkSession, String) => DataFrame
  def queries: Map[String, QueryFn]
  def oracles: Map[String, String]
}
