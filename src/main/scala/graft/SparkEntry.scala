package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` aggregates every operator pack; each entry has a matching
  * DuckDB oracle in `oracleSql` unless the op is not SQL-expressible
  * (those get the driver's rows-only check).
  */
object SparkEntry {

  private val packs: Seq[QueryPack] = Seq(
    RelationalQueries,
    GraphQueries,
    TextQueries,
    SimilarityQueries,
    MultimodalQueries,
    StreamQueries,
    DocQueries)

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    RelationalQueries.q03TopkRevenue(spark, "/root/testdata/sf0.001")

  /** One per implemented operator from SURVEY.md §2. Duplicate names
    * across packs would silently drop a query (last pack wins in toMap)
    * — and could pair query A with query B's oracle — so uniqueness is
    * asserted here, once, where the packs meet. */
  lazy val queries: Map[String, (SparkSession, String) => DataFrame] = {
    val all = packs.flatMap(_.queries)
    val dups = all.groupBy(_._1).filter(_._2.size > 1).keys
    require(dups.isEmpty, s"duplicate query names across packs: ${dups.mkString(", ")}")
    all.toMap
  }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  lazy val oracleSql: Map[String, String] = {
    val all = packs.flatMap(_.oracles)
    val dups = all.groupBy(_._1).filter(_._2.size > 1).keys
    require(dups.isEmpty, s"duplicate oracle names across packs: ${dups.mkString(", ")}")
    val orphans = all.map(_._1).filterNot(queries.contains)
    require(orphans.isEmpty, s"oracles without a matching query: ${orphans.mkString(", ")}")
    all.toMap
  }
}
