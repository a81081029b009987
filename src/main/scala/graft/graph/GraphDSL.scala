package graft.graph

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Typed fluent query DSL over node/edge tables (SURVEY.md §7 M3) — the
  * Cypher subset the reference actually uses (`README.md:57-73`,
  * `etl_implementation.md:229-257`), compiled directly to DataFrame
  * plans so Catalyst optimizes the whole chain end-to-end:
  *
  * {{{
  * GraphDSL.on(nodes, edges)
  *   .matchLabel("WasteItem")            // MATCH (n:WasteItem)
  *   .out("DISPOSED_IN")                 // -[:DISPOSED_IN]->(m)
  *   .groupCount("name")                 // RETURN m.name, count(*)
  * }}}
  *
  * Each step is lazy plan construction — nothing runs until an action;
  * hop joins shuffle on uid once per hop, and `MATCH (:Label)` becomes a
  * pushable `label = 'X'` filter (partition pruning when the node table
  * is partitioned by label).
  */
final case class GraphDSL private (nodes: DataFrame, edges: DataFrame, frontier: DataFrame) {

  /** MATCH (n:label) — restrict the frontier to one label. */
  def matchLabel(label: String): GraphDSL =
    copy(frontier = frontier.filter(col("label") === label))

  /** WHERE pred on the current frontier's node columns. */
  def where(pred: Column): GraphDSL = copy(frontier = frontier.filter(pred))

  /** -[:relType]->(m): hop forward; frontier becomes the destination
    * nodes with path multiplicity (Cypher MATCH counts paths — a node
    * reached via several edges appears once per path; use
    * [[distinctNodes]] for set/reachability semantics). */
  def out(relType: String): GraphDSL = hop(relType, forward = true)

  /** <-[:relType]-(m): hop backward. */
  def in(relType: String): GraphDSL = hop(relType, forward = false)

  /** Collapse the frontier to distinct nodes (reachability semantics). */
  def distinctNodes: GraphDSL = copy(frontier = frontier.dropDuplicates("uid"))

  private def hop(relType: String, forward: Boolean): GraphDSL = {
    val (fromCol, toCol) = if (forward) ("src_uid", "dst_uid") else ("dst_uid", "src_uid")
    val next = frontier.select(col("uid").as("_from"))
      .join(edges.filter(col("rel_type") === relType)
        .select(col(fromCol).as("_from"), col(toCol).as("_to")), "_from")
      .select(col("_to").as("uid"))
      .join(nodes, "uid")
    copy(frontier = next)
  }

  /** -[:relType*min..max]->(m): bounded variable-length path (the
    * Cypher `*1..3` form; J8's bounded case). Unrolls into `max` chained
    * hop joins — one plan, no driver iteration — and unions the
    * frontiers of depths `min..max` with a `hops` column. Path
    * multiplicity is preserved (Cypher semantics); follow with
    * [[distinctNodes]] for reachability. Unbounded `*` belongs to
    * [[Traversal.reachFixpoint]], not here. */
  def outVar(relType: String, minHops: Int, maxHops: Int): GraphDSL = {
    require(minHops >= 1 && maxHops >= minHops, s"bad hop range $minHops..$maxHops")
    val e = edges.filter(col("rel_type") === relType)
      .select(col("src_uid").as("_from"), col("dst_uid").as("_to"))
    var cur = frontier.select(col("uid").as("_from"))
    var acc: Option[DataFrame] = None
    for (depth <- 1 to maxHops) {
      cur = cur.join(e, "_from").select(col("_to").as("_from"))
      if (depth >= minHops) {
        val reached = cur.select(col("_from").as("uid"), lit(depth).as("hops"))
        acc = Some(acc.fold(reached)(_.unionByName(reached)))
      }
    }
    copy(frontier = acc.get.join(nodes, "uid"))
  }

  /** OPTIONAL MATCH (n)-[:relType]->(m): every current frontier row
    * survives; matched paths carry the destination node as
    * m_uid/m_label/m_name (null when the node has no such edge). Path
    * multiplicity on the matched side follows Cypher (one row per
    * edge). The frontier keeps the SOURCE node's identity columns, so
    * aggregations over match/no-match both work. */
  def outOptional(relType: String): GraphDSL = {
    val e = edges.filter(col("rel_type") === relType)
      .select(col("src_uid").as("uid"), col("dst_uid").as("_m_uid"))
    val m = nodes.select(col("uid").as("_m_uid"),
      col("label").as("m_label"), col("name").as("m_name"))
    copy(frontier = frontier.join(e, Seq("uid"), "left")
      .join(m, Seq("_m_uid"), "left")
      .withColumnRenamed("_m_uid", "m_uid"))
  }

  /** WHERE NOT (n)-[:relType]->() — anti-join on outgoing pattern
    * (J6, the orphan check). */
  def whereNotOut(relTypes: String*): GraphDSL =
    copy(frontier = frontier.join(
      edges.filter(col("rel_type").isin(relTypes: _*))
        .select(col("src_uid").as("uid")).distinct(),
      Seq("uid"), "left_anti"))

  /** RETURN n.col, count(*) ORDER BY count DESC (A6/A7). */
  def groupCount(column: String): DataFrame =
    frontier.groupBy(column).agg(count(lit(1)).as("cnt"))
      .orderBy(desc("cnt"), asc(column))

  /** Top-k by count (O3 — plans as TakeOrderedAndProject). */
  def topK(column: String, k: Int): DataFrame = groupCount(column).limit(k)

  /** The current frontier as a DataFrame (RETURN n). */
  def df: DataFrame = frontier
}

object GraphDSL {
  /** Entry point: MATCH over a node/edge table pair. */
  def on(nodes: DataFrame, edges: DataFrame): GraphDSL =
    GraphDSL(nodes, edges, nodes)
}
