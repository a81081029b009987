package graft.graph

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.graphx.{Edge => GxEdge, Graph => GxGraph, VertexId}
import org.apache.spark.storage.StorageLevel

/** Unbounded graph traversal (SURVEY.md J8, §4 custom-work item 3): the
  * reference's decision-tree chains (`Condition -NEXT_CHECK-> …`) and
  * AVV hierarchy (`schema.cql:119-122`) need reachability to a fixpoint.
  *
  * Two engines, per SURVEY's decision table:
  *  - [[reachFixpoint]]: iterative DataFrame joins on the driver —
  *    bounded only by graph depth, each iteration one shuffle join;
  *    frontier is cached and localCheckpointed to cut lineage (without
  *    it, iteration N replays all N-1 prior joins — quadratic).
  *  - [[connectedComponents]]: GraphX Pregel-based CC for global
  *    analytics the join loop can't express efficiently.
  *
  * Scale notes: the join loop shuffles the frontier on dst each round;
  * at 100 TB the edge table would be bucketed by src_uid so each
  * iteration is a co-located join. Cycle safety: the visited-set
  * anti-join guarantees termination on cyclic graphs (SURVEY §7
  * hard-part 5).
  */
object Traversal {

  /** Eagerly localCheckpoint `df` with its row count observed ON the
    * materialization job (localCheckpoint(eager) runs through
    * withAction, so the observed aggregate completes with it) — the
    * fixpoint loops' emptiness probe without a second job per level. */
  private def checkpointCount(df: DataFrame): (DataFrame, Long) = {
    val obs = org.apache.spark.sql.Observation()
    val ck = df.observe(obs, count(lit(1)).as("n")).localCheckpoint(true)
    (ck, obs.get("n").asInstanceOf[Long])
  }

  /** All (start, reached, depth) pairs following `edges`
    * (src_uid→dst_uid) from every node to fixpoint, cycle-safe.
    * depth ≥ 1; a node reached by several paths keeps the min depth.
    * `seed` (one column `src_uid`) restricts the START set: the closure
    * is computed only from seed nodes — the hub-safe shape when the
    * caller immediately joins the closure to a filtered node frame
    * anyway (computing all-pairs reach from every node of a 100 TB
    * graph to then keep three sources is the textbook wasted pass,
    * guide §1.2). Results for seeded starts are identical to the
    * unseeded closure's rows for those starts.
    */
  def reachFixpoint(edges: DataFrame, maxIter: Int = 50,
                    seed: Option[DataFrame] = None): DataFrame = {
    val e0 = edges.select(col("src_uid"), col("dst_uid"))
    val e = e0.cache()
    // Levels are kept as a LIST of checkpointed frames and only unioned
    // lazily (for the per-round anti-join) and once at the end: the old
    // form re-checkpointed the whole accumulated closure EVERY round —
    // one extra full-materialization job per level, quadratic total
    // bytes written over the loop (guide §1.2: remove passes that
    // recompute what is already materialized). A union of checkpointed
    // RDDs is lineage-free already; nothing needs re-materializing.
    val level1 = seed.fold(e: DataFrame)(sd =>
      e.join(sd.select(col("src_uid")).distinct(), Seq("src_uid"), "left_semi"))
    val first = level1.select(col("src_uid").as("start"), col("dst_uid").as("reached"),
      lit(1).as("depth")).localCheckpoint(true)
    var levels = Vector(first)
    var frontier = first
    var i = 1
    var done = false
    def acc = levels.reduce(_ unionByName _)
    while (i < maxIter && !done) {
      // the emptiness probe rides the checkpoint job as an observed
      // count (localCheckpoint(eager) executes through withAction) —
      // the old separate isEmpty() was one extra scheduled job per
      // level (guide §1.2)
      val (next, n) = checkpointCount(
        frontier.join(e, frontier("reached") === e("src_uid"))
          .select(col("start"), col("dst_uid").as("reached"), (col("depth") + 1).as("depth"))
          .join(acc.select(col("start").as("s2"), col("reached").as("r2")),
            col("start") === col("s2") && col("reached") === col("r2"), "left_anti")
          // collapse parallel paths within the level: on a diamond
          // (a→b1→c, a→b2→c) the hop join yields (a,c) once per path, and
          // without this the frontier grows multiplicatively (k paths per
          // layer ⇒ k^depth rows) while acc double-counts reachability
          .dropDuplicates(Seq("start", "reached")))
      if (n == 0L) done = true
      else {
        levels :+= next
        frontier = next
        i += 1
      }
    }
    e.unpersist(blocking = false) // every level is checkpointed — lineage-free
    acc
  }

  /** [[reachFixpoint]] variant that also carries ONE deterministic
    * witness path per (start, reached) pair — the per-level
    * lexicographic-min serialization `uid|rel_type|uid|…` — so
    * `RETURN p` on an UNBOUNDED shortestPath projects a real path
    * value. Input edges need (src_uid, dst_uid, rel_type). Semantics
    * match the bounded level-set form: BFS first-reach = min depth
    * (subpaths of shortest paths are shortest, so extending only the
    * newly-reached frontier loses no witness), and within the
    * first-reach level the groupBy min picks the same greedy
    * min-prefix-composition witness the bounded compiler emits. The
    * groupBy REPLACES the dropDuplicates of the plain fixpoint — same
    * shuffle count per round, one string min-agg on top.
    */
  def reachFixpointWitness(edges: DataFrame, maxIter: Int = 50,
                           seed: Option[DataFrame] = None): DataFrame = {
    val e = edges.select(col("src_uid"), col("dst_uid"), col("rel_type")).cache()
    // same seeding contract as reachFixpoint: restrict STARTS up front
    // when the caller will only keep seeded sources
    val level1 = seed.fold(e: DataFrame)(sd =>
      e.join(sd.select(col("src_uid")).distinct(), Seq("src_uid"), "left_semi"))
    def minPath(df: DataFrame, depth: Int): DataFrame =
      df.groupBy("start", "reached").agg(min(col("path")).as("path"))
        .withColumn("depth", lit(depth))
    var frontier = minPath(level1.select(col("src_uid").as("start"),
        col("dst_uid").as("reached"),
        concat(col("src_uid"), lit("|"), col("rel_type"), lit("|"),
          col("dst_uid")).as("path")), 1)
      .localCheckpoint(true)
    // same level-list discipline as reachFixpoint: levels stay
    // individually checkpointed, the accumulated closure is only a lazy
    // union — no per-round re-materialization of everything seen so far
    var levels = Vector(frontier)
    var i = 1
    var done = false
    def acc = levels.reduce(_ unionByName _)
    while (i < maxIter && !done) {
      // same observed-count fusion as reachFixpoint: no separate
      // isEmpty job per level
      val (next, n) = checkpointCount(minPath(
        frontier.join(e, frontier("reached") === e("src_uid"))
          .select(col("start"), col("dst_uid").as("reached"),
            concat(col("path"), lit("|"), col("rel_type"), lit("|"),
              col("dst_uid")).as("path"))
          .join(acc.select(col("start").as("s2"), col("reached").as("r2")),
            col("start") === col("s2") && col("reached") === col("r2"), "left_anti"),
        i + 1))
      if (n == 0L) done = true
      else {
        levels :+= next
        frontier = next
        i += 1
      }
    }
    e.unpersist(blocking = false)
    acc
  }

  /** GraphX connected components over a node/edge DataFrame pair with
    * caller-supplied stable Long vertex ids. Returns (vid, component)
    * where component = min vertex id in the component (GraphX contract).
    */
  def connectedComponents(vertices: DataFrame, edges: DataFrame,
                          spark: SparkSession): DataFrame = {
    import spark.implicits._
    val vrdd = vertices.select(col("vid").cast("long")).as[Long].rdd.map(v => (v, ()))
    val erdd = edges.select(col("src_vid").cast("long"), col("dst_vid").cast("long"))
      .as[(Long, Long)].rdd.map { case (s, d) => GxEdge(s, d, ()) }
    val graph = GxGraph(vrdd, erdd, (),
      edgeStorageLevel = StorageLevel.MEMORY_AND_DISK,
      vertexStorageLevel = StorageLevel.MEMORY_AND_DISK)
    graph.connectedComponents().vertices
      .toDF("vid", "component")
  }
}
