package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** DataFrame-native connected components: the alternating
  * large-star / small-star algorithm (Kiveris et al., "Connected
  * Components in MapReduce and Beyond", SoCC'14), run entirely inside
  * Catalyst — no RDD conversion, no Pregel runtime.
  *
  * Why a second CC engine next to [[Traversal.connectedComponents]]
  * (GraphX): the GraphX path materializes vertex/edge RDDs outside the
  * SQL optimizer — every use pays Dataset→RDD encoding, loses AQE
  * (skew-split, runtime partition coalescing), and pins
  * MEMORY_AND_DISK caches the SQL planner can't see. At 100 TB the
  * edge list IS a DataFrame already; keeping the iteration in
  * DataFrames means each round's two shuffles ride the same AQE
  * machinery as every other operator, and `localCheckpoint` per round
  * caps lineage exactly like the PageRank/k-core family
  * (SCALE.md §4). Star-contraction converges in O(log² n) rounds
  * worst-case and ~log d in practice — at any scale the bound is
  * rounds × (edge shuffle), never a transitive-closure blowup.
  *
  * Algorithm (per round, on an undirected edge list E):
  *  - large-star: for every node x, connect each strictly LARGER
  *    neighbor y to m = min(Γ(x) ∪ {x}) — hooks tall trees onto small
  *    ids without ever emitting an upward edge, so the total edge
  *    count cannot grow beyond 2|E|.
  *  - small-star: direct each edge from its larger to its smaller
  *    endpoint, then for every x connect x and all its ≤-neighbors to
  *    their common minimum — path-halving that flattens chains.
  * Both steps are one `Window.partitionBy(x)` min + a projection —
  * the groupBy-then-join-back formulation would shuffle twice on the
  * same key; the window does it in one exchange per direction.
  *
  * Convergence: a (count, xor-of-xxhash64) fingerprint of the edge
  * set, one tiny aggregate per round — order-free, so it is stable
  * across partitionings. At the fixed point every edge is
  * (member, root) with root = the component's minimum id (the same
  * contract GraphX documents), which ComponentsDFSpec pins by direct
  * equivalence against [[Traversal.connectedComponents]].
  *
  * Ref anchor: the reference's only global-graph analytic is Neo4j CC
  * over waste/facility nodes (`analysis_queries.cql` section 4); this
  * is that capability, re-expressed for a 1000-executor cluster.
  */
object ComponentsDF {

  /** Connected components over an undirected edge list.
    *
    * @param edges DataFrame with numeric columns `src`, `dst`
    *              (self-loops and duplicates tolerated).
    * @return (vid, component) for every vertex incident to an edge;
    *         component = min vertex id in the component. Isolated
    *         vertices are the caller's to union in (they never appear
    *         in an edge list).
    */
  def run(edges: DataFrame, maxIter: Int = 25): DataFrame = {
    // The convergence fingerprint rides each round's materialization as
    // an `observe` metric: localCheckpoint(eager) executes through
    // withAction, so the observed aggregate completes with the
    // checkpoint job — one job per round instead of checkpoint +
    // fingerprint re-scan (guide §1.2: don't re-pass over what the
    // round already materialized).
    var (e, fp) = checkpointFp(edges
      .select(least(col("src"), col("dst")).cast("long").as("u"),
        greatest(col("src"), col("dst")).cast("long").as("v"))
      .filter(col("u") =!= col("v"))
      .distinct())

    var converged = false
    var i = 0
    while (i < maxIter && !converged) {
      val (next, nfp) = checkpointFp(smallStar(largeStar(e)))
      converged = nfp == fp
      fp = nfp
      e = next
      i += 1
    }
    require(converged, s"ComponentsDF did not converge in $maxIter rounds")
    // Fixed point is a star forest stored canonically as
    // (u = root, v = member) since root = component min: add the
    // roots' own rows to make the per-vertex assignment total over
    // edge-touched vertices.
    e.select(col("v").as("vid"), col("u").as("component"))
      .unionByName(e.select(col("u").as("vid"), col("u").as("component")))
      .distinct()
  }

  /** Eagerly localCheckpoint `df` with the order-free edge-set
    * fingerprint (count + xor of per-edge hashes — no sort, stable
    * across partitionings) observed ON the materialization job. */
  private def checkpointFp(df: DataFrame): (DataFrame, (Long, Long)) = {
    val obs = org.apache.spark.sql.Observation()
    val ck = df.observe(obs, count(lit(1)).as("n"),
        coalesce(bit_xor(xxhash64(col("u"), col("v"))), lit(0L)).as("h"))
      .localCheckpoint(true)
    val m = obs.get
    (ck, (m("n").asInstanceOf[Long], m("h").asInstanceOf[Long]))
  }

  /** Connect every strictly-larger neighbor of x to min(Γ(x) ∪ {x}).
    * One pass: both edge orientations come from a single explode (not a
    * self-union that reads the input twice), and the output is NOT
    * deduplicated — smallStar's window min is duplicate-insensitive and
    * its trailing distinct canonicalizes the round, so the extra
    * exchange + aggregate a distinct here would cost buys nothing
    * (guide §2.4: remove shuffles outright). Output stays ≤ 2|E| rows. */
  private def largeStar(e: DataFrame): DataFrame = {
    val nbrs = e.select(explode(array(
        struct(col("u").as("x"), col("v").as("y")),
        struct(col("v").as("x"), col("u").as("y")))).as("p"))
      .select(col("p.x").as("x"), col("p.y").as("y"))
    val m = least(min(col("y")).over(Window.partitionBy("x")), col("x"))
    nbrs.withColumn("m", m)
      .filter(col("y") > col("x") && col("y") =!= col("m"))
      .select(col("m").as("u"), col("y").as("v"))
  }

  /** Direct edges large→small, then connect x and all its ≤-neighbors
    * to their common minimum. The two output arms ((m,y) and (m,x))
    * come from one explode over the windowed frame — the
    * self-union formulation executes the window sort twice (the
    * exchange is reused but the post-shuffle sort+window is not). */
  private def smallStar(e: DataFrame): DataFrame = {
    val d = e.select(greatest(col("u"), col("v")).as("x"),
      least(col("u"), col("v")).as("y"))
    val withMin = d.withColumn("m", min(col("y")).over(Window.partitionBy("x")))
    withMin.select(col("m").as("u"),
        explode(array(col("y"), col("x"))).as("v"))
      .filter(col("u") =!= col("v"))
      .select(least(col("u"), col("v")).as("u"),
        greatest(col("u"), col("v")).as("v"))
      .distinct()
  }
}
