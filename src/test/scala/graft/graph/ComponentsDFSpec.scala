package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Star-contraction CC (ComponentsDF) must agree with GraphX Pregel CC
  * on every graph shape that stresses a different part of the
  * algorithm: chains (path-halving), cycles (termination), stars
  * (already-converged input), forests of mixed sizes, and duplicate /
  * reversed / self-loop edges (input hygiene). GraphX is the
  * spec-by-construction side — its min-id contract is documented
  * upstream — so equality pins ComponentsDF to the same contract. */
class ComponentsDFSpec extends SparkSpec {

  private def edgesDF(pairs: Seq[(Long, Long)]): DataFrame = {
    import spark.implicits._
    pairs.toDF("src", "dst")
  }

  /** (vid -> component) from both engines; GraphX needs the vertex set. */
  private def bothEngines(pairs: Seq[(Long, Long)]): (Map[Long, Long], Map[Long, Long]) = {
    val e = edgesDF(pairs)
    val verts = e.select(col("src").as("vid"))
      .unionByName(e.select(col("dst").as("vid"))).distinct()
    val df = ComponentsDF.run(e).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val gx = Traversal.connectedComponents(
      verts, e.select(col("src").as("src_vid"), col("dst").as("dst_vid")), spark)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    (df, gx)
  }

  test("chain, cycle, star, forest, dup/reversed/self-loop edges all match GraphX") {
    val shapes: Seq[(String, Seq[(Long, Long)])] = Seq(
      "long chain" -> (1L to 40L).sliding(2).map(w => (w(0), w(1))).toSeq,
      "cycle" -> ((1L to 12L).sliding(2).map(w => (w(0), w(1))).toSeq :+ (12L -> 1L)),
      "star already converged" -> (2L to 20L).map(v => (1L, v)),
      "forest of mixed sizes" -> Seq(
        (1L, 2L), (2L, 3L), // triple
        (10L, 11L), // pair
        (20L, 21L), (21L, 22L), (22L, 20L), // triangle
        (30L, 31L), (31L, 32L), (32L, 33L), (30L, 33L), (31L, 33L)), // dense
      "dups, reversals, self-loops" -> Seq(
        (5L, 6L), (6L, 5L), (5L, 6L), (7L, 7L), (6L, 7L)))
    for ((name, pairs) <- shapes) {
      val (df, gx) = bothEngines(pairs)
      assert(df == gx, s"$name: ComponentsDF disagrees with GraphX\n df=$df\n gx=$gx")
      // min-id contract directly, independent of GraphX
      df.groupBy(_._2).foreach { case (comp, members) =>
        assert(members.keys.min == comp, s"$name: component $comp is not its min id")
      }
    }
  }

  test("deterministic pseudo-random graph matches GraphX and is partition-invariant") {
    // 120 vertices, edges from modular arithmetic (no RNG — d12's law):
    // i -> (i*7+3) mod 120 restricted to a band, yielding several
    // nontrivial components of different sizes.
    val pairs = (0L until 120L).flatMap { i =>
      val j = (i * 7 + 3) % 120
      if ((i + j) % 3 != 0 && i != j) Some((i, j)) else None
    }
    val (df, gx) = bothEngines(pairs)
    assert(df == gx)
    // repartitioning the edge list must not change the assignment
    val re = ComponentsDF.run(edgesDF(pairs).repartition(13)).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(re == df, "component assignment changed under repartition")
  }

  test("empty edge list yields an empty assignment") {
    assert(ComponentsDF.run(edgesDF(Nil)).collect().isEmpty)
  }

  test("celebrity bucket connects linearly: 300-member bipartite star is one component") {
    // the g49 scale claim: a hot bucket contributes O(members) edges
    // (user 2i — bucket 2b+1), never O(members^2) pairs; CC over that
    // star must still produce a single component in few rounds
    val bucket = 9000001L // odd = bucket-side id
    val pairs = (0L until 300L).map(u => (u * 2, bucket))
    val out = ComponentsDF.run(edgesDF(pairs)).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out.size == 301 && out.values.toSet == Set(0L),
      s"expected one component rooted at user 0, got ${out.values.toSet}")
  }

  test("g48 (pair CC) and g49 (bipartite CC) agree on the corpus at both SFs") {
    for (sf <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val a = graft.queries.GraphQueries.g48CcNative(spark, sf).collect().map(_.toSeq)
      val b = graft.queries.GraphQueries.g49CcBipartite(spark, sf).collect().map(_.toSeq)
      assert(a.sameElements(b), s"pair vs bipartite CC diverge at $sf")
    }
  }
}
