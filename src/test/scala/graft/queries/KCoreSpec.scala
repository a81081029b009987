package graft.queries

import graft.SparkSpec

/** g21's fixed-iteration peeling is only THE 2-core if it has converged
  * by the unroll bound — these tests pin that contract (the same one
  * g13 pins for fixed-iteration PageRank) plus the core property
  * itself.
  */
class KCoreSpec extends SparkSpec {

  // the gate scale, not sf0.001: the co-click graph there is 3 edges —
  // a forest, whose 2-core is legitimately empty
  private val dir = "/root/testdata/sf0.01"

  test("the 8-round unroll is a fixpoint: round 9 changes nothing") {
    val pairs = GraphQueries.coClickPairs(spark, dir).cache()
    try {
      val at8 = GraphQueries.kCoreEdges(pairs, k = 2, iters = 8)
        .collect().toSet
      val at9 = GraphQueries.kCoreEdges(pairs, k = 2, iters = 9)
        .collect().toSet
      assert(at8.nonEmpty, "2-core unexpectedly empty at test scale")
      assert(at8 == at9,
        s"peeling not converged after 8 rounds: ${at8.size} vs ${at9.size} edges")
    } finally pairs.unpersist()
  }

  test("every surviving node has in-core degree >= 2") {
    val degs = GraphQueries.g21KCore(spark, dir).collect()
    assert(degs.nonEmpty)
    assert(degs.forall(_.getLong(1) >= 2),
      "a node below the core threshold survived the peel")
  }

  test("bipartite bound-peeling (g21b) = pair-based survivors at gate scale") {
    val viaPairs = GraphQueries.g21KCore(spark, dir)
      .select("user_id").as[Long](org.apache.spark.sql.Encoders.scalaLong)
      .collect().toSet
    val viaBounds = GraphQueries.g21bKCoreBipartite(spark, dir)
      .as[Long](org.apache.spark.sql.Encoders.scalaLong).collect().toSet
    assert(viaBounds.nonEmpty)
    assert(viaBounds === viaPairs,
      s"bound-peeling diverged: ${viaBounds.size} vs ${viaPairs.size} members")
  }

  test("bound arms: hot bucket keeps via lower bound, repeated-pair drops via exact arm") {
    import spark.implicits._
    // bucket 1 = a 5-member clique (every member max-bound certain,
    // deg 4 ≥ 2); buckets 2 and 3 = the SAME pair (u=100, v=101) twice:
    // sum(u)=2 ≥ k but distinct partners = 1 → the uncertain arm's
    // exact count must drop them (a sum-only rule would wrongly keep).
    val inc = (1L to 5L).map(u => (u, 1L)) ++
      Seq((100L, 2L), (101L, 2L), (100L, 3L), (101L, 3L))
    val core = GraphQueries.kCoreMembersBipartite(
      inc.toDF("user_id", "b"), k = 2, iters = 3)
      .select("user_id").distinct().as[Long].collect().toSet
    assert(core === (1L to 5L).toSet,
      s"expected the clique only, got $core")
  }
}
