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
}
