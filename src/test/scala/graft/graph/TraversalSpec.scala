package graft.graph

import graft.SparkSpec

/** reachFixpoint set semantics: parallel paths collapse (min depth per
  * (start, reached) pair, each pair once) and cycles terminate — the
  * properties the tree-shaped query gates (g07) cannot catch. */
class TraversalSpec extends SparkSpec {
  import spark.implicits._

  test("diamond: two parallel paths yield one (start, reached) row") {
    val edges = Seq(("a", "b1"), ("a", "b2"), ("b1", "c"), ("b2", "c"))
      .toDF("src_uid", "dst_uid")
    val got = Traversal.reachFixpoint(edges)
      .as[(String, String, Int)].collect().toSet
    assert(got === Set(
      ("a", "b1", 1), ("a", "b2", 1), ("a", "c", 2),
      ("b1", "c", 1), ("b2", "c", 1)))
  }

  test("cycle terminates with each pair at its min depth") {
    val edges = Seq(("a", "b"), ("b", "c"), ("c", "a"))
      .toDF("src_uid", "dst_uid")
    val got = Traversal.reachFixpoint(edges)
      .as[(String, String, Int)].collect().toSet
    assert(got === Set(
      ("a", "b", 1), ("a", "c", 2), ("a", "a", 3),
      ("b", "c", 1), ("b", "a", 2), ("b", "b", 3),
      ("c", "a", 1), ("c", "b", 2), ("c", "c", 3)))
  }
}
