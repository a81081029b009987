package graft.graph

import org.apache.spark.graphx.{Edge => GxEdge, Graph => GxGraph}

import graft.SparkSpec

/** GraphX PageRank over a reference-shaped graph: hub nodes (streams)
  * must outrank leaf nodes (items) — structural sanity, since float
  * scores are not hash-comparable. */
class PageRankSpec extends SparkSpec {

  test("pagerank: hub stream outranks leaf items") {
    val sc = spark.sparkContext
    // 10 items (ids 100..109) all dispose into stream 1; item 100 also
    // into stream 2; facility 3 isolated-ish
    val edges = sc.parallelize(
      (100 to 109).map(i => GxEdge(i.toLong, 1L, ())) :+ GxEdge(100L, 2L, ()))
    val vertices = sc.parallelize(
      (Seq(1L, 2L, 3L) ++ (100L to 109L)).map(v => (v, ())))
    val ranks = GxGraph(vertices, edges, ())
      .pageRank(0.0001).vertices.collect().toMap
    val hub = ranks(1L)
    val minor = ranks(2L)
    val leafMax = (100L to 109L).map(ranks).max
    assert(hub > minor, s"hub=$hub minor=$minor")
    assert(hub > leafMax * 5, s"hub=$hub leafMax=$leafMax")
  }
}
