package graft.graph

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Unit semantics of the fluent DSL on a small branching graph —
  * the properties the corpus-level query gates (g09/g10/g12) can't
  * isolate: path multiplicity, reverse hops, var-length unions.
  *
  * Graph: a→b, a→c, b→d, c→d  (two distinct paths a⇒d)
  */
class GraphDSLSpec extends SparkSpec {
  import spark.implicits._

  private val nodes = Seq(
    ("a", "A", "Start"), ("b", "B", "Mid"), ("c", "C", "Mid"), ("d", "D", "End"))
    .toDF("uid", "name", "label")
  private val edges = Seq(
    ("a", "b", "R"), ("a", "c", "R"), ("b", "d", "R"), ("c", "d", "R"))
    .toDF("src_uid", "dst_uid", "rel_type")

  test("out preserves path multiplicity; distinctNodes collapses it") {
    val two = GraphDSL.on(nodes, edges).matchLabel("Start").out("R").out("R")
    // two paths land on d → two rows (Cypher MATCH counts paths)
    assert(two.df.count() === 2)
    assert(two.df.select("uid").distinct().collect().map(_.getString(0)).toSeq === Seq("d"))
    assert(two.distinctNodes.df.count() === 1)
  }

  test("in hops backward") {
    val back = GraphDSL.on(nodes, edges).matchLabel("End").in("R")
    assert(back.df.select("uid").orderBy("uid").collect().map(_.getString(0)).toSeq
      === Seq("b", "c"))
  }

  test("outVar unions depths with hop labels and multiplicity") {
    val vl = GraphDSL.on(nodes, edges).matchLabel("Start").outVar("R", 1, 2)
    val got = vl.df.select("hops", "uid").orderBy("hops", "uid").collect()
      .map(r => (r.getInt(0), r.getString(1))).toSeq
    // depth 1: b, c; depth 2: d twice (one per path)
    assert(got === Seq((1, "b"), (1, "c"), (2, "d"), (2, "d")))
  }

  test("whereNotOut filters to sink nodes") {
    val sinks = GraphDSL.on(nodes, edges).whereNotOut("R")
    assert(sinks.df.select("uid").collect().map(_.getString(0)).toSeq === Seq("d"))
  }
}
