package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The pattern-grammar rule extractor behind the llm slot
  * (`etl_implementation.md:262-273` → `schema.cql`'s rule layer):
  * grammar hits and non-hits, both conditional branches, negation and
  * distractor immunity, uid idempotency, and the graph emission shape.
  */
class RuleExtractSpec extends SparkSpec {
  import spark.implicits._

  private def extract(texts: (String, String)*) =
    RuleExtract.candidates(texts.toSeq.toDF("name", "text"))

  test("the three surface forms extract; conditionals emit both branches") {
    val got = extract(
      ("d1", "Altlack gehört in den Sondermüll."),
      ("d2", "Bauschutt ist als Restmüll zu entsorgen."),
      ("d3", "Wenn Farbe flüssig ist, gehört es in den Sondermüll, sonst in den Restmüll."))
      .select("name", "item", "condition", "branch", "stream")
      .collect().map(r => (r.getString(0), r.getString(1),
        Option(r.getString(2)), Option(r.getString(3)), r.getString(4))).toSet
    assert(got === Set(
      ("d1", "Altlack", None, None, "Sondermüll"),
      ("d2", "Bauschutt", None, None, "Restmüll"),
      ("d3", "Farbe", Some("flüssig"), Some("if_true"), "Sondermüll"),
      ("d3", "Farbe", Some("flüssig"), Some("if_false"), "Restmüll")))
  }

  test("negations, hints and malformed prose extract nothing") {
    val got = extract(
      ("n1", "Kartons gehören nicht in den Restmüll."),
      ("n2", "Altlack gehört nicht in den Biomüll."),
      ("n3", "Hinweis: Öffnungszeiten siehe Aushang."),
      ("n4", "Wenn Farbe bunt ist, gehört es in den Sondermüll, sonst in den Restmüll."), // unknown condition
      ("n5", "Der Wertstoffhof nimmt alles an."))
    assert(got.count() === 0)
  }

  test("multi-sentence documents keep sentence provenance; re-extraction is idempotent") {
    val doc = ("d", "Hinweis: siehe Aushang. Laub gehört in den Biomüll. Kartons gehören nicht in den Restmüll.")
    val a = extract(doc).collect()
    assert(a.length === 1)
    val r = a.head
    assert(r.getAs[Int]("sent_idx") === 1) // the hint was sentence 0
    assert(r.getAs[String]("rule_uid").length === 16)
    val b = extract(doc).collect()
    assert(a.map(_.toString).toSeq === b.map(_.toString).toSeq)
  }

  test("graph emission: rule/condition nodes, branch edges, provenance") {
    val cands = extract(
      ("d1", "Altlack gehört in den Sondermüll."),
      ("d3", "Wenn Farbe flüssig ist, gehört es in den Sondermüll, sonst in den Restmüll."))
    val (nodes, edges) = RuleExtract.toGraph(cands)
    val labels = nodes.groupBy("label").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(labels === Map("DisposalRule" -> 3L, "Condition" -> 1L))
    val byType = edges.groupBy("rel_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byType === Map(
      "ROUTES_TO" -> 1L,      // the unconditional rule
      "IF_TRUE" -> 1L, "IF_FALSE" -> 1L,
      "HAS_CONDITION" -> 2L,  // one per conditional branch rule
      "HAS_RULE" -> 3L, "DERIVED_FROM" -> 3L))
    // all edge endpoints resolve to emitted rule nodes or stable uids
    val ruleUids = nodes.filter(col("label") === "DisposalRule")
      .select("uid").as[String].collect().toSet
    val routed = edges.filter(col("rel_type").isin("ROUTES_TO", "IF_TRUE", "IF_FALSE"))
      .select("src_uid").as[String].collect().toSet
    assert(routed.subsetOf(ruleUids))
  }

  test("fixture renderer + grammar round-trip on a small key range") {
    val parts = Seq(
      (3L, "azure plum"), (4L, "misty rose"), (5L, "burnished gold"))
      .toDF("p_partkey", "p_name")
    val got = RuleExtract.candidates(RuleExtract.fixtureDocs(parts))
    // k=3: conditional (2 rows), k=4: simple, k=5: als-form
    assert(got.count() === 4)
    val k3 = got.filter(col("name") === "satzung_3")
      .select("condition", "branch", "stream").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    // k=3: condition idx 3%4=3 → verschlossen; stream 3%5=3 → Papierkorb;
    // alt (3+2)%5=0 → Restmüll
    assert(k3 === Set(
      ("verschlossen", "if_true", "Papierkorb"),
      ("verschlossen", "if_false", "Restmüll")))
  }
}
