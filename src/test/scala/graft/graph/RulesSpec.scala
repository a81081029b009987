package graft.graph

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Rule-layer scenario tests — the PDF §7 reasoning flows (SURVEY §5.6)
  * plus AVV hierarchy and DDL-registry behavior. */
class RulesSpec extends SparkSpec {
  import spark.implicits._

  test("overrides: campus rule beats city rule (PDF §7.3 toothbrush)") {
    val rules = Seq(
      ("r_city", "item_toothbrush", "city", "s_restmuell"),
      ("r_campus", "item_toothbrush", "campus", "s_elektro"),
      ("r_only", "item_banana", "city", "s_bio"))
      .toDF("rule_uid", "item_uid", "scope", "stream_uid")
    val won = Rules.resolveWithOverrides(rules)
      .select("item_uid", "rule_uid", "stream_uid").collect()
      .map(r => r.getString(0) -> (r.getString(1), r.getString(2))).toMap
    assert(won("item_toothbrush") === ("r_campus", "s_elektro"))
    assert(won("item_banana") === ("r_only", "s_bio"))
  }

  test("overrides: deterministic tie-break by rule_uid") {
    val rules = Seq(
      ("r_b", "i1", "city", "s2"),
      ("r_a", "i1", "city", "s1"))
      .toDF("rule_uid", "item_uid", "scope", "stream_uid")
    val won = Rules.resolveWithOverrides(rules).collect()
    assert(won.length === 1)
    assert(won(0).getAs[String]("rule_uid") === "r_a")
  }

  test("decision tree: single-step terminal (PDF §7.1 banana → Biotonne)") {
    val start = Seq(("case_banana", "c_organic")).toDF("case_id", "condition_key")
    val options = Seq(
      ("c_organic", "yes", "s_bio", null),
      ("c_organic", "no", "s_rest", null))
      .toDF("condition_key", "value", "implies_stream_uid", "next_condition_key")
    val answers = Seq(("case_banana", "c_organic", "yes"))
      .toDF("case_id", "condition_key", "value")
    val out = Rules.evaluateDecisionTree(start, options, answers).collect()
    assert(out.length === 1)
    assert(out(0).getAs[String]("stream_uid") === "s_bio")
    assert(out(0).getAs[Int]("depth") === 1)
  }

  test("decision tree: multi-level chain (PDF §7.2 paint bucket)") {
    // Is it empty? -no-> is it dried? -yes-> Restmüll; -no-> Schadstoff
    val start = Seq(("case_paint", "c_empty")).toDF("case_id", "condition_key")
    val options = Seq(
      ("c_empty", "yes", "s_verpackung", null),
      ("c_empty", "no", null, "c_dried"),
      ("c_dried", "yes", "s_rest", null),
      ("c_dried", "no", "s_schadstoff", null))
      .toDF("condition_key", "value", "implies_stream_uid", "next_condition_key")
    val answers = Seq(
      ("case_paint", "c_empty", "no"),
      ("case_paint", "c_dried", "no"))
      .toDF("case_id", "condition_key", "value")
    val out = Rules.evaluateDecisionTree(start, options, answers).collect()
    assert(out.length === 1)
    assert(out(0).getAs[String]("stream_uid") === "s_schadstoff")
    assert(out(0).getAs[Int]("depth") === 2)
  }

  test("decision tree: cyclic graph terminates (maxDepth guard)") {
    val start = Seq(("c1", "ck_a")).toDF("case_id", "condition_key")
    val options = Seq(
      ("ck_a", "loop", null, "ck_b"),
      ("ck_b", "loop", null, "ck_a"))
      .toDF("condition_key", "value", "implies_stream_uid", "next_condition_key")
    val answers = Seq(("c1", "ck_a", "loop"), ("c1", "ck_b", "loop"))
      .toDF("case_id", "condition_key", "value")
    val out = Rules.evaluateDecisionTree(start, options, answers, maxDepth = 6)
    assert(out.count() === 0) // never terminates → flagged absent, no hang
  }

  test("AVV hierarchy: level, hazard star, parent chain") {
    val codes = Seq("08 01 11*", "08 01", "08", "20 01 38").toDF("code")
    val h = Rules.avvHierarchy(codes).collect()
      .map(r => r.getString(0) -> ((r.getInt(1), r.getBoolean(2), r.getString(3)))).toMap
    assert(h("08 01 11*") === ((3, true, "08 01")))
    assert(h("08 01") === ((2, false, "08")))
    assert(h("08") === ((1, false, null)))
    assert(h("20 01 38") === ((3, false, "20 01")))
  }

  test("AVV hazard roll-up: the star propagates up HAS_PARENT; clean branches stay clean") {
    // two level-1 families: '08' has a starred leaf, '20' is clean
    val codes = Seq("08 01 11*", "08 01 13", "08 01", "08 03", "08",
      "20 01 38", "20 01", "20").toDF("code")
    val roll = Rules.avvHazardRollup(Rules.avvHierarchy(codes)).collect()
      .map(r => r.getAs[String]("code") ->
        ((r.getAs[Boolean]("is_hazardous"), r.getAs[Boolean]("contains_hazard")))).toMap
    assert(roll("08 01 11*") === ((true, true)))
    assert(roll("08 01 13") === ((false, false)))
    assert(roll("08 01") === ((false, true)))  // starred child
    assert(roll("08 03") === ((false, false))) // sibling branch untouched
    assert(roll("08") === ((false, true)))     // starred grandchild
    assert(roll("20 01") === ((false, false)))
    assert(roll("20") === ((false, false)))
    // graph emission: AVVCode nodes carry the derived flags, HAS_PARENT
    // follows the chain, IMPLIES_HAZARD only from the starred code
    val (nodes, edges) = Rules.avvGraph(
      Rules.avvHazardRollup(Rules.avvHierarchy(codes)))
    assert(nodes.filter($"label" === "AVVCode").count() === 8L)
    assert(nodes.filter($"label" === "HazardType").count() === 1L)
    val byType = edges.groupBy("rel_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byType("HAS_PARENT") === 6L)    // 3 leaves + 3 level-2s
    assert(byType("IMPLIES_HAZARD") === 1L)
    // the starred leaf's IMPLIES_HAZARD points at the HazardType node
    val hazUid = nodes.filter($"label" === "HazardType")
      .select("uid").as[String].head()
    val imp = edges.filter($"rel_type" === "IMPLIES_HAZARD")
      .select("dst_uid").as[String].head()
    assert(imp === hazUid)
  }

  test("AVV consistency: item classified under code with no allowing stream") {
    val itemsAvv = Seq(("i1", "08 01 11*"), ("i2", "20 01 38")).toDF("item_uid", "code")
    val itemStream = Seq(("i1", "s1"), ("i2", "s2")).toDF("item_uid", "stream_uid")
    val streamAvv = Seq(("s1", "08 01 11*")).toDF("stream_uid", "code")
    val bad = Rules.avvConsistencyViolations(itemsAvv, itemStream, streamAvv).collect()
    assert(bad.map(r => (r.getString(0), r.getString(1))).toSet === Set(("i2", "20 01 38")))
  }

  test("schema registry: parses constraints and indexes, skips comments") {
    val ddl =
      """// comment line
        |CREATE CONSTRAINT waste_item_uid IF NOT EXISTS FOR (w:WasteItem) REQUIRE w.uid IS UNIQUE;
        |CREATE INDEX waste_item_synonyms IF NOT EXISTS FOR (w:WasteItem) ON (w.synonyms);
        |CREATE CONSTRAINT facility_uid IF NOT EXISTS FOR (f:Facility) REQUIRE f.uid IS UNIQUE; // trailing
        |CREATE SOMETHING unparseable;
        |""".stripMargin
    val (rules, unparsed) = SchemaRegistry.parse(ddl)
    assert(rules === Seq(
      SchemaRegistry.UniqueConstraint("waste_item_uid", "WasteItem", "uid"),
      SchemaRegistry.Index("waste_item_synonyms", "WasteItem", "synonyms"),
      SchemaRegistry.UniqueConstraint("facility_uid", "Facility", "uid")))
    assert(unparsed === Seq("CREATE SOMETHING unparseable"))
    // idempotent re-apply
    assert(SchemaRegistry.apply(ddl + ddl) === SchemaRegistry.apply(ddl))
  }

  test("built-in ontology schema: 14 uniqueness constraints + 5 indexes") {
    // (BASELINE.md says 13, but counting schema.cql:18-98 gives 14 —
    // uid+name pairs on WasteItem and WasteStream; 14 is the true count.)
    val rules = SchemaRegistry.builtin
    assert(rules.collect { case c: SchemaRegistry.UniqueConstraint => c }.size === 14)
    assert(rules.collect { case i: SchemaRegistry.Index => i }.size === 5)
    // one constraint per ontology label with a uid/key/code identity
    val labels = rules.collect { case c: SchemaRegistry.UniqueConstraint => c.label }.toSet
    assert(labels === Set("WasteItem", "WasteStream", "AVVCode", "DisposalRule",
      "Condition", "Instruction", "Tip", "Container", "Building", "Room",
      "Facility", "Source"))
  }

  test("schema registry: uniqueness validation flags duplicates") {
    val ddl = "CREATE CONSTRAINT n_uid IF NOT EXISTS FOR (n:N) REQUIRE n.uid IS UNIQUE;"
    val nodes = Seq(("N", "u1"), ("N", "u1"), ("N", "u2"), ("M", "u1"))
      .toDF("label", "uid")
    val v = SchemaRegistry.validate(SchemaRegistry.apply(ddl), nodes).collect()
    assert(v.length === 1)
    assert(!v(0).getAs[Boolean]("ok"))
    assert(v(0).getAs[Long]("total") === 3)
    assert(v(0).getAs[Long]("distinct_vals") === 2)
  }
}
