package graft.graph

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Rule-layer semantics (SURVEY.md §1.1 rule ontology, J8, §7
  * hard-parts 5/7): disposal-rule resolution with OVERRIDES precedence,
  * multi-level decision-tree evaluation, and the AVV code hierarchy.
  *
  * All inputs are edge/node DataFrames in GraphStore shape; everything
  * here is windows + iterative joins — no driver-side row loops.
  */
object Rules {

  /** Campus rules override city rules (PDF §4.7/§7.3). Deterministic
    * total order: scope priority desc, then rule uid (SURVEY §7
    * hard-part 7). `rules` = (rule_uid, item_uid, scope, stream_uid).
    * Returns one winning rule per item.
    */
  def resolveWithOverrides(rules: DataFrame): DataFrame = {
    val prio = when(col("scope") === "campus", 2)
      .when(col("scope") === "city", 1).otherwise(0)
    val w = Window.partitionBy("item_uid").orderBy(desc("scope_priority"), asc("rule_uid"))
    rules.withColumn("scope_priority", prio)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .drop("rn", "scope_priority")
  }

  /** Decision-tree evaluation to terminal streams (PDF §4.8):
    * `(Condition)-[:HAS_OPTION]->(ConditionValue)` then either
    * `IMPLIES_STREAM` (terminal) or `NEXT_CHECK` (descend). `answers` =
    * (case_id, condition_key, value); evaluation walks each case through
    * its chosen options until a stream is implied. Iterative join with a
    * max-depth guard — cycle-safe (SURVEY §7 hard-part 5).
    *
    * options = (condition_key, value, implies_stream_uid, next_condition_key)
    * start   = (case_id, condition_key)      — the root check per case
    * Returns (case_id, stream_uid, depth); cases that never terminate
    * within maxDepth are absent (the validator flags them).
    */
  def evaluateDecisionTree(start: DataFrame, options: DataFrame, answers: DataFrame,
                           maxDepth: Int = 20): DataFrame = {
    var frontier = start.select(col("case_id"), col("condition_key"), lit(0).as("depth"))
    var results = frontier.limit(0)
      .select(col("case_id"), lit("").as("stream_uid"), col("depth"))
    var d = 0
    while (d < maxDepth && !frontier.isEmpty) {
      val stepped = frontier
        .join(answers, Seq("case_id", "condition_key"))
        .join(options, Seq("condition_key", "value"))
        .select(col("case_id"), col("implies_stream_uid"), col("next_condition_key"),
          (col("depth") + 1).as("depth"))
        .localCheckpoint(true)
      results = results.unionByName(
        stepped.filter(col("implies_stream_uid").isNotNull)
          .select(col("case_id"), col("implies_stream_uid").as("stream_uid"), col("depth")))
        .localCheckpoint(true)
      frontier = stepped.filter(col("implies_stream_uid").isNull &&
          col("next_condition_key").isNotNull)
        .select(col("case_id"), col("next_condition_key").as("condition_key"), col("depth"))
      d += 1
    }
    results
  }

  /** AVV hierarchy derivation (J7, `schema.cql:26-57,119-122`): codes
    * like "08 01 11*" derive level (by length), hazard (trailing '*',
    * PDF §6) and parent chain "08 01 11*" → "08 01" → "08". Input:
    * (code); output adds (level, is_hazardous, parent_code).
    */
  def avvHierarchy(codes: DataFrame): DataFrame = {
    val clean = regexp_replace(col("code"), "\\*$", "")
    val level = when(length(trim(clean)) <= 2, 1)
      .when(length(trim(clean)) <= 5, 2).otherwise(3)
    codes.select(
      col("code"),
      level.as("level"),
      col("code").endsWith("*").as("is_hazardous"),
      when(level === 3, substring(col("code"), 1, 5))
        .when(level === 2, substring(col("code"), 1, 2))
        .otherwise(lit(null)).as("parent_code"))
  }

  /** Hazard roll-up over the 3-level AVV hierarchy (`schema.cql:31`
    * `is_hazardous`, PDF §6: the trailing '*' marks hazardous
    * entries): a code CONTAINS hazard when itself or any descendant is
    * starred — the derived flag the reference spec'd but never
    * exercised. The hierarchy is exactly 3 levels by construction
    * (avvHierarchy), so propagation is two grouped boolean ors (one
    * per parent hop), not a fixpoint; each is one keyed aggregate +
    * one left join — 100 TB-safe by shape. Input: avvHierarchy output
    * (code, level, is_hazardous, parent_code); output adds
    * `contains_hazard`. */
  def avvHazardRollup(hier: DataFrame): DataFrame = {
    def up(children: DataFrame, flag: Column): DataFrame = children
      .filter(col("parent_code").isNotNull)
      .groupBy(col("parent_code").as("code"))
      .agg(max(flag).as("desc_haz")) // bool max = any
    val l3 = hier.filter(col("level") === 3)
      .withColumn("contains_hazard", col("is_hazardous"))
    val l2 = hier.filter(col("level") === 2)
      .join(up(l3, col("contains_hazard")), Seq("code"), "left_outer")
      .withColumn("contains_hazard",
        col("is_hazardous") || coalesce(col("desc_haz"), lit(false)))
      .drop("desc_haz")
    val l1 = hier.filter(col("level") === 1)
      .join(up(l2, col("contains_hazard")), Seq("code"), "left_outer")
      .withColumn("contains_hazard",
        col("is_hazardous") || coalesce(col("desc_haz"), lit(false)))
      .drop("desc_haz")
    l3.unionByName(l2).unionByName(l1)
  }

  /** The rolled-up hierarchy as graph shape (`schema.cql:26-57,
    * 119-122` + PDF §4.5 hazard layer): AVVCode nodes carrying
    * level/is_hazardous/contains_hazard, HAS_PARENT edges up the code
    * chain, and IMPLIES_HAZARD edges from every starred code to the
    * singleton HazardType node — uid-keyed projections ready for
    * [[GraphStore]] upserts, same contract as
    * [[graft.sources.RuleExtract.toGraph]]. */
  def avvGraph(rollup: DataFrame): (DataFrame, DataFrame) = {
    val uid = (c: Column) => graft.core.Uid.uid(c)
    val codeNodes = rollup.select(
      lit("AVVCode").as("label"), uid(concat(lit("AVVCode:"), col("code"))).as("uid"),
      col("code").as("name"), col("level"),
      col("is_hazardous"), col("contains_hazard"))
    val hazardNode = rollup.sparkSession.range(1).toDF()
      .select(lit("HazardType").as("label"),
        uid(lit("HazardType:starred")).as("uid"),
        lit("starred").as("name"), lit(0).as("level"),
        lit(false).as("is_hazardous"), lit(false).as("contains_hazard"))
    val hasParent = rollup.filter(col("parent_code").isNotNull)
      .select(uid(concat(lit("AVVCode:"), col("code"))).as("src_uid"),
        lit("HAS_PARENT").as("rel_type"),
        uid(concat(lit("AVVCode:"), col("parent_code"))).as("dst_uid"))
    val implies = rollup.filter(col("is_hazardous"))
      .select(uid(concat(lit("AVVCode:"), col("code"))).as("src_uid"),
        lit("IMPLIES_HAZARD").as("rel_type"),
        uid(lit("HazardType:starred")).as("dst_uid"))
    (codeNodes.unionByName(hazardNode),
      hasParent.unionByName(implies))
  }

  /** ALLOWS_AVV consistency validator (PDF §4.10): every WasteItem
    * classified under an AVV code must route to at least one stream
    * that allows/requires that code — violations are the rule-set
    * errors. items_avv = (item_uid, code); item_stream = (item_uid,
    * stream_uid); stream_avv = (stream_uid, code). Returns violating
    * (item_uid, code) pairs.
    */
  def avvConsistencyViolations(itemsAvv: DataFrame, itemStream: DataFrame,
                               streamAvv: DataFrame): DataFrame =
    itemsAvv
      .join(itemStream.join(streamAvv, "stream_uid").select("item_uid", "code"),
        Seq("item_uid", "code"), "left_anti")
}
