package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.core.Uid

/** Structured rule/condition extraction from prose — the reference's
  * planned LLM task made deterministic (`etl_implementation.md:262-273`
  * plans "Rule extraction, condition parsing" from PDF Abfallsatzung
  * documents into the schema's rule layer: DisposalRule / Condition
  * nodes with `HAS_CONDITION` / `IF_TRUE` / `IF_FALSE` / `ROUTES_TO` /
  * `DERIVED_FROM` edges, `schema.cql:64-68, 109-131`). Until a real
  * model sits in the llm slot (see [[DocExtract.StubExtractor]] /
  * [[DocExtract.LuhnExtractor]]), the extractor is a PATTERN GRAMMAR
  * over sentences — the surface forms a German disposal bylaw actually
  * uses — compiled entirely to codegen'd Catalyst expressions
  * (split/explode/regexp_extract): no UDF, no driver loop, linear in
  * corpus bytes, so the plumbing (sentence segmentation, candidate
  * schema, provenance, graph emission) is real and scale-correct and
  * only the grammar itself would be swapped for a model.
  *
  * Grammar (anchored, one candidate set per sentence):
  *   - conditional routing, two branches:
  *     `Wenn <item> <cond> ist, gehört es in den <S1>, sonst in den
  *     <S2>.` → (item, cond, if_true → S1) + (item, cond, if_false → S2)
  *   - simple routing: `<item> gehört in den <S>.`
  *   - mandate form: `<item> ist als <S> zu entsorgen.`
  *   - negations (` nicht `/`gehören nicht`) and non-rule prose
  *     (hints, hours) extract NOTHING — a rule candidate is a positive
  *     routing statement only.
  */
object RuleExtract {

  /** Disposal-stream lexicon (the reference's WasteStream domain). */
  val Streams: Seq[String] =
    Seq("Restmüll", "Biomüll", "Sondermüll", "Papierkorb", "Wertstoffhof")

  /** Condition lexicon — the attribute questions the reference's
    * decision tree asks ("Is it liquid?", `schema.cql:67`). */
  val Conditions: Seq[String] =
    Seq("flüssig", "getrocknet", "leer", "verschlossen")

  private val condAlt = Conditions.mkString("|")
  private val word = "[\\p{L}]+"
  /** `Wenn <item> <cond> ist, gehört es in den <S1>, sonst in den <S2>.` */
  private[sources] val CondPat =
    s"^Wenn (.+) ($condAlt) ist, gehört es in den ($word), sonst in den ($word)\\.$$"
  /** `<item> gehört in den <S>.` */
  private[sources] val SimplePat = s"^(.+) gehört in den ($word)\\.$$"
  /** `<item> ist als <S> zu entsorgen.` */
  private[sources] val AlsPat = s"^(.+) ist als ($word) zu entsorgen\\.$$"

  /** The candidate identity: engine uid over the full candidate key,
    * shared by the grammar path ([[candidates]]) and the model path
    * ([[ModelCodec.candidates]]) so re-extraction by EITHER is
    * idempotent against the same DisposalRule nodes (MERGE contract). */
  def ruleUid: Column = Uid.uid(concat_ws("|",
    col("name"), col("item"),
    coalesce(col("condition"), lit("")),
    coalesce(col("branch"), lit("")), col("stream")))

  /** Deterministic bylaw-prose renderer — the fixture complement of
    * [[candidates]] (as [[Pdf.pdfBytesCid]] is to the CMap reader):
    * per part row, the key picks the surface form (k%3), stream (k%5),
    * alternative stream ((k+2)%5) and condition (k%4), so a DuckDB
    * oracle regenerates the expected candidate rows from the same keys
    * without re-parsing prose. Every document carries two distractor
    * sentences (an opening-hours hint and a negated routing) that must
    * NOT extract. Pure `concat` columns — rendering is codegen too. */
  def fixtureDocs(parts: DataFrame): DataFrame = {
    val sArr = array(Streams.map(lit): _*)
    val cArr = array(Conditions.map(lit): _*)
    val k = col("p_partkey")
    val item = col("p_name")
    val stream = element_at(sArr, (k % 5 + 1).cast("int"))
    val alt = element_at(sArr, ((k + 2) % 5 + 1).cast("int"))
    val cond = element_at(cArr, (k % 4 + 1).cast("int"))
    val main = when(k % 3 === 0,
        concat(lit("Wenn "), item, lit(" "), cond,
          lit(" ist, gehört es in den "), stream,
          lit(", sonst in den "), alt, lit(".")))
      .when(k % 3 === 1, concat(item, lit(" gehört in den "), stream, lit(".")))
      .otherwise(concat(item, lit(" ist als "), stream, lit(" zu entsorgen.")))
    parts.select(
      concat(lit("satzung_"), k).as("name"),
      concat_ws(" ",
        lit("Hinweis: Öffnungszeiten siehe Aushang."),
        main,
        concat(lit("Kartons gehören nicht in den "), alt, lit("."))).as("text"))
  }

  /** Rule candidates from documents `(name, text)`: sentence-segment,
    * drop negations, run the three anchored patterns, emit one row per
    * (rule, branch). Output: (name, sent_idx, item, condition, branch,
    * stream, rule_uid) — condition/branch are null for unconditional
    * rules; rule_uid is the engine uid over the full candidate key so
    * re-extraction is idempotent (the MERGE contract).
    *
    * ONE corpus pass: the grammar is a single CASE over the sentence
    * producing an array of candidate structs (two for a conditional,
    * one for the simple/mandate forms, null → no rows) and one
    * explode — a union of per-pattern branches would scan the corpus
    * once per pattern, the wrong shape at 100 TB. */
  def candidates(docs: DataFrame): DataFrame = {
    val sents = docs
      .select(col("name"),
        posexplode(split(col("text"), "(?<=\\.)\\s+")).as(Seq("sent_idx", "sent")))
      .select(col("name"), col("sent_idx"), trim(col("sent")).as("sent"))
      .filter(length(col("sent")) > 0)
      // negative statements are not rule candidates
      .filter(!col("sent").rlike("\\bnicht\\b"))
    def x(pat: String, grp: Int) = regexp_extract(col("sent"), pat, grp)
    def cand(item: Column, condition: Column, branch: Column, stream: Column) =
      struct(item.as("item"), condition.as("condition"),
        branch.as("branch"), stream.as("stream"))
    val nul = lit(null).cast("string")
    val candArr =
      when(col("sent").rlike(CondPat), array(
        cand(x(CondPat, 1), x(CondPat, 2), lit("if_true"), x(CondPat, 3)),
        cand(x(CondPat, 1), x(CondPat, 2), lit("if_false"), x(CondPat, 4))))
      .when(!col("sent").startsWith("Wenn ") && col("sent").rlike(SimplePat),
        array(cand(x(SimplePat, 1), nul, nul, x(SimplePat, 2))))
      .when(!col("sent").startsWith("Wenn ") && col("sent").rlike(AlsPat),
        array(cand(x(AlsPat, 1), nul, nul, x(AlsPat, 2))))
    sents
      .select(col("name"), col("sent_idx"), explode(candArr).as("c"))
      .select(col("name"), col("sent_idx"), col("c.item").as("item"),
        col("c.condition").as("condition"), col("c.branch").as("branch"),
        col("c.stream").as("stream"))
      .withColumn("rule_uid", ruleUid)
  }

  /** Candidates → the reference's rule-layer graph shape
    * (`schema.cql:109-131`): DisposalRule + Condition nodes, and
    * HAS_RULE (item → rule), ROUTES_TO / IF_TRUE / IF_FALSE
    * (rule → stream), HAS_CONDITION (rule → condition) and
    * DERIVED_FROM (rule → source document) edges — all uid-keyed
    * projections ready for [[graft.graph.GraphStore]] upserts. */
  def toGraph(cands: DataFrame): (DataFrame, DataFrame) = {
    val ruleNodes = cands.select(
      lit("DisposalRule").as("label"),
      col("rule_uid").as("uid"),
      concat_ws(" ", col("item"), lit("→"), col("stream")).as("name"))
    val condNodes = cands.filter(col("condition").isNotNull)
      .select(col("condition")).distinct()
      .select(lit("Condition").as("label"),
        Uid.uid(col("condition")).as("uid"),
        col("condition").as("name"))
    val nodes = ruleNodes.unionByName(condNodes)
    val routes = cands.select(
      col("rule_uid").as("src_uid"),
      // a conditional branch routes via IF_TRUE/IF_FALSE, else ROUTES_TO
      coalesce(upper(col("branch")), lit("ROUTES_TO")).as("rel_type"),
      Uid.uid(concat(lit("WasteStream:"), col("stream"))).as("dst_uid"))
    val hasCond = cands.filter(col("condition").isNotNull)
      .select(col("rule_uid").as("src_uid"),
        lit("HAS_CONDITION").as("rel_type"),
        Uid.uid(col("condition")).as("dst_uid")).distinct()
    val hasRule = cands.select(
      Uid.uid(col("item")).as("src_uid"),
      lit("HAS_RULE").as("rel_type"),
      col("rule_uid").as("dst_uid"))
    val derived = cands.select(
      col("rule_uid").as("src_uid"),
      lit("DERIVED_FROM").as("rel_type"),
      Uid.uid(col("name")).as("dst_uid"))
    (nodes, routes.unionByName(hasCond).unionByName(hasRule).unionByName(derived))
  }
}
