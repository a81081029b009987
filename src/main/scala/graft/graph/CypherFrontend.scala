package graft.graph

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, BooleanType, DataType, DoubleType, LongType, StringType, StructType}

/** Cypher-string front-end over node/edge DataFrames — the reference's
  * arbitrary-Cypher query API (`neo4j_db.py:93-106`) for its READ
  * surface, parsed and compiled to the same DataFrame plans the typed
  * [[GraphDSL]] builds, so Catalyst optimizes the whole chain (label
  * filters push into the node scan, hops are uid equi-joins, implicit
  * Cypher grouping is one hash aggregate).
  *
  * Supported subset = every read query shape the reference issues or
  * documents (`etl_implementation.md:229-257`, `neo4j_db.py:29-157`):
  * `MATCH` / `OPTIONAL MATCH` chains with labels, property maps and
  * directed OR undirected relationships — `-[:T]-` compiles over the
  * symmetric edge closure, one keyed join, walk orientation defining
  * the bound rel's src/dst (incl. `|` type alternation,
  * comma-separated chains joined on shared variables, bounded
  * variable-length `-[:R*lo..hi]->` hops compiled to the same
  * unrolled-join union as `GraphDSL.outVar` — walk semantics, depth
  * capped at 10 — and unbounded `-[:R*]->` compiled to the
  * `Traversal.reachFixpoint` reachability closure, distinct pairs),
  * `p = shortestPath((a)-[:T*..k]->(b))` with `length(p)` (bounded
  * unrolled BFS: per-depth distinct level sets + one min-depth
  * aggregate), general named paths `p = (a)-[:T*1..2]->(b)` whose
  * `length(p)` is the walk's hop count (fixed hops count 1, a
  * var-length hop its unrolled depth — a constant column per k-fold
  * chain, zero data cost), per-clause
  * `WHERE` with Cypher scoping (an OPTIONAL MATCH's predicate filters
  * its matches inside the left join, never the null-padded rows) over
  * comparisons / boolean ops / string
  * predicates (`CONTAINS`/`STARTS WITH`/`ENDS WITH`, plus `=~`
  * full-match regex — anchored rlike) / `IS [NOT] NULL` / `e IN list`
  * / `XOR` / `[NOT] (n)-[:R]->()`
  * pattern predicates, chained `WITH items [WHERE pred]` pipeline
  * stages (projection or implicit-grouping aggregation; the WHERE is
  * HAVING; later MATCHes join on the carried variables, or correlate
  * via WHERE on a scalar alias), `UNWIND list AS x` (literal, `$param`
  * list, or a `collect(...)` alias), `CASE` expressions (searched and
  * simple forms), list literals, postfix `[i]` indexing of any list
  * expression (0-based, negative from the end), list comprehensions
  * `[x IN list WHERE p | e]` and `reduce(acc = init, x IN list | e)`
  * (codegen'd `filter`/`transform`/`aggregate` higher-order
  * functions), arithmetic (`+ - * / %`), the scalar
  * function battery ([[scalarFns]]: coalesce, case/trim/substring/
  * replace/split/left/right string ops, casts, abs/round/floor/ceil,
  * size — chars for strings, elements for lists, by shape — id,
  * range, properties/keys), `RETURN [DISTINCT]`
  * with `AS` aliases, `count(*)` /
  * `count([DISTINCT] n)` / `min` / `max` / `sum` / `avg` / `collect`,
  * `labels(n)[0]`, `type(r)`, property access, `$param` substitution,
  * `ORDER BY ... [ASC|DESC]` (including non-returned expressions,
  * which sort pre-projection), `SKIP`, `LIMIT`. Write statements
  * (`MERGE` templates) compile through [[CypherWrite]] to the
  * [[GraphStore]] upsert sinks; other writes (`SET`, `DELETE`) are
  * rejected with a pointer.
  *
  * Node tables are `(label, uid, <props...>)`, edge tables
  * `(src_uid, rel_type, dst_uid, <props...>)` — the engine-wide graph
  * shape. Aggregation follows Cypher semantics: the presence of any
  * aggregate in RETURN groups by all non-aggregated return items.
  */
object CypherFrontend {

  // ---------------------------------------------------------------- AST

  private sealed trait Expr
  private case class EVar(name: String) extends Expr
  private case class EProp(v: String, key: String) extends Expr
  private case class ELit(v: Any) extends Expr
  private case class EParam(name: String) extends Expr
  private case class EAgg(fn: String, arg: Option[Expr], distinct: Boolean) extends Expr
  private case class ELabels0(v: String) extends Expr
  private case class EType(v: String) extends Expr
  /** `[e1, e2, ...]` list literal. */
  private case class EList(items: Seq[Expr]) extends Expr
  /** `CASE [operand] WHEN cond THEN value ... [ELSE e] END`: searched
    * form carries Pred conditions (operand = None), simple form
    * compares the operand to each WHEN value. */
  private case class ECase(operand: Option[Expr],
                           whens: Seq[(Either[Pred, Expr], Expr)],
                           els: Option[Expr]) extends Expr
  /** Binary arithmetic `+ - * / %` (numeric semantics; Cypher's
    * string `+` is CONTAINS-era sugar we don't emulate). */
  private case class EArith(op: String, l: Expr, r: Expr) extends Expr
  /** Whitelisted scalar function call (see [[scalarFns]]). */
  private case class EFn(fn: String, args: Seq[Expr]) extends Expr
  /** Postfix list index `base[i]` — Cypher 0-based; a negative index
    * counts from the end (both map to `element_at`). */
  private case class EIndex(base: Expr, idx: Expr) extends Expr
  /** `list[lo..hi]` range slice — Cypher 0-based, end-EXCLUSIVE, open
    * ends allowed (`[..2]`, `[1..]`), negatives count from the end. */
  private case class ESlice(base: Expr, lo: Option[Expr], hi: Option[Expr]) extends Expr
  /** `{k: expr, ...}` map literal — compiles to a struct (Cypher maps
    * are heterogeneous; a Spark map would force one value type). */
  private case class EMapLit(entries: Seq[(String, Expr)]) extends Expr
  /** `[x IN list WHERE p | e]` list comprehension — filter and/or map;
    * compiles to the codegen'd `filter`/`transform` higher-order
    * functions with `x` bound as a lambda variable. */
  private case class EComp(v: String, list: Expr, where: Option[Pred],
                           map: Option[Expr]) extends Expr
  /** `reduce(acc = init, x IN list | body)` — compiles to the
    * `aggregate` higher-order function. */
  private case class EReduce(acc: String, init: Expr, v: String,
                             list: Expr, body: Expr) extends Expr
  /** `v {.k1, .k2}` map projection — the selected subset of
    * properties(v), same string-valued map contract. */
  private case class EMapProj(v: String, keys: Seq[String]) extends Expr
  /** `COUNT { (v)-[:T]->(:L) }` subquery expression (Neo4j 5's
    * counting sibling of EXISTS {}): the per-row match count of the
    * pattern. Compiles to a pre-joined per-uid count column —
    * one grouped count of the (label-filtered) edge set, one left
    * join, coalesce 0. */
  private case class ECountSub(v: String, types: Seq[String], forward: Boolean,
                               targetLabel: Option[String],
                               undirected: Boolean = false) extends Expr
  /** `COUNT { (a)-[:X]->(b)-[:Y]->(c) [, chains] [WHERE pred] }` —
    * the multi-hop counting subquery: the number of MATCHES (walks)
    * of the pattern per binding of the shared variables. Compiles to
    * one grouped count of the compiled pattern frame, left-joined on
    * the shared keys (zero for no matches). */
  private case class ECountChain(chains: Seq[Chain], where: Option[Pred]) extends Expr
  /** `COLLECT { [MATCH] chains [WHERE p] RETURN expr [ORDER BY ...]
    * [LIMIT n] }` (Neo4j 5.6's list-building subquery): the inner
    * RETURN values collected into one list per binding of the shared
    * variables — the Graph-RAG per-entity list builder. Compiles to
    * ONE ordered window collect over the compiled pattern frame +
    * one left join (empty list for no matches), never per-row
    * subquery execution. Element order: the inner ORDER BY keys, the
    * returned value appended as a final tiebreaker (deterministic
    * engine choice — Neo4j leaves tie order unspecified); with no
    * ORDER BY, ascending by value. */
  private case class ECollect(chains: Seq[Chain], where: Option[Pred],
                              ret: Expr, orderBy: Seq[(Expr, Boolean)],
                              limit: Option[Long]) extends Expr
  /** A pattern predicate / EXISTS subquery used as a boolean VALUE —
    * `RETURN exists((a)-[:R]->(b))`, `EXISTS { }` in a CASE RESULT or
    * any other expression position. Rides the SAME pre-joined flag
    * columns the predicate positions use (patternsE/existsChainsE find
    * it, predCol resolves it), so the 100 TB cost stays one
    * DISTINCT-probe left join per distinct pattern — never per-row
    * subquery execution. The bare pattern-as-list-of-paths value form
    * stays refused (its value is a path list, not a boolean). */
  private case class EPredVal(p: Pred) extends Expr

  private sealed trait Pred
  private case class PCmp(op: String, l: Expr, r: Expr) extends Pred
  private case class PStr(op: String, l: Expr, r: Expr) extends Pred
  private case class PAnd(l: Pred, r: Pred) extends Pred
  private case class POr(l: Pred, r: Pred) extends Pred
  /** Cypher XOR (precedence between OR and AND). */
  private case class PXor(l: Pred, r: Pred) extends Pred
  private case class PNot(p: Pred) extends Pred
  private case class PIsNull(e: Expr, negated: Boolean) extends Pred
  /** Bare boolean expression in predicate position (`WHERE flag`,
    * `WHERE exists(n.prop)`) — Cypher truthiness is boolean-only:
    * compiles to `expr = true`, so a null stays null and filters out. */
  private case class PBoolE(e: Expr) extends Pred
  /** `e IN list` — literal/param lists compile to `isin` (pushdown-
    * friendly), column-valued lists to `array_contains`. */
  private case class PIn(l: Expr, r: Expr) extends Pred
  /** (v)-[:T1|T2]->() / ()<-[:T]-(v) existence predicate. */
  /** Single-hop pattern predicate `(v)-[:T]->(target)`. `targetVar`
    * is the target's variable name when one is written — if that
    * variable is BOUND in the outer frame the predicate correlates
    * both endpoints (edge-pair probe); unbound names are existential
    * (same as `()`). */
  private case class PPattern(v: String, types: Seq[String], forward: Boolean,
                              targetLabel: Option[String],
                              undirected: Boolean = false,
                              targetVar: Option[String] = None) extends Pred
  /** `n:Label` label predicate in WHERE. */
  private case class PHasLabel(v: String, label: String) extends Pred
  /** `EXISTS { (a)-[:X]->(b)-[:Y]->(c) [, chains] [WHERE pred] }` —
    * the MULTI-HOP existential subquery (single-hop keeps the
    * [[PPattern]] fast path). Compiles to a semi/anti join of the
    * compiled pattern frame on every variable shared with the outer
    * scope. Same walk semantics as MATCH (no relationship-uniqueness
    * constraint — the engine-wide divergence documented for
    * var-length paths). */
  private case class PExistsChain(chains: Seq[Chain], where: Option[Pred]) extends Pred
  /** `all/any/none/single(x IN list WHERE p)` quantified list
    * predicates — compile to a size() over the `filter` higher-order
    * function (codegen'd, no explode). */
  private case class PQuant(q: String, v: String, list: Expr,
                            where: Pred) extends Pred

  private case class NodePat(v: Option[String], label: Option[String],
                             props: Map[String, Expr])
  /** hi marker for `-[:R*]->` (unbounded reachability). */
  private val Unbounded = Int.MaxValue
  /** `varLen = Some((lo, hi))` for `-[:R*lo..hi]->` bounded
    * variable-length relationships; `hi == Unbounded` for `*`. */
  private case class RelPat(v: Option[String], types: Seq[String], forward: Boolean,
                            varLen: Option[(Int, Int)] = None,
                            /** `-[:T]-` both-ways match: compiled over
                              * the symmetric edge closure with
                              * `forward = true`. */
                            undirected: Boolean = false,
                            /** `-[r:T {key: val}]->` relationship
                              * property map — equality filters on the
                              * edge frame's columns. */
                            props: Map[String, Expr] = Map.empty)
  private case class Chain(head: NodePat, hops: Seq[(RelPat, NodePat)])
  /** One MATCH / OPTIONAL MATCH clause: comma chains + its own WHERE —
    * Cypher scopes a WHERE to the clause it follows, which matters for
    * OPTIONAL MATCH (the predicate filters the MATCHES, it must not
    * drop null-padded rows post-join). */
  private case class MatchClause(chains: Seq[Chain], optional: Boolean,
                                 where: Option[Pred],
                                 /** `p = shortestPath((a)-[:T*..k]->(b))`:
                                   * the bound path variable. */
                                 shortest: Option[String] = None,
                                 /** allShortestPaths: keep EVERY walk
                                   * tied at the min depth (one row per
                                   * path), not one row per pair. */
                                 shortestAll: Boolean = false,
                                 /** `p = (a)-[:T*1..2]->(b)`: a named
                                   * (non-shortest) path on the FIRST
                                   * chain; only `length(p)` projects. */
                                 named: Option[String] = None)
  private case class RetItem(expr: Expr, alias: Option[String], text: String)
  /** RETURN-level ORDER BY key: `ref` (the token text) matches output
    * items/aliases; `expr` sorts pre-projection when it doesn't. */
  private case class OrderKey(expr: Expr, ref: String, asc: Boolean)
  /** One `WITH items [WHERE pred]` pipeline stage: projects/aggregates
    * the rows so far, optionally filters the projected frame (the
    * post-aggregation WHERE = SQL HAVING), then later MATCH clauses
    * join against the carried variables. */
  /** WITH sub-clauses in openCypher order: projection → ORDER BY →
    * SKIP/LIMIT → WHERE (the WHERE filters the paginated frame). Order
    * keys are expressions over the projected columns. */
  private case class WithStage(distinct: Boolean, items: Seq[RetItem],
                               orderBy: Seq[(Expr, Boolean)],
                               skip: Option[Long], limit: Option[Long],
                               where: Option[Pred],
                               star: Boolean = false)
  /** Reading clauses compose as a PIPELINE of stages (openCypher's
    * "query is a sequence of clauses, each feeding the next"): any
    * interleaving of MATCH groups, WITH projections, and UNWINDs,
    * terminated by one RETURN. */
  private sealed trait Stage
  private case class SMatch(cl: MatchClause) extends Stage
  private case class SWith(ws: WithStage) extends Stage
  private case class SUnwind(e: Expr, alias: String) extends Stage
  /** `CALL { <subquery> }` subquery stage. `imports` empty = the
    * UNCORRELATED form: compiled in its own scope; at the pipeline
    * head it seeds the frame, mid-pipeline its rows cross-multiply
    * the incoming ones (Neo4j's per-row execution of an import-free
    * block). `imports` non-empty = the CORRELATED form
    * `CALL { WITH a, b ... }` (openCypher's importing WITH — bare
    * variable references only): the inner plan runs once over the
    * DISTINCT import bindings and joins back on the correlation key,
    * with per-binding aggregate grouping and per-binding
    * ORDER BY + SKIP/LIMIT via a row_number window — the distributed
    * form of per-row subquery execution (the Graph-RAG per-item
    * top-k retrieval idiom). */
  private case class SCall(inner: Query, imports: Seq[String] = Nil) extends Stage
  private case class Query(stages: Seq[Stage],
                           distinct: Boolean, items: Seq[RetItem],
                           orderBy: Seq[OrderKey], skip: Option[Long],
                           limit: Option[Long],
                           star: Boolean = false)

  // ---------------------------------------------------------- tokenizer

  private[graph] sealed trait Tok { def text: String }
  private[graph] case class TId(text: String) extends Tok // identifier (incl. backticked)
  private[graph] case class TKw(text: String) extends Tok // uppercased keyword form
  private[graph] case class TStr(text: String) extends Tok
  private[graph] case class TNum(text: String) extends Tok
  private[graph] case class TSym(text: String) extends Tok

  private val keywords = Set("MATCH", "WHERE", "RETURN", "ORDER", "BY", "ASC",
    "DESC", "LIMIT", "SKIP", "AND", "OR", "NOT", "XOR", "DISTINCT", "AS",
    "CONTAINS", "STARTS", "ENDS", "WITH", "IS", "NULL", "TRUE", "FALSE",
    "IN", "MERGE", "SET", "DELETE", "DETACH", "CREATE", "REMOVE", "EXISTS",
    "OPTIONAL", "ON", "CASE", "WHEN", "THEN", "ELSE", "END", "UNWIND",
    "UNION", "ALL")

  /** Whitelisted Cypher scalar functions (Neo4j's everyday battery),
    * each compiling to one codegen'd Catalyst function. Divergences,
    * documented: `id(n)` returns the engine's string uid (Neo4j's
    * numeric ids are storage-internal); `size` is list-size for list
    * literals and string-length otherwise. */
  private val scalarFns = Set("coalesce", "tolower", "toupper", "tostring",
    "tointeger", "tofloat", "toboolean", "substring", "replace", "split",
    "trim", "ltrim", "rtrim", "left", "right", "abs", "round", "floor",
    "ceil", "size", "id", "length", "range", "properties", "keys", "head",
    "last", "exists", "nodes", "relationships", "reverse", "labels",
    "startnode", "endnode")

  private[graph] def tokenize(src: String): Vector[Tok] = {
    val out = Vector.newBuilder[Tok]
    var i = 0
    val n = src.length
    while (i < n) {
      val c = src(i)
      if (c.isWhitespace) i += 1
      else if (c == '/' && i + 1 < n && src(i + 1) == '/') {
        while (i < n && src(i) != '\n') i += 1
      } else if (c == '`') {
        val j = src.indexOf('`', i + 1)
        require(j > 0, s"unterminated backtick identifier at $i")
        out += TId(src.substring(i + 1, j)); i = j + 1
      } else if (c == '\'' || c == '"') {
        val sb = new StringBuilder; i += 1
        while (i < n && src(i) != c) {
          if (src(i) == '\\' && i + 1 < n) { sb.append(src(i + 1)); i += 2 }
          else { sb.append(src(i)); i += 1 }
        }
        require(i < n, "unterminated string literal")
        out += TStr(sb.toString); i += 1
      } else if (c.isDigit) {
        val j0 = i
        while (i < n && (src(i).isDigit || src(i) == '.')) i += 1
        out += TNum(src.substring(j0, i))
      } else if (c.isLetter || c == '_') {
        val j0 = i
        while (i < n && (src(i).isLetterOrDigit || src(i) == '_')) i += 1
        val w = src.substring(j0, i)
        if (keywords(w.toUpperCase)) out += TKw(w.toUpperCase) else out += TId(w)
      } else {
        val two = if (i + 1 < n) src.substring(i, i + 2) else ""
        if (Set("<>", "<=", ">=", "->", "<-", "=~").contains(two)) { out += TSym(two); i += 2 }
        else { out += TSym(c.toString); i += 1 }
      }
    }
    out.result()
  }

  // ------------------------------------------------------------- parser

  private final class Parser(toks: Vector[Tok]) {
    private var pos = 0
    private def peek: Option[Tok] = toks.lift(pos)
    private def next(): Tok = { val t = toks(pos); pos += 1; t }
    private def atKw(kw: String): Boolean = peek.exists { case TKw(k) => k == kw; case _ => false }
    private def atSym(s: String): Boolean = peek.exists { case TSym(x) => x == s; case _ => false }
    private def eatKw(kw: String): Unit =
      require(atKw(kw) && { pos += 1; true }, s"expected $kw at token $pos (${peek.map(_.text)})")
    private def eatSym(s: String): Unit =
      require(atSym(s) && { pos += 1; true }, s"expected '$s' at token $pos (${peek.map(_.text)})")
    private def ident(): String = next() match {
      case TId(t) => t
      case t => sys.error(s"expected identifier, got '${t.text}'")
    }

    def query(allowEmptyStages: Boolean = false): Query = {
      for (w <- Seq("MERGE", "SET", "DELETE", "DETACH", "CREATE", "REMOVE"))
        require(!toks.exists { case TKw(k) => k == w; case _ => false },
          s"$w is a write clause: MERGE templates compile via " +
            "graft.graph.CypherWrite.merge; other writes are the " +
            "graft.graph.GraphStore sinks' job")
      def matchClause(optional: Boolean): MatchClause = {
        eatKw("MATCH")
        // `p = shortestPath((a)-[:T*lo..hi]->(b))` — one var-length hop
        if (peek.exists(_.isInstanceOf[TId]) &&
            toks.lift(pos + 1).exists(_.text == "=") &&
            toks.lift(pos + 2).exists(t => t.isInstanceOf[TId] &&
              (t.text.equalsIgnoreCase("shortestPath") ||
                t.text.equalsIgnoreCase("allShortestPaths")))) {
          val pv = ident(); eatSym("=")
          val all = ident().equalsIgnoreCase("allShortestPaths")
          eatSym("(")
          val ch = chain()
          eatSym(")")
          require(ch.hops.size == 1 && ch.hops.head._1.varLen.isDefined,
            "shortestPath needs exactly one var-length relationship, " +
              "e.g. shortestPath((a)-[:T*..4]->(b))")
          require(ch.hops.head._1.varLen.get._2 != Unbounded ||
              (ch.hops.head._1.varLen.get._1 <= 1 && !all),
            (if (all) "allShortestPaths needs a bounded hop range " +
              "(tied-path multiplicity rides the unrolled walks); use *..k"
            else "shortestPath over an unbounded range needs lo <= 1 " +
              "(min-depth pairs cannot skip shorter walks); use *..k"))
          // OPTIONAL shortestPath: the compiled (pairs, min-depth)
          // frame left-joins the pipeline like any optional clause —
          // unreachable endpoints null-pad r and length(p)
          val w = if (atKw("WHERE")) { eatKw("WHERE"); Some(pred()) } else None
          return MatchClause(Seq(ch), optional, w, shortest = Some(pv),
            shortestAll = all)
        }
        // `p = (a)-[:T*1..2]->(b)` — a named path; length(p) projects
        // the hop count (fixed hops count 1 each, a bounded var-length
        // hop contributes its unrolled depth)
        val named =
          if (peek.exists(_.isInstanceOf[TId]) &&
              toks.lift(pos + 1).exists(_.text == "=") &&
              toks.lift(pos + 2).exists(_.text == "(")) {
            val pv = ident(); eatSym("="); Some(pv)
          } else None
        val cs = Seq.newBuilder[Chain]
        cs += chain()
        while (atSym(",")) { eatSym(","); cs += chain() }
        val w = if (atKw("WHERE")) { eatKw("WHERE"); Some(pred()) } else None
        MatchClause(cs.result(), optional, w, named = named)
      }
      // the reading pipeline: MATCH / OPTIONAL MATCH / WITH / UNWIND
      // stages in any order (each feeds the next), one RETURN at the end
      val stages = Seq.newBuilder[Stage]
      var go = true
      while (go) {
        if (atKw("MATCH") || atKw("OPTIONAL")) {
          val opt = atKw("OPTIONAL")
          if (opt) eatKw("OPTIONAL")
          stages += SMatch(matchClause(opt))
        } else if (atKw("WITH")) {
          eatKw("WITH")
          val wd = if (atKw("DISTINCT")) { eatKw("DISTINCT"); true } else false
          val wi = Seq.newBuilder[RetItem]
          var wstar = false
          if (atSym("*")) { eatSym("*"); wstar = true } else wi += retItem()
          while (atSym(",")) { eatSym(","); wi += retItem() }
          val wo = Seq.newBuilder[(Expr, Boolean)]
          if (atKw("ORDER")) {
            eatKw("ORDER"); eatKw("BY")
            def key(): (Expr, Boolean) = {
              val e = expr()
              if (atKw("DESC")) { eatKw("DESC"); (e, false) }
              else { if (atKw("ASC")) eatKw("ASC"); (e, true) }
            }
            wo += key()
            while (atSym(",")) { eatSym(","); wo += key() }
          }
          val wskip = if (atKw("SKIP")) { eatKw("SKIP"); Some(num()) } else None
          val wlimit = if (atKw("LIMIT")) { eatKw("LIMIT"); Some(num()) } else None
          val ww = if (atKw("WHERE")) { eatKw("WHERE"); Some(pred()) } else None
          stages += SWith(WithStage(wd, wi.result(), wo.result(), wskip,
            wlimit, ww, star = wstar))
        } else if (atKw("UNWIND")) {
          eatKw("UNWIND")
          val e = expr()
          eatKw("AS")
          stages += SUnwind(e, ident())
        } else if (peek.exists(t => t.text.equalsIgnoreCase("CALL")) &&
            toks.lift(pos + 1).exists(_.text == "{")) {
          pos += 1; eatSym("{")
          // openCypher importing WITH: bare variable references only,
          // no aliases/expressions/WHERE — anything else is a parse
          // error here, not a silent reinterpretation
          val imports =
            if (atKw("WITH")) {
              eatKw("WITH")
              val vs = Seq.newBuilder[String]
              vs += ident()
              while (atSym(",")) { eatSym(","); vs += ident() }
              require(atKw("MATCH") || atKw("OPTIONAL") || atKw("UNWIND") ||
                  atKw("WITH") || atKw("RETURN") ||
                  peek.exists(t => t.text.equalsIgnoreCase("CALL")),
                "CALL { WITH ... } imports are bare variables only " +
                  "(no AS / expressions / WHERE), followed by a clause")
              vs.result()
            } else Nil
          val inner = query(allowEmptyStages = imports.nonEmpty)
          eatSym("}")
          stages += SCall(inner, imports)
        } else go = false
      }
      eatKw("RETURN")
      val distinct = if (atKw("DISTINCT")) { eatKw("DISTINCT"); true } else false
      val items = Seq.newBuilder[RetItem]
      var star = false
      if (atSym("*")) { eatSym("*"); star = true } else items += retItem()
      while (atSym(",")) { eatSym(","); items += retItem() }
      val order = Seq.newBuilder[OrderKey]
      if (atKw("ORDER")) {
        eatKw("ORDER"); eatKw("BY")
        order += orderKey()
        while (atSym(",")) { eatSym(","); order += orderKey() }
      }
      val skip = if (atKw("SKIP")) { eatKw("SKIP"); Some(num()) } else None
      val limit = if (atKw("LIMIT")) { eatKw("LIMIT"); Some(num()) } else None
      // "}" ends a nested CALL { } subquery's frame
      require(pos == toks.length || atKw("UNION") || atSym("}"),
        s"trailing tokens from '${peek.map(_.text).getOrElse("")}'")
      val st = stages.result()
      // a correlated CALL body may be RETURN-only (the imports seed it)
      require(st.nonEmpty || allowEmptyStages,
        "query needs at least one reading clause before RETURN")
      Query(st, distinct, items.result(), order.result(), skip, limit,
        star = star)
    }

    /** `query [UNION [ALL] query]*` — Cypher's top level. Mixing UNION
      * and UNION ALL in one statement is rejected (Neo4j's rule). */
    def unionQuery(): (Seq[Query], Boolean) = {
      val parts = Seq.newBuilder[Query]
      parts += query()
      var all: Option[Boolean] = None
      while (atKw("UNION")) {
        eatKw("UNION")
        val thisAll = atKw("ALL")
        if (thisAll) eatKw("ALL")
        require(all.forall(_ == thisAll),
          "cannot mix UNION and UNION ALL in one statement")
        all = Some(thisAll)
        parts += query()
      }
      require(pos == toks.length,
        s"trailing tokens from '${peek.map(_.text).getOrElse("")}'")
      (parts.result(), all.getOrElse(false))
    }

    private def num(): Long = next() match {
      case TNum(t) => t.toLong
      case t => sys.error(s"expected number, got '${t.text}'")
    }

    private def chain(): Chain = {
      val head = nodePat()
      val hops = Seq.newBuilder[(RelPat, NodePat)]
      while (atSym("-") || atSym("<-")) hops += hopPat()
      Chain(head, hops.result())
    }

    private def nodePat(): NodePat = {
      eatSym("(")
      val v = peek match { case Some(TId(_)) => Some(ident()); case _ => None }
      val label = if (atSym(":")) { eatSym(":"); Some(ident()) } else None
      val props =
        if (atSym("{")) {
          eatSym("{")
          val m = Map.newBuilder[String, Expr]
          while (!atSym("}")) {
            val k = ident(); eatSym(":"); m += (k -> atom())
            if (atSym(",")) eatSym(",")
          }
          eatSym("}")
          m.result()
        } else Map.empty[String, Expr]
      eatSym(")")
      NodePat(v, label, props)
    }

    /** -[r:T1|T2]->(m), <-[:T]-(m), -[r]->(m), -[:T*1..3]->(m);
      * `-[:T]-` (undirected) matches both orientations over the
      * symmetric edge closure. Var-length bounds: `*n` (exact),
      * `*lo..hi`, `*..hi` (lo=1), `*lo..` and bare `*` (unbounded —
      * the reachability fixpoint). */
    private def hopPat(): (RelPat, NodePat) = {
      val back0 = atSym("<-")
      if (back0) eatSym("<-") else eatSym("-")
      var v: Option[String] = None
      var types: Seq[String] = Nil
      var varLen: Option[(Int, Int)] = None
      var props: Map[String, Expr] = Map.empty
      if (atSym("[")) {
        eatSym("[")
        peek match { case Some(TId(_)) => v = Some(ident()); case _ => }
        if (atSym(":")) {
          eatSym(":")
          val ts = Seq.newBuilder[String]
          ts += ident()
          while (atSym("|")) { eatSym("|"); if (atSym(":")) eatSym(":"); ts += ident() }
          types = ts.result()
        }
        if (atSym("*")) {
          eatSym("*")
          varLen = peek match {
            case Some(TNum(t)) if t.contains("..") => // "1..3" lexes as one number token
              pos += 1
              val parts = t.split("\\.\\.", -1)
              require(parts.length == 2 && parts(0).nonEmpty, s"bad hop range *$t")
              if (parts(1).isEmpty) // "*lo.." open upper bound: lo>1
                // compiles as an exact (lo-1)-hop prefix into the
                // reachability closure (∃ walk of length ≥ lo)
                Some((parts(0).toInt, Unbounded))
              else Some((parts(0).toInt, parts(1).toInt))
            case Some(TNum(t)) => pos += 1; Some((t.toInt, t.toInt))
            case Some(TSym(".")) => // *..hi
              eatSym("."); eatSym(".")
              Some((1, num().toInt))
            case _ => Some((1, Unbounded)) // bare `*`: 1..∞ reachability
          }
          val (lo, hi) = varLen.get
          require(lo >= 1 && hi >= lo, s"bad hop range *$lo..$hi")
          require(hi <= 10 || hi == Unbounded,
            s"*..$hi unrolls $hi chained joins; depth > 10 belongs to the unbounded '*'")
        }
        if (atSym("{")) { // relationship property map
          eatSym("{")
          val m = Map.newBuilder[String, Expr]
          while (!atSym("}")) {
            val k = ident(); eatSym(":"); m += (k -> atom())
            if (atSym(",")) eatSym(",")
          }
          eatSym("}")
          props = m.result()
          // on a var-length hop the map filters EVERY hop's edge
          // (Neo4j's contract) — compiled as one edge-set filter
          // below the k-fold joins, see relPropsFilter
        }
        eatSym("]")
      }
      val fwd = atSym("->")
      if (fwd) eatSym("->") else eatSym("-")
      require(!(fwd && back0), "a relationship cannot point both ways")
      // `-[:T]-`: both-ways match over the symmetric edge closure
      val undirected = !fwd && !back0
      // a bounded var-length binding projects its hop count via
      // size(r); the unbounded reachability closure carries no
      // per-walk hop list, so binding it stays rejected
      require(varLen.isEmpty || v.isEmpty || varLen.get._2 != Unbounded,
        "binding a variable to an unbounded '*' relationship is not " +
          "supported (reachability pairs carry no per-walk list); " +
          "bound the range (*lo..hi) and project size(r)")
      (RelPat(v, types, forward = fwd || undirected, varLen,
        undirected = undirected, props = props), nodePat())
    }

    private def retItem(): RetItem = {
      val p0 = pos
      val e = expr()
      val text = toks.slice(p0, pos).map(_.text).mkString
      val alias = if (atKw("AS")) { eatKw("AS"); Some(ident()) } else None
      RetItem(e, alias, text)
    }

    private def orderKey(): OrderKey = {
      val p0 = pos
      val e = expr()
      val text = toks.slice(p0, pos).map(_.text).mkString
      val asc =
        if (atKw("DESC")) { eatKw("DESC"); false }
        else { if (atKw("ASC")) eatKw("ASC"); true }
      OrderKey(e, text, asc)
    }

    // expression grammar with arithmetic precedence (+,- over *,/,%):
    // expr := term (('+'|'-') term)* ; term := factor (('*'|'/'|'%') factor)*
    // factor := fn(...) | CASE ... END | labels(v)[0] | type(v) | atom
    private def expr(): Expr = {
      var l = term()
      while (atSym("+") || atSym("-")) {
        val op = next().text
        l = EArith(op, l, term())
      }
      l
    }

    private def term(): Expr = {
      var l = power()
      while (atSym("*") || atSym("/") || atSym("%")) {
        val op = next().text
        l = EArith(op, l, power())
      }
      l
    }

    /** `^` exponentiation — binds tighter than * / %, right-associative
      * (Cypher: 2^3^2 = 2^(3^2)). */
    private def power(): Expr = {
      val b = factor()
      if (atSym("^")) { eatSym("^"); EArith("^", b, power()) } else b
    }

    /** factorBase plus any postfix `[index]` chain (Cypher 0-based
      * list indexing on any expression: `split(s,' ')[1]`,
      * `collect(x)[0]`). `labels(v)[0]` keeps its dedicated form. */
    private def factor(): Expr = {
      // the lexer folds digit ranges into ONE number token ("0..2",
      // "1.."), same as the var-length hop parse — peel those apart
      def numRange(t: String, negLo: Boolean): (Expr, Option[Expr]) = {
        val parts = t.split("\\.\\.", -1)
        require(parts.length == 2 && parts(0).nonEmpty, s"bad slice range $t")
        val lo = ELit(if (negLo) -parts(0).toLong else parts(0).toLong)
        val hi =
          if (parts(1).nonEmpty) Some(ELit(parts(1).toLong))
          else if (atSym("]")) None
          else Some(expr()) // "1..n": the number token ends at the ident
        (lo, hi)
      }
      var b = factorBase()
      while (atSym("[")) {
        eatSym("[")
        if (atSym(".")) { // l[..hi] — ".." lexes as two dot symbols
          eatSym("."); eatSym(".")
          val hi = if (atSym("]")) None else Some(expr())
          eatSym("]")
          b = ESlice(b, None, hi)
        } else {
          val negRange = atSym("-") && toks.lift(pos + 1).exists {
            case TNum(t) => t.contains(".."); case _ => false
          }
          peek match {
            case _ if negRange => // l[-2..] / l[-3..-1]
              pos += 1
              val t = toks(pos) match {
                case TNum(x) => pos += 1; x
                case other => sys.error(s"number expected, got $other")
              }
              val (lo, hi) = numRange(t, negLo = true)
              eatSym("]")
              b = ESlice(b, Some(lo), hi)
            case Some(TNum(t)) if t.contains("..") => // l[0..2] / l[1..]
              pos += 1
              val (lo, hi) = numRange(t, negLo = false)
              eatSym("]")
              b = ESlice(b, Some(lo), hi)
            case _ =>
              val first = expr()
              if (atSym(".")) { // l[x..y] with expression bounds
                eatSym("."); eatSym(".")
                val hi = if (atSym("]")) None else Some(expr())
                eatSym("]")
                b = ESlice(b, Some(first), hi)
              } else { eatSym("]"); b = EIndex(b, first) }
          }
        }
      }
      b
    }

    private def factorBase(): Expr = peek match {
      case Some(TKw("CASE")) =>
        eatKw("CASE")
        val operand = if (atKw("WHEN")) None else Some(expr())
        val whens = Seq.newBuilder[(Either[Pred, Expr], Expr)]
        while (atKw("WHEN")) {
          eatKw("WHEN")
          val cond: Either[Pred, Expr] =
            if (operand.isDefined) Right(expr()) else Left(pred())
          eatKw("THEN")
          whens += (cond -> expr())
        }
        val els = if (atKw("ELSE")) { eatKw("ELSE"); Some(expr()) } else None
        eatKw("END")
        val ws = whens.result()
        require(ws.nonEmpty, "CASE needs at least one WHEN branch")
        ECase(operand, ws, els)
      case Some(TSym("(")) => // grouping (patterns never reach expr())
        eatSym("("); val e = expr(); eatSym(")"); e
      case Some(TId("labels")) if toks.lift(pos + 1).exists(_.text == "(") =>
        pos += 1; eatSym("("); val v = ident(); eatSym(")")
        if (atSym("[")) { // labels(n)[0] fast form — the scalar label
          eatSym("["); require(num() == 0L, "labels(n)[i]: only index 0 exists (single-label engine)"); eatSym("]")
          ELabels0(v)
        } else EFn("labels", Seq(EVar(v))) // full list: [label]
      case Some(TId("type")) if toks.lift(pos + 1).exists(_.text == "(") =>
        pos += 1; eatSym("("); val v = ident(); eatSym(")"); EType(v)
      case Some(TKw("EXISTS")) if toks.lift(pos + 1).exists(_.text == "{") =>
        // value-position EXISTS { } — identical parse to the predicate
        // form (basePred owns the brace grammar), wrapped as a boolean
        // VALUE that rides a pre-joined flag column
        EPredVal(basePred())
      case Some(t) if (t == TKw("ALL") || (t match {
            case TId(q) => Set("any", "none", "single")(q.toLowerCase)
            case _ => false
          })) &&
          toks.lift(pos + 1).exists(_.text == "(") &&
          toks.lift(pos + 3).exists(_.text.equalsIgnoreCase("IN")) =>
        // value-position quantifier — `RETURN any(x IN l WHERE p) AS b`
        // — same grammar as the predicate form, wrapped as a boolean
        // VALUE (plain bodies compile to the codegen'd HOF,
        // lambda-bound patterns to the explode route's flag column)
        val qn = t match { case TId(q) => q.toLowerCase; case _ => "all" }
        pos += 1; eatSym("(")
        val v = ident(); eatKw("IN"); val lst = expr()
        eatKw("WHERE"); val w = pred(); eatSym(")")
        EPredVal(PQuant(qn, v, lst, w))
      case Some(TKw("EXISTS")) if toks.lift(pos + 1).exists(_.text == "(") =>
        // EXISTS lexes as a keyword, so the generic scalar-function
        // branch can't reach it. Two meanings share this shape:
        // exists((a)-[:R]->(b)) — the 3.x pattern-existence value —
        // parses the pattern first (flag column); exists(n.prop) falls
        // back to the legacy property-existence function.
        pos += 1; eatSym("(")
        val save = pos
        val asPattern: Option[Expr] = patternPredOpt() match {
          case Some(p) if atSym(")") => Some(EPredVal(p))
          case _ =>
            pos = save
            scala.util.Try {
              val ch = chain(); require(ch.hops.nonEmpty, "not a pattern"); ch
            }.toOption.filter(_ => atSym(")"))
              .map(ch => EPredVal(PExistsChain(Seq(ch), None)))
        }
        asPattern match {
          case Some(e) => eatSym(")"); e
          case None =>
            pos = save
            val a = expr(); eatSym(")")
            EFn("exists", Seq(a))
        }
      case Some(TId(fn)) if fn.equalsIgnoreCase("reduce")
          && toks.lift(pos + 1).exists(_.text == "(") =>
        pos += 1; eatSym("(")
        val accName = ident(); eatSym("="); val init = expr(); eatSym(",")
        val v = ident(); eatKw("IN"); val lst = expr()
        eatSym("|"); val body = expr()
        eatSym(")")
        EReduce(accName, init, v, lst, body)
      case Some(TId(fn)) if fn.equalsIgnoreCase("count")
          && toks.lift(pos + 1).exists(_.text == "{") =>
        // COUNT { ... } subquery expression — EXISTS's counting
        // sibling: the single-hop form keeps its degree-table fast
        // path; multi-hop chains / comma patterns / an inner WHERE
        // parse as a full counting pattern subquery
        pos += 1; eatSym("{")
        if (atKw("MATCH")) eatKw("MATCH")
        val save = pos
        val fast = patternPredOpt() match {
          // a named target (bound or not) routes through the chain
          // form, which binds shared variables correctly
          case Some(PPattern(cv, ct, cf, ctl, cund, None)) if atSym("}") =>
            eatSym("}"); Some(ECountSub(cv, ct, cf, ctl, cund))
          case _ => pos = save; None
        }
        fast.getOrElse {
          val cs = Seq.newBuilder[Chain]
          cs += chain()
          while (atSym(",")) { eatSym(","); cs += chain() }
          val w = if (atKw("WHERE")) { eatKw("WHERE"); Some(pred()) } else None
          eatSym("}")
          ECountChain(cs.result(), w)
        }
      case Some(TId(fn)) if fn.equalsIgnoreCase("collect")
          && toks.lift(pos + 1).exists(_.text == "{") =>
        // COLLECT { ... RETURN expr } subquery expression — the
        // list-building sibling of COUNT {}
        pos += 1; eatSym("{")
        if (atKw("MATCH")) eatKw("MATCH")
        val cs = Seq.newBuilder[Chain]
        cs += chain()
        while (atSym(",")) { eatSym(","); cs += chain() }
        val w = if (atKw("WHERE")) { eatKw("WHERE"); Some(pred()) } else None
        eatKw("RETURN")
        val ret = expr()
        val ob = Seq.newBuilder[(Expr, Boolean)]
        if (atKw("ORDER")) {
          eatKw("ORDER"); eatKw("BY")
          def key(): (Expr, Boolean) = {
            val e = expr()
            if (atKw("DESC")) { eatKw("DESC"); (e, false) }
            else { if (atKw("ASC")) eatKw("ASC"); (e, true) }
          }
          ob += key()
          while (atSym(",")) { eatSym(","); ob += key() }
        }
        val lim = if (atKw("LIMIT")) { eatKw("LIMIT"); Some(num()) } else None
        eatSym("}")
        ECollect(cs.result(), w, ret, ob.result(), lim)
      case Some(TId(fn)) if Set("count", "sum", "min", "max", "avg", "collect",
          "stdev", "stdevp")(fn.toLowerCase)
          && toks.lift(pos + 1).exists(_.text == "(") =>
        pos += 1; eatSym("(")
        val distinct = if (atKw("DISTINCT")) { eatKw("DISTINCT"); true } else false
        val arg = if (atSym("*")) { eatSym("*"); None } else Some(expr())
        eatSym(")")
        EAgg(fn.toLowerCase, arg, distinct)
      case Some(TId(fn)) if Set("percentilecont", "percentiledisc")(fn.toLowerCase)
          && toks.lift(pos + 1).exists(_.text == "(") =>
        // percentileCont(x, p) / percentileDisc(x, p): the literal
        // fraction rides INSIDE the fn name (`percentilecont:0.5`) so
        // every EAgg traversal (hasAgg, liftAggs, zeroRowExpr) stays
        // single-argument — fn is opaque to all of them
        pos += 1; eatSym("(")
        val arg = expr()
        eatSym(",")
        // a `$param` fraction rides as `$name` in the tag, resolved
        // (and range-checked) at compile time from the params map
        val p: String = atom() match {
          case ELit(d: Double) =>
            require(d >= 0.0 && d <= 1.0, s"percentile fraction out of [0,1]: $d")
            d.toString
          case ELit(n: Long) =>
            require(n >= 0L && n <= 1L, s"percentile fraction out of [0,1]: $n")
            n.toDouble.toString
          case EParam(name) => "$" + name
          case other =>
            sys.error(s"percentile fraction must be a literal or $$param, got $other")
        }
        eatSym(")")
        EAgg(fn.toLowerCase + ":" + p, Some(arg), distinct = false)
      case Some(TId(fn)) if scalarFns(fn.toLowerCase)
          && toks.lift(pos + 1).exists(_.text == "(") =>
        pos += 1; eatSym("(")
        val args = Seq.newBuilder[Expr]
        if (!atSym(")")) {
          args += expr()
          while (atSym(",")) { eatSym(","); args += expr() }
        }
        eatSym(")")
        EFn(fn.toLowerCase, args.result())
      case _ => atom()
    }

    private def atom(): Expr = next() match {
      case TSym("$") => EParam(ident())
      case TSym("{") =>
        // map literal {k: expr, ...} — expression position only (a
        // pattern's property map is parsed by the pattern grammar)
        val entries = Seq.newBuilder[(String, Expr)]
        if (!atSym("}")) {
          def entry(): Unit = {
            val k = ident(); eatSym(":"); entries += k -> expr()
          }
          entry()
          while (atSym(",")) { eatSym(","); entry() }
        }
        eatSym("}")
        EMapLit(entries.result())
      case TSym("[") =>
        // `[x IN list ...]` is a comprehension, not a list literal —
        // a literal can't have `IN` after its first element
        def listLiteral(): Expr = {
          val items = Seq.newBuilder[Expr]
          while (!atSym("]")) {
            items += expr()
            if (atSym(",")) eatSym(",")
          }
          eatSym("]")
          EList(items.result())
        }
        if (peek.exists(_.isInstanceOf[TId]) &&
            toks.lift(pos + 1).exists { case TKw("IN") => true; case _ => false }) {
          val v = ident(); eatKw("IN")
          val lst = expr()
          val wh = if (atKw("WHERE")) { eatKw("WHERE"); Some(pred()) } else None
          val mp = if (atSym("|")) { eatSym("|"); Some(expr()) } else None
          eatSym("]")
          require(wh.isDefined || mp.isDefined,
            "comprehension needs a WHERE filter or a | projection")
          EComp(v, lst, wh, mp)
        } else if (peek.exists(_.text == "(")) {
          // pattern comprehension `[(a)-[:R]->(b) WHERE p | e]` —
          // sugar for COLLECT { MATCH ... RETURN e }, parsed into the
          // same ECollect node (one ordered window collect + left
          // join with empty-list refill at the use site). A
          // parenthesized first element (`[(1+2), 3]`) fails the
          // pattern parse and backtracks to the list literal.
          val save = pos
          scala.util.Try {
            val ch = chain()
            val w = if (atKw("WHERE")) { eatKw("WHERE"); Some(pred()) } else None
            eatSym("|")
            val ret = expr()
            eatSym("]")
            ECollect(Seq(ch), w, ret, Nil, None)
          }.getOrElse { pos = save; listLiteral() }
        } else listLiteral()
      case TSym("-") => atom() match { // negative literal (write `< -1` spaced)
        case ELit(v: Long) => ELit(-v)
        case ELit(v: Double) => ELit(-v)
        case other => sys.error(s"'-' before non-numeric $other")
      }
      case TStr(sv) => ELit(sv)
      case TNum(t) => if (t.contains('.')) ELit(t.toDouble) else ELit(t.toLong)
      case TKw("TRUE") => ELit(true)
      case TKw("FALSE") => ELit(false)
      case TKw("NULL") => ELit(null)
      case TId(v) =>
        if (atSym(".")) { eatSym("."); EProp(v, ident()) }
        else if (atSym("{") && toks.lift(pos + 1).exists(_.text == ".")) {
          // map projection `v {.k1, .k2}` (the leading '.' separates it
          // from every other brace form)
          eatSym("{")
          val keys = Seq.newBuilder[String]
          eatSym("."); keys += ident()
          while (atSym(",")) { eatSym(","); eatSym("."); keys += ident() }
          eatSym("}")
          EMapProj(v, keys.result())
        } else EVar(v)
      case t => sys.error(s"unexpected token '${t.text}' in expression")
    }

    // predicate grammar with Cypher precedence: OR < XOR < AND < NOT < cmp
    private def pred(): Pred = {
      var l = xorPred()
      while (atKw("OR")) { eatKw("OR"); l = POr(l, xorPred()) }
      l
    }
    private def xorPred(): Pred = {
      var l = andPred()
      while (atKw("XOR")) { eatKw("XOR"); l = PXor(l, andPred()) }
      l
    }
    private def andPred(): Pred = {
      var l = notPred()
      while (atKw("AND")) { eatKw("AND"); l = PAnd(l, notPred()) }
      l
    }
    private def notPred(): Pred =
      if (atKw("NOT")) { eatKw("NOT"); PNot(notPred()) }
      else basePred()

    private def basePred(): Pred = {
      // modern existential subquery: EXISTS { (v)-[:T]->(:L) } — the
      // braced form of the bare pattern predicate (Neo4j 5 deprecates
      // the bare form); compiles to the same semi/anti join
      if (atKw("EXISTS") && toks.lift(pos + 1).exists(_.text == "{")) {
        eatKw("EXISTS"); eatSym("{")
        if (atKw("MATCH")) eatKw("MATCH") // EXISTS { MATCH ... } long form
        // single-hop (v)-[:T]->(:L) keeps the PPattern fast path
        // (semi-join on one distinct endpoint set); anything longer —
        // multi-hop chains, comma patterns, an inner WHERE — parses
        // as a full existential pattern subquery
        val save = pos
        patternPredOpt() match {
          case Some(p) if atSym("}") => eatSym("}"); return p
          case _ => pos = save
        }
        val cs = Seq.newBuilder[Chain]
        cs += chain()
        while (atSym(",")) { eatSym(","); cs += chain() }
        val w = if (atKw("WHERE")) { eatKw("WHERE"); Some(pred()) } else None
        eatSym("}")
        return PExistsChain(cs.result(), w)
      }
      // all/any/none/single(x IN list WHERE p) quantified predicates
      // ("ALL" tokenizes as a keyword — UNION ALL — the others as ids)
      val quant = peek match {
        case Some(TKw("ALL")) => Some("all")
        case Some(TId(q)) if Set("any", "none", "single")(q.toLowerCase) =>
          Some(q.toLowerCase)
        case _ => None
      }
      if (quant.isDefined && toks.lift(pos + 1).exists(_.text == "(")) {
        pos += 1; eatSym("(")
        val v = ident(); eatKw("IN"); val lst = expr()
        eatKw("WHERE"); val w = pred()
        eatSym(")")
        return PQuant(quant.get, v, lst, w)
      }
      // parenthesized: a pattern predicate (v)-[:T]->(), a grouped
      // (pred), or a parenthesized EXPRESSION under a comparison like
      // `(CASE ... END) = 1` — tried in that order, backtracking
      if (atSym("(")) {
        val save = pos
        patternPredOpt() match {
          // a trailing -/<- means the single-hop parse stopped short
          // of a longer chain — fall through to the chain form
          case Some(p) if !atSym("-") && !atSym("<-") => return p
          case _ => pos = save
        }
        // bare MULTI-HOP or VAR-LENGTH pattern predicate:
        // (a)-[:X]->()-[:Y]->(b), (w)-[*1..2]->(:F) — parse the full
        // chain and compile as the equivalent EXISTS {} subquery
        // (shared-variable semi/anti join; both endpoints correlate
        // when bound)
        scala.util.Try {
          val ch = chain()
          require(ch.hops.nonEmpty, "not a pattern")
          ch
        } match {
          case scala.util.Success(ch) => return PExistsChain(Seq(ch), None)
          case _ => pos = save
        }
        val predErr: Exception =
          try {
            eatSym("(")
            val p = pred()
            eatSym(")")
            return p
          } catch {
            case e: Exception => pos = save; e
          }
        // expr-comparison fallback — narrowed: if the group does NOT
        // re-parse as a comparison either, surface the ORIGINAL
        // predicate-parse error (closest to the real fault), not a
        // misleading 'unexpected token' from the expression re-lex
        return try exprCmp() catch {
          case _: Exception => pos = save; throw predErr
        }
      }
      exprCmp()
    }

    /** Expression followed by a comparison / string / null / label
      * predicate — basePred's non-parenthesized tail, shared with the
      * grouped-predicate fallback. */
    private def exprCmp(): Pred = {
      val l = expr()
      // `n:Label` label predicate
      if (atSym(":")) {
        l match {
          case EVar(v) => eatSym(":"); return PHasLabel(v, ident())
          case _ => sys.error("label predicate needs a node variable, e.g. n:Label")
        }
      }
      peek match {
        case Some(TKw("IS")) =>
          eatKw("IS")
          val neg = if (atKw("NOT")) { eatKw("NOT"); true } else false
          eatKw("NULL")
          PIsNull(l, neg)
        case Some(TKw("IN")) => eatKw("IN"); PIn(l, expr())
        case Some(TKw("CONTAINS")) => eatKw("CONTAINS"); PStr("contains", l, atom())
        case Some(TKw("STARTS")) => eatKw("STARTS"); eatKw("WITH"); PStr("starts", l, atom())
        case Some(TKw("ENDS")) => eatKw("ENDS"); eatKw("WITH"); PStr("ends", l, atom())
        case Some(TSym("=~")) => eatSym("=~"); PStr("regex", l, atom())
        case Some(TSym(op)) if Set("=", "<>", "<", "<=", ">", ">=")(op) =>
          // chained comparisons (1 < x <= 2) desugar to AND of pairs
          // (openCypher's non-associative comparison chain)
          eatSym(op)
          var r = expr()
          var acc: Pred = PCmp(op, l, r)
          while (peek.exists {
            case TSym(o2) => Set("=", "<>", "<", "<=", ">", ">=")(o2)
            case _ => false
          }) {
            val o2 = next().text
            val r2 = expr()
            acc = PAnd(acc, PCmp(o2, r, r2))
            r = r2
          }
          acc
        // bare boolean expression as the whole predicate — only forms
        // that can plausibly BE boolean (a literal, a bound alias, a
        // boolean-returning function); anything else keeps the
        // comparison-expected error
        case _ if boolishExpr(l) => PBoolE(l)
        case t => sys.error(s"expected comparison after expression, got '${t.map(_.text)}'")
      }
    }

    /** Can this expression plausibly be a bare boolean predicate? */
    private def boolishExpr(e: Expr): Boolean = e match {
      case ELit(_: Boolean) => true
      case EVar(_) => true // a WITH-bound boolean alias (typed at analysis)
      case EFn("exists" | "toboolean", _) => true
      case _ => false
    }

    /** Try `(v)-[:T1|T2]->()` / `(v)<-[:T]-(:Label)`; None if not that shape. */
    private def patternPredOpt(): Option[Pred] =
      try {
        eatSym("(")
        val v = ident()
        eatSym(")")
        val back = atSym("<-")
        if (back) eatSym("<-") else eatSym("-")
        var types: Seq[String] = Nil
        if (atSym("[")) {
          eatSym("[")
          if (atSym(":")) {
            eatSym(":")
            val ts = Seq.newBuilder[String]
            ts += ident()
            while (atSym("|")) { eatSym("|"); if (atSym(":")) eatSym(":"); ts += ident() }
            types = ts.result()
          }
          eatSym("]")
        }
        val fwd = atSym("->")
        if (fwd) eatSym("->") else eatSym("-")
        require(!(fwd && back), "a relationship cannot point both ways")
        eatSym("(")
        val tv = peek match {
          case Some(TId(_)) => Some(ident())
          case _ => None
        }
        val tl = if (atSym(":")) { eatSym(":"); Some(ident()) } else None
        eatSym(")")
        Some(PPattern(v, types, forward = fwd || (!fwd && !back),
          targetLabel = tl, undirected = !fwd && !back, targetVar = tv))
      } catch { case _: Throwable => None }
  }

  // ----------------------------------------------------------- compiler

  /** Column namespace for a pattern variable: `v$uid`, `v$label`,
    * `v$<prop>` — keeps every bound variable's fields side by side in
    * one flat row without struct overhead. */
  private def ns(v: String, c: String) = s"$v$$$c"

  private final class Compiler(nodes: DataFrame, edges: DataFrame,
                               params: Map[String, Any]) {
    private val nodeProps = nodes.columns.filterNot(Set("uid", "label")).toSeq
    private val edgeProps =
      edges.columns.filterNot(Set("src_uid", "dst_uid", "rel_type", "src_label", "dst_label")).toSeq
    private var anon = 0
    private def freshVar(): String = { anon += 1; s"_anon$anon" }
    /** Variables bound to relationships (vs nodes) — they carry
      * rel_type/src_uid/dst_uid instead of uid/label. */
    private var relVars = Set.empty[String]
    /** Scalar variables bound by WITH aliases — plain columns, not
      * namespaced node/rel bindings. */
    private var scalarVars = Set.empty[String]
    /** Path variables bound by shortestPath — only `length(p)` (the
      * hop count) is projectable; maps to the min-depth column. */
    private var pathVars = Map.empty[String, String]

    /** Fixed-length named paths only: the chain's node variables in
      * walk order / its relationship variables in hop order — the
      * nodes(p)/relationships(p) surface. Var-length and shortestPath
      * paths are absent (their walk interior is not per-row columns;
      * they expose length(p) and the bound rel's hop list instead). */
    private var pathNodeSeq = Map.empty[String, Seq[String]]
    private var pathRelSeq = Map.empty[String, Seq[String]]
    /** Canonical serialized path value — what a bare `RETURN p`
      * projects: `uid|rel_type|uid|...` in walk order (the g43 law's
      * `|`-join; direction is carried by the walk order, not arrows).
      * Present for fixed-length, bounded var-length (the interior
      * rides the materialized hop list) AND shortestPath paths — the
      * bounded form carries a lexicographic-min witness through its
      * level sets, the unbounded form through
      * [[Traversal.reachFixpointWitness]]. Maps path var → its
      * pathstr column. */
    private var pathStrCols = Map.empty[String, String]
    /** Bounded var-length relationship bindings: var → its per-walk
      * hop-count column (`size(r)`'s fast path). */
    private var varLenVars = Map.empty[String, String]
    /** Bounded var-length relationship bindings: var → the walk's
      * materialized hop list ((src, rel_type, dst) structs, walk
      * orientation) — what a bare `r` / `r[i]` projects. */
    private var varLenHops = Map.empty[String, String]
    /** Lambda variables inside comprehension/reduce bodies — bound to
      * the enclosing higher-order function's element column. Checked
      * FIRST in exprCol so a lambda shadows an outer binding, matching
      * Cypher scoping. */
    private var lambdaVars = Map.empty[String, Column]
    /** Lambda variables known to iterate STRING elements (split(),
      * keys(), string-literal lists) — drives size()'s char-vs-element
      * dispatch inside comprehension/reduce bodies. */
    private var stringLambdas = Set.empty[String]
    private def withLambda(binds: (String, Column)*)(body: => Column): Column = {
      val saved = lambdaVars
      lambdaVars = lambdaVars ++ binds
      try body finally lambdaVars = saved
    }
    /** Best-effort: does this list expression carry string elements? */
    private def stringElems(list: Expr): Boolean = list match {
      case EFn("split", _) | EFn("keys", _) => true
      case EList(items) if items.nonEmpty =>
        items.forall { case ELit(_: String) => true; case _ => false }
      case EComp(_, l2, _, None) => stringElems(l2)
      case EComp(_, _, _, Some(m)) => m match {
        case ELit(_: String) | EProp(_, _) |
             EFn("tolower" | "toupper" | "tostring" | "trim" | "ltrim" |
                 "rtrim" | "replace" | "substring" | "left" | "right", _) => true
        case _ => false
      }
      case _ => false
    }

    /** One variable's node table, all columns namespaced. */
    private def nodeSide(p: NodePat, v: String): DataFrame = {
      var df = nodes
      p.label.foreach(l => df = df.filter(col("label") === l))
      p.props.foreach { case (k, e) =>
        e match {
          case EVar(sv) if scalarVars(sv) => sys.error(
            s"property map cannot reference pipeline alias '$sv' (it lives " +
              "outside the pattern's frame); correlate with WHERE instead")
          case _ =>
        }
        df = df.filter(col(k) === exprCol(e))
      }
      df.select((Seq("uid", "label") ++ nodeProps).map(c => col(c).as(ns(v, c))): _*)
    }

    /** A relationship property map as a per-EDGE filter. On a fixed
      * hop it is the edge's own predicate; on a var-length hop EVERY
      * hop of the walk must satisfy it (Neo4j's `-[:T*1..3 {k: v}]->`
      * contract), so the same filter applies to the edge set each
      * k-fold join draws from — pushed below the joins, never a
      * post-hoc hop-list scan. */
    private def relPropsFilter(df0: DataFrame, r: RelPat): DataFrame = {
      var df = df0
      r.props.foreach { case (k, e) =>
        e match {
          case EVar(sv) if scalarVars(sv) => sys.error(
            s"property map cannot reference pipeline alias '$sv' (it lives " +
              "outside the pattern's frame); correlate with WHERE instead")
          case _ =>
        }
        df = df.filter(col(k) === exprCol(e))
      }
      df
    }

    private def edgeSide(r: RelPat, rv: String): DataFrame = {
      var df = edges
      if (r.types.nonEmpty) df = df.filter(col("rel_type").isin(r.types: _*))
      df = relPropsFilter(df, r)
      // endpoint labels ride along when the edge frame carries them —
      // startNode(r)/endNode(r) project them as the node's label
      val labelCols =
        if (Seq("src_label", "dst_label").forall(edges.columns.contains))
          Seq("src_label", "dst_label")
        else Nil
      val cols = Seq("src_uid", "dst_uid", "rel_type") ++ labelCols ++ edgeProps
      val base =
        if (!r.undirected) df.select(cols.map(col): _*)
        else
          // `-[:T]-`: symmetric closure — each edge matches from both
          // ends. The bound rel's namespaced src_uid is the traversal
          // ORIGIN (walk orientation, not storage orientation — the
          // documented undirected divergence). A self-loop is the same
          // undirected match from either end, so its reversed copy is
          // excluded (Neo4j matches an undirected loop once).
          df.select(cols.map(col): _*).unionByName(
            df.filter(col("src_uid") =!= col("dst_uid"))
              .select((Seq(col("dst_uid").as("src_uid"),
                col("src_uid").as("dst_uid"), col("rel_type")) ++
                labelCols.map(c => // labels swap with the orientation
                  col(if (c == "src_label") "dst_label" else "src_label").as(c)) ++
                edgeProps.map(col)): _*))
      base.select(cols.map(c => col(c).as(ns(rv, c))): _*)
    }

    /** Compile one chain to a DataFrame of namespaced columns; returns
      * (df, boundVars). A `pathVar` (MATCH p = ...) additionally
      * materializes the walk's hop count as a `pathlen$p` column —
      * fixed hops contribute 1 each, a bounded var-length hop its
      * unrolled depth — and registers it for `length(p)`. */
    private def compileChain(ch: Chain,
                             pathVar: Option[String] = None): (DataFrame, Set[String]) = {
      val headVar = ch.head.v.getOrElse(freshVar())
      var df = nodeSide(ch.head, headVar)
      var bound = Set(headVar)
      var cur = headVar
      val lenParts = Seq.newBuilder[Column]
      // nodes(p)/relationships(p) bookkeeping (fixed-length chains)
      val nodeOrder = Seq.newBuilder[String]
      nodeOrder += headVar
      val relOrder = Seq.newBuilder[String]
      var hasVarLen = false
      // RETURN p bookkeeping: each hop appends its `|rel_type|uid`
      // piece(s); var-length hops contribute a fold over their
      // materialized hop list. Pure string concat over columns the
      // chain joins already carry — no extra joins.
      val serialParts = Seq.newBuilder[Column]
      serialParts += col(ns(headVar, "uid"))
      val serialScratch = Seq.newBuilder[String]
      ch.hops.foreach { case (rel, nodePat) =>
        rel.varLen match {
          case Some((lo, hi)) =>
            // bounded var-length: union of k-fold edge chains, k in
            // lo..hi — the same unrolled-joins plan GraphDSL.outVar
            // builds (g12), one declarative plan with no driver loop.
            // Path-multiplicity (walk) semantics: a destination appears
            // once per distinct walk, matching outVar's contract.
            //
            // UNBOUNDED `*` (hi == Unbounded) instead compiles to the
            // Traversal.reachFixpoint REACHABILITY closure: DISTINCT
            // (from, to) pairs, cycle-safe — walk multiplicity over an
            // unbounded depth is not finite on cyclic graphs, so the
            // semantics shift is forced and documented (parser pins
            // lo == 1 for this form).
            val endCol = freshVar() // unique reach-endpoint column per hop
            val nv = nodePat.v.getOrElse(freshVar())
            hasVarLen = true
            nodeOrder += nv
            val reachDf =
              if (hi == Unbounded) {
                require(pathVar.isEmpty,
                  "length(p) over an unbounded `*` hop is not finite " +
                    "on cyclic graphs; bound the range (*1..k)")
                var e = edges
                if (rel.types.nonEmpty) e = e.filter(col("rel_type").isin(rel.types: _*))
                e = relPropsFilter(e, rel) // per-hop property map
                val (fromC, toC) =
                  if (rel.forward) ("src_uid", "dst_uid") else ("dst_uid", "src_uid")
                val base = e.select(col(fromC).as("src_uid"), col(toC).as("dst_uid"))
                val reachEdges =
                  // self-loops stay single-orientation: the reversed
                  // copy is the same undirected edge (Neo4j matches a
                  // loop once), and a duplicate level-1 row would
                  // double-count closure pairs
                  if (rel.undirected) base.unionByName(
                    base.filter(col("src_uid") =!= col("dst_uid")).select(
                      col("dst_uid").as("src_uid"), col("src_uid").as("dst_uid")))
                  else base
                // When the closure's STARTS join directly against the
                // chain's head frame (first hop, lo <= 1 — the `lo > 1`
                // form instead joins the closure on the exact-prefix's
                // TARGETS, which the head set does not cover), seed the
                // fixpoint with the head pattern's uid set (a cheap
                // label projection) instead of computing all-pairs
                // reach from every node and discarding the rest
                // (hub-safe at scale, fewer frontier rows at any
                // scale). Mid-chain hops stay unseeded: re-deriving
                // the current frontier would re-execute the chain
                // prefix.
                if (lo <= 1) {
                  val seed =
                    if (cur == headVar)
                      Some(df.select(col(ns(cur, "uid")).as("src_uid")))
                    else None
                  Traversal.reachFixpoint(reachEdges, seed = seed)
                    .select(col("start").as(s"$endCol$$from"),
                      col("reached").as(s"$endCol$$to"))
                } else {
                  // `*lo..` (lo > 1): an exact (lo-1)-hop walk prefix
                  // chained into the 1..∞ closure — ∃ walk of length
                  // ≥ lo; DISTINCT pairs keep reachability semantics.
                  // The prefix seeds from the chain head when this hop
                  // binds it (the lo ≤ 1 hub-safety), deduplicates
                  // (only PAIRS survive the final distinct) and is
                  // materialized once — it feeds the closure's seed
                  // AND the chain join. The closure BFS then starts
                  // only from the prefix's TARGET set: the old form
                  // ran the (eager) fixpoint from EVERY node of the
                  // graph and immediately discarded all starts the
                  // prefix join dropped — the textbook wasted pass
                  // (guide §1.2); results for kept starts are
                  // identical by reachFixpoint's seeding contract.
                  val prefixSeed =
                    if (cur == headVar)
                      Some(df.select(col(ns(cur, "uid"))
                        .as(s"$endCol$$from")).distinct())
                    else None
                  val prefix =
                    varReach(rel, lo - 1, lo - 1, endCol,
                        seedFrom = prefixSeed)
                      .withColumnRenamed(s"$endCol$$to", s"$endCol$$pre")
                      .distinct()
                      .localCheckpoint(true)
                  val closure = Traversal.reachFixpoint(reachEdges,
                      seed = Some(prefix
                        .select(col(s"$endCol$$pre").as("src_uid"))))
                    .select(col("start").as(s"$endCol$$pre"),
                      col("reached").as(s"$endCol$$to"))
                  prefix.join(closure, s"$endCol$$pre")
                    .drop(s"$endCol$$pre")
                    .distinct()
                }
              } else varReach(rel, lo, hi, endCol,
                withLen = pathVar.isDefined || rel.v.isDefined,
                // a named path serializes its interior from the hop
                // list, so `p = (a)-[*1..2]->(b)` materializes hops
                // even without a bound rel variable
                withHops = rel.v.isDefined || pathVar.isDefined)
            if (pathVar.isDefined) lenParts += col(s"$endCol$$len")
            df = df.join(reachDf,
              col(ns(cur, "uid")) === col(s"$endCol$$from"))
              .drop(s"$endCol$$from")
            if (bound(nv)) {
              df = df.filter(col(s"$endCol$$to") === col(ns(nv, "uid")))
                .drop(s"$endCol$$to")
            } else {
              df = df.join(nodeSide(nodePat, nv),
                col(s"$endCol$$to") === col(ns(nv, "uid")))
                .drop(s"$endCol$$to")
              bound += nv
            }
            // a bound var-length variable surfaces its per-walk hop
            // count as size(r) (the tagged depth column, a literal per
            // chain) AND its hop list as `r` — the materialized
            // (src, rel_type, dst) struct array, walk orientation
            rel.v.foreach { rv =>
              val c = s"rellen$$$rv"
              df = df.withColumn(c, col(s"$endCol$$len"))
              if (pathVar.isEmpty) df = df.drop(s"$endCol$$len")
              varLenVars += rv -> c
              val hc = s"relhops$$$rv"
              df = df.withColumn(hc, col(s"$endCol$$hops"))
                .drop(s"$endCol$$hops")
              varLenHops += rv -> hc
            }
            if (pathVar.isDefined) {
              // the serialized interior folds over the hop list (walk
              // orientation, so each hop's dst IS the next node)
              val hc = rel.v.map(rv => s"relhops$$$rv").getOrElse {
                serialScratch += s"$endCol$$hops"
                s"$endCol$$hops"
              }
              serialParts += aggregate(col("`" + hc + "`"), lit(""),
                (acc, h) => concat(acc, lit("|"), h.getField("rel_type"),
                  lit("|"), h.getField("dst")))
            }
            cur = nv
          case None =>
            if (pathVar.isDefined) lenParts += lit(1)
            val rv = rel.v.getOrElse(freshVar())
            relVars += rv
            relOrder += rv
            val (fromC, toC) = if (rel.forward) ("src_uid", "dst_uid") else ("dst_uid", "src_uid")
            df = df.join(edgeSide(rel, rv), col(ns(cur, "uid")) === col(ns(rv, fromC)))
            val nv = nodePat.v.getOrElse(freshVar())
            nodeOrder += nv
            if (bound(nv)) { // cycle back to an already-bound variable
              df = df.filter(col(ns(rv, toC)) === col(ns(nv, "uid")))
            } else {
              df = df.join(nodeSide(nodePat, nv), col(ns(rv, toC)) === col(ns(nv, "uid")))
              bound += nv
            }
            bound += rv
            if (pathVar.isDefined)
              serialParts += concat(lit("|"), col(ns(rv, "rel_type")),
                lit("|"), col(ns(nv, "uid")))
            cur = nv
        }
      }
      pathVar.foreach { pv =>
        val parts = lenParts.result()
        val lenCol = s"pathlen$$$pv"
        df = df.withColumn(lenCol,
          if (parts.isEmpty) lit(0) else parts.reduce(_ + _))
        // the per-hop depth scratch columns fold into the total
        df = df.drop(df.columns.filter(c =>
          c.endsWith("$len") && c != lenCol).toIndexedSeq: _*)
        pathVars += pv -> lenCol
        if (!hasVarLen) {
          pathNodeSeq += pv -> nodeOrder.result()
          pathRelSeq += pv -> relOrder.result()
        }
        // the canonical path VALUE (`RETURN p`): uid|rel_type|uid|…
        val strCol = s"pathstr$$$pv"
        df = df.withColumn(strCol, concat(serialParts.result(): _*))
          .drop(serialScratch.result(): _*)
        pathStrCols += pv -> strCol
      }
      (df, bound)
    }

    /** `p = shortestPath((a)-[:T*lo..hi]->(b))`: bounded unrolled BFS.
      * Level sets are deduped per depth (distinct (from, to) pairs —
      * path multiplicity is irrelevant to shortest-ness and without
      * the dedup a diamond fan-out grows k^depth), depths unioned,
      * then one min-depth hash aggregate per endpoint pair. Entirely
      * declarative — Catalyst sees hi chained equi-joins + one
      * aggregate; no driver iteration (the unbounded form is
      * `graph.Traversal.reachFixpoint`). `length(p)` projects the
      * min depth. */
    private def compileShortest(ch: Chain, pv: String,
                                all: Boolean = false): (DataFrame, Set[String]) = {
      val (rel, tailPat) = ch.hops.head
      val (lo, hi) = rel.varLen.get
      val headVar = ch.head.v.getOrElse(freshVar())
      val tailVar = tailPat.v.getOrElse(freshVar())
      require(headVar != tailVar, "shortestPath endpoints must be distinct variables")
      val headFrame = nodeSide(ch.head, headVar)
      val headSeed = headFrame
        .select(col(ns(headVar, "uid")).as(s"$pv$$from")).distinct()
      if (all) {
        // allShortestPaths: EVERY walk tied at the pair's min depth —
        // walk multiplicity from the unrolled varReach (no level
        // dedup, SEEDED from the head set), one endpoint-pair window
        // to find the min, one filter. Neo4j's cardinality: one row
        // per tied shortest path. Hops materialize so `RETURN p`
        // serializes each tied path (fixed-width structs — extra
        // width, not extra rows).
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(s"$pv$$from", s"$pv$$to")
        val walks = varReach(rel, lo, hi, pv, withLen = true,
            withHops = true, seedFrom = Some(headSeed))
          .withColumn(s"$pv$$minlen", min(col(s"$pv$$len")).over(w))
          .filter(col(s"$pv$$len") === col(s"$pv$$minlen"))
          .drop(s"$pv$$minlen")
        val strCol = s"pathstr$$$pv"
        val df = headFrame
          .join(walks, col(ns(headVar, "uid")) === col(s"$pv$$from"))
          .drop(s"$pv$$from")
          .join(nodeSide(tailPat, tailVar), col(s"$pv$$to") === col(ns(tailVar, "uid")))
          .drop(s"$pv$$to")
          .withColumn(strCol, concat(col(ns(headVar, "uid")),
            aggregate(col(s"$pv$$hops"), lit(""),
              (acc, h) => concat(acc, lit("|"), h.getField("rel_type"),
                lit("|"), h.getField("dst")))))
          .drop(s"$pv$$hops")
        pathVars += (pv -> s"$pv$$len")
        pathStrCols += pv -> strCol
        return (df, Set(headVar, tailVar))
      }
      var e = edges
      if (rel.types.nonEmpty) e = e.filter(col("rel_type").isin(rel.types: _*))
      e = relPropsFilter(e, rel) // per-hop property map
      val (fromC, toC) = if (rel.forward) ("src_uid", "dst_uid") else ("dst_uid", "src_uid")
      val e1dir = e.select(col(fromC).as(s"$pv$$from"), col(toC).as(s"$pv$$to"),
        col("rel_type").as(s"$pv$$rt"))
      val e1 = (if (rel.undirected) e1dir.unionByName(e1dir.select(
        col(s"$pv$$to").as(s"$pv$$from"), col(s"$pv$$from").as(s"$pv$$to"),
        col(s"$pv$$rt")))
      else e1dir).distinct()
      val strCol = s"pathstr$$$pv"
      val reach =
        if (hi == Unbounded)
          // unbounded shortestPath: the witness-carrying reachability
          // fixpoint — BFS level order + the visited-set anti-join
          // guarantee first-reach = shortest, bounded only by the
          // graph's diameter, and each (start, reached) pair carries
          // the per-level lexicographic-min witness path string so
          // `RETURN p` projects a real path value (the same greedy
          // min-prefix composition the bounded level sets emit).
          Traversal.reachFixpointWitness(e1.select(
              col(s"$pv$$from").as("src_uid"), col(s"$pv$$to").as("dst_uid"),
              col(s"$pv$$rt").as("rel_type"))
              .distinct(),
              // the closure is immediately joined to the head frame —
              // seed the BFS with the head endpoint's uid set (the same
              // hub-safe seeding the bounded level sets get for free)
              seed = Some(headSeed.select(col(s"$pv$$from").as("src_uid"))))
            .select(col("start").as(s"$pv$$from"),
              col("reached").as(s"$pv$$to"), col("depth").as(s"$pv$$len"),
              col("path").as(strCol))
        else {
          // level sets seeded from the head endpoint's node set: only
          // walks FROM relevant sources enumerate (hub-safe). Each
          // level carries ONE deterministic witness path string per
          // (from, to) pair — the lexicographic min — so cardinality
          // stays the deduped level set (groupBy replaces distinct,
          // same shuffle) and `RETURN p` projects a real path value.
          val pathAt1 = concat(col(s"$pv$$from"), lit("|"), col(s"$pv$$rt"),
            lit("|"), col(s"$pv$$to"))
          val e1s = e1.join(headSeed, Seq(s"$pv$$from"), "left_semi")
            .withColumn(strCol, pathAt1)
            .groupBy(s"$pv$$from", s"$pv$$to")
            .agg(min(col(strCol)).as(strCol))
          var step = e1s
          var acc: Option[DataFrame] =
            if (lo <= 1) Some(e1s.withColumn(s"$pv$$len", lit(1))) else None
          for (k <- 2 to hi) {
            step = step
              .select(col(s"$pv$$from"), col(s"$pv$$to").as(s"$pv$$mid"),
                col(strCol))
              .join(e1.select(col(s"$pv$$from").as(s"$pv$$mid"),
                col(s"$pv$$to"), col(s"$pv$$rt")), s"$pv$$mid")
              .withColumn(strCol, concat(col(strCol), lit("|"),
                col(s"$pv$$rt"), lit("|"), col(s"$pv$$to")))
              .groupBy(s"$pv$$from", s"$pv$$to")
              .agg(min(col(strCol)).as(strCol))
            if (k >= lo) {
              val lev = step.withColumn(s"$pv$$len", lit(k))
              acc = Some(acc.fold(lev)(_.unionByName(lev)))
            }
          }
          // min over (len, witness): the struct min compares depth
          // first, then the string — one deterministic shortest path
          acc.get.groupBy(s"$pv$$from", s"$pv$$to")
            .agg(min(struct(col(s"$pv$$len"), col(strCol))).as(s"$pv$$w"))
            .select(col(s"$pv$$from"), col(s"$pv$$to"),
              col(s"$pv$$w").getField(s"$pv$$len").as(s"$pv$$len"),
              col(s"$pv$$w").getField(strCol).as(strCol))
        }
      val df = headFrame
        .join(reach, col(ns(headVar, "uid")) === col(s"$pv$$from"))
        .drop(s"$pv$$from")
        .join(nodeSide(tailPat, tailVar), col(s"$pv$$to") === col(ns(tailVar, "uid")))
        .drop(s"$pv$$to")
      pathVars += (pv -> s"$pv$$len")
      pathStrCols += pv -> strCol // unbounded too (witness fixpoint)
      (df, Set(headVar, tailVar))
    }

    /** (from, to) pairs reachable by lo..hi chained hops of `rel`'s
      * edge set: hi-1 chained equi-joins, depths >= lo unioned — path
      * multiplicity preserved, no iteration state on the driver. */
    private def varReach(rel: RelPat, lo: Int, hi: Int, nsCol: String,
                         withLen: Boolean = false,
                         withHops: Boolean = false,
                         seedFrom: Option[DataFrame] = None): DataFrame = {
      var e = edges
      if (rel.types.nonEmpty) e = e.filter(col("rel_type").isin(rel.types: _*))
      e = relPropsFilter(e, rel) // per-hop property map
      val (fromC, toC) = if (rel.forward) ("src_uid", "dst_uid") else ("dst_uid", "src_uid")
      val from = s"$nsCol$$from"; val to = s"$nsCol$$to"
      val hops = s"$nsCol$$hops"; val mid = s"$nsCol$$mid"
      // `withHops`: a BOUND rel variable materializes the walk's hop
      // list — one (src, rel_type, dst) struct per hop, walk
      // orientation (the undirected divergence) — accumulated by array
      // concat through the k-fold joins. Cost is walks × depth rows of
      // fixed-width structs, exactly the result Neo4j returns for `r`.
      def sel(a: String, b: String, src: DataFrame): DataFrame =
        if (withHops) src.select(col(a).as(from), col(b).as(to),
          array(struct(col(a).as("src"), col("rel_type"),
            col(b).as("dst"))).as(hops))
        else src.select(col(a).as(from), col(b).as(to))
      val e1 =
        // reversed half excludes self-loops: an undirected loop is ONE
        // match per hop, not two (Neo4j parity)
        if (rel.undirected) sel(fromC, toC, e).unionByName(
          sel(toC, fromC, e.filter(col(fromC) =!= col(toC))))
        else sel(fromC, toC, e)
      // each k-fold chain tags its constant depth when a named path
      // needs length(p); the column is a literal, so it costs nothing
      def tag(df: DataFrame, k: Int): DataFrame =
        if (withLen) df.withColumn(s"$nsCol$$len", lit(k)) else df
      // seeded enumeration: when the head endpoint is restricted (a
      // labeled/filtered start set), the FIRST hop semi-joins it so
      // walks from irrelevant sources never materialize — a hub graph
      // makes the unseeded 2-hop frame O(hub degree squared) per hub
      var step = seedFrom.fold(e1)(sd => e1.join(sd, Seq(from), "left_semi"))
      var acc: Option[DataFrame] = if (lo <= 1) Some(tag(step, 1)) else None
      for (k <- 2 to hi) {
        val joined = step
          .select((Seq(col(from), col(to).as(mid)) ++
            (if (withHops) Seq(col(hops)) else Nil)): _*)
          .join(e1.select((Seq(col(from).as(mid), col(to)) ++
            (if (withHops) Seq(col(hops).as(s"$hops#2")) else Nil)): _*), mid)
        step =
          if (withHops) joined.select(col(from), col(to),
            concat(col(hops), col(s"$hops#2")).as(hops))
          else joined.select(from, to)
        if (k >= lo) acc = Some(acc.fold(tag(step, k))(_.unionByName(tag(step, k))))
      }
      acc.get
    }

    /** Join `right` (a clause's frame) to `left` on shared variable
      * uids; duplicated shared-var columns are renamed with an exact
      * marker set (never a suffix heuristic — user property names may
      * end in any suffix) and dropped after the join. `extraCond`
      * rides the join condition itself (the OPTIONAL WHERE). */
    private def joinOnShared(left: DataFrame, right: DataFrame,
                             shared: Seq[String], joinType: String,
                             extraCond: Option[DataFrame => Column]): DataFrame = {
      val dupCols = right.columns.filter(c => shared.exists(v => c.startsWith(v + "$")))
      val renamed = dupCols.foldLeft(right)((d, c) => d.withColumnRenamed(c, c + "#dup"))
      var cond = shared.map(v => left(ns(v, "uid")) === renamed(ns(v, "uid") + "#dup"))
        .reduce(_ && _)
      extraCond.foreach(f => cond = cond && f(renamed))
      left.join(renamed, cond, joinType).drop(dupCols.map(_ + "#dup").toSeq: _*)
    }

    def compile(q: Query): DataFrame = compileWith(q, None, Set.empty, Nil)

    /** Correlated-subquery variant: `seed` pre-binds imported
      * variables (pattern vars ride their full namespaced column
      * families so inner clauses still reach `v.prop`; scalar aliases
      * ride as plain columns), and `corrCols` is the per-outer-row
      * correlation key the finish stage preserves — aggregates group
      * by it, ORDER BY + SKIP/LIMIT become a per-key row_number
      * window. */
    private def compileWith(q0: Query, seed: Option[DataFrame],
                            seedBound: Set[String],
                            corrCols: Seq[String]): DataFrame = {
      var df: DataFrame = seed.orNull
      var bound = seedBound
      // RETURN * / WITH * expansion: every NAMED pattern/relationship
      // variable in scope plus the live scalar aliases, name-sorted
      // (deterministic; the driver compare is column-order-blind)
      def starItems(frame: DataFrame): Seq[RetItem] = {
        val pats = bound.toSeq.filterNot(_.startsWith("_anon"))
        // var-length rel bindings and named paths live OUTSIDE `bound`
        // (their state is materialized scratch columns, not a uid
        // family) — * includes them when their columns ride the frame,
        // matching Neo4j scope instead of silently narrowing; a final
        // RETURN of a path variable refuses loudly (exprCol).
        val hops = varLenHops.collect {
          case (v, c) if frame.columns.contains(c) => v
        }.toSeq
        val paths = pathVars.collect {
          case (v, c) if frame.columns.contains(c) => v
        }.toSeq
        val scals = frame.columns
          .filter(c => scalarVars(c) && !c.contains("$") && !c.startsWith("_"))
          .sorted.toSeq
        ((pats ++ hops ++ paths).sorted ++ scals)
          .distinct.map(v => RetItem(EVar(v), None, v))
      }
      def applyClause(cl: MatchClause): Unit = {
        // a clause's comma chains join on shared vars (inner, one pattern)
        var (cdf, cbound) = cl.shortest match {
          case Some(pv) => compileShortest(cl.chains.head, pv, cl.shortestAll)
          case None => compileChain(cl.chains.head, cl.named)
        }
        cl.chains.tail.foreach { ch =>
          val (chDf, chBound) = compileChain(ch)
          val shared = (cbound & chBound).toSeq.sorted
          if (shared.isEmpty) {
            // legal only when the clause WHERE correlates the chains
            // (pattern predicate spanning both / EXISTS {} touching
            // both) — applied right after the join below
            require(cl.where.exists(p => predLinks(p, cbound, chBound)),
              "disconnected comma patterns would be a cross product; " +
                "share a variable or correlate them in WHERE")
            cdf = cdf.crossJoin(chDf)
          } else cdf = joinOnShared(cdf, chDf, shared, "inner", None)
          cbound ++= chBound
        }
        if (df == null) {
          df = cdf
          cl.where.foreach(p => df = applyPred(df, p, negated = false))
        } else {
          val shared = (bound & cbound).toSeq.sorted
          if (shared.isEmpty) {
            // no shared pattern variable: legal only when the clause's
            // WHERE correlates it to the pipeline's scalar columns
            // (`UNWIND $keys AS k MATCH (n) WHERE n.key = k`) — the
            // equality lands in the join condition, so Catalyst plans
            // an equi-join, not a cartesian (PlanSweepSpec's law)
            require(!cl.optional,
              "OPTIONAL MATCH needs a shared variable with the rows so far")
            require(cl.where.exists(refsScalar) ||
                cl.where.exists(p => predLinks(p, bound, cbound)),
              "disconnected MATCH patterns would be a cross product; " +
                "share a variable or correlate via WHERE on a WITH/UNWIND " +
                "alias or a pattern predicate spanning both")
            df = df.crossJoin(cdf)
            cl.where.foreach(p => df = applyPred(df, p, negated = false))
            bound ++= cbound
            return
          }
          if (cl.optional) {
            // Cypher scoping: OPTIONAL MATCH's WHERE filters the
            // matches INSIDE the left join — unmatched rows stay
            // null-padded instead of being dropped post-join. Pattern
            // predicates / COUNT {} subqueries in that WHERE pre-join
            // their flag/count columns onto the CLAUSE frame, so the
            // whole predicate stays a Column inside the join condition
            val pats = cl.where.toSeq.flatMap(collectPatterns)
            // a pattern predicate here compiles against the CLAUSE
            // frame; an endpoint bound only in the OUTER pipeline
            // would silently degrade to an existential — refuse and
            // point at the correlated form instead
            pats.foreach { pp =>
              (Seq(pp.v) ++ pp.targetVar).foreach { r =>
                require(!(df.columns.contains(ns(r, "uid")) &&
                    !cdf.columns.contains(ns(r, "uid"))),
                  s"OPTIONAL MATCH WHERE: pattern predicate endpoint '$r' " +
                    "is bound outside this clause; write the pattern into " +
                    "the OPTIONAL MATCH itself")
              }
            }
            val cnts = cl.where.toSeq.flatMap(countSubsP)
            val exs = cl.where.toSeq.flatMap(collectExistsChains)
            val (cdf1, flags) = joinPatternFlags(cdf, pats)
            val (cdf2, cmap) = joinCountSubs(cdf1, cnts)
            val (cdf3, emap) = joinExistsChainFlags(cdf2, exs)
            val extra = cl.where.map { p => (_: DataFrame) =>
              patternFlags = flags; countSubCols = cmap; existsFlags = emap
              try predCol(p)
              finally {
                patternFlags = Map.empty; countSubCols = Map.empty
                existsFlags = Map.empty
              }
            }
            df = joinOnShared(df, cdf3, shared, "left_outer", extra)
            val scratch = (flags.values ++ cmap.values ++ emap.values).toSeq
            if (scratch.nonEmpty) df = df.drop(scratch: _*)
          } else {
            df = joinOnShared(df, cdf, shared, "inner", None)
            cl.where.foreach(p => df = applyPred(df, p, negated = false))
          }
        }
        bound ++= cbound
      }
      q0.stages.foreach {
        case SMatch(cl) => applyClause(cl)
        case SWith(ws0) =>
          require(df != null, "WITH before any MATCH/UNWIND has no rows to project")
          val ws =
            if (!ws0.star) ws0
            else ws0.copy(items = starItems(df) ++ ws0.items)
          df = applyWith(ws, df, bound, corrCols)
          // carried pattern variables only — scalar aliases are plain
          // columns, never join keys for later MATCHes
          bound = ws.items.collect {
            case RetItem(EVar(v), None, _) if !scalarVars(v) => v
          }.toSet
          if (corrCols.nonEmpty && (ws.skip.isDefined || ws.limit.isDefined)) {
            // per-row execution: an interior WITH ... SKIP/LIMIT inside
            // a correlated CALL paginates PER IMPORT BINDING, so it
            // compiles to the same row_number window as the finish
            // stage, never a global limit
            require(ws.orderBy.nonEmpty,
              "correlated CALL: WITH ... SKIP/LIMIT needs ORDER BY " +
                "(per-binding pagination must be deterministic)")
            val sortCols = ws.orderBy.map { case (e, asc) =>
              if (asc) exprCol(e).asc_nulls_last else exprCol(e).desc_nulls_first
            }
            val w = org.apache.spark.sql.expressions.Window
              .partitionBy(corrCols.map(c => col("`" + c + "`")): _*)
              .orderBy(sortCols: _*)
            val lo = ws.skip.getOrElse(0L)
            df = df.withColumn("_rn$", row_number().over(w))
              .filter(col("_rn$") > lit(lo) &&
                ws.limit.fold(lit(true))(n => col("_rn$") <= lit(lo + n)))
              .drop("_rn$")
            ws.where.foreach(p => df = applyPred(df, p, negated = false))
          } else {
          // WITH sub-clauses in openCypher order: ORDER BY, then
          // SKIP/LIMIT (ORDER BY + LIMIT = one TakeOrdered top-N),
          // then WHERE (HAVING semantics on the paginated frame;
          // pattern predicates on carried node vars still compile to
          // semi/anti joins on their uid)
          if (ws.orderBy.nonEmpty)
            df = df.orderBy(ws.orderBy.map { case (e, asc) =>
              if (asc) exprCol(e).asc_nulls_last else exprCol(e).desc_nulls_first
            }: _*)
          ws.skip.foreach(n => df = df.offset(n.toInt))
          ws.limit.foreach(n => df = df.limit(n.toInt))
          ws.where.foreach(p => df = applyPred(df, p, negated = false))
          }
        case SUnwind(e, alias) =>
          require(!scalarVars(alias) && !bound(alias),
            s"UNWIND alias '$alias' is already bound")
          // one output row per list element; at the pipeline head the
          // list (a literal or $param) seeds a single-row frame
          df =
            if (df == null)
              nodes.sparkSession.range(1).select(explode(exprCol(e)).as(alias))
            else df.withColumn(alias, explode(exprCol(e)))
          scalarVars += alias
        case SCall(inner, imports) if imports.nonEmpty =>
          // correlated subquery: CALL { WITH a, b ... }. The inner
          // plan runs ONCE over the DISTINCT import bindings (the
          // subquery is a pure function of its imports) and joins
          // back on the correlation key — the distributed equivalent
          // of Neo4j's per-row execution: one shuffle-join instead of
          // N driver-side invocations, and NOTHING rides a broadcast
          // unless Catalyst/AQE decides the side is small
          require(df != null,
            "correlated CALL { WITH ... } needs rows to import from")
          imports.foreach { v =>
            require(!relVars(v),
              s"CALL { WITH $v }: relationship variables cannot be " +
                "imported (no stable single-column key); import the " +
                "endpoint nodes instead")
            require(bound(v) || scalarVars(v),
              s"CALL { WITH $v }: '$v' is not bound")
          }
          val nodeImports = imports.filter(v => bound(v) && !scalarVars(v))
          val scalarImports = imports.filterNot(nodeImports.contains)
          val seedCols = nodeImports.flatMap(v =>
            df.columns.filter(_.startsWith(v + "$"))) ++ scalarImports
          val corr = nodeImports.map(v => ns(v, "uid")) ++ scalarImports
          val seedDf = df.select(seedCols.map(c => col("`" + c + "`")): _*).distinct()
          val sub = new Compiler(nodes, edges, params)
          sub.scalarVars ++= scalarImports
          val idf = sub.compileWith(inner, Some(seedDf), nodeImports.toSet, corr)
          val newCols = idf.columns.filterNot(corr.contains)
          // name hygiene: inner outputs must not shadow ANY in-scope
          // name — materialized columns, pattern variables, scalars
          val clash = newCols.toSet intersect
            (df.columns.toSet ++ bound ++ relVars ++ scalarVars)
          require(clash.isEmpty,
            s"CALL { } returns names already bound: ${clash.mkString(", ")}")
          // Join-back semantics (Neo4j per-row execution): a subquery
          // whose RETURN items are ALL aggregates yields exactly ONE
          // row per binding even when zero rows reach its RETURN —
          // count()/sum() evaluate to 0, collect() to [], min/max/avg
          // to null. The keyed aggregation above only produces rows
          // for bindings that matched, so those bodies join back LEFT
          // and the zero-match bindings are refilled with each item's
          // zero-row value (aggregate sub-terms replaced by their
          // empty-input results, folded in the OUTER scope so
          // imported scalars still resolve). Non-aggregate bodies
          // keep the inner join: zero subquery rows eliminates the
          // outer row (the openCypher CALL contract).
          val aggOnly = inner.items.nonEmpty &&
            inner.items.forall(i => hasAgg(i.expr))
          df = df.join(idf, corr, if (aggOnly) "left_outer" else "inner")
          if (aggOnly) {
            val joinedSchema = df.schema
            inner.items.foreach { i =>
              val n = i.alias.getOrElse(i.text)
              if (newCols.contains(n))
                scala.util.Try(exprCol(zeroRowExpr(i.expr))).foreach { zc =>
                  df = df.withColumn(n, coalesce(col("`" + n + "`"),
                    zc.cast(joinedSchema(n).dataType)))
                }
            }
          }
          scalarVars ++= newCols
        case SCall(inner, _) =>
          // fresh scope, like a UNION part; output columns join the
          // pipeline as scalar aliases
          val idf = new Compiler(nodes, edges, params).compile(inner)
          if (df != null) {
            val clash = idf.columns.toSet intersect
              (df.columns.toSet ++ bound ++ relVars ++ scalarVars)
            require(clash.isEmpty,
              s"CALL { } returns names already bound: ${clash.mkString(", ")}")
          }
          // uncorrelated block: rows cross-multiply the incoming frame
          // (Neo4j's per-row execution of an import-free subquery). The
          // inner frame broadcasts ONLY when provably small — a keyless
          // aggregate (one row by construction) or an explicit LIMIT —
          // turning the cross-multiply into a BroadcastNestedLoopJoin
          // (PlanSweepSpec's law). An arbitrary-cardinality inner
          // result must NOT ship through the driver as a broadcast at
          // 100 TB: it crossJoins plainly and Catalyst picks the
          // strategy from its own size estimates.
          val innerSmall = inner.limit.exists(_ <= 100000) ||
            inner.items.forall(i => hasAgg(i.expr))
          df =
            if (df == null) idf
            else if (innerSmall) df.crossJoin(broadcast(idf))
            else df.crossJoin(idf)
          scalarVars ++= idf.columns
      }

      // RETURN *: expand to the in-scope variables now that every
      // stage has run (the set is only known post-pipeline)
      val q =
        if (!q0.star) q0
        else {
          require(df != null, "RETURN * needs a reading clause")
          val expanded = starItems(df)
          val clash = expanded.map(_.text).toSet intersect
            q0.items.map(i => i.alias.getOrElse(i.text)).toSet
          require(clash.isEmpty,
            s"RETURN *: extra items shadow variables: ${clash.mkString(", ")}")
          q0.copy(items = expanded ++ q0.items)
        }
      // COUNT {} subqueries in RETURN items / ORDER BY keys pre-join
      // their per-uid count columns onto the frame (projection keeps
      // only the named output, so the scratch columns never surface)
      val retCnts = (q.items.map(_.expr) ++ q.orderBy.map(_.expr)).flatMap(countSubsE)
      if (retCnts.nonEmpty) {
        val (d, cmap) = joinCountSubs(df, retCnts)
        df = d; countSubCols = countSubCols ++ cmap
      }
      // pattern predicates / EXISTS chains inside RETURN/ORDER BY
      // expressions (CASE conditions etc.) pre-join flag columns the
      // same way — the projection keeps only named outputs, so the
      // scratch columns never surface
      val retPats = (q.items.map(_.expr) ++ q.orderBy.map(_.expr)).flatMap(patternsE)
      val retExs = (q.items.map(_.expr) ++ q.orderBy.map(_.expr)).flatMap(existsChainsE)
      val retQs = (q.items.map(_.expr) ++ q.orderBy.map(_.expr)).flatMap(lambdaQuantsE)
      if (retPats.nonEmpty || retExs.nonEmpty || retQs.nonEmpty) {
        val (d1, flags) = joinPatternFlags(df, retPats)
        val (d2, emap) = joinExistsChainFlags(d1, retExs)
        patternFlags = patternFlags ++ flags
        existsFlags = existsFlags ++ emap
        val (d3, qmap) = joinLambdaQuantFlags(d2, retQs)
        df = d3
        quantFlags = quantFlags ++ qmap
      }
      val aggItems = q.items.filter(i => hasAgg(i.expr))
      val outName = (i: RetItem) => i.alias.getOrElse(i.text)
      if (corrCols.nonEmpty) {
        // ---- correlated-CALL finish: RETURN evaluates once per
        // import binding — the correlation key survives into the
        // output frame, aggregates group by it, and ORDER BY +
        // SKIP/LIMIT compile to a per-key row_number window (one
        // window shuffle on the key, not N per-row invocations)
        val corr = corrCols.map(c => col("`" + c + "`"))
        val isOut = (k: OrderKey) =>
          q.items.exists(i => i.text == k.ref || i.alias.contains(k.ref))
        var res =
          if (aggItems.isEmpty) {
            // non-returned ORDER BY keys ride as temp columns so the
            // window can sort by them post-projection
            val ordTemps = q.orderBy.zipWithIndex.collect {
              case (k, ix) if !isOut(k) => s"_ord$$$ix" -> exprCol(k.expr)
            }
            val base = df.select(corr ++
              q.items.map(i => exprCol(i.expr).as(outName(i))) ++
              ordTemps.map { case (n, c) => c.as(n) }: _*)
            // DISTINCT inside the subquery dedupes per invocation =
            // per import binding — the key rides the distinct
            if (q.distinct) base.distinct() else base
          } else {
            q.orderBy.foreach(k => require(isOut(k),
              "correlated CALL: ORDER BY keys must be returned items " +
                "when RETURN aggregates"))
            val keys = q.items.filterNot(i => hasAgg(i.expr))
            val keyCols = keys.map(i => exprCol(i.expr).as(outName(i)))
            val lifted = scala.collection.mutable.ArrayBuffer[(String, Expr)]()
            val rewritten = aggItems.map(i => i -> liftAggs(i.expr, lifted))
            val aggCols = lifted.toSeq.map { case (tmp, agg) => aggCol(agg).as(tmp) }
            val grouped = df.groupBy(corr ++ keyCols: _*)
              .agg(aggCols.head, aggCols.tail: _*)
            scalarVars ++= lifted.map(_._1)
            val reMap = rewritten.toMap
            grouped.select(corr ++ q.items.map { i =>
              if (hasAgg(i.expr)) exprCol(reMap(i)).as(outName(i))
              else col("`" + outName(i) + "`")
            }: _*)
          }
        if (q.skip.isDefined || q.limit.isDefined) {
          require(q.orderBy.nonEmpty,
            "correlated CALL with SKIP/LIMIT needs ORDER BY " +
              "(per-binding top-k must be deterministic)")
          val sortCols = q.orderBy.zipWithIndex.map { case (k, ix) =>
            val name = q.items.find(i => i.text == k.ref || i.alias.contains(k.ref))
              .map(outName).getOrElse(s"_ord$$$ix")
            if (k.asc) col("`" + name + "`").asc_nulls_last
            else col("`" + name + "`").desc_nulls_first
          }
          val w = org.apache.spark.sql.expressions.Window
            .partitionBy(corr: _*).orderBy(sortCols: _*)
          val lo = q.skip.getOrElse(0L)
          res = res.withColumn("_rn$", row_number().over(w))
            .filter(col("_rn$") > lit(lo) &&
              q.limit.fold(lit(true))(n => col("_rn$") <= lit(lo + n)))
            .drop("_rn$")
        }
        return res.drop(res.columns.filter(_.startsWith("_ord$")).toIndexedSeq: _*)
      }
      val result =
        if (aggItems.isEmpty) {
          val cols = q.items.map(i => exprCol(i.expr).as(outName(i)))
          val base = df.select(cols: _*)
          if (q.distinct) base.distinct() else base
        } else {
          // Cypher implicit grouping: group by all non-aggregate items.
          // Nested aggregates (count(*) * 2) lift to temp columns: one
          // hash aggregate computes the temps, a projection on top
          // applies the surrounding expression.
          val keys = q.items.filterNot(i => hasAgg(i.expr))
          val keyCols = keys.map(i => exprCol(i.expr).as(outName(i)))
          val lifted = scala.collection.mutable.ArrayBuffer[(String, Expr)]()
          val rewritten = aggItems.map(i => i -> liftAggs(i.expr, lifted))
          val aggCols = lifted.toSeq.map { case (tmp, agg) => aggCol(agg).as(tmp) }
          val grouped =
            if (keys.isEmpty) df.agg(aggCols.head, aggCols.tail: _*)
            else df.groupBy(keyCols: _*).agg(aggCols.head, aggCols.tail: _*)
          scalarVars ++= lifted.map(_._1)
          val reMap = rewritten.toMap
          // restore RETURN item order (backticks: names may contain dots)
          grouped.select(q.items.map { i =>
            if (hasAgg(i.expr)) exprCol(reMap(i)).as(outName(i))
            else col("`" + outName(i) + "`")
          }: _*)
        }
      val allKeysOutput = q.orderBy.forall(k =>
        q.items.exists(i => i.text == k.ref || i.alias.contains(k.ref)))
      val ordered =
        if (q.orderBy.isEmpty) result
        else if (allKeysOutput || aggItems.nonEmpty || q.distinct) {
          // sort the projected frame by output column (aggregation and
          // DISTINCT destroy non-output columns, so those REQUIRE the
          // key to be a returned item — same rule as Cypher)
          require(allKeysOutput,
            "ORDER BY keys must be returned items when RETURN aggregates or is DISTINCT")
          result.orderBy(q.orderBy.map { k =>
            val alias = q.items.find(i => i.text == k.ref || i.alias.contains(k.ref))
              .map(outName).getOrElse(k.ref)
            if (k.asc) col("`" + alias + "`").asc_nulls_last
            else col("`" + alias + "`").desc_nulls_first
          }: _*)
        } else {
          // some key is NOT a returned item (ORDER BY n.age with only
          // n.name returned): sort the pre-projection frame, then
          // re-project — Project over Sort preserves the global order
          val keyCols = q.orderBy.map { k =>
            val e = q.items.find(i => i.alias.contains(k.ref) || i.text == k.ref)
              .map(_.expr).getOrElse(k.expr)
            if (k.asc) exprCol(e).asc_nulls_last else exprCol(e).desc_nulls_first
          }
          df.orderBy(keyCols: _*)
            .select(q.items.map(i => exprCol(i.expr).as(outName(i))): _*)
        }
      val skipped = q.skip.fold(ordered)(n => ordered.offset(n.toInt))
      q.limit.fold(skipped)(n => skipped.limit(n.toInt))
    }

    /** WITH projection/aggregation: a bare pattern variable passes
      * through with its full namespaced column family (so later
      * clauses and RETURN still reach `v.prop`); every other item
      * needs an `AS` alias and becomes a plain scalar column. Any
      * aggregate item triggers Cypher's implicit grouping by the
      * non-aggregate items — grouping a pass-through variable groups
      * by ALL its columns (functionally dependent on uid, so one hash
      * aggregate, no re-join to recover properties). */
    private def applyWith(ws: WithStage, in0: DataFrame, bound: Set[String],
                          corrCols: Seq[String] = Nil): DataFrame = {
      // COUNT {} subqueries among the WITH items pre-join their count
      // columns, same contract as the RETURN twin
      val in = {
        val wCnts = ws.items.map(_.expr).flatMap(countSubsE)
        val withCnts =
          if (wCnts.isEmpty) in0
          else {
            val (d, cmap) = joinCountSubs(in0, wCnts)
            countSubCols = countSubCols ++ cmap
            d
          }
        // pattern predicates / EXISTS chains inside WITH item
        // expressions (CASE conditions etc.): same flag pre-join as
        // the RETURN twin
        val wPats = ws.items.map(_.expr).flatMap(patternsE)
        val wExs = ws.items.map(_.expr).flatMap(existsChainsE)
        val wQs = ws.items.map(_.expr).flatMap(lambdaQuantsE)
        if (wPats.isEmpty && wExs.isEmpty && wQs.isEmpty) withCnts
        else {
          val (d1, flags) = joinPatternFlags(withCnts, wPats)
          val (d2, emap) = joinExistsChainFlags(d1, wExs)
          patternFlags = patternFlags ++ flags
          existsFlags = existsFlags ++ emap
          val (d3, qmap) = joinLambdaQuantFlags(d2, wQs)
          quantFlags = quantFlags ++ qmap
          d3
        }
      }
      val (varItems, exprItems) = ws.items.partition {
        i => i.expr.isInstanceOf[EVar] && i.alias.isEmpty
      }
      val passVars = varItems.map { i =>
        val v = i.expr.asInstanceOf[EVar].name
        require(bound(v) || scalarVars(v) || pathVars.contains(v) ||
            varLenHops.contains(v) || varLenVars.contains(v),
          s"WITH references unbound variable $v")
        v
      }
      exprItems.foreach(i => require(i.alias.isDefined,
        s"WITH item '${i.text}' needs an AS alias"))
      val aggItems = exprItems.filter(i => hasAgg(i.expr))
      val keyExprItems = exprItems.filterNot(i => hasAgg(i.expr))
      // a path variable's state is its pathlen column; a var-length
      // rel binding's is its rellen/relhops pair — WITH passes those
      // through so length(p)/size(r)/[h IN r | ...] resolve later
      def scratchCols(v: String): Seq[String] =
        (pathVars.get(v).toSeq ++ pathStrCols.get(v).toSeq ++
          varLenVars.get(v).toSeq ++
          varLenHops.get(v).toSeq).filter(in.columns.contains)
      def varCols(v: String): Seq[Column] =
        if (scalarVars(v)) Seq(col(v))
        else if (scratchCols(v).nonEmpty) scratchCols(v).map(c => col("`" + c + "`"))
        else in.columns.filter(_.startsWith(v + "$")).toSeq.map(col)
      val keyNames = passVars.flatMap { v =>
        if (scalarVars(v)) Seq(v)
        else if (scratchCols(v).nonEmpty) scratchCols(v)
        else in.columns.filter(_.startsWith(v + "$")).toSeq
      } ++ keyExprItems.map(_.alias.get)
      // inside a correlated CALL body, the correlation key threads
      // through every interior WITH even when the user's projection
      // drops the imported variable: aggregates then group PER
      // BINDING (the per-row execution contract) and the finish stage
      // still finds its join-back key. Columns already projected
      // (the import var carried explicitly) are not duplicated.
      val corrKeep = corrCols.filterNot(keyNames.contains)
        .filter(in.columns.contains)
      val corrKeepCols = corrKeep.map(c => col("`" + c + "`"))
      val keyCols = passVars.flatMap(varCols) ++
        keyExprItems.map(i => exprCol(i.expr).as(i.alias.get))
      val out =
        if (aggItems.nonEmpty) {
          // nested aggregates lift to temps (see the RETURN twin)
          val lifted = scala.collection.mutable.ArrayBuffer[(String, Expr)]()
          val rewritten = aggItems.map(i => i -> liftAggs(i.expr, lifted))
          val aggCols = lifted.toSeq.map { case (tmp, agg) => aggCol(agg).as(tmp) }
          val grouped = in.groupBy(corrKeepCols ++ keyCols: _*)
            .agg(aggCols.head, aggCols.tail: _*)
          scalarVars ++= lifted.map(_._1)
          grouped.select(corrKeepCols ++ keyNames.map(c => col("`" + c + "`")) ++
            rewritten.map { case (i, re) => exprCol(re).as(i.alias.get) }: _*)
        } else {
          val sel = in.select(corrKeepCols ++ keyCols: _*)
          if (ws.distinct) sel.distinct() else sel
        }
      scalarVars ++= exprItems.flatMap(_.alias)
      out
    }

    /** WHERE compilation. Pattern predicates become semi/anti joins on
      * the variable's uid; everything else is a Column filter. NOT
      * distributes into pattern predicates (anti join), else negates
      * the Column. */
    private def applyPred(df: DataFrame, p: Pred, negated: Boolean): DataFrame = p match {
      case PNot(inner) => applyPred(df, inner, !negated)
      case PAnd(l, r) if !negated => applyPred(applyPred(df, l, false), r, false)
      case pp @ PPattern(v, types, fwd, tl, und, tv0) =>
        val joinType = if (negated) "left_anti" else "left_semi"
        val vBound = df.columns.contains(ns(v, "uid"))
        val tBound = tv0.filter(tv => df.columns.contains(ns(tv, "uid")))
        tBound match {
          case Some(tv) if vBound =>
            // both endpoints bound: (w)-[:R]->(s) correlates the PAIR —
            // one distinct edge-pair probe, two-key semi/anti join
            val pair = pairProbe(types, fwd, tl, und)
            df.join(pair, df(ns(v, "uid")) === pair("_src") &&
              df(ns(tv, "uid")) === pair("_dst"), joinType)
          case Some(tv) =>
            // only the TARGET is bound ((x)-[:R]->(s:Label), x
            // existential): flip the orientation and probe the
            // target's endpoint set. A written label on the BOUND
            // endpoint still binds (Neo4j parity): it rides the join
            // condition, so the anti form keeps rows whose endpoint
            // fails the label — NOT(edge ∧ label) — instead of
            // silently dropping the check.
            val probe = patternProbe(types, !fwd, None, und)
            var cond = df(ns(tv, "uid")) === probe("_probe")
            tl.foreach(l => cond = cond && df(ns(tv, "label")) === lit(l))
            df.join(probe, cond, joinType)
          case None => // unbound/absent target = existential, like ()
            val probe = patternProbe(types, fwd, tl, und)
            df.join(probe, df(ns(v, "uid")) === probe("_probe"), joinType)
        }
      case PExistsChain(chains, wh) =>
        // multi-hop existential: compile the pattern into its own
        // frame (the SAME chain compiler MATCH uses), apply the inner
        // WHERE there, then semi/anti join the outer frame on every
        // shared variable's uid. The probe ships DISTINCT shared-key
        // tuples — never the match multiset — so a high-multiplicity
        // pattern cannot widen the outer frame.
        val (cdf, shared) = chainFrame(chains, wh, df.columns, "EXISTS { }")
        val exProbe = cdf
          .select(shared.map(v => col(ns(v, "uid")).as(s"_ex$$$v")): _*)
          .distinct()
        val exCond = shared.map(v => df(ns(v, "uid")) === exProbe(s"_ex$$$v"))
          .reduce(_ && _)
        df.join(exProbe, exCond, if (negated) "left_anti" else "left_semi")
      case other =>
        // pattern predicates nested under OR/XOR/NOT-of-OR positions
        // cannot be whole-frame semi/anti joins, and COUNT {}
        // subqueries are values, not joins — materialize each as a
        // flag / count column (one keyed left join per distinct
        // pattern) and compile the boolean expression over them.
        // Multi-hop EXISTS {} chains take the same route: each chain's
        // DISTINCT shared-key probe becomes one boolean flag column.
        val pats = collectPatterns(other)
        val cnts = countSubsP(other)
        val exs = collectExistsChains(other)
        val lamQs = collectLambdaQuants(other)
        if (pats.isEmpty && cnts.isEmpty && exs.isEmpty && lamQs.isEmpty) {
          val c = predCol(other)
          df.filter(if (negated) !c else c)
        } else {
          val (d1, flags) = joinPatternFlags(df, pats)
          val (d2, cmap) = joinCountSubs(d1, cnts)
          val (d3, emap) = joinExistsChainFlags(d2, exs)
          patternFlags = flags; countSubCols = cmap; existsFlags = emap
          try {
            // lambda-bound quantifiers explode AFTER the outer flag
            // joins (their per-element bodies may read outer flags)
            val (d4, qmap) = joinLambdaQuantFlags(d3, lamQs)
            quantFlags = qmap
            val c = predCol(other)
            d4.filter(if (negated) !c else c)
              .drop((flags.values ++ cmap.values ++ emap.values ++
                qmap.values).toSeq: _*)
          } finally {
            patternFlags = Map.empty; countSubCols = Map.empty
            existsFlags = Map.empty; quantFlags = Map.empty
          }
        }
    }

    /** Compile a multi-hop EXISTS/COUNT subquery's chains into one
      * matched frame (inner WHERE applied) plus the variables shared
      * with the outer scope — the common front half of the semi-join,
      * flag-column, and count-column compilations. */
    private def chainFrame(chains: Seq[Chain], wh: Option[Pred],
                           outerCols: Array[String], what: String)
        : (DataFrame, Seq[String]) = {
      var (cdf, cbound) = compileChain(chains.head)
      chains.tail.foreach { ch =>
        val (chDf, chBound) = compileChain(ch)
        val shared = (cbound & chBound).toSeq.sorted
        require(shared.nonEmpty,
          s"disconnected $what patterns would be a cross product; share a variable")
        cdf = joinOnShared(cdf, chDf, shared, "inner", None)
        cbound ++= chBound
      }
      wh.foreach(p => cdf = applyPred(cdf, p, negated = false))
      val shared = cbound.toSeq
        .filter(v => outerCols.contains(ns(v, "uid"))).sorted
      require(shared.nonEmpty,
        s"$what must share at least one variable with the outer MATCH")
      (cdf, shared)
    }

    /** Multi-hop EXISTS {} chains anywhere inside a boolean tree. */
    private def collectExistsChains(p: Pred): Seq[PExistsChain] = p match {
      case pe: PExistsChain => Seq(pe)
      case PAnd(l, r) => collectExistsChains(l) ++ collectExistsChains(r)
      case POr(l, r) => collectExistsChains(l) ++ collectExistsChains(r)
      case PXor(l, r) => collectExistsChains(l) ++ collectExistsChains(r)
      case PNot(i) => collectExistsChains(i)
      case PBoolE(e) => existsChainsE(e)
      // same rule as collectPatterns: chains over OUTER variables
      // inside a quantifier body flag-join; chains touching the
      // lambda variable stay uncollected and refuse
      case PQuant(_, qv, lst, w) =>
        (existsChainsE(lst) ++ collectExistsChains(w)).filterNot { pe =>
          pe.chains.exists(c => c.head.v.contains(qv) ||
            c.hops.exists { case (r, n) =>
              r.v.contains(qv) || n.v.contains(qv) })
        }
      case _ => Seq.empty
    }

    /** Left-join one boolean flag column per distinct EXISTS {} chain
      * (its DISTINCT shared-key probe — never the match multiset), so
      * the WHERE tree can combine chains under OR/XOR/NOT freely. */
    private def joinExistsChainFlags(df0: DataFrame, exs: Seq[PExistsChain])
        : (DataFrame, Map[PExistsChain, String]) = {
      var d = df0
      val m = exs.distinct.zipWithIndex.map { case (pe, i) =>
        val flag = s"_exflag$$$i"
        val (cdf, shared) = chainFrame(pe.chains, pe.where, d.columns, "EXISTS { }")
        val probe = cdf
          .select(shared.map(v => col(ns(v, "uid")).as(s"$flag$$$v")): _*)
          .distinct()
          .withColumn(flag, lit(true))
        val cond = shared.map(v => d(ns(v, "uid")) === probe(s"$flag$$$v"))
          .reduce(_ && _)
        d = d.join(probe, cond, "left_outer")
          .drop(shared.map(v => s"$flag$$$v"): _*)
        pe -> flag
      }.toMap
      (d, m)
    }

    /** Raw pattern/chain collectors — [[collectPatterns]] /
      * [[collectExistsChains]] WITHOUT the quantifier-body filtering.
      * Used only to DETECT lambda-bound patterns, which route to the
      * explode compilation ([[joinLambdaQuantFlags]]) instead of the
      * old refusal. */
    private def rawPatterns(p: Pred): Seq[PPattern] = p match {
      case pp: PPattern => Seq(pp)
      case PAnd(l, r) => rawPatterns(l) ++ rawPatterns(r)
      case POr(l, r) => rawPatterns(l) ++ rawPatterns(r)
      case PXor(l, r) => rawPatterns(l) ++ rawPatterns(r)
      case PNot(i) => rawPatterns(i)
      case PBoolE(e) => patternsE(e)
      case PQuant(_, _, _, w) => rawPatterns(w)
      case _ => Seq.empty
    }
    private def rawChains(p: Pred): Seq[PExistsChain] = p match {
      case pe: PExistsChain => Seq(pe)
      case PAnd(l, r) => rawChains(l) ++ rawChains(r)
      case POr(l, r) => rawChains(l) ++ rawChains(r)
      case PXor(l, r) => rawChains(l) ++ rawChains(r)
      case PNot(i) => rawChains(i)
      case PBoolE(e) => existsChainsE(e)
      case PQuant(_, _, _, w) => rawChains(w)
      case _ => Seq.empty
    }
    private def chainTouches(pe: PExistsChain, qv: String): Boolean =
      pe.chains.exists(c => c.head.v.contains(qv) ||
        c.hops.exists { case (r, n) => r.v.contains(qv) || n.v.contains(qv) })
    /** The quantifier body's patterns / EXISTS chains that bind its
      * OWN lambda variable — the parts the HOF `filter` route cannot
      * evaluate (a join per element). */
    private def lambdaBound(q: PQuant): (Seq[PPattern], Seq[PExistsChain]) =
      (rawPatterns(q.where).filter(pp =>
         pp.v == q.v || pp.targetVar.contains(q.v)),
       rawChains(q.where).filter(chainTouches(_, q.v)))
    /** Top-level quantifiers in this tree that need the explode route.
      * Does not recurse into quantifier BODIES — a lambda-bound
      * quantifier nested inside another quantifier keeps the loud
      * refusal (its row scope is an inner element, not the frame). */
    private def collectLambdaQuants(p: Pred): Seq[PQuant] = p match {
      case q: PQuant =>
        val (ps, cs) = lambdaBound(q)
        if (ps.nonEmpty || cs.nonEmpty) Seq(q) else Seq.empty
      case PAnd(l, r) => collectLambdaQuants(l) ++ collectLambdaQuants(r)
      case POr(l, r) => collectLambdaQuants(l) ++ collectLambdaQuants(r)
      case PXor(l, r) => collectLambdaQuants(l) ++ collectLambdaQuants(r)
      case PNot(i) => collectLambdaQuants(i)
      case _ => Seq.empty
    }

    /** Quantifier bodies that bind the LAMBDA variable inside a
      * pattern predicate or EXISTS {} chain — the last flag-column
      * hole: the codegen'd higher-order `filter` cannot run a join per
      * element, so the list EXPLODES (rowid-keyed, all outer columns
      * carried), each element masquerades as a bound node variable
      * (its uid/label columns synthesized from the element value),
      * the EXISTING flag-join machinery compiles the lambda-bound
      * patterns/chains against it, the body evaluates per element
      * over those flags, and the match count re-aggregates by rowid —
      * the COLLECT {} machinery's shape. Scale: one explode + the
      * same DISTINCT probes outer patterns use + one keyed
      * count-aggregate; never per-row subqueries. */
    private def joinLambdaQuantFlags(d0: DataFrame, qs: Seq[PQuant])
        : (DataFrame, Map[PQuant, String]) = {
      var d = d0
      val m = qs.distinct.zipWithIndex.map { case (q, i) =>
        val flag = s"_qntflag$$$i"
        val rid = s"$flag$$rid"; val szC = s"$flag$$sz"
        val elemC = s"$flag$$elem"; val cntC = s"$flag$$n"
        d = d.withColumn(rid, monotonically_increasing_id())
          .withColumn(szC, size(exprCol(q.list)))
        var ex = d.select(col("*"), explode(exprCol(q.list)).as(elemC))
        // the element's node identity: identity structs (collect(n),
        // nodes(p)) expose a …$uid/label field; plain string lists ARE
        // uid lists
        val elemT = ex.schema.apply(elemC).dataType
        def field(suffix: String): Option[Column] = elemT match {
          case st: StructType =>
            st.fieldNames.find(f => f == suffix || f.endsWith("$" + suffix))
              .map(f => col(elemC).getField(f))
          case _ if suffix == "uid" => Some(col(elemC))
          case _ => None
        }
        val elemUid = field("uid").getOrElse(sys.error(
          "a pattern predicate on a quantifier's lambda variable needs " +
            "a list of nodes (collect(n)/nodes(p)) or of uid strings"))
        ex = ex.withColumn(ns(q.v, "uid"), elemUid)
        field("label").foreach(c => ex = ex.withColumn(ns(q.v, "label"), c))
        val (lamPats, lamChains) = lambdaBound(q)
        val (ex1, pFlags) = joinPatternFlags(ex, lamPats)
        val (ex2, eFlags) = joinExistsChainFlags(ex1, lamChains)
        // per-element body: the lambda variable resolves to the element
        // value, lambda-bound patterns/chains to their fresh flags,
        // outer flags/columns ride along from the carried frame
        val savedP = patternFlags; val savedE = existsFlags
        patternFlags = patternFlags ++ pFlags
        existsFlags = existsFlags ++ eFlags
        val bodyC =
          try withLambda(q.v -> col(elemC))(predCol(q.where))
          finally { patternFlags = savedP; existsFlags = savedE }
        val counts = ex2.filter(bodyC)
          .groupBy(rid).agg(count(lit(1)).as(cntC))
        d = d.join(counts.select(col(rid), col(cntC)), Seq(rid), "left_outer")
        val n = coalesce(col(cntC), lit(0L))
        val bool = q.q match {
          case "all" => n === col(szC).cast("long")
          case "any" => n > 0L
          case "none" => n === 0L
          case "single" => n === 1L
          case other => sys.error(s"unknown quantifier $other")
        }
        // null list → null quantifier value (Cypher's ternary logic)
        d = d.withColumn(flag,
            when(col(szC).isNull, lit(null).cast("boolean")).otherwise(bool))
          .drop(rid, szC, cntC)
        q -> flag
      }.toMap
      (d, m)
    }

    /** Pattern predicates anywhere inside a boolean tree (they cannot
      * appear under quantifier lambdas — those bind list elements,
      * not nodes). */
    /** Does the predicate CORRELATE variable sets `a` and `b` — a
      * pattern predicate whose endpoints span both, or an EXISTS {}
      * chain touching both? Gates the disconnected-pattern relaxation:
      * `MATCH (w) MATCH (s) WHERE NOT (w)-[:R]->(s)` is the
      * set-difference idiom (inherently pairwise, same as Neo4j), so
      * the cross join is the semantics, not an accident. */
    private def predLinks(p: Pred, a: Set[String], b: Set[String]): Boolean = {
      def chainVars(cs: Seq[Chain]): Set[String] =
        cs.flatMap(c => c.head.v.toSeq ++
          c.hops.flatMap { case (r, n) => r.v.toSeq ++ n.v.toSeq }).toSet
      collectPatterns(p).exists(pp => pp.targetVar.exists(tv =>
        (a(pp.v) && b(tv)) || (b(pp.v) && a(tv)))) ||
      collectExistsChains(p).exists { pe =>
        val vs = chainVars(pe.chains)
        (vs & a).nonEmpty && (vs & b).nonEmpty
      }
    }

    private def collectPatterns(p: Pred): Seq[PPattern] = p match {
      case pp: PPattern => Seq(pp)
      case PAnd(l, r) => collectPatterns(l) ++ collectPatterns(r)
      case POr(l, r) => collectPatterns(l) ++ collectPatterns(r)
      case PXor(l, r) => collectPatterns(l) ++ collectPatterns(r)
      case PNot(i) => collectPatterns(i)
      case PBoolE(e) => patternsE(e)
      // a quantifier body's patterns ride the same flag columns as
      // long as they bind OUTER node variables (a plain column
      // reference resolves inside the higher-order lambda); a pattern
      // on the lambda variable itself stays uncollected and refuses
      case PQuant(_, qv, lst, w) =>
        (patternsE(lst) ++ collectPatterns(w))
          .filterNot(pp => pp.v == qv || pp.targetVar.contains(qv))
      case _ => Seq.empty
    }

    /** COUNT {} subquery expressions (single-hop and chain forms)
      * anywhere inside an expression / predicate tree. */
    private def countSubsE(e: Expr): Seq[Expr] = e match {
      case cs: ECountSub => Seq(cs)
      case cc: ECountChain => Seq(cc)
      case ec: ECollect => Seq(ec) // inner exprs are subquery-scoped
      case EArith(_, l, r) => countSubsE(l) ++ countSubsE(r)
      case EFn(_, as) => as.flatMap(countSubsE)
      case EReduce(_, init, _, lst, body) =>
        countSubsE(init) ++ countSubsE(lst) ++ countSubsE(body)
      case EComp(_, lst, wh, mp) =>
        countSubsE(lst) ++ wh.toSeq.flatMap(countSubsP) ++
          mp.toSeq.flatMap(countSubsE)
      case EAgg(_, a, _) => a.toSeq.flatMap(countSubsE)
      case EIndex(b, ix) => countSubsE(b) ++ countSubsE(ix)
      case ESlice(b, lo, hi) =>
        countSubsE(b) ++ (lo.toSeq ++ hi.toSeq).flatMap(countSubsE)
      case EMapLit(es) => es.flatMap(kv => countSubsE(kv._2))
      case EList(items) => items.flatMap(countSubsE)
      case ECase(op, whens, els) =>
        op.toSeq.flatMap(countSubsE) ++ whens.flatMap { case (c, v) =>
          (c match {
            case Left(p) => countSubsP(p)
            case Right(x) => countSubsE(x)
          }) ++ countSubsE(v)
        } ++ els.toSeq.flatMap(countSubsE)
      case EPredVal(p) => countSubsP(p)
      case _ => Seq.empty
    }
    /** Pattern predicates nested inside EXPRESSIONS (CASE conditions,
      * comprehension filters) — the column-only positions that used to
      * refuse; they pre-join flag columns exactly like WHERE trees.
      * Quantifier lambdas are excluded (they bind list elements). */
    private def patternsE(e: Expr): Seq[PPattern] = e match {
      case EArith(_, l, r) => patternsE(l) ++ patternsE(r)
      case EFn(_, as) => as.flatMap(patternsE)
      case EAgg(_, a, _) => a.toSeq.flatMap(patternsE)
      case EIndex(b, ix) => patternsE(b) ++ patternsE(ix)
      case ESlice(b, lo, hi) =>
        patternsE(b) ++ (lo.toSeq ++ hi.toSeq).flatMap(patternsE)
      case EMapLit(es) => es.flatMap(kv => patternsE(kv._2))
      case EList(items) => items.flatMap(patternsE)
      case EReduce(_, init, _, lst, body) =>
        patternsE(init) ++ patternsE(lst) ++ patternsE(body)
      case EComp(_, lst, wh, mp) =>
        patternsE(lst) ++ wh.toSeq.flatMap(collectPatterns) ++
          mp.toSeq.flatMap(patternsE)
      case ECase(op, whens, els) =>
        op.toSeq.flatMap(patternsE) ++ whens.flatMap { case (c, v) =>
          (c match {
            case Left(p) => collectPatterns(p)
            case Right(x) => patternsE(x)
          }) ++ patternsE(v)
        } ++ els.toSeq.flatMap(patternsE)
      case EPredVal(p) => collectPatterns(p)
      case _ => Seq.empty
    }
    /** Lambda-bound quantifiers nested inside expressions (CASE
      * conditions, boolean values) — same traversal shape as
      * [[patternsE]], feeding [[joinLambdaQuantFlags]] so
      * `RETURN any(x IN list WHERE (x)-[:R]->(...)) AS flag` value
      * positions compile instead of refusing. */
    private def lambdaQuantsE(e: Expr): Seq[PQuant] = e match {
      case EArith(_, l, r) => lambdaQuantsE(l) ++ lambdaQuantsE(r)
      case EFn(_, as) => as.flatMap(lambdaQuantsE)
      case EAgg(_, a, _) => a.toSeq.flatMap(lambdaQuantsE)
      case EIndex(b, ix) => lambdaQuantsE(b) ++ lambdaQuantsE(ix)
      case ESlice(b, lo, hi) =>
        lambdaQuantsE(b) ++ (lo.toSeq ++ hi.toSeq).flatMap(lambdaQuantsE)
      case EMapLit(es) => es.flatMap(kv => lambdaQuantsE(kv._2))
      case EList(items) => items.flatMap(lambdaQuantsE)
      case EReduce(_, init, _, lst, body) =>
        lambdaQuantsE(init) ++ lambdaQuantsE(lst) ++ lambdaQuantsE(body)
      case EComp(_, lst, wh, mp) =>
        lambdaQuantsE(lst) ++ wh.toSeq.flatMap(collectLambdaQuants) ++
          mp.toSeq.flatMap(lambdaQuantsE)
      case ECase(op, whens, els) =>
        op.toSeq.flatMap(lambdaQuantsE) ++ whens.flatMap { case (c, v) =>
          (c match {
            case Left(p) => collectLambdaQuants(p)
            case Right(x) => lambdaQuantsE(x)
          }) ++ lambdaQuantsE(v)
        } ++ els.toSeq.flatMap(lambdaQuantsE)
      case EPredVal(p) => collectLambdaQuants(p)
      case _ => Seq.empty
    }
    /** Multi-hop EXISTS {} chains nested inside expressions. */
    private def existsChainsE(e: Expr): Seq[PExistsChain] = e match {
      case EArith(_, l, r) => existsChainsE(l) ++ existsChainsE(r)
      case EFn(_, as) => as.flatMap(existsChainsE)
      case EAgg(_, a, _) => a.toSeq.flatMap(existsChainsE)
      case EIndex(b, ix) => existsChainsE(b) ++ existsChainsE(ix)
      case ESlice(b, lo, hi) =>
        existsChainsE(b) ++ (lo.toSeq ++ hi.toSeq).flatMap(existsChainsE)
      case EMapLit(es) => es.flatMap(kv => existsChainsE(kv._2))
      case EList(items) => items.flatMap(existsChainsE)
      case EReduce(_, init, _, lst, body) =>
        existsChainsE(init) ++ existsChainsE(lst) ++ existsChainsE(body)
      case EComp(_, lst, wh, mp) =>
        existsChainsE(lst) ++ wh.toSeq.flatMap(collectExistsChains) ++
          mp.toSeq.flatMap(existsChainsE)
      case ECase(op, whens, els) =>
        op.toSeq.flatMap(existsChainsE) ++ whens.flatMap { case (c, v) =>
          (c match {
            case Left(p) => collectExistsChains(p)
            case Right(x) => existsChainsE(x)
          }) ++ existsChainsE(v)
        } ++ els.toSeq.flatMap(existsChainsE)
      case EPredVal(p) => collectExistsChains(p)
      case _ => Seq.empty
    }

    private def countSubsP(p: Pred): Seq[Expr] = p match {
      case PCmp(_, l, r) => countSubsE(l) ++ countSubsE(r)
      case PStr(_, l, r) => countSubsE(l) ++ countSubsE(r)
      case PIn(l, r) => countSubsE(l) ++ countSubsE(r)
      case PIsNull(e, _) => countSubsE(e)
      case PBoolE(e) => countSubsE(e)
      case PAnd(l, r) => countSubsP(l) ++ countSubsP(r)
      case POr(l, r) => countSubsP(l) ++ countSubsP(r)
      case PXor(l, r) => countSubsP(l) ++ countSubsP(r)
      case PNot(i) => countSubsP(i)
      case _ => Seq.empty
    }

    /** The probe endpoints of one relationship pattern as a 1-column
      * frame (`_probe`): the variable-side uids of the (type- and
      * target-label-filtered) edge set; an undirected pattern probes
      * BOTH endpoint columns (symmetric union). Multiset — callers
      * distinct()/aggregate as their join shape needs. */
    private def patternProbe(types: Seq[String], fwd: Boolean,
                             tl: Option[String], und: Boolean): DataFrame = {
      var e = edges
      if (types.nonEmpty) e = e.filter(col("rel_type").isin(types: _*))
      def oneDir(ed: DataFrame, probeCol: String, otherCol: String): DataFrame =
        tl match {
          case Some(l) =>
            ed.join(nodes.filter(col("label") === l)
              .select(col("uid").as(otherCol)), otherCol)
              .select(col(probeCol).as("_probe"))
          case None => ed.select(col(probeCol).as("_probe"))
        }
      // undirected: a self-loop probes its endpoint ONCE (the reversed
      // orientation is the same undirected match — Neo4j counts it once)
      if (und) oneDir(e, "src_uid", "dst_uid").unionByName(
        oneDir(e.filter(col("src_uid") =!= col("dst_uid")), "dst_uid", "src_uid"))
      else if (fwd) oneDir(e, "src_uid", "dst_uid")
      else oneDir(e, "dst_uid", "src_uid")
    }

    /** Left-join one boolean flag column per distinct pattern onto
      * `df0` (DISTINCT endpoint probes — broadcast-eligible sets,
      * never the edge multiset); returns the widened frame and the
      * pattern → flag-column map. */
    private def joinPatternFlags(df0: DataFrame, pats: Seq[PPattern])
        : (DataFrame, Map[PPattern, String]) = {
      var d = df0
      val m = pats.distinct.zipWithIndex.map { case (pp, i) =>
        val flag = s"_patflag$$$i"
        val vBound = d.columns.contains(ns(pp.v, "uid"))
        val tBound = pp.targetVar.filter(tv => d.columns.contains(ns(tv, "uid")))
        def oneKeyFlag(keyVar: String, flipped: Boolean): Unit = {
          val probe = patternProbe(pp.types,
              if (flipped) !pp.forward else pp.forward,
              if (flipped) None else pp.targetLabel, pp.undirected)
            .select(col("_probe").as(s"$flag$$probe")).distinct()
            .withColumn(flag, lit(true))
          var cond = d(ns(keyVar, "uid")) === probe(s"$flag$$probe")
          // flipped probe: the BOUND endpoint's written label still
          // binds (same Neo4j-parity rule as the semi/anti form)
          if (flipped)
            pp.targetLabel.foreach(l =>
              cond = cond && d(ns(keyVar, "label")) === lit(l))
          d = d.join(probe, cond, "left_outer").drop(s"$flag$$probe")
        }
        tBound match {
          case Some(tv) if vBound => // both bound: 2-key pair flag
            val pair = pairProbe(pp.types, pp.forward, pp.targetLabel,
                pp.undirected)
              .select(col("_src").as(s"$flag$$s"), col("_dst").as(s"$flag$$d"))
              .distinct().withColumn(flag, lit(true))
            d = d.join(pair, d(ns(pp.v, "uid")) === pair(s"$flag$$s") &&
              d(ns(tv, "uid")) === pair(s"$flag$$d"), "left_outer")
              .drop(s"$flag$$s", s"$flag$$d")
          case Some(tv) => // target-only bound: flipped 1-key flag
            oneKeyFlag(tv, flipped = true)
          case None =>
            oneKeyFlag(pp.v, flipped = false)
        }
        pp -> flag
      }.toMap
      (d, m)
    }

    /** Distinct (source, target) uid pairs of the (type- and
      * target-label-filtered) edge set, walk orientation applied —
      * the probe for pattern predicates whose BOTH endpoints are
      * bound. Undirected: a self-loop pairs once. */
    private def pairProbe(types: Seq[String], fwd: Boolean,
                          tl: Option[String], und: Boolean): DataFrame = {
      var e = edges
      if (types.nonEmpty) e = e.filter(col("rel_type").isin(types: _*))
      def orient(ed: DataFrame, srcC: String, dstC: String): DataFrame = {
        val base = ed.select(col(srcC).as("_src"), col(dstC).as("_dst"))
        tl match {
          case Some(l) => base.join(nodes.filter(col("label") === l)
            .select(col("uid").as("_dst")), Seq("_dst"), "left_semi")
          case None => base
        }
      }
      val oriented =
        if (und) orient(e, "src_uid", "dst_uid").unionByName(
          orient(e.filter(col("src_uid") =!= col("dst_uid")),
            "dst_uid", "src_uid"))
        else if (fwd) orient(e, "src_uid", "dst_uid")
        else orient(e, "dst_uid", "src_uid")
      oriented.distinct()
    }

    /** Left-join one per-binding match-count column per distinct
      * COUNT {} subquery. Single-hop: one grouped count of the
      * filtered edge set (the degree table) keyed on the variable's
      * uid. Chain form: the compiled pattern frame (inner WHERE
      * applied) grouped by every variable shared with the outer
      * scope — the count of MATCHES per binding, walk multiplicity
      * included, zero supplied by coalesce at the use site. */
    private def joinCountSubs(df0: DataFrame, subs: Seq[Expr])
        : (DataFrame, Map[Expr, String]) = {
      var d = df0
      val m = subs.distinct.zipWithIndex.map { case (sub, i) =>
        val cname = s"_cntsub$$$i"
        sub match {
          case cs: ECountSub =>
            val counts = patternProbe(cs.types, cs.forward, cs.targetLabel,
                cs.undirected)
              .groupBy(col("_probe").as(s"$cname$$probe"))
              .agg(count(lit(1)).as(cname))
            d = d.join(counts, d(ns(cs.v, "uid")) === counts(s"$cname$$probe"),
              "left_outer").drop(s"$cname$$probe")
          case cc: ECountChain =>
            val (cdf, shared) =
              chainFrame(cc.chains, cc.where, d.columns, "COUNT { }")
            val counts = cdf
              .groupBy(shared.map(v => col(ns(v, "uid")).as(s"$cname$$$v")): _*)
              .agg(count(lit(1)).as(cname))
            val cond = shared.map(v => d(ns(v, "uid")) === counts(s"$cname$$$v"))
              .reduce(_ && _)
            d = d.join(counts, cond, "left_outer")
              .drop(shared.map(v => s"$cname$$$v"): _*)
          case ec: ECollect =>
            val (cdf, shared) =
              chainFrame(ec.chains, ec.where, d.columns, "COLLECT { }")
            // the returned value rides as the FINAL sort key so tie
            // order (and the no-ORDER-BY default) is deterministic
            val sortPairs = ec.orderBy :+ (ec.ret, true)
            val proj = cdf.select(
              shared.map(v => col(ns(v, "uid")).as(s"$cname$$$v")) ++
                sortPairs.zipWithIndex.map { case ((e2, _), j) =>
                  exprCol(e2).as(s"$cname$$s$j") } :+
                exprCol(ec.ret).as(s"$cname$$v"): _*)
            val w = org.apache.spark.sql.expressions.Window
              .partitionBy(shared.map(v => col(s"$cname$$$v")): _*)
              .orderBy(sortPairs.zipWithIndex.map { case ((_, asc), j) =>
                if (asc) col(s"$cname$$s$j").asc_nulls_last
                else col(s"$cname$$s$j").desc_nulls_first }: _*)
              .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
                org.apache.spark.sql.expressions.Window.unboundedFollowing)
            var lists = proj
              .withColumn(cname, collect_list(col(s"$cname$$v")).over(w))
              .select(shared.map(v => col(s"$cname$$$v")) :+ col(cname): _*)
              .dropDuplicates(shared.map(v => s"$cname$$$v"))
            ec.limit.foreach(n =>
              lists = lists.withColumn(cname, slice(col(cname), 1, n.toInt)))
            val dt = lists.schema(cname).dataType
            val cond = shared.map(v => d(ns(v, "uid")) === lists(s"$cname$$$v"))
              .reduce(_ && _)
            // empty-list refill happens HERE, where the element type
            // is known (the use site cannot type an empty array)
            d = d.join(lists, cond, "left_outer")
              .drop(shared.map(v => s"$cname$$$v"): _*)
              .withColumn(cname, coalesce(col("`" + cname + "`"),
                array().cast(dt)))
          case other => sys.error(s"not a COUNT subquery: $other")
        }
        sub -> cname
      }.toMap
      (d, m)
    }

    /** Flag columns for pattern predicates compiled in the current
      * applyPred call (empty outside it). */
    private var patternFlags: Map[PPattern, String] = Map.empty
    /** Count columns for COUNT {} subqueries currently in scope. */
    private var countSubCols: Map[Expr, String] = Map.empty
    /** Flag columns for multi-hop EXISTS {} chains compiled in the
      * current applyPred call (empty outside it). */
    private var existsFlags: Map[PExistsChain, String] = Map.empty
    /** Flag columns for explode-compiled lambda-bound quantifiers
      * ([[joinLambdaQuantFlags]]; empty outside applyPred). */
    private var quantFlags: Map[PQuant, String] = Map.empty

    private def predCol(p: Pred): Column = p match {
      case pp: PPattern if patternFlags.contains(pp) =>
        coalesce(col(patternFlags(pp)), lit(false))
      case pe: PExistsChain if existsFlags.contains(pe) =>
        coalesce(col(existsFlags(pe)), lit(false))
      case q: PQuant if quantFlags.contains(q) => col(quantFlags(q))
      case PCmp("=", l, r) => exprCol(l) === exprCol(r)
      case PCmp("<>", l, r) => exprCol(l) =!= exprCol(r)
      case PCmp("<", l, r) => exprCol(l) < exprCol(r)
      case PCmp("<=", l, r) => exprCol(l) <= exprCol(r)
      case PCmp(">", l, r) => exprCol(l) > exprCol(r)
      case PCmp(">=", l, r) => exprCol(l) >= exprCol(r)
      case PCmp(op, _, _) => sys.error(s"unknown comparison $op")
      case PIn(l, EList(items)) if items.forall(_.isInstanceOf[ELit]) =>
        exprCol(l).isin(items.map(_.asInstanceOf[ELit].v): _*)
      case PIn(l, EParam(n)) => params.getOrElse(n,
        sys.error(s"missing parameter $$${n}")) match {
        case xs: Seq[_] => exprCol(l).isin(xs: _*)
        case xs: Array[_] => exprCol(l).isin(xs.toSeq: _*)
        case other => sys.error(s"IN $$${n} needs a list parameter, got $other")
      }
      case PIn(l, r) => array_contains(exprCol(r), exprCol(l))
      case PStr("contains", l, r) => exprCol(l).contains(exprCol(r))
      case PStr("starts", l, r) => exprCol(l).startsWith(exprCol(r))
      case PStr("ends", l, r) => exprCol(l).endsWith(exprCol(r))
      case PStr("regex", l, r) => r match {
        // Cypher `=~` is a FULL match — anchor the pattern (Spark's
        // rlike is find-anywhere)
        case ELit(p: String) => exprCol(l).rlike("^(?:" + p + ")$")
        case _ => sys.error("=~ needs a string-literal pattern")
      }
      case PStr(op, _, _) => sys.error(s"unknown string predicate $op")
      case PIsNull(EVar(v), neg) if !scalarVars(v) =>
        // a variable's null-ness is its binding's (left-join padding),
        // never the identity struct's (structs are never null)
        val c = col(ns(v, if (relVars(v)) "src_uid" else "uid"))
        if (neg) c.isNotNull else c.isNull
      case PIsNull(e, neg) =>
        if (neg) exprCol(e).isNotNull else exprCol(e).isNull
      case PBoolE(e) => exprCol(e) === lit(true)
      case PAnd(l, r) => predCol(l) && predCol(r)
      case POr(l, r) => predCol(l) || predCol(r)
      case PXor(l, r) => predCol(l) =!= predCol(r)
      case PNot(i) => !predCol(i)
      case PHasLabel(v, label) => col(ns(v, "label")) === label
      case PQuant(q, v, lst, w) =>
        // counts over the codegen'd `filter` higher-order function —
        // no explode, evaluated per row
        val lc = exprCol(lst)
        val matches = size(filter(lc, x => withLambda(v -> x)(predCol(w))))
        q match {
          case "all" => matches === size(lc)
          case "any" => matches > 0
          case "none" => matches === 0
          case "single" => matches === 1
          case other => sys.error(s"unknown quantifier $other")
        }
      case PPattern(_, _, _, _, _, _) =>
        sys.error("pattern predicate on a lambda variable compiles in " +
          "WHERE and RETURN/WITH value positions (explode route); " +
          "inside a NESTED quantifier lift it out of the inner lambda")
      case PExistsChain(_, _) =>
        sys.error("multi-hop EXISTS { } on a lambda variable compiles " +
          "in WHERE and RETURN/WITH value positions (explode route); " +
          "inside a NESTED quantifier lift it out of the inner lambda")
    }

    /** Best-effort STATIC type of an expression — drives Cypher's
      * overloaded `+` (concatenation vs addition). None = unknown
      * (WITH-bound scalars, opaque params): both-unknown operands keep
      * numeric addition, so only provably-string/list operands change
      * the compiled form. Property types come from the node/edge
      * frame schemas, so a string property concatenates without any
      * annotation. */
    private def staticType(e: Expr): Option[DataType] = e match {
      case ELit(_: String) => Some(StringType)
      case ELit(_: Long) => Some(LongType)
      case ELit(_: Double) => Some(DoubleType)
      case ELit(_: Boolean) => Some(BooleanType)
      case EProp(v, k) if !lambdaVars.contains(v) && !scalarVars(v) =>
        val sch = if (relVars(v)) edges.schema else nodes.schema
        sch.fields.find(_.name == k).map(_.dataType)
      case EList(xs) =>
        Some(ArrayType(xs.flatMap(staticType).headOption.getOrElse(StringType)))
      case ELabels0(_) | EType(_) => Some(StringType)
      case EFn(f, as) => f match {
        case "tolower" | "toupper" | "tostring" | "trim" | "ltrim" |
             "rtrim" | "replace" | "substring" | "left" | "right" =>
          Some(StringType)
        case "tointeger" | "size" | "length" | "abs" | "round" |
             "floor" | "ceil" => Some(LongType)
        case "tofloat" => Some(DoubleType)
        case "split" => Some(ArrayType(StringType))
        case "range" => Some(ArrayType(LongType))
        case "coalesce" => as.flatMap(staticType).headOption
        case "head" | "last" => as.headOption.flatMap(staticType).collect {
          case ArrayType(et, _) => et
        }
        case _ => None
      }
      case EArith("+", l, r) =>
        (staticType(l), staticType(r)) match {
          case (Some(a: ArrayType), _) => Some(a)
          case (_, Some(a: ArrayType)) => Some(a)
          case (a, b) if a.contains(StringType) || b.contains(StringType) =>
            Some(StringType)
          case (a, _) => a
        }
      case ESlice(b, _, _) => staticType(b)
      case EIndex(b, _) => staticType(b).collect { case ArrayType(et, _) => et }
      case ECase(_, whens, els) =>
        (whens.map(_._2) ++ els).flatMap(staticType).headOption
      case EPredVal(_) => Some(BooleanType)
      case _ => None
    }

    private def exprCol(e: Expr): Column = e match {
      case EVar(v) if lambdaVars.contains(v) => lambdaVars(v)
      case EVar(v) if scalarVars(v) => col(v) // WITH-bound scalar alias
      case EVar(v) if varLenHops.contains(v) =>
        col("`" + varLenHops(v) + "`") // the walk's hop-struct list
      case EVar(v) if varLenVars.contains(v) => sys.error(
        s"'$v' binds a var-length relationship whose hop list was not " +
          "materialized; project size($v) instead")
      case EVar(v) if pathStrCols.contains(v) =>
        // the canonical path VALUE: uid|rel_type|uid|… in walk order
        // (per the g43 law — the interleaved identity sequence IS the
        // path; direction rides the order, not arrows)
        col("`" + pathStrCols(v) + "`")
      case EVar(v) if pathVars.contains(v) => sys.error(
        s"path variable '$v' has no materialized value column " +
          s"(internal: every shortestPath form should register a " +
          s"witness); project length($v)")
      case e @ (_: ECountSub | _: ECountChain) =>
        countSubCols.get(e)
          .map(n => coalesce(col("`" + n + "`"), lit(0L)))
          .getOrElse(sys.error(
            "COUNT { } subqueries are supported in WHERE and RETURN/WITH items"))
      case e: ECollect => // empty-list refill applied at the join site
        countSubCols.get(e).map(n => col("`" + n + "`"))
          .getOrElse(sys.error(
            "COLLECT { } subqueries are supported in WHERE and RETURN/WITH items"))
      case EPredVal(p) =>
        // a pattern/EXISTS value resolves through the flag columns the
        // enclosing projection pre-joined; the null refill keeps Neo4j
        // semantics (no match = false, not null)
        predCol(p)
      case EVar(v) => // a bare node/rel variable projects its identity
        if (relVars(v))
          struct(col(ns(v, "rel_type")), col(ns(v, "src_uid")), col(ns(v, "dst_uid")))
        else struct(col(ns(v, "label")), col(ns(v, "uid")))
      case EProp(v, k) if lambdaVars.contains(v) =>
        lambdaVars(v).getField(k) // struct element inside a lambda body
      case EProp(v, k) => col(ns(v, k))
      case ELit(null) => lit(null)
      case ELit(x) => lit(x)
      case EParam(n) => params.getOrElse(n,
        sys.error(s"missing parameter $$${n}")) match {
        // list parameters surface as array columns (UNWIND $ids AS id)
        case xs: Seq[_] => array(xs.map(x => lit(x)): _*)
        case xs: Array[_] => array(xs.toIndexedSeq.map(x => lit(x)): _*)
        case v => lit(v)
      }
      case ELabels0(v) => col(ns(v, "label"))
      case EType(v) => col(ns(v, "rel_type"))
      case EList(items) => array(items.map(exprCol): _*)
      case EArith(op, l, r) =>
        val (lc, rc) = (exprCol(l), exprCol(r))
        op match {
          case "+" =>
            // Cypher's overloaded `+`: list ++ element/list, string
            // concatenation when EITHER operand is a string ('a'+1 =
            // 'a1'), numeric addition otherwise. Resolved statically
            // from literal/property/function types — both-unknown
            // operands (WITH scalars, params) stay numeric addition.
            (staticType(l), staticType(r)) match {
              case (Some(_: ArrayType), Some(_: ArrayType)) => concat(lc, rc)
              case (Some(_: ArrayType), _) => concat(lc, array(rc))
              case (_, Some(_: ArrayType)) => concat(array(lc), rc)
              case (a, b) if a.contains(StringType) || b.contains(StringType) =>
                concat(lc.cast("string"), rc.cast("string"))
              case _ => lc + rc
            }
          case "-" => lc - rc; case "*" => lc * rc
          case "/" => lc / rc; case "%" => lc % rc
          case "^" => pow(lc, rc) // Cypher ^ returns float, as pow does
          case other => sys.error(s"unknown arithmetic operator $other")
        }
      case EMapProj(v, keys) =>
        require(!scalarVars(v) && !relVars(v),
          s"map projection needs a node variable, got '$v'")
        keys.foreach(k => require(nodeProps.contains(k),
          s"unknown property '$k' in map projection on '$v'"))
        // the selected subset of properties(v): string-valued map,
        // missing (null) properties kept as null entries (Neo4j map
        // projection semantics, vs properties()' SET-only map)
        map(keys.flatMap(k => Seq(lit(k), col(ns(v, k)).cast("string"))): _*)
      case EFn(fn, args) => fnCol(fn, args)
      case ESlice(b, lo, hi) =>
        // Cypher range slice: 0-based, end-exclusive, negatives from
        // the end, out-of-range clamped (Neo4j returns the overlap,
        // never an error) — normalize then one codegen'd slice()
        val bc = exprCol(b)
        val n = size(bc)
        def norm(e: Option[Expr], dflt: Column): Column = e.map { x =>
          val c = exprCol(x).cast("int")
          when(c < 0, c + n).otherwise(c)
        }.getOrElse(dflt)
        val loC = greatest(lit(0), norm(lo, lit(0)))
        val hiC = least(n, norm(hi, n))
        slice(bc, loC + 1, greatest(lit(0), hiC - loC))
      case EMapLit(entries) =>
        // Cypher maps are heterogeneous → struct, field per key
        struct(entries.map { case (k, v) => exprCol(v).as(k) }: _*)
      case EIndex(b, ix) =>
        // Cypher 0-based (element_at is 1-based); negative = from end,
        // which element_at already speaks
        val bc = exprCol(b)
        val ic = exprCol(ix).cast("int")
        when(ic >= 0, element_at(bc, ic + lit(1))).otherwise(element_at(bc, ic))
      case EComp(v, lst, wh, mp) =>
        val lc = exprCol(lst)
        val savedS = stringLambdas
        if (stringElems(lst)) stringLambdas += v
        try {
          val filtered = wh.fold(lc)(p =>
            filter(lc, x => withLambda(v -> x)(predCol(p))))
          mp.fold(filtered)(m =>
            transform(filtered, x => withLambda(v -> x)(exprCol(m))))
        } finally stringLambdas = savedS
      case EReduce(accN, init, v, lst, body) =>
        val savedS = stringLambdas
        if (stringElems(lst)) stringLambdas += v
        try aggregate(exprCol(lst), exprCol(init),
          (acc, x) => withLambda(accN -> acc, v -> x)(exprCol(body)))
        finally stringLambdas = savedS
      case ECase(operand, whens, els) =>
        val branches = whens.map {
          case (Left(p), t) => (predCol(p), exprCol(t))
          case (Right(v), t) => (exprCol(operand.get) === exprCol(v), exprCol(t))
        }
        val chain = branches.tail.foldLeft(when(branches.head._1, branches.head._2)) {
          case (acc, (c, t)) => acc.when(c, t)
        }
        els.fold(chain)(e => chain.otherwise(exprCol(e)))
      case EAgg(_, _, _) => sys.error("aggregate in scalar position")
    }

    /** Scalar-function compilation — every entry is one codegen'd
      * Catalyst function. `substring` keeps Cypher's 0-based start;
      * `split` quotes its literal delimiter (Cypher splits literally,
      * Spark's split is regex); `size` is LIST size (string `size` is
      * deprecated Cypher — Neo4j 5 points at char_length). */
    private def fnCol(fn: String, args: Seq[Expr]): Column = {
      def a(i: Int): Column = exprCol(args(i))
      def arity(ok: Boolean): Unit =
        require(ok, s"wrong number of arguments (${args.size}) for $fn()")
      fn match {
        case "coalesce" => arity(args.nonEmpty); coalesce(args.map(exprCol): _*)
        case "tolower" => arity(args.size == 1); lower(a(0))
        case "toupper" => arity(args.size == 1); upper(a(0))
        case "tostring" => arity(args.size == 1); a(0).cast("string")
        case "tointeger" => arity(args.size == 1); a(0).cast("long")
        case "tofloat" => arity(args.size == 1); a(0).cast("double")
        case "toboolean" => arity(args.size == 1); a(0).cast("boolean")
        case "exists" => args match {
          // legacy exists(n.prop) property-existence form
          case Seq(EProp(_, _)) => a(0).isNotNull
          case _ => sys.error(
            "exists() takes a property access (exists(n.prop)); " +
              "pattern existence is EXISTS { ... }")
        }
        case "substring" =>
          arity(args.size == 2 || args.size == 3)
          val len = if (args.size == 3) a(2) else lit(Int.MaxValue)
          a(0).substr(a(1) + lit(1), len)
        case "replace" => arity(args.size == 3); replace(a(0), a(1), a(2))
        case "split" =>
          arity(args.size == 2)
          args(1) match {
            case ELit(d: String) => split(a(0), java.util.regex.Pattern.quote(d))
            case _ => sys.error("split() needs a literal string delimiter")
          }
        case "head" => arity(args.size == 1); element_at(a(0), 1)
        case "last" => arity(args.size == 1); element_at(a(0), -1)
        case "trim" => arity(args.size == 1); trim(a(0))
        case "ltrim" => arity(args.size == 1); ltrim(a(0))
        case "rtrim" => arity(args.size == 1); rtrim(a(0))
        case "left" => arity(args.size == 2); call_function("left", a(0), a(1))
        case "right" => arity(args.size == 2); call_function("right", a(0), a(1))
        case "abs" => arity(args.size == 1); abs(a(0))
        case "round" =>
          arity(args.size == 1 || args.size == 2)
          if (args.size == 1) round(a(0))
          else args(1) match {
            case ELit(n: Long) => round(a(0), n.toInt)
            case _ => sys.error("round() scale must be an integer literal")
          }
        case "floor" => arity(args.size == 1); floor(a(0))
        case "ceil" => arity(args.size == 1); ceil(a(0))
        case "size" =>
          arity(args.size == 1)
          // list-size vs string-length by the argument's shape: props,
          // string literals and string-producing functions measure in
          // chars; everything list-shaped (literals, split/range/keys,
          // comprehensions, lifted collect() temps) in elements
          args(0) match {
            // a var-length relationship binding: size(r) is the walk's
            // hop count (the materialized depth column)
            case EVar(v) if varLenVars.contains(v) => col(varLenVars(v))
            case EProp(_, _) | ELit(_: String) |
                 EFn("tolower" | "toupper" | "tostring" | "trim" | "ltrim" |
                     "rtrim" | "replace" | "substring" | "left" | "right", _) =>
              length(a(0))
            case EVar(v) if stringLambdas(v) => length(a(0))
            case _ => size(a(0))
          }
        case "range" =>
          arity(args.size == 2 || args.size == 3)
          // Cypher range() is inclusive on both ends, like sequence()
          if (args.size == 2) sequence(a(0).cast("long"), a(1).cast("long"))
          else sequence(a(0).cast("long"), a(1).cast("long"), a(2).cast("long"))
        case "properties" => args match {
          case Seq(EVar(v)) if !scalarVars(v) && !relVars(v) =>
            // string-valued property map, absent (null) props filtered
            // out — Neo4j's map of SET properties. Values cast to
            // string for a uniform map type (documented divergence for
            // non-string property columns).
            map_filter(
              map(nodeProps.flatMap(p =>
                Seq(lit(p), col(ns(v, p)).cast("string"))): _*),
              (_, pv) => pv.isNotNull)
          case Seq(EVar(v)) if relVars(v) =>
            // relationship property map: the non-identity edge columns
            if (edgeProps.isEmpty) map()
            else map_filter(
              map(edgeProps.flatMap(p =>
                Seq(lit(p), col(ns(v, p)).cast("string"))): _*),
              (_, pv) => pv.isNotNull)
          case _ => sys.error("properties() takes one bound node or relationship variable")
        }
        case "labels" => args match {
          // full label list — single-label engine, so a 1-element array
          case Seq(EVar(v)) if !scalarVars(v) && !relVars(v) =>
            array(col(ns(v, "label")))
          case _ => sys.error("labels() takes one bound node variable")
        }
        case "reverse" => arity(args.size == 1); reverse(a(0))
        case "startnode" | "endnode" => args match {
          // the endpoint as a node entity — needs src_label/dst_label
          // on the edge frame (GraphStore edges carry them)
          case Seq(EVar(v)) if relVars(v) =>
            val side = if (fn == "startnode") "src" else "dst"
            struct(col(ns(v, s"${side}_label")).as("label"),
              col(ns(v, s"${side}_uid")).as("uid"))
          case _ => sys.error(s"$fn() takes one bound relationship variable")
        }
        case "keys" => args match {
          case Seq(EVar(v)) if !scalarVars(v) && !relVars(v) =>
            map_keys(map_filter(
              map(nodeProps.flatMap(p =>
                Seq(lit(p), col(ns(v, p)).cast("string"))): _*),
              (_, pv) => pv.isNotNull))
          case _ => sys.error("keys() takes one bound node variable")
        }
        case "length" => args match {
          case Seq(EVar(pv)) if pathVars.contains(pv) => col(pathVars(pv))
          case _ => sys.error(
            "length() takes a bound path variable (hop count), " +
              "e.g. MATCH p = (a)-[:T*1..2]->(b) RETURN length(p)")
        }
        case "id" => args match {
          case Seq(EVar(v)) if !scalarVars(v) && !relVars(v) => col(ns(v, "uid"))
          case _ => sys.error("id() takes one bound node variable (returns the string uid)")
        }
        case "nodes" => args match {
          // fixed-length path: the walk's nodes as (label, uid)
          // structs in order — pure projection, zero extra data cost
          case Seq(EVar(pv)) if pathNodeSeq.contains(pv) =>
            array(pathNodeSeq(pv).map(v => struct(
              col(ns(v, "label")).as("label"),
              col(ns(v, "uid")).as("uid"))): _*)
          case Seq(EVar(pv)) if pathVars.contains(pv) => sys.error(
            "nodes(p) needs a fixed-length path; a var-length/" +
              "shortestPath walk exposes length(p) and the bound " +
              "relationship's hop list instead")
          case _ => sys.error("nodes() takes a named path variable")
        }
        case "relationships" => args match {
          case Seq(EVar(pv)) if pathRelSeq.contains(pv) =>
            array(pathRelSeq(pv).map(rv => struct(
              col(ns(rv, "rel_type")).as("rel_type"),
              col(ns(rv, "src_uid")).as("src_uid"),
              col(ns(rv, "dst_uid")).as("dst_uid"))): _*)
          case Seq(EVar(pv)) if pathVars.contains(pv) => sys.error(
            "relationships(p) needs a fixed-length path; a var-length " +
              "walk's hops are the bound relationship variable's list")
          case _ => sys.error("relationships() takes a named path variable")
        }
        case other => sys.error(s"unsupported function $other()")
      }
    }

    /** Does the predicate reference any WITH/UNWIND scalar alias?
      * (Gates the correlated no-shared-variable MATCH join.) */
    private def refsScalar(p: Pred): Boolean = {
      def inE(e: Expr): Boolean = e match {
        case EVar(v) => scalarVars(v)
        case EArith(_, l, r) => inE(l) || inE(r)
        case EFn(_, as) => as.exists(inE)
        case EList(items) => items.exists(inE)
        case EIndex(b, ix) => inE(b) || inE(ix)
        case ESlice(b, lo, hi) =>
          inE(b) || lo.exists(inE) || hi.exists(inE)
        case EMapLit(es) => es.exists(kv => inE(kv._2))
        // lambda-bound names shadow scalars; the over-approximation
        // (not excluding them) only ever widens the correlated path
        case EComp(_, lst, wh, mp) =>
          inE(lst) || wh.exists(inP) || mp.exists(inE)
        case EReduce(_, init, _, lst, body) =>
          inE(init) || inE(lst) || inE(body)
        case ECase(op, whens, els) =>
          op.exists(inE) || els.exists(inE) ||
            whens.exists { case (c, t) => c.fold(inP, inE) || inE(t) }
        case EAgg(_, a, _) => a.exists(inE)
        case _ => false
      }
      def inP(q: Pred): Boolean = q match {
        case PCmp(_, l, r) => inE(l) || inE(r)
        case PStr(_, l, r) => inE(l) || inE(r)
        case PIn(l, r) => inE(l) || inE(r)
        case PAnd(l, r) => inP(l) || inP(r)
        case POr(l, r) => inP(l) || inP(r)
        case PXor(l, r) => inP(l) || inP(r)
        case PNot(i) => inP(i)
        case PIsNull(e, _) => inE(e)
        case PBoolE(e) => inE(e)
        case _ => false // PPattern / PHasLabel / PQuant bind no scalars
      }
      inP(p)
    }

    private def isAgg(e: Expr): Boolean = e.isInstanceOf[EAgg]

    /** Does the expression contain an aggregate anywhere? (Cypher
      * allows aggregates inside arithmetic/functions/CASE in RETURN
      * and WITH: `count(*) * 2`, `sum(x) / count(*)`.) */
    private def hasAgg(e: Expr): Boolean = e match {
      case _: EAgg => true
      case EArith(_, l, r) => hasAgg(l) || hasAgg(r)
      case EFn(_, as) => as.exists(hasAgg)
      case EList(xs) => xs.exists(hasAgg)
      case EIndex(b, ix) => hasAgg(b) || hasAgg(ix)
      case ESlice(b, lo, hi) => hasAgg(b) || lo.exists(hasAgg) || hi.exists(hasAgg)
      case EMapLit(es) => es.exists(kv => hasAgg(kv._2))
      case EComp(_, lst, wh, mp) =>
        hasAgg(lst) || wh.exists(predHasAgg) || mp.exists(hasAgg)
      case EReduce(_, init, _, lst, body) =>
        hasAgg(init) || hasAgg(lst) || hasAgg(body)
      case ECase(op, whens, els) =>
        op.exists(hasAgg) || els.exists(hasAgg) ||
          whens.exists { case (c, t) => hasAgg(t) || c.fold(predHasAgg, hasAgg) }
      case _ => false
    }
    /** `e` evaluated over ZERO input rows (Neo4j's empty-aggregation
      * results): count/sum → 0, collect → [], every other aggregate →
      * null; non-aggregate sub-terms are left intact so imported
      * scalars resolve in the outer scope. Used to refill zero-match
      * bindings after a correlated CALL{} left join. */
    private def zeroRowExpr(e: Expr): Expr = e match {
      case EAgg("count", _, _) => ELit(0L)
      case EAgg("sum", _, _) => ELit(0L)
      case EAgg("collect", _, _) => EList(Nil)
      case EAgg(_, _, _) => ELit(null)
      case EArith(op, l, r) => EArith(op, zeroRowExpr(l), zeroRowExpr(r))
      case EFn(f, as) => EFn(f, as.map(zeroRowExpr))
      case EList(xs) => EList(xs.map(zeroRowExpr))
      case EIndex(b, ix) => EIndex(zeroRowExpr(b), zeroRowExpr(ix))
      case ESlice(b, lo, hi) =>
        ESlice(zeroRowExpr(b), lo.map(zeroRowExpr), hi.map(zeroRowExpr))
      case EMapLit(es) =>
        EMapLit(es.map { case (k, v) => (k, zeroRowExpr(v)) })
      case ECase(op, whens, els) =>
        ECase(op.map(zeroRowExpr),
          whens.map { case (c, t) => (c, zeroRowExpr(t)) },
          els.map(zeroRowExpr))
      case other => other
    }

    private def predHasAgg(p: Pred): Boolean = p match {
      case PCmp(_, l, r) => hasAgg(l) || hasAgg(r)
      case PStr(_, l, r) => hasAgg(l) || hasAgg(r)
      case PIn(l, r) => hasAgg(l) || hasAgg(r)
      case PAnd(l, r) => predHasAgg(l) || predHasAgg(r)
      case POr(l, r) => predHasAgg(l) || predHasAgg(r)
      case PXor(l, r) => predHasAgg(l) || predHasAgg(r)
      case PNot(i) => predHasAgg(i)
      case PIsNull(e, _) => hasAgg(e)
      case PBoolE(e) => hasAgg(e)
      case _ => false // PPattern / PHasLabel / PQuant carry no aggregates
    }

    /** Lift every nested EAgg out of `e`: each distinct aggregate gets
      * a temp column (structural dedup — `count(*) + count(*)` computes
      * once), and the rewritten expression references the temps as
      * scalar columns. The caller aggregates the temps, registers them
      * as scalar vars, and projects the rewritten expression on top —
      * one hash aggregate plus one projection, never two passes. */
    private def liftAggs(e: Expr,
                         acc: scala.collection.mutable.ArrayBuffer[(String, Expr)]): Expr = e match {
      case a: EAgg =>
        val tmp = acc.find(_._2 == a).map(_._1).getOrElse {
          val t = s"_agg${acc.size}$$tmp"
          acc += (t -> a)
          t
        }
        EVar(tmp)
      case EArith(op, l, r) => EArith(op, liftAggs(l, acc), liftAggs(r, acc))
      case EFn(fn, as) => EFn(fn, as.map(liftAggs(_, acc)))
      case EList(xs) => EList(xs.map(liftAggs(_, acc)))
      case EIndex(b, ix) => EIndex(liftAggs(b, acc), liftAggs(ix, acc))
      case ESlice(b, lo, hi) =>
        ESlice(liftAggs(b, acc), lo.map(liftAggs(_, acc)), hi.map(liftAggs(_, acc)))
      case EMapLit(es) =>
        EMapLit(es.map { case (k, v) => (k, liftAggs(v, acc)) })
      case EComp(v, lst, wh, mp) =>
        EComp(v, liftAggs(lst, acc), wh.map(liftPredAggs(_, acc)),
          mp.map(liftAggs(_, acc)))
      case EReduce(an, init, v, lst, body) =>
        EReduce(an, liftAggs(init, acc), v, liftAggs(lst, acc),
          liftAggs(body, acc))
      case ECase(op, whens, els) =>
        ECase(op.map(liftAggs(_, acc)),
          whens.map { case (c, t) =>
            (c.fold(p => Left(liftPredAggs(p, acc)), v => Right(liftAggs(v, acc))),
              liftAggs(t, acc))
          },
          els.map(liftAggs(_, acc)))
      case other => other
    }
    private def liftPredAggs(p: Pred,
                             acc: scala.collection.mutable.ArrayBuffer[(String, Expr)]): Pred = p match {
      case PCmp(op, l, r) => PCmp(op, liftAggs(l, acc), liftAggs(r, acc))
      case PStr(op, l, r) => PStr(op, liftAggs(l, acc), liftAggs(r, acc))
      case PIn(l, r) => PIn(liftAggs(l, acc), liftAggs(r, acc))
      case PAnd(l, r) => PAnd(liftPredAggs(l, acc), liftPredAggs(r, acc))
      case POr(l, r) => POr(liftPredAggs(l, acc), liftPredAggs(r, acc))
      case PXor(l, r) => PXor(liftPredAggs(l, acc), liftPredAggs(r, acc))
      case PNot(i) => PNot(liftPredAggs(i, acc))
      case PIsNull(e2, n) => PIsNull(liftAggs(e2, acc), n)
      case PBoolE(e2) => PBoolE(liftAggs(e2, acc))
      case other => other
    }

    private def aggCol(e: Expr): Column = e match {
      case EAgg("count", None, _) => count(lit(1))
      case EAgg("count", Some(EVar(v)), true) if relVars(v) =>
        // a relationship's identity is the full (src, type, dst) edge —
        // distinct on src alone would merge parallel edges. This is the
        // ENGINE's edge-identity contract (GraphStore.edgeCols: upserts
        // key on exactly this triple, so duplicate triples cannot exist
        // in a stored graph); it diverges from Neo4j only for ad-hoc
        // edge frames that carry duplicate (src, type, dst) rows, where
        // Neo4j's per-relationship element ids would count each copy
        countDistinct(col(ns(v, "src_uid")), col(ns(v, "rel_type")), col(ns(v, "dst_uid")))
      case EAgg("count", Some(a), true) => countDistinct(countableCol(a))
      case EAgg("count", Some(a), false) => count(countableCol(a))
      case EAgg("collect", Some(a), d) =>
        val c = exprCol(a)
        if (d) collect_set(c) else collect_list(c)
      case EAgg(fn, Some(a), _) =>
        val c = exprCol(a)
        fn match {
          case "sum" => sum(c); case "min" => min(c); case "max" => max(c)
          case "avg" => avg(c)
          case "stdev" => stddev_samp(c) // Neo4j stDev = sample (n-1)
          case "stdevp" => stddev_pop(c)
          case pc if pc.startsWith("percentilecont:") =>
            // linear interpolation — Spark's exact `percentile`
            call_function("percentile", c,
              lit(percentileFrac(pc.stripPrefix("percentilecont:"))))
          case pd if pd.startsWith("percentiledisc:") =>
            // Neo4j percentileDisc: the ceil(p*n)-th smallest VALUE
            // (1-based, nearest-rank). Materializes the group as a
            // sorted list — group-sized memory, the same cost Neo4j
            // pays; fine for analytics-sized groups, not for a
            // billion-row group (use percentileCont there).
            val p = percentileFrac(pd.stripPrefix("percentiledisc:"))
            val sorted = sort_array(collect_list(c))
            element_at(sorted,
              greatest(lit(1), ceil(size(sorted) * lit(p))).cast("int"))
          case other => sys.error(s"unsupported aggregate $other")
        }
      case other => sys.error(s"not an aggregate: $other")
    }

    /** Resolve a percentile fraction tag: a literal rides verbatim, a
      * `$name` resolves from the params map; both range-checked. */
    private def percentileFrac(tag: String): Double = {
      val p =
        if (tag.startsWith("$"))
          params.getOrElse(tag.drop(1),
            sys.error(s"missing parameter $tag")) match {
            case n: java.lang.Number => n.doubleValue()
            case o => sys.error(
              s"percentile fraction parameter $tag must be numeric, got $o")
          }
        else tag.toDouble
      require(p >= 0.0 && p <= 1.0, s"percentile fraction out of [0,1]: $p")
      p
    }

    /** count(n) counts bindings (nulls impossible for bound vars) —
      * count the uid, not a struct, so codegen stays simple. */
    private def countableCol(a: Expr): Column = a match {
      case EVar(v) if !scalarVars(v) =>
        col(ns(v, if (relVars(v)) "src_uid" else "uid"))
      case other => exprCol(other)
    }
  }

  /** Parse + compile a read-only Cypher query over `(nodes, edges)`.
    * `params` substitutes `$name` references (the neo4j driver's params
    * dict, `neo4j_db.py:93-106`). */
  def run(cypher: String, nodes: DataFrame, edges: DataFrame,
          params: Map[String, Any] = Map.empty): DataFrame = {
    val (parts0, all) = new Parser(tokenize(cypher)).unionQuery()
    // DELIBERATE DIVERGENCE (like the walk-semantics note): a trailing
    // ORDER BY / SKIP / LIMIT after the last UNION part applies to the
    // WHOLE union here. The openCypher grammar attaches these
    // sub-clauses to the last single query's RETURN (branch-local);
    // Neo4j itself rejects most branch-local forms and tells users to
    // wrap the union in CALL {} to paginate it. This engine implements
    // the wrapped meaning directly — a trailing LIMIT caps the combined
    // result, which is what every observed user query intends —
    // instead of silently paginating one branch. Strip it from the
    // last part and re-apply post-union.
    val tailMods = parts0.last match {
      case q if parts0.size > 1 &&
          (q.orderBy.nonEmpty || q.skip.isDefined || q.limit.isDefined) =>
        Some((q.orderBy, q.skip, q.limit))
      case _ => None
    }
    val parts =
      if (tailMods.isDefined)
        parts0.init :+ parts0.last.copy(orderBy = Nil, skip = None, limit = None)
      else parts0
    // one Compiler per part: var-binding state is per-subquery scope
    val frames = parts.map(q => new Compiler(nodes, edges, params).compile(q))
    frames.tail.foreach { f =>
      require(java.util.Arrays.equals(
        f.columns.asInstanceOf[Array[AnyRef]],
        frames.head.columns.asInstanceOf[Array[AnyRef]]),
        "UNION parts must return the same column names: " +
          s"${frames.head.columns.mkString(", ")} vs ${f.columns.mkString(", ")}")
    }
    val u = frames.reduce(_ unionByName _)
    val base = if (parts.size > 1 && !all) u.distinct() else u
    tailMods.fold(base) { case (ob, sk, lim) =>
      var r = base
      if (ob.nonEmpty) r = r.orderBy(ob.map { k =>
        require(r.columns.contains(k.ref),
          s"ORDER BY after UNION must use output column names (got '${k.ref}')")
        if (k.asc) col("`" + k.ref + "`").asc_nulls_last
        else col("`" + k.ref + "`").desc_nulls_first
      }: _*)
      sk.foreach(n => r = r.offset(n.toInt))
      lim.foreach(n => r = r.limit(n.toInt))
      r
    }
  }
}
