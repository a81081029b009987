package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.types.DecimalType

/** Aggregate-navigation ("materialized view rewrite") registry: maps a
  * governed base table to a persisted rollup whose partial aggregates
  * can answer aggregate queries over the base without scanning it.
  *
  * The reference keeps no derived tables at all — every stats call
  * recounts the graph (`neo4j_db.py:122-148`). At 100 TB that recount
  * IS the cost model, so the engine adds the standard warehouse answer:
  * queries stay written against the base table, and the optimizer
  * swaps in the rollup when the partials can prove the same result —
  * count re-sums, sum re-sums, min/max re-fold. This is the read-side
  * complement of q74's write-side incremental maintenance.
  */
object MvRegistry {
  /** One registered rollup. `keyCols`/`sumCols`/... map BASE column
    * names to MV partial column names. The MV may be keyed FINER than a
    * query's grouping (extra keys re-aggregate away); a query grouping
    * on anything outside `keyCols` is not rewritten.
    *
    * `sumCols` also records the EXACT decimal type the partial was
    * built with — sum(CAST(col AS that-type)) — because a query casting
    * to any other precision/scale (e.g. decimal(18,0), which rounds
    * per-row before summing) is a numerically different aggregate that
    * the partial cannot answer.
    *
    * Registration asserts a contract the rule cannot check: each MV
    * partial column really holds count(*) / sum(CAST(col AS
    * DECIMAL(p,s))) / min(col) / max(col) grouped by the key columns.
    */
  final case class MvDef(
      basePath: String,
      mvPlan: LogicalPlan,
      keyCols: Map[String, String],
      countCol: String,
      sumCols: Map[String, (String, DecimalType)],
      minCols: Map[String, String],
      maxCols: Map[String, String])

  @volatile private var defs: List[MvDef] = Nil
  def register(mv: MvDef): Unit = synchronized {
    defs = mv :: defs.filterNot(_.basePath == mv.basePath)
  }
  def unregister(basePath: String): Unit = synchronized {
    defs = defs.filterNot(_.basePath == basePath)
  }
  def all: List[MvDef] = defs
}

/** Optimizer rule (installed via `spark.experimental.extraOptimizations`
  * in GraftSession, the public end-of-optimizer extension point):
  * rewrites `Aggregate` over a registered base-table scan into the same
  * aggregate over the rollup's partials.
  *
  * Matching is deliberately conservative — a miss costs a base scan, a
  * false hit costs wrong answers:
  *  - the aggregate's child must be a bare scan (optionally a pruning
  *    Project of plain attributes) of the registered path: any Filter
  *    means partial groups, which rollup partials cannot answer;
  *  - every grouping expression must be a registered key column;
  *  - every aggregate call must be DISTINCT-free, FILTER-free
  *    count(*)/sum(CAST(col AS DECIMAL))/min(col)/max(col) with a
  *    registered partial. The decimal cast is required on sum so the
  *    re-summed partials are bit-identical to the direct sum (double
  *    sums would differ in rounding, breaking "rewrite ≡ recompute");
  *  - scalar expressions AROUND the aggregates (round/cast collapsed in
  *    by CollapseProject) rewrite recursively; anything unrecognized
  *    bails out to the original plan.
  *
  * Output attributes keep the original names AND exprIds, so operators
  * above the aggregate (sort, project, join) are untouched.
  */
object MvRewrite extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (MvRegistry.all.isEmpty) plan
    else plan.transformUp {
      case agg: Aggregate =>
        MvRegistry.all.collectFirst {
          case mv if scansBase(agg.child, mv.basePath) =>
            rewrite(agg, mv)
        }.flatten.getOrElse(agg)
    }

  /** The aggregate input is exactly a scan of `basePath` — a
    * LogicalRelation on that path, under at most a column-pruning
    * Project. A Filter (or anything else) disqualifies. */
  private def scansBase(p: LogicalPlan, basePath: String): Boolean = p match {
    case Project(pl, child) if pl.forall(_.isInstanceOf[AttributeReference]) =>
      scansBase(child, basePath)
    case lr: LogicalRelation =>
      lr.relation match {
        case fs: HadoopFsRelation =>
          fs.location.rootPaths.exists(_.toUri.getPath ==
            new java.io.File(basePath).getAbsolutePath)
        case _ => false
      }
    case _ => false
  }

  private def rewrite(agg: Aggregate, mv: MvRegistry.MvDef): Option[Aggregate] = {
    val mvAttr: Map[String, Attribute] = mv.mvPlan.output.map(a => a.name -> a).toMap
    // MvDef names must exist in the MV scan, or the def is malformed —
    // bail (never throw from an optimizer rule on registry typos).
    val wanted = mv.keyCols.values ++ Seq(mv.countCol) ++
      mv.sumCols.values.map(_._1) ++ mv.minCols.values ++ mv.maxCols.values
    if (!wanted.forall(mvAttr.contains)) return None

    val groupOk = agg.groupingExpressions.forall {
      case a: AttributeReference => mv.keyCols.contains(a.name)
      case _ => false
    }
    if (!groupOk) return None

    // count(*) over the base = sum of count partials; a rollup row
    // exists for every group, so the sum is never null — but coalesce
    // keeps the replacement non-nullable like Count itself. The literal
    // must be NON-NULL: count(NULL) is legal SQL that always returns 0,
    // and rewriting it to the partial sum would return the group's row
    // count instead.
    def reAgg(ae: AggregateExpression): Option[Expression] = {
      if (ae.isDistinct || ae.filter.isDefined) return None
      ae.aggregateFunction match {
        case Count(Seq(Literal(v, _))) if v != null =>
          Some(Coalesce(Seq(
            Sum(mvAttr(mv.countCol)).toAggregateExpression(), Literal(0L))))
        case Sum(Cast(a: AttributeReference, dt: DecimalType, _, _), _)
            if mv.sumCols.get(a.name).exists(_._2 == dt) =>
          // the cast type must EQUAL the one the partial was built with:
          // a different scale rounds per-row before summing, so the
          // partial re-sum would be a numerically different answer.
          // re-summing widens decimal precision; cast back to the
          // original sum's type so downstream exprIds keep their type
          Some(Cast(Sum(mvAttr(mv.sumCols(a.name)._1)).toAggregateExpression(),
            ae.dataType))
        case Min(a: AttributeReference) if mv.minCols.contains(a.name) =>
          Some(Min(mvAttr(mv.minCols(a.name))).toAggregateExpression())
        case Max(a: AttributeReference) if mv.maxCols.contains(a.name) =>
          Some(Max(mvAttr(mv.maxCols(a.name))).toAggregateExpression())
        case _ => None
      }
    }

    // Rewrite an output expression tree: aggregate calls re-aggregate,
    // bare key references swap to MV keys, scalar wrappers recurse.
    // Any leaf we don't recognize (a non-key base column outside an
    // aggregate, an unsupported aggregate) aborts the whole rewrite.
    def rewriteExpr(e: Expression): Option[Expression] = e match {
      case ae: AggregateExpression => reAgg(ae)
      case a: AttributeReference => mv.keyCols.get(a.name).map(mvAttr)
      case other =>
        val kids = other.children.map(rewriteExpr)
        if (kids.contains(None)) None
        else Some(other.withNewChildren(kids.flatten))
    }

    val outputs: Seq[Option[NamedExpression]] = agg.aggregateExpressions.map {
      case al @ Alias(childE, name) =>
        rewriteExpr(childE).map(ne =>
          Alias(ne, name)(exprId = al.exprId, qualifier = al.qualifier,
            explicitMetadata = al.explicitMetadata))
      case a: AttributeReference =>
        mv.keyCols.get(a.name).map(mc =>
          Alias(mvAttr(mc), a.name)(exprId = a.exprId))
      case _ => None
    }
    if (outputs.contains(None)) return None

    val newGrouping = agg.groupingExpressions.map {
      case a: AttributeReference => mvAttr(mv.keyCols(a.name))
    }
    Some(Aggregate(newGrouping, outputs.flatten, mv.mvPlan))
  }
}
