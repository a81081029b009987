package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{ConsumeOnceExtract, CosineSim, MinHash16, SimHash60}

/** Engine extension point (SURVEY.md §7): registers graft's native
  * Catalyst expressions so they are callable from SQL. Install with
  * `SparkSession.builder.withExtensions(new GraftExtensions)` or
  * `spark.sql.extensions=graft.GraftExtensions`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach(ext.injectFunction)
}

object GraftExtensions {
  /** (identifier, info, builder) tuples — shared between the extension
    * injection and direct FunctionRegistry registration (tests, REPLs
    * attaching to an already-built session). */
  val functions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (new FunctionIdentifier("consume_once_extract"),
      new ExpressionInfo(classOf[ConsumeOnceExtract].getName, "consume_once_extract"),
      (children: Seq[Expression]) => ConsumeOnceExtract(children.head)),
    (new FunctionIdentifier("simhash60"),
      new ExpressionInfo(classOf[SimHash60].getName, "simhash60"),
      (children: Seq[Expression]) => SimHash60(children.head)),
    (new FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSim].getName, "cosine_sim"),
      (children: Seq[Expression]) => CosineSim(children.head, children(1))),
    (new FunctionIdentifier("minhash16"),
      new ExpressionInfo(classOf[MinHash16].getName, "minhash16"),
      (children: Seq[Expression]) => MinHash16(children.head)))

  /** Register on a live session (extensions only apply at build time).
    * Idempotent — already-registered names are left alone, so the hot
    * path (`Tables.apply` calls this per read) does no work after the
    * first call. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    functions.foreach { case (id, info, builder) =>
      if (!spark.sessionState.functionRegistry.functionExists(id)) {
        spark.sessionState.functionRegistry.registerFunction(id, info, builder)
      }
    }
}
