package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.ConsumeOnceExtract

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
  val functions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq((
    new FunctionIdentifier("consume_once_extract"),
    new ExpressionInfo(classOf[ConsumeOnceExtract].getName, "consume_once_extract"),
    (children: Seq[Expression]) => ConsumeOnceExtract(children.head)))

  /** Register on a live session (extensions only apply at build time). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    functions.foreach { case (id, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(id, info, builder)
    }
}
