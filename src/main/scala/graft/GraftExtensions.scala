package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{ConsumeOnceExtract, CosineSim, MinHash16, NfcNormalize, SimHash60, StripAccents}

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
  /** Arity guard: a wrong-arity SQL call must fail with a readable
    * message, not an IndexOutOfBounds escaping the registry builder. */
  private def arity(name: String, n: Int)(b: Seq[Expression] => Expression): Seq[Expression] => Expression =
    children => {
      if (children.length != n) throw new IllegalArgumentException(
        s"$name expects $n argument(s), got ${children.length}")
      b(children)
    }

  val functions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (new FunctionIdentifier("consume_once_extract"),
      new ExpressionInfo(classOf[ConsumeOnceExtract].getName, "consume_once_extract"),
      arity("consume_once_extract", 1)(c => ConsumeOnceExtract(c.head))),
    (new FunctionIdentifier("simhash60"),
      new ExpressionInfo(classOf[SimHash60].getName, "simhash60"),
      arity("simhash60", 1)(c => SimHash60(c.head))),
    (new FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSim].getName, "cosine_sim"),
      arity("cosine_sim", 2)(c => CosineSim(c.head, c(1)))),
    (new FunctionIdentifier("minhash16"),
      new ExpressionInfo(classOf[MinHash16].getName, "minhash16"),
      arity("minhash16", 1)(c => MinHash16(c.head))),
    (new FunctionIdentifier("nfc_normalize"),
      new ExpressionInfo(classOf[NfcNormalize].getName, "nfc_normalize"),
      arity("nfc_normalize", 1)(c => NfcNormalize(c.head))),
    (new FunctionIdentifier("strip_accents"),
      new ExpressionInfo(classOf[StripAccents].getName, "strip_accents"),
      arity("strip_accents", 1)(c => StripAccents(c.head))))

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
