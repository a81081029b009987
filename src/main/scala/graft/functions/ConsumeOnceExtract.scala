package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import graft.etl.WasteParse

/** F6 as a native Catalyst expression (SURVEY.md §2.9 v2, §7 M5): the
  * ordered, case-insensitive, consume-once multi-pattern extraction
  * (`waste_items.py:174-237`), returning `array<string>`.
  *
  * Versus the Scala-UDF v1: no ScalaUDF closure serialization, no
  * CatalystTypeConverter round-trip per row, and the call participates
  * in whole-stage codegen — the generated code invokes
  * [[ConsumeOnceExtract.extract]] directly on the UTF8String.
  */
case class ConsumeOnceExtract(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"consume_once_extract needs STRING, got ${child.dataType.catalogString}")

  override protected def nullSafeEval(input: Any): Any =
    ConsumeOnceExtract.extract(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.ConsumeOnceExtract.extract($c)")

  override protected def withNewChildInternal(newChild: Expression): ConsumeOnceExtract =
    copy(child = newChild)

  override def prettyName: String = "consume_once_extract"
}

object ConsumeOnceExtract {
  /** Static entry shared by interpreted eval and generated code. */
  def extract(s: UTF8String): ArrayData = {
    val out = WasteParse.extractFromConcat(s.toString)
    new GenericArrayData(out.map(UTF8String.fromString).toArray[Any])
  }
}
