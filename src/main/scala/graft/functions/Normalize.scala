package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode text canonicalization kernels — the FIRST step of any
  * cross-source dedup pipeline: the same visible text arrives composed
  * (é = U+00E9) from one crawler and decomposed (e + U+0301) from
  * another, and every downstream content hash (d01), shingle (d06/d07),
  * and fingerprint (d05/d14) sees different bytes until normalization
  * makes them identical. Spark ships no NFC/accent functions, so these
  * are native codegen expressions (SURVEY §2.9 preference order) over
  * `java.text.Normalizer` — per-row, no state, whole-stage-codegen
  * friendly; DuckDB's utf8proc-based `nfc_normalize`/`strip_accents`
  * compute the same Unicode algorithms, which is what makes the d30
  * gate possible.
  */
object Normalize // scaladoc anchor

/** Unicode NFC (canonical composition) of a string. */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"nfc_normalize needs STRING, got ${other.catalogString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    NfcNormalize.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NfcNormalize.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)

  override def prettyName: String = "nfc_normalize"
}

object NfcNormalize {
  /** Static entry shared by interpreted eval and generated code. Fast
    * path: Normalizer.isNormalized avoids allocating for the (dominant,
    * e.g. all-ASCII) already-normalized case. */
  def compute(s: UTF8String): UTF8String = {
    val str = s.toString
    if (Normalizer.isNormalized(str, Normalizer.Form.NFC)) s
    else UTF8String.fromString(Normalizer.normalize(str, Normalizer.Form.NFC))
  }
}

/** Accent removal: NFD decomposition, then drop combining marks
  * (Unicode category Mn) — é→e, ü→u, ñ→n, the matching-key fold for
  * fuzzy entity resolution (q42's blocked matching keys on exactly
  * this kind of canonical form). Semantics match DuckDB's
  * `strip_accents` on Latin text. */
case class StripAccents(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"strip_accents needs STRING, got ${other.catalogString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    StripAccents.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.StripAccents.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): StripAccents =
    copy(child = newChild)

  override def prettyName: String = "strip_accents"
}

object StripAccents {
  def compute(s: UTF8String): UTF8String = {
    val str = s.toString
    // fast path for the dominant case: already-NFD text (all ASCII is)
    // with no marks passes through untouched. A no-mark NFD RESULT is
    // not enough — singleton decompositions (Ω→ω, Hangul→Jamo) change
    // the string without producing marks, and the output must stay the
    // decomposed form utf8proc's strip_accents produces.
    if (Normalizer.isNormalized(str, Normalizer.Form.NFD) && !hasMark(str)) s
    else {
      val d = Normalizer.normalize(str, Normalizer.Form.NFD)
      val sb = new java.lang.StringBuilder(d.length)
      var j = 0
      while (j < d.length) {
        val c = d.charAt(j)
        if (Character.getType(c) != Character.NON_SPACING_MARK) sb.append(c)
        j += 1
      }
      UTF8String.fromString(sb.toString)
    }
  }

  private def hasMark(str: String): Boolean = {
    var i = 0
    while (i < str.length) {
      if (Character.getType(str.charAt(i)) == Character.NON_SPACING_MARK) return true
      i += 1
    }
    false
  }
}
