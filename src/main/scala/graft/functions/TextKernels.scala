package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native scalar kernels for the text/similarity pipelines (SURVEY.md
  * §2.9 preference order: custom codegen `Expression` over UDF).
  *
  * Both exist because the Catalyst higher-order-function formulations,
  * while declarative, evaluate their lambdas interpreted per element —
  * the 60-bit SimHash fold is 60 passes over every token array
  * (~3s/5k docs), and the UDF cosine pays a CatalystTypeConverter
  * Seq[Double] copy per row. These compiled loops are the same math
  * bit-for-bit (sequential fold order), so the DuckDB oracles are
  * unchanged.
  */
object TextKernels // scaladoc anchor

/** 60-bit SimHash (Charikar) over a token array: token hash = first 15
  * hex chars of md5 (= top 60 bits of the digest, identical to
  * `conv(substring(md5(x),1,15),16,10)`), bit b set when the +1/−1
  * token vote for bit b is positive. A null token votes −1 on every bit
  * — the exact behavior of the SQL `IF((shiftright(null,b)&1)=1,1,-1)`
  * fold it replaces.
  */
case class SimHash60(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"simhash60 needs ARRAY<STRING>, got ${other.catalogString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    SimHash60.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHash60.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHash60 =
    copy(child = newChild)

  override def prettyName: String = "simhash60"
}

object SimHash60 {
  private val digests = ThreadLocal.withInitial[MessageDigest](() =>
    MessageDigest.getInstance("MD5"))

  /** Static entry shared by interpreted eval and generated code. */
  def compute(tokens: ArrayData): Long = {
    val votes = new Array[Int](60)
    val md = digests.get()
    val n = tokens.numElements()
    var i = 0
    while (i < n) {
      val t = tokens.getUTF8String(i)
      if (t == null) {
        var b = 0
        while (b < 60) { votes(b) -= 1; b += 1 }
      } else {
        md.reset()
        val d = md.digest(t.getBytes)
        // top 60 bits of the 128-bit digest, big-endian (15 hex nibbles)
        var h = 0L
        var k = 0
        while (k < 8) { h = (h << 8) | (d(k) & 0xffL); k += 1 }
        h = h >>> 4
        var b = 0
        while (b < 60) {
          if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 60) { if (votes(b) > 0) out |= 1L << b; b += 1 }
    out
  }
}

/** 16 MinHash signatures in one compiled pass: element j is
  * `min(md5('<j>:' || token))` over the token array, as lowercase hex —
  * exactly the value the explode + `groupBy(doc).agg(min(md5(...)))`
  * formulation produces (lexical order on lowercase hex == unsigned
  * byte order on the digest), but computed per row. At corpus scale
  * that deletes the signature stage's shuffle entirely: the exploded
  * formulation moves every shingle of every document through an
  * exchange before the min-agg; this kernel moves nothing. Null tokens
  * are skipped (SQL `min` ignores nulls); an all-null/empty array
  * yields null.
  */
case class MinHash16(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash16 needs ARRAY<STRING>, got ${other.catalogString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    MinHash16.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val javaType = org.apache.spark.sql.catalyst.expressions.codegen.CodeGenerator
      .javaType(dataType)
    nullSafeCodeGen(ctx, ev, c => s"""
      $javaType r = graft.functions.MinHash16.compute($c);
      if (r == null) { ${ev.isNull} = true; } else { ${ev.value} = r; }""")
  }

  override def nullable: Boolean = true

  override protected def withNewChildInternal(newChild: Expression): MinHash16 =
    copy(child = newChild)

  override def prettyName: String = "minhash16"
}

object MinHash16 {
  private val digests = ThreadLocal.withInitial[MessageDigest](() =>
    MessageDigest.getInstance("MD5"))

  private val prefixes: Array[Array[Byte]] =
    (0 until 16).map(j => s"$j:".getBytes("UTF-8")).toArray

  private def less(a: Array[Byte], b: Array[Byte]): Boolean = {
    var i = 0
    while (i < 16) {
      val x = a(i) & 0xff
      val y = b(i) & 0xff
      if (x != y) return x < y
      i += 1
    }
    false
  }

  private val hexChars = "0123456789abcdef".toCharArray

  private def hex(d: Array[Byte]): String = {
    val out = new Array[Char](32)
    var i = 0
    while (i < 16) {
      out(2 * i) = hexChars((d(i) >> 4) & 0xf)
      out(2 * i + 1) = hexChars(d(i) & 0xf)
      i += 1
    }
    new String(out)
  }

  /** Static entry shared by interpreted eval and generated code.
    * Returns null for an empty/all-null token array (SQL min of an
    * empty set). */
  def compute(tokens: ArrayData): ArrayData = {
    val md = digests.get()
    val mins = new Array[Array[Byte]](16)
    val n = tokens.numElements()
    var i = 0
    while (i < n) {
      val t = tokens.getUTF8String(i)
      if (t != null) {
        val tb = t.getBytes
        var j = 0
        while (j < 16) {
          md.reset()
          md.update(prefixes(j))
          md.update(tb)
          val d = md.digest()
          if (mins(j) == null || less(d, mins(j))) mins(j) = d
          j += 1
        }
      }
      i += 1
    }
    if (mins(0) == null) null
    else new org.apache.spark.sql.catalyst.util.GenericArrayData(
      mins.map(d => org.apache.spark.unsafe.types.UTF8String.fromString(hex(d))))
  }
}

/** Cosine similarity between two ARRAY<DOUBLE> vectors — the same
  * sequential dot/norm fold as `list_sum(list_transform(...))` on the
  * oracle side and the Scala UDF it replaces, without the per-row
  * Seq[Double] conversion. Inputs must be dense (no null elements) —
  * they are, by construction: cast from the parquet float vectors.
  */
case class CosineSim(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType

  private def isDoubleArray(t: DataType): Boolean = t match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (isDoubleArray(left.dataType) && isDoubleArray(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"cosine_sim needs two ARRAY<DOUBLE>, got ${left.dataType.catalogString}, " +
        right.dataType.catalogString)

  override protected def nullSafeEval(a: Any, b: Any): Any =
    CosineSim.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.CosineSim.compute($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSim =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "cosine_sim"
}

object CosineSim {
  /** Static entry shared by interpreted eval and generated code. */
  def compute(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a.getDouble(i)
      val y = b.getDouble(i)
      dot += x * y
      na += x * x
      nb += y * y
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }
}
