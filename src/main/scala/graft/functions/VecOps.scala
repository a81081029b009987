package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Vector aggregation without row explosion (SURVEY §2.9's custom-
  * Aggregator surface applied to the ANN quantizer): elementwise mean
  * of an `array<double>` column as a typed Aggregator.
  *
  * The declarative alternative — `posexplode` + per-(group, dim) avg +
  * `collect_list` reassembly — multiplies every row by the vector
  * dimensionality (64×) before its two shuffles. This Aggregator keeps
  * vectors whole: partial aggregation accumulates one fixed-size
  * double[dim] buffer per group per partition, and only those buffers
  * cross the exchange. At a billion vectors that is the difference
  * between shuffling 64 B rows and shuffling (groups × partitions)
  * small buffers.
  */
object VecOps {

  /** Per-dimension sums AND counts: null vectors contribute nothing,
    * null ELEMENTS are skipped (boxed input type — a primitive
    * Seq[Double] encoder throws on a null element, failing the whole
    * job for one bad row), and ragged lengths average each dimension
    * over the vectors that have it — the exact semantics of the
    * posexplode + per-dim avg formulation this replaces (explode emits
    * the null element, avg ignores it). */
  case class VecBuf(var sum: Array[Double], var cnt: Array[Long])

  private val mean: Aggregator[Seq[java.lang.Double], VecBuf, Seq[Double]] =
    new Aggregator[Seq[java.lang.Double], VecBuf, Seq[Double]] {
      def zero: VecBuf = VecBuf(Array.empty, Array.empty)

      private def grow(b: VecBuf, n: Int): Unit =
        if (b.sum.length < n) {
          b.sum = java.util.Arrays.copyOf(b.sum, n)
          b.cnt = java.util.Arrays.copyOf(b.cnt, n)
        }

      def reduce(b: VecBuf, v: Seq[java.lang.Double]): VecBuf = {
        if (v == null) return b
        grow(b, v.length)
        var i = 0
        while (i < v.length) {
          val x = v(i)
          if (x != null) { b.sum(i) += x; b.cnt(i) += 1 }
          i += 1
        }
        b
      }

      def merge(x: VecBuf, y: VecBuf): VecBuf = {
        grow(x, y.sum.length)
        var i = 0
        while (i < y.sum.length) { x.sum(i) += y.sum(i); x.cnt(i) += y.cnt(i); i += 1 }
        x
      }

      def finish(b: VecBuf): Seq[Double] =
        b.sum.indices.map(i => b.sum(i) / b.cnt(i))

      def bufferEncoder: Encoder[VecBuf] = Encoders.product[VecBuf]
      def outputEncoder: Encoder[Seq[Double]] = ExpressionEncoder[Seq[Double]]()
    }

  /** `vec_mean(array<double>)` — use in `agg()`. */
  val vecMean = udaf(mean, ExpressionEncoder[Seq[java.lang.Double]]())
}
