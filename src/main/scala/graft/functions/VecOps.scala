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

  case class VecBuf(var sum: Array[Double], var n: Long)

  private val mean: Aggregator[Seq[Double], VecBuf, Seq[Double]] =
    new Aggregator[Seq[Double], VecBuf, Seq[Double]] {
      def zero: VecBuf = VecBuf(Array.empty, 0L)

      def reduce(b: VecBuf, v: Seq[Double]): VecBuf = {
        if (b.sum.length == 0) b.sum = new Array[Double](v.length)
        var i = 0
        while (i < v.length) { b.sum(i) += v(i); i += 1 }
        b.n += 1
        b
      }

      def merge(x: VecBuf, y: VecBuf): VecBuf = {
        if (x.sum.length == 0) y
        else if (y.sum.length == 0) x
        else {
          var i = 0
          while (i < x.sum.length) { x.sum(i) += y.sum(i); i += 1 }
          x.n += y.n
          x
        }
      }

      def finish(b: VecBuf): Seq[Double] =
        if (b.n == 0) Seq.empty else b.sum.map(_ / b.n).toSeq

      def bufferEncoder: Encoder[VecBuf] = Encoders.product[VecBuf]
      def outputEncoder: Encoder[Seq[Double]] = ExpressionEncoder[Seq[Double]]()
    }

  /** `vec_mean(array<double>)` — use in `agg()`. */
  val vecMean = udaf(mean, ExpressionEncoder[Seq[Double]]())
}
