package graft.etl

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** A facility source row with its total-order position (SURVEY.md A3). */
case class FacilityRec(source_order: Long, name: String, address: String,
                       opening_hours: String, contact: String,
                       additional_info: String, link: String)

/** Per-field (order, value) of the earliest non-empty value seen. */
case class MergeBuf(minOrder: Long, fields: Array[(Long, String)])

/** Custom `Aggregator` for the reference's dedup-with-merge semantics
  * (`facilities.py:58-76`): first-seen entry wins, later entries fill
  * only missing fields. The buffer tracks, per field, the smallest
  * source_order carrying a non-empty value — which makes the fold
  * associative and commutative, i.e. safe under Spark's arbitrary
  * partial-aggregation order (SURVEY §7 hard-part 2).
  *
  * [[Facilities.dedupMerge]] implements the same contract declaratively
  * with `min_by`; this Aggregator is the typed-API form (SURVEY §2.9),
  * equivalence-tested in FacilityMergeSpec.
  */
object FacilityMergeAggregator extends Aggregator[FacilityRec, MergeBuf, FacilityRec] {

  private val NumFields = 5
  private val Empty = (Long.MaxValue, "")

  override def zero: MergeBuf = MergeBuf(Long.MaxValue, Array.fill(NumFields)(Empty))

  private def fieldsOf(r: FacilityRec): Array[String] =
    Array(r.address, r.opening_hours, r.contact, r.additional_info, r.link)

  private def pick(a: (Long, String), b: (Long, String)): (Long, String) =
    if (a._1 <= b._1) a else b

  override def reduce(buf: MergeBuf, rec: FacilityRec): MergeBuf = {
    val recFields = fieldsOf(rec).map { v =>
      if (v != null && v.trim.nonEmpty) (rec.source_order, v) else Empty
    }
    MergeBuf(math.min(buf.minOrder, rec.source_order),
      buf.fields.zip(recFields).map { case (a, b) => pick(a, b) })
  }

  override def merge(a: MergeBuf, b: MergeBuf): MergeBuf =
    MergeBuf(math.min(a.minOrder, b.minOrder),
      a.fields.zip(b.fields).map { case (x, y) => pick(x, y) })

  override def finish(buf: MergeBuf): FacilityRec = {
    def f(i: Int): String = if (buf.fields(i)._1 == Long.MaxValue) null else buf.fields(i)._2
    FacilityRec(buf.minOrder, null, f(0), f(1), f(2), f(3), f(4))
  }

  override def bufferEncoder: Encoder[MergeBuf] = Encoders.kryo[MergeBuf]
  override def outputEncoder: Encoder[FacilityRec] = Encoders.product[FacilityRec]
}
