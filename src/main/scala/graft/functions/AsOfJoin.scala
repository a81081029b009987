package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** As-of join — for each left row, the most recent right row with
  * `rightTime <= leftTime` per key. Spark has no built-in; the naive
  * range-join (`l JOIN r ON key AND r.t <= l.t` + max) explodes
  * quadratically per key. This is the scalable union-sort form: tag both
  * sides, union, one shuffle+sort per key on time, carry the latest
  * right payload forward with `last(ignoreNulls)` — O(n log n), one
  * exchange, no cross product. (The same algorithm behind
  * pandas.merge_asof / DuckDB ASOF JOIN, expressed as a window plan.)
  *
  * The payload travels as ONE struct per right row, so all carried
  * columns come from the same matched right row — carrying each column
  * independently would resurrect an older non-null value when the
  * most-recent right row holds a null in that column (and could stitch
  * columns from different rows). Right rows tied on time are ordered by
  * the payload struct itself, making the carried values deterministic
  * run-to-run (payload types must be orderable — no maps).
  */
object AsOfJoin {

  /** @param left       probe side
    * @param right      reference side (its `payload` columns are carried)
    * @param key        equi-key column name present on both sides
    * @param leftTime   event-time column on `left`
    * @param rightTime  event-time column on `right`
    * @param payload    right columns to carry onto matching left rows
    * @return left rows + payload columns (null when no prior right row)
    */
  def join(left: DataFrame, right: DataFrame, key: String,
           leftTime: String, rightTime: String, payload: Seq[String]): DataFrame = {
    val lCols = left.columns.toSeq
    val pType = StructType(payload.map(c => right.schema(c)))
    // tag: right rows sort BEFORE left rows at equal timestamps (<=)
    val l = left.select(
      (col(key).as("_k") +: col(leftTime).as("_t") +: lit(1).as("_side") +:
        lit(null).cast(pType).as("_p") +:
        lCols.map(col)): _*)
    val r = right.select(
      (col(key).as("_k") +: col(rightTime).as("_t") +: lit(0).as("_side") +:
        struct(payload.map(col): _*).as("_p") +:
        lCols.map(c => lit(null).cast(left.schema(c).dataType).as(c))): _*)
    val w = Window.partitionBy("_k").orderBy(col("_t"), col("_side"), col("_p"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r)
      .select((lCols.map(col) :+ col("_side")) :+
        last(col("_p"), ignoreNulls = true).over(w).as("_v"): _*)
      .filter(col("_side") === 1)
      .select(lCols.map(col) ++ payload.map(c => col("_v").getField(c).as(c)): _*)
  }
}
