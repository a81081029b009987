package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bounded range join — pair left/right rows with the same key whose
  * times are within `[0, windowUs]` of each other (right after left).
  *
  * Spark plans a plain inequality join as BroadcastNestedLoopJoin —
  * O(n·m) per key and a memory hazard. The scale form buckets both
  * sides into window-sized time bins and equi-joins on (key, bin),
  * probing each left row against its own bin and the next one (any
  * right row within the window lives in one of the two); the exact
  * inequality then filters within the tiny bucket pairs. One shuffle,
  * no nested loop — the standard interval-join shape (cf. Flink's
  * interval join, range-bucketed joins in Trino).
  */
object RangeJoin {

  /** @param left      probe side with `leftTime` (epoch-us long column)
    * @param right     build side with `rightTime` (epoch-us long column)
    * @param key       equi-key on both sides
    * @param windowUs  inclusive upper bound on rightTime - leftTime (≥0)
    */
  def rightWithin(left: DataFrame, right: DataFrame, key: String,
                  leftTime: String, rightTime: String, windowUs: Long): DataFrame = {
    require(windowUs > 0, s"windowUs must be positive, got $windowUs")
    val l = left.withColumn("_bin", (col(leftTime) / windowUs).cast("long"))
      // probe both candidate bins: explode is on the (smaller) probe
      // metadata, not the payload — 2 rows per left row
      .withColumn("_probe_bin", explode(array(col("_bin"), col("_bin") + 1)))
      .drop("_bin")
    val r = right.withColumn("_probe_bin", (col(rightTime) / windowUs).cast("long"))
    l.join(r, Seq(key, "_probe_bin"))
      .filter(col(rightTime) >= col(leftTime) &&
        col(rightTime) - col(leftTime) <= windowUs)
      .drop("_probe_bin")
  }
}
