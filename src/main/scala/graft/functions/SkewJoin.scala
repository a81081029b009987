package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted join for skewed keys (SURVEY §4 / 100 TB notes): when one join
  * key dominates (the "Restabfalltonne problem" — one stream holds most
  * items), a plain shuffle join lands the hot key on one task. Salting
  * splits the hot key across `buckets` tasks: the big side gets a
  * deterministic per-row salt, the small side is replicated once per
  * salt value. Result is exactly the plain join, wall-clock is
  * max-partition-bound instead of hot-key-bound.
  *
  * AQE's skew-join handling covers the sort-merge case at runtime; this
  * explicit form also covers aggregations-after-join and engines/paths
  * where AQE can't split (e.g. bucketed tables).
  */
object SkewJoin {

  /** Inner-join `big` with `small` on `key`, salted `buckets` ways.
    * Salt is the row's position id, not a content hash: fully-duplicate
    * hot-key rows (the common skew shape) would all hash to one bucket,
    * silently re-concentrating the hot key on a single task — and a
    * content hash rejects MapType columns. Position ids spread
    * duplicates evenly; the join RESULT is identical for any salt
    * assignment (the salt only picks which task computes each row), so
    * reruns still produce identical results.
    */
  def salted(big: DataFrame, small: DataFrame, key: String, buckets: Int): DataFrame = {
    require(buckets > 0)
    val bigS = big.withColumn("_salt",
      pmod(monotonically_increasing_id(), lit(buckets)).cast("int"))
    val smallS = small.withColumn("_salt",
      explode(sequence(lit(0), lit(buckets - 1))))
    bigS.join(smallS, Seq(key, "_salt")).drop("_salt")
  }
}
