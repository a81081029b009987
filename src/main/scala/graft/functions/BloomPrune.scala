package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType, StringType}
import org.apache.spark.util.sketch.BloomFilter

/** Bloom-filter join pruning (100 TB path): when a selective dimension
  * joins a huge fact table, most fact rows shuffle only to be dropped.
  * Building a bloom filter over the dimension keys and filtering the
  * fact side BEFORE the exchange turns shuffled bytes from O(fact) into
  * O(matching) — the manual form of Spark's runtime row-group filtering,
  * usable when AQE/DPP can't apply (non-partition keys, pre-aggregated
  * sides, iterative reuse of one filter across many joins).
  *
  * False positives only (never drops a matching row) — the exact join
  * afterwards stays correct.
  */
object BloomPrune {

  /** Build a bloom filter over `keys` of `dim` and return `fact`
    * filtered to probable matches. `expectedItems`/`fpp` size the
    * sketch (1M keys @1% ≈ 1.2 MB broadcast). Probe type follows the
    * fact key's type — `stat.bloomFilter` hashes integral keys as longs
    * and strings as UTF-8 bytes, so the probe must match or matching
    * rows would be dropped.
    */
  def prune(fact: DataFrame, dim: DataFrame, factKey: String, dimKey: String,
            expectedItems: Long = 1000000L, fpp: Double = 0.01): DataFrame = {
    def checkKeyType(dt: org.apache.spark.sql.types.DataType, side: String): Unit = dt match {
      case ByteType | ShortType | IntegerType | LongType | StringType => ()
      case other => throw new IllegalArgumentException(
        // stat.bloomFilter itself only accepts integral/string keys —
        // validate BOTH sides upfront with one clear message instead of
        // letting the analyzer throw a BLOOM_FILTER_WRONG_TYPE later
        s"bloom prune $side key must be integral or string, got ${other.catalogString}")
    }
    checkKeyType(dim.schema(dimKey).dataType, "dim")
    checkKeyType(fact.schema(factKey).dataType, "fact")
    val bloom: BloomFilter = dim.stat.bloomFilter(dimKey, expectedItems, fpp)
    val bc = fact.sparkSession.sparkContext.broadcast(bloom)
    val probe = fact.schema(factKey).dataType match {
      case StringType =>
        udf((k: String) => k != null && bc.value.mightContainString(k))
          .apply(col(factKey))
      case _ =>
        udf((k: java.lang.Long) => k != null && bc.value.mightContainLong(k))
          .apply(col(factKey).cast(LongType))
    }
    fact.filter(col(factKey).isNotNull && probe)
  }
}
