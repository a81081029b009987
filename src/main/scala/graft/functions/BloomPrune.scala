package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
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
    * sketch (1M keys @1% ≈ 1.2 MB broadcast).
    */
  def prune(fact: DataFrame, dim: DataFrame, factKey: String, dimKey: String,
            expectedItems: Long = 1000000L, fpp: Double = 0.01): DataFrame = {
    val bloom: BloomFilter = dim.stat.bloomFilter(dimKey, expectedItems, fpp)
    val bc = fact.sparkSession.sparkContext.broadcast(bloom)
    val mightContain = udf((k: Long) => bc.value.mightContainLong(k))
    fact.filter(col(factKey).isNotNull && mightContain(col(factKey)))
  }
}
