package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The hot-bucket cap on the co-click pair kernel (SCALE.md §4b): a
  * celebrity bucket must not produce quadratic pairs. The cap is the
  * mitigation AQE cannot provide — skew-split re-partitions the join
  * output, it does not shrink it.
  */
class HotBucketSpec extends SparkSpec {
  import spark.implicits._

  /** 1 hot bucket (100 members) + 3 normal buckets (3 members each). */
  private def syntheticBuckets = {
    val hot = (1 to 100).map(u => (f"user$u%03d", 0L))
    val normal = for (b <- 1L to 3L; u <- 1 to 3) yield (f"user$u%03d", b)
    (hot ++ normal).toDF("user_id", "b")
  }

  test("a celebrity bucket is capped: pairs bounded by cap*(cap-1)/2, not quadratic") {
    val cap = 10
    val pairs = GraphQueries.coClickPairsOf(syntheticBuckets, cap)
    // uncapped, the hot bucket alone would emit 100*99/2 = 4950 pairs;
    // capped, at most 10*9/2 = 45 from it plus <=3 from each normal bucket
    val n = pairs.count()
    assert(n <= cap * (cap - 1) / 2 + 9, s"pair count $n not bounded by the cap")
    assert(n >= cap * (cap - 1) / 2, "cap should KEEP exactly cap members of the hot bucket")
  }

  test("buckets at or under the cap pass through untouched") {
    val capped = GraphQueries.coClickPairsOf(syntheticBuckets, 1000)
      .orderBy("u1", "u2").collect().map(_.toSeq)
    val uncapped = {
      val c = syntheticBuckets
      c.select(col("b"), col("user_id").as("u1"))
        .join(c.select(col("b"), col("user_id").as("u2")), "b")
        .filter(col("u1") < col("u2"))
        .select("u1", "u2").distinct()
        .orderBy("u1", "u2").collect().map(_.toSeq)
    }
    assert(capped.toSeq === uncapped.toSeq)
  }

  test("the pair budget refuses loudly above graft.coclick.maxPairs, pointing at g21b") {
    // (round-10 verdict #5) the guard fires BEFORE the pair join runs:
    // the estimate Σ m·(m−1)/2 over capped buckets exceeds the budget
    spark.conf.set("graft.coclick.maxPairs", "100")
    try {
      val err = intercept[IllegalArgumentException](
        GraphQueries.coClickPairsOf(syntheticBuckets, 1000))
      assert(err.getMessage.contains("g21b"),
        s"guard must point at the bound-peeling route: ${err.getMessage}")
      // under the budget it passes (hot bucket capped to 10 → 45+9 pairs)
      assert(GraphQueries.coClickPairsOf(syntheticBuckets, 10).count() > 0)
    } finally spark.conf.unset("graft.coclick.maxPairs")
  }

  test("the cap is deterministic: same members survive across runs") {
    val a = GraphQueries.capBuckets(syntheticBuckets, 10)
      .orderBy("b", "user_id").collect().map(_.toSeq)
    val b = GraphQueries.capBuckets(syntheticBuckets.repartition(7), 10)
      .orderBy("b", "user_id").collect().map(_.toSeq)
    assert(a.toSeq === b.toSeq)
    assert(a.count(_(1) == 0L) === 10) // hot bucket reduced to exactly cap
  }
}
