package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.Tables

/** Bloom pruning never loses a matching row and actually prunes. */
class BloomPruneSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.01"

  test("pruned join equals plain join; non-matching rows are dropped") {
    val fact = Tables.lineitem(spark, dir)
    val dim = Tables.orders(spark, dir).filter(col("o_totalprice") > 400000)
      .select("o_orderkey")
    val plain = fact.join(dim, col("l_orderkey") === col("o_orderkey"))
    val prunedFact = BloomPrune.prune(fact, dim, "l_orderkey", "o_orderkey",
      expectedItems = 100000L)
    val pruned = prunedFact.join(dim, col("l_orderkey") === col("o_orderkey"))
    assert(pruned.count() === plain.count())
    // the filter did real work: far fewer fact rows survive than total
    val total = fact.count()
    val kept = prunedFact.count()
    assert(kept < total / 2, s"kept=$kept of $total — bloom pruned nothing")
  }

  test("string keys probe as strings — no matching row lost") {
    import spark.implicits._
    val fact = Seq(("p1", 1), ("p2", 2), ("p3", 3), ("zz", 9)).toDF("ref", "x")
    val dim = Seq("p1", "p3").toDF("key")
    val kept = BloomPrune.prune(fact, dim, "ref", "key", expectedItems = 10L)
      .select("ref").as[String].collect().toSet
    // a long-typed probe would cast these to null and drop everything
    assert(Set("p1", "p3").subsetOf(kept))
  }

  test("unsupported key types fail loudly at build, not mid-analysis") {
    import spark.implicits._
    val badDim = Seq(1.5, 2.5).toDF("key")
    val badFact = Seq(1.5).toDF("ref")
    val e = intercept[IllegalArgumentException] {
      BloomPrune.prune(badFact, badDim, "ref", "key", expectedItems = 10L)
    }
    assert(e.getMessage.contains("integral or string"))
  }
}
