package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.Tables

/** Sketch aggregates for the 100 TB path: HLL distinct counts within
  * tolerance of exact (exact hash-compare is impossible for sketches by
  * design — accuracy bounds are the contract). */
class ApproxSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.01"

  test("approx_count_distinct within 5% of exact on corpus columns") {
    for ((table, column) <- Seq(("orders", "o_custkey"), ("lineitem", "l_orderkey"),
      ("part", "p_brand"))) {
      val df = Tables(spark, dir, table)
      val exact = df.select(countDistinct(col(column))).head().getLong(0)
      val approx = df.select(approx_count_distinct(col(column), 0.02)).head().getLong(0)
      val err = math.abs(approx - exact).toDouble / exact
      assert(err <= 0.05, s"$table.$column: approx=$approx exact=$exact err=$err")
    }
  }

  test("a01/a02 sketch contracts hold at the smallest SF too") {
    // the gate runs at sf0.01; tiny groups are where rank-band and HLL
    // tolerances are most fragile, so pin them at sf0.001 as well
    for (sf <- Seq("/root/testdata/sf0.001", dir)) {
      val a1 = RelationalQueries.a01ApproxProfile(spark, sf).collect()
      assert(a1.nonEmpty)
      a1.foreach { r =>
        assert(r.getBoolean(3) && r.getBoolean(4) && r.getBoolean(5),
          s"a01 contract broken at $sf: $r")
      }
      val a2 = RelationalQueries.a02SketchMerge(spark, sf).collect()
      assert(a2.nonEmpty)
      a2.foreach(r => assert(r.getBoolean(3), s"a02 merge contract broken at $sf: $r"))
    }
  }

  test("approx percentile brackets the exact median") {
    val df = Tables(spark, dir, "orders")
    val Array(p25, p50, p75) = df
      .select(percentile_approx(col("o_totalprice"), array(lit(0.25), lit(0.5), lit(0.75)),
        lit(10000)))
      .head().getSeq[Double](0).toArray
    assert(p25 < p50 && p50 < p75)
    val exactMedian = df.stat.approxQuantile("o_totalprice", Array(0.5), 0.001).head
    assert(math.abs(p50 - exactMedian) / exactMedian < 0.02)
  }
}
