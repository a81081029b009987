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

  test("a05 inclusion-exclusion band holds at both SFs") {
    // |A∩B| ≈ hll(A)+hll(B)−hll(A∪B): three 2%-rsd sketches stacked —
    // the 8%-of-(|A|+|B|) band must absorb all three errors at once,
    // and small audiences (sf0.001) are where rsd is worst.
    for (sf <- Seq("/root/testdata/sf0.001", dir)) {
      val rows = RelationalQueries.a05SetOverlap(spark, sf).collect()
      assert(rows.length == 10, s"expected all 10 type pairs at $sf")
      rows.foreach { r =>
        assert(r.getBoolean(7), s"a05 band broken at $sf: $r")
        assert(r.getLong(4) <= math.min(r.getLong(2), r.getLong(3)),
          s"intersection exceeds a side at $sf: $r")
      }
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

  test("a03 histogram quantiles: rank-exact within one bucket width of the exact percentile") {
    // the accuracy law the scaladoc claims: the bucket upper bound is
    // within (max-min)/4096 of the ceil(q*n)-ranked element. Pinned at
    // both SFs (the gate only runs sf0.01).
    for (sf <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val ev = Tables.events(spark, sf)
      val Array(vmin, vmax) = ev.agg(min("value"), max("value"))
        .head().toSeq.map(_.asInstanceOf[Double]).toArray
      val width = (vmax - vmin) / 4096
      val hist = RelationalQueries.a03HistQuantile(spark, sf).collect()
      assert(hist.nonEmpty)
      hist.foreach { r =>
        val et = r.getString(0)
        val n = r.getLong(1)
        for ((q, est) <- Seq((0.5, r.getDouble(3)), (0.99, r.getDouble(4)))) {
          val rank = math.ceil(q * n).toLong
          val elem = ev.filter(col("event_type") === et)
            .orderBy("value").limit(rank.toInt).agg(max("value"))
            .head().getDouble(0)
          assert(math.abs(est - elem) <= width + 1e-6,
            s"$sf $et q=$q est=$est elem=$elem width=$width")
        }
      }
    }
  }
}
