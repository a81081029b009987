package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** q94's scale claim is that the aggregate form — two groupings over
  * one order-keyed exchange — is SEMANTICS-PRESERVING for TPC-H Q21's
  * correlated EXISTS (another supplier on the order) + NOT EXISTS
  * (another LATE supplier). This spec runs both formulations — the
  * shipped aggregate rewrite and the literal existential joins — on
  * sf0.001 and requires row-for-row identity, so the rewrite can never
  * drift from the textbook semantics without a red test. */
class SoleBlameSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  /** The textbook formulation: semi join for "some OTHER supplier on
    * the order", anti join for "no OTHER supplier was late". */
  private def literalExists() = {
    val l = graft.core.Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_suppkey"), col("l_shipdate"))
      .join(graft.core.Tables.orders(spark, dir)
        .select(col("o_orderkey"), col("o_orderdate")),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("l_orderkey"), col("l_suppkey"),
        (col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"))
          .as("late"))
    val late = l.filter(col("late"))
      .select(col("l_orderkey"), col("l_suppkey")).distinct()
    val others = l.select(col("l_orderkey").as("o2"), col("l_suppkey").as("s2"))
      .distinct()
    val lateOthers = late.select(col("l_orderkey").as("o3"), col("l_suppkey").as("s3"))
    late
      .join(others,
        col("l_orderkey") === col("o2") && col("l_suppkey") =!= col("s2"),
        "left_semi")
      .join(lateOthers,
        col("l_orderkey") === col("o3") && col("l_suppkey") =!= col("s3"),
        "left_anti")
      .groupBy("l_suppkey").agg(count(lit(1)).as("numwait"))
  }

  test("aggregate rewrite equals the literal EXISTS/NOT-EXISTS formulation") {
    val rewrite = RelationalQueries.q94SoleBlame(spark, dir)
      .select(col("s_suppkey").as("l_suppkey"), col("numwait"))
    val textbook = literalExists()
    assert(rewrite.count() > 0, "fixture must exercise the predicate")
    assert(rewrite.exceptAll(textbook).isEmpty &&
      textbook.exceptAll(rewrite).isEmpty,
      "aggregate form and existential form must agree row-for-row")
  }

  test("every reported order-blame is on a multi-supplier order") {
    // numwait sums to the number of qualifying (order, supplier) pairs;
    // each must come from an order with >= 2 suppliers by construction.
    val total = RelationalQueries.q94SoleBlame(spark, dir)
      .agg(sum(col("numwait"))).head().getLong(0)
    assert(total > 0)
  }
}
