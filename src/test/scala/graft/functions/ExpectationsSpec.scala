package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The expectations battery against a frame with one staged violation
  * of every kind — each rule must count exactly its own violations —
  * plus the pass-budget contract (all row rules in one scan/aggregate).
  */
class ExpectationsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val base = Seq(
    (Some(1L), Some("O"), Some(10.0), Some(100L)),
    (Some(2L), Some("F"), Some(-5.0), Some(101L)), // negative price
    (Some(2L), Some("X"), Some(3.0), Some(999L)),  // dup key, bad status, orphan fk
    (None, Some("P"), Some(7.0), None))            // null key; null fk is NOT a violation
    .toDF("k", "status", "price", "cust")

  private lazy val dim = Seq(100L, 101L, 102L).toDF("c_k")

  test("each rule counts exactly its own staged violations") {
    val report = Expectations.check(base)
      .notNull("k")
      .unique("k")
      .acceptedValues("status", Seq("O", "F", "P"))
      .nonNegative("price")
      .referentialIntegrity("cust", dim, "c_k")
      .run()
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getBoolean(3))).toMap
    assert(report(("not_null", "k")) === ((1L, false)))
    assert(report(("unique", "k")) === ((1L, false)))          // one duplicated key group
    assert(report(("accepted_values", "status")) === ((1L, false)))
    assert(report(("non_negative", "price")) === ((1L, false)))
    assert(report(("fk", "cust")) === ((1L, false)))           // 999 orphan; null ignored
  }

  test("a clean frame reports ok on every rule") {
    val clean = Seq((1L, "O", 1.0, 100L), (2L, "F", 2.0, 101L))
      .toDF("k", "status", "price", "cust")
    val report = Expectations.check(clean)
      .notNull("k").unique("k")
      .acceptedValues("status", Seq("O", "F"))
      .nonNegative("price")
      .referentialIntegrity("cust", dim, "c_k")
      .satisfies("price_below_cap", col("price") < 100)
      .run().collect()
    assert(report.length === 6)
    assert(report.forall(r => r.getLong(2) === 0L && r.getBoolean(3)))
  }

  test("satisfies: a null predicate result is a violation (unknown is not a pass)") {
    val df = Seq((Some(1.0)), (None)).toDF("v")
    val rep = Expectations.check(df)
      .satisfies("v_positive", col("v") > 0).run().collect()
    assert(rep.head.getLong(2) === 1L)
  }

  test("row rules share one scan: the plan has a single aggregate over the source") {
    val df = Expectations.check(base)
      .notNull("k").notNull("status").nonNegative("price")
      .acceptedValues("status", Seq("O", "F", "P"))
      .run()
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    // with only row rules there is exactly one (partial+final) aggregate
    // pair and one scan — rule count must not multiply either
    assert("LocalTableScan|Scan ".r.findAllIn(plan).size <= 2, plan)
  }
}
