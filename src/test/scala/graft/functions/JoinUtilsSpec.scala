package graft.functions

import graft.SparkSpec

/** Edge semantics of the as-of and range join utilities. */
class JoinUtilsSpec extends SparkSpec {
  import spark.implicits._

  test("as-of: equal timestamp matches, no-prior yields null, latest wins") {
    val left = Seq((1L, 100L, "a"), (1L, 50L, "b"), (2L, 10L, "c"))
      .toDF("k", "t", "tag")
    val right = Seq((1L, 100L, 9.0), (1L, 40L, 7.0), (1L, 60L, 8.0), (2L, 20L, 5.0))
      .toDF("k", "t", "v")
    val out = AsOfJoin.join(left, right, "k", "t", "t", Seq("v"))
      .collect().map(r => (r.getAs[String]("tag"), Option(r.getAs[java.lang.Double]("v")))).toMap
    assert(out("a") === Some(9.0)) // equal ts matches (<= semantics)
    assert(out("b") === Some(7.0)) // 40 is latest <= 50 (60 is after)
    assert(out("c") === None)      // nothing at or before 10
  }

  test("as-of: payload columns all come from the matched row, nulls included") {
    val left = Seq((1L, 100L, "a")).toDF("k", "t", "tag")
    // latest right row (t=90) carries a NULL v — the join must report
    // (null, 90), NOT resurrect v=7.0 from t=40 / stitch columns from
    // two different right rows
    val right = Seq((1L, 40L, Some(7.0), 40L), (1L, 90L, None, 90L))
      .toDF("k", "t", "v", "src")
    val out = AsOfJoin.join(left, right, "k", "t", "t", Seq("v", "src")).collect().head
    assert(Option(out.getAs[java.lang.Double]("v")) === None)
    assert(out.getAs[Long]("src") === 90L)
  }

  test("range join: inclusive bounds, bin-boundary pairs found, no dups") {
    val left = Seq((1L, 0L, "e0"), (1L, 1000L, "e1"), (2L, 0L, "e2"))
      .toDF("k", "lt", "tag")
    val right = Seq(
      (1L, 0L), (1L, 100L), (1L, 99L), (1L, 101L), // around e0's window=100
      (1L, 1050L),                                 // crosses e1's bin boundary
      (2L, 500L))                                  // outside e2's window
      .toDF("k", "rt")
    val out = RangeJoin.rightWithin(left, right, "k", "lt", "rt", 100L)
      .collect().map(r => (r.getAs[String]("tag"), r.getAs[Long]("rt")))
    val byTag = out.groupBy(_._1).view.mapValues(_.map(_._2).sorted.toSeq).toMap
    assert(byTag("e0") === Seq(0L, 99L, 100L)) // inclusive both ends, 101 out
    assert(byTag("e1") === Seq(1050L))         // found across bin boundary
    assert(!byTag.contains("e2"))
    assert(out.length === out.distinct.length) // no duplicate pairs
  }
}
