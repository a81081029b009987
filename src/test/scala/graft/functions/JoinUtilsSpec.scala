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

  test("as-of matches a brute-force reference on seeded random data") {
    val rnd = new scala.util.Random(42)
    val left = Seq.tabulate(300)(i =>
      (rnd.nextInt(20).toLong, rnd.nextInt(1000).toLong, i))
    // distinct (key, time) on the right so tie-ordering can't differ
    // between the window plan and the brute force
    val right = Seq.fill(400)(
      (rnd.nextInt(20).toLong, rnd.nextInt(1000).toLong, rnd.nextInt(50).toDouble, rnd.nextInt(999).toLong))
      .groupBy(r => (r._1, r._2)).map(_._2.head).toSeq
    val expected = left.map { case (k, t, id) =>
      val cands = right.filter(r => r._1 == k && r._2 <= t)
      val best = if (cands.isEmpty) None else Some(cands.maxBy(_._2))
      (id, best.map(_._3), best.map(_._4))
    }.toSet
    val out = AsOfJoin.join(
      left.toDF("k", "t", "id"), right.toDF("k", "t", "v", "src"),
      "k", "t", "t", Seq("v", "src"))
      .collect().map(r => (r.getAs[Int]("id"),
        Option(r.getAs[java.lang.Double]("v")).map(_.toDouble),
        Option(r.getAs[java.lang.Long]("src")).map(_.toLong))).toSet
    assert(out === expected)
  }

  test("range join matches a brute-force reference on seeded random data") {
    val rnd = new scala.util.Random(7)
    val w = 100L
    val left = Seq.tabulate(200)(i =>
      (rnd.nextInt(10).toLong, rnd.nextInt(2000).toLong, i))
    val right = Seq.fill(300)((rnd.nextInt(10).toLong, rnd.nextInt(2000).toLong))
    val expected = (for {
      (k, lt, id) <- left
      (rk, rt) <- right
      if rk == k && rt >= lt && rt - lt <= w
    } yield (id, rt)).groupBy(identity).view.mapValues(_.size).toMap
    val out = RangeJoin.rightWithin(
      left.toDF("k", "lt", "id"), right.toDF("k", "rt"), "k", "lt", "rt", w)
      .collect().map(r => (r.getAs[Int]("id"), r.getAs[Long]("rt")))
      .groupBy(identity).view.mapValues(_.size).toMap
    assert(out === expected) // same pairs, same multiplicities
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
