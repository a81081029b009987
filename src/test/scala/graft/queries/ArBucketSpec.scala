package graft.queries

import graft.SparkSpec

/** The m16 aspect-ratio batching kernel on hand-built dimensions:
  * log-space ladder assignment (ties to the smaller bucket), fixed
  * batch sizes with one partial tail per bucket, and the partition-
  * independence the two-pass prefix sum guarantees.
  */
class ArBucketSpec extends SparkSpec {
  import spark.implicits._

  private def batches(parts: Int, size: Int, dims: (Long, Int, Int)*) =
    MultimodalQueries.arBatches(
      dims.toSeq.toDF("id", "w", "h"), parts, size).collect()
      .map(r => (r.getAs[Double]("bucket"), r.getAs[Long]("batch_id"),
        r.getAs[Long]("n_imgs"), r.getAs[Long]("first_id"),
        r.getAs[Long]("last_id"))).toSeq

  test("ladder assignment: log-space nearest, portrait/landscape split correctly") {
    val got = batches(2, 8,
      (1L, 16, 9),  // ar 1.78 → nearest (log) 2.0
      (2L, 4, 3),   // 1.333… → 1.333333
      (3L, 1, 1),   // 1.0
      (4L, 9, 16),  // 0.5625 → 0.5 (log dist to .5 < to .75)
      (5L, 3, 4))   // 0.75
    assert(got.map(_._1).sorted === Seq(0.5, 0.75, 1.0, 1.333333, 2.0))
    assert(got.forall(_._3 === 1L)) // five singleton batches
  }

  test("batching: size-B groups in id order, one partial tail per bucket") {
    // ten 1:1 images → batches of 4: [1..4], [5..8], [9..10]
    val dims = (1L to 10L).map(i => (i, 10, 10))
    val got = batches(3, 4, dims: _*)
    assert(got === Seq(
      (1.0, 0L, 4L, 1L, 4L),
      (1.0, 1L, 4L, 5L, 8L),
      (1.0, 2L, 2L, 9L, 10L)))
  }

  test("the batch plan is independent of the range-partition count") {
    val dims = (1L to 60L).map(i =>
      (i, (i % 7 + 6).toInt, (i % 5 + 6).toInt))
    val p1 = batches(1, 8, dims: _*)
    val p4 = batches(4, 8, dims: _*)
    val p9 = batches(9, 8, dims: _*)
    assert(p1 === p4)
    assert(p1 === p9)
    assert(p1.map(_._3).sum === 60L) // every image batched exactly once
  }
}
