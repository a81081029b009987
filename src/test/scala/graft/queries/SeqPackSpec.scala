package graft.queries

import graft.SparkSpec

/** d45 sequence packing: the concat-and-cut law on hand-checkable
  * corpora, boundary carry-over, empty-doc exclusion, and the claim
  * the 100 TB shape rests on — the distributed prefix sum gives the
  * SAME packing at any range-partition count.
  */
class SeqPackSpec extends SparkSpec {
  import spark.implicits._

  private def pack(b: Long, parts: Int, docs: (Long, String)*) =
    TextQueries.seqPack(docs.toSeq.toDF("doc_id", "text"), b, parts)
      .collect()
      .map(r => (r.getAs[Long]("seq_id"), r.getAs[Long]("n_docs"),
        r.getAs[Long]("n_tokens"), r.getAs[Long]("n_carried")))
      .toSeq

  test("concat-and-cut: full sequences fill to B, docs split across boundaries") {
    // deterministic order is md5(doc_id); token counts: "a b c" = 3.
    // Build three docs of 4 tokens with B=6: total 12 tokens → two
    // full sequences; the middle doc must split 2/2 across them.
    val got = pack(6L, 2,
      (1L, "a b c d"), (2L, "e f g h"), (3L, "i j k l"))
    assert(got.map(_._3).sum === 12L) // token conservation
    assert(got.length === 2)
    assert(got.forall(_._3 === 6L)) // both sequences fill exactly
    // exactly one doc carries over the one interior boundary
    assert(got.map(_._4).sum === 1L)
    assert(got.head._4 === 0L) // nothing carries INTO sequence 0
  }

  test("last sequence is the only partial one; empty docs never pack") {
    val got = pack(5L, 3,
      (10L, "a b c"), (11L, ""), (12L, "d e f g"))
    assert(got.map(_._3).sum === 7L) // 3 + 0 + 4
    assert(got.length === 2)
    assert(got.head._3 === 5L)
    assert(got.last._3 === 2L)
  }

  test("the packing is independent of the range-partition count") {
    val docs = (1L to 40L).map(i =>
      i -> Seq.fill((i % 7 + 1).toInt)("tok").mkString(" "))
    val p1 = pack(16L, 1, docs: _*)
    val p3 = pack(16L, 3, docs: _*)
    val p8 = pack(16L, 8, docs: _*)
    assert(p1 === p3)
    assert(p1 === p8)
    assert(p1.map(_._3).sum === docs.map(_._2.split(" ").length.toLong).sum)
  }
}
