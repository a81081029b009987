package graft.queries

import graft.SparkSpec

/** The ExactSubstr guarantees d39 rides on (k = 8 words):
  *  - a copied run of length L ≥ k words is flagged in the COPY at any
  *    alignment, with exactly L covered words (interval union of the
  *    L−k+1 overlapping duplicated windows) — the first sight is never
  *    flagged;
  *  - two copied runs with ANY fresh words between them stay two spans
  *    (the union is exact — bridge words are never claimed), while
  *    ADJACENT runs fuse into one span covering both exactly;
  *  - runs shorter than k words are invisible (no full window fits) —
  *    the precision floor the paper sets deliberately;
  *  - self-repetition inside one doc counts from its second sight.
  */
class ExactSubstrSpec extends SparkSpec {
  import spark.implicits._

  /** doc_id -> (n_words, n_spans, dup_words) */
  private def run(docs: Seq[(Long, String)]): Map[Long, (Int, Long, Long)] =
    TextQueries.exactSubstrSpans(docs.toDF("doc_id", "text"), 8)
      .collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getLong(2), r.getLong(3))))
      .toMap

  private def ws(prefix: String, n: Int): String =
    (0 until n).map(i => s"$prefix$i").mkString(" ")

  test("a copied 12-word run yields one span of exactly 12 words in the copy only") {
    val copied = ws("c", 12)
    val a = ws("a", 10) + " " + copied + " " + ws("b", 10)
    val b = ws("x", 7) + " " + copied + " " + ws("y", 13) // different alignment
    val m = run(Seq(1L -> a, 2L -> b))
    assert(m(1L) == ((32, 0L, 0L)), s"first sight must stay clean: ${m(1L)}")
    assert(m(2L) == ((32, 1L, 12L)), s"copy must carry one 12-word span: ${m(2L)}")
  }

  test("separated runs stay two exact spans; adjacent runs fuse into one") {
    val r1 = ws("p", 9)
    val r2 = ws("q", 9)
    val src = r1 + " " + ws("m", 30) + " " + r2
    val gapped = ws("u", 5) + " " + r1 + " " + ws("v", 3) + " " + r2
    val mGap = run(Seq(1L -> src, 2L -> gapped))
    assert(mGap(2L)._2 == 2L && mGap(2L)._3 == 18L,
      s"3 fresh bridge words: expected two 9-word spans, never the bridge: ${mGap(2L)}")
    val adjacent = ws("u", 5) + " " + r1 + " " + r2
    val mAdj = run(Seq(1L -> src, 2L -> adjacent))
    assert(mAdj(2L)._2 == 1L && mAdj(2L)._3 == 18L,
      s"adjacent runs: expected one fused span covering exactly both: ${mAdj(2L)}")
  }

  test("detect and remove agree: d39 coverage equals d41 removal on the corpus") {
    // both compute the same interval union — one as closed-form span
    // arithmetic, one as index expansion + anti-filter; per doc,
    // n_words - n_kept (d41) must equal dup_words (d39) exactly
    val dir = "/root/testdata/sf0.001"
    val spans = TextQueries.d39ExactSubstr(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(3)).toMap
    val cleaned = TextQueries.d41ExactSubstrClean(spark, dir).collect()
    assert(cleaned.nonEmpty)
    cleaned.foreach { r =>
      val removed = r.getInt(1) - r.getLong(2)
      assert(removed == spans(r.getLong(0)),
        s"doc ${r.getLong(0)}: d41 removed $removed but d39 covered ${spans(r.getLong(0))}")
    }
  }

  test("runs shorter than k are invisible; self-repetition counts from the second sight") {
    val short = run(Seq(1L -> ws("s", 7), 2L -> (ws("z", 10) + " " + ws("s", 7))))
    assert(short(2L)._2 == 0L, s"7 < k words copied must not flag: ${short(2L)}")
    val rep = ws("r", 10)
    val selfRep = run(Seq(1L -> (rep + " " + rep)))
    assert(selfRep(1L)._2 == 1L && selfRep(1L)._3 >= 10L,
      s"second occurrence within one doc must flag: ${selfRep(1L)}")
  }
}
