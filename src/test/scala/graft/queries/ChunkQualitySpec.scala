package graft.queries

import graft.SparkSpec

/** d47 chunking and d48 quality-classifier kernels on hand corpora:
  * chunk coverage/overlap laws and the classifier's determinism and
  * edge cases (the oracle gates exact values at sf-scale; these pin
  * the semantics a refactor must preserve).
  */
class ChunkQualitySpec extends SparkSpec {
  import spark.implicits._

  private def chunks(c: Int, s: Int, docs: (Long, String)*) =
    TextQueries.chunkOverlap(docs.toSeq.toDF("doc_id", "text"), c, s)
      .collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Int]("chunk_ix"),
        r.getAs[Int]("start"), r.getAs[Int]("n_toks"),
        r.getAs[String]("chunk_text")))
      .toSeq

  test("chunking: stride windows cover every token, overlap = C - S") {
    val text = (1 to 10).map(i => s"t$i").mkString(" ") // 10 tokens
    val got = chunks(4, 3, (7L, text))
    // starts 0,3,6,9 → 4 chunks; last is the 1-token tail
    assert(got.map(_._3) === Seq(0, 3, 6, 9))
    assert(got.map(_._4) === Seq(4, 4, 4, 1))
    assert(got.head._5 === "t1 t2 t3 t4")
    assert(got(1)._5 === "t4 t5 t6 t7") // 1-token overlap (C-S)
    assert(got.last._5 === "t10")
    // every token appears; interior tokens at stride boundaries twice
    val flat = got.flatMap(_._5.split(" "))
    assert(flat.toSet === (1 to 10).map(i => s"t$i").toSet)
    assert(flat.count(_ == "t4") === 2)
  }

  test("chunking: a doc shorter than one window is a single tail chunk") {
    val got = chunks(32, 24, (1L, "only three tokens"))
    assert(got === Seq((1L, 0, 0, 3, "only three tokens")))
  }

  test("budget selection: greedy prefix, partition-count independent") {
    val scored = Seq(
      (1L, 0.9, 10L), (2L, 0.8, 10L), (3L, 0.7, 10L),
      (4L, 0.7, 10L), (5L, 0.1, 10L))
      .toDF("doc_id", "score", "toks")
    // budget 35: docs 1,2,3 fit (cum 10,20,30); doc 4 (cum 40) does not
    val sel = (p: Int) => TextQueries.budgetSelect(scored, 35L, p)
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("cum_tokens")))
      .toSeq.sortBy(_._1)
    assert(sel(2) === Seq((1L, 10L), (2L, 20L), (3L, 30L)))
    // the prefix-sum law: same selection at any partition count
    assert(sel(1) === sel(2))
    assert(sel(5) === sel(2))
    // score tie broken by doc_id: 3 beats 4 deterministically
    assert(!sel(3).exists(_._1 == 4L))
  }

  test("quality classifier: deterministic, sign-split, empty-gram guard") {
    val got = TextQueries.qualityClassify(Seq(
        (1L, "alpha beta gamma"),
        (2L, "alpha beta gamma"), // same text → identical score
        (3L, "12345 ...")) // no [a-z] grams → score 0, fail
      .toDF("doc_id", "text"))
      .collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Int]("n_feats"),
        r.getAs[Double]("score"), r.getAs[Boolean]("pass")))
      .toSeq.sortBy(_._1)
    assert(got(0)._2 === 5) // 3 unigrams + 2 bigrams
    assert(got(0)._3 === got(1)._3)
    assert(got(0)._4 === got(1)._4)
    assert(got(2) === ((3L, 0, 0.0, false)))
    // score is the mean hashed weight, bounded in [-1, 1]
    assert(got.forall(g => g._3 >= -1.0 && g._3 <= 1.0))
  }
}
