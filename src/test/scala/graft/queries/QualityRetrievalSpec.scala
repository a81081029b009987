package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The round-6 quality/retrieval additions: d33's Gopher rule battery
  * must actually DISCRIMINATE (each staged failure mode fires on its
  * doc_id class and nowhere else), and e12's two-stage retrieval must
  * honor its shortlist contract (every reranked hit came through the
  * coarse stage, exact scores match the e10 brute-force law).
  */
class QualityRetrievalSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("d33: each staged failure mode fires exactly on its doc_id class") {
    val rows = TextQueries.d33GopherRules(spark, dir).collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      val id = r.getLong(r.fieldIndex("doc_id"))
      val bullet = r.getDouble(r.fieldIndex("bullet_ratio"))
      val symbol = r.getDouble(r.fieldIndex("symbol_ratio"))
      val ellip = r.getDouble(r.fieldIndex("ellipsis_ratio"))
      // bullets only via %7: 3 of 4 lines unless %13 adds two more
      if (id % 7 == 0 && id % 13 != 0) assert(bullet === 0.75, s"doc $id")
      if (id % 7 != 0) assert(bullet === 0.0, s"doc $id")
      // '#'/'...' symbols only via %11 / %13
      if (id % 11 != 0 && id % 13 != 0) assert(symbol === 0.0, s"doc $id")
      if (id % 11 == 0) assert(symbol > 0.0, s"doc $id")
      // ellipsis lines only via %13; the 0.3 bound breaks when the
      // ellipsis block is undiluted by the other perturbations (%17
      // appends the numeric run to the last "..." line; %7 adds lines)
      if (id % 13 == 0) assert(ellip > 0.0, s"doc $id")
      else assert(ellip === 0.0, s"doc $id")
      if (id % 13 == 0 && id % 7 != 0 && id % 17 != 0)
        assert(ellip > 0.3, s"doc $id")
    }
    // the battery must split the corpus, not rubber-stamp it
    val n = rows.length
    val ok = rows.count(_.getBoolean(rows.head.fieldIndex("gopher_ok")))
    assert(ok > 0 && ok < n, s"no discrimination: $ok/$n pass")
  }

  test("d33: numeric-run perturbation dents alpha_word_ratio on %17 docs") {
    val rows = TextQueries.d33GopherRules(spark, dir)
      .select("doc_id", "alpha_word_ratio").collect()
    for (r <- rows) {
      val id = r.getLong(0); val alpha = r.getDouble(1)
      // %17 numeric runs, %11 '#' words, and %7's bare '-'/'*' bullet
      // markers all dent the ratio; %3/%13 add only lettered words
      if (id % 17 == 0 || id % 11 == 0 || id % 7 == 0)
        assert(alpha < 1.0, s"doc $id")
      else assert(alpha === 1.0, s"doc $id")
    }
  }

  test("d34: each C4 failure mode fires exactly on its doc_id class") {
    val rows = TextQueries.d34C4Filters(spark, dir).collect()
    assert(rows.nonEmpty)
    val i = rows.head.fieldIndex _
    for (r <- rows) {
      val id = r.getLong(i("doc_id"))
      // lorem/brace flags fire only on their classes
      assert(r.getBoolean(i("has_lorem")) === (id % 15 == 0), s"doc $id")
      assert(r.getBoolean(i("has_brace")) === (id % 10 == 0), s"doc $id")
      // the raw soup line never survives line retention; kept lines
      // come only from the %4 sentences. The %10/%15 tails attach to
      // whatever line is last at that point — the third-sentence line
      // unless %9 interposed its own (already-dropped) line — and a
      // tail strips that line's terminal punctuation, dropping it.
      if (id % 4 == 0) {
        val tailBroken = id % 9 != 0 && (id % 10 == 0 || id % 15 == 0)
        assert(r.getInt(i("n_kept")) === (if (tailBroken) 1 else 2), s"doc $id")
        assert(r.getInt(i("n_sentences")) === (if (tailBroken) 1 else 3), s"doc $id")
      } else {
        assert(r.getInt(i("n_kept")) === 0, s"doc $id")
        assert(r.getString(i("clean_text")) === "", s"doc $id")
      }
      // the %21 javascript line ends in '.' with >=5 words but is
      // filtered by the content rule, never kept
      assert(!r.getString(i("clean_text")).toLowerCase.contains("javascript"), s"doc $id")
      // doc gate: %4 sentences AND no lorem/brace
      val expOk = id % 4 == 0 && id % 15 != 0 && id % 10 != 0
      assert(r.getBoolean(i("c4_ok")) === expOk, s"doc $id")
    }
    val ok = rows.count(_.getBoolean(rows.head.fieldIndex("c4_ok")))
    assert(ok > 0 && ok < rows.length, s"no discrimination: $ok/${rows.length}")
  }

  test("d35: clusters never straddle splits; the naive doc-hash split would leak") {
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    def splitOf(key: Long): String = md5hex(key.toString).charAt(0) match {
      case 'c' | 'd' => "val"
      case 'e' | 'f' => "test"
      case _ => "train"
    }
    val rows = TextQueries.d35LeaksafeSplit(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    assert(rows.nonEmpty)
    // every member of a cluster shares its rep's split — zero leakage
    rows.groupBy(_._2).foreach { case (rep, rs) =>
      assert(rs.map(_._3).distinct.length === 1, s"cluster $rep straddles splits")
      assert(rs.forall(_._3 == splitOf(rep)), s"cluster $rep split key wrong")
    }
    // the corpus stages real near-dup clusters, so the property is live
    val multi = rows.groupBy(_._2).filter(_._2.length > 1)
    assert(multi.nonEmpty, "no multi-doc clusters — property untested")
    // and the operator DOES something: splitting by the raw doc hash
    // (the naive bug) would tear at least one cluster apart
    val naiveTorn = multi.exists { case (_, rs) =>
      rs.map(r => splitOf(r._1)).distinct.length > 1
    }
    assert(naiveTorn, "naive split tears nothing — perturb the fixture")
  }

  test("e13: MMR picks 3 distinct per query; pick 1 is the pure-relevance argmax") {
    val out = SimilarityQueries.e13MmrRerank(spark, dir).collect()
    val byQuery = out.groupBy(_.getLong(0))
    assert(byQuery.nonEmpty)
    byQuery.foreach { case (q, rows) =>
      assert(rows.map(_.getInt(1)).sorted.toSeq === Seq(1, 2, 3), s"query $q")
      assert(rows.map(_.getLong(2)).distinct.length === 3, s"query $q")
      // pick 1 = argmax rel (λ·rel with empty selected set)
      val p1 = rows.find(_.getInt(1) == 1).get
      assert(p1.getDouble(3) === rows.map(_.getDouble(3)).max, s"query $q")
      // λ-mix law: score = 0.7·rel − 0.3·max_sim with max_sim ∈ [−1,1],
      // so it sits within 0.3 of 0.7·rel
      rows.filter(_.getInt(1) > 1).foreach { r =>
        assert(math.abs(r.getDouble(4) - 0.7 * r.getDouble(3)) <= 0.3 + 1e-9, s"query $q")
      }
    }
  }

  test("e12: reranked top-3 ⊆ coarse shortlist; exact scores match brute force") {
    val out = SimilarityQueries.e12MatryoshkaTopk(spark, dir).collect()
    assert(out.nonEmpty)
    // shortlist contract: every surviving row passed stage 1
    out.foreach { r =>
      assert(r.getInt(r.fieldIndex("coarse_rank")) <= 20)
      assert(r.getInt(r.fieldIndex("rank")) <= 3)
    }
    // exact_ip of a survivor equals the full-width dot product law
    // (e10's fold) recomputed independently
    val e = graft.core.Tables.embeddings(spark, dir)
      .select(col("vec_id"), transform(col("embedding"), x => x.cast("double")).as("v"))
    val vecs = e.collect().map(r => r.getLong(0) ->
      r.getSeq[Double](1).toArray).toMap
    out.foreach { r =>
      val q = vecs(r.getLong(r.fieldIndex("query_id")))
      val c = vecs(r.getLong(r.fieldIndex("cand_id")))
      val dot = q.zip(c).foldLeft(0.0) { case (acc, (x, y)) => acc + x * y }
      val got = r.getDouble(r.fieldIndex("exact_ip"))
      assert(math.abs(got - dot) < 1e-5, s"$r vs $dot")
    }
  }
}
