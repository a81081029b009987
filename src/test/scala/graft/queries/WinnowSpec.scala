package graft.queries

import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.SparkSpec

/** The winnowing guarantee (Schleimer et al. §3): with k=8-char grams
  * and window w=4, two documents sharing any substring of length
  * ≥ k+w-1 = 11 MUST share at least one fingerprint. This is the
  * property that makes d14 a sound near-dup candidate generator —
  * no shared fingerprint ⇒ no ≥11-char match, so the candidate join
  * misses nothing above the threshold.
  */
class WinnowSpec extends SparkSpec {
  import spark.implicits._

  private def check(p: Prop, n: Int): Unit = {
    val r = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(n), p)
    assert(r.passed, r.status.toString)
  }

  private val word = Gen.listOfN(30, Gen.alphaLowerChar).map(_.mkString)
  private val shared = Gen.listOfN(11, Gen.alphaLowerChar).map(_.mkString)

  private def fps(a: String, b: String): Map[Long, Set[String]] =
    TextQueries.winnowFingerprints(
        Seq((1L, a), (2L, b)).toDF("doc_id", "text"))
      .collect()
      .groupBy(_.getLong(0))
      .view.mapValues(_.map(_.getString(1)).toSet).toMap

  test("docs sharing an 11-char substring share a fingerprint") {
    check(Prop.forAll(word, word, word, word, shared) { (a, b, c, d, s) =>
      val m = fps(a + s + b, c + s + d)
      m(1L).intersect(m(2L)).nonEmpty
    }, n = 12)
  }

  test("identical docs fingerprint identically; winnowing compresses") {
    check(Prop.forAll(word) { a =>
      val text = a + a
      val m = fps(text, text)
      val nWindows = (text.length - 7) - 3
      m(1L) === m(2L) && m(1L).size <= nWindows
    }, n = 8)
  }
}
