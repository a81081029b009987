package graft.queries

import graft.SparkSpec
import graft.functions.Multimodal
import graft.functions.Multimodal.MediaRecord

/** m08 semantic pins the hash gate can't express: the fuzzy hash is
  * deterministic, identical blobs collide exactly, small edits move few
  * bits, and the query's pair output is canonical. */
class PhashSpec extends SparkSpec {

  private def rec(id: Long, s: String) =
    MediaRecord(id, "txt", s.getBytes("UTF-8"))

  private val base =
    "the quick brown fox jumps over the lazy dog while the cat naps " * 8

  private def hamming(a: Multimodal.MediaPhash, b: Multimodal.MediaPhash): Int =
    java.lang.Long.bitCount(a.lo ^ b.lo) + java.lang.Long.bitCount(a.hi ^ b.hi)

  test("identical blobs hash identically; the hash is pure") {
    val h1 = Multimodal.phashOf(rec(1, base))
    val h2 = Multimodal.phashOf(rec(2, base))
    assert(h1.lo == h2.lo && h1.hi == h2.hi)
    assert(Multimodal.phashOf(rec(1, base)) == h1)
  }

  test("halves stay in unsigned-32-bit range (oracle BIGINT safety)") {
    val h = Multimodal.phashOf(rec(1, base))
    assert(h.lo >= 0 && h.lo <= 0xffffffffL)
    assert(h.hi >= 0 && h.hi <= 0xffffffffL)
  }

  test("a small edit moves few bits; unrelated content moves many") {
    val h = Multimodal.phashOf(rec(1, base))
    val edited = Multimodal.phashOf(rec(2, base.replaceFirst("quick", "quicker")))
    val other = Multimodal.phashOf(rec(3,
      "0123456789!@#$%^&*()ABCDEFGHIJKLMNOPQRSTUVWXYZ" * 12))
    assert(hamming(h, edited) <= 6, s"edit moved ${hamming(h, edited)} bits")
    assert(hamming(h, other) > 6, s"unrelated only ${hamming(h, other)} bits apart")
  }

  test("corpus stays ASCII — the byte≡codepoint precondition of the m oracles") {
    // DuckDB's ascii/substr/length are codepoint-based; the Spark stub
    // kernels read utf-8 bytes. They agree only while every document is
    // pure ASCII — if the fixture ever gains multibyte text, this must
    // fail before the hash gate does, with a readable reason.
    for (sf <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val nonAscii = graft.core.Tables.documents(spark, sf)
        .filter(org.apache.spark.sql.functions.length(
          org.apache.spark.sql.functions.col("text")) !==
          org.apache.spark.sql.functions.octet_length(
            org.apache.spark.sql.functions.col("text")))
        .count()
      assert(nonAscii == 0, s"$sf has $nonAscii non-ASCII documents")
    }
  }

  test("query output is canonical pairs within the verify threshold") {
    val rows = MultimodalQueries
      .m08PhashNeardup(spark, "/root/testdata/sf0.001").collect()
    rows.foreach { r =>
      assert(r.getLong(0) < r.getLong(1))
      assert(r.getInt(2) >= 0 && r.getInt(2) <= 6)
    }
  }
}
