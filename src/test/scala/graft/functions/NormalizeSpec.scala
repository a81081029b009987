package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Unit pins for the Unicode kernels beyond what the d30 gate sees:
  * null flow, the fast paths, and the singleton-decomposition subtlety
  * strip_accents must not shortcut. All non-ASCII is spelled in \\u
  * escapes — composed vs decomposed forms are indistinguishable to a
  * reader otherwise. */
class NormalizeSpec extends SparkSpec {

  import spark.implicits._

  private val composedE = "\u00e9"     // é, one codepoint
  private val decomposedE = "e\u0301"  // e + combining acute

  private def nfc(s: String): String =
    Seq(s).toDF("t").select(call_function("nfc_normalize", col("t")))
      .collect().head.getString(0)

  private def strip(s: String): String =
    Seq(s).toDF("t").select(call_function("strip_accents", col("t")))
      .collect().head.getString(0)

  test("NFC composes decomposed sequences and is idempotent") {
    assert(nfc("Caf" + decomposedE) == "Caf" + composedE)
    assert(nfc("Caf" + composedE) == "Caf" + composedE)
    assert(nfc("") == "")
    assert(nfc("\u212b") == "\u00c5")
  }

  test("strip_accents drops combining marks from either input form") {
    assert(strip("Caf" + composedE) == "Cafe")
    assert(strip("Caf" + decomposedE) == "Cafe")
    assert(strip("\u00fc\u00f1\u00e0") == "una")
    assert(strip("ascii only") == "ascii only")
  }

  test("singleton decomposition is not shortcut as 'no marks present'") {
    // U+212B ANGSTROM SIGN canonically decomposes to A + U+030A (ring):
    // strip_accents must yield plain 'A', never return the sign
    // unchanged just because the INPUT carries no combining mark.
    assert(strip("\u212b") == "A")
    // NFC maps the angstrom sign to the composed letter Å (U+00C5)
    assert(nfc("\u212b") == "\u00c5")
  }

  test("nulls pass through both expressions") {
    val out = Seq[(String, Option[String])](("x", None)).toDF("k", "t")
      .select(call_function("nfc_normalize", col("t")).as("a"),
        call_function("strip_accents", col("t")).as("b"))
      .collect().head
    assert(out.isNullAt(0) && out.isNullAt(1))
  }

  test("SQL registration: both callable from spark.sql") {
    val r = spark.sql(
      s"SELECT nfc_normalize('$decomposedE') AS a, " +
        s"strip_accents('$composedE') AS b")
      .collect().head
    assert(r.getString(0) == composedE && r.getString(1) == "e")
  }
}
