package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Magic-byte sniffing and the mixed-drop routing contract: extensions
  * are ignored, PDFs are skipped (not silently cast), CSV is the text
  * fallback.
  */
class AutoSourceSpec extends SparkSpec {
  import spark.implicits._

  private def rmTree(p: java.nio.file.Path): Unit = {
    import scala.jdk.CollectionConverters._
    Files.walk(p).iterator().asScala.toSeq.reverse.foreach(Files.deleteIfExists(_))
  }

  test("sniff: magic bytes, not extensions") {
    assert(AutoSource.sniff(Array('P', 'K', 3, 4).map(_.toByte)) === "xlsx")
    assert(AutoSource.sniff(Array('O', 'b', 'j', 1).map(_.toByte)) === "avro")
    assert(AutoSource.sniff("%PDF-1.7".getBytes.take(4)) === "pdf")
    assert(AutoSource.sniff("a,b,c\n1,".getBytes.take(16)) === "csv")
    assert(AutoSource.sniff("<!DOCTYPE html>".getBytes.take(16)) === "html")
    assert(AutoSource.sniff("<html lang=\"de\">".getBytes.take(16)) === "html")
    assert(AutoSource.sniff("<HEAD><title>".getBytes.take(16)) === "html")
    // a CSV whose first cell is an XML fragment must STAY tabular —
    // the old 2-byte '<h'/'<!' test mis-routed these
    assert(AutoSource.sniff("<h2>t</h2>,count".getBytes.take(16)) === "csv")
    assert(AutoSource.sniff("<!-- note -->,x".getBytes.take(16)) === "csv")
    // XML-ish but not a page opener: stays on the text/CSV path
    assert(AutoSource.sniff("<xml>".getBytes.take(4)) === "csv")
    assert(AutoSource.sniff(Array[Byte]()) === "csv") // empty → text fallback
    // real pages that open with chrome the 9-byte sniff used to miss:
    // a banner comment before the doctype, <body>, an XHTML prolog
    assert(AutoSource.sniff(
      "<!-- generated 2026 -->\n<!DOCTYPE html><html>".getBytes) === "html")
    assert(AutoSource.sniff(
      "<!--a--> <!--b--><html lang=\"de\">".getBytes) === "html")
    assert(AutoSource.sniff("<body><p>x</p>".getBytes) === "html")
    assert(AutoSource.sniff(
      "<?xml version=\"1.0\"?><html xmlns=\"...\">".getBytes) === "html")
    // a comment still open at the sniff window's end is NOT a page
    assert(AutoSource.sniff(
      ("<!-- " + "x" * 300).getBytes) === "csv")
  }

  test("mixed drop: inventory tags by magic; readTabular routes and skips PDFs") {
    val tmp = Files.createTempDirectory("auto-drop")
    try {
      val df = Seq((1L, "x"), (2L, "y")).toDF("k", "v")
      AvroSource.write(df.repartition(1), tmp.toString)
      // an xlsx DISGUISED as .csv — sniffing must still route it
      Files.write(tmp.resolve("liar.csv"),
        XlsxSource.writeBytes(Seq(Seq("k", "v"), Seq("3", "z"))))
      Files.write(tmp.resolve("table.txt"), "k,v\n4,w\n".getBytes("UTF-8"))
      Files.write(tmp.resolve("doc.bin"), "%PDF-1.4 fake".getBytes("UTF-8"))
      Files.write(tmp.resolve("page.dat"),
        Html.pageBytes("Seite", "kein tabelleninhalt"))
      val inv = AutoSource.inventory(spark, tmp.toString)
        .select("format").as[String].collect().sorted.toSeq
      assert(inv === Seq("avro", "csv", "html", "pdf", "xlsx"))
      val rows = AutoSource.readTabular(spark, tmp.toString)
        .select(col("k").cast("long"), col("v"), col("_format"))
        .as[(Long, String, String)].collect().sortBy(_._1).toSeq
      assert(rows === Seq((1L, "x", "avro"), (2L, "y", "avro"),
        (3L, "z", "xlsx"), (4L, "w", "csv")))
    } finally rmTree(tmp)
  }
}
