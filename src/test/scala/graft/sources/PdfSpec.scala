package graft.sources

import java.nio.charset.StandardCharsets

import graft.SparkSpec
import graft.sources.DocExtract._

/** The zero-egress PDF parser/extractor and its writer complement:
  * object-syntax round trips (escapes, hex strings, refs), Flate +
  * predictor decode bounds, ObjStm expansion, page-tree walk, content
  * text-operator replay, /Info /Title, and the shared extraction laws
  * (chunking, empty docs, Source-node flow). */
class PdfSpec extends SparkSpec {
  import spark.implicits._

  private def extractOf(bytes: Array[Byte]): (String, Option[String], Int) =
    Pdf.extractText(bytes)

  test("single-paragraph round trip, compressed and uncompressed") {
    val text = "the quick (brown) fox \\ jumps; über-naïve café"
    Seq(true, false).foreach { compress =>
      val (out, title, pages) =
        extractOf(Pdf.pdfBytes(Seq(Seq(text)), None, compress = compress))
      assert(out === text, s"compress=$compress")
      assert(title === None)
      assert(pages === 1)
    }
  }

  test("multi-line, multi-paragraph, multi-page round trip") {
    val pages = Seq(
      Seq("line one\nline two", "second paragraph"),
      Seq("page two starts here"))
    val (out, _, n) = extractOf(Pdf.pdfBytes(pages))
    assert(n === 2)
    // lines keep \n, paragraphs and pages separated by blank lines
    assert(out ===
      "line one\nline two\n\nsecond paragraph\n\npage two starts here")
  }

  test("/Info /Title is extracted and preferred by the extractor") {
    val bytes = Pdf.pdfBytes(Seq(Seq("body text")), Some("Die Anlage (2024)"))
    val (_, title, _) = extractOf(bytes)
    assert(title === Some("Die Anlage (2024)"))
    val ex = new PdfExtractor().extract(RawDoc(1, "pdf", "a.pdf", bytes))
    assert(ex.title === "Die Anlage (2024)")
    assert(ex.text === "body text")
  }

  test("PDF string escapes: octal, specials, line continuation") {
    val p = new Pdf.Parser("(a\\040b\\(c\\)\\\\d\\\ne)".getBytes(StandardCharsets.ISO_8859_1))
    val Pdf.PStr(b) = p.next()
    assert(new String(b, StandardCharsets.ISO_8859_1) === "a b(c)\\de")
  }

  test("hex strings: whitespace ignored, odd digit padded") {
    val p = new Pdf.Parser("<48 65 6C6C 6F2>".getBytes(StandardCharsets.ISO_8859_1))
    val Pdf.PStr(b) = p.next()
    assert(b.toSeq === "Hello ".getBytes(StandardCharsets.ISO_8859_1).toSeq)
  }

  test("TJ kerning: large negative adjustment reads as a space") {
    val content = "BT [ (Hel) -20 (lo) -250 (world) ] TJ ET"
      .getBytes(StandardCharsets.ISO_8859_1)
    assert(Pdf.contentText(content).trim === "Hello world")
  }

  test("quote operators start a new line before showing") {
    val content = "BT (first) Tj (second) ' ET".getBytes(StandardCharsets.ISO_8859_1)
    assert(Pdf.contentText(content).trim === "first\nsecond")
  }

  test("object streams (/Type /ObjStm) are expanded") {
    // page objects live inside a compressed object stream; only the
    // catalog, the ObjStm carrier, and the content stream are direct
    val pageDict = "<< /Type /Page /Parent 2 0 R /Contents 5 0 R >>"
    val pagesDict = "<< /Type /Pages /Kids [ 4 0 R ] /Count 1 >>"
    val payload = s"2 0 4 ${pagesDict.length + 1} "
    val first = payload.length
    val stmData = (payload + pagesDict + " " + pageDict)
      .getBytes(StandardCharsets.ISO_8859_1)
    val z = Pdf.deflate(stmData)
    val content = "BT (from objstm) Tj ET".getBytes(StandardCharsets.ISO_8859_1)
    val bos = new java.io.ByteArrayOutputStream()
    def w(s: String): Unit = bos.write(s.getBytes(StandardCharsets.ISO_8859_1))
    w("%PDF-1.5\n")
    w("1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n")
    w(s"3 0 obj\n<< /Type /ObjStm /N 2 /First $first /Filter /FlateDecode /Length ${z.length} >>\nstream\n")
    bos.write(z)
    w("\nendstream\nendobj\n")
    w(s"5 0 obj\n<< /Length ${content.length} >>\nstream\n")
    bos.write(content)
    w("\nendstream\nendobj\n")
    w("trailer\n<< /Root 1 0 R >>\n%%EOF\n")
    val (text, _, pages) = extractOf(bos.toByteArray)
    assert(pages === 1)
    assert(text === "from objstm")
  }

  test("decompression bomb is refused, not inflated") {
    // a small deflate stream that expands to ~300 MB of zeros
    val big = {
      val d = new java.util.zip.Deflater(9)
      val chunk = new Array[Byte](1 << 20)
      val out = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](1 << 16)
      (0 until 300).foreach { i =>
        d.setInput(chunk)
        while (!d.needsInput()) out.write(buf, 0, d.deflate(buf))
      }
      d.finish()
      while (!d.finished()) out.write(buf, 0, d.deflate(buf))
      out.toByteArray
    }
    val e = intercept[IllegalArgumentException](Pdf.inflate(big))
    assert(e.getMessage.contains("refusing"))
  }

  test("empty documents: 0 chunks, no DERIVED_FROM edges") {
    val bytes = Pdf.pdfBytes(Seq(Seq.empty[String]))
    val ex = new PdfExtractor().extract(RawDoc(7, "pdf", "empty.pdf", bytes))
    assert(ex.text === "")
    assert(ex.n_chunks === 0)
    val edges = toDerivedFromEdges(Seq(ex).toDS()).collect()
    assert(edges.isEmpty)
  }

  test("chunking law: one long paragraph yields ceil(len/500) chunks") {
    val text = "x" * 1234
    val ex = new PdfExtractor().extract(
      RawDoc(9, "pdf", "long.pdf", Pdf.pdfBytes(text)))
    assert(ex.text === text)
    assert(ex.n_chunks === 3)
    assert(ex.provenance === "pdf:1pg:1p")
  }

  test("extraction runs distributed with per-partition extractor init") {
    val docs = (1L to 20L).map(i =>
      RawDoc(i, "pdf", s"d$i.pdf", Pdf.pdfBytes(s"doc number $i")))
    val out = extractAll(docs.toDS().repartition(4),
      () => new PdfExtractor()).collect().sortBy(_.doc_id)
    assert(out.map(_.text).toSeq === (1L to 20L).map(i => s"doc number $i"))
    val nodes = toSourceNodes(out.toSeq.toDS()).collect()
    assert(nodes.length === 20) // 'pdf' is a legal Source.type
  }

  test("non-Latin-1 text fails the writer loudly") {
    val e = intercept[IllegalArgumentException](Pdf.pdfBytes("日本語"))
    assert(e.getMessage.contains("Latin-1"))
  }
}
