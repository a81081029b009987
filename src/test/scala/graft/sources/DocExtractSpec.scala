package graft.sources

import java.nio.charset.StandardCharsets
import java.util.zip.{ZipEntry, ZipOutputStream}

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.DocExtract._

/** The document-extraction source: real plain-text/markdown extraction
  * on actual file bytes, the stub seam for PDF/DOCX/LLM codecs,
  * per-partition extractor init, Source-node projection with enum
  * validation, the engine-wide uid scheme, and per-chunk DERIVED_FROM
  * provenance edges. */
class DocExtractSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    RawDoc(1, "pdf", "Schema_Doku.pdf", ("x" * 1200).getBytes("UTF-8")),
    RawDoc(2, "docx", "Notizen.docx", "kurzer text".getBytes("UTF-8")),
    RawDoc(3, "floppy", "Altbestand", "legacy".getBytes("UTF-8")))

  test("stub extraction is deterministic and chunk-counted") {
    def run() = extractAll(docs.toDS(), () => new StubExtractor())
      .collect().sortBy(_.doc_id)
    val out = run()
    assert(out.map(_.n_chunks).toSeq === Seq(3, 1, 1))
    assert(out(1).text === "kurzer text")
    assert(out(0).provenance === "stub:pdf")
    // re-run → identical (idempotent-ingest contract)
    assert(out.toSeq === run().toSeq)
  }

  test("source nodes: enum-validated, deterministic uids") {
    val nodes = toSourceNodes(extractAll(docs.toDS())).collect()
    // 'floppy' is not a legal Source.type (schema.cql:96-97) → rejected
    assert(nodes.map(_.getAs[String]("name")).toSet ===
      Set("Schema_Doku.pdf", "Notizen.docx"))
    val uid = nodes.find(_.getAs[String]("name") == "Schema_Doku.pdf").get
      .getAs[String]("uid")
    // sha256("Schema_Doku.pdf")[:16], the engine-wide uid contract
    val expected = java.security.MessageDigest.getInstance("SHA-256")
      .digest("Schema_Doku.pdf".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(16)
    assert(uid === expected)
  }

  private def fileDoc(id: Long, tpe: String, res: String): RawDoc = {
    val p = java.nio.file.Paths.get(fixture(s"docs/$res"))
    RawDoc(id, tpe, res, java.nio.file.Files.readAllBytes(p))
  }

  test("markdown extraction on real file bytes: markup stripped, heading title, non-stub provenance") {
    val ds = Seq(fileDoc(10, "md", "leitfaden.md")).toDS()
    val out = extractAll(ds, () => new MarkdownExtractor()).collect().head
    assert(out.title === "Entsorgungsleitfaden Campus")
    assert(out.provenance.startsWith("md:") && !out.provenance.contains("stub"))
    // prose survives; markup and fenced code do not
    assert(out.text.contains("korrekte Trennung"))
    assert(out.text.contains("städtische Satzung")) // link → anchor text
    assert(out.text.contains("Piktogramm"))         // image → alt text
    assert(out.text.contains("Hygieneartikel"))     // bullet text kept
    for (tok <- Seq("#", "**", "](", "```", "Codebeispiele", "---"))
      assert(!out.text.contains(tok), s"markup '$tok' leaked into extracted text")
    assert(out.n_chunks >= 1)
  }

  test("plain-text extraction on real file bytes: BOM/CRLF normalized, paragraphs counted") {
    val ds = Seq(fileDoc(11, "txt", "notes.txt")).toDS()
    val out = extractAll(ds, () => new PlainTextExtractor()).collect().head
    assert(out.title === "Lagerhinweise Chemikalien")
    assert(!out.text.contains("﻿") && !out.text.contains("\r"))
    assert(out.provenance === "text:3p")
    assert(out.text.endsWith("Raum sperren.")) // trailing newline trimmed
  }

  test("extraction -> Source nodes -> DERIVED_FROM edges on real content") {
    val ds = Seq(fileDoc(10, "md", "leitfaden.md"),
                 fileDoc(11, "txt", "notes.txt")).toDS()
    val ex = extractAll(ds, () => new MarkdownExtractor(chunkChars = 200))
    val nodes = toSourceNodes(ex)
    val edges = toDerivedFromEdges(ex)
    assert(nodes.count() === 2)
    assert(nodes.filter(col("provenance").contains("stub")).count() === 0)
    // every edge's dst resolves to a Source node; one edge per chunk
    val joined = edges.join(nodes, edges("src_uid") === nodes("uid"))
    assert(joined.count() === edges.count())
    val nChunks = ex.collect().map(_.n_chunks.toLong).sum
    assert(edges.count() === nChunks && nChunks >= 3) // 200-char budget → real chunking
    assert(edges.select("chunk_uid").distinct().count() === edges.count())
  }

  test("empty and whitespace-only docs yield 0 chunks and 0 DERIVED_FROM edges") {
    val ds = Seq(
      RawDoc(20, "txt", "empty.txt", Array.emptyByteArray),
      RawDoc(21, "txt", "blank.txt", "  \n\n\t \r\n".getBytes("UTF-8")),
      RawDoc(22, "txt", "real.txt", "inhalt".getBytes("UTF-8"))).toDS()
    val ex = extractAll(ds, () => new PlainTextExtractor())
    val byId = ex.collect().map(e => e.doc_id -> e.n_chunks).toMap
    // the oracle's law is ceil(len/500): empty → 0, matching exactly
    assert(byId === Map(20L -> 0, 21L -> 0, 22L -> 1))
    val edges = toDerivedFromEdges(ex)
    assert(edges.count() === 1)
    assert(edges.select("name").as[String].collect().toSeq === Seq("real.txt"))
  }

  test("docx round trip: writer paragraphs -> extractor; heading style becomes the title") {
    val bytes = docxBytes(Seq(
      (Some("Heading1"), "Entsorgungsleitfaden Labor"),
      (None, "Chemikalien nur in Originalbehältern lagern."),
      (Some("Heading2"), "Säuren & Laugen"), // & pins XML escaping
      (None, "x" * 1200)))
    val out = extractAll(Seq(RawDoc(30, "docx", "leitfaden.docx", bytes)).toDS(),
      () => new DocxExtractor()).collect().head
    assert(out.title === "Entsorgungsleitfaden Labor")
    assert(out.provenance === "docx:4p")
    assert(out.text.contains("Säuren & Laugen"))
    assert(out.text.contains("Originalbehältern"))
    // 4 paragraphs, one over-long: greedy packing at the 500 budget
    assert(out.n_chunks === packChunks(paragraphs(out.text), 500).size)
    // re-run → identical bytes in, identical extraction out
    assert(out === extractAll(Seq(RawDoc(30, "docx", "leitfaden.docx", bytes)).toDS(),
      () => new DocxExtractor()).collect().head)
  }

  test("docx parsing: multi-run text, literal tabs/breaks in runs, tab STOPS ignored, empty paragraphs dropped") {
    val documentXml =
      """<?xml version="1.0" encoding="UTF-8"?>
        |<w:document xmlns:w="http://schemas.openxmlformats.org/wordprocessingml/2006/main">
        | <w:body>
        |  <w:p>
        |   <w:pPr><w:tabs><w:tab w:val="left" w:pos="720"/></w:tabs></w:pPr>
        |   <w:r><w:t>Sperr</w:t></w:r><w:r><w:t>müll</w:t></w:r>
        |   <w:r><w:tab/><w:t>max 2m³</w:t></w:r>
        |  </w:p>
        |  <w:p/>
        |  <w:p><w:r><w:t>Zeile eins</w:t><w:br/><w:t>Zeile zwei</w:t></w:r></w:p>
        | </w:body>
        |</w:document>""".stripMargin
    val bos = new java.io.ByteArrayOutputStream()
    val z = new ZipOutputStream(bos)
    z.putNextEntry(new ZipEntry("word/document.xml"))
    z.write(documentXml.getBytes(StandardCharsets.UTF_8))
    z.closeEntry(); z.close()
    val (paras, heading) = DocExtract.docxParagraphs(bos.toByteArray)
    // runs concatenate; the run tab is literal, the pPr tab stop is not
    assert(paras === Seq("Sperrmüll\tmax 2m³", "Zeile eins\nZeile zwei"))
    assert(heading === None)
  }

  test("docx: non-docx zip fails with a clear error") {
    val bos = new java.io.ByteArrayOutputStream()
    val z = new ZipOutputStream(bos)
    z.putNextEntry(new ZipEntry("unrelated.txt")); z.write(1); z.closeEntry(); z.close()
    val e = intercept[RuntimeException](DocExtract.docxParagraphs(bos.toByteArray))
    assert(e.getMessage.contains("not a .docx"))
  }

  test("docx: empty body yields 0 chunks (same law as the text extractors)") {
    val out = extractAll(
      Seq(RawDoc(31, "docx", "leer.docx", docxBytes(Seq.empty))).toDS(),
      () => new DocxExtractor()).collect().head
    assert(out.n_chunks === 0 && out.text === "" && out.provenance === "docx:0p")
  }

  test("packChunks: over-long paragraph slices to ceil(len/budget); short paragraphs pack") {
    val one = packChunks(Seq("x" * 1234), 500)
    assert(one.size === 3 && one.map(_.length).sum === 1234)
    val packed = packChunks(Seq("a" * 100, "b" * 100, "c" * 400), 500)
    assert(packed.size === 2) // 100+2+100 packs; 400 starts a new chunk
    assert(packed.head === "a" * 100 + "\n\n" + "b" * 100)
  }

  test("luhn extractor: frequency-heavy sentences win, order preserved, short docs kept whole") {
    def luhn(text: String): DocExtract.Extracted =
      new LuhnExtractor().extract(RawDoc(1, "llm", "d", text.getBytes("UTF-8")))
    // 'green apples' words repeat across 3 sentences; the filler
    // sentence has unique long words only -> lowest score, dropped
    val text = "Green apples grow well. Green apples taste good. " +
      "Completely unrelated filler rambling sentence here honestly. " +
      "Many green apples everywhere today."
    val out = luhn(text)
    assert(out.n_chunks === 3 && out.provenance === "luhn:k=3:4s")
    assert(!out.text.contains("filler"), s"lowest-scoring sentence must drop: ${out.text}")
    assert(out.text.indexOf("grow") < out.text.indexOf("taste") &&
      out.text.indexOf("taste") < out.text.indexOf("everywhere"),
      "extract must preserve original sentence order")
    val short = luhn("One tiny doc. Just two sentences!")
    assert(short.n_chunks === 2 && short.text === "one tiny doc just two sentences")
  }

  test("extractor is constructed once per partition, not per row") {
    val counter = spark.sparkContext.longAccumulator("extractor-inits")
    val many = (1L to 100L).map(i => RawDoc(i, "pdf", s"doc$i", Array[Byte]('a')))
    val ds = many.toDS().repartition(4)
    extractAll(ds, () => { counter.add(1); new StubExtractor() }).collect()
    assert(counter.value === 4, s"expected 4 extractor inits, got ${counter.value}")
  }
}
