package graft.sources

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Document-extraction source — the reference's planned PDF/DOCX→LLM
  * ingestion path (`etl_implementation.md:262-273`, `README.md:122-127`)
  * as Spark plumbing: opaque binary documents in, extracted text +
  * provenance out, flowing into the graph as `Source` nodes
  * (`schema.cql:96-98`) with per-chunk `DERIVED_FROM` edges (§1.1).
  *
  * REAL zero-egress extractors run on actual bytes:
  * [[PlainTextExtractor]] (UTF-8 decode, BOM strip, newline
  * normalization, paragraph-packed chunking), [[MarkdownExtractor]]
  * (the same plus markup stripping and heading-derived titles),
  * [[DocxExtractor]] (OOXML `word/document.xml` paragraph runs via the
  * bounded ZIP + StAX machinery shared with [[XlsxSource]]),
  * [[PdfExtractor]] ([[Pdf]]'s object-graph scan + content-stream
  * replay), [[HtmlExtractor]] ([[Html]]'s tag tokenizer with
  * boilerplate removal), and [[LuhnExtractor]] (extractive
  * summarization behind the `llm` slot). [[StubExtractor]] marks the
  * seam where a real model client would sit.
  *
  * The Spark side is identical for every extractor: partition-batched
  * `mapPartitions` with one extractor instance per partition
  * (model/parser init amortized over a batch — the same contract a
  * Pandas-UDF/Arrow path gives Python), no shuffle, binary payload
  * dropped before any wide op.
  */
object DocExtract {

  /** One raw input document. `source_type` follows the reference's
    * Source.type enum: pdf | csv | docx | llm (`schema.cql:96-97`),
    * extended with txt | md | html for the zero-egress extractors. */
  case class RawDoc(doc_id: Long, source_type: String, name: String,
                    content: Array[Byte])

  case class Extracted(doc_id: Long, source_type: String, name: String,
                       text: String, title: String, n_chunks: Int,
                       provenance: String)

  /** Allowed Source.type values: the reference enum (`schema.cql:96-97`)
    * plus the engine's plain-text/markdown extensions. */
  val SourceTypes: Set[String] = Set("pdf", "csv", "docx", "llm", "txt", "md", "html")

  trait Extractor extends Serializable {
    def extract(doc: RawDoc): Extracted
  }

  /** BOM strip + CRLF/CR → LF + outer trim: the decode-side
    * normalization every text extractor applies first. */
  def normalize(raw: String): String =
    raw.stripPrefix("\uFEFF").replace("\r\n", "\n").replace("\r", "\n").trim

  /** Blank-line-separated paragraphs, trimmed, empties dropped. */
  def paragraphs(text: String): Seq[String] =
    text.split("\n{2,}").iterator.map(_.trim).filter(_.nonEmpty).toSeq

  /** Greedy paragraph packing into chunks of at most `chunkChars`:
    * paragraphs longer than the budget are sliced into grain-sized
    * pieces first, then grains pack left-to-right ("\n\n"-joined) —
    * the standard retrieval-chunking shape, deterministic by
    * construction. A single over-long paragraph therefore yields
    * exactly ceil(len/chunkChars) chunks. */
  def packChunks(paras: Seq[String], chunkChars: Int): Seq[String] = {
    val grains = paras.flatMap(_.grouped(chunkChars))
    val out = Seq.newBuilder[String]
    var cur = new StringBuilder
    grains.foreach { g =>
      if (cur.isEmpty) cur.append(g)
      else if (cur.length + 2 + g.length <= chunkChars) cur.append("\n\n").append(g)
      else { out += cur.toString; cur = new StringBuilder(g) }
    }
    if (cur.nonEmpty) out += cur.toString
    out.result()
  }

  /** First non-empty line, markup-stripped, capped at 120 chars. */
  def titleOf(text: String): String =
    text.linesIterator.map(_.trim).find(_.nonEmpty).getOrElse("").take(120)

  /** Real plain-text extraction: decode, normalize, paragraph-packed
    * chunking, first-line title. Provenance records the extractor and
    * the paragraph count it saw — never "stub". An empty or
    * whitespace-only document yields 0 chunks (and so 0 DERIVED_FROM
    * edges), matching the oracle's ceil(len/500) law exactly. */
  class PlainTextExtractor(chunkChars: Int = 500) extends Extractor {
    def extract(d: RawDoc): Extracted = {
      val text = normalize(new String(d.content, StandardCharsets.UTF_8))
      val paras = paragraphs(text)
      val chunks = packChunks(paras, chunkChars)
      Extracted(d.doc_id, d.source_type, d.name, text, titleOf(text),
        chunks.size, s"text:${paras.size}p")
    }
  }

  /** Markdown markup stripped to prose, line-wise then inline:
    * code fences and horizontal rules dropped, heading/blockquote/list
    * markers removed, images and links collapsed to their alt/anchor
    * text, bold/italic/inline-code markers removed. Title prefers the
    * first ATX heading over the first line. */
  class MarkdownExtractor(chunkChars: Int = 500) extends Extractor {
    def extract(d: RawDoc): Extracted = {
      val raw = normalize(new String(d.content, StandardCharsets.UTF_8))
      val heading = raw.linesIterator
        .find(_.matches("^#{1,6}\\s+.*"))
        .map(_.replaceFirst("^#{1,6}\\s+", "").trim)
      val text = stripMarkdown(raw)
      val paras = paragraphs(text)
      val chunks = packChunks(paras, chunkChars)
      Extracted(d.doc_id, d.source_type, d.name, text,
        heading.getOrElse(titleOf(text)).take(120),
        chunks.size, s"md:${paras.size}p")
    }
  }

  def stripMarkdown(md: String): String = {
    var inFence = false
    val lines = md.linesIterator.filter { l =>
      val t = l.trim
      if (t.startsWith("```")) { inFence = !inFence; false }
      else !inFence && !t.matches("^([-*_])\\1{2,}$") // drop fenced code + hrs
    }.map { l =>
      l.replaceFirst("^#{1,6}\\s+", "")   // ATX headings
        .replaceFirst("^>\\s?", "")       // blockquote
        .replaceFirst("^\\s*[-*+]\\s+", "") // list bullets
        .replaceFirst("^\\s*\\d+\\.\\s+", "") // ordered lists
    }
    lines.mkString("\n")
      .replaceAll("!\\[([^\\]]*)\\]\\([^)]*\\)", "$1") // images → alt
      .replaceAll("\\[([^\\]]*)\\]\\([^)]*\\)", "$1")  // links → anchor
      .replaceAll("\\*\\*([^*]+)\\*\\*", "$1")          // bold
      .replaceAll("\\*([^*]+)\\*", "$1")                // italic
      .replaceAll("__([^_]+)__", "$1")
      .replaceAll("`([^`]+)`", "$1")                    // inline code
      .trim
  }

  /** Real DOCX extraction — the reference's planned Word-document
    * ingestion (`etl_implementation.md:262-273`, `README.md:122-127`)
    * with no added dependency: a .docx is a ZIP of XML (the same OOXML
    * family [[XlsxSource]] reads), so [[Ooxml]]'s bounded unzip + StAX
    * parse `word/document.xml` directly.
    *
    * Paragraph model: each `w:p` is one paragraph; `w:t` runs
    * concatenate (multi-run text — Word splits runs on any formatting
    * boundary); `w:tab` → tab, `w:br`/`w:cr` → newline. Heading-styled
    * paragraphs (`w:pStyle w:val="Heading*"|"Title"`) stay in the text
    * AND the first one becomes the document title — the same
    * heading-derived-title contract as [[MarkdownExtractor]]. Table
    * cell paragraphs (`w:p` inside `w:tbl`) are captured in document
    * order. Chunking and empty-doc laws are identical to the other
    * extractors (0 chunks for an empty body).
    */
  class DocxExtractor(chunkChars: Int = 500) extends Extractor {
    def extract(d: RawDoc): Extracted = {
      val (paras, heading) = docxParagraphs(d.content)
      val text = normalize(paras.mkString("\n\n"))
      val packed = packChunks(paragraphs(text), chunkChars)
      Extracted(d.doc_id, d.source_type, d.name, text,
        heading.getOrElse(titleOf(text)).take(120),
        packed.size, s"docx:${paras.size}p")
    }
  }

  /** word/document.xml → (non-empty paragraphs in document order,
    * first heading text). Exposed for the spec. */
  private[sources] def docxParagraphs(bytes: Array[Byte]): (Seq[String], Option[String]) = {
    val parts = Ooxml.zipEntries(bytes)
    val doc = parts.getOrElse("word/document.xml",
      sys.error("word/document.xml missing: not a .docx package"))
    val r = Ooxml.stax(doc)
    val paras = Seq.newBuilder[String]
    var heading: Option[String] = None
    var cur: StringBuilder = null
    var curIsHeading = false
    var inT = false
    var inR = false // literal tab/br live in runs; w:pPr/w:tabs declares tab STOPS
    while (r.hasNext) {
      r.next() match {
        case javax.xml.stream.XMLStreamConstants.START_ELEMENT =>
          r.getLocalName match {
            case "p" => cur = new StringBuilder; curIsHeading = false
            case "r" => inR = true
            case "pStyle" if cur != null =>
              val style = Option(r.getAttributeValue(null, "val"))
                .orElse {
                  // w:val is namespaced; fall back to local-name match
                  (0 until r.getAttributeCount)
                    .find(i => r.getAttributeLocalName(i) == "val")
                    .map(r.getAttributeValue)
                }
              if (style.exists(s => s.startsWith("Heading") || s == "Title"))
                curIsHeading = true
            case "t" if cur != null && inR => inT = true
            case "tab" if cur != null && inR => cur.append('\t')
            case "br" | "cr" if cur != null && inR => cur.append('\n')
            case _ =>
          }
        case javax.xml.stream.XMLStreamConstants.CHARACTERS if inT =>
          cur.append(r.getText)
        case javax.xml.stream.XMLStreamConstants.END_ELEMENT =>
          r.getLocalName match {
            case "t" => inT = false
            case "r" => inR = false
            case "p" =>
              val text = cur.toString.trim
              if (text.nonEmpty) {
                paras += text
                if (curIsHeading && heading.isEmpty) heading = Some(text)
              }
              cur = null
            case _ =>
          }
        case _ =>
      }
    }
    r.close()
    (paras.result(), heading)
  }

  /** Minimal valid single-part .docx writer: the round-trip complement
    * of [[DocxExtractor]] (and the q83 gate's input builder), mirroring
    * [[XlsxSource.writeBytes]]. Each (style, text) pair becomes one
    * `w:p`; a `Some("Heading1")`-style paragraph gets a `w:pStyle`. */
  def docxBytes(paras: Seq[(Option[String], String)]): Array[Byte] = {
    val body = new StringBuilder
    body.append("""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""")
      .append("""<w:document xmlns:w="http://schemas.openxmlformats.org/wordprocessingml/2006/main"><w:body>""")
    paras.foreach { case (style, text) =>
      body.append("<w:p>")
      style.foreach(s =>
        body.append(s"""<w:pPr><w:pStyle w:val="${Ooxml.xmlEscape(s)}"/></w:pPr>"""))
      body.append("""<w:r><w:t xml:space="preserve">""")
        .append(Ooxml.xmlEscape(text))
        .append("</w:t></w:r></w:p>")
    }
    body.append("</w:body></w:document>")
    val bos = new java.io.ByteArrayOutputStream()
    val z = new java.util.zip.ZipOutputStream(bos)
    def entry(name: String, content: String): Unit = {
      z.putNextEntry(new java.util.zip.ZipEntry(name))
      z.write(content.getBytes(StandardCharsets.UTF_8))
      z.closeEntry()
    }
    entry("[Content_Types].xml",
      """<?xml version="1.0" encoding="UTF-8"?><Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types"><Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/><Default Extension="xml" ContentType="application/xml"/><Override PartName="/word/document.xml" ContentType="application/vnd.openxmlformats-officedocument.wordprocessingml.document.main+xml"/></Types>""")
    entry("_rels/.rels",
      """<?xml version="1.0" encoding="UTF-8"?><Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships"><Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="word/document.xml"/></Relationships>""")
    entry("word/document.xml", body.toString)
    z.close()
    bos.toByteArray
  }

  /** Single plain paragraph convenience (the q83 corpus shape). */
  def docxBytes(text: String): Array[Byte] = docxBytes(Seq((None, text)))

  /** Extract every document, one extractor instance per partition. */
  def extractAll(docs: Dataset[RawDoc],
                 mk: () => Extractor = () => new PlainTextExtractor()): Dataset[Extracted] = {
    import docs.sparkSession.implicits._
    docs.mapPartitions { it =>
      val ex = mk() // per-partition init (parser handle / model client)
      it.map(ex.extract)
    }
  }

  /** Real PDF extraction — the reference's planned PDF ingestion
    * (`etl_implementation.md:262-273`, Source.type `pdf` in
    * `schema.cql:96-97`) with no added dependency: [[Pdf]] parses the
    * object graph (xref-independent scan, ObjStm expansion), walks the
    * page tree, bounded-inflates `/FlateDecode` content streams, and
    * replays the text operators (`Tj`, `TJ`, quote forms, and the
    * `Td`/`TD`/`T*`-and-`Tm` line discipline). Page breaks are
    * paragraph breaks; the document
    * `/Info /Title` wins over the first line, the same
    * heading-over-first-line contract as [[MarkdownExtractor]] /
    * [[DocxExtractor]]. Chunking and empty-doc laws are shared (0
    * chunks for an empty body). */
  class PdfExtractor(chunkChars: Int = 500) extends Extractor {
    def extract(d: RawDoc): Extracted = {
      val (raw, title, nPages) = Pdf.extractText(d.content)
      val text = normalize(raw)
      val paras = paragraphs(text)
      val packed = packChunks(paras, chunkChars)
      Extracted(d.doc_id, d.source_type, d.name, text,
        title.map(_.trim).filter(_.nonEmpty).getOrElse(titleOf(text)).take(120),
        packed.size, s"pdf:${nPages}pg:${paras.size}p")
    }
  }

  /** Real HTML extraction — the web-corpus ingestion path (a Graph-RAG
    * corpus of institutional pages is web content first; the family
    * slot next to pdf/docx in `etl_implementation.md:262-273`'s
    * extraction plan): [[Html.toText]]'s single-pass tag tokenizer
    * drops script/style and the nav/header/footer/aside boilerplate
    * chrome, turns block boundaries into paragraphs, and decodes
    * character references. The `<title>` tag wins over the first body
    * line — the same heading-over-first-line contract as
    * [[MarkdownExtractor]] / [[DocxExtractor]] / [[PdfExtractor]].
    * Chunking and empty-doc laws are shared (0 chunks for an empty
    * body). */
  class HtmlExtractor(chunkChars: Int = 500) extends Extractor {
    def extract(d: RawDoc): Extracted = {
      val (body, title) = Html.toText(new String(d.content, StandardCharsets.UTF_8))
      val text = normalize(body)
      val paras = paragraphs(text)
      val packed = packChunks(paras, chunkChars)
      Extracted(d.doc_id, d.source_type, d.name, text,
        Some(title).map(_.trim).filter(_.nonEmpty).getOrElse(titleOf(text)).take(120),
        packed.size, s"html:${paras.size}p")
    }
  }

  /** Extractive summarization behind the reference's `llm` source type
    * (`schema.cql:96-97` — the slot its plan reserves for LLM-based
    * extraction): Luhn's significance method (IBM J. R&D, 1958), the
    * classical zero-egress stand-in for an abstractive model. Sentences
    * split on terminal punctuation (an RE2-safe pattern, so the oracle
    * replays it verbatim); significant words = length ≥ 4 after the
    * engine-wide lower/trim tokenization; a sentence scores the sum of
    * its significant words' DOCUMENT frequencies over its own token
    * count; the top-3 by (rounded score, position) re-assemble in
    * original order as the extract. Swapping in a real model client is
    * one `mk` closure at [[extractAll]]'s seam — the Spark plumbing
    * (per-partition init, no shuffle, payload dropped early) is
    * exactly what an LLM batch client needs too.
    */
  class LuhnExtractor(topK: Int = 3) extends Extractor {
    def extract(d: RawDoc): Extracted = {
      val text = new String(d.content, StandardCharsets.UTF_8)
      val sents = text.toLowerCase.trim.split("[.!?]+\\s+|[.!?]+$")
        .map(_.trim).filter(_.nonEmpty)
      val toks: Array[Array[String]] =
        sents.map(_.split("\\s+").filter(_.nonEmpty))
      val df = toks.flatten.filter(_.length >= 4)
        .groupBy(identity).view.mapValues(_.length.toLong).toMap
      val scored = toks.zipWithIndex.map { case (ws, i) =>
        val num = ws.filter(_.length >= 4).map(df(_)).sum
        val score = if (ws.isEmpty) 0.0
          else BigDecimal(num.toDouble / ws.length)
            .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        (i, score)
      }
      val chosen = scored.sortBy { case (i, sc) => (-sc, i) }.take(topK)
        .map(_._1).sorted
      val summary = chosen.map(sents(_)).mkString(" ")
      Extracted(d.doc_id, d.source_type, d.name, summary,
        chosen.headOption.map(sents(_)).getOrElse("").take(120),
        chosen.length, s"luhn:k=$topK:${sents.length}s")
    }
  }

  /** Deterministic stand-in marking the seam where a real LLM client
    * would sit for source types with no zero-egress extractor. */
  class StubExtractor(chunkChars: Int = 500) extends Extractor {
    def extract(d: RawDoc): Extracted = {
      val text = new String(d.content, StandardCharsets.UTF_8)
      val chunks = math.max(1, (text.length + chunkChars - 1) / chunkChars)
      Extracted(d.doc_id, d.source_type, d.name, text, titleOf(text), chunks,
        s"stub:${d.source_type}")
    }
  }

  /** Extracted docs as graph `Source` nodes: uid = sha256(name)[:16]
    * (the engine-wide deterministic id), invalid source types rejected —
    * the CHECK-style enum validation Neo4j leaves to convention
    * (SURVEY §1.2). */
  def toSourceNodes(extracted: Dataset[Extracted]): DataFrame =
    extracted.toDF()
      .filter(col("source_type").isin(SourceTypes.toSeq: _*))
      .select(
        lit("Source").as("label"),
        graft.core.Uid.uid(col("name")).as("uid"),
        col("name"),
        col("source_type").as("type"),
        col("provenance"))

  /** Per-chunk provenance edges (`DERIVED_FROM`, SURVEY §1.1): one edge
    * per extracted chunk, chunk uid = sha256(name + "#" + idx)[:16],
    * pointing at the document's Source node. Pure projection + explode —
    * no shuffle; the chunk list never materializes, only its index
    * range. */
  def toDerivedFromEdges(extracted: Dataset[Extracted]): DataFrame =
    extracted.toDF()
      .filter(col("source_type").isin(SourceTypes.toSeq: _*))
      // 0-chunk (empty) docs emit no edges — without this guard,
      // sequence(0, -1) would produce a DESCENDING [0, -1] range
      .filter(col("n_chunks") > 0)
      .select(col("name"),
        explode(sequence(lit(0L), col("n_chunks").cast("long") - 1)).as("chunk_idx"))
      .select(
        graft.core.Uid.uid(concat(col("name"), lit("#"), col("chunk_idx"))).as("chunk_uid"),
        lit("DERIVED_FROM").as("rel_type"),
        graft.core.Uid.uid(col("name")).as("src_uid"),
        col("name"), col("chunk_idx"))
}
