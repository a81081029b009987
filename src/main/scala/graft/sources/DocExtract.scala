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
  * Two REAL zero-egress extractors run on actual bytes:
  * [[PlainTextExtractor]] (UTF-8 decode, BOM strip, newline
  * normalization, paragraph-packed chunking) and [[MarkdownExtractor]]
  * (the same plus markup stripping and heading-derived titles). The
  * PDF/DOCX/LLM codecs this container lacks stay behind the same
  * [[Extractor]] interface ([[StubExtractor]] marks that seam).
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
    * extended with txt | md for the zero-egress extractors. */
  case class RawDoc(doc_id: Long, source_type: String, name: String,
                    content: Array[Byte])

  case class Extracted(doc_id: Long, source_type: String, name: String,
                       text: String, title: String, n_chunks: Int,
                       provenance: String)

  /** Allowed Source.type values: the reference enum (`schema.cql:96-97`)
    * plus the engine's plain-text/markdown extensions. */
  val SourceTypes: Set[String] = Set("pdf", "csv", "docx", "llm", "txt", "md")

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

  /** Extract every document, one extractor instance per partition. */
  def extractAll(docs: Dataset[RawDoc],
                 mk: () => Extractor = () => new PlainTextExtractor()): Dataset[Extracted] = {
    import docs.sparkSession.implicits._
    docs.mapPartitions { it =>
      val ex = mk() // per-partition init (parser handle / model client)
      it.map(ex.extract)
    }
  }

  /** Deterministic stand-in marking the seam where a real PDF/DOCX
    * parser or LLM client would sit. */
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
