package graft.sources

import java.nio.charset.StandardCharsets

/** Zero-egress HTML → text extraction — the web-corpus ingestion path
  * every large-scale training-data pipeline needs (Common-Crawl-style
  * page → prose, the WET-extraction shape) and the natural next member
  * of the reference's planned multi-format extraction family
  * (`/root/reference/etl_implementation.md:262-273` plans PDF/DOCX/LLM
  * extraction; a Graph-RAG corpus of university waste-disposal pages is
  * web content first). No added dependency: a hand-rolled single-pass
  * tag tokenizer, the same build-it-on-the-JDK contract as [[Pdf]] and
  * [[Ooxml]].
  *
  * Extraction model:
  *   - non-content subtrees are dropped whole with a depth counter
  *     (`script`/`style`/`noscript`/`template`/`svg`/`iframe` — code,
  *     not prose) and so are the classic boilerplate containers
  *     (`nav`/`header`/`footer`/`aside`), the rule-based skeleton of
  *     boilerplate removal (Kohlschütter et al., WSDM 2010 use DOM
  *     block context the same way);
  *   - block-level boundaries (`p`, `div`, `h1`–`h6`, `li`, `tr`,
  *     `table`, `section`, `article`, `main`, `blockquote`, `pre`,
  *     `ul`, `ol`, `dl`, `dt`, `dd`, `figure`, `figcaption`, `hr`)
  *     become paragraph breaks, `br` a line break — inline markup
  *     (`a`/`b`/`em`/`span`/`code`…) contributes only its text;
  *   - character references decode (the HTML5 named core + German
  *     umlauts, plus decimal/hex numeric forms);
  *   - `<title>` is captured separately and wins over the first body
  *     line, the same heading-over-first-line contract as
  *     [[DocExtract.MarkdownExtractor]] / [[DocExtract.DocxExtractor]];
  *   - comments, DOCTYPE/CDATA declarations, and attribute values
  *     (including quoted `>`) are consumed without leaking into text;
  *   - whitespace runs that contain a newline or tab collapse to one
  *     space (pretty-printing artifacts), runs of plain spaces are
  *     preserved (data spacing) — this keeps single-line source text
  *     byte-exact through a round trip, which is what the q101 gate
  *     pins against the DuckDB oracle.
  */
object Html {

  /** Subtrees dropped whole: non-prose code containers + the
    * boilerplate chrome blocks. */
  private val SkipTags = Set(
    "script", "style", "noscript", "template", "svg", "iframe",
    "nav", "header", "footer", "aside")

  /** Open/close of any of these inserts a paragraph boundary. */
  private val BlockTags = Set(
    "p", "div", "h1", "h2", "h3", "h4", "h5", "h6", "li", "tr", "table",
    "section", "article", "main", "blockquote", "pre", "ul", "ol",
    "dl", "dt", "dd", "figure", "figcaption", "hr")

  /** Void elements: never expect a closing tag (HTML5 §13.1.2). */
  private val VoidTags = Set(
    "br", "hr", "img", "meta", "link", "input", "area", "base", "col",
    "embed", "source", "track", "wbr")

  /** HTML5 named references actually seen in prose corpora: the XML
    * core, typographic marks, and the German set this reference's
    * domain (university waste-disposal pages) uses. */
  private val NamedEntities: Map[String, String] = Map(
    "amp" -> "&", "lt" -> "<", "gt" -> ">", "quot" -> "\"",
    "apos" -> "'", "nbsp" -> " ",
    "mdash" -> "—", "ndash" -> "–", "hellip" -> "…",
    "copy" -> "©", "reg" -> "®", "times" -> "×",
    "middot" -> "·", "laquo" -> "«", "raquo" -> "»",
    "auml" -> "ä", "ouml" -> "ö", "uuml" -> "ü",
    "Auml" -> "Ä", "Ouml" -> "Ö", "Uuml" -> "Ü",
    "szlig" -> "ß", "euro" -> "€")

  /** Decode one numeric character reference. C0 control codepoints
    * (except tab/newline) decode to empty — the HTML spec calls them
    * parse errors, and emitting them would collide with this
    * extractor's in-band sentinel chars (U+0000 paragraph marks,
    * U+0001 <br> breaks) in the post-pass. */
  private def numericRef(cp: Int): String =
    if (cp < 0x20 && cp != '\t' && cp != '\n' && cp != '\r') ""
    else Character.toChars(cp).mkString

  /** Decode character references in `s`; unknown names pass through
    * verbatim (browsers render `&bogus;` literally too). */
  private[sources] def decodeEntities(s: String): String = {
    if (s.indexOf('&') < 0) return s
    val out = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '&') {
        val semi = s.indexOf(';', i + 1)
        // real references are short; a far-away ';' means a bare '&'
        if (semi > i && semi - i <= 10) {
          val body = s.substring(i + 1, semi)
          val decoded: Option[String] =
            if (body.startsWith("#x") || body.startsWith("#X"))
              try Some(numericRef(Integer.parseInt(body.drop(2), 16)))
              catch { case _: Exception => None }
            else if (body.startsWith("#"))
              try Some(numericRef(Integer.parseInt(body.drop(1))))
              catch { case _: Exception => None }
            else NamedEntities.get(body)
          decoded match {
            case Some(d) => out.append(d); i = semi + 1
            case None => out.append(c); i += 1
          }
        } else { out.append(c); i += 1 }
      } else { out.append(c); i += 1 }
    }
    out.toString
  }

  /** One parsed tag: lowercased name, whether it closes, whether it
    * self-closes, and the index just past its '>'. */
  private final case class Tag(name: String, closing: Boolean,
                               selfClosing: Boolean, end: Int)

  /** Parse the tag starting at `i` (s(i) == '<'). Attribute values are
    * consumed quote-aware so a '>' inside `alt="a > b"` does not end
    * the tag. Returns None for stray '<' that opens no tag. */
  private def parseTag(s: String, i: Int): Option[Tag] = {
    var j = i + 1
    if (j >= s.length) return None
    val closing = s.charAt(j) == '/'
    if (closing) j += 1
    val nameStart = j
    while (j < s.length && (s.charAt(j).isLetterOrDigit)) j += 1
    if (j == nameStart) return None // "<3" or "< " — literal text
    val name = s.substring(nameStart, j).toLowerCase
    var selfClosing = false
    var quote: Char = 0
    while (j < s.length) {
      val c = s.charAt(j)
      if (quote != 0) { if (c == quote) quote = 0 }
      else if (c == '"' || c == '\'') quote = c
      else if (c == '>') {
        if (j > i && s.charAt(j - 1) == '/') selfClosing = true
        return Some(Tag(name, closing, selfClosing, j + 1))
      }
      j += 1
    }
    None // unterminated tag: treat as literal text
  }

  /** html → (body text, title). Body paragraphs are "\n\n"-joined in
    * document order with boilerplate/skip subtrees removed; title is
    * the decoded, whitespace-collapsed `<title>` content ("" if none).
    */
  def toText(rawHtml: String): (String, String) = {
    // source-newline normalization up front so the collapse rules below
    // see only '\n' — and strip every other C0 control char BEFORE
    // tokenizing: U+0000/U+0001 are this extractor's in-band sentinels
    // (paragraph mark / <br>), so literal control bytes in the source
    // must never reach the segment buffer (they are parse errors in
    // HTML text anyway)
    val html = rawHtml.replace("\r\n", "\n").replace('\r', '\n')
      .replaceAll("[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F]", "")
    val out = new StringBuilder // raw body with \u0000 paragraph marks
    val title = new StringBuilder
    var skipDepth = 0
    var skipTag: String = null // outermost skip tag; nested same-name tracked
    var inTitle = false
    var i = 0
    val n = html.length
    def mark(): Unit = out.append('\u0000') // paragraph boundary
    while (i < n) {
      val c = html.charAt(i)
      if (c == '<') {
        if (html.startsWith("<!--", i)) {
          val e = html.indexOf("-->", i + 4)
          i = if (e < 0) n else e + 3
        } else if (html.startsWith("<![CDATA[", i)) {
          val e = html.indexOf("]]>", i + 9)
          if (skipDepth == 0) out.append(html.substring(i + 9, if (e < 0) n else e))
          i = if (e < 0) n else e + 3
        } else if (i + 1 < n && (html.charAt(i + 1) == '!' || html.charAt(i + 1) == '?')) {
          val e = html.indexOf('>', i) // DOCTYPE / processing instruction
          i = if (e < 0) n else e + 1
        } else parseTag(html, i) match {
          case None => if (skipDepth == 0 && !inTitle) out.append(c); i += 1
          case Some(t) =>
            i = t.end
            if (skipDepth > 0) {
              // inside a dropped subtree: only same-name nesting matters
              if (t.name == skipTag && !VoidTags(t.name) && !t.selfClosing)
                skipDepth += (if (t.closing) -1 else 1)
              if (skipDepth == 0) { skipTag = null; mark() }
            } else if (t.name == "title") {
              inTitle = !t.closing && !t.selfClosing
            } else if (SkipTags(t.name) && !t.closing && !t.selfClosing) {
              skipDepth = 1; skipTag = t.name
            } else if (t.name == "br") {
              // a HARD line break, as a sentinel so the pretty-printing
              // newline collapse below cannot eat it
              out.append('\u0001')
            } else if (BlockTags(t.name)) {
              mark()
            } // inline tags: transparent
        }
      } else {
        if (inTitle) title.append(c)
        else if (skipDepth == 0) out.append(c)
        i += 1
      }
    }
    val paras = out.toString.split('\u0000').iterator
      .map(seg => decodeEntities(seg)
        // collapse pretty-printing whitespace (runs containing \n or \t)
        // to one space; preserve plain-space runs (data spacing);
        // then materialize <br> sentinels as real line breaks
        .replaceAll("[ \t]*\n[ \t]*", " ").replace('\t', ' ')
        .replaceAll("[ ]*\u0001[ ]*", "\n").trim)
      .filter(_.nonEmpty)
    (paras.mkString("\n\n"),
      decodeEntities(title.toString).replaceAll("\\s+", " ").trim)
  }

  /** Escape text for element content. */
  def htmlEscape(s: String): String = Ooxml.xmlEscape(s)

  /** Minimal realistic page writer — the round-trip complement of
    * [[toText]] and the q101 gate's input builder (as [[Pdf.pdfBytes]]
    * and [[DocExtract.docxBytes]] are for q84/q83): a full page with
    * head (title + style + script), chrome (nav/header/footer with
    * entity-bearing boilerplate the extractor must drop), and the text
    * as one `<p>` inside `<article>`. Extraction recovers exactly
    * (title, text). */
  def pageBytes(title: String, text: String): Array[Byte] = {
    val t = htmlEscape(title)
    val b = htmlEscape(text)
    val page =
      s"""<!DOCTYPE html>
         |<html lang="de">
         |<head>
         |  <meta charset="utf-8"/>
         |  <title>$t</title>
         |  <style>body { margin: 0; } /* a > b won't end this tag */</style>
         |  <script type="text/javascript">if (1 < 2 && 2 > 1) { console.log("<p>not text</p>"); }</script>
         |</head>
         |<body>
         |  <nav><ul><li><a href="/home?a=1&amp;b=2">Start</a></li><li>Men&uuml;</li></ul></nav>
         |  <header><h1>Abfall &amp; Wertstoff &ndash; Portal</h1></header>
         |  <!-- chrome ends; content begins -->
         |  <main>
         |    <article>
         |      <p>$b</p>
         |    </article>
         |  </main>
         |  <footer>&copy; 2026 Universit&auml;t &middot; <a href="/impressum">Impressum</a></footer>
         |</body>
         |</html>
         |""".stripMargin
    page.getBytes(StandardCharsets.UTF_8)
  }
}
