package graft.sources

import java.nio.charset.StandardCharsets
import java.util.zip.Inflater

/** Zero-egress PDF machinery for the reference's planned PDF ingestion
  * path (`/root/reference/etl_implementation.md:262-273`,
  * `/root/reference/README.md:122-127` — Source.type includes `pdf`,
  * `schema.cql:96-97`): a real byte-level PDF parser and text extractor
  * built only on the JDK, the same no-added-dependency contract as the
  * OOXML family ([[Ooxml]]).
  *
  * What is REAL here:
  *   - full PDF object syntax (dicts, arrays, names, literal + hex
  *     strings with all escape forms, refs, booleans, null, streams),
  *   - robust object discovery by linear `N G obj` scan (survives a
  *     broken or absent xref table, the same recovery strategy
  *     `pdftotext -raw`-class tools fall back to),
  *   - PDF 1.5 object streams (`/Type /ObjStm`) — compressed-object
  *     PDFs are expanded and their embedded objects parsed,
  *   - stream filters: `/FlateDecode` (JDK Inflater, decompression
  *     bounded like [[Ooxml.zipEntries]] — a crafted PDF cannot OOM an
  *     executor) and `/LZWDecode` (9–12-bit variable-width codes with
  *     EarlyChange, same output bound), both with PNG predictors, plus
  *     `/ASCIIHexDecode`, `/ASCII85Decode` and `/RunLengthDecode` —
  *     filter arrays apply in order,
  *   - page-tree walk (`/Root → /Pages → /Kids*`, cycle-guarded) with
  *     per-page `/Contents` (single stream or array),
  *   - content-stream text operators: `BT/ET`, `Tj`, `'`, `"`, `TJ`
  *     (kern-aware: a ≤ −180/1000 em adjustment reads as a space, the
  *     standard extraction heuristic), line breaks from `Td/TD` with a
  *     vertical component, `T*`, and `Tm` repositioning,
  *   - document `/Info /Title` with PDF text-string decoding (UTF-16BE
  *     BOM, UTF-8 BOM, else PDFDocEncoding ≈ Latin-1).
  *
  *   - composite/CID fonts: `/ToUnicode` CMaps (PDF 32000-1 §9.10.3)
  *     are parsed — `begincodespacerange` fixes the code byte-width,
  *     `beginbfchar`/`beginbfrange` (including array destinations and
  *     last-code-unit increment) map codes to UTF-16BE text — and the
  *     content-stream `Tf` operator switches the active decoder per
  *     font, with page `/Resources` inherited down the page tree as
  *     the spec prescribes. This is what real office PDFs
  *     (Word/LaTeX output, Identity-H 2-byte codes) need for umlauts
  *     and any non-Latin-1 glyphs to extract faithfully.
  *
  * Known, documented limit: a show string in a font WITHOUT a
  * /ToUnicode CMap decodes as Latin-1 (PDFDocEncoding's printable
  * range) — recovering text from such fonts requires the font
  * program's own glyph→char tables, which no text extractor reads
  * without a font rasterizer. Codes a CMap's codespace covers but
  * leaves unmapped contribute no text (the pdftotext convention).
  */
object Pdf {

  // ---------------------------------------------------------------- model

  sealed trait Obj
  final case class PNum(v: Double) extends Obj { def int: Int = v.toInt; def long: Long = v.toLong }
  final case class PStr(bytes: Array[Byte]) extends Obj
  final case class PName(v: String) extends Obj
  final case class PArr(items: Vector[Obj]) extends Obj
  final case class PDict(m: Map[String, Obj]) extends Obj {
    def get(k: String): Option[Obj] = m.get(k)
  }
  final case class PRef(num: Int, gen: Int) extends Obj
  final case class PBool(v: Boolean) extends Obj
  case object PNull extends Obj
  /** Raw (still-encoded) stream body + its dict. */
  final case class PStream(dict: PDict, raw: Array[Byte]) extends Obj
  /** Bare identifier in a content stream — an operator. */
  final case class POp(name: String) extends Obj

  /** Decompression bound — same rationale as [[Ooxml.MaxEntryBytes]]. */
  val MaxStreamBytes: Long = 256L * 1024 * 1024

  // ---------------------------------------------------------------- lexer

  private def isWs(b: Byte): Boolean =
    b == ' ' || b == '\n' || b == '\r' || b == '\t' || b == '\f' || b == 0

  private def isDelim(b: Byte): Boolean =
    "()<>[]{}/%".indexOf(b.toChar) >= 0

  /** Single-pass recursive-descent parser over a byte window. Used both
    * for document objects and (with `contentMode`) content streams,
    * where bare identifiers are operators rather than an error. */
  final class Parser(bytes: Array[Byte], var pos: Int, val end: Int,
                     contentMode: Boolean = false) {
    def this(bytes: Array[Byte]) = this(bytes, 0, bytes.length)

    def atEnd: Boolean = { skipWs(); pos >= end }

    def skipWs(): Unit = {
      var go = true
      while (go && pos < end) {
        if (isWs(bytes(pos))) pos += 1
        else if (bytes(pos) == '%') { // comment to EOL
          while (pos < end && bytes(pos) != '\n' && bytes(pos) != '\r') pos += 1
        } else go = false
      }
    }

    def next(): Obj = {
      skipWs()
      require(pos < end, "unexpected end of PDF data")
      bytes(pos).toChar match {
        case '/' => name()
        case '(' => literalString()
        case '[' => array()
        case '<' =>
          if (pos + 1 < end && bytes(pos + 1) == '<') dict() else hexString()
        case c if c == '+' || c == '-' || c == '.' || c.isDigit => numberOrRef()
        case _ => keywordOrOp()
      }
    }

    private def name(): PName = {
      pos += 1 // '/'
      val sb = new StringBuilder
      while (pos < end && !isWs(bytes(pos)) && !isDelim(bytes(pos))) {
        if (bytes(pos) == '#' && pos + 2 < end) { // #xx hex escape in names
          sb.append(Integer.parseInt(
            new String(bytes, pos + 1, 2, StandardCharsets.ISO_8859_1), 16).toChar)
          pos += 3
        } else { sb.append(bytes(pos).toChar); pos += 1 }
      }
      PName(sb.toString)
    }

    /** `(...)` with balanced parens and the full escape set. */
    private def literalString(): PStr = {
      pos += 1
      val out = new java.io.ByteArrayOutputStream()
      var depth = 1
      while (depth > 0) {
        require(pos < end, "unterminated PDF string")
        val b = bytes(pos)
        b.toChar match {
          case '\\' =>
            pos += 1
            require(pos < end, "dangling backslash in PDF string")
            bytes(pos).toChar match {
              case 'n' => out.write('\n'); pos += 1
              case 'r' => out.write('\r'); pos += 1
              case 't' => out.write('\t'); pos += 1
              case 'b' => out.write('\b'); pos += 1
              case 'f' => out.write('\f'); pos += 1
              case '(' => out.write('('); pos += 1
              case ')' => out.write(')'); pos += 1
              case '\\' => out.write('\\'); pos += 1
              case '\r' => // line continuation: \CRLF or \CR
                pos += 1; if (pos < end && bytes(pos) == '\n') pos += 1
              case '\n' => pos += 1
              case d if d >= '0' && d <= '7' => // 1-3 octal digits
                var v = 0; var n = 0
                while (n < 3 && pos < end && bytes(pos) >= '0' && bytes(pos) <= '7') {
                  v = v * 8 + (bytes(pos) - '0'); pos += 1; n += 1
                }
                out.write(v & 0xFF)
              case other => out.write(other); pos += 1 // \x → x per spec
            }
          case '(' => depth += 1; out.write('('); pos += 1
          case ')' =>
            depth -= 1; if (depth > 0) out.write(')')
            pos += 1
          case _ => out.write(b); pos += 1
        }
      }
      PStr(out.toByteArray)
    }

    /** `<hex>` — whitespace ignored, odd final digit padded with 0. */
    private def hexString(): PStr = {
      pos += 1
      val out = new java.io.ByteArrayOutputStream()
      var hi = -1
      while (pos < end && bytes(pos) != '>') {
        val c = bytes(pos).toChar
        if (!isWs(bytes(pos))) {
          val v = Character.digit(c, 16)
          require(v >= 0, s"bad hex digit '$c' in PDF hex string")
          if (hi < 0) hi = v else { out.write(hi * 16 + v); hi = -1 }
        }
        pos += 1
      }
      require(pos < end, "unterminated hex string")
      pos += 1
      if (hi >= 0) out.write(hi * 16)
      PStr(out.toByteArray)
    }

    private def array(): PArr = {
      pos += 1
      val items = Vector.newBuilder[Obj]
      skipWs()
      while (pos < end && bytes(pos) != ']') { items += next(); skipWs() }
      require(pos < end, "unterminated array")
      pos += 1
      PArr(items.result())
    }

    private def dict(): Obj = {
      pos += 2 // '<<'
      val m = Map.newBuilder[String, Obj]
      skipWs()
      while (pos < end && bytes(pos) != '>') {
        val k = next() match {
          case PName(n) => n
          case other => sys.error(s"dict key must be a name, got $other")
        }
        m += (k -> next())
        skipWs()
      }
      require(pos + 1 < end && bytes(pos + 1) == '>', "unterminated dict")
      pos += 2
      val d = PDict(m.result())
      // `<<dict>> stream ... endstream` — only in document mode
      if (!contentMode) {
        val save = pos
        skipWs()
        if (pos + 6 <= end &&
            new String(bytes, pos, 6, StandardCharsets.ISO_8859_1) == "stream") {
          pos += 6
          if (pos < end && bytes(pos) == '\r') pos += 1
          if (pos < end && bytes(pos) == '\n') pos += 1
          val dataStart = pos
          // extent: a direct /Length is authoritative (and immune to
          // compressed bytes that happen to spell "endstream"); an
          // indirect /Length falls back to the keyword scan
          val direct = d.get("Length").collect {
            case PNum(len) if len >= 0 && dataStart + len.toInt <= end &&
              indexOf("endstream", dataStart + len.toInt) >= 0 => len.toInt
          }
          val (dataEnd0, after) = direct match {
            case Some(len) =>
              val ksAt = indexOf("endstream", dataStart + len)
              (dataStart + len, ksAt + "endstream".length)
            case None =>
              val idx = indexOf("endstream", dataStart)
              require(idx >= 0, "stream without endstream")
              (idx, idx + "endstream".length)
          }
          var dataEnd = dataEnd0
          if (direct.isEmpty) {
            // strip at most one trailing EOL that belongs to the keyword
            if (dataEnd > dataStart && bytes(dataEnd - 1) == '\n') dataEnd -= 1
            if (dataEnd > dataStart && bytes(dataEnd - 1) == '\r') dataEnd -= 1
          }
          pos = after
          return PStream(d, java.util.Arrays.copyOfRange(bytes, dataStart, dataEnd))
        }
        pos = save
      }
      d
    }

    private def indexOf(needle: String, from: Int): Int = {
      val n = needle.getBytes(StandardCharsets.ISO_8859_1)
      var i = from
      while (i + n.length <= end) {
        var j = 0
        while (j < n.length && bytes(i + j) == n(j)) j += 1
        if (j == n.length) return i
        i += 1
      }
      -1
    }

    /** Number, or `int int R` indirect reference (rollback lookahead). */
    private def numberOrRef(): Obj = {
      val first = number()
      if (first.v == math.floor(first.v) && first.v >= 0) {
        val save = pos
        skipWs()
        if (pos < end && (bytes(pos).toChar.isDigit)) {
          val gen = number()
          skipWs()
          if (pos < end && bytes(pos) == 'R' &&
              (pos + 1 >= end || isWs(bytes(pos + 1)) || isDelim(bytes(pos + 1)))) {
            pos += 1
            return PRef(first.int, gen.int)
          }
        }
        pos = save
      }
      first
    }

    private def number(): PNum = {
      val start = pos
      if (pos < end && (bytes(pos) == '+' || bytes(pos) == '-')) pos += 1
      while (pos < end && (bytes(pos).toChar.isDigit || bytes(pos) == '.')) pos += 1
      PNum(new String(bytes, start, pos - start, StandardCharsets.ISO_8859_1).toDouble)
    }

    private def keywordOrOp(): Obj = {
      val start = pos
      while (pos < end && !isWs(bytes(pos)) && !isDelim(bytes(pos))) pos += 1
      new String(bytes, start, pos - start, StandardCharsets.ISO_8859_1) match {
        case "true" => PBool(true)
        case "false" => PBool(false)
        case "null" => PNull
        case "" => sys.error(s"unparsable byte 0x${"%02x".format(bytes(start))} at $start")
        case kw if contentMode => POp(kw)
        case kw => sys.error(s"unexpected keyword '$kw' at offset $start")
      }
    }
  }

  // ---------------------------------------------------------- document

  /** A parsed PDF: every indirect object (object streams expanded),
    * trailer dict(s), and the resolved page list. */
  final class Document(bytes: Array[Byte]) {
    val objects: Map[Int, Obj] = {
      val direct = scanObjects(bytes)
      // expand /Type /ObjStm compressed-object streams (PDF 1.5)
      val fromStms = direct.values.collect {
        case s: PStream if s.dict.get("Type").contains(PName("ObjStm")) =>
          expandObjStm(s, direct)
      }.flatten
      // a directly-scanned object wins over an ObjStm copy
      fromStms.toMap ++ direct
    }

    val trailers: Seq[PDict] = scanTrailers(bytes)

    def resolve(o: Obj): Obj = o match {
      case PRef(n, _) => objects.get(n).map(resolve).getOrElse(PNull)
      case other => other
    }

    private def dictOf(o: Obj): Option[PDict] = resolve(o) match {
      case d: PDict => Some(d)
      case s: PStream => Some(s.dict)
      case _ => None
    }

    /** Catalog: trailer /Root, else the first /Type /Catalog object. */
    def catalog: Option[PDict] =
      trailers.flatMap(_.get("Root")).flatMap(dictOf).headOption
        .orElse(objects.values.flatMap(dictOf).find(_.get("Type").contains(PName("Catalog"))))

    /** Leaf pages in document order (cycle-guarded /Kids walk).
      * `/Resources` is an INHERITABLE page attribute (PDF 32000-1
      * §7.7.3.4): a leaf without its own inherits the nearest
      * ancestor's, materialized into the returned dict so
      * [[pageFonts]] sees one flat page. */
    def pages: Seq[PDict] = {
      val seen = scala.collection.mutable.Set[Int]()
      def walk(node: Obj, inhRes: Option[Obj]): Seq[PDict] = {
        node match {
          case PRef(n, _) if !seen.add(n) => return Seq.empty
          case _ =>
        }
        dictOf(node).toSeq.flatMap { d =>
          val res = d.get("Resources").orElse(inhRes)
          def leaf: PDict =
            if (d.m.contains("Resources")) d
            else res.fold(d)(r => PDict(d.m + ("Resources" -> r)))
          d.get("Type") match {
            case Some(PName("Page")) => Seq(leaf)
            case _ => resolve(d.get("Kids").getOrElse(PNull)) match {
              case PArr(kids) => kids.flatMap(walk(_, res))
              case _ if d.get("Type").contains(PName("Page")) => Seq(leaf)
              case _ => Seq.empty
            }
          }
        }
      }
      catalog.map(c => walk(c.get("Pages").getOrElse(PNull), None))
        .getOrElse(Seq.empty)
    }

    /** Resource-name → ToUnicode decoder for a page's `/Resources
      * /Font` entries; fonts without a usable `/ToUnicode` stream are
      * absent (their show strings take the Latin-1 path). */
    def pageFonts(page: PDict): Map[String, ToUnicode] =
      (for {
        res <- dictOf(page.get("Resources").getOrElse(PNull)).toSeq
        fonts <- dictOf(res.get("Font").getOrElse(PNull)).toSeq
        (name, fref) <- fonts.m
        tu <- dictOf(fref).flatMap(fd =>
          resolve(fd.get("ToUnicode").getOrElse(PNull)) match {
            case s: PStream =>
              try Some(parseToUnicode(decodeStream(s, this)))
              catch { case _: Exception => None } // corrupt CMap: Latin-1 path
            case _ => None
          })
      } yield name -> tu).toMap

    /** A page's decoded content bytes (single stream or array, joined
      * with a newline as the spec prescribes for multi-part content). */
    def pageContent(page: PDict): Array[Byte] = {
      val parts = resolve(page.get("Contents").getOrElse(PNull)) match {
        case s: PStream => Seq(s)
        case PArr(items) => items.map(resolve).collect { case s: PStream => s }
        case _ => Seq.empty
      }
      val out = new java.io.ByteArrayOutputStream()
      parts.foreach { s =>
        if (out.size() > 0) out.write('\n')
        out.write(decodeStream(s, this))
      }
      out.toByteArray
    }

    /** /Info /Title as a decoded text string. */
    def title: Option[String] =
      trailers.flatMap(_.get("Info")).flatMap(dictOf)
        .flatMap(_.get("Title")).map(resolve).collectFirst {
          case PStr(b) => textString(b)
        }
  }

  /** Linear `N G obj ... endobj` scan — xref-independent recovery-style
    * discovery; later definitions of the same object number win
    * (incremental updates append). */
  private def scanObjects(bytes: Array[Byte]): Map[Int, Obj] = {
    val s = new String(bytes, StandardCharsets.ISO_8859_1)
    val objRe = java.util.regex.Pattern.compile("""(?<![0-9])(\d+)\s+(\d+)\s+obj\b""")
    val m = objRe.matcher(s)
    val out = scala.collection.mutable.Map[Int, Obj]()
    while (m.find()) {
      val num = m.group(1).toInt
      val p = new Parser(bytes, m.end(), bytes.length)
      try out(num) = p.next()
      catch { case _: Exception => } // tolerate a corrupt object; keep scanning
      // skip the matcher past any stream body so binary data that
      // happens to contain "N G obj" is not re-parsed
      if (p.pos > m.end()) m.region(math.min(p.pos, s.length), s.length)
    }
    out.toMap
  }

  private def scanTrailers(bytes: Array[Byte]): Seq[PDict] = {
    val s = new String(bytes, StandardCharsets.ISO_8859_1)
    val out = Seq.newBuilder[PDict]
    var idx = s.indexOf("trailer")
    while (idx >= 0) {
      try new Parser(bytes, idx + "trailer".length, bytes.length).next() match {
        case d: PDict => out += d
        case _ =>
      } catch { case _: Exception => }
      idx = s.indexOf("trailer", idx + 1)
    }
    // xref-stream PDFs have no `trailer` keyword: the xref stream's own
    // dict carries /Root and /Info
    val fromXrefStreams = scanObjects(bytes).values.collect {
      case st: PStream if st.dict.get("Type").contains(PName("XRef")) => st.dict
    }
    out.result() ++ fromXrefStreams
  }

  /** Expand a /Type /ObjStm: header is N (objnum, offset) pairs from
    * /First; each embedded object parses with the standard grammar. */
  private def expandObjStm(s: PStream, pool: Map[Int, Obj]): Seq[(Int, Obj)] = {
    def res(o: Obj): Obj = o match {
      case PRef(n, _) => pool.get(n).map(res).getOrElse(PNull)
      case x => x
    }
    val data = decodeStreamWith(s, res)
    val n = res(s.dict.get("N").getOrElse(PNull)) match { case PNum(v) => v.toInt; case _ => 0 }
    val first = res(s.dict.get("First").getOrElse(PNull)) match { case PNum(v) => v.toInt; case _ => 0 }
    val hdr = new Parser(data, 0, first, contentMode = true)
    val pairs = (0 until n).map { _ =>
      val num = hdr.next().asInstanceOf[PNum].int
      val off = hdr.next().asInstanceOf[PNum].int
      (num, off)
    }
    pairs.map { case (num, off) =>
      num -> new Parser(data, first + off, data.length).next()
    }
  }

  // ------------------------------------------------------------ filters

  def decodeStream(s: PStream, doc: Document): Array[Byte] =
    decodeStreamWith(s, doc.resolve)

  private def decodeStreamWith(s: PStream, resolve: Obj => Obj): Array[Byte] = {
    val filters = resolve(s.dict.get("Filter").getOrElse(PNull)) match {
      case PName(f) => Seq(f)
      case PArr(fs) => fs.map(resolve).collect { case PName(f) => f }
      case _ => Seq.empty
    }
    val parms: Seq[Option[PDict]] = resolve(s.dict.get("DecodeParms").getOrElse(PNull)) match {
      case d: PDict => Seq(Some(d))
      case PArr(ps) => ps.map(resolve).map { case d: PDict => Some(d); case _ => None }
      case _ => Seq.fill(filters.size)(None)
    }
    filters.zipAll(parms, "", None).foldLeft {
      // honor /Length when it is shorter than the scanned extent (data
      // between length end and `endstream` is permitted padding)
      resolve(s.dict.get("Length").getOrElse(PNull)) match {
        case PNum(len) if len.toInt >= 0 && len.toInt <= s.raw.length =>
          java.util.Arrays.copyOfRange(s.raw, 0, len.toInt)
        case _ => s.raw
      }
    } { case (data, (filter, parm)) =>
      filter match {
        case "" => data
        case "FlateDecode" => unpredict(inflate(data), parm, resolve)
        case "ASCIIHexDecode" =>
          val hex = new String(data, StandardCharsets.ISO_8859_1).takeWhile(_ != '>')
          new Parser(("<" + hex + ">").getBytes(StandardCharsets.ISO_8859_1))
            .next().asInstanceOf[PStr].bytes
        case "ASCII85Decode" => ascii85Decode(data)
        case "RunLengthDecode" => runLengthDecode(data)
        case "LZWDecode" =>
          val early = parm.flatMap(_.get("EarlyChange")).map(resolve)
            .collect { case PNum(v) => v.toInt }.getOrElse(1)
          unpredict(lzwDecode(data, early), parm, resolve)
        case other => sys.error(s"unsupported PDF stream filter /$other")
      }
    }
  }

  /** Bounded inflate — a crafted PDF cannot balloon past
    * [[MaxStreamBytes]]. */
  def inflate(data: Array[Byte]): Array[Byte] = {
    val inf = new Inflater()
    inf.setInput(data)
    val out = new java.io.ByteArrayOutputStream(math.max(64, data.length * 4))
    val buf = new Array[Byte](64 * 1024)
    while (!inf.finished() && !inf.needsInput()) {
      val n = inf.inflate(buf)
      if (n > 0) {
        out.write(buf, 0, n)
        require(out.size() <= MaxStreamBytes,
          s"PDF stream inflates past $MaxStreamBytes bytes: refusing (decompression bomb?)")
      } else if (n == 0 && inf.needsDictionary()) sys.error("FlateDecode needs preset dictionary")
    }
    inf.end()
    out.toByteArray
  }

  /** `/ASCII85Decode`: 5 chars `!`..`u` → 4 bytes base-85; `z` → four
    * zero bytes; whitespace ignored; `~>` terminates; a final partial
    * group of n chars (padded with `u`) yields n−1 bytes. */
  def ascii85Decode(data: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    var tuple = 0L
    var n = 0
    def flush(k: Int): Unit = { // k = bytes to emit from the 4-byte tuple
      var t = tuple
      val bs = new Array[Byte](4)
      for (i <- 3 to 0 by -1) { bs(i) = (t & 0xFF).toByte; t >>= 8 }
      out.write(bs, 0, k)
    }
    var i = 0
    var done = false
    while (i < data.length && !done) {
      val c = data(i).toChar
      if (c == '~') done = true
      else if (c.isWhitespace) ()
      else if (c == 'z' && n == 0) out.write(Array[Byte](0, 0, 0, 0))
      else {
        require(c >= '!' && c <= 'u', s"bad ASCII85 character '$c'")
        tuple = tuple * 85 + (c - '!'); n += 1
        if (n == 5) { flush(4); tuple = 0; n = 0 }
      }
      i += 1
    }
    if (n > 0) {
      require(n >= 2, "a 1-char final ASCII85 group is invalid")
      for (_ <- n until 5) tuple = tuple * 85 + ('u' - '!')
      flush(n - 1)
    }
    out.toByteArray
  }

  /** RunLength end-of-data marker byte. */
  val runLengthEOD: Byte = 128.toByte

  /** `/RunLengthDecode`: length byte 0–127 copies the next L+1 bytes
    * literally, 129–255 repeats the next byte 257−L times, 128 ends. */
  def runLengthDecode(data: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    var i = 0
    var done = false
    while (i < data.length && !done) {
      val l = data(i) & 0xFF; i += 1
      if (l == 128) done = true
      else if (l < 128) {
        require(i + l + 1 <= data.length, "truncated RunLength literal run")
        out.write(data, i, l + 1); i += l + 1
      } else {
        require(i < data.length, "truncated RunLength repeat run")
        val b = data(i); i += 1
        for (_ <- 0 until (257 - l)) out.write(b)
      }
    }
    out.toByteArray
  }

  /** `/LZWDecode` (PDF/TIFF flavor): MSB-first variable-width codes
    * starting at 9 bits, 256 = clear-table, 257 = EOD, width grows at
    * 2^w − EarlyChange (EarlyChange defaults to 1), capped at 12 bits.
    * Output bounded like [[inflate]]. */
  def lzwDecode(data: Array[Byte], earlyChange: Int = 1): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    val table = scala.collection.mutable.ArrayBuffer[Array[Byte]]()
    def reset(): Unit = {
      table.clear()
      for (i <- 0 until 256) table += Array(i.toByte)
      table += null; table += null // 256 clear, 257 EOD
    }
    reset()
    var width = 9
    var prev: Array[Byte] = null
    var bitBuf = 0L
    var bitCnt = 0
    var i = 0
    while (i < data.length) {
      bitBuf = (bitBuf << 8) | (data(i) & 0xFF); bitCnt += 8; i += 1
      var more = true
      while (bitCnt >= width && more) {
        val code = ((bitBuf >> (bitCnt - width)) & ((1L << width) - 1)).toInt
        bitCnt -= width
        if (code == 256) { reset(); width = 9; prev = null }
        else if (code == 257) { more = false; i = data.length }
        else {
          val entry =
            if (code < table.size && table(code) != null) table(code)
            else if (code == table.size && prev != null) prev :+ prev(0)
            else sys.error(s"bad LZW code $code (table ${table.size})")
          out.write(entry)
          require(out.size() <= MaxStreamBytes,
            s"LZW stream inflates past $MaxStreamBytes bytes: refusing")
          if (prev != null) table += (prev :+ entry(0))
          prev = entry
          if (table.size >= (1 << width) - earlyChange && width < 12) width += 1
        }
      }
    }
    out.toByteArray
  }

  /** PNG predictors (/Predictor >= 10) — used by xref/object streams. */
  private def unpredict(data: Array[Byte], parm: Option[PDict], resolve: Obj => Obj): Array[Byte] = {
    val p = parm.flatMap(_.get("Predictor")).map(resolve)
      .collect { case PNum(v) => v.toInt }.getOrElse(1)
    if (p < 10) return data // 1 = none, 2 = TIFF (not emitted by any writer here)
    val columns = parm.flatMap(_.get("Columns")).map(resolve)
      .collect { case PNum(v) => v.toInt }.getOrElse(1)
    val colors = parm.flatMap(_.get("Colors")).map(resolve)
      .collect { case PNum(v) => v.toInt }.getOrElse(1)
    val bpc = parm.flatMap(_.get("BitsPerComponent")).map(resolve)
      .collect { case PNum(v) => v.toInt }.getOrElse(8)
    val bpp = math.max(1, colors * bpc / 8)
    val rowLen = (columns * colors * bpc + 7) / 8
    val out = new java.io.ByteArrayOutputStream()
    val prev = new Array[Byte](rowLen)
    var i = 0
    while (i < data.length) {
      val ft = data(i) & 0xFF; i += 1
      val row = new Array[Byte](rowLen)
      val avail = math.min(rowLen, data.length - i)
      System.arraycopy(data, i, row, 0, avail); i += avail
      var j = 0
      while (j < rowLen) {
        val left = if (j >= bpp) row(j - bpp) & 0xFF else 0
        val up = prev(j) & 0xFF
        val ul = if (j >= bpp) prev(j - bpp) & 0xFF else 0
        val raw = row(j) & 0xFF
        val v = ft match {
          case 0 => raw
          case 1 => raw + left
          case 2 => raw + up
          case 3 => raw + (left + up) / 2
          case 4 =>
            val pp = left + up - ul
            val pa = math.abs(pp - left); val pb = math.abs(pp - up); val pc = math.abs(pp - ul)
            raw + (if (pa <= pb && pa <= pc) left else if (pb <= pc) up else ul)
          case other => sys.error(s"bad PNG predictor filter type $other")
        }
        row(j) = (v & 0xFF).toByte
        j += 1
      }
      out.write(row)
      System.arraycopy(row, 0, prev, 0, rowLen)
    }
    out.toByteArray
  }

  // --------------------------------------------------- ToUnicode CMaps

  /** A parsed `/ToUnicode` CMap (PDF 32000-1 §9.10.3): codespace
    * byte-lengths plus code → unicode mappings. Composite/CID fonts
    * (Identity-H et al.) carry 2-byte codes; simple fonts with a
    * ToUnicode carry 1-byte codes — both decode through the same
    * structure. */
  final class ToUnicode(ranges: Seq[(Int, Long, Long)],
                        map: Map[(Int, Long), String]) {
    // no codespacerange section (technically malformed, produced by
    // some generators): assume the Identity-H 2-byte space
    private val spaces: Seq[(Int, Long, Long)] =
      if (ranges.nonEmpty) ranges else Seq((2, 0L, 0xFFFFL))
    private val lens: Seq[Int] = spaces.map(_._1).distinct.sorted

    /** Decode one show string. Per position, the shortest codespace
      * length whose range contains the prefix wins (codespace ranges
      * are prefix-disjoint by construction); a code the codespace
      * covers but the CMap leaves unmapped contributes NO text (the
      * glyph has no text meaning — pdftotext's convention); a prefix
      * matching no range consumes the SMALLEST declared codespace
      * width (Latin-1 if single-byte) so one malformed code cannot
      * shift the frame of the remaining string — in a 2-byte
      * Identity-H stream a 1-byte fallback would desynchronize every
      * subsequent code onto odd offsets. */
    def decode(b: Array[Byte]): String = {
      val sb = new StringBuilder
      var i = 0
      while (i < b.length) {
        var taken = 0
        val it = lens.iterator
        while (taken == 0 && it.hasNext) {
          val len = it.next()
          if (i + len <= b.length) {
            val code = codeValue(b, i, len)
            if (spaces.exists(r => r._1 == len && code >= r._2 && code <= r._3)) {
              map.get((len, code)).foreach(sb.append(_))
              taken = len
            }
          }
        }
        if (taken == 0) {
          taken = lens.headOption.getOrElse(1)
          if (taken == 1) sb.append((b(i) & 0xFF).toChar)
          // multi-byte out-of-codespace codes contribute no text but
          // keep the stream framed
        }
        i += taken
      }
      sb.toString
    }
  }

  /** Big-endian integer value of `len` bytes at `off`. */
  private def codeValue(b: Array[Byte], off: Int, len: Int): Long = {
    var v = 0L; var k = 0
    while (k < len) { v = (v << 8) | (b(off + k) & 0xFF); k += 1 }
    v
  }

  /** A bfrange span is bounded (a crafted CMap must not inflate the
    * mapping table past the 2-byte space it can address). */
  private val MaxBfRangeSpan = 0x10000L

  /** Parse a decoded ToUnicode CMap stream. Tokenized with the same
    * content-mode lexer as page streams (the CMap operators are bare
    * identifiers, codes and destinations hex strings), so no second
    * parser: `begincodespacerange <lo> <hi> ... end...` fixes the
    * code byte-widths, `beginbfchar <code> <dst>` maps single codes,
    * `beginbfrange <lo> <hi> <dst|[dsts]>` maps spans — the compact
    * form increments the destination's LAST UTF-16 code unit, per
    * spec. Destinations are UTF-16BE. Unknown operators (the CMap's
    * PostScript dict/def scaffolding) are skipped. */
  def parseToUnicode(cmap: Array[Byte]): ToUnicode = {
    val p = new Parser(cmap, 0, cmap.length, contentMode = true)
    val ranges = Seq.newBuilder[(Int, Long, Long)]
    val map = scala.collection.mutable.Map[(Int, Long), String]()
    def utf16(b: Array[Byte]): String = new String(b, StandardCharsets.UTF_16BE)
    var mode: String = null
    val pend = scala.collection.mutable.ArrayBuffer[Obj]()
    def flushIfComplete(): Unit = mode match {
      case "codespace" if pend.size == 2 =>
        (pend(0), pend(1)) match {
          case (PStr(lo), PStr(hi)) if lo.length == hi.length && lo.nonEmpty =>
            ranges += ((lo.length, codeValue(lo, 0, lo.length),
              codeValue(hi, 0, hi.length)))
          case _ =>
        }
        pend.clear()
      case "bfchar" if pend.size == 2 =>
        (pend(0), pend(1)) match {
          case (PStr(code), PStr(dst)) if code.nonEmpty =>
            map((code.length, codeValue(code, 0, code.length))) = utf16(dst)
          case _ =>
        }
        pend.clear()
      case "bfrange" if pend.size == 3 =>
        (pend(0), pend(1), pend(2)) match {
          case (PStr(lo), PStr(hi), dst) if lo.length == hi.length && lo.nonEmpty =>
            val len = lo.length
            val l = codeValue(lo, 0, len)
            val h = math.min(codeValue(hi, 0, len), l + MaxBfRangeSpan)
            dst match {
              case PStr(d) =>
                val base = utf16(d)
                var c = l
                while (c <= h) {
                  map((len, c)) =
                    if (base.isEmpty) ""
                    else base.init + (base.last + (c - l)).toChar
                  c += 1
                }
              case PArr(items) =>
                items.zipWithIndex.foreach {
                  case (PStr(d), k) if l + k <= h => map((len, l + k)) = utf16(d)
                  case _ =>
                }
              case _ =>
            }
          case _ =>
        }
        pend.clear()
      case _ =>
    }
    while (!p.atEnd) {
      (try p.next() catch { case _: Exception => p.pos = p.end; PNull }) match {
        case POp("begincodespacerange") => mode = "codespace"; pend.clear()
        case POp("beginbfchar") => mode = "bfchar"; pend.clear()
        case POp("beginbfrange") => mode = "bfrange"; pend.clear()
        case POp(op) if op.startsWith("end") => mode = null; pend.clear()
        case POp(_) => pend.clear() // scaffolding op: drop its operands
        case o if mode != null => pend += o; flushIfComplete()
        case _ => // operand outside a begin-section: scaffolding
      }
    }
    new ToUnicode(ranges.result(), map.toMap)
  }

  // ------------------------------------------------------- text extract

  /** Decode a PDF *text string* (title etc.): UTF-16BE with BOM,
    * UTF-8 with BOM (PDF 2.0), else PDFDocEncoding ≈ Latin-1. */
  def textString(b: Array[Byte]): String =
    if (b.length >= 2 && (b(0) & 0xFF) == 0xFE && (b(1) & 0xFF) == 0xFF)
      new String(b, 2, b.length - 2, StandardCharsets.UTF_16BE)
    else if (b.length >= 3 && (b(0) & 0xFF) == 0xEF && (b(1) & 0xFF) == 0xBB && (b(2) & 0xFF) == 0xBF)
      new String(b, 3, b.length - 3, StandardCharsets.UTF_8)
    else new String(b, StandardCharsets.ISO_8859_1)

  /** Show-string bytes → text: through the active font's ToUnicode
    * CMap when it has one, else Latin-1 (the documented
    * no-CMap limit). */
  private def showString(b: Array[Byte], font: Option[ToUnicode]): String =
    font match {
      case Some(tu) => tu.decode(b)
      case None => new String(b, StandardCharsets.ISO_8859_1)
    }

  /** Kern adjustments at or past this (thousandths of an em, negative
    * moves right-ward gap wider) read as an inter-word space. */
  val KernSpaceThreshold: Double = 180.0

  /** Extract the text of one content stream. Line discipline: `T*`,
    * `'`, `"`, and `Td`/`TD` with a vertical component append a
    * newline; `Tm` after the first positioning in a text object does
    * too (a matrix reset is a line move in every generator that emits
    * it); consecutive shows on one line concatenate. */
  def contentText(content: Array[Byte],
                  fonts: Map[String, ToUnicode] = Map.empty): String = {
    val p = new Parser(content, 0, content.length, contentMode = true)
    val operands = scala.collection.mutable.ArrayBuffer[Obj]()
    val sb = new StringBuilder
    var positioned = false // saw a positioning op in this text object
    var curFont: Option[ToUnicode] = None // set by Tf from the page fonts
    // every line op is a REAL advance: consecutive `T*`s produce a
    // blank line (the writers' paragraph separator), so no deduping
    def newline(): Unit =
      if (sb.nonEmpty) sb.append('\n')
    def show(o: Obj): Unit = o match {
      case PStr(b) => sb.append(showString(b, curFont))
      case _ =>
    }
    while (!p.atEnd) {
      p.next() match {
        case POp(op) =>
          op match {
            case "BT" => positioned = false
            case "ET" => newline()
            case "Tj" => operands.lastOption.foreach(show)
            case "'" => newline(); operands.lastOption.foreach(show)
            case "\"" => newline(); operands.lastOption.foreach(show)
            case "TJ" => operands.lastOption match {
              case Some(PArr(items)) => items.foreach {
                case s: PStr => show(s)
                case PNum(adj) if adj <= -KernSpaceThreshold =>
                  if (sb.nonEmpty && sb.last != ' ' && sb.last != '\n') sb.append(' ')
                case _ =>
              }
              case _ =>
            }
            case "Td" | "TD" =>
              val ty = operands.lastOption.collect { case PNum(v) => v }.getOrElse(0.0)
              if (ty != 0.0) newline()
              positioned = true
            case "T*" => newline()
            case "Tm" =>
              if (positioned) newline()
              positioned = true
            case "Tf" => // `/F1 12 Tf`: switch the active show decoder
              curFont = operands.collectFirst { case PName(n) => n }
                .flatMap(fonts.get)
            case _ => // Tc, Tw, graphics ops: no text effect
          }
          operands.clear()
        case operand => operands += operand
      }
    }
    sb.toString
  }

  /** Whole-document text: pages joined by a blank line (page break =
    * paragraph break), plus the /Info /Title. */
  def extractText(bytes: Array[Byte]): (String, Option[String], Int) = {
    val doc = new Document(bytes)
    val pages = doc.pages
    val text = pages
      .map(pg => contentText(doc.pageContent(pg), doc.pageFonts(pg)).trim)
      .filter(_.nonEmpty).mkString("\n\n")
    (text, doc.title, pages.size)
  }

  // ------------------------------------------------------------- writer

  /** Minimal *valid* PDF writer — the round-trip complement of the
    * extractor and the q84 gate's input builder (mirrors
    * [[DocExtract.docxBytes]] / [[XlsxSource.writeBytes]]): real xref
    * table with byte-exact offsets, Helvetica/WinAnsi page font, one
    * page per element of `pages`, each paragraph's lines shown with
    * `Tj` + `T*` and paragraphs separated by a blank `T*` line. Content
    * streams are Flate-compressed by default so the reader's inflate
    * path is exercised on every round trip. Text is limited to Latin-1
    * (the simple-font byte-string space); anything else fails loudly
    * rather than silently mangling. */
  def pdfBytes(pages: Seq[Seq[String]], title: Option[String] = None,
               compress: Boolean = true): Array[Byte] = {
    def esc(s: String): String = {
      val out = new StringBuilder
      s.foreach { c =>
        require(c.toInt <= 0xFF,
          s"pdfBytes is limited to Latin-1 text (got U+${"%04X".format(c.toInt)})")
        c match {
          case '(' => out.append("\\(")
          case ')' => out.append("\\)")
          case '\\' => out.append("\\\\")
          case c if c < 32 || c > 126 => out.append(f"\\${c.toInt}%03o")
          case c => out.append(c)
        }
      }
      out.toString
    }

    val nPages = math.max(pages.size, 0)
    // object numbering: 1 catalog, 2 pages, 3 font, [4..] page+content
    // pairs, then optional info
    val objs = scala.collection.mutable.ArrayBuffer[(Int, Array[Byte])]()
    def latin1(s: String) = s.getBytes(StandardCharsets.ISO_8859_1)

    val kidRefs = (0 until nPages).map(i => s"${4 + 2 * i} 0 R").mkString(" ")
    objs += 1 -> latin1("<< /Type /Catalog /Pages 2 0 R >>")
    objs += 2 -> latin1(s"<< /Type /Pages /Kids [ $kidRefs ] /Count $nPages >>")
    objs += 3 -> latin1("<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica /Encoding /WinAnsiEncoding >>")
    pages.zipWithIndex.foreach { case (paras, i) =>
      val pageNum = 4 + 2 * i
      val contNum = pageNum + 1
      objs += pageNum -> latin1(
        s"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] " +
          s"/Resources << /Font << /F1 3 0 R >> >> /Contents $contNum 0 R >>")
      val body = new StringBuilder("BT /F1 12 Tf 72 720 Td 14 TL\n")
      paras.zipWithIndex.foreach { case (para, pi) =>
        if (pi > 0) body.append("T*\n") // blank line between paragraphs
        para.split("\n", -1).foreach { line =>
          body.append(s"(${esc(line)}) Tj T*\n")
        }
      }
      body.append("ET")
      val raw = latin1(body.toString)
      val data = if (compress) deflate(raw) else raw
      val filter = if (compress) " /Filter /FlateDecode" else ""
      val head = latin1(s"<< /Length ${data.length}$filter >>\nstream\n")
      val tail = latin1("\nendstream")
      objs += contNum -> (head ++ data ++ tail)
    }
    val infoNum = 4 + 2 * nPages
    title.foreach(t => objs += infoNum -> latin1(s"<< /Title (${esc(t)}) >>"))
    assemble(objs.toSeq, title.map(_ => infoNum))
  }

  /** Serialize numbered objects + xref + trailer (shared by both
    * writers). Object 1 is the catalog by convention. */
  private def assemble(objs: Seq[(Int, Array[Byte])],
                       infoNum: Option[Int]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def w(s: String): Unit = out.write(s.getBytes(StandardCharsets.ISO_8859_1))
    w("%PDF-1.4\n%âãÏÓ\n")
    val offsets = scala.collection.mutable.Map[Int, Int]()
    objs.foreach { case (num, body) =>
      offsets(num) = out.size()
      w(s"$num 0 obj\n"); out.write(body); w("\nendobj\n")
    }
    val xrefPos = out.size()
    val maxNum = objs.map(_._1).max
    w(s"xref\n0 ${maxNum + 1}\n")
    w("0000000000 65535 f \n")
    (1 to maxNum).foreach { n =>
      w(offsets.get(n).map(o => f"$o%010d 00000 n \n").getOrElse("0000000000 65535 f \n"))
    }
    w(s"trailer\n<< /Size ${maxNum + 1} /Root 1 0 R" +
      infoNum.map(n => s" /Info $n 0 R").getOrElse("") + " >>\n")
    w(s"startxref\n$xrefPos\n%%EOF\n")
    out.toByteArray
  }

  /** CID-font writer — the round-trip complement of the ToUnicode
    * reader, shaped like real Word/LaTeX output: a `/Type0`
    * `/Identity-H` composite font whose 2-byte show-string codes are
    * deliberately OFFSET from the unicode they map to (code ≠ char
    * value), so a Latin-1 fallback visibly garbles the text and only
    * the `/ToUnicode` CMap recovers it. Half the mappings emit as
    * `bfchar` entries, the rest as array-destination `bfrange` spans,
    * so a round-trip exercises both CMap operators. Text may be any
    * BMP unicode (umlauts included — the fixture the reference's
    * German office-PDF corpus needs). */
  def pdfBytesCid(pages: Seq[Seq[String]], title: Option[String] = None,
                  compress: Boolean = true): Array[Byte] = {
    def latin1(s: String) = s.getBytes(StandardCharsets.ISO_8859_1)
    val distinct = pages.flatten.flatMap(_.toSeq).filter(_ != '\n').distinct
    require(distinct.forall(c => c >= ' ' && !c.isSurrogate),
      "pdfBytesCid text must be BMP, no control chars")
    require(distinct.size <= 0xFE00, "too many distinct glyphs for one font")
    val code: Map[Char, Int] =
      distinct.sorted.zipWithIndex.map { case (c, i) => c -> (0x0100 + i) }.toMap
    def hx(line: String): String =
      line.map(c => f"${code(c)}%04X").mkString

    val entries = code.toSeq.map { case (ch, co) => co -> ch }.sortBy(_._1)
    val (chars, ranged) = entries.splitAt(math.max(entries.size / 2, 1))
    val cm = new StringBuilder
    cm.append("/CIDInit /ProcSet findresource begin\n12 dict begin\nbegincmap\n")
      .append("/CMapName /Graft-UCS def\n/CMapType 2 def\n")
      .append("1 begincodespacerange\n<0000> <FFFF>\nendcodespacerange\n")
    if (chars.nonEmpty) {
      cm.append(s"${chars.size} beginbfchar\n")
      chars.foreach { case (co, ch) =>
        cm.append(f"<$co%04X> <${ch.toInt}%04X>\n")
      }
      cm.append("endbfchar\n")
    }
    // codes are consecutive by construction, so each group is one
    // contiguous span with an explicit destination array
    ranged.grouped(100).foreach { grp =>
      cm.append("1 beginbfrange\n")
        .append(f"<${grp.head._1}%04X> <${grp.last._1}%04X> [")
        .append(grp.map { case (_, ch) => f"<${ch.toInt}%04X>" }.mkString(" "))
        .append("]\nendbfrange\n")
    }
    cm.append("endcmap\nCMapName currentdict /CMap defineresource pop\nend\nend\n")
    val cmapRaw = latin1(cm.toString)
    val cmapData = if (compress) deflate(cmapRaw) else cmapRaw
    val cmapFilter = if (compress) " /Filter /FlateDecode" else ""

    val nPages = pages.size
    // numbering: 1 catalog, 2 pages, 3 font, 4 descendant, 5 ToUnicode,
    // [6..] page+content pairs, then optional info
    val objs = scala.collection.mutable.ArrayBuffer[(Int, Array[Byte])]()
    val kidRefs = (0 until nPages).map(i => s"${6 + 2 * i} 0 R").mkString(" ")
    objs += 1 -> latin1("<< /Type /Catalog /Pages 2 0 R >>")
    objs += 2 -> latin1(s"<< /Type /Pages /Kids [ $kidRefs ] /Count $nPages " +
      "/Resources << /Font << /F1 3 0 R >> >> >>") // INHERITED by leaves
    objs += 3 -> latin1("<< /Type /Font /Subtype /Type0 /BaseFont /GraftCID " +
      "/Encoding /Identity-H /DescendantFonts [ 4 0 R ] /ToUnicode 5 0 R >>")
    objs += 4 -> latin1("<< /Type /Font /Subtype /CIDFontType2 /BaseFont /GraftCID " +
      "/CIDSystemInfo << /Registry (Adobe) /Ordering (Identity) /Supplement 0 >> >>")
    objs += 5 -> (latin1(s"<< /Length ${cmapData.length}$cmapFilter >>\nstream\n") ++
      cmapData ++ latin1("\nendstream"))
    pages.zipWithIndex.foreach { case (paras, i) =>
      val pageNum = 6 + 2 * i
      val contNum = pageNum + 1
      // NO page-level /Resources: exercises the §7.7.3.4 inheritance
      objs += pageNum -> latin1(
        s"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] /Contents $contNum 0 R >>")
      val body = new StringBuilder("BT /F1 12 Tf 72 720 Td 14 TL\n")
      paras.zipWithIndex.foreach { case (para, pi) =>
        if (pi > 0) body.append("T*\n")
        para.split("\n", -1).foreach(line => body.append(s"<${hx(line)}> Tj T*\n"))
      }
      body.append("ET")
      val raw = latin1(body.toString)
      val data = if (compress) deflate(raw) else raw
      val filter = if (compress) " /Filter /FlateDecode" else ""
      objs += contNum -> (latin1(s"<< /Length ${data.length}$filter >>\nstream\n") ++
        data ++ latin1("\nendstream"))
    }
    val infoNum = 6 + 2 * nPages
    title.foreach { t =>
      // titles ride a UTF-16BE hex string so they too survive non-Latin-1
      val hex = ("FEFF" + t.flatMap(c => f"${c.toInt}%04X")).toUpperCase
      objs += infoNum -> latin1(s"<< /Title <$hex> >>")
    }
    assemble(objs.toSeq, title.map(_ => infoNum))
  }

  /** Single-page, paragraph-list convenience. */
  def pdfBytes(paras: Seq[String]): Array[Byte] = pdfBytes(Seq(paras))

  /** Single plain paragraph convenience (the q84 corpus shape). */
  def pdfBytes(text: String): Array[Byte] = pdfBytes(Seq(Seq(text)))

  def deflate(data: Array[Byte]): Array[Byte] = {
    val d = new java.util.zip.Deflater()
    d.setInput(data); d.finish()
    val out = new java.io.ByteArrayOutputStream(math.max(64, data.length / 2))
    val buf = new Array[Byte](64 * 1024)
    while (!d.finished()) {
      val n = d.deflate(buf)
      out.write(buf, 0, n)
    }
    d.end()
    out.toByteArray
  }
}
