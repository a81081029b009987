package graft.sources

import java.io.ByteArrayInputStream
import java.util.zip.ZipInputStream

/** Shared OOXML container machinery for the zero-egress Office sources
  * ([[XlsxSource]], [[DocExtract.DocxExtractor]]): an .xlsx/.docx is a
  * ZIP of XML parts, so JDK-builtin `java.util.zip` + StAX
  * (`javax.xml.stream`) read the whole family with no added dependency.
  *
  * Both knobs here exist because workbook/document bytes are UNTRUSTED
  * input: decompression is bounded (zip-bomb guard) and the XML reader
  * resolves no DTDs or external entities (XXE guard).
  */
private[sources] object Ooxml {

  /** Decompression bounds: a crafted ZIP can declare tiny compressed
    * entries that inflate without limit and OOM the executor mid-task.
    * Any real catalog workbook or document's XML parts sit far below
    * these; a hostile one fails with a clear error instead of taking
    * the JVM down. */
  val MaxEntryBytes: Long = 256L * 1024 * 1024
  val MaxTotalBytes: Long = 1024L * 1024 * 1024

  /** Every non-directory entry of the package, bounded-inflated. */
  def zipEntries(bytes: Array[Byte]): Map[String, Array[Byte]] = {
    val zin = new ZipInputStream(new ByteArrayInputStream(bytes))
    val out = Map.newBuilder[String, Array[Byte]]
    var total = 0L
    val buf = new Array[Byte](64 * 1024)
    var e = zin.getNextEntry
    while (e != null) {
      if (!e.isDirectory) {
        val bos = new java.io.ByteArrayOutputStream()
        var n = zin.read(buf)
        while (n >= 0) {
          bos.write(buf, 0, n)
          total += n
          require(bos.size() <= MaxEntryBytes,
            s"zip entry '${e.getName}' inflates past $MaxEntryBytes bytes: refusing (zip bomb?)")
          require(total <= MaxTotalBytes,
            s"package inflates past $MaxTotalBytes bytes total: refusing (zip bomb?)")
          n = zin.read(buf)
        }
        out += (e.getName -> bos.toByteArray)
      }
      e = zin.getNextEntry
    }
    zin.close()
    out.result()
  }

  /** StAX reader with DTDs and external entities disabled (untrusted
    * XML). */
  def stax(bytes: Array[Byte]): javax.xml.stream.XMLStreamReader = {
    val f = javax.xml.stream.XMLInputFactory.newInstance()
    f.setProperty(javax.xml.stream.XMLInputFactory.SUPPORT_DTD, false)
    f.setProperty(javax.xml.stream.XMLInputFactory.IS_SUPPORTING_EXTERNAL_ENTITIES, false)
    f.createXMLStreamReader(new ByteArrayInputStream(bytes))
  }

  def xmlEscape(s: String): String =
    s.flatMap {
      case '&' => "&amp;"; case '<' => "&lt;"; case '>' => "&gt;"
      case '"' => "&quot;"; case c => c.toString
    }
}
