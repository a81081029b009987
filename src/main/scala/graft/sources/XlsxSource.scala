package graft.sources

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** Zero-egress XLSX source — the reference's `Abfall_ABC.xlsx` /
  * `AVV_Katalog.xlsx` catalog inputs (`/root/reference/README.md:122-127`)
  * read natively instead of via CSV export: an .xlsx is a ZIP of XML
  * parts, so JDK-builtin `java.util.zip` + StAX (`javax.xml.stream`)
  * parse it with no added dependency.
  *
  * Spark shape: files load through the `binaryFile` source (Catalyst
  * handles listing/pruning/bin-packing), each file parses inside one
  * task (`flatMap` over file rows — the per-partition imperative case
  * RDDs exist for), and only string cells flow on; the ZIP bytes never
  * shuffle. Catalog workbooks are dimension-sized, so the driver peeks
  * ONE file for the header and broadcasts nothing else.
  *
  * Cell semantics: shared strings (incl. multi-run rich text,
  * concatenated), inline strings, cached formula strings, booleans
  * ("true"/"false"), numbers as their raw stored form (no float
  * reformatting), sparse rows padded with nulls from the `r="B3"` cell
  * references. Values surface as nullable strings; typing is the
  * caller's schema contract, same as the CSV sources.
  */
object XlsxSource {

  /** "BC23" → 0-based column index 54. */
  private[sources] def colIndex(ref: String): Int = {
    var i = 0; var acc = 0
    while (i < ref.length && ref(i).isLetter) { acc = acc * 26 + (ref(i).toUpper - 'A' + 1); i += 1 }
    math.max(acc - 1, 0)
  }

  /** Decompression bounds (zip-bomb guard) — see [[Ooxml]], shared with
    * the DOCX extractor. Re-exported for the specs. */
  private[sources] def MaxEntryBytes: Long = Ooxml.MaxEntryBytes
  private[sources] def MaxTotalBytes: Long = Ooxml.MaxTotalBytes

  private def zipEntries(bytes: Array[Byte]): Map[String, Array[Byte]] =
    Ooxml.zipEntries(bytes)

  private def stax(bytes: Array[Byte]) = Ooxml.stax(bytes)

  /** sharedStrings.xml → indexed strings; rich-text runs concatenate.
    * Phonetic guide subtrees (`<rPh>`/`<phoneticPr>` — furigana
    * annotations Excel stores NEXT to the cell text) are skipped, so a
    * Japanese workbook's cell values don't get their reading glosses
    * concatenated in. */
  private def sharedStrings(bytes: Array[Byte]): Vector[String] = {
    val r = stax(bytes)
    val out = Vector.newBuilder[String]
    var cur: StringBuilder = null
    var inT = false
    var phoneticDepth = 0
    while (r.hasNext) {
      r.next() match {
        case javax.xml.stream.XMLStreamConstants.START_ELEMENT =>
          r.getLocalName match {
            case "rPh" | "phoneticPr" => phoneticDepth += 1
            case _ if phoneticDepth > 0 =>
            case "si" => cur = new StringBuilder
            case "t" if cur != null => inT = true
            case _ =>
          }
        case javax.xml.stream.XMLStreamConstants.CHARACTERS if inT && phoneticDepth == 0 =>
          cur.append(r.getText)
        case javax.xml.stream.XMLStreamConstants.END_ELEMENT =>
          r.getLocalName match {
            case "rPh" | "phoneticPr" => phoneticDepth -= 1
            case _ if phoneticDepth > 0 =>
            case "t" => inT = false
            case "si" => out += cur.toString; cur = null
            case _ =>
          }
        case _ =>
      }
    }
    r.close()
    out.result()
  }

  /** workbook.xml + its rels → ordered (sheetName, partPath). */
  private def sheetTable(parts: Map[String, Array[Byte]]): Seq[(String, String)] = {
    val rels: Map[String, String] = parts.get("xl/_rels/workbook.xml.rels").map { b =>
      val r = stax(b)
      val m = Map.newBuilder[String, String]
      while (r.hasNext) {
        if (r.next() == javax.xml.stream.XMLStreamConstants.START_ELEMENT &&
            r.getLocalName == "Relationship") {
          val id = r.getAttributeValue(null, "Id")
          val target = r.getAttributeValue(null, "Target")
          val norm =
            if (target.startsWith("/")) target.stripPrefix("/")
            else "xl/" + target
          m += (id -> norm)
        }
      }
      r.close(); m.result()
    }.getOrElse(Map.empty)
    val wb = parts.getOrElse("xl/workbook.xml", sys.error("xl/workbook.xml missing: not an xlsx"))
    val r = stax(wb)
    val out = Seq.newBuilder[(String, String)]
    while (r.hasNext) {
      if (r.next() == javax.xml.stream.XMLStreamConstants.START_ELEMENT &&
          r.getLocalName == "sheet") {
        val name = r.getAttributeValue(null, "name")
        var rid: String = null
        var i = 0
        while (i < r.getAttributeCount) { // r:id is namespaced; match local name
          if (r.getAttributeLocalName(i) == "id") rid = r.getAttributeValue(i)
          i += 1
        }
        rels.get(rid).foreach(p => out += (name -> p))
      }
    }
    r.close()
    out.result()
  }

  /** One worksheet part → rows of sparse-padded Option[String] cells. */
  private def parseWorksheet(bytes: Array[Byte], shared: Vector[String]): Seq[Seq[Option[String]]] = {
    val r = stax(bytes)
    val rows = Seq.newBuilder[Seq[Option[String]]]
    var cells: mutable.ArrayBuffer[Option[String]] = null
    var cellCol = -1
    var cellType = ""
    var inV = false
    var inIs = false
    var buf: StringBuilder = null
    def put(idx: Int, v: Option[String]): Unit = {
      while (cells.length <= idx) cells += None
      cells(idx) = v
    }
    while (r.hasNext) {
      r.next() match {
        case javax.xml.stream.XMLStreamConstants.START_ELEMENT =>
          r.getLocalName match {
            case "row" => cells = mutable.ArrayBuffer.empty
            case "c" =>
              val ref = r.getAttributeValue(null, "r")
              cellCol = if (ref != null) colIndex(ref) else cells.length
              cellType = Option(r.getAttributeValue(null, "t")).getOrElse("")
              buf = new StringBuilder
            case "v" => inV = true
            case "is" => inIs = true
            case "t" if inIs => inV = true // inline-string text runs
            case _ =>
          }
        case javax.xml.stream.XMLStreamConstants.CHARACTERS if inV =>
          buf.append(r.getText)
        case javax.xml.stream.XMLStreamConstants.END_ELEMENT =>
          r.getLocalName match {
            case "v" => inV = false
            case "t" if inIs => inV = false
            case "is" => inIs = false
            case "c" =>
              val raw = buf.toString
              val value = cellType match {
                case "s" => // writers emit empty styled cells as <c t="s"/>
                  if (raw.trim.isEmpty) None else shared.lift(raw.trim.toInt)
                case "b" => Some(if (raw.trim == "1") "true" else "false")
                case _ => if (raw.isEmpty) None else Some(raw)
              }
              put(cellCol, value)
            case "row" => rows += cells.toSeq; cells = null
            case _ =>
          }
        case _ =>
      }
    }
    r.close()
    rows.result()
  }

  /** All rows of one sheet of one workbook's bytes. `sheet` empty =
    * first sheet; otherwise matched by name. */
  def parseSheet(bytes: Array[Byte], sheet: String = ""): Seq[Seq[Option[String]]] = {
    val parts = zipEntries(bytes)
    val shared = parts.get("xl/sharedStrings.xml").map(sharedStrings).getOrElse(Vector.empty)
    val sheets = sheetTable(parts)
    require(sheets.nonEmpty, "workbook declares no sheets")
    val part = (if (sheet.isEmpty) sheets.headOption
                else sheets.find(_._1 == sheet))
      .map(_._2)
      .getOrElse(sys.error(
        s"sheet '$sheet' not found; workbook has ${sheets.map(_._1).mkString(", ")}"))
    parseWorksheet(parts.getOrElse(part, sys.error(s"missing worksheet part $part")), shared)
  }

  /** Sheet names of one workbook, in workbook order. */
  def sheetNames(bytes: Array[Byte]): Seq[String] =
    sheetTable(zipEntries(bytes)).map(_._1)

  private def xmlEscape(s: String): String = Ooxml.xmlEscape(s)

  /** Minimal single-sheet xlsx writer (inline-string cells): the
    * dimension-table export complement of the reader and the write side
    * of the q82 round-trip gate. Builds bytes on the driver — use for
    * dim-sized tables; big tables belong in parquet. Null cells are
    * skipped (sparse), so a read-back reproduces them as nulls. */
  def writeBytes(rows: Seq[Seq[String]], sheetName: String = "Sheet1"): Array[Byte] = {
    def colRef(i: Int): String = {
      var n = i + 1; val sb = new StringBuilder
      while (n > 0) { val r = (n - 1) % 26; sb.insert(0, ('A' + r).toChar); n = (n - 1) / 26 }
      sb.toString
    }
    val sheetXml = new StringBuilder
    sheetXml.append("""<?xml version="1.0" encoding="UTF-8"?>""")
      .append("""<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>""")
    rows.zipWithIndex.foreach { case (cells, ri) =>
      sheetXml.append(s"""<row r="${ri + 1}">""")
      cells.zipWithIndex.foreach { case (v, ci) =>
        if (v != null)
          sheetXml.append(s"""<c r="${colRef(ci)}${ri + 1}" t="inlineStr"><is><t>""")
            .append(xmlEscape(v)).append("</t></is></c>")
      }
      sheetXml.append("</row>")
    }
    sheetXml.append("</sheetData></worksheet>")
    val bos = new java.io.ByteArrayOutputStream()
    val z = new java.util.zip.ZipOutputStream(bos)
    def entry(name: String, content: String): Unit = {
      z.putNextEntry(new java.util.zip.ZipEntry(name))
      z.write(content.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      z.closeEntry()
    }
    // valid OOXML for external consumers (Excel/LibreOffice/openpyxl):
    // declared content types, root package rels, real relationship type
    entry("[Content_Types].xml",
      """<?xml version="1.0" encoding="UTF-8"?><Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types"><Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/><Default Extension="xml" ContentType="application/xml"/><Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/><Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/></Types>""")
    entry("_rels/.rels",
      """<?xml version="1.0" encoding="UTF-8"?><Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships"><Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/></Relationships>""")
    entry("xl/workbook.xml",
      s"""<?xml version="1.0" encoding="UTF-8"?><workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships"><sheets><sheet name="${xmlEscape(sheetName)}" sheetId="1" r:id="rId1"/></sheets></workbook>""")
    entry("xl/_rels/workbook.xml.rels",
      """<?xml version="1.0" encoding="UTF-8"?><Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships"><Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/></Relationships>""")
    entry("xl/worksheets/sheet1.xml", sheetXml.toString)
    z.close()
    bos.toByteArray
  }

  /** Distributed sheet writer: one .xlsx part file per partition, each
    * with its own header row ([[read]] drops one header per file), so
    * a fact-sized export never funnels through the driver — the scale
    * path [[writeBytes]] is not. Files land through the Hadoop
    * FileSystem API (file:// locally, HDFS/object stores on a
    * cluster); retried tasks overwrite their own part deterministically.
    *
    * XLSX remains an export format (Excel caps a sheet at ~1M rows):
    * each task materializes its partition's rows to deflate the OOXML
    * parts, so size partitions upstream (`repartition(n)`). All cells
    * are written as strings (the reader's contract); nulls are sparse
    * cells and round-trip as nulls. Empty partitions write no file. */
  def write(df: DataFrame, dir: String, sheetName: String = "Sheet1"): Unit = {
    val names = df.columns.toSeq
    val strDf = df.select(names.map(c => col(c).cast("string")): _*)
    strDf.foreachPartition { (it: Iterator[Row]) =>
      if (it.hasNext) {
        val rows = names +: it.map(r =>
          names.indices.map(r.getString): Seq[String]).toSeq
        val bytes = writeBytes(rows, sheetName)
        val path = new org.apache.hadoop.fs.Path(dir,
          f"part-${org.apache.spark.TaskContext.getPartitionId()}%05d.xlsx")
        val fs = path.getFileSystem(new org.apache.hadoop.conf.Configuration())
        val out = fs.create(path, true)
        try out.write(bytes) finally out.close()
      }
    }
  }

  /** Read every .xlsx under `path` (glob ok) as one DataFrame of the
    * named sheet. Header row of the first file (by path order) names
    * the all-string nullable columns; each file's own header row is
    * dropped when `header`. */
  def read(spark: SparkSession, path: String, sheet: String = "",
           header: Boolean = true): DataFrame = {
    val bin = spark.read.format("binaryFile").load(path)
      .select(col("path"), col("content"))
    // header file chosen by sorting PATHS only — sorting `bin` itself
    // would range-shuffle every workbook's raw bytes for no reason
    val firstPath = bin.select("path").orderBy("path").limit(1)
      .collect().headOption.map(_.getString(0))
      .getOrElse(sys.error(s"no files at $path"))
    val firstRows = parseSheet(
      bin.filter(col("path") === firstPath).select("content")
        .head().getAs[Array[Byte]](0), sheet)
    require(firstRows.nonEmpty, "empty worksheet")
    val width = firstRows.map(_.length).max
    val names: Seq[String] =
      if (header) firstRows.head.zipWithIndex.map {
        case (c, i) => c.map(_.trim).filter(_.nonEmpty).getOrElse(s"_c$i")
      }.padTo(width, "").zipWithIndex.map { case (n, i) => if (n.isEmpty) s"_c$i" else n }
      else (0 until width).map(i => s"_c$i")
    val schema = StructType(names.map(n => StructField(n, StringType, nullable = true)))
    val n = names.length
    val drop = if (header) 1 else 0
    val rows = bin.rdd.flatMap { r =>
      parseSheet(r.getAs[Array[Byte]]("content"), sheet).drop(drop).map { cs =>
        Row.fromSeq(cs.padTo(n, None).take(n).map(_.orNull))
      }
    }
    spark.createDataFrame(rows, schema)
  }
}
