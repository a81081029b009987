package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.Files
import java.util.zip.{ZipEntry, ZipOutputStream}

import graft.SparkSpec

/** The zero-egress XLSX source against a workbook generated here from
  * the OOXML part structure (ZIP of XML): shared strings incl.
  * rich-text runs, inline strings, numerics kept verbatim, booleans,
  * sparse rows padded from cell refs, sheet selection by name, and the
  * distributed binaryFile read path. The fixture mirrors the
  * reference's `Abfall_ABC.xlsx` / `AVV_Katalog.xlsx` catalog shape
  * (`/root/reference/README.md:122-127`).
  */
class XlsxSourceSpec extends SparkSpec {

  private def entry(z: ZipOutputStream, name: String, xml: String): Unit = {
    z.putNextEntry(new ZipEntry(name))
    z.write(xml.getBytes(StandardCharsets.UTF_8))
    z.closeEntry()
  }

  /** Two-sheet workbook: Abfall_ABC (waste items) + AVV (codes). */
  private def fixtureBytes: Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val z = new ZipOutputStream(bos)
    entry(z, "[Content_Types].xml",
      """<?xml version="1.0" encoding="UTF-8"?>
        |<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types"/>""".stripMargin)
    entry(z, "xl/workbook.xml",
      """<?xml version="1.0" encoding="UTF-8"?>
        |<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"
        | xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">
        | <sheets>
        |  <sheet name="Abfall_ABC" sheetId="1" r:id="rId1"/>
        |  <sheet name="AVV" sheetId="2" r:id="rId2"/>
        | </sheets>
        |</workbook>""".stripMargin)
    entry(z, "xl/_rels/workbook.xml.rels",
      """<?xml version="1.0" encoding="UTF-8"?>
        |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
        | <Relationship Id="rId1" Type="t" Target="worksheets/sheet1.xml"/>
        | <Relationship Id="rId2" Type="t" Target="worksheets/sheet2.xml"/>
        |</Relationships>""".stripMargin)
    // index 2 is a rich-text si: two runs concatenate to "Sperrmüll"
    entry(z, "xl/sharedStrings.xml",
      """<?xml version="1.0" encoding="UTF-8"?>
        |<sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" count="6" uniqueCount="6">
        | <si><t>Abfallart</t></si>
        | <si><t>Entsorgungsweg</t></si>
        | <si><r><t>Sperr</t></r><r><t>müll</t></r></si>
        | <si><t>Wertstoffhof</t></si>
        | <si><t>Altöl</t></si>
        | <si><t>Gefahrstoffannahme</t></si>
        |</sst>""".stripMargin)
    // row 2: full; row 3: sparse (B missing), inline string in C;
    // row 4: numeric + boolean in extra cols beyond the header width
    entry(z, "xl/worksheets/sheet1.xml",
      """<?xml version="1.0" encoding="UTF-8"?>
        |<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">
        | <sheetData>
        |  <row r="1">
        |   <c r="A1" t="s"><v>0</v></c>
        |   <c r="B1" t="s"><v>1</v></c>
        |   <c r="C1" t="inlineStr"><is><t>Hinweis</t></is></c>
        |  </row>
        |  <row r="2">
        |   <c r="A2" t="s"><v>2</v></c>
        |   <c r="B2" t="s"><v>3</v></c>
        |   <c r="C2" t="inlineStr"><is><t>max 2m³</t></is></c>
        |  </row>
        |  <row r="3">
        |   <c r="A3" t="s"><v>4</v></c>
        |   <c r="C3" t="inlineStr"><is><t>nur mit Termin</t></is></c>
        |  </row>
        |  <row r="4">
        |   <c r="A4"><v>170904</v></c>
        |   <c r="B4" t="b"><v>1</v></c>
        |   <c r="C4" t="s"/>
        |  </row>
        | </sheetData>
        |</worksheet>""".stripMargin)
    entry(z, "xl/worksheets/sheet2.xml",
      """<?xml version="1.0" encoding="UTF-8"?>
        |<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">
        | <sheetData>
        |  <row r="1"><c r="A1" t="inlineStr"><is><t>code</t></is></c>
        |             <c r="B1" t="inlineStr"><is><t>gefahr</t></is></c></row>
        |  <row r="2"><c r="A2"><v>200121</v></c>
        |             <c r="B2" t="b"><v>1</v></c></row>
        |  <row r="3"><c r="A3"><v>200301</v></c>
        |             <c r="B3" t="b"><v>0</v></c></row>
        | </sheetData>
        |</worksheet>""".stripMargin)
    z.close()
    bos.toByteArray
  }

  test("parseSheet: shared strings (rich text), inline, sparse, numeric, boolean") {
    val rows = XlsxSource.parseSheet(fixtureBytes)
    assert(rows.length === 4)
    assert(rows(0) === Seq(Some("Abfallart"), Some("Entsorgungsweg"), Some("Hinweis")))
    assert(rows(1) === Seq(Some("Sperrmüll"), Some("Wertstoffhof"), Some("max 2m³")))
    assert(rows(2) === Seq(Some("Altöl"), None, Some("nur mit Termin"))) // B3 absent → null
    // raw numeric, bool; empty styled shared-string cell <c t="s"/> → null
    assert(rows(3) === Seq(Some("170904"), Some("true"), None))
  }

  test("sheet selection by name; unknown sheet errors with the available names") {
    assert(XlsxSource.sheetNames(fixtureBytes) === Seq("Abfall_ABC", "AVV"))
    val avv = XlsxSource.parseSheet(fixtureBytes, "AVV")
    assert(avv.head === Seq(Some("code"), Some("gefahr")))
    assert(avv.length === 3)
    val e = intercept[RuntimeException](XlsxSource.parseSheet(fixtureBytes, "Nope"))
    assert(e.getMessage.contains("Abfall_ABC"))
  }

  test("phonetic guide runs (rPh/phoneticPr) are excluded from shared-string values") {
    val bos = new java.io.ByteArrayOutputStream()
    val z = new ZipOutputStream(bos)
    entry(z, "xl/workbook.xml",
      """<?xml version="1.0" encoding="UTF-8"?>
        |<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"
        | xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">
        | <sheets><sheet name="S" sheetId="1" r:id="rId1"/></sheets>
        |</workbook>""".stripMargin)
    entry(z, "xl/_rels/workbook.xml.rels",
      """<?xml version="1.0" encoding="UTF-8"?>
        |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
        | <Relationship Id="rId1" Type="t" Target="worksheets/sheet1.xml"/>
        |</Relationships>""".stripMargin)
    // Excel stores the furigana reading NEXT to the text; only 東京 is the value
    entry(z, "xl/sharedStrings.xml",
      """<?xml version="1.0" encoding="UTF-8"?>
        |<sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" count="1" uniqueCount="1">
        | <si><t>東京</t><rPh sb="0" eb="2"><t>トウキョウ</t></rPh><phoneticPr fontId="1"/></si>
        |</sst>""".stripMargin)
    entry(z, "xl/worksheets/sheet1.xml",
      """<?xml version="1.0" encoding="UTF-8"?>
        |<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">
        | <sheetData><row r="1"><c r="A1" t="s"><v>0</v></c></row></sheetData>
        |</worksheet>""".stripMargin)
    z.close()
    val rows = XlsxSource.parseSheet(bos.toByteArray)
    assert(rows === Seq(Seq(Some("東京"))))
  }

  test("zip-bomb guard: an entry inflating past the bound fails fast instead of OOMing") {
    val bos = new java.io.ByteArrayOutputStream()
    val z = new ZipOutputStream(bos)
    // highly compressible payload just over the per-entry bound
    val chunk = new Array[Byte](1024 * 1024) // zeros
    z.putNextEntry(new ZipEntry("xl/workbook.xml"))
    var written = 0L
    while (written <= XlsxSource.MaxEntryBytes) { z.write(chunk); written += chunk.length }
    z.closeEntry()
    z.close()
    val e = intercept[IllegalArgumentException](XlsxSource.parseSheet(bos.toByteArray))
    assert(e.getMessage.contains("zip bomb"))
  }

  test("distributed write: one part per partition, round trip through the distributed read") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-xlsx-write").toString
    val df = (1 to 1000).map(i => (i.toLong, s"name_$i", if (i % 7 == 0) null else s"v$i"))
      .toDF("id", "name", "opt")
    XlsxSource.write(df.repartition(4), dir, "Export")
    val parts = new java.io.File(dir).listFiles().filter(_.getName.endsWith(".xlsx"))
    assert(parts.length === 4, "expected one .xlsx part per partition")
    val back = XlsxSource.read(spark, dir + "/*.xlsx", sheet = "Export")
    assert(back.columns.toSeq === Seq("id", "name", "opt"))
    assert(back.count() === 1000)
    // values round-trip as strings; nulls stay null (sparse cells)
    assert(back.filter(back("opt").isNull).count() === (1000 / 7))
    val got = back.select("id", "name").as[(String, String)].collect()
      .map { case (i, n) => (i.toLong, n) }.toSet
    assert(got === (1 to 1000).map(i => (i.toLong, s"name_$i")).toSet)
  }

  test("distributed read: binaryFile -> header-named all-string DataFrame") {
    val dir = Files.createTempDirectory("graft-xlsx")
    Files.write(dir.resolve("abfall_abc.xlsx"), fixtureBytes)
    val df = XlsxSource.read(spark, dir.toString + "/*.xlsx")
    assert(df.columns.toSeq === Seq("Abfallart", "Entsorgungsweg", "Hinweis"))
    assert(df.schema.fields.forall(f => f.dataType.typeName == "string" && f.nullable))
    val got = df.orderBy("Abfallart").collect().map(_.toSeq).toSeq
    assert(got === Seq(
      Seq("170904", "true", null),
      Seq("Altöl", null, "nur mit Termin"),
      Seq("Sperrmüll", "Wertstoffhof", "max 2m³")))
    // second sheet through the same path
    val avv = XlsxSource.read(spark, dir.toString, sheet = "AVV")
    assert(avv.columns.toSeq === Seq("code", "gefahr"))
    assert(avv.count() === 2)
  }
}
