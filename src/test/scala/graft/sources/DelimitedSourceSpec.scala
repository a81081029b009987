package graft.sources

import java.io.{FileOutputStream, OutputStreamWriter}
import java.nio.file.Files
import java.util.zip.GZIPOutputStream

import graft.SparkSpec

/** Delimiter variants + gzip transparency for the Excel-export parity
  * targets. */
class DelimitedSourceSpec extends SparkSpec {

  private def write(name: String, content: String, gzip: Boolean = false): String = {
    val dir = Files.createTempDirectory("graft-src")
    val p = dir.resolve(name)
    if (gzip) {
      val w = new OutputStreamWriter(
        new GZIPOutputStream(new FileOutputStream(p.toFile)), "UTF-8")
      w.write(content); w.close()
    } else Files.writeString(p, content)
    p.toString
  }

  test("semicolon Excel export with quoted multiline cell") {
    val p = write("avv.csv",
      "Code;Bezeichnung;Gefährlich\n" +
        "08 01 11*;\"Farb- und Lackabfälle,\nLösemittel\";ja\n" +
        "20 01 38;Holz;nein\n")
    val df = DelimitedSource.excelExport(spark, p)
    assert(df.columns.toSeq === Seq("Code", "Bezeichnung", "Gefährlich"))
    assert(df.count() === 2)
    assert(df.filter(df("Code") === "08 01 11*").head().getString(1).contains("\nLösemittel"))
  }

  test("tsv variant") {
    val p = write("x.tsv", "a\tb\n1\t2\n")
    val df = DelimitedSource.tsv(spark, p)
    assert(df.columns.toSeq === Seq("a", "b"))
    assert(df.head().getString(0) === "1")
  }

  test("gzipped csv reads transparently") {
    val p = write("y.csv.gz", "a,b\n1,2\n3,4\n", gzip = true)
    val df = DelimitedSource.csv(spark, p)
    assert(df.count() === 2)
  }
}
