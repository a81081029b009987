package graft.etl

import java.nio.file.{Files, Paths}

import graft.SparkSpec

/** Messy-input behavior (the reference's raison d'être, SURVEY §0):
  * malformed sources degrade gracefully, never crash the pipeline. */
class MessyInputSpec extends SparkSpec {

  private def tmpFile(name: String, content: String): String = {
    val d = Files.createTempDirectory("graft-messy")
    val p = d.resolve(name)
    Files.writeString(p, content)
    p.toString
  }

  test("malformed facility JSON yields empty load, not an exception") {
    val p = tmpFile("broken.json", """{"uuid-1": [ {"name": "X" """) // truncated
    assert(Facilities.load(spark, p).count() === 0)
  }

  test("facility JSON with wrong shape (array root) yields empty load") {
    val p = tmpFile("arr.json", """[1, 2, 3]""")
    assert(Facilities.load(spark, p).count() === 0)
  }

  test("CSV with missing disposal column rows still parses remaining rows") {
    val p = tmpFile("sparse.csv",
      "Abfallart,Entsorgungsweg,Adresse,Öffnungszeiten,Kontakt\n" +
        "Altpapier,Altpapiertonne,,,\n" +
        "NurName,,,,\n" + // no disposal text at all
        ",Biotonne,,,\n") // no name → dropped
    val t = WasteItems.loadTargets(spark, p)
    assert(t.count() === 2)
    val items = WasteItems.itemNodes(t).collect().map(_.getAs[String]("name")).toSet
    assert(items === Set("Altpapier", "NurName"))
  }

  test("null-heavy rows flow through the parse UDF without NPE") {
    val p = tmpFile("nulls.csv",
      "Abfallart,Entsorgungsweg\nA1,\nA2,-\nA3,\"x\n-\n\"\n")
    val t = WasteItems.loadTargets(spark, p)
    assert(t.count() === 3)
    assert(WasteItems.classified(t).count() === 0) // no valid targets anywhere
  }
}
