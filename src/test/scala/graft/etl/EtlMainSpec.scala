package graft.etl

import java.nio.file.Files

import graft.SparkSpec

/** The CLI surface end-to-end: schema/import/stats/dry-run/reset flag
  * combinations against a temp store, asserting on stdout (the CLI's
  * contract) plus store state.
  */
class EtlMainSpec extends SparkSpec {

  private def captureOut(f: => Unit): String = {
    val bos = new java.io.ByteArrayOutputStream()
    Console.withOut(new java.io.PrintStream(bos, true, "UTF-8"))(f)
    bos.toString("UTF-8")
  }

  test("schema + both phases + stats, then dry-run and reset") {
    val store = Files.createTempDirectory("graft-etlmain").toString + "/graph"

    val out1 = captureOut(EtlMain.run(spark, Array(
      "--store", store, "--schema",
      "--facilities", fixture("disposal_map_db.json"),
      "--waste-items", fixture("abfall_abc.csv"),
      "--stats")))
    assert(out1.contains("facilities imported: 2"))
    assert(out1.contains("waste items imported: 8 items, 3 streams, 7 relationships"))
    assert(out1.contains("total nodes: 13; total relationships: 7"))

    // dry-run after import: plan-only, nothing changes, store facilities
    // are visible to the unmatched diagnostic
    val out2 = captureOut(EtlMain.run(spark, Array(
      "--store", store, "--dry-run",
      "--facilities", fixture("disposal_map_db.json"),
      "--waste-items", fixture("abfall_abc.csv"))))
    assert(out2.contains("dry-run: would import 2 facilities"))
    assert(out2.contains("dry-run: 8 items"))
    val st = Pipeline.stats(spark, store)
    assert(st.totalNodes === 13 && st.totalEdges === 7) // dry-run wrote nothing

    val out3 = captureOut(EtlMain.run(spark, Array("--store", store, "--reset", "--stats")))
    assert(out3.contains("reset:"))
    assert(out3.contains("total nodes: 0"))
  }

  test("dry-run against an empty store reports unmatched facilities") {
    val store = Files.createTempDirectory("graft-etlmain-dry").toString + "/graph"
    val out = captureOut(EtlMain.run(spark, Array(
      "--store", store, "--dry-run", "--waste-items", fixture("abfall_abc.csv"))))
    // no facilities imported yet → facility-classified targets unmatched
    assert(out.contains("unmatched facilities:"))
    assert(out.contains("streams needed"))
  }

  test("missing --store fails loudly") {
    intercept[RuntimeException] {
      EtlMain.run(spark, Array("--stats"))
    }
  }
}
