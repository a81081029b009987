package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.DocExtract._

/** The stubbed PDF/DOCX extraction source: deterministic extraction,
  * per-partition extractor init, Source-node projection with enum
  * validation and the engine-wide uid scheme. */
class DocExtractSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    RawDoc(1, "pdf", "Schema_Doku.pdf", ("x" * 1200).getBytes("UTF-8")),
    RawDoc(2, "docx", "Notizen.docx", "kurzer text".getBytes("UTF-8")),
    RawDoc(3, "floppy", "Altbestand", "legacy".getBytes("UTF-8")))

  test("stub extraction is deterministic and chunk-counted") {
    val out = extractAll(docs.toDS()).collect().sortBy(_.doc_id)
    assert(out.map(_.n_chunks).toSeq === Seq(3, 1, 1))
    assert(out(1).text === "kurzer text")
    assert(out(0).provenance === "stub:pdf")
    // re-run → identical (idempotent-ingest contract)
    val again = extractAll(docs.toDS()).collect().sortBy(_.doc_id)
    assert(out.toSeq === again.toSeq)
  }

  test("source nodes: enum-validated, deterministic uids") {
    val nodes = toSourceNodes(extractAll(docs.toDS())).collect()
    // 'floppy' is not a legal Source.type (schema.cql:96-97) → rejected
    assert(nodes.map(_.getAs[String]("name")).toSet ===
      Set("Schema_Doku.pdf", "Notizen.docx"))
    val uid = nodes.find(_.getAs[String]("name") == "Schema_Doku.pdf").get
      .getAs[String]("uid")
    // sha256("Schema_Doku.pdf")[:16], the engine-wide uid contract
    val expected = java.security.MessageDigest.getInstance("SHA-256")
      .digest("Schema_Doku.pdf".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(16)
    assert(uid === expected)
  }

  test("extractor is constructed once per partition, not per row") {
    val counter = spark.sparkContext.longAccumulator("extractor-inits")
    val many = (1L to 100L).map(i => RawDoc(i, "pdf", s"doc$i", Array[Byte]('a')))
    val ds = many.toDS().repartition(4)
    extractAll(ds, () => { counter.add(1); new StubExtractor() }).collect()
    assert(counter.value === 4, s"expected 4 extractor inits, got ${counter.value}")
  }
}
