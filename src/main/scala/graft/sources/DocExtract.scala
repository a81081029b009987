package graft.sources

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Document-extraction source — the reference's planned PDF/DOCX→LLM
  * ingestion path (`etl_implementation.md:262-273`, `README.md:122-127`)
  * as Spark plumbing: opaque binary documents in, extracted text +
  * provenance out, flowing into the graph as `Source` nodes
  * (`schema.cql:96-98`, `DERIVED_FROM` edges §1.1).
  *
  * The extractor itself is a STUB (this container has no PDF codec or
  * LLM): [[StubExtractor]] decodes utf-8 deterministically where a real
  * deployment would call the parser/model. The Spark side is real and
  * identical either way: partition-batched `mapPartitions` with one
  * extractor instance per partition (model/parser init amortized over a
  * batch — the same contract a Pandas-UDF/Arrow path gives Python), no
  * shuffle, binary payload dropped before any wide op.
  */
object DocExtract {

  /** One raw input document. `source_type` follows the reference's
    * Source.type enum: pdf | csv | docx | llm (`schema.cql:96-97`). */
  case class RawDoc(doc_id: Long, source_type: String, name: String,
                    content: Array[Byte])

  case class Extracted(doc_id: Long, source_type: String, name: String,
                       text: String, n_chunks: Int, provenance: String)

  /** Allowed Source.type values (`schema.cql:96-97`). */
  val SourceTypes: Set[String] = Set("pdf", "csv", "docx", "llm")

  trait Extractor extends Serializable {
    def extract(doc: RawDoc): Extracted
  }

  /** Deterministic stand-in for the real parser/LLM call. */
  class StubExtractor(chunkChars: Int = 500) extends Extractor {
    def extract(d: RawDoc): Extracted = {
      val text = new String(d.content, StandardCharsets.UTF_8)
      val chunks = math.max(1, (text.length + chunkChars - 1) / chunkChars)
      Extracted(d.doc_id, d.source_type, d.name, text, chunks,
        s"stub:${d.source_type}")
    }
  }

  /** Extract every document, one extractor instance per partition. */
  def extractAll(docs: Dataset[RawDoc],
                 mk: () => Extractor = () => new StubExtractor()): Dataset[Extracted] = {
    import docs.sparkSession.implicits._
    docs.mapPartitions { it =>
      val ex = mk() // per-partition init (parser handle / model client)
      it.map(ex.extract)
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
}
