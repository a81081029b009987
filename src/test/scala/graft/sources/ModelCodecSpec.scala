package graft.sources

import graft.SparkSpec
import graft.sources.ModelCodec.{Chunk, Codec, Config, Extraction, GrammarCodec}

/** The pluggable external-model contract behind the llm slot: batching
  * honors min(config, codec) with no chunk dropped or duplicated,
  * transient failures retry up to the bound (then fail loudly), cost
  * accounting matches per-attempt billing, and the fake codec's output
  * is row-identical to the grammar path it stands in for.
  */
class ModelCodecSpec extends SparkSpec {
  import spark.implicits._

  import ModelCodecSpec.{FlakyCodec, RecordingCodec}

  private def chunks(n: Int) =
    (1 to n).map(i => Chunk(s"c$i", 0, s"text$i")).toDS().repartition(1)

  test("batching: min(config, codec) chunk groups, none dropped") {
    ModelCodecSpec.batches.clear()
    // codec caps at 3 even though config allows 16
    val (out, cost) = ModelCodec.run(chunks(7), () => new RecordingCodec, Config(maxBatch = 16))
    val rows = out.collect()
    assert(rows.length === 7)
    assert(rows.map(_.name).sorted === (1 to 7).map(i => s"c$i").sorted)
    import scala.jdk.CollectionConverters._
    assert(ModelCodecSpec.batches.asScala.toSeq.sorted === Seq(1, 3, 3))
    assert(cost.calls.value === 3L)
    assert(cost.outputRows.value === 7L)
    assert(cost.inputChars.value === (1 to 7).map(i => s"text$i".length).sum.toLong)
    // config can tighten below the codec's cap
    ModelCodecSpec.batches.clear()
    ModelCodec.run(chunks(4), () => new RecordingCodec, Config(maxBatch = 2))._1.collect()
    assert(ModelCodecSpec.batches.asScala.toSeq.sorted === Seq(2, 2))
  }

  test("retry: transient failures recover within the bound and are billed per attempt") {
    val (out, cost) = ModelCodec.run(chunks(5), () => new FlakyCodec(2),
      Config(maxBatch = 5, maxRetries = 3))
    assert(out.collect().length === 5)
    assert(cost.retries.value === 2L)
    assert(cost.calls.value === 3L) // 2 failed attempts + 1 success
    // beyond the bound the task fails loudly with the codec name
    val e = intercept[org.apache.spark.SparkException] {
      ModelCodec.run(chunks(2), () => new FlakyCodec(9),
        Config(maxBatch = 2, maxRetries = 1))._1.collect()
    }
    assert(e.getMessage.contains("flaky") || Option(e.getCause).exists(
      _.getMessage.contains("flaky")))
  }

  test("the grammar fake is row-identical to RuleExtract.candidates (config-swappable)") {
    val docs = Seq(
      ("d1", "Hinweis: siehe Aushang. Altlack gehört in den Sondermüll. Kartons gehören nicht in den Restmüll."),
      ("d2", "Wenn Farbe flüssig ist, gehört es in den Sondermüll, sonst in den Restmüll."),
      ("d3", "Bauschutt ist als Restmüll zu entsorgen. Der Hof nimmt alles an."),
      ("d4", "Keine Regel hier.")).toDF("name", "text")
    val grammar = RuleExtract.candidates(docs)
      .orderBy("name", "branch", "stream").collect().map(_.toString).toSeq
    val codec = ModelCodec.candidates(docs, () => new GrammarCodec, Config(maxBatch = 2))
      .orderBy("name", "branch", "stream").collect().map(_.toString).toSeq
    assert(codec === grammar)
    assert(grammar.nonEmpty)
  }
}

private object ModelCodecSpec {
  val batches = new java.util.concurrent.ConcurrentLinkedQueue[Int]()

  /** Records every batch it sees (static queue: codec instances are
    * built per partition inside tasks, so assertions need a
    * JVM-global). Top-level so no outer spec reference serializes. */
  class RecordingCodec extends Codec {
    val name = "recording"
    override val maxBatch = 3
    def extractBatch(batch: Seq[Chunk]): Seq[Extraction] = {
      batches.add(batch.size)
      batch.map(c => Extraction(c.name, 0, c.text, None, None, "Restmüll"))
    }
  }

  /** Fails the first `failsPerBatch` attempts of every batch —
    * deterministic transience for the retry loop. */
  class FlakyCodec(failsPerBatch: Int) extends Codec {
    val name = "flaky"
    private var seen = Map.empty[String, Int] // batch key -> attempts
    def extractBatch(batch: Seq[Chunk]): Seq[Extraction] = {
      val key = batch.map(_.name).mkString(",")
      val n = seen.getOrElse(key, 0)
      seen += key -> (n + 1)
      if (n < failsPerBatch) throw new RuntimeException(s"transient #$n")
      batch.map(c => Extraction(c.name, 0, c.text, None, None, "Biomüll"))
    }
  }
}
