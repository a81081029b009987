package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.util.LongAccumulator

import graft.core.Uid

/** The external-model extraction contract behind the reference's `llm`
  * source slot (`schema.cql:96-97`; the planned LLM phase is
  * `etl_implementation.md:262-273` — "Rule extraction, condition
  * parsing" from bylaw prose into the DisposalRule/Condition layer).
  *
  * [[RuleExtract]] fills the slot with a pure-Catalyst pattern grammar;
  * this file defines the seam a PRODUCTION client would occupy instead:
  * a batched `Seq[Chunk] => Seq[Extraction]` codec with config-driven
  * batching, bounded retry, and cost accounting — everything around the
  * model call is real, distributed, and gated (q113 runs the
  * deterministic fake through the exact emission q110 gates), so
  * swapping in an HTTP client is implementing ONE method.
  *
  * Scale shape: one codec instance per partition (connection reuse),
  * iterator-grouped batches (never materializing a partition), usage
  * counted via Spark accumulators (merged on the driver like any
  * metric). Zero egress here, so the shipped codec is the grammar fake;
  * the contract — not the client — is the deliverable.
  */
object ModelCodec {

  /** One retrieval chunk sent to the model. */
  case class Chunk(name: String, chunk_idx: Int, text: String)

  /** One structured extraction returned by the model — the same
    * candidate schema [[RuleExtract.candidates]] emits, so both paths
    * share the DisposalRule/Condition graph emission
    * ([[RuleExtract.toGraph]]). */
  case class Extraction(name: String, sent_idx: Int, item: String,
                        condition: Option[String], branch: Option[String],
                        stream: String)

  /** A model endpoint: one batch in, extractions out. Implementations
    * are constructed per partition (via the `mk` thunk) so connection
    * state never serializes; they must be deterministic per batch for
    * idempotent re-extraction (the MERGE contract). A transient
    * failure is an exception — the runner retries up to
    * [[Config.maxRetries]] times. */
  trait Codec extends Serializable {
    def name: String
    /** The endpoint's own batch-size cap; the runner sends
      * min(this, Config.maxBatch) chunks per call. */
    def maxBatch: Int = 16
    def extractBatch(batch: Seq[Chunk]): Seq[Extraction]
  }

  /** Client-side knobs: batch size and bounded retry. */
  case class Config(maxBatch: Int = 16, maxRetries: Int = 3)

  /** Per-run cost accounting, merged across executors. Accumulator
    * values are defined AFTER an action on the returned Dataset (Spark
    * metric semantics); a retried batch counts its input chars once
    * per attempt — what a per-call-billed API would charge. */
  case class Cost(calls: LongAccumulator, retries: LongAccumulator,
                  inputChars: LongAccumulator, outputRows: LongAccumulator)

  /** Run `mk`'s codec over every chunk: per-partition instance,
    * iterator-grouped batches, bounded retry, accumulator-counted
    * usage. The returned Dataset is lazy; `cost` fills on action. */
  def run(chunks: Dataset[Chunk], mk: () => Codec,
          cfg: Config = Config()): (Dataset[Extraction], Cost) = {
    val spark = chunks.sparkSession
    import spark.implicits._
    val cost = Cost(
      spark.sparkContext.longAccumulator("codec.calls"),
      spark.sparkContext.longAccumulator("codec.retries"),
      spark.sparkContext.longAccumulator("codec.inputChars"),
      spark.sparkContext.longAccumulator("codec.outputRows"))
    val out = chunks.mapPartitions { it =>
      val codec = mk()
      val bs = math.max(1, math.min(cfg.maxBatch, codec.maxBatch))
      it.grouped(bs).flatMap { batch =>
        var attempt = 0
        var done: Seq[Extraction] = null
        while (done == null) {
          cost.calls.add(1)
          cost.inputChars.add(batch.iterator.map(_.text.length.toLong).sum)
          try done = codec.extractBatch(batch)
          catch {
            case scala.util.control.NonFatal(e) =>
              if (attempt >= cfg.maxRetries)
                throw new RuntimeException(
                  s"codec '${codec.name}' failed after ${attempt + 1} attempts", e)
              attempt += 1
              cost.retries.add(1)
          }
        }
        cost.outputRows.add(done.size.toLong)
        done
      }
    }
    (out, cost)
  }

  /** Docs `(name, text)` → the q110 candidate frame `(name, sent_idx,
    * item, condition, branch, stream, rule_uid)` via a codec — the
    * model-path twin of [[RuleExtract.candidates]]. One chunk per doc
    * here (bylaw docs are small); a real corpus would pack chunks with
    * [[DocExtract.packChunks]] first. */
  def candidates(docs: DataFrame, mk: () => Codec,
                 cfg: Config = Config()): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val chunks = docs
      .select(col("name"), lit(0).as("chunk_idx"), col("text"))
      .as[Chunk]
    run(chunks, mk, cfg)._1.toDF()
      .select(col("name"), col("sent_idx"), col("item"),
        col("condition"), col("branch"), col("stream"))
      .withColumn("rule_uid", RuleExtract.ruleUid)
  }

  /** The deterministic fake: [[RuleExtract]]'s pattern grammar run
    * client-side — same sentence split, same negation drop, same three
    * anchored surface forms (reusing the exact regex strings, so both
    * paths can never drift). This is what tests and the q113 gate run
    * where a real model client would sit. */
  class GrammarCodec extends Codec {
    val name = "grammar-fake"
    private val condRe = RuleExtract.CondPat.r
    private val simpleRe = RuleExtract.SimplePat.r
    private val alsRe = RuleExtract.AlsPat.r
    private val negRe = java.util.regex.Pattern.compile("\\bnicht\\b")
    def extractBatch(batch: Seq[Chunk]): Seq[Extraction] =
      batch.flatMap { ch =>
        ch.text.split("(?<=\\.)\\s+").iterator.zipWithIndex
          .map { case (s, i) => (s.trim, i) }
          .filter { case (s, _) => s.nonEmpty && !negRe.matcher(s).find() }
          .flatMap { case (sent, i) =>
            sent match {
              case condRe(item, cond, s1, s2) =>
                Seq(Extraction(ch.name, i, item, Some(cond), Some("if_true"), s1),
                  Extraction(ch.name, i, item, Some(cond), Some("if_false"), s2))
              case simpleRe(item, s) if !sent.startsWith("Wenn ") =>
                Seq(Extraction(ch.name, i, item, None, None, s))
              case alsRe(item, s) if !sent.startsWith("Wenn ") =>
                Seq(Extraction(ch.name, i, item, None, None, s))
              case _ => Nil
            }
          }.toSeq
      }
  }
}
