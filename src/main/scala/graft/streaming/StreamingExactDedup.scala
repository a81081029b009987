package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Incremental ExactSubstr window dedup (d39's streaming twin, wired
  * by s19): state is the FIRST-SIGHT window-hash set, and a batch's
  * window is duplicated iff its hash exists in the state (first seen
  * in an earlier batch) or an earlier (doc_id, pos) of the same batch
  * claimed it. When document arrival order equals doc_id order (s19
  * stages contiguous doc ranges), this is exactly the batch
  * first-sight law — earlier-batch occurrences always carry smaller
  * doc ids, so "in state ∨ intra-batch rank > 1" ≡ "global
  * row_number > 1".
  *
  * The hash-set state is APPEND-ONLY (first-sight hashes never
  * leave), so it lives as one parquet DELTA dir per batch (`h/d{n}` =
  * the hashes batch n saw first): batch n reads d0..d{n−1} as its
  * prior and writes only its own new hashes — the old v{n}→v{n+1}
  * full-set rewrite re-wrote every hash ever seen once per batch,
  * quadratic total state bytes over the stream's life (guide §1.2).
  * Replay stays idempotent — a Spark retry of batch n overwrites
  * d{n} from the same deterministic inputs and never reads its own
  * stale partial (the prior filter is strictly `< n`); verdicts land
  * in b{n} subdirs as before. State size is the distinct-window
  * cardinality, which is what any EXACT global dedup must hold
  * somewhere (s03's argument); the bounded-horizon trade is s09's
  * watermark variant.
  */
object StreamingExactDedup {

  private val K = 8

  def scoreBatch(stateRoot: String)(batch: DataFrame, batchId: Long): Unit = {
    val s = batch.sparkSession
    val base = batch
      .select(col("doc_id"), split(lower(trim(col("text"))), "\\s+").as("w"))
      .select(col("doc_id"), size(col("w")).as("n_words"), col("w"))
      .localCheckpoint(true) // window leg + verdict left join
    val wins = base.filter(col("n_words") >= K)
      .select(col("doc_id"),
        posexplode(transform(sequence(lit(0), size(col("w")) - K),
          i => md5(concat_ws(" ", slice(col("w"), i + 1, lit(K))))))
          .as(Seq("pos", "h")))
    val deltaDirs = Option(new java.io.File(s"$stateRoot/h").listFiles())
      .toSeq.flatten
      .filter(f => f.isDirectory && f.getName.matches("d\\d+") &&
        f.getName.drop(1).toLong < batchId)
      .map(_.toString).sorted
    val prior =
      if (deltaDirs.nonEmpty) s.read.parquet(deltaDirs: _*)
      else s.createDataFrame(s.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("h",
            org.apache.spark.sql.types.StringType))))
    val scored = wins
      .withColumn("rn", row_number().over(
        Window.partitionBy("h").orderBy("doc_id", "pos")))
      .join(prior.select(col("h"), lit(1).as("seen")), Seq("h"), "left")
      .localCheckpoint(true) // verdicts + state advance reuse it
    val perDoc = scored.groupBy("doc_id")
      .agg(count(lit(1)).as("n_windows"),
        sum(when(col("seen").isNotNull || col("rn") > 1, 1L).otherwise(0L))
          .as("n_dup"))
    base.select("doc_id")
      .join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_windows"), lit(0L)).as("n_windows"),
        coalesce(col("n_dup"), lit(0L)).as("n_dup"))
      .write.mode("overwrite").parquet(s"$stateRoot/verdicts/b$batchId")
    scored.filter(col("seen").isNull && col("rn") === 1)
      .select("h").distinct()
      .write.mode("overwrite").parquet(s"$stateRoot/h/d$batchId")
  }
}
