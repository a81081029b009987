package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec

/** Checkpoint recovery — the exactly-once story under restart: a
  * stateful aggregation runs as TWO separate query incarnations over
  * the SAME checkpoint. The restarted query must (a) restore the state
  * store (file-1 counts survive the process boundary) and (b) skip
  * files the first incarnation committed (no double counting). Both
  * properties collapse into one assertion: the final complete-mode
  * state equals the one-shot batch aggregate over everything, each row
  * exactly once.
  */
class StreamingRecoverySpec extends SparkSpec {
  import spark.implicits._

  private def stage(target: java.nio.file.Path, name: String, df: DataFrame): Unit = {
    val tmp = Files.createTempDirectory("graft-rec-stage")
    df.repartition(1).write.mode("overwrite").parquet(tmp.toString)
    import scala.jdk.CollectionConverters._
    val part = Files.list(tmp).iterator().asScala
      .find(_.toString.endsWith(".parquet")).get
    Files.copy(part, target.resolve(name))
  }

  test("restarted query restores state and never reprocesses committed files") {
    val in = Files.createTempDirectory("graft-rec-in")
    val ckpt = Files.createTempDirectory("graft-rec-ckpt").toString
    val fileA = Seq(("click", 1L), ("click", 2L), ("view", 3L)).toDF("k", "v")
    val fileB = Seq(("click", 4L), ("scroll", 5L)).toDF("k", "v")
    stage(in, "a.parquet", fileA)

    def counts() = spark.readStream.schema(fileA.schema)
      .option("maxFilesPerTrigger", "1").parquet(in.toString)
      .groupBy("k").agg(count(lit(1)).as("cnt"), sum("v").as("sv"))

    def run(sink: String): Unit = {
      val q = counts().writeStream.format("memory").queryName(sink)
        .outputMode("complete")
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start()
      try q.awaitTermination(120000) finally q.stop()
    }

    run("rec_run1")
    val got1 = spark.table("rec_run1").orderBy("k")
      .as[(String, Long, Long)].collect().toSeq
    assert(got1 === Seq(("click", 2L, 3L), ("view", 1L, 3L)))

    // the process "restarts": a NEW incarnation over the same
    // checkpoint, with one new file staged in the meantime
    stage(in, "b.parquet", fileB)
    run("rec_run2")
    val got2 = spark.table("rec_run2").orderBy("k")
      .as[(String, Long, Long)].collect().toSeq
    // exactly-once both ways: click=3 (not 5 — file A was not replayed)
    // and view survives from restored state (file A was not dropped)
    assert(got2 === Seq(("click", 3L, 7L), ("scroll", 1L, 5L), ("view", 1L, 3L)))
  }
}
