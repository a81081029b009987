package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Stream-static enrichment (SURVEY §2.10 + J1's classification join in
  * streaming form): an event stream joined per micro-batch against a
  * static dimension table. The static side needs no watermark and holds
  * no state — each micro-batch plans a fresh broadcast join, so
  * dimension updates between batches are picked up on file-backed
  * dimensions, and state size stays zero regardless of stream length.
  */
class StreamStaticJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("events enrich against a static dimension; unmatched pass through null") {
    implicit val sq = spark.sqlContext
    val events = MemoryStream[Evt]
    val dim = Seq((1L, "gold"), (2L, "silver")).toDF("user_id", "tier")
    val enriched = events.toDF()
      .join(broadcast(dim), Seq("user_id"), "left")
      .select(col("user_id"), col("kind"), col("tier"))
    val ckpt = Files.createTempDirectory("graft-ssj2").toString
    val q = enriched.writeStream.format("memory").queryName("sstat_out")
      .outputMode("append").option("checkpointLocation", ckpt).start()
    try {
      events.addData(
        Evt(1, ts("2026-01-01 10:00:00"), "click"),
        Evt(2, ts("2026-01-01 10:01:00"), "view"),
        Evt(9, ts("2026-01-01 10:02:00"), "click"))
      q.processAllAvailable()
      events.addData(Evt(1, ts("2026-01-01 10:03:00"), "view"))
      q.processAllAvailable()
      val out = spark.table("sstat_out").collect()
        .map(r => (r.getLong(0), r.getString(1), Option(r.getString(2)))).toSet
      assert(out === Set(
        (1L, "click", Some("gold")),
        (2L, "view", Some("silver")),
        (9L, "click", None),
        (1L, "view", Some("gold"))))
    } finally q.stop()
  }
}
