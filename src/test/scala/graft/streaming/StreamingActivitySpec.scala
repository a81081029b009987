package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec

/** Multi-batch behavior of the transformWithState rollup
  * (StreamingActivity) that the single-data-batch gate query (s08)
  * cannot exercise: state merging across batches, timer delete + re-arm
  * on new activity, and watermark-gated per-user emission order. */
class StreamingActivitySpec extends SparkSpec {
  import StreamingActivity.{Click, Rollup}

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)
  private def us(s: String) = {
    val i = ts(s).toInstant
    i.getEpochSecond * 1000000L + i.getNano / 1000L
  }

  private implicit val clickEnc: org.apache.spark.sql.Encoder[Click] =
    org.apache.spark.sql.Encoders.product[Click]
  private implicit val rollupEnc: org.apache.spark.sql.Encoder[Rollup] =
    org.apache.spark.sql.Encoders.product[Rollup]

  test("rollups merge across batches and emit per-user as the watermark passes") {
    implicit val sq = spark.sqlContext
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val in = MemoryStream[Click]
    val ckpt = Files.createTempDirectory("graft-sa").toString
    val q = StreamingActivity.rollups(in.toDS(), "10 minutes")
      .writeStream.format("memory").queryName("sa_out")
      .outputMode("append").option("checkpointLocation", ckpt).start()
    try {
      // b1: open u1 — timer armed at 10:30
      in.addData(Click(1, ts("2026-01-01 10:00:00")))
      q.processAllAvailable()
      // b2: u1 again at 10:20 → state merges and the 10:30 timer is
      // DELETED and re-armed at 10:50; u2 opens at 10:50 (timer 11:20).
      // The post-batch watermark is 10:50 − 10 min = 10:40: the no-data
      // batch fires nothing — but the STALE 10:30 timer would have
      // fired, so an empty sink here is the re-arm proof.
      in.addData(Click(1, ts("2026-01-01 10:20:00")), Click(2, ts("2026-01-01 10:50:00")))
      q.processAllAvailable()
      val afterB2 = spark.table("sa_out").as[Rollup].collect().toSet
      assert(afterB2.isEmpty,
        s"u1's re-armed timer must not fire at wm 10:40, got $afterB2")
      // b3: riser → wm 11:50 fires u1 (10:50) and u2 (11:20); the
      // riser's own timer (12:30) stays pending
      in.addData(Click(9, ts("2026-01-01 12:00:00")))
      q.processAllAvailable()
      val afterB3 = spark.table("sa_out").as[Rollup].collect().toSet
      assert(afterB3 == Set(
        Rollup(1, 2, us("2026-01-01 10:00:00"), us("2026-01-01 10:20:00")),
        Rollup(2, 1, us("2026-01-01 10:50:00"), us("2026-01-01 10:50:00"))),
        s"u1 (merged) and u2 should emit after b3, got $afterB3")
    } finally {
      q.stop()
      prev match {
        case Some(v) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }
}
