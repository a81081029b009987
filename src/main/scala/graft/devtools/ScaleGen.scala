package graft.devtools

import org.apache.spark.sql.functions._

/** Dev-only 10×-with-skew corpus generator (the r5 verdict's task #7:
  * one empirical scale point to pin the cap/salt/band claims).
  *
  * Builds `<out>` (default /tmp/graft_scale10x) from sf0.1:
  *   - events: 20 time-shifted replicas with DISJOINT user-id ranges
  *     (~2M rows — a 20× co-click graph, 20× session/state keys), PLUS
  *     one synthetic 5,000-member celebrity click bucket (every user
  *     clicking inside one 5-minute window) — the quadratic hot-key
  *     hazard `capBuckets` exists to bound
  *   - documents: 10 replicas (~50k docs), each word suffixed with the
  *     replica id — a per-replica BIJECTION on tokens, so every
  *     replica's internal shingle/near-dup structure is preserved
  *     exactly while cross-replica shingles are fully distinct (10
  *     independent dedup problems — the honest linear scaling shape; a
  *     shared filler token instead would manufacture fake cross-doc
  *     shingles from any shared word and blow candidates up
  *     quadratically by construction)
  *   - every other table copied through unchanged, so any SparkEntry
  *     query runs against the dir via SPARK_GRAFT_SF_DIR
  *
  * Usage: tools/run.sh graft.devtools.ScaleGen [outDir]
  */
object ScaleGen {
  def main(args: Array[String]): Unit = {
    val src = sys.env.getOrElse("SPARK_GRAFT_SRC_DIR", "/root/testdata/sf0.1")
    val out = args.headOption.getOrElse("/tmp/graft_scale10x")
    val spark = graft.core.GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt, "graft-scalegen")
    import spark.implicits._
    new java.io.File(out).mkdirs()

    val ev = graft.core.Tables.events(spark, src).localCheckpoint(true)
    val replicas = (0 until 20).map { k =>
      ev.select(
        (col("event_id") + lit(k.toLong * 1000000000L)).as("event_id"),
        (col("ts") + expr(s"INTERVAL $k HOURS")).cast("timestamp").as("ts"),
        (col("user_id") + lit(k.toLong * 10000000L)).as("user_id"),
        col("event_type"), col("value"), col("props"))
    }.reduce(_.unionByName(_))
    // the celebrity bucket: 5,000 distinct users, one shared 5-min window
    val t0 = ev.agg(min("ts")).head().getTimestamp(0)
    val hot = spark.range(5000).select(
      (col("id") + 990000000L).as("event_id"),
      lit(t0).as("ts"), // all in bucket unix(ts) div 300
      (col("id") + 900000000L).as("user_id"),
      lit("click").as("event_type"),
      lit(1.0).as("value"),
      lit("""{"k":1}""").as("props"))
    replicas.unionByName(hot).repartition(32)
      .write.mode("overwrite").parquet(s"$out/events.parquet")

    val docs = graft.core.Tables.documents(spark, src).localCheckpoint(true)
    (0 until 10).map { k =>
      docs.select(
        (col("doc_id") + lit(k.toLong * 1000000L)).as("doc_id"),
        regexp_replace(col("text"), "(\\S+)", s"$$1r$k").as("text"),
        col("lang"), col("source"))
        .withColumn("n_chars", length(col("text")))
    }.reduce(_.unionByName(_)).repartition(32)
      .write.mode("overwrite").parquet(s"$out/documents.parquet")

    for (t <- Seq("region", "nation", "customer", "supplier", "part",
                  "orders", "lineitem", "embeddings")) {
      java.nio.file.Files.copy(
        java.nio.file.Paths.get(s"$src/$t.parquet"),
        java.nio.file.Paths.get(s"$out/$t.parquet"),
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    }
    println(s"[scalegen] wrote $out: events=" +
      spark.read.parquet(s"$out/events.parquet").count() +
      " documents=" + spark.read.parquet(s"$out/documents.parquet").count())
    spark.stop()
  }
}
