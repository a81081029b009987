package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{expr, timestamp_micros}

/** Parquet table access for the driver-generated corpus (TESTDATA.md).
  *
  * All reads go through here so scans stay declarative: Catalyst pushes
  * filters and prunes columns into the parquet scan (verify with
  * `.explain("formatted")` — look for PushedFilters / ReadSchema).
  */
object Tables {
  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    graft.GraftExtensions.register(spark) // engine SQL functions always on
    spark.read.parquet(s"$dir/$name.parquet")
  }

  def lineitem(s: SparkSession, d: String): DataFrame  = apply(s, d, "lineitem")
  def orders(s: SparkSession, d: String): DataFrame    = apply(s, d, "orders")
  def customer(s: SparkSession, d: String): DataFrame  = apply(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = apply(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = apply(s, d, "part")
  def nation(s: SparkSession, d: String): DataFrame    = apply(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame    = apply(s, d, "region")
  /** The events table's `ts` arrives as TimestampType directly for a
    * micros-precision corpus. Older corpus generations stored parquet
    * TIMESTAMP(NANOS), which Spark has no native type for; sessions set
    * `spark.sql.legacy.parquet.nanosAsLong=true` so that variant arrives
    * as nano-epoch LongType and is converted to micros here — integral
    * `div`, not float division: nano epochs (~1.7e18) exceed double's
    * exact-integer range.
    */
  def events(s: SparkSession, d: String): DataFrame =
    withEventTs(apply(s, d, "events"))

  /** The `ts` normalization, shared by every reader of the events table
    * (batch above, streaming in queries.StreamQueries and the streaming
    * specs) so the paths can never drift apart. Handles every variant the
    * corpus can arrive as: nano-epoch LongType (legacy nanosAsLong),
    * TIMESTAMP_NTZ (sessions without inferTimestampNTZ=false — Structured
    * Streaming rejects NTZ event-time columns), and native TimestampType
    * (pass-through). */
  def withEventTs(raw: DataFrame): DataFrame =
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        raw.withColumn("ts",
          raw.col("ts").cast(org.apache.spark.sql.types.TimestampType))
      case _ => raw
    }
  def documents(s: SparkSession, d: String): DataFrame = apply(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = apply(s, d, "embeddings")
}

/** Shared SparkSession factory for mains and tests: local mode sized for
  * the container (local[32]), shuffle partitions matched to cores (not
  * the 200 default, which just makes tiny scheduling overhead), AQE on
  * so skewed shuffles re-plan at runtime — the same settings that matter
  * on a real cluster, minus cluster-only knobs.
  */
object GraftSession {
  def local(cores: Int = 32, appName: String = "graft"): SparkSession = {
    val spark = SparkSession
      .builder()
      .master(s"local[$cores]")
      .appName(appName)
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // Corpus timestamps are naive parquet micros; read them as the
      // session-UTC instant type (LTZ) so event-time semantics
      // (watermarks, unix_micros, window()) apply. NTZ inference would
      // make the same columns TIMESTAMP_NTZ, which Structured Streaming
      // rejects as an event-time column.
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.GraftExtensions.register(spark) // engine SQL functions always on
    // MV/aggregate-navigation rewrite, through the public end-of-optimizer
    // hook; a no-op while MvRegistry is empty
    if (!spark.experimental.extraOptimizations.contains(graft.plans.MvRewrite)) {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ graft.plans.MvRewrite
    }
    spark
  }
}
