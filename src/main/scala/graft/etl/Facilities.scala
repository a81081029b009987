package graft.etl

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.core.Uid

/** Phase-1 ETL: facility JSON → Facility nodes (reference
  * `facilities.py:41-143`, SURVEY.md §3.1).
  *
  * Source shape: one JSON object mapping uuid → array of facility
  * structs (`etl_implementation.md:14-27`). The same facility can appear
  * under several uuids; dedup-merges by trimmed name with *first-seen
  * wins, later entries fill only empty fields* (A3,
  * `facilities.py:58-76`).
  *
  * Distributed determinism: Python dict order made "first seen"
  * well-defined; here an explicit `source_order` (map-entry position ×
  * array position) imposes the same total order, and the merge is a
  * per-column `min_by(value, first-order-where-non-empty)` — a single
  * hash aggregate, no window shuffle-then-filter (SURVEY §7 hard-part 2).
  */
object Facilities {

  val fieldNames: Seq[String] =
    Seq("address", "opening_hours", "contact", "additional_info", "link")

  private val entrySchema = MapType(StringType, ArrayType(StructType(
    StructField("name", StringType) +: fieldNames.map(StructField(_, StringType)))))

  /** Read the uuid→array-of-structs JSON as an ordered (source_order,
    * name, fields…) DataFrame. Top-level JSON maps aren't directly
    * readable by the json source (it wants struct rows), so: wholetext →
    * from_json(MapType) → explode. Single small file; parallelism comes
    * after the explode.
    */
  def load(spark: SparkSession, path: String): DataFrame = {
    spark.read.option("wholetext", "true").text(path)
      .select(from_json(col("value"), entrySchema).as("m"))
      .select(posexplode(map_values(col("m"))).as(Seq("map_pos", "arr")))
      .select(col("map_pos"), posexplode(col("arr")).as(Seq("arr_pos", "f")))
      .select(
        ((col("map_pos").cast("long") * (1L << 32) + col("arr_pos")).as("source_order") +:
          trim(col("f.name")).as("name") +:
          fieldNames.map(c => col(s"f.$c").as(c))): _*)
      .filter(col("name") =!= "")
  }

  /** A3 dedup-merge: first non-empty value per column in source order. */
  def dedupMerge(loaded: DataFrame): DataFrame = {
    def firstNonEmpty(c: String): Column =
      min_by(col(c), when(col(c).isNotNull && trim(col(c)) =!= "", col("source_order"))).as(c)
    loaded.groupBy("name")
      .agg(min("source_order").as("source_order"), fieldNames.map(firstNonEmpty): _*)
  }

  /** Full phase-1 transform: load → dedup-merge → uid (F1). Output is
    * node-shaped: (label, uid, name, fields…).
    */
  def facilityNodes(spark: SparkSession, path: String): DataFrame =
    dedupMerge(load(spark, path))
      .select(
        (lit("Facility").as("label") +:
          Uid.uid(col("name")).as("uid") +:
          col("name") +: fieldNames.map(col)): _*)
}
