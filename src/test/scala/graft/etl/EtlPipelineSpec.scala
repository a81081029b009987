package graft.etl

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.graph.GraphStore

/** Golden tests per FIXTURES.md: phase-1 facilities JSON, phase-2
  * waste-items CSV, end-to-end node/edge builds + idempotent upsert. */
class EtlPipelineSpec extends SparkSpec {

  private lazy val facilities =
    Facilities.facilityNodes(spark, fixture("disposal_map_db.json")).cache()
  private lazy val targets =
    WasteItems.loadTargets(spark, fixture("abfall_abc.csv")).cache()
  private val clock = lit("2026-01-01 00:00:00").cast("timestamp")

  test("facilities: dedup-merge by name, first-seen wins, gaps filled") {
    val rows = facilities.orderBy("name").collect()
    assert(rows.length === 2)
    val nord = rows.find(_.getAs[String]("name") == "Wertstoffhof Nord").get
    // uuid-1's address survives (first seen), uuid-2's contact fills the gap
    assert(nord.getAs[String]("address") === "Max-Holder-Str. 29 60437 Frankfurt am Main")
    assert(nord.getAs[String]("contact") === "069-12345")
    assert(nord.getAs[String]("additional_info") === "Heiligabend geschlossen")
    assert(rows.exists(_.getAs[String]("name") == "Schadstoffsammlung"))
  }

  test("facilities: uid is deterministic sha256[:16] of name") {
    val uid = facilities.filter(col("name") === "Schadstoffsammlung")
      .select("uid").head().getString(0)
    // sha256('Schadstoffsammlung') prefix, computed independently
    val expected = java.security.MessageDigest.getInstance("SHA-256")
      .digest("Schadstoffsammlung".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(16)
    assert(uid === expected)
  }

  test("waste items: section marker dropped, 8 items survive") {
    val items = WasteItems.itemNodes(targets)
    assert(items.count() === 8)
    assert(items.filter(col("name") === "A").count() === 0)
    // Unkraut ('-' disposal) is kept as a node with zero targets
    assert(items.filter(col("name") === "Unkraut").count() === 1)
  }

  test("waste items: classification and edge golden counts") {
    val cls = WasteItems.classified(targets).cache()
    val streams = WasteItems.streamNodes(cls)
    assert(streams.select("name").orderBy("name").collect().map(_.getString(0)).toSeq ===
      Seq("Altpapiertonne", "Biotonne", "Restabfalltonne"))

    val e = WasteItems.edges(cls, facilities, clock).cache()
    assert(e.filter(col("rel_type") === "DISPOSED_IN").count() === 4)
    // only facilities that exist get DISPOSED_AT edges (reference MATCH-or-warn)
    assert(e.filter(col("rel_type") === "DISPOSED_AT").count() === 3)

    val unmatched = WasteItems.unmatchedFacilities(cls, facilities)
      .orderBy("target").collect().map(_.getString(0)).toSeq
    assert(unmatched === Seq("Fachhandel / Hersteller", "Sperrmüll", "Wertstoffhof West"))
  }

  test("upsert: run-twice is a no-op (idempotent MERGE contract)") {
    import spark.implicits._
    val nodes = facilities
      .select(col("label"), col("uid"), col("name"), col("address"), col("contact"))
      .withColumn("created_at", clock).withColumn("updated_at", clock)
    val empty = nodes.limit(0)
    val props = Seq("address", "contact")
    val once = GraphStore.upsertNodes(empty, nodes, clock, props)
    val twice = GraphStore.upsertNodes(once, nodes, clock, props)
    assert(twice.count() === once.count())
    assert(twice.exceptAll(once).count() === 0)
  }

  test("upsert: non-empty incoming wins, existing preserved otherwise") {
    import spark.implicits._
    val clock2 = lit("2026-02-01 00:00:00").cast("timestamp")
    val existing = Seq(("Facility", "u1", "Alpha", "old-addr", "old-contact"))
      .toDF("label", "uid", "name", "address", "contact")
      .withColumn("created_at", clock).withColumn("updated_at", clock)
    val incoming = Seq(
      ("Facility", "u1", "Alpha", "new-addr", ""),      // update: address wins, contact kept
      ("Facility", "u2", "Beta", "b-addr", "b-contact")) // insert
      .toDF("label", "uid", "name", "address", "contact")
      .withColumn("created_at", clock2).withColumn("updated_at", clock2)
    val out = GraphStore.upsertNodes(existing, incoming, clock2, Seq("address", "contact"))
      .orderBy("uid").collect()
    assert(out.length === 2)
    val u1 = out(0)
    assert(u1.getAs[String]("address") === "new-addr")
    assert(u1.getAs[String]("contact") === "old-contact")
    assert(u1.getAs[java.sql.Timestamp]("created_at").toString.startsWith("2026-01-01"))
    assert(u1.getAs[java.sql.Timestamp]("updated_at").toString.startsWith("2026-02-01"))
    val u2 = out(1)
    assert(u2.getAs[String]("name") === "Beta")
    assert(u2.getAs[java.sql.Timestamp]("created_at").toString.startsWith("2026-02-01"))
  }

  test("graph stats: one-job per-label counts + totals") {
    val cls = WasteItems.classified(targets)
    val nodes = facilities.select("label", "uid", "name")
      .unionByName(WasteItems.itemNodes(targets))
      .unionByName(WasteItems.streamNodes(cls))
    val e = WasteItems.edges(cls, facilities, clock)
    val st = GraphStore.stats(nodes, e).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(st("Facility") === 2)
    assert(st("WasteItem") === 8)
    assert(st("WasteStream") === 3)
    assert(st("_total_nodes") === 13)
    assert(st("_total_relationships") === 7)
  }

  test("constraints: uid uniqueness validation") {
    val nodes = facilities.select("label", "uid", "name")
      .unionByName(WasteItems.itemNodes(targets))
    val v = GraphStore.validateUnique(nodes)
    assert(v.filter(!col("ok")).count() === 0)
  }

  test("expand: 1-hop pattern join resolves names on both ends") {
    val cls = WasteItems.classified(targets)
    val nodes = facilities.select("label", "uid", "name")
      .unionByName(WasteItems.itemNodes(targets))
      .unionByName(WasteItems.streamNodes(cls))
    val hop = GraphStore.expand(nodes, WasteItems.edges(cls, facilities, clock))
    val banana = hop.filter(col("src_name") === "Bananenschale").collect()
    assert(banana.length === 1)
    assert(banana(0).getAs[String]("rel_type") === "DISPOSED_IN")
    assert(banana(0).getAs[String]("dst_name") === "Biotonne")
  }

  test("orphans: items with no disposal edge") {
    val cls = WasteItems.classified(targets)
    val items = WasteItems.itemNodes(targets)
    val e = WasteItems.edges(cls, facilities, clock)
    val orphanNames = GraphStore.orphans(items, e, Seq("DISPOSED_IN", "DISPOSED_AT"))
      .select("name").orderBy("name").collect().map(_.getString(0)).toSeq
    // Unkraut: '-' → no targets; Matratze: only unmatched facility → no edge
    assert(orphanNames === Seq("Matratze", "Unkraut"))
  }
}
