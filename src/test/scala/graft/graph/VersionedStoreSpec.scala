package graft.graph

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The SCD-2 laws of the versioned node store: versions tile time with
  * no gaps/overlaps, replayed batches write nothing, history grows with
  * the change rate, and as-of reads reconstruct every instant.
  */
class VersionedStoreSpec extends SparkSpec {
  import spark.implicits._

  private def t(s: String) = to_timestamp(lit(s))

  private lazy val h3 = {
    val b1 = Seq(("a", "x"), ("b", "x"), ("c", "x")).toDF("uid", "p")
    val b2 = Seq(("a", "y"), ("b", "x")).toDF("uid", "p") // a changes, b restated
    val b3 = Seq(("a", "y"), ("c", "z"), ("d", "w")).toDF("uid", "p") // c changes, d new
    var h = VersionedStore.init(b1, Seq("p"), t("2024-01-01 00:00:00"))
    h = VersionedStore.upsert(h, b2, Seq("p"), t("2024-02-01 00:00:00"))
    VersionedStore.upsert(h, b3, Seq("p"), t("2024-03-01 00:00:00"))
      .localCheckpoint(true)
  }

  test("history grows with the change rate; restated values write nothing") {
    // 3 initial + a@t2 + c@t3 + d@t3 = 6; b's restatement and a's are no-ops
    assert(h3.count() === 6)
    assert(h3.filter(col("uid") === "b").count() === 1)
    assert(h3.filter(col("uid") === "a").count() === 2)
  }

  test("versions tile time: one current per uid, no overlaps or gaps") {
    val cur = h3.filter(col("valid_to").isNull).groupBy("uid").count()
    assert(cur.filter(col("count") =!= 1).count() === 0)
    // each closed version's valid_to equals the next version's valid_from
    val rows = h3.orderBy("uid", "valid_from")
      .select("uid", "valid_from", "valid_to").collect()
    rows.groupBy(_.getString(0)).foreach { case (uid, vs) =>
      vs.sortBy(_.getTimestamp(1).getTime).sliding(2).foreach {
        case Array(prev, next) =>
          assert(prev.getTimestamp(2) === next.getTimestamp(1), s"gap at $uid")
        case _ =>
      }
    }
  }

  test("as-of reads reconstruct each instant; replay is idempotent") {
    def state(at: String) = VersionedStore.asOf(h3, t(at))
      .select("uid", "p").as[(String, String)].collect().toSet
    assert(state("2024-01-15 00:00:00") === Set("a" -> "x", "b" -> "x", "c" -> "x"))
    assert(state("2024-02-15 00:00:00") === Set("a" -> "y", "b" -> "x", "c" -> "x"))
    assert(state("2024-03-15 00:00:00") ===
      Set("a" -> "y", "b" -> "x", "c" -> "z", "d" -> "w"))
    // boundary: at exactly t2, the new version wins (valid_to exclusive)
    assert(state("2024-02-01 00:00:00").contains("a" -> "y"))
    // replaying batch 3 at a later stamp changes nothing
    val b3 = Seq(("a", "y"), ("c", "z"), ("d", "w")).toDF("uid", "p")
    val replayed = VersionedStore.upsert(h3, b3, Seq("p"), t("2024-04-01 00:00:00"))
    assert(replayed.count() === h3.count())
  }
}
