package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The SemDeDup verdict kernel (e20/e21) on hand-built assignments:
  * greedy keep-first, earliest-mate removal plan, strict within-cell
  * scoping, threshold boundary behavior.
  */
class SemDedupSpec extends SparkSpec {
  import spark.implicits._

  private def verdicts(tau: Double, rows: (Long, Seq[Double], String)*) = {
    val assigned = rows.toSeq.toDF("vec_id", "v0", "cell")
      .select(col("vec_id"),
        transform(col("v0"), x => x.cast("double")).as("v"), col("cell"))
    SimilarityQueries.semDup(assigned, tau).collect()
      .map(r => r.getAs[Long]("vec_id") ->
        ((Option(r.getAs[java.lang.Long]("dup_of")).map(_.toLong),
          r.getAs[Boolean]("is_dup")))).toMap
  }

  test("greedy keep-first: the earliest cluster-mate wins as dup_of") {
    val got = verdicts(0.9,
      (1L, Seq(1.0, 0.0), "a"),
      (2L, Seq(1.0, 0.0), "a"),   // dup of 1
      (3L, Seq(0.99, 0.14), "a"), // cos≈0.99 with both → dup of 1 (min)
      (4L, Seq(0.0, 1.0), "a"),   // orthogonal → kept
      (5L, Seq(1.0, 0.0), "b"))   // identical to 1 but another CELL → kept
    assert(got(1L) === ((None, false)))
    assert(got(2L) === ((Some(1L), true)))
    assert(got(3L) === ((Some(1L), true)))
    assert(got(4L) === ((None, false)))
    assert(got(5L) === ((None, false)))
  }

  test("threshold boundary: cos rounds to 6 decimals before the >= tau test") {
    // cos((1,0),(0.6,0.8)) = 0.6 exactly — kept at tau just above,
    // dropped at tau equal
    val keep = verdicts(0.600001,
      (1L, Seq(1.0, 0.0), "a"), (2L, Seq(0.6, 0.8), "a"))
    assert(keep(2L) === ((None, false)))
    val drop = verdicts(0.6,
      (1L, Seq(1.0, 0.0), "a"), (2L, Seq(0.6, 0.8), "a"))
    assert(drop(2L) === ((Some(1L), true)))
  }

  test("dup chains do not cascade: a dup's own mates still key on ids, not survival") {
    // 2 dups 1; 3 is near 2 only — Neo4j-free design decision, but the
    // kernel's law is documented: dup_of = earliest ABOVE-tau mate by
    // id, whether or not that mate itself survived
    val got = verdicts(0.9,
      (1L, Seq(1.0, 0.0), "a"),
      (2L, Seq(1.0, 0.0), "a"),
      (3L, Seq(1.0, 0.001), "a"))
    assert(got(3L)._1 === Some(1L)) // min mate, not the chain parent
  }
}
