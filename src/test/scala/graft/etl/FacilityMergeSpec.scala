package graft.etl

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.SparkSpec

/** A3 equivalence: the custom Aggregator and the declarative min_by
  * merge implement the same first-seen-fills-gaps contract. */
class FacilityMergeSpec extends SparkSpec {
  import spark.implicits._

  private def recGen: Gen[FacilityRec] = for {
    order <- Gen.chooseNum(0L, 50L)
    name <- Gen.oneOf("A", "B", "C")
    f <- Gen.listOfN(5, Gen.oneOf("", "x", "y", "  ", "z"))
  } yield FacilityRec(order, name, f(0), f(1), f(2), f(3), f(4))

  test("aggregator matches declarative min_by merge on random data") {
    val prop = Prop.forAll(Gen.listOfN(30, recGen)) { recs0 =>
      // unique (name, order) pairs so both sides have a deterministic input order
      val recs = recs0.groupBy(r => (r.name, r.source_order)).map(_._2.head).toSeq
      recs.isEmpty || {
        val df = recs.toDF()
        // declarative path (Facilities.dedupMerge semantics, minus trim-filter)
        def firstNonEmpty(c: String) =
          min_by(col(c), when(col(c).isNotNull && trim(col(c)) =!= "", col("source_order"))).as(c)
        val declarative = df.groupBy("name")
          .agg(min("source_order").as("source_order"),
            Facilities.fieldNames.map(firstNonEmpty): _*)
          .collect().map(r => (r.getAs[String]("name"),
            Facilities.fieldNames.map(f => Option(r.getAs[String](f)).filter(_.trim.nonEmpty)))).toMap
        // typed Aggregator path
        val agged = df.as[FacilityRec].groupByKey(_.name)
          .agg(FacilityMergeAggregator.toColumn)
          .collect().map { case (name, rec) =>
            (name, Seq(rec.address, rec.opening_hours, rec.contact, rec.additional_info, rec.link)
              .map(Option(_).filter(_.trim.nonEmpty)))
          }.toMap
        declarative == agged
      }
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(20), prop)
    assert(res.passed, res.status.toString)
  }
}
