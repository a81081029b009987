package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.SparkSpec
import graft.etl.WasteParse

/** The codegen'd expression must agree with the pure function (and so
  * with the UDF path) on arbitrary input, and be SQL-callable. */
class ConsumeOnceExtractSpec extends SparkSpec {

  override def beforeAll(): Unit = {
    super.beforeAll()
    graft.GraftExtensions.register(spark)
  }

  private def ex(c: String): Column = expr(s"consume_once_extract($c)")

  test("expression equals pure function on fixture inputs") {
    import spark.implicits._
    val inputs = Seq(
      "Wertstoffhof Nord Wertstoffhof West Schadstoffsammlung",
      "Verpackungstonne (Gelbe Tonne)",
      "Self Service am Wertstoffhof Nord",
      "BIOTONNE biotonne Biotonne",
      "", "no match here", "Sperrmüll easi GWR GmbH")
    val df = inputs.toDF("s")
    val got = df.select(ex("s").as("out")).collect().map(_.getSeq[String](0).toList)
    val want = inputs.map(WasteParse.extractFromConcat(_).toList)
    assert(got.toSeq === want)
  }

  test("null-safe: null input yields null, not a crash") {
    import spark.implicits._
    val df = Seq[Option[String]](Some("Biotonne"), None).toDF("s")
    val got = df.select(ex("s").as("out")).collect()
    assert(got(0).getSeq[String](0) === Seq("Biotonne"))
    assert(got(1).isNullAt(0))
  }

  test("participates in whole-stage codegen (no ScalaUDF in plan)") {
    // LocalTableScan short-circuits codegen — use a range scan so a
    // WholeStageCodegen stage actually forms around the expression.
    val df = spark.range(5)
      .select(concat(lit("Biotonne "), col("id").cast("string")).as("s"))
      .select(ex("s").as("out"))
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("ScalaUDF"))
    val codegen = org.apache.spark.sql.execution.debug.codegenString(df.queryExecution.executedPlan)
    assert(codegen.contains("Found 1 WholeStageCodegen"), codegen.take(200))
    assert(codegen.contains("ConsumeOnceExtract.extract"),
      "expected inline static call in generated code")
    assert(df.collect().forall(_.getSeq[String](0) == Seq("Biotonne")))
  }

  test("property: expression equals pure function on random strings") {
    import spark.implicits._
    val fragGen = Gen.oneOf(
      Gen.oneOf(WasteParse.knownFacilityNames),
      Gen.alphaNumStr.map(_.take(12)),
      Gen.oneOf(" ", "\t", "/", "(", ")"))
    val textGen = Gen.listOf(fragGen).map(_.mkString(" ")).map(_.take(200))
    val prop = Prop.forAll(Gen.listOfN(40, textGen)) { texts =>
      val df = texts.toDF("s")
      val got = df.select(ex("s").as("out")).collect().map(_.getSeq[String](0).toList).toList
      got == texts.map(WasteParse.extractFromConcat(_).toList)
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(10), prop)
    assert(res.passed, res.status.toString)
  }
}
