package graft.functions

import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.SparkSpec

/** The native kernels must agree bit-for-bit with the declarative SQL
  * formulations they replaced (which are what the DuckDB oracles mirror).
  */
class TextKernelsSpec extends SparkSpec {

  override def beforeAll(): Unit = {
    super.beforeAll()
    graft.GraftExtensions.register(spark)
  }

  test("simhash60 equals the higher-order aggregate formulation") {
    import spark.implicits._
    val docs = Seq(
      "the quick brown fox jumps over the lazy dog",
      "the quick brown fox jumped over the lazy dog",
      "einzelner",
      "ÄÖÜ umlauts ß unicode ﬀ ligature",
      "a b c d e f g h i j k l m n o p q r s t u v w x y z",
      "repeated repeated repeated repeated")
    val df = docs.toDF("text").selectExpr("split(lower(trim(text)), '\\\\s+') AS w")
    val native = df.selectExpr("simhash60(w) AS h").as[Long].collect()
    val sql = df.selectExpr(
      "transform(w, x -> CAST(conv(substring(md5(x), 1, 15), 16, 10) AS BIGINT)) AS hs")
      .selectExpr(
        """aggregate(sequence(0, 59), CAST(0 AS BIGINT), (acc, b) -> acc +
          |  IF(aggregate(hs, 0, (v, h) -> v + IF((shiftright(h, b) & 1) = 1, 1, -1)) > 0,
          |     shiftleft(CAST(1 AS BIGINT), b), CAST(0 AS BIGINT))) AS h""".stripMargin)
      .as[Long].collect()
    assert(native.toSeq == sql.toSeq)
  }

  test("simhash60 property: equals SQL fold on arbitrary token arrays") {
    import spark.implicits._
    val tokens = Gen.listOfN(12, Gen.alphaNumStr.suchThat(_.nonEmpty))
    val prop = Prop.forAll(Gen.listOf(tokens).map(_.take(8))) { docs0 =>
      val docs = docs0.filter(_.nonEmpty)
      docs.isEmpty || {
        val df = docs.map(_.toArray).toDF("w")
        val native = df.selectExpr("simhash60(w) AS h").as[Long].collect().toSeq
        val sql = df.selectExpr(
          "transform(w, x -> CAST(conv(substring(md5(x), 1, 15), 16, 10) AS BIGINT)) AS hs")
          .selectExpr(
            """aggregate(sequence(0, 59), CAST(0 AS BIGINT), (acc, b) -> acc +
              |  IF(aggregate(hs, 0, (v, h) -> v + IF((shiftright(h, b) & 1) = 1, 1, -1)) > 0,
              |     shiftleft(CAST(1 AS BIGINT), b), CAST(0 AS BIGINT))) AS h""".stripMargin)
          .as[Long].collect().toSeq
        native == sql
      }
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(20), prop)
    assert(res.passed, res.status.toString)
  }

  test("simhash60 of empty token list is 0; null array is null") {
    import spark.implicits._
    val df = Seq((1, Some(Seq.empty[String])), (2, None))
      .toDF("id", "w")
    val rows = df.selectExpr("id", "simhash60(w) AS h").orderBy("id").collect()
    assert(rows(0).getLong(1) == 0L)
    assert(rows(1).isNullAt(1))
  }

  test("minhash16 equals the explode + groupBy min(md5) formulation") {
    import spark.implicits._
    val docs = Seq(
      (1L, Seq("alpha beta gamma", "beta gamma delta", "gamma delta epsilon")),
      (2L, Seq("single shingle")),
      (3L, Seq("ÄÖÜ umlauts ß", "unicode ﬀ tokens", "ÄÖÜ umlauts ß")))
    val df = docs.toDF("doc_id", "shingles")
    val native = df.selectExpr("doc_id", "minhash16(shingles) AS mh")
      .orderBy("doc_id").as[(Long, Seq[String])].collect().toSeq
    val mhCols = (0 until 16).map(j =>
      org.apache.spark.sql.functions.min(
        org.apache.spark.sql.functions.md5(org.apache.spark.sql.functions.concat(
          org.apache.spark.sql.functions.lit(s"$j:"),
          org.apache.spark.sql.functions.col("s")))).as(s"mh$j"))
    val agg = df.selectExpr("doc_id", "explode(shingles) AS s")
      .groupBy("doc_id").agg(mhCols.head, mhCols.tail: _*)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), (1 to 16).map(i => r.getString(i)))).toSeq
    assert(native.map { case (id, mh) => (id, mh.toSeq) } === agg)
  }

  test("minhash16 property: equals agg formulation on arbitrary shingle sets") {
    import spark.implicits._
    val shingle = Gen.alphaNumStr.suchThat(_.nonEmpty)
    val prop = Prop.forAll(Gen.nonEmptyListOf(shingle).map(_.take(10))) { sh =>
      val df = Seq((1L, sh)).toDF("doc_id", "shingles")
      val native = df.selectExpr("minhash16(shingles) AS mh")
        .as[Seq[String]].head().toSeq
      val cols = (0 until 16).map(j => org.apache.spark.sql.functions.min(
        org.apache.spark.sql.functions.expr(s"md5(concat('$j:', s))")).as(s"m$j"))
      val agg = df.selectExpr("doc_id", "explode(shingles) AS s")
        .groupBy("doc_id")
        .agg(cols.head, cols.tail: _*)
        .collect().head
      native === (1 to 16).map(agg.getString)
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(15), prop)
    assert(res.passed, res.status.toString)
  }

  test("minhash16 of empty array is null") {
    import spark.implicits._
    val rows = Seq((1, Seq.empty[String]))
      .toDF("id", "shingles")
      .selectExpr("minhash16(shingles) AS mh").collect()
    assert(rows(0).isNullAt(0))
  }

  test("cosine_sim equals the sequential fold, including norm order") {
    import spark.implicits._
    val gen = Gen.listOfN(16, Gen.chooseNum(-5.0, 5.0).suchThat(v => !v.isNaN))
    val prop = Prop.forAll(gen, gen) { (a, b) =>
      Prop(a.exists(_ != 0.0) && b.exists(_ != 0.0)) ==> Prop {
        val got = Seq((a.toArray, b.toArray)).toDF("a", "b")
          .selectExpr("cosine_sim(a, b) AS c").as[Double].head()
        var dot = 0.0; var na = 0.0; var nb = 0.0
        a.indices.foreach { i => dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i) }
        val want = dot / (math.sqrt(na) * math.sqrt(nb))
        got == want // bit-exact, not approx: same fold order
      }
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(50), prop)
    assert(res.passed, res.status.toString)
  }

  test("cosine_sim of identical vectors is 1.0 within fp noise") {
    import spark.implicits._
    val v = Array(0.3, -1.2, 4.5, 0.0, 2.2)
    val got = Seq((v, v)).toDF("a", "b").selectExpr("cosine_sim(a, b) AS c")
      .as[Double].head()
    assert(math.abs(got - 1.0) < 1e-12)
  }

  test("interpreted fallback (NO_CODEGEN) matches the codegen path for every kernel") {
    import spark.implicits._
    // Spark silently falls back to interpreted expression evaluation
    // when codegen fails (e.g. a 64KB method-limit blowup elsewhere in
    // the stage) — nullSafeEval must produce the same bits as doGenCode
    // or production results would flap with plan shape. Includes a null
    // token inside the array (the documented −1-votes / skip cases).
    val df = Seq(
      (Seq("foo", "bar", "baz"), Seq(1.0, -2.0, 3.0), Seq(0.5, 2.0, -1.0)),
      (Seq("foo", null, "zz"), Seq(0.1, 0.2, 0.3), Seq(0.3, 0.2, 0.1)))
      .toDF("w", "a", "b")
    val exprs = Seq("simhash60(w) AS sh", "minhash16(w) AS mh",
      "cosine_sim(a, b) AS cs", "consume_once_extract(array_join(w, ' ')) AS ce")
    val withCodegen = df.selectExpr(exprs: _*).collect().map(_.toSeq)
    val conf = spark.conf
    val prevFactory = conf.get("spark.sql.codegen.factoryMode", "FALLBACK")
    val prevWhole = conf.get("spark.sql.codegen.wholeStage", "true")
    try {
      conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
      conf.set("spark.sql.codegen.wholeStage", "false")
      val interpreted = df.selectExpr(exprs: _*).collect().map(_.toSeq)
      assert(interpreted.toSeq === withCodegen.toSeq)
    } finally {
      conf.set("spark.sql.codegen.factoryMode", prevFactory)
      conf.set("spark.sql.codegen.wholeStage", prevWhole)
    }
  }
}
