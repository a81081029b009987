package graft.sources

import java.nio.file.Files
import java.sql.{Date, Timestamp}

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.SparkSpec

/** The zero-egress Avro container source: a full-typed round trip
  * (long/int/double/float/boolean/string/binary/timestamp/date plus
  * nulls in every slot), the partitioned writer's one-container-per-
  * partition layout, schema fidelity on read-back, and the loud
  * unsupported-type error.
  */
class AvroSourceSpec extends SparkSpec {

  private def rmTree(p: java.nio.file.Path): Unit = {
    import scala.jdk.CollectionConverters._
    Files.walk(p).iterator().asScala.toSeq.reverse.foreach(Files.deleteIfExists(_))
  }

  private val schema = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("n", IntegerType, nullable = true),
    StructField("d", DoubleType, nullable = true),
    StructField("f", FloatType, nullable = true),
    StructField("b", BooleanType, nullable = true),
    StructField("s", StringType, nullable = true),
    StructField("bin", BinaryType, nullable = true),
    StructField("ts", TimestampType, nullable = true),
    StructField("dt", DateType, nullable = true)))

  private val rows = Seq(
    Row(1L, 7, 2.5, 1.25f, true, "alpha", Array[Byte](1, 2, 3),
      Timestamp.valueOf("2024-06-01 12:34:56.123456"), Date.valueOf("2024-06-01")),
    Row(2L, null, null, null, null, null, null, null, null),
    Row(3L, -1, -0.5, 0f, false, "ümläut é", Array.empty[Byte],
      Timestamp.valueOf("1969-12-31 23:59:59.999999"), Date.valueOf("1969-12-31")))

  test("typed round trip: every bridged type plus nulls survives exactly") {
    val tmp = Files.createTempDirectory("avro-spec")
    try {
      val df = spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 2), schema)
      AvroSource.write(df, tmp.toString)
      val back = AvroSource.read(spark, tmp.toString + "/*.avro")
      assert(back.schema.fields.map(f => (f.name, f.dataType)).toSeq ===
        schema.fields.map(f => (f.name, f.dataType)).toSeq)
      val got = back.collect().sortBy(_.getLong(0))
      assert(got.length === 3)
      val r1 = got(0)
      assert(r1.getInt(1) === 7 && r1.getDouble(2) === 2.5 && r1.getFloat(3) === 1.25f)
      assert(r1.getBoolean(4) && r1.getString(5) === "alpha")
      assert(r1.getAs[Array[Byte]](6).toSeq === Seq[Byte](1, 2, 3))
      assert(r1.getTimestamp(7) === Timestamp.valueOf("2024-06-01 12:34:56.123456"))
      assert(r1.getDate(8) === Date.valueOf("2024-06-01"))
      assert((1 until 9).forall(got(1).isNullAt))
      val r3 = got(2)
      assert(r3.getString(5) === "ümläut é")
      // negative-epoch micros: floorDiv/floorMod, not truncation
      assert(r3.getTimestamp(7) === Timestamp.valueOf("1969-12-31 23:59:59.999999"))
      assert(r3.getDate(8) === Date.valueOf("1969-12-31"))
    } finally rmTree(tmp)
  }

  test("partitioned layout: one container per non-empty partition") {
    val tmp = Files.createTempDirectory("avro-parts")
    try {
      import spark.implicits._
      val df = (1 to 100).toDF("v").repartition(5)
      AvroSource.write(df, tmp.toString)
      import scala.jdk.CollectionConverters._
      // Hadoop's local FS adds .crc sidecars; count the containers only
      val parts = Files.list(tmp).iterator().asScala
        .count(_.toString.endsWith(".avro"))
      assert(parts === 5)
      val back = AvroSource.read(spark, tmp.toString + "/*.avro")
      assert(back.agg(org.apache.spark.sql.functions.sum("v")).head().getLong(0) === 5050L)
    } finally rmTree(tmp)
  }

  test("randomized round trips: seeded random rows over the full type bridge survive exactly") {
    val rnd = new scala.util.Random(42) // fixed seed — reproducible failures
    for (trial <- 1 to 3) {
      val tmp = Files.createTempDirectory(s"avro-prop-$trial")
      try {
        val n = 40 + rnd.nextInt(40)
        val data = (0 until n).map { i =>
          def maybe[A <: AnyRef](v: => A): A = if (rnd.nextInt(5) == 0) null.asInstanceOf[A] else v
          Row(i.toLong,
            maybe(java.lang.Integer.valueOf(rnd.nextInt())),
            maybe(java.lang.Double.valueOf(rnd.nextDouble() * 1e6 - 5e5)),
            maybe(java.lang.Float.valueOf(rnd.nextFloat())),
            maybe(java.lang.Boolean.valueOf(rnd.nextBoolean())),
            maybe(rnd.alphanumeric.take(rnd.nextInt(30)).mkString + "é€"),
            maybe { val a = new Array[Byte](rnd.nextInt(16)); rnd.nextBytes(a); a },
            maybe(new Timestamp(rnd.nextLong() % 4102444800000L)),
            maybe(Date.valueOf(java.time.LocalDate.ofEpochDay(rnd.nextInt(40000) - 5000L))))
        }
        val df = spark.createDataFrame(
          spark.sparkContext.parallelize(data, 3), schema)
        AvroSource.write(df, tmp.toString)
        val back = AvroSource.read(spark, tmp.toString + "/*.avro")
          .collect().sortBy(_.getLong(0))
        val exp = data.sortBy(_.getLong(0))
        assert(back.length === exp.length, s"trial $trial")
        back.zip(exp).foreach { case (g, e) =>
          (0 until schema.length).foreach { i =>
            (g.get(i), e.get(i)) match {
              case (null, null) =>
              case (ga: Array[Byte], ea: Array[Byte]) =>
                assert(ga.toSeq === ea.toSeq, s"trial $trial col $i row ${e.get(0)}")
              case (gt: Timestamp, et: Timestamp) =>
                // avro carries micros; java.sql.Timestamp nanos truncate
                assert(gt.getTime === et.getTime &&
                  gt.getNanos / 1000 === et.getNanos / 1000,
                  s"trial $trial col $i row ${e.get(0)}")
              case (gv, ev) => assert(gv === ev, s"trial $trial col $i row ${e.get(0)}")
            }
          }
        }
      } finally rmTree(tmp)
    }
  }

  test("unsupported column type fails loudly, naming the column") {
    import spark.implicits._
    val df = Seq((1L, BigDecimal(1.5))).toDF("id", "dec")
    val e = intercept[RuntimeException](AvroSource.write(df, "/tmp/never"))
    assert(e.getMessage.contains("dec"))
  }
}
