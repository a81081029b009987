package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Spark's native ORC path (q100's format cell): value fidelity on a
  * typed round trip and the scan contract — the pushed predicate and
  * pruned ReadSchema must reach the ORC scan exactly as they do for
  * parquet, or a 100 TB "read their lakehouse" job degrades to a full
  * scan of every column.
  */
class OrcSpec extends SparkSpec {
  import spark.implicits._

  private def rmTree(p: java.nio.file.Path): Unit = {
    import scala.jdk.CollectionConverters._
    Files.walk(p).iterator().asScala.toSeq.reverse.foreach(Files.deleteIfExists(_))
  }

  test("typed round trip preserves values; filter and pruning reach the ORC scan") {
    val tmp = Files.createTempDirectory("graft-orc-spec")
    try {
      val src = Seq(
        (1L, "A", 10.5, java.sql.Timestamp.valueOf("1997-01-02 00:00:00")),
        (2L, "B", 20.25, java.sql.Timestamp.valueOf("1996-06-01 00:00:00")),
        (3L, "A", 0.75, java.sql.Timestamp.valueOf("1998-03-04 00:00:00")))
        .toDF("k", "flag", "v", "ts")
      src.repartition(2).write.mode("overwrite").orc(tmp.toString)

      val back = spark.read.orc(tmp.toString)
      assert(back.schema("k").dataType.typeName === "long")
      assert(back.schema("ts").dataType.typeName === "timestamp")

      val q = back
        .filter(col("ts") >= lit("1997-01-01").cast("timestamp"))
        .select("k", "flag")
      assert(q.as[(Long, String)].collect().toSet === Set((1L, "A"), (3L, "A")))

      val plan = q.queryExecution.executedPlan.toString
      assert(plan.contains("PushedFilters") &&
        plan.contains("GreaterThanOrEqual(ts"),
        s"date bound not pushed into the ORC scan:\n$plan")
      val readSchema = plan.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
      assert(!readSchema.contains("v:double"),
        s"ORC scan reads the pruned measure column: $readSchema")
    } finally rmTree(tmp)
  }
}
