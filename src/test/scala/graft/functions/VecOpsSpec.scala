package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** vec_mean must agree with the posexplode + per-dim avg formulation it
  * replaced (modulo fp summation order — both are unordered partial
  * aggs, so compare at 1e-12). */
class VecOpsSpec extends SparkSpec {
  import spark.implicits._

  test("vec_mean equals posexplode + avg per dimension") {
    val df = Seq(
      ("a", Seq(1.0, 2.0, 3.0)),
      ("a", Seq(3.0, 0.0, -1.0)),
      ("a", Seq(-0.5, 1.5, 2.5)),
      ("b", Seq(10.0, 20.0, 30.0)))
      .toDF("label", "v").repartition(4)
    val viaAgg = df.groupBy("label").agg(VecOps.vecMean(col("v")).as("cv"))
      .orderBy("label").as[(String, Seq[Double])].collect()
    val viaExplode = df.select(col("label"), posexplode(col("v")).as(Seq("dim", "x")))
      .groupBy("label", "dim").agg(avg("x").as("m"))
      .groupBy("label").agg(array_sort(collect_list(struct(col("dim"), col("m")))).as("dm"))
      .select(col("label"), expr("transform(dm, s -> s.m)").as("cv"))
      .orderBy("label").as[(String, Seq[Double])].collect()
    assert(viaAgg.map(_._1).toSeq === viaExplode.map(_._1).toSeq)
    viaAgg.zip(viaExplode).foreach { case ((_, a), (_, b)) =>
      assert(a.size === b.size)
      a.zip(b).foreach { case (x, y) => assert(math.abs(x - y) < 1e-12) }
    }
  }

  test("vec_mean skips null vectors and averages ragged dims per-count") {
    val df = Seq(
      ("a", Some(Seq(2.0, 4.0))),
      ("a", None),
      ("a", Some(Seq(4.0, 8.0, 12.0))))
      .toDF("label", "v").repartition(3)
    val out = df.groupBy("label").agg(VecOps.vecMean(col("v")).as("cv"))
      .as[(String, Seq[Double])].collect().head
    // dim 0/1 averaged over the 2 non-null vectors; dim 2 over the 1
    // that has it — the posexplode + per-dim avg semantics
    assert(out === (("a", Seq(3.0, 6.0, 12.0))))
  }

  test("vec_mean skips null ELEMENTS like avg does, not just null vectors") {
    val df = Seq(
      ("a", Seq[java.lang.Double](1.0, null, 3.0)),
      ("a", Seq[java.lang.Double](3.0, 6.0, 5.0)))
      .toDF("label", "v").repartition(2)
    val out = df.groupBy("label").agg(VecOps.vecMean(col("v")).as("cv"))
      .as[(String, Seq[Double])].collect().head
    // dim 1 averages over the single non-null value — one bad row must
    // not fail the job (primitive encoders NPE on null elements)
    assert(out === (("a", Seq(2.0, 6.0, 4.0))))
  }

  test("vec_mean of a single vector is the vector; empty group absent") {
    val df = Seq(("solo", Seq(4.0, -2.0))).toDF("label", "v")
    val out = df.groupBy("label").agg(VecOps.vecMean(col("v")).as("cv"))
      .as[(String, Seq[Double])].collect()
    assert(out.toSeq === Seq(("solo", Seq(4.0, -2.0))))
  }
}
