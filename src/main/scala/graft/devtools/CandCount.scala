package graft.devtools

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dev-only candidate accounting for the ANN scale claims (the r6
  * verdict's task #5): how many (query, candidate) pairs the IVF
  * equi-join actually scores versus the brute-force cross count, at a
  * given corpus dir. Mirrors e05's index shape (label-seeded centroids,
  * nearest-cell assignment, nprobe=1 cell join — the assignment lines
  * restate `queries/SimilarityQueries.scala` because those helpers are
  * query-pack-private).
  *
  * Usage: tools/run.sh graft.devtools.CandCount [dir]
  */
object CandCount {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.core.GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt, "graft-candcount")
    val e = graft.core.Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("label"),
        transform(col("embedding"), x => x.cast("double")).as("v"))
    val cents = e.groupBy("label")
      .agg(graft.functions.VecOps.vecMean(col("v")).as("cv"))
      .select(col("label").as("c_label"), col("cv"))
    def cos(a: Column, b: Column): Column = call_function("cosine_sim", a, b)
    val wA = Window.partitionBy("vec_id").orderBy(desc("cs"), asc("c_label"))
    val assigned = e.join(broadcast(cents))
      .select(col("vec_id"), col("c_label"),
        round(cos(col("v"), col("cv")), 6).as("cs"))
      .withColumn("rn", row_number().over(wA)).filter(col("rn") === 1)
      .select(col("vec_id"), col("c_label").as("cell"))
    val n = e.count()
    val q = assigned.filter(col("vec_id") < 10)
      .select(col("cell"), col("vec_id").as("qid"))
    val cand = assigned.filter(col("vec_id") >= 10).join(q, Seq("cell")).count()
    val brute = (n - 10) * 10
    println(f"[cand] dir=$dir corpus=$n ivf_candidates=$cand " +
      f"brute_pairs=$brute frac=${cand.toDouble / brute}%.4f")
    spark.stop()
  }
}
