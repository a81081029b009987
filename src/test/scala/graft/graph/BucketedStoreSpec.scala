package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The bucketed graph layout's contract: after one shuffle at write
  * time, traversal joins over the stored graph run with zero runtime
  * exchanges. This is what makes iterative traversal (J8) viable at
  * 100 TB — without it every hop re-shuffles the full edge table.
  */
class BucketedStoreSpec extends SparkSpec {
  import spark.implicits._

  private def shuffles(df: DataFrame): Int = {
    df.collect()
    // AQE wraps materialized stages in leaf QueryStageExec nodes —
    // descend into them or wrapped exchanges go uncounted
    def walk(p: SparkPlan): Int = {
      val self = p match { case _: ShuffleExchangeLike => 1; case _ => 0 }
      val inner = p match {
        case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
        case q: QueryStageExec => walk(q.plan)
        case _ => 0
      }
      self + inner + p.children.map(walk).sum
    }
    walk(df.queryExecution.executedPlan)
  }

  test("hop join over uid-bucketed node/edge tables needs no exchange") {
    val nodes = (1 to 100).map(i => (s"u$i", s"node$i", "WasteItem"))
      .toDF("uid", "name", "label")
    val edges = (1 to 99).map(i => (s"u$i", s"u${i + 1}", "NEXT"))
      .toDF("src_uid", "dst_uid", "rel_type")
    GraphStore.writeNodesBucketed(nodes, "b_nodes", buckets = 4)
    GraphStore.writeEdgesBucketed(edges, "b_edges", buckets = 4)
    try {
      // force the sort-merge path: broadcast would mask the bucketing
      // (AQE has its own runtime conversion threshold — disable both)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      val hop = GraphStore.readTable(spark, "b_edges")
        .join(GraphStore.readTable(spark, "b_nodes"),
          col("src_uid") === col("uid"))
        .select("src_uid", "dst_uid", "name")
      assert(hop.count() === 99)
      assert(shuffles(hop) === 0,
        s"bucketed hop join shuffled:\n${hop.queryExecution.executedPlan}")

      // the unbucketed baseline DOES shuffle — the spec is meaningful
      val flat = edges.join(nodes, col("src_uid") === col("uid"))
      assert(shuffles(flat) > 0,
        s"expected the unbucketed join to shuffle:\n${flat.queryExecution.executedPlan}")
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS b_nodes")
      spark.sql("DROP TABLE IF EXISTS b_edges")
    }
  }
}
