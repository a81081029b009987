package graft.devtools

import org.apache.spark.sql.functions._

/** Dev-only 10×-with-skew corpus generator (the r5 verdict's task #7:
  * one empirical scale point to pin the cap/salt/band claims).
  *
  * Builds `<out>` (default /tmp/graft_scale10x) from sf0.1:
  *   - events: 20 time-shifted replicas with DISJOINT user-id ranges
  *     (~2M rows — a 20× co-click graph, 20× session/state keys), PLUS
  *     one synthetic 5,000-member celebrity click bucket (every user
  *     clicking inside one 5-minute window) — the quadratic hot-key
  *     hazard `capBuckets` exists to bound
  *   - documents: 10 replicas (~50k docs), each word suffixed with the
  *     replica id — a per-replica BIJECTION on tokens, so every
  *     replica's internal shingle/near-dup structure is preserved
  *     exactly while cross-replica shingles are fully distinct (10
  *     independent dedup problems — the honest linear scaling shape; a
  *     shared filler token instead would manufacture fake cross-doc
  *     shingles from any shared word and blow candidates up
  *     quadratically by construction)
  *   - lineitem/orders: 10 replicas with disjoint orderkey ranges
  *     (dimension keys unchanged → honest 10× per-group fan-in), plus
  *     a 200k-line giant order, a 100k-line hot part inside the
  *     p_size≤5 slice, and one hot supplier in 1997 Q1 — the skew
  *     hazards of the TPC-H-shaped q94–q99 made concrete
  *   - every other table copied through unchanged, so any SparkEntry
  *     query runs against the dir via SPARK_GRAFT_SF_DIR
  *
  * Usage: tools/run.sh graft.devtools.ScaleGen [outDir]
  */
object ScaleGen {
  def main(args: Array[String]): Unit = {
    val src = sys.env.getOrElse("SPARK_GRAFT_SRC_DIR", "/root/testdata/sf0.1")
    val out = args.headOption.getOrElse("/tmp/graft_scale10x")
    val spark = graft.core.GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt, "graft-scalegen")
    import spark.implicits._
    new java.io.File(out).mkdirs()
    // Replica multipliers (r7 verdict task 5: a 100x wave for the
    // heaviest families — set EVENTS_X/DOCS_X/EMB_X to 100). Defaults
    // reproduce the 10-20x corpus of SCALE.md 7b.
    val evX = sys.env.getOrElse("SPARK_GRAFT_EVENTS_X", "20").toInt
    val docX = sys.env.getOrElse("SPARK_GRAFT_DOCS_X", "10").toInt
    val factX = sys.env.getOrElse("SPARK_GRAFT_FACT_X", "10").toInt
    val embX = sys.env.getOrElse("SPARK_GRAFT_EMB_X", "10").toInt

    val ev = graft.core.Tables.events(spark, src).localCheckpoint(true)
    val replicas = (0 until evX).map { k =>
      ev.select(
        (col("event_id") + lit(k.toLong * 1000000000L)).as("event_id"),
        (col("ts") + expr(s"INTERVAL $k HOURS")).cast("timestamp").as("ts"),
        (col("user_id") + lit(k.toLong * 10000000L)).as("user_id"),
        col("event_type"), col("value"), col("props"))
    }.reduce(_.unionByName(_))
    // the celebrity bucket: 5,000 distinct users, one shared 5-min window
    val t0 = ev.agg(min("ts")).head().getTimestamp(0)
    val hot = spark.range(5000).select(
      (col("id") + 990000000L).as("event_id"),
      lit(t0).as("ts"), // all in bucket unix(ts) div 300
      (col("id") + 900000000L).as("user_id"),
      lit("click").as("event_type"),
      lit(1.0).as("value"),
      lit("""{"k":1}""").as("props"))
    // range-partitioned + sorted on ts: the streaming stager replays a
    // directory's parts name-ordered (part id order), so event-time
    // must ascend across parts or a watermarked stream would silently
    // drop later parts' earlier rows as late (round-10 ADVICE fix)
    replicas.unionByName(hot).repartitionByRange(32, col("ts"))
      .sortWithinPartitions("ts")
      .write.mode("overwrite").parquet(s"$out/events.parquet")

    // SPARK_GRAFT_DOCS_VERBATIM=1: replicas keep the text VERBATIM
    // (ids shifted) — the RE-CRAWL shape for composed-pipeline stress
    // (d52), where the exact-dedup stage must collapse the replicas;
    // the token bijection would instead kill the quality gate (its
    // stopwords stop matching) and starve every later stage.
    val docVerbatim = sys.env.get("SPARK_GRAFT_DOCS_VERBATIM").contains("1")
    val docs = graft.core.Tables.documents(spark, src).localCheckpoint(true)
    (0 until docX).map { k =>
      docs.select(
        (col("doc_id") + lit(k.toLong * 1000000L)).as("doc_id"),
        (if (docVerbatim) col("text")
         else regexp_replace(col("text"), "(\\S+)", s"$$1r$k")).as("text"),
        col("lang"), col("source"))
        .withColumn("n_chars", length(col("text")))
    }.reduce(_.unionByName(_)).repartition(32)
      .write.mode("overwrite").parquet(s"$out/documents.parquet")

    // 10× relational fact wave with deliberate skew — the TPC-H-shaped
    // queries' hazards made empirical: a 200k-line GIANT order (q94's
    // per-order window, q97's HAVING aggregate must collapse it
    // map-side), a 100k-line HOT part inside q96's p_size≤5 slice (its
    // window partition), and the same rows pinned to ONE supplier whose
    // shipdates land in q99's quarter (its rev aggregate's hot key).
    // Replicas keep orderkeys disjoint but leave cust/part/supp keys
    // unchanged, so every per-dimension group honestly carries 10× rows.
    val li = spark.read.parquet(s"$src/lineitem.parquet").localCheckpoint(true)
    val ord = spark.read.parquet(s"$src/orders.parquet").localCheckpoint(true)
    val liRep = (0 until factX).map { k =>
      li.withColumn("l_orderkey", col("l_orderkey") + lit(k.toLong * 100000000L))
    }.reduce(_.unionByName(_))
    val ordRep = (0 until factX).map { k =>
      ord.withColumn("o_orderkey", col("o_orderkey") + lit(k.toLong * 100000000L))
    }.reduce(_.unionByName(_))
    val hotPart = spark.read.parquet(s"$src/part.parquet")
      .filter(col("p_size") <= 5).agg(min("p_partkey")).head().getLong(0)
    val giantLines = spark.range(200000).select(
      lit(970000000L).as("l_orderkey"),
      (col("id") % 2000).cast("long").as("l_partkey"),
      (col("id") % 1000).cast("long").as("l_suppkey"),
      col("id").cast("int").as("l_linenumber"),
      lit(1.0).as("l_quantity"),
      lit(100.0).as("l_extendedprice"),
      lit(0.0).as("l_discount"), lit(0.0).as("l_tax"),
      lit("N").as("l_returnflag"), lit("O").as("l_linestatus"),
      (lit("1997-02-01").cast("timestamp") +
        expr("make_interval(0,0,0,CAST(id % 120 AS INT),0,0,0)")).as("l_shipdate"))
    val hotLines = spark.range(100000).select(
      (lit(971000000L) + (col("id") / 10)).cast("long").as("l_orderkey"),
      lit(hotPart).as("l_partkey"),
      lit(7L).as("l_suppkey"),
      (col("id") % 10).cast("int").as("l_linenumber"),
      (col("id") % 50).cast("double").as("l_quantity"),
      lit(100.0).as("l_extendedprice"),
      lit(0.0).as("l_discount"), lit(0.0).as("l_tax"),
      lit("N").as("l_returnflag"), lit("O").as("l_linestatus"),
      lit("1997-02-15").cast("timestamp").as("l_shipdate"))
    val skewOrders = spark.range(10001).select(
      (when(col("id") === 10000, 970000000L)
        .otherwise(lit(971000000L) + col("id"))).cast("long").as("o_orderkey"),
      (col("id") % 1000).cast("long").as("o_custkey"),
      lit("O").as("o_orderstatus"),
      lit(1000.0).as("o_totalprice"),
      lit("1997-01-15").cast("timestamp").as("o_orderdate"),
      lit("3-MEDIUM").as("o_orderpriority"))
    liRep.unionByName(giantLines).unionByName(hotLines).repartition(32)
      .write.mode("overwrite").parquet(s"$out/lineitem.parquet")
    ordRep.unionByName(skewOrders).repartition(32)
      .write.mode("overwrite").parquet(s"$out/orders.parquet")

    // 10× embeddings with DISJOINT vec_id ranges. Each replica applies
    // a cyclic coordinate rotation — an orthogonal transform, so every
    // pairwise cosine/dot WITHIN a replica is preserved exactly (the
    // per-replica ANN structure stays honest, same argument as the
    // documents token bijection) while replicas occupy rotated
    // subspaces. Native slice+concat — no UDF even in the devtool.
    val emb = spark.read.parquet(s"$src/embeddings.parquet").localCheckpoint(true)
    val dim = emb.select(size(col("embedding"))).head().getInt(0)
    (0 until embX).map { k =>
      val r = k % dim
      val rotated =
        if (r == 0) col("embedding")
        else concat(slice(col("embedding"), r + 1, dim - r),
          slice(col("embedding"), 1, r))
      // past dim replicas the rotation repeats — compose a global sign
      // flip (also orthogonal: intra-replica cosines exactly preserved)
      // so replica k and k+dim never carry IDENTICAL vectors
      val oriented =
        if ((k / dim) % 2 == 1)
          transform(rotated, x => (x * lit(-1.0)).cast("float"))
        else rotated
      emb.select(
        (col("vec_id") + lit(k.toLong * 1000000L)).as("vec_id"),
        oriented.as("embedding"),
        col("label"))
    }.reduce(_.unionByName(_)).repartition(32)
      .write.mode("overwrite").parquet(s"$out/embeddings.parquet")

    // CUST_X > 1 (round-9: the g24 HITS / dim-graph 100× wave):
    // replicate customer+supplier with DISJOINT keys but UNCHANGED
    // nationkeys — the graph grows 100× hub-shaped (all replicas point
    // at the same 25 nations), exactly the worst case for an
    // authority/hub fixpoint. nation/region/part stay verbatim.
    val custX = sys.env.getOrElse("SPARK_GRAFT_CUST_X", "1").toInt
    if (custX > 1) {
      // k=0 stays VERBATIM (like region/nation/part) so name-suffix
      // predicates (LIKE '%01' gates) keep their base-corpus
      // selectivity on the stress corpus; only replicas get #rk
      val cust = spark.read.parquet(s"$src/customer.parquet").localCheckpoint(true)
      (0 until custX).map { k =>
        val keyed = cust.withColumn("c_custkey",
          col("c_custkey") + lit(k.toLong * 100000000L))
        if (k == 0) keyed
        else keyed.withColumn("c_name", concat(col("c_name"), lit(s"#r$k")))
      }.reduce(_.unionByName(_)).repartition(32)
        .write.mode("overwrite").parquet(s"$out/customer.parquet")
      val supp = spark.read.parquet(s"$src/supplier.parquet").localCheckpoint(true)
      (0 until custX).map { k =>
        val keyed = supp.withColumn("s_suppkey",
          col("s_suppkey") + lit(k.toLong * 100000000L))
        if (k == 0) keyed
        else keyed.withColumn("s_name", concat(col("s_name"), lit(s"#r$k")))
      }.reduce(_.unionByName(_)).repartition(32)
        .write.mode("overwrite").parquet(s"$out/supplier.parquet")
    }
    val dimCopies =
      if (custX > 1) Seq("region", "nation", "part")
      else Seq("region", "nation", "customer", "supplier", "part")
    for (t <- dimCopies) {
      java.nio.file.Files.copy(
        java.nio.file.Paths.get(s"$src/$t.parquet"),
        java.nio.file.Paths.get(s"$out/$t.parquet"),
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    }
    println(s"[scalegen] wrote $out: events=" +
      spark.read.parquet(s"$out/events.parquet").count() +
      " documents=" + spark.read.parquet(s"$out/documents.parquet").count() +
      " lineitem=" + spark.read.parquet(s"$out/lineitem.parquet").count() +
      " orders=" + spark.read.parquet(s"$out/orders.parquet").count())
    spark.stop()
  }
}
