package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Similarity search over the `embeddings` table (vec_id, embedding:
  * Array[Float] 64-dim, label) — ANN building blocks for a training-data
  * pipeline: brute-force cosine top-k (exactness baseline), IVF-style
  * centroid assignment, and sign-LSH bucketed search (the scale path).
  *
  * All vector math is per-row higher-order functions over arrays cast to
  * double — codegen'd, sequential fold order, so DuckDB replicates it
  * bit-for-bit (rounded to 6 decimals for cross-engine safety).
  *
  * Scale notes: brute force is O(Q·N·d) — fine for small Q (re-ranking),
  * never for all-pairs; the LSH/IVF variants cut the candidate set via
  * an equi-join on bucket/centroid id, which is the only join shape that
  * survives 100 TB (no cross join, no driver collect of vectors).
  */
object SimilarityQueries extends QueryPack {

  private def emb(s: SparkSession, dir: String): DataFrame =
    Tables.embeddings(s, dir)
      .select(col("vec_id"), col("label"),
        transform(col("embedding"), x => x.cast("double")).as("v"))

  /** Cosine kernel: the native codegen expression
    * [[graft.functions.CosineSim]] (same sequential double fold as the
    * SQL-side `list_sum(list_transform(...))`, bit-identical results).
    * Versus a Scala UDF: no CatalystTypeConverter Seq[Double] copy per
    * row, and it participates in whole-stage codegen. The declarative
    * bucketing/joins around it stay in Catalyst (SURVEY §2.9: drop to
    * scalar kernels only where codegen can't reach).
    */
  private def cosine(a: Column, b: Column): Column = call_function("cosine_sim", a, b)

  /** e01 — brute-force cosine top-k: 3 query vectors against the rest,
    * top-5 each by (rounded cosine desc, vec_id). The queries side is a
    * broadcast; the candidate scan stays distributed.
    */
  def e01KnnBrute(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir)
    val q = e.filter(col("vec_id") < 3)
      .select(col("vec_id").as("query_id"), col("v").as("qv"))
    val c = e.filter(col("vec_id") >= 3)
      .select(col("vec_id").as("cand_id"), col("v").as("cv"))
    val scored = c.join(broadcast(q))
      .select(col("query_id"), col("cand_id"),
        round(cosine(col("qv"), col("cv")), 6).as("cos_sim"))
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("query_id").orderBy(desc("cos_sim"), asc("cand_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 5)
      .select("query_id", "rank", "cand_id", "cos_sim")
      .orderBy("query_id", "rank")
  }

  /** e02 — IVF building block: per-label centroids (the [[centroids]]
    * vec_mean Aggregator — one shuffle of fixed-size buffers), then
    * nearest-centroid assignment for a query subset. At scale the
    * centroid table is tiny → broadcast.
    */
  def e02CentroidAssign(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir)
    val q = e.filter(col("vec_id") < 50)
    assignCell(q, centroids(e))
      .select(col("vec_id"), col("label").as("true_label"),
        col("cell").as("nearest_label"), col("_maxcs").as("cos_sim"))
      .orderBy("vec_id")
  }

  /** e03 — sign-LSH bucketed ANN: bucket = sign bits of 3 fixed
    * hyperplanes (axis planes on dims 1, 8, 22 — deterministic and
    * oracle-reproducible), search only within the query's bucket.
    * The bucket equi-join replaces the cross join — the scale path.
    */
  def e03LshBuckets(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir)
    def bucket(v: Column): Column =
      (when(element_at(v, 1) > 0, 4).otherwise(0) +
        when(element_at(v, 8) > 0, 2).otherwise(0) +
        when(element_at(v, 22) > 0, 1).otherwise(0)).cast("int")
    val withB = e.withColumn("bucket", bucket(col("v")))
    val q = withB.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("v").as("qv"), col("bucket"))
    val c = withB.filter(col("vec_id") >= 10)
      .select(col("vec_id").as("cand_id"), col("v").as("cv"), col("bucket"))
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("query_id").orderBy(desc("cos_sim"), asc("cand_id"))
    c.join(broadcast(q), Seq("bucket"))
      .select(col("query_id"), col("bucket"), col("cand_id"),
        round(cosine(col("qv"), col("cv")), 6).as("cos_sim"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 3)
      .select("query_id", "bucket", "rank", "cand_id", "cos_sim")
      .orderBy("query_id", "rank")
  }

  /** e04 — embedding-cosine near-dup dedup: bucket by sign-LSH, compare
    * only within buckets, keep pairs with cosine ≥ 0.4 (the corpus'
    * non-self pairs top out ≈0.51). Dedup decision = keep min vec_id of
    * each matched pair. Same no-cross-join shape as d07/d09.
    */
  def e04CosineNeardup(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir)
    def bucket(v: Column): Column =
      (when(element_at(v, 1) > 0, 4).otherwise(0) +
        when(element_at(v, 8) > 0, 2).otherwise(0) +
        when(element_at(v, 22) > 0, 1).otherwise(0)).cast("int")
    val withB = e.withColumn("bucket", bucket(col("v"))).localCheckpoint(true)
    val a = withB.select(col("bucket"), col("vec_id").as("vec_a"), col("v").as("va"))
    val b = withB.select(col("bucket"), col("vec_id").as("vec_b"), col("v").as("vb"))
    a.join(b, Seq("bucket"))
      .filter(col("vec_a") < col("vec_b"))
      .select(col("vec_a"), col("vec_b"),
        round(cosine(col("va"), col("vb")), 6).as("cos_sim"))
      .filter(col("cos_sim") >= 0.4)
      .withColumn("keep_id", least(col("vec_a"), col("vec_b")))
      .orderBy("vec_a", "vec_b")
  }

  /** e20 — SemDeDup (Abbas et al. 2023, "SemDeDup: Data-efficient
    * learning at web-scale through semantic deduplication"): cluster
    * the embeddings (the e05 coarse quantizer), compare cosines only
    * WITHIN a cluster, and mark a vector a semantic duplicate when an
    * earlier (lower-id) cluster-mate sits above the threshold — the
    * greedy keep-first rule, `dup_of` = the earliest such mate for a
    * deterministic removal plan. The cluster equi-join bounds the pair
    * work to Σ cell² instead of N² — the paper's own scaling argument,
    * in the same no-cross-join shape as e04/d07/d09; at 100 TB the
    * cells come from k-means over a sample and this exact plan runs
    * per cell. */
  def e20SemDedup(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir)
    val assigned = assignCell(e, centroids(e))
      .select(col("vec_id"), col("v"), col("cell"))
      .localCheckpoint(true)
    semDup(assigned, 0.45)
  }

  /** The SemDeDup verdict kernel on a caller-supplied assignment
    * (vec_id, v, cell) — shared by e20/e21 and driven directly by
    * SemDedupSpec: within-cell pairs only, greedy keep-first (a vector
    * is a dup when an earlier cluster-mate clears `tau`; dup_of = the
    * earliest such mate, the deterministic removal plan). */
  private[queries] def semDup(assigned: DataFrame, tau: Double): DataFrame = {
    val earlier = assigned.select(col("cell"),
      col("vec_id").as("earlier"), col("v").as("ev"))
    val dups = assigned.join(earlier, Seq("cell"))
      .filter(col("earlier") < col("vec_id"))
      .filter(round(cosine(col("ev"), col("v")), 6) >= tau)
      .groupBy("vec_id").agg(min("earlier").as("dup_of"))
    assigned.join(dups, Seq("vec_id"), "left_outer")
      .select(col("vec_id"), col("cell"), col("dup_of"),
        col("dup_of").isNotNull.as("is_dup"))
      .orderBy("vec_id")
  }

  /** Per-label centroid table (the IVF coarse quantizer): elementwise
    * mean via the [[graft.functions.VecOps.vecMean]] Aggregator — one
    * shuffle of fixed-size sum buffers, versus the posexplode
    * formulation's 64× row multiplication and two shuffles
    * (VecOpsSpec pins the two equal). Tiny at any scale → broadcast. */
  private def centroids(e: DataFrame): DataFrame =
    e.groupBy("label")
      .agg(graft.functions.VecOps.vecMean(col("v")).as("cv"))
      .select(col("label").as("c_label"), col("cv"))

  /** Nearest-centroid cell assignment as a per-row ARRAY fold instead
    * of a per-vector window: the centroid table (tiny at any scale —
    * it IS the coarse quantizer) collapses into one broadcast
    * array-of-structs row, and the winner — max rounded cosine, min
    * label on ties, exactly the old `ORDER BY cs DESC, c_label ASC`
    * rn=1 — is picked by codegen'd array expressions inside the scan
    * stage. The window form shuffled the vectors×centroids cross frame
    * on vec_id and sorted every group just to take one row (guide
    * §2.4: remove exchanges whose only job is an argmax the row can
    * compute itself). Adds `cell` and `_maxcs` (the winning cosine) to
    * `vecs`; NaN ordering matches the window's (Spark sorts NaN
    * greatest and NaN = NaN is true in SQL comparisons). */
  private def assignCell(vecs: DataFrame, cent: DataFrame): DataFrame = {
    val cArr = cent.agg(collect_list(struct(col("c_label"), col("cv"))).as("_cents"))
    vecs.crossJoin(broadcast(cArr))
      .withColumn("_scored", transform(col("_cents"),
        c => struct(round(cosine(col("v"), c.getField("cv")), 6).as("cs"),
          c.getField("c_label").as("lbl"))))
      .withColumn("_maxcs",
        array_max(transform(col("_scored"), x => x.getField("cs"))))
      .withColumn("cell", array_min(transform(
        filter(col("_scored"), x => x.getField("cs") === col("_maxcs")),
        x => x.getField("lbl"))))
      .drop("_cents", "_scored")
  }

  /** e05 — end-to-end IVF top-k, the full ANN scale path e02/e03 only
    * exercise pieces of: build the coarse quantizer (centroids), assign
    * EVERY vector to its nearest cell (one broadcast join — the IVF
    * index build), then answer each query by searching only its own cell
    * (nprobe=1). The search join is an equi-join on cell id: candidate
    * work per query drops from N to N/cells, and nothing here is a cross
    * join or a driver collect — the shape that survives 100 TB.
    */
  def e05IvfTopk(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir)
    import org.apache.spark.sql.expressions.Window
    val assigned = assignCell(e, centroids(e))
      .select(col("vec_id"), col("v"), col("cell"))
    val q = assigned.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("v").as("qv"), col("cell"))
    val c = assigned.filter(col("vec_id") >= 10)
      .select(col("vec_id").as("cand_id"), col("v").as("cv"), col("cell"))
    val wRank = Window.partitionBy("query_id").orderBy(desc("cos_sim"), asc("cand_id"))
    c.join(broadcast(q), Seq("cell"))
      .select(col("query_id"), col("cell"), col("cand_id"),
        round(cosine(col("qv"), col("cv")), 6).as("cos_sim"))
      .withColumn("rank", row_number().over(wRank))
      .filter(col("rank") <= 3)
      .select("query_id", "cell", "rank", "cand_id", "cos_sim")
      .orderBy("query_id", "rank")
  }

  /** e06 — recall@3 of the IVF index (e05, nprobe=1) against the
    * brute-force ground truth on the SAME query/candidate split — the
    * metric a pipeline watches to size cells/nprobe. Truth is one
    * broadcast-scored pass (queries are few; candidates stay
    * distributed); the hit count is a semi-join of two tiny top-k
    * lists. Queries whose true neighbors all live outside their own
    * cell score 0 rather than vanishing (left join from the query
    * list).
    */
  def e06IvfRecall(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir)
    val q = e.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("v").as("qv"))
    val c = e.filter(col("vec_id") >= 10)
      .select(col("vec_id").as("cand_id"), col("v").as("cv"))
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("query_id").orderBy(desc("cos_sim"), asc("cand_id"))
    val truth = c.join(broadcast(q))
      .select(col("query_id"), col("cand_id"),
        round(cosine(col("qv"), col("cv")), 6).as("cos_sim"))
      .withColumn("rank", row_number().over(w)).filter(col("rank") <= 3)
      .select("query_id", "cand_id")
    val approx = e05IvfTopk(s, dir).select("query_id", "cand_id")
    val hits = truth.join(approx, Seq("query_id", "cand_id"), "left_semi")
      .groupBy("query_id").agg(count(lit(1)).as("n_hits"))
    q.select("query_id").join(hits, Seq("query_id"), "left")
      .select(col("query_id"),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"),
        round(coalesce(col("n_hits"), lit(0L)) / 3.0, 4).as("recall_at_3"))
      .orderBy("query_id")
  }

  /** e07 — one Lloyd's k-means iteration (the IVF index REFRESH path:
    * e05 builds and searches a fixed quantizer; real pipelines re-train
    * it): assign every vector to its nearest current centroid
    * (broadcast join — the fact side never shuffles for the join), then
    * recompute each cell's mean with the fixed-size-buffer vecMean
    * Aggregator (one shuffle of 10 buffers, not 64× exploded rows) and
    * report membership + centroid drift. Iterating this to convergence
    * is a driver loop over the same plan — each step is one job. */
  def e07KmeansStep(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir)
    val cent = centroids(e)
    val assigned = assignCell(e, cent)
      .select(col("vec_id"), col("v"), col("cell"))
    assigned.groupBy("cell")
      .agg(count(lit(1)).as("n_members"),
        graft.functions.VecOps.vecMean(col("v")).as("nv"))
      .join(broadcast(cent), col("cell") === col("c_label"))
      .select(col("cell"), col("n_members"),
        round(cosine(col("cv"), col("nv")), 6).as("drift_cos"),
        round(element_at(col("nv"), 1), 6).as("c1"),
        round(element_at(col("nv"), 2), 6).as("c2"))
      .orderBy("cell")
  }

  /** Sequential squared-L2 fold between two ARRAY<DOUBLE> blocks —
    * zip_with products then a left-to-right aggregate, the same order
    * the oracle's list_sum replays. */
  private def l2sq(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)),
      lit(0.0), (acc, z) => acc + z)

  /** e08 — product-quantization ADC top-k (the memory-scale path IVF
    * alone doesn't give): vectors are cut into 8 subspaces of 8 dims,
    * each block quantized to the nearest of 10 codebook entries (the
    * per-label centroid slices — mean commutes with slicing, so the
    * codebook is just `centroids` cut up). A candidate is then 8 small
    * code ids instead of 64 floats. Queries answer via the asymmetric
    * distance computation: a per-query lookup table of (block, code) →
    * exact squared-L2 to the query's own block, and the candidate's
    * approximate distance is the sum of 8 LUT hits.
    *
    * Scale shape: the codebook (80 rows) and the LUT (queries × 80)
    * broadcast; candidates join them by (block, code) equi-keys and
    * never ship their float vectors to the scoring join — at 100 TB the
    * fact side carries 8 bytes of codes per vector, which is the whole
    * point of PQ. No cross join anywhere; the final top-k is one
    * per-query window. Determinism: code assignment orders by ROUNDED
    * distances with id tie-breaks, and the ADC sum itself is the
    * d23/g18 fixed-point law — BIGINT micro-unit terms summed exactly —
    * so neither engine ulp noise nor partition order can flip an
    * argmin or the 6th decimal. */
  def e08PqAdc(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir)
    import org.apache.spark.sql.expressions.Window
    val blkIds = explode(sequence(lit(0), lit(7))).as("blk")
    val codeBlocks = centroids(e).select(col("c_label"), blkIds, col("cv"))
      .select(col("c_label"), col("blk"),
        slice(col("cv"), col("blk") * 8 + 1, lit(8)).as("cb"))
    val vecBlocks = e.select(col("vec_id"), blkIds, col("v"))
      .select(col("vec_id"), col("blk"),
        slice(col("v"), col("blk") * 8 + 1, lit(8)).as("vb"))
    // encode ONLY the candidate side — queries are answered from the
    // exact LUT below. The per-block codebook (10 entries, fixed at any
    // scale) collapses to one array row per blk, and the code argmin
    // (rounded d2 asc, label asc — the old window's ORDER BY) is a
    // per-row struct array_min inside the scan: no (vec_id, blk)
    // exchange + sort just to take rn=1 (guide §2.4, same move as
    // assignCell).
    val cbArr = codeBlocks.groupBy("blk")
      .agg(collect_list(struct(col("c_label"), col("cb"))).as("_cbs"))
    val codes = vecBlocks.filter(col("vec_id") >= 5)
      .join(broadcast(cbArr), Seq("blk"))
      .withColumn("code", array_min(transform(col("_cbs"),
        c => struct(round(l2sq(col("vb"), c.getField("cb")), 6).as("d2r"),
          c.getField("c_label").as("lbl")))).getField("lbl"))
      .select(col("vec_id"), col("blk"), col("code"))
    val lut = vecBlocks.filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("blk"), col("vb").as("qb"))
      .join(broadcast(codeBlocks), Seq("blk"))
      .select(col("query_id"), col("blk"), col("c_label").as("code"),
        l2sq(col("qb"), col("cb")).as("d2"))
    val wRank = Window.partitionBy("query_id").orderBy(col("adc"), col("cand_id"))
    codes
      .select(col("vec_id").as("cand_id"), col("blk"), col("code"))
      .join(broadcast(lut), Seq("blk", "code"))
      .groupBy("query_id", "cand_id")
      // the d23/g18 fixed-point law: each LUT term quantizes to BIGINT
      // micro-units (terms are bit-identical across engines — fixed-order
      // folds), the 8-term sum is exact integer math in any partition
      // order, and the rank below orders on that exact sum
      .agg((sum(round(col("d2") * 1e6).cast("long")) / 1e6).as("adc"))
      .withColumn("rank", row_number().over(wRank))
      .filter(col("rank") <= 5)
      .select("query_id", "rank", "cand_id", "adc")
      .orderBy("query_id", "rank")
  }

  /** e09 — embedding near-dup dedup closed end-to-end: e04's
    * sign-bucket-blocked cosine pairs promoted to CANONICAL CLUSTERS
    * via connected components (min-id elects the keeper), the
    * embedding-space twin of d15's MinHash cluster canonicalization.
    * A pair list alone under-deduplicates: A~B and B~C with A≁C must
    * still collapse to one keeper, which only the transitive closure
    * delivers. Output is the dedup verdict table a curation pipeline
    * joins against: (vec_id, keeper_id, is_dup).
    *
    * Scale: candidate generation never leaves the LSH buckets (no
    * all-pairs), the closure runs on the sparse near-dup pair graph —
    * orders of magnitude smaller than the corpus — and star-contraction
    * CC is iteration-bounded by cluster diameter, which for near-dup
    * graphs is small (dup clusters are cliques-ish, diameter ~2). */
  def e09NeardupClusters(s: SparkSession, dir: String): DataFrame = {
    val pairs = e04CosineNeardup(s, dir).select(col("vec_a"), col("vec_b"))
    // Catalyst-native star-contraction CC (d15's engine swap: same
    // min-id contract, ComponentsDFSpec-pinned equivalent, no
    // Dataset→RDD/Pregel round-trip inside a similarity pipeline)
    graft.graph.ComponentsDF.run(
        pairs.select(col("vec_a").as("src"), col("vec_b").as("dst")))
      .select(col("vid").as("vec_id"), col("component").as("keeper_id"),
        (col("vid") =!= col("component")).cast("int").as("is_dup"))
      .orderBy("vec_id")
  }

  /** e10 — maximum-inner-product search (MIPS), exact: top-5 by raw
    * dot product — the retrieval objective where vector MAGNITUDE
    * carries signal (recommendation scores, unnormalized rerankers),
    * deliberately distinct from e01's cosine (same direction, larger
    * norm → larger score). The dot rides the built-in
    * aggregate(zip_with(...)) sequential fold — same summation order
    * as DuckDB's list_sum, so the rounded score is engine-exact. At
    * scale MIPS reduces to cosine ANN by norm augmentation (append
    * sqrt(M²−‖x‖²) to each vector), so the e03/e05 bucketed paths
    * carry it without a new index structure; the brute-force form here
    * is the ground truth that recall would be measured against. */
  def e10MipsBrute(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir)
    val q = e.filter(col("vec_id") < 3)
      .select(col("vec_id").as("query_id"), col("v").as("qv"))
    val c = e.filter(col("vec_id") >= 3)
      .select(col("vec_id").as("cand_id"), col("v").as("cv"))
    val dot = expr(
      "aggregate(zip_with(qv, cv, (x, y) -> x * y), 0D, (acc, x) -> acc + x)")
    val scored = c.join(broadcast(q))
      .select(col("query_id"), col("cand_id"), round(dot, 6).as("ip"))
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("query_id").orderBy(desc("ip"), asc("cand_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 5)
      .select("query_id", "rank", "cand_id", "ip")
      .orderBy("query_id", "rank")
  }

  /** e11 — int8 scalar-quantization (SQ8) ANN, asymmetric: candidates
    * compress to one uint8 code per dimension against global per-dim
    * [lo, hi] bounds (4× less index memory and scan IO than float32 —
    * at 100 TB of embeddings that IS the working-set budget); queries
    * stay full-precision and score against the DEQUANTIZED candidate
    * (asymmetric distance — half the quantization noise of
    * code-vs-code). Top-3 per query by quantized inner product, with
    * the exact product and |error| alongside — the accuracy contract a
    * pipeline monitors when it turns SQ8 on.
    *
    * Scale shape: the bounds table is 2×64 doubles (broadcast); codes
    * build in one pass; scoring is the same broadcast-join top-k as
    * e01. Determinism: code = round((x−lo)/span·255) on identical
    * double expressions both engines (HALF_UP positive ≡ away-from-
    * zero), ranking by ROUNDED score with id tie-break. Precondition:
    * every dimension has span > 0 (holds for the corpus; a constant
    * dim would put 0/0 in both engines' formulas). */
  def e11Sq8Topk(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir)
    val dims = e.select(posexplode(col("v")).as(Seq("pos", "x")))
      .groupBy("pos").agg(min("x").as("lo"), max("x").as("hi"))
    val bounds = dims
      .agg(collect_list(struct(col("pos"), col("lo"))).as("pl"),
        collect_list(struct(col("pos"), col("hi"))).as("ph"))
      .select(transform(array_sort(col("pl")), t => t.getField("lo")).as("lo"),
        transform(array_sort(col("ph")), t => t.getField("hi")).as("hi"))
    val span = zip_with(col("hi"), col("lo"), (h, l) => h - l)
    val code = zip_with(zip_with(col("v"), col("lo"), (x, l) => x - l),
      span, (d, sp) => round(d / sp * 255).cast("int"))
    val dq = zip_with(zip_with(code, span, (cd, sp) => cd / 255 * sp),
      col("lo"), (t, l) => t + l)
    val c = e.crossJoin(broadcast(bounds)).filter(col("vec_id") >= 10)
      .select(col("vec_id").as("cand_id"), col("v").as("cv"), dq.as("dq"))
    val q = e.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("v").as("qv"))
    def dot(a: String, b: String) = expr(
      s"aggregate(zip_with($a, $b, (x, y) -> x * y), 0D, (acc, x) -> acc + x)")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("query_id").orderBy(desc("sq_ip"), asc("cand_id"))
    c.join(broadcast(q))
      .select(col("query_id"), col("cand_id"),
        round(dot("qv", "dq"), 6).as("sq_ip"),
        round(dot("qv", "cv"), 6).as("exact_ip"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 3)
      .select(col("query_id"), col("rank"), col("cand_id"), col("sq_ip"),
        col("exact_ip"),
        round(abs(col("sq_ip") - col("exact_ip")), 6).as("abs_err"))
      .orderBy("query_id", "rank")
  }

  /** e12 — Matryoshka / prefix-dimension two-stage retrieval: coarse
    * ranking on the FIRST 8 of 64 dims (the nested-representation
    * property MRL-trained embeddings expose: a prefix is itself a valid
    * lower-dim embedding), shortlist of 20 per query, then an exact
    * 64-dim rerank of the shortlist only. This is the standard
    * accuracy/IO dial between e01 (full brute force) and e05/e03
    * (bucketed): stage 1 scans 8/64ths of the vector bytes — at 100 TB
    * of embeddings that is an 8× scan-IO cut with NO index build — and
    * stage 2's full-width reads touch only Q×20 rows. Both ranks order
    * by the 6dp-ROUNDED fold with id tie-break (e11's determinism
    * rule), so the shortlist membership itself is engine-exact.
    */
  def e12MatryoshkaTopk(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir)
    def dot(a: String, b: String) = expr(
      s"aggregate(zip_with($a, $b, (x, y) -> x * y), 0D, (acc, x) -> acc + x)")
    val c = e.filter(col("vec_id") >= 10)
      .select(col("vec_id").as("cand_id"), col("v").as("cv"),
        slice(col("v"), 1, 8).as("cp"))
    val q = e.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("v").as("qv"),
        slice(col("v"), 1, 8).as("qp"))
    import org.apache.spark.sql.expressions.Window
    val wCoarse = Window.partitionBy("query_id").orderBy(desc("coarse_ip"), asc("cand_id"))
    val wExact = Window.partitionBy("query_id").orderBy(desc("exact_ip"), asc("cand_id"))
    c.join(broadcast(q))
      .select(col("query_id"), col("cand_id"), col("cv"), col("qv"),
        round(dot("qp", "cp"), 6).as("coarse_ip"))
      .withColumn("coarse_rank", row_number().over(wCoarse))
      .filter(col("coarse_rank") <= 20)
      .select(col("query_id"), col("cand_id"), col("coarse_rank"), col("coarse_ip"),
        round(dot("qv", "cv"), 6).as("exact_ip"))
      .withColumn("rank", row_number().over(wExact))
      .filter(col("rank") <= 3)
      .select("query_id", "rank", "cand_id", "coarse_rank", "coarse_ip", "exact_ip")
      .orderBy("query_id", "rank")
  }

  /** e13 — MMR (maximal marginal relevance) diversified top-k: the
    * standard RAG re-rank that trades pure relevance for novelty,
    * `score = λ·rel − (1−λ)·max_sim_to_selected` (Carbonell &
    * Goldstein 1998), λ=0.7. Greedy over a relevance shortlist of 10
    * per query, selecting 3: pick 1 is argmax rel; each later round
    * anti-joins the selected set out, joins each survivor to its max
    * cosine against the selected, and takes one row per query by
    * (rounded score desc, cand_id) — fully deterministic.
    *
    * Scale shape: the only full-corpus work is the relevance scan
    * (broadcast query side, distributed candidates — e01's shape);
    * everything after operates on Q×10 rows, so the greedy loop's k−1
    * fixed iterations cost Q×10-sized joins regardless of corpus size.
    * The shortlist and its pairwise-sim table are localCheckpointed
    * once and reused by every round (no recompute of the corpus scan).
    */
  def e13MmrRerank(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val e = emb(s, dir)
    val q = e.filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("v").as("qv"))
    val c = e.filter(col("vec_id") >= 5)
      .select(col("vec_id").as("cand_id"), col("v").as("cv"))
    val wRel = Window.partitionBy("query_id").orderBy(desc("rel"), asc("cand_id"))
    // the λ-mix rides BIGINT micro-units (d-family determinism law:
    // 0.7·rel in double can land on a 7th-decimal boundary where the
    // two engines' round() split) — score_u = 7·rel_u − 3·sim_u is
    // exact; the double surfaces only via one shared /1e7 division
    val shortlist = c.join(broadcast(q))
      .select(col("query_id"), col("cand_id"), col("cv"),
        round(cosine(col("qv"), col("cv")), 6).as("rel"))
      .withColumn("rel_u", round(col("rel") * lit(1e6), 0).cast("long"))
      .withColumn("rrank", row_number().over(wRel))
      .filter(col("rrank") <= 10)
      .localCheckpoint(true)
    val sims = shortlist.select(col("query_id"), col("cand_id").as("ca"), col("cv").as("va"))
      .join(shortlist.select(col("query_id"), col("cand_id").as("cb"), col("cv").as("vb")),
        Seq("query_id"))
      .filter(col("ca") =!= col("cb"))
      .select(col("query_id"), col("ca"), col("cb"),
        round(round(cosine(col("va"), col("vb")), 6) * lit(1e6), 0).cast("long").as("sim_u"))
      .localCheckpoint(true)
    val sl = shortlist.select("query_id", "cand_id", "rel", "rel_u")
    var sel = shortlist.filter(col("rrank") === 1)
      .select(col("query_id"), col("cand_id"), lit(1).as("rank"),
        (col("rel_u") * lit(7L)).as("score_u"))
    for (k <- 2 to 3) {
      val maxSim = sims
        .join(sel.select(col("query_id"), col("cand_id").as("cb")), Seq("query_id", "cb"))
        .groupBy(col("query_id"), col("ca").as("cand_id"))
        .agg(max("sim_u").as("max_sim_u"))
      val wPick = Window.partitionBy("query_id").orderBy(desc("score_u"), asc("cand_id"))
      val pick = sl
        .join(sel.select("query_id", "cand_id"), Seq("query_id", "cand_id"), "left_anti")
        .join(maxSim, Seq("query_id", "cand_id"))
        .select(col("query_id"), col("cand_id"),
          (col("rel_u") * lit(7L) - col("max_sim_u") * lit(3L)).as("score_u"))
        .withColumn("rn", row_number().over(wPick))
        .filter(col("rn") === 1)
        .select(col("query_id"), col("cand_id"), lit(k).as("rank"), col("score_u"))
      sel = sel.unionByName(pick).localCheckpoint(true)
    }
    sel.join(sl, Seq("query_id", "cand_id"))
      .select(col("query_id"), col("rank"), col("cand_id"), col("rel"),
        (col("score_u") / lit(1e7)).as("score"))
      .orderBy("query_id", "rank")
  }

  /** e14 — kNN label-purity audit: for every vector, its 5 nearest
    * bucketed neighbors (e03's sign-LSH buckets — equi-join, never
    * all-pairs) vote on whether the embedding space agrees with the
    * assigned label; per-label MACRO purity = Σ same-label neighbors /
    * Σ neighbors. The standard dataset-quality probe before training a
    * classifier on curated labels: a label whose vectors sit in
    * other-label neighborhoods is mislabeled or incoherent.
    *
    * Determinism: neighbor rank on (rounded cosine desc, vec_id), and
    * the purity ratio is ONE division of two exact longs (never an
    * average of per-row doubles, whose sum order would flap).
    * Scale: per-bucket self-join + per-vector top-k window
    * (WindowGroupLimit prunes map-side), then a label-sized aggregate.
    */
  def e14LabelPurity(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val e = emb(s, dir)
    def bucket(v: Column): Column =
      (when(element_at(v, 1) > 0, 4).otherwise(0) +
        when(element_at(v, 8) > 0, 2).otherwise(0) +
        when(element_at(v, 22) > 0, 1).otherwise(0)).cast("int")
    val withB = e.withColumn("bucket", bucket(col("v"))).localCheckpoint(true)
    val a = withB.select(col("bucket"), col("vec_id").as("va"),
      col("label").as("la"), col("v").as("xa"))
    val b = withB.select(col("bucket"), col("vec_id").as("vb"),
      col("label").as("lb"), col("v").as("xb"))
    val w = Window.partitionBy("va").orderBy(desc("cs"), asc("vb"))
    a.join(b, Seq("bucket")).filter(col("va") =!= col("vb"))
      .select(col("va"), col("la"), col("vb"), col("lb"),
        round(cosine(col("xa"), col("xb")), 6).as("cs"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 5)
      .groupBy("va", "la")
      .agg(sum(when(col("la") === col("lb"), 1L).otherwise(0L)).as("n_same"),
        count(lit(1)).as("n_nbrs"))
      .groupBy(col("la").as("label"))
      .agg(count(lit(1)).as("n_vecs"),
        sum("n_same").as("sum_same"), sum("n_nbrs").as("sum_nbrs"))
      .select(col("label"), col("n_vecs"), col("sum_same"), col("sum_nbrs"),
        round(col("sum_same") / col("sum_nbrs"), 4).as("macro_purity"))
      .orderBy("label")
  }

  /** e15 — IVF-PQ with residual encoding and multi-probe (the
    * production FAISS `IVFx,PQy` shape; e05 and e08 each exercise one
    * half): vectors assign to a coarse cell (per-label centroids,
    * nprobe's denominator), then the RESIDUAL v − centroid — not the
    * raw vector — is product-quantized, which is what makes PQ codes
    * sharp (residual norms are a fraction of vector norms, so the same
    * 8 codes/vector spend their resolution where the variance actually
    * is). Queries probe their nprobe=2 nearest cells, compute a
    * per-probed-cell residual, and rank candidates from BOTH cells by
    * asymmetric-distance sums over a broadcast LUT. The PQ codebook is
    * a deterministic one-shot trainer: candidate residual blocks hash
    * to a sign-pattern group (first 3 dims' signs → 8 codes/block) and
    * each code's entry is the element-wise mean of its members in
    * BIGINT micro-units — integer sums, so the "training" is exactly
    * reproducible by the oracle, unlike a k-means whose float sums
    * would be partition-order noise.
    *
    * Scale shape: codebook ≤ 64 entries and the LUT (queries × probes
    * × 64) broadcast; the fact side ships (cell, blk, code) — 8 code
    * ids per candidate, never 64 floats; multi-probe multiplies query
    * work, NOT index size; everything joins by equi-keys. ADC sums are
    * exact BIGINT micro-units (d23/g18 law) so ranks can't flip. */
  def e15IvfPq(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir)
    import org.apache.spark.sql.expressions.Window
    val cent = centroids(e)
    // Multi-probe variant of assignCell's window-removal: the fixed
    // 10-centroid table collapses to one broadcast array row, the
    // per-vector ranking (cs DESC, c_label ASC — the old window's
    // ORDER BY) is a per-row comparator array_sort, and rn == k
    // becomes element_at(_ranked, k). No vectors×centroids exchange.
    val cArr = cent.agg(collect_list(struct(col("c_label"), col("cv"))).as("_cents"))
    val assigned = e.crossJoin(broadcast(cArr))
      .withColumn("_ranked", array_sort(
        transform(col("_cents"), c => struct(
          round(cosine(col("v"), c.getField("cv")), 6).as("cs"),
          c.getField("c_label").as("c_label"),
          c.getField("cv").as("cv"))),
        (l, r) => when(l.getField("cs") > r.getField("cs"), -1)
          .when(l.getField("cs") < r.getField("cs"), 1)
          .when(l.getField("c_label") < r.getField("c_label"), -1)
          .when(l.getField("c_label") > r.getField("c_label"), 1)
          .otherwise(0)))
      .drop("_cents")
    val blkIds = explode(sequence(lit(0), lit(7))).as("blk")
    def residual(v: Column, cv: Column): Column =
      zip_with(v, cv, (x, y) => x - y)
    def signCode(rb: Column): Column =
      when(element_at(rb, 1) >= 0, 4).otherwise(0) +
        when(element_at(rb, 2) >= 0, 2).otherwise(0) +
        when(element_at(rb, 3) >= 0, 1).otherwise(0)
    val candBlocks = assigned.filter(col("vec_id") >= 10)
      .select(col("vec_id").as("cand_id"),
        element_at(col("_ranked"), 1).getField("c_label").as("cell"),
        blkIds,
        residual(col("v"), element_at(col("_ranked"), 1).getField("cv")).as("r"))
      .select(col("cand_id"), col("cell"), col("blk"),
        slice(col("r"), col("blk") * 8 + 1, lit(8)).as("rb"))
      .withColumn("code", signCode(col("rb")))
      .localCheckpoint(true) // feeds codebook training AND the ADC scan
    val codebook = candBlocks
      .select(col("blk"), col("code"), posexplode(col("rb")).as(Seq("pos", "x")))
      .groupBy("blk", "code", "pos")
      .agg((round(sum(round(col("x") * 1e6).cast("long")) /
        count(lit(1)).cast("double")) / 1e6).as("m"))
      .groupBy("blk", "code")
      .agg(collect_list(struct(col("pos"), col("m"))).as("pm"))
      .select(col("blk"), col("code"),
        transform(array_sort(col("pm")), t => t.getField("m")).as("cb"))
    val lut = assigned.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"),
        explode(slice(col("_ranked"), 1, 2)).as("_probe"), col("v"))
      .select(col("query_id"), col("_probe").getField("c_label").as("cell"),
        blkIds, residual(col("v"), col("_probe").getField("cv")).as("qr"))
      .select(col("query_id"), col("cell"), col("blk"),
        slice(col("qr"), col("blk") * 8 + 1, lit(8)).as("qb"))
      .join(broadcast(codebook), Seq("blk"))
      .select(col("query_id"), col("cell"), col("blk"), col("code"),
        round(l2sq(col("qb"), col("cb")) * 1e6).cast("long").as("d2u"))
    val wRank = Window.partitionBy("query_id").orderBy(col("adcu"), col("cand_id"))
    candBlocks.select(col("cand_id"), col("cell"), col("blk"), col("code"))
      .join(broadcast(lut), Seq("cell", "blk", "code"))
      .groupBy("query_id", "cand_id", "cell")
      .agg(sum(col("d2u")).as("adcu"))
      .withColumn("rank", row_number().over(wRank))
      .filter(col("rank") <= 5)
      .select(col("query_id"), col("rank"), col("cand_id"), col("cell"),
        (col("adcu") / 1e6).as("adc"))
      .orderBy("query_id", "rank")
  }

  /** e16 — recall@5 of the IVF-PQ index (e15: residual PQ, nprobe=2)
    * against exact ground truth, completing the e05→e06 build/measure
    * pairing for the production index: truth is the brute-force top-5
    * by EXACT squared L2 (the metric ADC approximates — residuals are
    * taken against the same probed cell, so ‖q−c‖ is preserved),
    * approx is e15's output, recall the per-query hit fraction. This
    * is the number a pipeline tunes nprobe/codebook size against;
    * queries whose true neighbors hide outside both probed cells (or
    * get blurred by the 8-code quantization) score low rather than
    * vanishing. */
  def e16IvfpqRecall(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir)
    import org.apache.spark.sql.expressions.Window
    val q = e.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("v").as("qv"))
    val c = e.filter(col("vec_id") >= 10)
      .select(col("vec_id").as("cand_id"), col("v").as("cv"))
    val w = Window.partitionBy("query_id").orderBy(col("d2"), col("cand_id"))
    val truth = c.join(broadcast(q))
      .select(col("query_id"), col("cand_id"),
        round(l2sq(col("qv"), col("cv")), 6).as("d2"))
      .withColumn("rank", row_number().over(w)).filter(col("rank") <= 5)
      .select("query_id", "cand_id")
    val approx = e15IvfPq(s, dir).select("query_id", "cand_id")
    val hits = truth.join(approx, Seq("query_id", "cand_id"), "left_semi")
      .groupBy("query_id").agg(count(lit(1)).as("n_hits"))
    q.select("query_id").join(hits, Seq("query_id"), "left")
      .select(col("query_id"),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"),
        round(coalesce(col("n_hits"), lit(0L)) / 5.0, 4).as("recall_at_5"))
      .orderBy("query_id")
  }

  /** e17 — the MIPS→cosine reduction made executable (the claim e10's
    * scaladoc only states): append sqrt(M²−‖x‖²) to every candidate
    * (M = max candidate norm) and 0 to every query, and cosine order
    * over the 65-dim augmented vectors IS inner-product order —
    * cos(q′,x′) = q·x / (‖q‖·M), a per-query positive scaling. That
    * identity is what lets every cosine-ANN structure in this family
    * (e03 sign-LSH, e05 IVF, e15 IVF-PQ) serve MIPS with no new index.
    * Gated as the identity itself: the augmented-cosine top-5 carries
    * e10's exact-IP rank alongside, and `agree` must be true row for
    * row (ties under 6-decimal rounding would surface honestly as
    * false in BOTH engines — the flag is engine-exact either way).
    *
    * Scale: the augmentation is one scalar per vector computed in the
    * scan; M is a 1-row broadcast; everything downstream is the e01
    * broadcast-top-k shape. */
  def e17MipsReduction(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir)
    import org.apache.spark.sql.expressions.Window
    def selfDot(c: String) =
      expr(s"aggregate(zip_with($c, $c, (x, y) -> x * y), 0D, (acc, x) -> acc + x)")
    val c = e.filter(col("vec_id") >= 3)
      .select(col("vec_id").as("cand_id"), col("v").as("cv"),
        selfDot("v").as("n2"))
    val m2 = c.agg(max(col("n2")).as("m2"))
    val ca = c.crossJoin(broadcast(m2))
      .select(col("cand_id"),
        concat(col("cv"), array(sqrt(col("m2") - col("n2")))).as("ca"),
        col("cv"))
    val ip = expr(
      "aggregate(zip_with(qv, cv, (x, y) -> x * y), 0D, (acc, x) -> acc + x)")
    val scored = ca.join(broadcast(
        e.filter(col("vec_id") < 3)
          .select(col("vec_id").as("query_id"), col("v").as("qv"))))
      .select(col("query_id"), col("cand_id"),
        round(cosine(concat(col("qv"), array(lit(0.0))), col("ca")), 6)
          .as("cos_aug"),
        round(ip, 6).as("ip"))
    val wAug = Window.partitionBy("query_id").orderBy(desc("cos_aug"), asc("cand_id"))
    val wIp = Window.partitionBy("query_id").orderBy(desc("ip"), asc("cand_id"))
    scored
      .withColumn("rank", row_number().over(wAug))
      .withColumn("rank_ip", row_number().over(wIp))
      .filter(col("rank") <= 5)
      .select(col("query_id"), col("rank"), col("cand_id"), col("ip"),
        col("cos_aug"), (col("rank") === col("rank_ip")).as("agree"))
      .orderBy("query_id", "rank")
  }

  /** e18 — FILTERED vector search (the RAG staple: "nearest chunks
    * WHERE label matches"), both strategies side by side per query:
    * PRE-filter applies the predicate before scoring (correct top-k
    * among eligible candidates, the plan Catalyst produces when the
    * predicate pushes into the candidate scan) and POST-filter takes
    * the UNFILTERED top-5 and discards non-matching rows (what a
    * vector index without predicate support forces — it returns
    * short). Output: the pre-filter top-5 plus each query's
    * post-filter survivor count — the shortfall is the measured
    * argument for why predicate pushdown must reach the index, which
    * at 100 TB is the difference between scanning one label partition
    * and over-fetching k·selectivity⁻¹ candidates. */
  def e18FilteredKnn(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir)
    import org.apache.spark.sql.expressions.Window
    val q = e.filter(col("vec_id") < 3)
      .select(col("vec_id").as("query_id"), col("v").as("qv"))
    val cAll = e.filter(col("vec_id") >= 3)
      .select(col("vec_id").as("cand_id"), col("label"), col("v").as("cv"))
    val w = Window.partitionBy("query_id").orderBy(desc("cos_sim"), asc("cand_id"))
    def top5(c: DataFrame): DataFrame = c.join(broadcast(q))
      .select(col("query_id"), col("cand_id"), col("label"),
        round(cosine(col("qv"), col("cv")), 6).as("cos_sim"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 5)
    val pre = top5(cAll.filter(col("label") === 3))
    val post = top5(cAll).filter(col("label") === 3)
      .groupBy("query_id").agg(count(lit(1)).as("post_hits"))
    pre.join(broadcast(post), Seq("query_id"), "left")
      .select(col("query_id"), col("rank"), col("cand_id"), col("cos_sim"),
        coalesce(col("post_hits"), lit(0L)).as("post_hits"),
        (lit(5) - coalesce(col("post_hits"), lit(0L))).as("post_shortfall"))
      .orderBy("query_id", "rank")
  }

  /** e19 — IVF with a DATA-DRIVEN cell count: K = max(4, ⌊√N⌋) cells
    * (the IVF sizing norm), seeded by the K lowest vec_ids
    * (deterministic — no rand()), refined by ONE Lloyd step (assign →
    * per-cell mean, e07's step as an index-build stage), then nprobe=1
    * search. This is the piece e05's fixed label-cells cannot show:
    * the quantizer GROWS with the corpus, so per-query candidate work
    * is N/√N = √N — sublinear in N, the claim SCALE.md's e-family
    * table rests on. Same plan shapes as e05: two broadcast
    * assignment joins + a per-vector window, one equi-join search; the
    * driver-side count() sizes K (one long of metadata, not data). */
  /** The e19 coarse quantizer, shared with e21: K = max(4, ⌊√N⌋)
    * cells — deterministic first-K seeds, one Lloyd refinement,
    * nearest-cell by rounded cosine — so per-cell lists stay ~√N and
    * the index PARAMETER scales with the data. */
  private def sqrtKAssigned(e: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val k = math.max(4, math.sqrt(e.count().toDouble).toInt)
    val seeds = e.orderBy("vec_id").limit(k)
      .select(col("vec_id").as("c_id"), col("v").as("cv"))
    def assign(cents: DataFrame): DataFrame = {
      val w = Window.partitionBy("vec_id").orderBy(desc("cs"), asc("c_id"))
      e.join(broadcast(cents))
        .select(col("vec_id"), col("v"), col("c_id"),
          round(cosine(col("v"), col("cv")), 6).as("cs"))
        .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
        .select(col("vec_id"), col("v"), col("c_id").as("cell"))
    }
    val refined = assign(seeds).groupBy(col("cell").as("c_id"))
      .agg(graft.functions.VecOps.vecMean(col("v")).as("cv"))
    assign(refined)
  }

  /** e21 — SemDeDup over the √N-cell index (e20's SCALE path): the
    * same greedy keep-first dedup, but the cluster count grows with
    * the corpus, so per-cell pair work is ~(√N)² = N per cell and
    * N^1.5 total instead of the fixed-cell quadratic — the paper's
    * own regime (cell size roughly constant as clusters scale out).
    * Same verdict frame as e20. */
  def e21SemDedupSqrtK(s: SparkSession, dir: String): DataFrame =
    semDup(sqrtKAssigned(emb(s, dir)).localCheckpoint(true), 0.45)

  def e19IvfSqrtK(s: SparkSession, dir: String): DataFrame = {
    val assigned = sqrtKAssigned(emb(s, dir))
    import org.apache.spark.sql.expressions.Window
    val q = assigned.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("v").as("qv"), col("cell"))
    val c = assigned.filter(col("vec_id") >= 10)
      .select(col("vec_id").as("cand_id"), col("v").as("xv"), col("cell"))
    val wRank = Window.partitionBy("query_id").orderBy(desc("cos_sim"), asc("cand_id"))
    c.join(broadcast(q), Seq("cell"))
      .select(col("query_id"), col("cell"), col("cand_id"),
        round(cosine(col("qv"), col("xv")), 6).as("cos_sim"))
      .withColumn("rank", row_number().over(wRank))
      .filter(col("rank") <= 3)
      .select("query_id", "cell", "rank", "cand_id", "cos_sim")
      .orderBy("query_id", "rank")
  }

  val queries: Map[String, QueryFn] = Map(
    "e21_semdedup_sqrtk"  -> (e21SemDedupSqrtK _),
    "e19_ivf_sqrtk"       -> (e19IvfSqrtK _),
    "e18_filtered_knn"    -> (e18FilteredKnn _),
    "e17_mips_reduction"  -> (e17MipsReduction _),
    "e16_ivfpq_recall"    -> (e16IvfpqRecall _),
    "e15_ivfpq"           -> (e15IvfPq _),
    "e14_label_purity"    -> (e14LabelPurity _),
    "e13_mmr_rerank"      -> (e13MmrRerank _),
    "e12_matryoshka_topk" -> (e12MatryoshkaTopk _),
    "e11_sq8_topk"        -> (e11Sq8Topk _),
    "e10_mips_brute"      -> (e10MipsBrute _),
    "e09_neardup_clusters" -> (e09NeardupClusters _),
    "e08_pq_adc"          -> (e08PqAdc _),
    "e07_kmeans_step"     -> (e07KmeansStep _),
    "e05_ivf_topk"        -> (e05IvfTopk _),
    "e20_semdedup"        -> (e20SemDedup _),
    "e04_cosine_neardup"  -> (e04CosineNeardup _),
    "e01_knn_brute"       -> (e01KnnBrute _),
    "e02_centroid_assign" -> (e02CentroidAssign _),
    "e03_lsh_buckets"     -> (e03LshBuckets _),
    "e06_ivf_recall"      -> (e06IvfRecall _))

  /** DuckDB-side cosine identical to the Spark fold: list_transform
    * products (double), list_sum sequential. */
  private def sqlCos(a: String, b: String): String =
    s"""(list_sum(list_transform(range(1, 65), i -> $a[i]::DOUBLE * $b[i]::DOUBLE))
       | / (sqrt(list_sum(list_transform(range(1, 65), i -> $a[i]::DOUBLE * $a[i]::DOUBLE)))
       |  * sqrt(list_sum(list_transform(range(1, 65), i -> $b[i]::DOUBLE * $b[i]::DOUBLE)))))""".stripMargin

  /** DuckDB-side squared-L2 between two 8-dim double lists, same
    * sequential fold as the Spark aggregate(). */
  private def sqlL2sq(a: String, b: String): String =
    s"""list_sum(list_transform(range(1, 9),
       |  j -> ($a[j] - $b[j]) * ($a[j] - $b[j])))""".stripMargin

  val oracles: Map[String, String] = Map(
    // e18: both strategies replayed — pre-filter rank among label-3
    // candidates; post-filter survivors of the unfiltered top-5.
    "e18_filtered_knn" ->
      s"""WITH q AS (
        |  SELECT vec_id AS query_id, embedding AS qe
        |  FROM embeddings WHERE vec_id < 3),
        |pre AS (
        |  SELECT query_id, cand_id, cos_sim,
        |    CAST(row_number() OVER (PARTITION BY query_id
        |      ORDER BY cos_sim DESC, cand_id) AS INT) AS rank FROM (
        |    SELECT q.query_id, c.vec_id AS cand_id,
        |      round(${sqlCos("q.qe", "c.embedding")}, 6) AS cos_sim
        |    FROM q CROSS JOIN embeddings c
        |    WHERE c.vec_id >= 3 AND c.label = 3)),
        |post AS (
        |  SELECT query_id, CAST(count(*) AS BIGINT) AS post_hits FROM (
        |    SELECT query_id, label, row_number() OVER (PARTITION BY query_id
        |      ORDER BY cos_sim DESC, cand_id) AS rnk FROM (
        |      SELECT q.query_id, c.vec_id AS cand_id, c.label,
        |        round(${sqlCos("q.qe", "c.embedding")}, 6) AS cos_sim
        |      FROM q CROSS JOIN embeddings c WHERE c.vec_id >= 3))
        |  WHERE rnk <= 5 AND label = 3 GROUP BY query_id)
        |SELECT p.query_id, p.rank, p.cand_id, p.cos_sim,
        |  coalesce(po.post_hits, 0) AS post_hits,
        |  5 - coalesce(po.post_hits, 0) AS post_shortfall
        |FROM pre p LEFT JOIN post po USING (query_id)
        |WHERE p.rank <= 5 ORDER BY p.query_id, p.rank""".stripMargin,
    // e17: same norms, same max-norm augmentation, same 65-dim cosine
    // fold, same dual ranks — the agree flag is engine-exact because
    // both ranks derive from identically rounded scores.
    "e17_mips_reduction" ->
      """WITH c AS (
        |  SELECT vec_id AS cand_id, embedding,
        |    list_sum(list_transform(range(1, 65),
        |      i -> embedding[i]::DOUBLE * embedding[i]::DOUBLE)) AS n2
        |  FROM embeddings WHERE vec_id >= 3),
        |m AS (SELECT max(n2) AS m2 FROM c),
        |ca AS (
        |  SELECT cand_id, embedding,
        |    list_append(list_transform(range(1, 65),
        |      i -> embedding[i]::DOUBLE), sqrt(m2 - n2)) AS cav
        |  FROM c, m),
        |qa AS (
        |  SELECT vec_id AS query_id, embedding AS qe,
        |    list_append(list_transform(range(1, 65),
        |      i -> embedding[i]::DOUBLE), 0.0) AS qav
        |  FROM embeddings WHERE vec_id < 3),
        |sc AS (
        |  SELECT q.query_id, ca.cand_id,
        |    round(list_sum(list_transform(range(1, 66),
        |        i -> q.qav[i] * ca.cav[i]))
        |      / (sqrt(list_sum(list_transform(range(1, 66),
        |           i -> q.qav[i] * q.qav[i])))
        |       * sqrt(list_sum(list_transform(range(1, 66),
        |           i -> ca.cav[i] * ca.cav[i])))), 6) AS cos_aug,
        |    round(list_sum(list_transform(range(1, 65),
        |      i -> q.qe[i]::DOUBLE * ca.embedding[i]::DOUBLE)), 6) AS ip
        |  FROM qa q CROSS JOIN ca),
        |r AS (
        |  SELECT *,
        |    CAST(row_number() OVER (PARTITION BY query_id
        |      ORDER BY cos_aug DESC, cand_id) AS INT) AS rank,
        |    row_number() OVER (PARTITION BY query_id
        |      ORDER BY ip DESC, cand_id) AS rank_ip
        |  FROM sc)
        |SELECT query_id, rank, cand_id, ip, cos_aug,
        |  rank = rank_ip AS agree
        |FROM r WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin,
    // e16: the full e15 pipeline inlined (the e06 pattern) + exact-L2
    // brute truth; recall is a tiny-set semi-join count.
    "e16_ivfpq_recall" ->
      s"""WITH cent AS (
        |  SELECT label AS c_label, list(m ORDER BY dim) AS cv FROM (
        |    SELECT label, i AS dim, avg(embedding[i]::DOUBLE) AS m
        |    FROM embeddings, range(1, 65) t(i) GROUP BY label, i) GROUP BY label),
        |assigned AS (
        |  SELECT e.vec_id, e.embedding, c.c_label, c.cv,
        |    row_number() OVER (PARTITION BY e.vec_id
        |      ORDER BY round(${sqlCos("e.embedding", "c.cv")}, 6) DESC,
        |        c.c_label) AS rn
        |  FROM embeddings e CROSS JOIN cent c),
        |coded AS (
        |  SELECT vec_id AS cand_id, cell, blk, rb,
        |    (CASE WHEN rb[1] >= 0 THEN 4 ELSE 0 END +
        |     CASE WHEN rb[2] >= 0 THEN 2 ELSE 0 END +
        |     CASE WHEN rb[3] >= 0 THEN 1 ELSE 0 END) AS code FROM (
        |    SELECT vec_id, c_label AS cell, s AS blk,
        |      list_transform(range(s*8+1, s*8+9),
        |        i -> embedding[i]::DOUBLE - cv[i]) AS rb
        |    FROM assigned, range(0, 8) t(s)
        |    WHERE rn = 1 AND vec_id >= 10)),
        |cbk AS (
        |  SELECT blk, code, list(m ORDER BY pos) AS cb FROM (
        |    SELECT blk, code, pos,
        |      round(sum(CAST(round(rb[pos] * 1000000) AS BIGINT))
        |        / count(*)::DOUBLE) / 1000000.0 AS m
        |    FROM coded, range(1, 9) t(pos)
        |    GROUP BY blk, code, pos) GROUP BY blk, code),
        |lut AS (
        |  SELECT q.query_id, q.cell, q.blk, c.code,
        |    CAST(round(${sqlL2sq("q.qb", "c.cb")} * 1000000) AS BIGINT) AS d2u
        |  FROM (
        |    SELECT vec_id AS query_id, c_label AS cell, s AS blk,
        |      list_transform(range(s*8+1, s*8+9),
        |        i -> embedding[i]::DOUBLE - cv[i]) AS qb
        |    FROM assigned, range(0, 8) t(s)
        |    WHERE vec_id < 10 AND rn <= 2) q
        |  JOIN cbk c ON c.blk = q.blk),
        |adc AS (
        |  SELECT l.query_id, d.cand_id, sum(l.d2u) AS adcu
        |  FROM (SELECT DISTINCT cand_id, cell, blk, code FROM coded) d
        |  JOIN lut l ON d.cell = l.cell AND d.blk = l.blk AND d.code = l.code
        |  GROUP BY 1, 2),
        |approx AS (
        |  SELECT query_id, cand_id FROM (
        |    SELECT *, row_number() OVER (PARTITION BY query_id
        |      ORDER BY adcu, cand_id) AS rank FROM adc) WHERE rank <= 5),
        |btruth AS (
        |  SELECT query_id, cand_id FROM (
        |    SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
        |      row_number() OVER (PARTITION BY q.vec_id
        |        ORDER BY round(list_sum(list_transform(range(1, 65),
        |          i -> (q.embedding[i]::DOUBLE - c.embedding[i]::DOUBLE)
        |             * (q.embedding[i]::DOUBLE - c.embedding[i]::DOUBLE))), 6),
        |          c.vec_id) AS rank
        |    FROM embeddings q JOIN embeddings c
        |      ON q.vec_id < 10 AND c.vec_id >= 10)
        |  WHERE rank <= 5),
        |hits AS (
        |  SELECT t.query_id, count(*) AS n_hits
        |  FROM btruth t JOIN approx a
        |    ON t.query_id = a.query_id AND t.cand_id = a.cand_id
        |  GROUP BY t.query_id)
        |SELECT q.query_id, CAST(coalesce(h.n_hits, 0) AS BIGINT) AS n_hits,
        |  round(coalesce(h.n_hits, 0) / 5.0, 4) AS recall_at_5
        |FROM (SELECT vec_id AS query_id FROM embeddings WHERE vec_id < 10) q
        |LEFT JOIN hits h USING (query_id) ORDER BY query_id""".stripMargin,
    // e15: same coarse assign (rounded-cosine argmax), same residuals,
    // same sign-group codes, same integer-micro codebook means, same
    // micro-unit ADC — every stage engine-exact by construction.
    "e15_ivfpq" ->
      s"""WITH cent AS (
        |  SELECT label AS c_label, list(m ORDER BY dim) AS cv FROM (
        |    SELECT label, i AS dim, avg(embedding[i]::DOUBLE) AS m
        |    FROM embeddings, range(1, 65) t(i) GROUP BY label, i) GROUP BY label),
        |assigned AS (
        |  SELECT e.vec_id, e.embedding, c.c_label, c.cv,
        |    row_number() OVER (PARTITION BY e.vec_id
        |      ORDER BY round(${sqlCos("e.embedding", "c.cv")}, 6) DESC,
        |        c.c_label) AS rn
        |  FROM embeddings e CROSS JOIN cent c),
        |coded AS (
        |  SELECT vec_id AS cand_id, cell, blk, rb,
        |    (CASE WHEN rb[1] >= 0 THEN 4 ELSE 0 END +
        |     CASE WHEN rb[2] >= 0 THEN 2 ELSE 0 END +
        |     CASE WHEN rb[3] >= 0 THEN 1 ELSE 0 END) AS code FROM (
        |    SELECT vec_id, c_label AS cell, s AS blk,
        |      list_transform(range(s*8+1, s*8+9),
        |        i -> embedding[i]::DOUBLE - cv[i]) AS rb
        |    FROM assigned, range(0, 8) t(s)
        |    WHERE rn = 1 AND vec_id >= 10)),
        |cbk AS (
        |  SELECT blk, code, list(m ORDER BY pos) AS cb FROM (
        |    SELECT blk, code, pos,
        |      round(sum(CAST(round(rb[pos] * 1000000) AS BIGINT))
        |        / count(*)::DOUBLE) / 1000000.0 AS m
        |    FROM coded, range(1, 9) t(pos)
        |    GROUP BY blk, code, pos) GROUP BY blk, code),
        |lut AS (
        |  SELECT q.query_id, q.cell, q.blk, c.code,
        |    CAST(round(${sqlL2sq("q.qb", "c.cb")} * 1000000) AS BIGINT) AS d2u
        |  FROM (
        |    SELECT vec_id AS query_id, c_label AS cell, s AS blk,
        |      list_transform(range(s*8+1, s*8+9),
        |        i -> embedding[i]::DOUBLE - cv[i]) AS qb
        |    FROM assigned, range(0, 8) t(s)
        |    WHERE vec_id < 10 AND rn <= 2) q
        |  JOIN cbk c ON c.blk = q.blk),
        |adc AS (
        |  SELECT l.query_id, d.cand_id, d.cell, sum(l.d2u) AS adcu
        |  FROM (SELECT DISTINCT cand_id, cell, blk, code FROM coded) d
        |  JOIN lut l ON d.cell = l.cell AND d.blk = l.blk AND d.code = l.code
        |  GROUP BY 1, 2, 3),
        |ranked AS (
        |  SELECT *, CAST(row_number() OVER (PARTITION BY query_id
        |    ORDER BY adcu, cand_id) AS INT) AS rank FROM adc)
        |SELECT query_id, rank, cand_id, cell, adcu / 1000000.0 AS adc
        |FROM ranked WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin,
    // e14: same sign buckets, same (rounded cosine, vec_id) neighbor
    // rank, macro ratio as one BIGINT/BIGINT division.
    "e14_label_purity" ->
      s"""WITH b AS (
        |  SELECT vec_id, label, embedding,
        |    (CASE WHEN embedding[1] > 0 THEN 4 ELSE 0 END +
        |     CASE WHEN embedding[8] > 0 THEN 2 ELSE 0 END +
        |     CASE WHEN embedding[22] > 0 THEN 1 ELSE 0 END) AS bucket
        |  FROM embeddings),
        |p AS (
        |  SELECT a.vec_id AS va, a.label AS la, c.vec_id AS vb, c.label AS lb,
        |    round(${sqlCos("a.embedding", "c.embedding")}, 6) AS cs
        |  FROM b a JOIN b c ON a.bucket = c.bucket AND a.vec_id <> c.vec_id),
        |r AS (
        |  SELECT *, row_number() OVER (PARTITION BY va
        |    ORDER BY cs DESC, vb) AS rn FROM p),
        |k AS (
        |  SELECT va, la,
        |    sum(CASE WHEN la = lb THEN 1 ELSE 0 END) AS n_same,
        |    count(*) AS n_nbrs
        |  FROM r WHERE rn <= 5 GROUP BY va, la)
        |SELECT la AS label, CAST(count(*) AS BIGINT) AS n_vecs,
        |  CAST(sum(n_same) AS BIGINT) AS sum_same,
        |  CAST(sum(n_nbrs) AS BIGINT) AS sum_nbrs,
        |  round(CAST(sum(n_same) AS BIGINT) / CAST(sum(n_nbrs) AS BIGINT), 4)
        |    AS macro_purity
        |FROM k GROUP BY la ORDER BY label""".stripMargin,
    // e13: the greedy MMR recursion unrolled to its 3 fixed rounds —
    // shortlist, pairwise sims, pick1 = argmax rel, each later pick an
    // anti-join + max-sim + argmax, all on the same rounded doubles.
    "e13_mmr_rerank" ->
      s"""WITH q AS (SELECT vec_id AS query_id, embedding AS qv
        |           FROM embeddings WHERE vec_id < 5),
        |c AS (SELECT vec_id AS cand_id, embedding AS cv
        |      FROM embeddings WHERE vec_id >= 5),
        |scored AS (
        |  SELECT query_id, cand_id, cv,
        |    round(${sqlCos("qv", "cv")}, 6) AS rel FROM q, c),
        |short AS (
        |  SELECT *, CAST(round(rel * 1e6) AS BIGINT) AS rel_u FROM (
        |    SELECT *, row_number() OVER (PARTITION BY query_id
        |      ORDER BY rel DESC, cand_id) AS rrank FROM scored)
        |  WHERE rrank <= 10),
        |sims AS (
        |  SELECT a.query_id, a.cand_id AS ca, b.cand_id AS cb,
        |    CAST(round(round(${sqlCos("a.cv", "b.cv")}, 6) * 1e6) AS BIGINT) AS sim_u
        |  FROM short a JOIN short b
        |    ON a.query_id = b.query_id AND a.cand_id <> b.cand_id),
        |p1 AS (SELECT query_id, cand_id, 1 AS rank,
        |         rel_u * 7 AS score_u FROM short WHERE rrank = 1),
        |m2 AS (SELECT m.query_id, m.ca AS cand_id, max(m.sim_u) AS max_sim_u
        |       FROM sims m JOIN p1 ON m.query_id = p1.query_id AND m.cb = p1.cand_id
        |       GROUP BY m.query_id, m.ca),
        |s2 AS (SELECT s.query_id, s.cand_id,
        |         s.rel_u * 7 - x.max_sim_u * 3 AS score_u
        |       FROM short s JOIN m2 x
        |         ON s.query_id = x.query_id AND s.cand_id = x.cand_id
        |       LEFT JOIN p1 ON s.query_id = p1.query_id AND s.cand_id = p1.cand_id
        |       WHERE p1.cand_id IS NULL),
        |p2 AS (SELECT query_id, cand_id, 2 AS rank, score_u FROM (
        |         SELECT *, row_number() OVER (PARTITION BY query_id
        |           ORDER BY score_u DESC, cand_id) AS rn FROM s2) WHERE rn = 1),
        |sel2 AS (SELECT query_id, cand_id FROM p1
        |         UNION ALL SELECT query_id, cand_id FROM p2),
        |m3 AS (SELECT m.query_id, m.ca AS cand_id, max(m.sim_u) AS max_sim_u
        |       FROM sims m JOIN sel2 ON m.query_id = sel2.query_id AND m.cb = sel2.cand_id
        |       GROUP BY m.query_id, m.ca),
        |s3 AS (SELECT s.query_id, s.cand_id,
        |         s.rel_u * 7 - x.max_sim_u * 3 AS score_u
        |       FROM short s JOIN m3 x
        |         ON s.query_id = x.query_id AND s.cand_id = x.cand_id
        |       LEFT JOIN sel2 ON s.query_id = sel2.query_id AND s.cand_id = sel2.cand_id
        |       WHERE sel2.cand_id IS NULL),
        |p3 AS (SELECT query_id, cand_id, 3 AS rank, score_u FROM (
        |         SELECT *, row_number() OVER (PARTITION BY query_id
        |           ORDER BY score_u DESC, cand_id) AS rn FROM s3) WHERE rn = 1),
        |allp AS (SELECT * FROM p1 UNION ALL SELECT * FROM p2
        |         UNION ALL SELECT * FROM p3)
        |SELECT p.query_id, p.rank, p.cand_id, s.rel,
        |  p.score_u / 1e7 AS score
        |FROM allp p JOIN short s
        |  ON p.query_id = s.query_id AND p.cand_id = s.cand_id
        |ORDER BY p.query_id, p.rank""".stripMargin,
    // e12: prefix-8 coarse rank → top-20 shortlist → exact 64-dim
    // rerank; the oracle scores every pair (exact_ip is only OBSERVED
    // on shortlist survivors, where it equals the Spark rerank).
    "e12_matryoshka_topk" ->
      """WITH c AS (SELECT vec_id AS cand_id, embedding
        |           FROM embeddings WHERE vec_id >= 10),
        |q AS (SELECT vec_id AS query_id, embedding
        |      FROM embeddings WHERE vec_id < 10),
        |scored AS (
        |  SELECT q.query_id, c.cand_id,
        |    round(list_sum(list_transform(range(1, 9), i ->
        |      q.embedding[i]::DOUBLE * c.embedding[i]::DOUBLE)), 6) AS coarse_ip,
        |    round(list_sum(list_transform(range(1, 65), i ->
        |      q.embedding[i]::DOUBLE * c.embedding[i]::DOUBLE)), 6) AS exact_ip
        |  FROM q, c),
        |shortlist AS (
        |  SELECT * FROM (
        |    SELECT *, CAST(row_number() OVER (PARTITION BY query_id
        |      ORDER BY coarse_ip DESC, cand_id) AS INT) AS coarse_rank
        |    FROM scored) WHERE coarse_rank <= 20),
        |reranked AS (
        |  SELECT *, CAST(row_number() OVER (PARTITION BY query_id
        |    ORDER BY exact_ip DESC, cand_id) AS INT) AS rank
        |  FROM shortlist)
        |SELECT query_id, rank, cand_id, coarse_rank, coarse_ip, exact_ip
        |FROM reranked WHERE rank <= 3 ORDER BY query_id, rank""".stripMargin,
    // e11: per-dim bounds → uint8 encode → asymmetric dequantized dot,
    // every double expression shaped exactly as the Spark fold.
    "e11_sq8_topk" ->
      """WITH dims AS (
        |  SELECT i AS pos, min(embedding[i]::DOUBLE) AS lo,
        |         max(embedding[i]::DOUBLE) AS hi
        |  FROM embeddings, range(1, 65) t(i) GROUP BY i),
        |b AS (SELECT list(lo ORDER BY pos) AS lo,
        |             list(hi ORDER BY pos) AS hi FROM dims),
        |scored AS (
        |  SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
        |    round(list_sum(list_transform(range(1, 65), i ->
        |      q.embedding[i]::DOUBLE *
        |        (b.lo[i] + CAST(round((c.embedding[i]::DOUBLE - b.lo[i])
        |           / (b.hi[i] - b.lo[i]) * 255) AS INT) / 255
        |           * (b.hi[i] - b.lo[i])))), 6) AS sq_ip,
        |    round(list_sum(list_transform(range(1, 65), i ->
        |      q.embedding[i]::DOUBLE * c.embedding[i]::DOUBLE)), 6) AS exact_ip
        |  FROM embeddings q, embeddings c, b
        |  WHERE q.vec_id < 10 AND c.vec_id >= 10),
        |ranked AS (
        |  SELECT *, CAST(row_number() OVER (PARTITION BY query_id
        |    ORDER BY sq_ip DESC, cand_id) AS INT) AS rank FROM scored)
        |SELECT query_id, rank, cand_id, sq_ip, exact_ip,
        |  round(abs(sq_ip - exact_ip), 6) AS abs_err
        |FROM ranked WHERE rank <= 3 ORDER BY query_id, rank""".stripMargin,
    "e10_mips_brute" ->
      """WITH scored AS (
        |  SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
        |    round(list_sum(list_transform(range(1, 65),
        |      i -> q.embedding[i]::DOUBLE * c.embedding[i]::DOUBLE)), 6) AS ip
        |  FROM embeddings q JOIN embeddings c
        |    ON q.vec_id < 3 AND c.vec_id >= 3),
        |ranked AS (
        |  SELECT *, CAST(row_number() OVER (PARTITION BY query_id
        |    ORDER BY ip DESC, cand_id) AS INT) AS rank FROM scored)
        |SELECT query_id, rank, cand_id, ip FROM ranked
        |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin,
    "e09_neardup_clusters" ->
      s"""WITH RECURSIVE b AS (
        |  SELECT vec_id, embedding,
        |    CAST(CASE WHEN embedding[1] > 0 THEN 4 ELSE 0 END
        |       + CASE WHEN embedding[8] > 0 THEN 2 ELSE 0 END
        |       + CASE WHEN embedding[22] > 0 THEN 1 ELSE 0 END AS INT) AS bucket
        |  FROM embeddings),
        |nd AS (
        |  SELECT a.vec_id AS va, c.vec_id AS vb
        |  FROM b a JOIN b c ON a.bucket = c.bucket AND a.vec_id < c.vec_id
        |  WHERE round(${sqlCos("a.embedding", "c.embedding")}, 6) >= 0.4),
        |und AS (SELECT va AS u, vb AS v FROM nd UNION SELECT vb, va FROM nd),
        |reach(u, v) AS (
        |  SELECT u, v FROM und
        |  UNION
        |  SELECT r.u, e.v FROM reach r JOIN und e ON r.v = e.u WHERE e.v <> r.u)
        |SELECT u AS vec_id, least(u, min(v)) AS keeper_id,
        |  CAST(least(u, min(v)) <> u AS INT) AS is_dup
        |FROM reach GROUP BY u ORDER BY vec_id""".stripMargin,
    "e08_pq_adc" ->
      s"""WITH cent AS (
        |  SELECT label AS c_label, list(m ORDER BY dim) AS cv FROM (
        |    SELECT label, i AS dim, avg(embedding[i]::DOUBLE) AS m
        |    FROM embeddings, range(1, 65) t(i) GROUP BY label, i) GROUP BY label),
        |cb AS (
        |  SELECT c_label, s AS blk, cv[s*8+1 : s*8+8] AS cbv
        |  FROM cent, range(0, 8) t(s)),
        |vb AS (
        |  SELECT vec_id, s AS blk,
        |    list_transform(embedding[s*8+1 : s*8+8], x -> x::DOUBLE) AS vbv
        |  FROM embeddings, range(0, 8) t(s)),
        |enc AS (
        |  SELECT vec_id, blk, c_label AS code FROM (
        |    SELECT v.vec_id, v.blk, c.c_label,
        |      row_number() OVER (PARTITION BY v.vec_id, v.blk
        |        ORDER BY round(${sqlL2sq("v.vbv", "c.cbv")}, 6), c.c_label) AS rn
        |    FROM vb v JOIN cb c USING (blk))
        |  WHERE rn = 1),
        |lut AS (
        |  SELECT v.vec_id AS query_id, v.blk, c.c_label AS code,
        |    ${sqlL2sq("v.vbv", "c.cbv")} AS d2
        |  FROM vb v JOIN cb c USING (blk) WHERE v.vec_id < 5),
        |adc AS (
        |  SELECT l.query_id, e2.vec_id AS cand_id,
        |    sum(CAST(round(l.d2 * 1000000) AS BIGINT)) / 1000000.0 AS adc
        |  FROM enc e2 JOIN lut l ON e2.blk = l.blk AND e2.code = l.code
        |  WHERE e2.vec_id >= 5
        |  GROUP BY l.query_id, e2.vec_id),
        |ranked AS (
        |  SELECT *, CAST(row_number() OVER (PARTITION BY query_id
        |    ORDER BY adc, cand_id) AS INT) AS rank FROM adc)
        |SELECT query_id, rank, cand_id, adc FROM ranked
        |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin,
    "e07_kmeans_step" ->
      s"""WITH cent AS (
        |  SELECT label AS c_label, list(m ORDER BY dim) AS cv FROM (
        |    SELECT label, i AS dim, avg(embedding[i]::DOUBLE) AS m
        |    FROM embeddings, range(1, 65) t(i) GROUP BY label, i) GROUP BY label),
        |assigned AS (
        |  SELECT vec_id, embedding, c_label AS cell FROM (
        |    SELECT e.vec_id, e.embedding, c.c_label,
        |      row_number() OVER (PARTITION BY e.vec_id
        |        ORDER BY round(${sqlCos("e.embedding", "c.cv")}, 6) DESC, c.c_label) AS rn
        |    FROM embeddings e CROSS JOIN cent c)
        |  WHERE rn = 1),
        |newcent AS (
        |  SELECT cell, CAST(nm AS BIGINT) AS n_members, list(m ORDER BY dim) AS nv FROM (
        |    SELECT a.cell, i AS dim, avg(a.embedding[i]::DOUBLE) AS m,
        |      any_value(cnt) AS nm
        |    FROM assigned a
        |    JOIN (SELECT cell, count(*) AS cnt FROM assigned GROUP BY cell) n
        |      USING (cell), range(1, 65) t(i)
        |    GROUP BY a.cell, i) GROUP BY cell, nm)
        |SELECT n.cell, n.n_members,
        |  round(${sqlCos("c.cv", "n.nv")}, 6) AS drift_cos,
        |  round(n.nv[1], 6) AS c1, round(n.nv[2], 6) AS c2
        |FROM newcent n JOIN cent c ON n.cell = c.c_label
        |ORDER BY n.cell""".stripMargin,
    // e19: K = max(4, floor(sqrt(N))) seed cells by lowest vec_id, one
    // Lloyd step (avg per dim over the seed assignment), reassign,
    // nprobe=1 — both sides round cosines to 6dp before every rank so
    // double-vs-list mean drift cannot flip an assignment.
    // e21: the e19 assignment CTEs + e20's greedy keep-first dups.
    "e21_semdedup_sqrtk" ->
      s"""WITH p AS (
        |  SELECT CAST(greatest(4, floor(sqrt((SELECT count(*) FROM embeddings)))) AS BIGINT) AS k),
        |seeds AS (
        |  SELECT vec_id AS c_id, embedding AS cv FROM embeddings
        |  QUALIFY row_number() OVER (ORDER BY vec_id) <= (SELECT k FROM p)),
        |a0 AS (
        |  SELECT vec_id, embedding, c_id AS cell FROM (
        |    SELECT e.vec_id, e.embedding, s.c_id,
        |      row_number() OVER (PARTITION BY e.vec_id
        |        ORDER BY round(${sqlCos("e.embedding", "s.cv")}, 6) DESC, s.c_id) AS rn
        |    FROM embeddings e CROSS JOIN seeds s)
        |  WHERE rn = 1),
        |cent AS (
        |  SELECT cell AS c_id, list(m ORDER BY dim) AS cv FROM (
        |    SELECT cell, i AS dim, avg(embedding[i]::DOUBLE) AS m
        |    FROM a0, range(1, 65) t(i) GROUP BY cell, i) GROUP BY cell),
        |a1 AS (
        |  SELECT vec_id, embedding, c_id AS cell FROM (
        |    SELECT e.vec_id, e.embedding, c.c_id,
        |      row_number() OVER (PARTITION BY e.vec_id
        |        ORDER BY round(${sqlCos("e.embedding", "c.cv")}, 6) DESC, c.c_id) AS rn
        |    FROM embeddings e CROSS JOIN cent c)
        |  WHERE rn = 1),
        |dups AS (
        |  SELECT v.vec_id, min(u.vec_id) AS dup_of
        |  FROM a1 v JOIN a1 u ON v.cell = u.cell AND u.vec_id < v.vec_id
        |  WHERE round(${sqlCos("u.embedding", "v.embedding")}, 6) >= 0.45
        |  GROUP BY v.vec_id)
        |SELECT a.vec_id, a.cell, d.dup_of, d.dup_of IS NOT NULL AS is_dup
        |FROM a1 a LEFT JOIN dups d ON a.vec_id = d.vec_id
        |ORDER BY a.vec_id""".stripMargin,
    "e19_ivf_sqrtk" ->
      s"""WITH p AS (
        |  SELECT CAST(greatest(4, floor(sqrt((SELECT count(*) FROM embeddings)))) AS BIGINT) AS k),
        |seeds AS (
        |  SELECT vec_id AS c_id, embedding AS cv FROM embeddings
        |  QUALIFY row_number() OVER (ORDER BY vec_id) <= (SELECT k FROM p)),
        |a0 AS (
        |  SELECT vec_id, embedding, c_id AS cell FROM (
        |    SELECT e.vec_id, e.embedding, s.c_id,
        |      row_number() OVER (PARTITION BY e.vec_id
        |        ORDER BY round(${sqlCos("e.embedding", "s.cv")}, 6) DESC, s.c_id) AS rn
        |    FROM embeddings e CROSS JOIN seeds s)
        |  WHERE rn = 1),
        |cent AS (
        |  SELECT cell AS c_id, list(m ORDER BY dim) AS cv FROM (
        |    SELECT cell, i AS dim, avg(embedding[i]::DOUBLE) AS m
        |    FROM a0, range(1, 65) t(i) GROUP BY cell, i) GROUP BY cell),
        |a1 AS (
        |  SELECT vec_id, embedding, c_id AS cell FROM (
        |    SELECT e.vec_id, e.embedding, c.c_id,
        |      row_number() OVER (PARTITION BY e.vec_id
        |        ORDER BY round(${sqlCos("e.embedding", "c.cv")}, 6) DESC, c.c_id) AS rn
        |    FROM embeddings e CROSS JOIN cent c)
        |  WHERE rn = 1),
        |scored AS (
        |  SELECT q.vec_id AS query_id, q.cell, c.vec_id AS cand_id,
        |    round(${sqlCos("q.embedding", "c.embedding")}, 6) AS cos_sim
        |  FROM a1 q JOIN a1 c ON q.cell = c.cell
        |   AND q.vec_id < 10 AND c.vec_id >= 10),
        |ranked AS (
        |  SELECT *, CAST(row_number() OVER (PARTITION BY query_id
        |    ORDER BY cos_sim DESC, cand_id) AS INT) AS rank FROM scored)
        |SELECT query_id, cell, rank, cand_id, cos_sim FROM ranked
        |WHERE rank <= 3 ORDER BY query_id, rank""".stripMargin,
    "e05_ivf_topk" ->
      s"""WITH cent AS (
        |  SELECT label AS c_label, list(m ORDER BY dim) AS cv FROM (
        |    SELECT label, i AS dim, avg(embedding[i]::DOUBLE) AS m
        |    FROM embeddings, range(1, 65) t(i) GROUP BY label, i) GROUP BY label),
        |assigned AS (
        |  SELECT vec_id, embedding, c_label AS cell FROM (
        |    SELECT e.vec_id, e.embedding, c.c_label,
        |      row_number() OVER (PARTITION BY e.vec_id
        |        ORDER BY round(${sqlCos("e.embedding", "c.cv")}, 6) DESC, c.c_label) AS rn
        |    FROM embeddings e CROSS JOIN cent c)
        |  WHERE rn = 1),
        |scored AS (
        |  SELECT q.vec_id AS query_id, q.cell, c.vec_id AS cand_id,
        |    round(${sqlCos("q.embedding", "c.embedding")}, 6) AS cos_sim
        |  FROM assigned q JOIN assigned c ON q.cell = c.cell
        |   AND q.vec_id < 10 AND c.vec_id >= 10),
        |ranked AS (
        |  SELECT *, CAST(row_number() OVER (PARTITION BY query_id
        |    ORDER BY cos_sim DESC, cand_id) AS INT) AS rank FROM scored)
        |SELECT query_id, cell, rank, cand_id, cos_sim FROM ranked
        |WHERE rank <= 3 ORDER BY query_id, rank""".stripMargin,
    "e06_ivf_recall" ->
      s"""WITH cent AS (
        |  SELECT label AS c_label, list(m ORDER BY dim) AS cv FROM (
        |    SELECT label, i AS dim, avg(embedding[i]::DOUBLE) AS m
        |    FROM embeddings, range(1, 65) t(i) GROUP BY label, i) GROUP BY label),
        |assigned AS (
        |  SELECT vec_id, embedding, c_label AS cell FROM (
        |    SELECT e.vec_id, e.embedding, c.c_label,
        |      row_number() OVER (PARTITION BY e.vec_id
        |        ORDER BY round(${sqlCos("e.embedding", "c.cv")}, 6) DESC, c.c_label) AS rn
        |    FROM embeddings e CROSS JOIN cent c)
        |  WHERE rn = 1),
        |ivf AS (
        |  SELECT query_id, cand_id FROM (
        |    SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
        |      row_number() OVER (PARTITION BY q.vec_id
        |        ORDER BY round(${sqlCos("q.embedding", "c.embedding")}, 6) DESC, c.vec_id) AS rank
        |    FROM assigned q JOIN assigned c ON q.cell = c.cell
        |     AND q.vec_id < 10 AND c.vec_id >= 10)
        |  WHERE rank <= 3),
        |btruth AS (
        |  SELECT query_id, cand_id FROM (
        |    SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
        |      row_number() OVER (PARTITION BY q.vec_id
        |        ORDER BY round(${sqlCos("q.embedding", "c.embedding")}, 6) DESC, c.vec_id) AS rank
        |    FROM embeddings q JOIN embeddings c ON q.vec_id < 10 AND c.vec_id >= 10)
        |  WHERE rank <= 3),
        |hits AS (
        |  SELECT t.query_id, count(*) AS n_hits
        |  FROM btruth t JOIN ivf i
        |    ON t.query_id = i.query_id AND t.cand_id = i.cand_id
        |  GROUP BY t.query_id)
        |SELECT q.query_id, CAST(coalesce(h.n_hits, 0) AS BIGINT) AS n_hits,
        |  round(coalesce(h.n_hits, 0) / 3.0, 4) AS recall_at_3
        |FROM (SELECT vec_id AS query_id FROM embeddings WHERE vec_id < 10) q
        |LEFT JOIN hits h USING (query_id) ORDER BY query_id""".stripMargin,
    // e20: the e05 assignment CTE + a per-vector min-earlier-mate
    // aggregate over the within-cell pair join.
    "e20_semdedup" ->
      s"""WITH cent AS (
        |  SELECT label AS c_label, list(m ORDER BY dim) AS cv FROM (
        |    SELECT label, i AS dim, avg(embedding[i]::DOUBLE) AS m
        |    FROM embeddings, range(1, 65) t(i) GROUP BY label, i) GROUP BY label),
        |assigned AS (
        |  SELECT vec_id, embedding, c_label AS cell FROM (
        |    SELECT e.vec_id, e.embedding, c.c_label,
        |      row_number() OVER (PARTITION BY e.vec_id
        |        ORDER BY round(${sqlCos("e.embedding", "c.cv")}, 6) DESC, c.c_label) AS rn
        |    FROM embeddings e CROSS JOIN cent c)
        |  WHERE rn = 1),
        |dups AS (
        |  SELECT v.vec_id, min(u.vec_id) AS dup_of
        |  FROM assigned v JOIN assigned u ON v.cell = u.cell
        |   AND u.vec_id < v.vec_id
        |  WHERE round(${sqlCos("u.embedding", "v.embedding")}, 6) >= 0.45
        |  GROUP BY v.vec_id)
        |SELECT a.vec_id, a.cell, d.dup_of,
        |  d.dup_of IS NOT NULL AS is_dup
        |FROM assigned a LEFT JOIN dups d ON a.vec_id = d.vec_id
        |ORDER BY a.vec_id""".stripMargin,
    "e04_cosine_neardup" ->
      s"""WITH b AS (
        |  SELECT vec_id, embedding,
        |    CAST(CASE WHEN embedding[1] > 0 THEN 4 ELSE 0 END
        |       + CASE WHEN embedding[8] > 0 THEN 2 ELSE 0 END
        |       + CASE WHEN embedding[22] > 0 THEN 1 ELSE 0 END AS INT) AS bucket
        |  FROM embeddings)
        |SELECT a.vec_id AS vec_a, c.vec_id AS vec_b,
        |  round(${sqlCos("a.embedding", "c.embedding")}, 6) AS cos_sim,
        |  least(a.vec_id, c.vec_id) AS keep_id
        |FROM b a JOIN b c ON a.bucket = c.bucket AND a.vec_id < c.vec_id
        |WHERE round(${sqlCos("a.embedding", "c.embedding")}, 6) >= 0.4
        |ORDER BY vec_a, vec_b""".stripMargin,
    "e01_knn_brute" ->
      s"""WITH scored AS (
        |  SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
        |    round(${sqlCos("q.embedding", "c.embedding")}, 6) AS cos_sim
        |  FROM embeddings q JOIN embeddings c
        |    ON q.vec_id < 3 AND c.vec_id >= 3),
        |ranked AS (
        |  SELECT *, CAST(row_number() OVER (PARTITION BY query_id
        |    ORDER BY cos_sim DESC, cand_id) AS INT) AS rank FROM scored)
        |SELECT query_id, rank, cand_id, cos_sim FROM ranked
        |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin,
    "e02_centroid_assign" ->
      s"""WITH cent AS (
        |  SELECT label AS c_label, list(m ORDER BY dim) AS cv FROM (
        |    SELECT label, i AS dim, avg(embedding[i]::DOUBLE) AS m
        |    FROM embeddings, range(1, 65) t(i) GROUP BY label, i) GROUP BY label),
        |scored AS (
        |  SELECT e.vec_id, e.label AS true_label, c.c_label,
        |    round(${sqlCos("e.embedding", "c.cv")}, 6) AS cos_sim
        |  FROM embeddings e JOIN cent c ON e.vec_id < 50),
        |ranked AS (
        |  SELECT *, row_number() OVER (PARTITION BY vec_id
        |    ORDER BY cos_sim DESC, c_label) AS rn FROM scored)
        |SELECT vec_id, true_label, c_label AS nearest_label, cos_sim
        |FROM ranked WHERE rn = 1 ORDER BY vec_id""".stripMargin,
    "e03_lsh_buckets" ->
      s"""WITH b AS (
        |  SELECT vec_id, embedding,
        |    CAST(CASE WHEN embedding[1] > 0 THEN 4 ELSE 0 END
        |       + CASE WHEN embedding[8] > 0 THEN 2 ELSE 0 END
        |       + CASE WHEN embedding[22] > 0 THEN 1 ELSE 0 END AS INT) AS bucket
        |  FROM embeddings),
        |scored AS (
        |  SELECT q.vec_id AS query_id, q.bucket, c.vec_id AS cand_id,
        |    round(${sqlCos("q.embedding", "c.embedding")}, 6) AS cos_sim
        |  FROM b q JOIN b c ON q.bucket = c.bucket
        |   AND q.vec_id < 10 AND c.vec_id >= 10),
        |ranked AS (
        |  SELECT *, CAST(row_number() OVER (PARTITION BY query_id
        |    ORDER BY cos_sim DESC, cand_id) AS INT) AS rank FROM scored)
        |SELECT query_id, bucket, rank, cand_id, cos_sim FROM ranked
        |WHERE rank <= 3 ORDER BY query_id, rank""".stripMargin)
}
