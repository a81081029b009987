package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.Multimodal

/** Driver-gated check of the multimodal plumbing: the mapPartitions
  * decode path runs for real; the stub decoder's byte math is replicated
  * by the oracle over the same utf-8 bytes (corpus text is ASCII).
  */
object MultimodalQueries extends QueryPack {

  /** m01 — binary decode + featurize + frame-sample through the typed
    * Dataset mapPartitions pipeline. The frame vector is emitted as a
    * comma-joined string: the driver's pandas-based compare can't sort
    * rows containing raw array cells (round-1 m01/m02 both error'd in
    * `sort_values` on exactly that), and the string form hash-compares
    * losslessly. */
  def m01DecodeFeatures(s: SparkSession, dir: String): DataFrame =
    Multimodal.decodeFeatures(Multimodal.mediaFromDocuments(s, dir))
      .toDF()
      .select(col("id"), col("format"), col("n_bytes"), col("first_byte"),
        col("checksum16"),
        array_join(col("frames").cast("array<string>"), ",").as("frames"))
      .orderBy("id")

  /** m02 — "resize" (byte-level image-resize/audio-resample stand-in):
    * stride-downsample every blob to 8 cells through the mapPartitions
    * decoder, over the mixed-format media table. Cells emitted
    * comma-joined for the same driver-compare reason as m01. */
  def m02Resize(s: SparkSession, dir: String): DataFrame =
    Multimodal.resize(Multimodal.mediaMixed(s, dir), 8)
      .toDF()
      .select(col("id"), col("format"), col("n_bytes"),
        array_join(col("resized").cast("array<string>"), ",").as("resized"))
      .orderBy("id")

  /** m03 — per-format media statistics: the decoded-feature table
    * composed with a plain relational agg (metadata + features flow
    * into Catalyst once decode is done; the blob itself never shuffles).
    */
  def m03MediaStats(s: SparkSession, dir: String): DataFrame =
    Multimodal.decodeFeatures(Multimodal.mediaMixed(s, dir))
      .toDF()
      .groupBy("format")
      .agg(count(lit(1)).as("n_media"),
        round(avg("n_bytes"), 2).as("avg_bytes"),
        sum("checksum16").as("sum_checksum"))
      .orderBy("format")

  /** m04 — frame table: the sampled frame vector exploded to one row
    * per (media, frame index) via `posexplode` — the long-format table
    * a frame-level training pipeline consumes (and the inverse of m01's
    * packed form). The blob is dropped before the generator, so only
    * scalar features flow through the explode. */
  def m04FrameExplode(s: SparkSession, dir: String): DataFrame =
    Multimodal.decodeFeatures(Multimodal.mediaFromDocuments(s, dir))
      .toDF()
      .select(col("id"), posexplode(col("frames")).as(Seq("frame_idx", "frame_val")))
      .orderBy("id", "frame_idx")

  /** m05 — cross-modal curation matrix: each document's text-quality
    * verdict (d04) joined to its embedding's cluster label by shared id
    * — the table a multimodal pipeline reads to decide which (cluster,
    * quality) cells to keep, upsample, or drop. One equi-join on the id
    * (both sides already carry it — no re-embedding, no shuffle wider
    * than the id + two small columns), then a tiny aggregate. */
  def m05ModalityJoin(s: SparkSession, dir: String): DataFrame = {
    val quality = TextQueries.d04Quality(s, dir)
      .select(col("doc_id"), col("quality_ok"), col("alpha_ratio"))
    val emb = graft.core.Tables.embeddings(s, dir)
      .select(col("vec_id").as("doc_id"), col("label"))
    quality.join(emb, "doc_id")
      .groupBy("label", "quality_ok")
      // exact decimal sum then one double division: a double running
      // sum of the 4-decimal ratios would flap the 4th decimal with
      // partition order (the dsum rule)
      .agg(count(lit(1)).as("n_docs"),
        round(sum(col("alpha_ratio").cast("decimal(14,4)")).cast("double") /
          count(lit(1)), 4).as("avg_alpha"))
      .orderBy("label", "quality_ok")
  }

  /** m06 — exact blob dedup: content-hash every media blob, first id
    * per hash wins, per-format dedup stats (blob count, uniques, bytes
    * freeable). The universal first pass of a media ingest pipeline —
    * a content-addressed store is format-agnostic, so the dedup window
    * spans formats while the stats roll up per format. Only (hash,
    * length) shuffle; the blob itself never leaves its scan (the
    * d01/d25 law at binary granularity, and the same
    * hash-partitioned-window scale argument). */
  def m06BlobDedup(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    Multimodal.mediaMixed(s, dir).toDF()
      .select(col("id"), col("format"),
        length(col("media")).as("n_bytes"), md5(col("media")).as("h"))
      .withColumn("rn", row_number().over(Window.partitionBy("h").orderBy("id")))
      .groupBy("format")
      .agg(count(lit(1)).as("n_blobs"),
        sum(when(col("rn") === 1, 1L).otherwise(0L)).as("n_unique"),
        sum(when(col("rn") > 1, col("n_bytes")).otherwise(0L)).as("freed_bytes"))
      .orderBy("format")
  }

  /** m07 — the `binaryFile` ingest source through the gate: blobs
    * staged one file per record (the object-store layout a real media
    * lake lands in), ingested with Spark's built-in binaryFile format,
    * identity recovered from the file path, content verified by hash
    * against the table the blobs came from. The staging write runs
    * executor-side (foreachPartition), not through a driver collect.
    *
    * Scale: binaryFile packs many small files per task (bin-packing by
    * `spark.sql.files.maxPartitionBytes` / openCostInBytes), listing is
    * distributed, and `pathGlobFilter` prunes non-media files at
    * discovery time — the standard way a 100 TB blob store enters
    * Spark without a per-file driver loop. Project metadata + hash
    * immediately (as here) so the payload bytes never reach a shuffle.
    */
  def m07BinarySource(s: SparkSession, dir: String): DataFrame = {
    val tmp = java.nio.file.Files.createTempDirectory("graft-m07-bin")
    val tmpStr = tmp.toString
    try {
      Multimodal.mediaFromDocuments(s, dir).foreachPartition {
        (it: Iterator[Multimodal.MediaRecord]) =>
          it.foreach { r =>
            java.nio.file.Files.write(
              java.nio.file.Paths.get(tmpStr, f"${r.id}%08d.bin"), r.media)
          }
      }
      s.read.format("binaryFile")
        .option("pathGlobFilter", "*.bin")
        .load(tmpStr)
        .select(
          regexp_extract(col("path"), "([0-9]+)\\.bin$", 1).cast("long")
            .as("doc_id"),
          col("length").as("n_bytes"),
          md5(col("content")).as("h"))
        .orderBy("doc_id")
        .localCheckpoint(true)
    } finally graft.core.TempDirs.deleteQuietly(tmp, "m07")
  }

  /** m08 — fuzzy-hash near-dup over media blobs: the multimodal twin
    * of MinHash-LSH (d07). Each blob is stub-"decoded" to a TLSH-style
    * 64-bit byte-4-gram signature ([[Multimodal.phashOf]] — two 32-bit
    * halves so the oracle's BIGINT math never overflows), banded into
    * 4×16-bit bands, and candidate pairs come from a band equi-join —
    * only pairs agreeing on ≥1 band are ever compared — then verified
    * by full Hamming distance ≤ 6.
    *
    * Scale: candidate generation, not pairwise comparison (§SCALE.md 4)
    * — the only shuffle is the band-key join; the blob never leaves its
    * scan (hash halves are 16 bytes/row); a real deployment swaps the
    * stub signature for DCT-pHash pixels with the identical plan. */
  def m08PhashNeardup(s: SparkSession, dir: String): DataFrame = {
    // materialized: the band table self-joins, and without this the
    // scan + phash kernel + explode would run once per join arm (the
    // shingled() lesson from TextQueries)
    val hashed = Multimodal.phash(Multimodal.mediaFromDocuments(s, dir))
      .toDF()
      .localCheckpoint(true)
    val bands = hashed.select(col("id"), col("lo"), col("hi"),
      explode(expr("""array(
          struct(0 AS band, lo & 65535L AS bv),
          struct(1 AS band, shiftright(lo, 16) AS bv),
          struct(2 AS band, hi & 65535L AS bv),
          struct(3 AS band, shiftright(hi, 16) AS bv))""")).as("b"))
      .select(col("id"), col("lo"), col("hi"), col("b.band"), col("b.bv"))
    bands.as("a").join(bands.as("b"),
        col("a.band") === col("b.band") && col("a.bv") === col("b.bv") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id1"), col("b.id").as("id2"),
        (expr("bit_count(a.lo ^ b.lo) + bit_count(a.hi ^ b.hi)"))
          .cast("int").as("hamming"))
      .distinct()
      .filter(col("hamming") <= 6)
      .orderBy("id1", "id2")
  }

  /** m09 — shot/scene-cut detection over the sampled frame table: the
    * per-media frame sequence (m04's stub-decoded samples) runs through
    * one lag window ordered by frame index, and a cut is a
    * frame-to-frame delta ≥ 64 (quarter of the byte range). Output per
    * media: frame count, cut count, first cut position — the shot table
    * a video-curation pipeline joins against to pick per-shot
    * keyframes. The real-decoder swap keeps this plan verbatim (frame
    * histogram deltas instead of sampled bytes); the window-over-
    * sequence shape, not the pixel math, is the operator. Scale: one
    * shuffle on media id; frames-per-row stays bounded by the sampling
    * rate, never the media duration. */
  def m09SceneCuts(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val frames = Multimodal.decodeFeatures(Multimodal.mediaFromDocuments(s, dir))
      .toDF()
      .select(col("id"), posexplode(col("frames")).as(Seq("frame_idx", "frame_val")))
    val w = Window.partitionBy("id").orderBy("frame_idx")
    frames
      .withColumn("delta", abs(col("frame_val") - lag("frame_val", 1).over(w)))
      .groupBy("id")
      .agg(count(lit(1)).as("n_frames"),
        sum(when(col("delta") >= 64, 1L).otherwise(0L)).as("n_cuts"),
        min(when(col("delta") >= 64, col("frame_idx"))).as("first_cut_idx"))
      .orderBy("id")
  }

  /** m10 — REAL PNG decode (JDK ImageIO, per-partition codec): a
    * deterministic pixel law renders per-doc images, ImageIO encodes
    * them to real PNG bytes, the codec decodes them back, and the
    * features are exact integer pixel sums. The oracle recomputes the
    * law in closed form — a wrong encoder OR decoder cannot match. */
  def m10PngDecode(s: SparkSession, dir: String): DataFrame =
    graft.functions.Multimodal.decodePngFeatures(
      graft.functions.Multimodal.pngMedia(s, dir)).toDF().orderBy("id")

  /** m11 — thumbnail from DECODED pixels: 4×4 nearest-neighbor
    * luminance grid with explicit integer source-index math (no AWT
    * scaler — those interpolate JVM-specifically), one row per cell. */
  def m11PngThumbnail(s: SparkSession, dir: String): DataFrame =
    graft.functions.Multimodal.pngThumbnails(
      graft.functions.Multimodal.pngMedia(s, dir)).toDF()
      .orderBy("id", "ty", "tx")

  /** m12 — REAL WAV decode (JDK javax.sound, per-partition codec):
    * deterministic 16-bit PCM clips through the actual AudioSystem
    * encoder and back, features as exact integer amplitude stats
    * against the closed-form sample law. */
  def m12WavDecode(s: SparkSession, dir: String): DataFrame =
    graft.functions.Multimodal.decodeWavFeatures(
      graft.functions.Multimodal.wavMedia(s, dir)).toDF().orderBy("id")

  /** m13 — metadata-ONLY media scan: IHDR fields (width, height, bit
    * depth, color type) parsed straight out of the PNG byte prefix with
    * codegen'd binary-slice expressions — `substring` on binary +
    * `hex`/`conv` — no ImageIO, no pixel decode. This is the 100 TB
    * media-profiling shape: a fleet-wide inventory reads ~33 bytes per
    * file (format-sniffed via the magic), not the payload; the full
    * decoder (m10) runs only on the rows a later stage selects. The
    * oracle recomputes the dims from the closed-form law the images are
    * rendered with, so a mis-parsed header cannot pass; bit depth 8 /
    * color type 2 pin ImageIO's truecolor encoding. */
  def m13PngMetadata(s: SparkSession, dir: String): DataFrame =
    graft.functions.Multimodal.pngMedia(s, dir).toDF()
      .select(col("id"),
        conv(hex(expr("substring(media, 17, 4)")), 16, 10).cast("int").as("width"),
        conv(hex(expr("substring(media, 21, 4)")), 16, 10).cast("int").as("height"),
        conv(hex(expr("substring(media, 25, 1)")), 16, 10).cast("int").as("bit_depth"),
        conv(hex(expr("substring(media, 26, 1)")), 16, 10).cast("int").as("color_type"),
        (hex(expr("substring(media, 2, 3)")) === "504E47").as("magic_ok"))
      .orderBy("id")

  /** m14 — energy-based audio segmentation (the VAD shape): REAL WAV
    * decode → 64-sample frame L1 energies (collapsed inside the decode
    * task — PCM never shuffles) → active frames (energy ≥ 65536, ~the
    * law's full-frame median, so both classes exist) → contiguous runs
    * via the gaps-and-islands window (frame_idx − row_number) → one
    * segment row per run. The oracle recomputes everything from the
    * closed-form sample law, so a wrong decoder OR a wrong island
    * boundary cannot pass. Scale: per-id windows over a frame table
    * ~1/64th the audio's sample count; one exchange for the window,
    * reused by the segment aggregate. */
  def m14AudioSegments(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val fr = graft.functions.Multimodal.wavFrameEnergies(
      graft.functions.Multimodal.wavMedia(s, dir), 64).toDF()
    val w = Window.partitionBy("id").orderBy("frame_idx")
    fr.filter(col("energy") >= 65536L)
      .withColumn("grp", col("frame_idx") - row_number().over(w))
      .groupBy("id", "grp")
      .agg(min("frame_idx").as("start_frame"),
        max("frame_idx").as("end_frame"),
        count(lit(1)).as("n_frames"),
        sum("energy").as("seg_energy"))
      .withColumn("seg_idx", row_number().over(
        Window.partitionBy("id").orderBy("start_frame")))
      .select("id", "seg_idx", "start_frame", "end_frame", "n_frames", "seg_energy")
      .orderBy("id", "seg_idx")
  }

  /** m15 — pHash near-dup CLUSTERS: m08's banded pair list promoted to
    * canonical dedup verdicts via the DataFrame-native star-contraction
    * CC ([[graft.graph.ComponentsDF]]) — the multimodal twin of
    * d15/e09's closure step, but on the engine that stays inside
    * Catalyst (no GraphX conversion; see g48/g49). A pair list alone
    * under-deduplicates: A~B and B~C with A≁C must still collapse to
    * one keeper, which only the transitive closure delivers. Output is
    * the verdict table a media-curation pipeline joins against:
    * (id, keeper_id = cluster min, is_dup, cluster_size).
    *
    * Scale: the closure runs on the near-dup pair graph (sparse —
    * banded candidates only), and the hot-key story is ComponentsDF's:
    * each star round is a window + distinct under AQE. */
  def m15PhashClusters(s: SparkSession, dir: String): DataFrame = {
    val assigned = graft.graph.ComponentsDF.run(
      m08PhashNeardup(s, dir)
        .select(col("id1").as("src"), col("id2").as("dst")))
      .select(col("vid").as("id"), col("component").as("keeper_id"))
    assigned
      .join(assigned.groupBy("keeper_id").agg(count(lit(1)).as("cluster_size")),
        "keeper_id")
      .select(col("id"), col("keeper_id"),
        (col("id") =!= col("keeper_id")).cast("int").as("is_dup"),
        col("cluster_size"))
      .orderBy("id")
  }

  /** m16 — ASPECT-RATIO bucket batching (the SDXL-style image-training
    * preprocessing step): decode width/height from the real PNG bytes
    * (the m13 header reads), assign each image to the ladder bucket
    * minimizing |ln(ar) − ln(bucket)| (log-space distance, round(…,6)
    * for cross-engine determinism, smaller bucket on ties), then pack
    * each bucket's images into batches of 8 in id order — a training
    * batch never mixes aspect ratios, so no crop/pad waste.
    *
    * The per-bucket position is NOT one global window per bucket (5
    * giant partitions at 100 TB): it is the d45 two-pass prefix sum —
    * range-partition on (bucket, id), per-(bucket, partition) counts,
    * a broadcast offset table windowed only over the tiny
    * buckets×partitions frame, then a per-partition row_number plus
    * offset. Output per batch: size (8 except each bucket's last),
    * id range, and the batch's true AR spread. */
  def m16ArBucketBatches(s: SparkSession, dir: String): DataFrame = {
    val parts = s.conf.get("spark.sql.shuffle.partitions", "32").toInt
    val dims = graft.functions.Multimodal.pngMedia(s, dir).toDF()
      .select(col("id"),
        conv(hex(expr("substring(media, 17, 4)")), 16, 10).cast("int").as("w"),
        conv(hex(expr("substring(media, 21, 4)")), 16, 10).cast("int").as("h"))
    arBatches(dims, parts, batchSize = 8)
  }

  /** The m16 kernel on a caller-supplied (id, w, h) frame — driven by
    * ArBucketSpec on hand-built dimensions with varying partition
    * counts. Ladder assignment by rounded log-space distance (smaller
    * bucket on ties), per-bucket positions via the d45 two-pass prefix
    * sum, fixed-size batches in id order. */
  private[queries] def arBatches(dims: DataFrame, parts: Int,
                                 batchSize: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ar = col("w").cast("double") / col("h")
    // The ladder is a 5-value LITERAL, so bucket assignment (min
    // rounded log-distance, smaller bucket on ties — the old window's
    // ORDER BY dist ASC, b ASC rn=1) is a per-row struct array_min in
    // the scan stage: the crossJoin×window form shuffled dims×5 rows
    // on id and sorted every group just to take one (guide §2.4).
    val ladder = Seq(0.5, 0.75, 1.0, 1.333333, 2.0)
    val assigned = dims
      .withColumn("b", array_min(array(ladder.map(b =>
          struct(round(abs(log(ar) - log(lit(b))), 6).as("dist"),
            lit(b).as("b"))): _*)).getField("b"))
      .select(col("id"), col("w"), col("h"), col("b"))
      // materialized BEFORE the range exchange: repartitionByRange's
      // boundary-sampling pass re-executes its child, and for m16 that
      // child is the full PNG media scan — the checkpoint makes the
      // sampler and the real exchange read the tiny (id,w,h,b) rows
      // instead of decoding the blobs twice (guide §1.2), and pins one
      // sampling input for the offs/probe arms downstream.
      .localCheckpoint(true)
    val ranged = assigned.repartitionByRange(parts, col("b"), col("id"))
      .withColumn("pid", spark_partition_id())
    val offs = ranged.groupBy("b", "pid").agg(count(lit(1)).as("cnt"))
      .withColumn("off", coalesce(sum("cnt").over(
        Window.partitionBy("b").orderBy("pid")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("b", "pid", "off")
    ranged.join(broadcast(offs), Seq("b", "pid"))
      .withColumn("pos", row_number().over(
        Window.partitionBy("b", "pid").orderBy("id")) - 1 + col("off"))
      .withColumn("batch_id", floor(col("pos") / batchSize).cast("long"))
      .groupBy(col("b").as("bucket"), col("batch_id"))
      .agg(count(lit(1)).as("n_imgs"),
        min("id").as("first_id"), max("id").as("last_id"),
        round(min(ar), 6).as("min_ar"), round(max(ar), 6).as("max_ar"))
      .orderBy("bucket", "batch_id")
  }

  val queries: Map[String, QueryFn] = Map(
    "m16_ar_bucket_batches" -> (m16ArBucketBatches _),
    "m15_phash_clusters"  -> (m15PhashClusters _),
    "m14_audio_segments"  -> (m14AudioSegments _),
    "m13_png_metadata"    -> (m13PngMetadata _),
    "m12_wav_decode"      -> (m12WavDecode _),
    "m11_png_thumbnail"   -> (m11PngThumbnail _),
    "m10_png_decode"      -> (m10PngDecode _),
    "m09_scene_cuts"      -> (m09SceneCuts _),
    "m08_phash_neardup"   -> (m08PhashNeardup _),
    "m07_binary_source"   -> (m07BinarySource _),
    "m06_blob_dedup"      -> (m06BlobDedup _),
    "m05_modality_join"   -> (m05ModalityJoin _),
    "m02_resize"          -> (m02Resize _),
    "m03_media_stats"     -> (m03MediaStats _),
    "m04_frame_explode"   -> (m04FrameExplode _),
    "m01_decode_features" -> (m01DecodeFeatures _))

  private val mixedFormat =
    "CASE WHEN doc_id % 3 = 0 THEN 'txt' WHEN doc_id % 3 = 1 THEN 'img' ELSE 'aud' END"

  val oracles: Map[String, String] = Map(
    // m16: width/height from the generator law, the same log-space
    // ladder assignment, one global per-bucket window (oracle scale).
    "m16_ar_bucket_batches" ->
      """WITH d AS (
        |  SELECT doc_id AS id, 8 + doc_id % 9 AS w,
        |    8 + (doc_id // 3) % 7 AS h FROM documents),
        |lad AS (SELECT unnest(CAST([0.5, 0.75, 1.0, 1.333333, 2.0]
        |  AS DOUBLE[])) AS b),
        |scored AS (
        |  SELECT id, w, h, b,
        |    round(abs(ln(w::DOUBLE / h) - ln(b)), 6) AS dist FROM d, lad),
        |assigned AS (
        |  SELECT id, w, h, b FROM (
        |    SELECT *, row_number() OVER (PARTITION BY id
        |      ORDER BY dist, b) AS rn FROM scored) WHERE rn = 1),
        |pos AS (
        |  SELECT *, row_number() OVER (PARTITION BY b ORDER BY id) - 1 AS p
        |  FROM assigned)
        |SELECT b AS bucket, CAST(p // 8 AS BIGINT) AS batch_id,
        |  CAST(count(*) AS BIGINT) AS n_imgs,
        |  min(id) AS first_id, max(id) AS last_id,
        |  round(min(w::DOUBLE / h), 6) AS min_ar,
        |  round(max(w::DOUBLE / h), 6) AS max_ar
        |FROM pos GROUP BY b, p // 8 ORDER BY bucket, batch_id""".stripMargin,
    // m15: m08's pair CTE + the g48-style recursive min-origin closure.
    "m15_phash_clusters" ->
      """WITH RECURSIVE b AS (
        |  SELECT doc_id AS id, length(text) - 3 AS n,
        |    list_transform(range(1, length(text) - 2),
        |      i -> (ascii(substr(text, CAST(i AS INT), 1)) * 131
        |          + ascii(substr(text, CAST(i AS INT) + 1, 1)) * 137
        |          + ascii(substr(text, CAST(i AS INT) + 2, 1)) * 139
        |          + ascii(substr(text, CAST(i AS INT) + 3, 1)) * 149) % 64)
        |      AS bins
        |  FROM documents WHERE length(text) >= 4),
        |h AS (
        |  SELECT id,
        |    CAST(list_sum(list_transform(range(0, 32),
        |      k -> CASE WHEN len(list_filter(bins, x -> x = k)) > n // 64
        |           THEN CAST(1 AS BIGINT) << CAST(k AS INT)
        |           ELSE CAST(0 AS BIGINT) END)) AS BIGINT) AS lo,
        |    CAST(list_sum(list_transform(range(32, 64),
        |      k -> CASE WHEN len(list_filter(bins, x -> x = k)) > n // 64
        |           THEN CAST(1 AS BIGINT) << CAST(k - 32 AS INT)
        |           ELSE CAST(0 AS BIGINT) END)) AS BIGINT) AS hi
        |  FROM b),
        |pairs AS (
        |  SELECT a.id AS id1, b2.id AS id2
        |  FROM h a JOIN h b2 ON a.id < b2.id
        |  WHERE ((a.lo & 65535) = (b2.lo & 65535)
        |      OR (a.lo >> 16) = (b2.lo >> 16)
        |      OR (a.hi & 65535) = (b2.hi & 65535)
        |      OR (a.hi >> 16) = (b2.hi >> 16))
        |    AND bit_count(xor(a.lo, b2.lo)) + bit_count(xor(a.hi, b2.hi)) <= 6),
        |adj AS (SELECT id1 AS u, id2 AS v FROM pairs
        |        UNION ALL SELECT id2, id1 FROM pairs),
        |verts AS (SELECT DISTINCT u AS v0 FROM adj),
        |reach AS (
        |  SELECT v0 AS v, v0 AS r FROM verts
        |  UNION
        |  SELECT a.v, reach.r FROM reach JOIN adj a ON a.u = reach.v),
        |comp AS (SELECT v AS id, min(r) AS keeper_id FROM reach GROUP BY v),
        |sz AS (SELECT keeper_id, CAST(count(*) AS BIGINT) AS cluster_size
        |  FROM comp GROUP BY keeper_id)
        |SELECT id, keeper_id, CAST(id <> keeper_id AS INT) AS is_dup,
        |  cluster_size
        |FROM comp JOIN sz USING (keeper_id) ORDER BY id""".stripMargin,
    // m14: samples from the closed-form law → 64-sample frame energies
    // → the same threshold and islands arithmetic.
    "m14_audio_segments" ->
      """WITH d AS (SELECT doc_id AS id, 256 + doc_id % 100 AS n FROM documents),
        |s AS (SELECT id, unnest(range(0, n)) AS i FROM d),
        |sam AS (SELECT id, i,
        |  abs(((31 * id + 7 * i) % 4096) - 2048) AS a FROM s),
        |fr AS (SELECT id, i // 64 AS frame_idx, sum(a) AS energy
        |       FROM sam GROUP BY 1, 2),
        |act AS (SELECT *, row_number() OVER (PARTITION BY id
        |          ORDER BY frame_idx) AS rn
        |        FROM fr WHERE energy >= 65536),
        |seg AS (SELECT id, frame_idx - rn AS grp,
        |          min(frame_idx) AS start_frame, max(frame_idx) AS end_frame,
        |          CAST(count(*) AS BIGINT) AS n_frames,
        |          CAST(sum(energy) AS BIGINT) AS seg_energy
        |        FROM act GROUP BY id, grp)
        |SELECT id, CAST(row_number() OVER (PARTITION BY id
        |    ORDER BY start_frame) AS INT) AS seg_idx,
        |  start_frame, end_frame, n_frames, seg_energy
        |FROM seg ORDER BY id, seg_idx""".stripMargin,
    // m13: the dims law in closed form; bit depth 8 / color type 2 /
    // the PNG magic are format constants a correct header parse yields.
    "m13_png_metadata" ->
      """SELECT doc_id AS id, CAST(8 + doc_id % 9 AS INT) AS width,
        |  CAST(8 + (doc_id // 3) % 7 AS INT) AS height,
        |  CAST(8 AS INT) AS bit_depth, CAST(2 AS INT) AS color_type,
        |  TRUE AS magic_ok
        |FROM documents ORDER BY id""".stripMargin,
    // m10/m11: the deterministic pixel law in closed form — the gate
    // passes only if ImageIO's encode→decode round trip is lossless
    // and the feature math matches bit-for-bit.
    "m10_png_decode" ->
      """WITH d AS (
        |  SELECT doc_id AS id, CAST(8 + doc_id % 9 AS INT) AS width,
        |    CAST(8 + (doc_id // 3) % 7 AS INT) AS height FROM documents),
        |cx AS (SELECT id, width, height, unnest(range(0, width)) AS x FROM d),
        |cxy AS (SELECT id, width, height, x, unnest(range(0, height)) AS y FROM cx),
        |px AS (SELECT id, width, height,
        |  (31 * id + 7 * x + 13 * y) % 256 AS r,
        |  (17 * id + 11 * x + 3 * y) % 256 AS g,
        |  (23 * id + 5 * x + 19 * y) % 256 AS b FROM cxy)
        |SELECT id, any_value(width) AS width, any_value(height) AS height,
        |  CAST(sum(r) AS BIGINT) AS sum_r,
        |  CAST(sum(g) AS BIGINT) AS sum_g,
        |  CAST(sum(b) AS BIGINT) AS sum_b,
        |  CAST((31 * id % 256) * 65536 + (17 * id % 256) * 256
        |    + (23 * id % 256) AS INT) AS px00
        |FROM px GROUP BY id ORDER BY id""".stripMargin,
    "m12_wav_decode" ->
      """WITH d AS (
        |  SELECT doc_id AS id, 256 + doc_id % 100 AS n FROM documents),
        |t AS (SELECT id, n, unnest(range(0, n)) AS i FROM d),
        |s AS (SELECT id, n, (31 * id + 7 * i) % 4096 - 2048 AS v FROM t)
        |SELECT id, 16000 AS sample_rate, 1 AS channels, 16 AS bits,
        |  any_value(n) AS n_samples,
        |  CAST(sum(abs(v)) AS BIGINT) AS sum_abs,
        |  CAST(max(abs(v)) AS INT) AS max_amp
        |FROM s GROUP BY id ORDER BY id""".stripMargin,
    "m11_png_thumbnail" ->
      """WITH d AS (
        |  SELECT doc_id AS id, 8 + doc_id % 9 AS w,
        |    8 + (doc_id // 3) % 7 AS h FROM documents),
        |t1 AS (SELECT id, w, h, CAST(unnest(range(0, 4)) AS INT) AS ty FROM d),
        |t2 AS (SELECT id, w, h, ty, CAST(unnest(range(0, 4)) AS INT) AS tx FROM t1),
        |s AS (SELECT id, ty, tx, (tx * w) // 4 AS sx, (ty * h) // 4 AS sy FROM t2)
        |SELECT id, ty, tx,
        |  CAST((((31 * id + 7 * sx + 13 * sy) % 256)
        |      + ((17 * id + 11 * sx + 3 * sy) % 256)
        |      + ((23 * id + 5 * sx + 19 * sy) % 256)) // 3 AS INT) AS lum
        |FROM s ORDER BY id, ty, tx""".stripMargin,
    // m09: m04's frame construction + one lag window; the ELSE 0 arm
    // matches Spark's otherwise() on the first frame's null delta.
    "m09_scene_cuts" ->
      """WITH fr AS (
        |  SELECT doc_id AS id, CAST(t.f.frame_idx AS INT) AS frame_idx,
        |    CAST(t.f.frame_val AS INT) AS frame_val FROM (
        |    SELECT doc_id,
        |      unnest([{'frame_idx': k,
        |               'frame_val': CAST(ascii(substr(text,
        |                 least(length(text) - 1, k * length(text) // 4) + 1, 1)) AS INT)}
        |              for k in range(0, 4)]) AS f
        |    FROM documents) t),
        |d AS (
        |  SELECT id, frame_idx, abs(frame_val - lag(frame_val) OVER (
        |    PARTITION BY id ORDER BY frame_idx)) AS delta
        |  FROM fr)
        |SELECT id, CAST(count(*) AS BIGINT) AS n_frames,
        |  CAST(sum(CASE WHEN delta >= 64 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_cuts,
        |  CAST(min(CASE WHEN delta >= 64 THEN frame_idx END) AS INT)
        |    AS first_cut_idx
        |FROM d GROUP BY id ORDER BY id""".stripMargin,
    // m08: the oracle recomputes the TLSH-style signature — byte-4-gram
    // bucket counts over the same utf-8 bytes, mean-threshold bits as
    // two 32-bit halves — and checks ALL pairs (O(n²) is fine for an
    // oracle) under the same ≥1-band-agrees candidate rule + Hamming
    // ≤ 6 verify. PRECONDITION shared with the m01-m04 oracles:
    // ascii()/substr()/length() are codepoint-based in DuckDB while the
    // Spark kernel reads utf-8 BYTES, so byte≡codepoint only holds on
    // an ASCII corpus — PhashSpec asserts the fixture stays ASCII.
    "m08_phash_neardup" ->
      """WITH b AS (
        |  SELECT doc_id AS id, length(text) - 3 AS n,
        |    list_transform(range(1, length(text) - 2),
        |      i -> (ascii(substr(text, CAST(i AS INT), 1)) * 131
        |          + ascii(substr(text, CAST(i AS INT) + 1, 1)) * 137
        |          + ascii(substr(text, CAST(i AS INT) + 2, 1)) * 139
        |          + ascii(substr(text, CAST(i AS INT) + 3, 1)) * 149) % 64)
        |      AS bins
        |  FROM documents WHERE length(text) >= 4),
        |h AS (
        |  SELECT id,
        |    CAST(list_sum(list_transform(range(0, 32),
        |      k -> CASE WHEN len(list_filter(bins, x -> x = k)) > n // 64
        |           THEN CAST(1 AS BIGINT) << CAST(k AS INT)
        |           ELSE CAST(0 AS BIGINT) END)) AS BIGINT) AS lo,
        |    CAST(list_sum(list_transform(range(32, 64),
        |      k -> CASE WHEN len(list_filter(bins, x -> x = k)) > n // 64
        |           THEN CAST(1 AS BIGINT) << CAST(k - 32 AS INT)
        |           ELSE CAST(0 AS BIGINT) END)) AS BIGINT) AS hi
        |  FROM b)
        |SELECT a.id AS id1, b.id AS id2,
        |  CAST(bit_count(xor(a.lo, b.lo)) + bit_count(xor(a.hi, b.hi)) AS INT)
        |    AS hamming
        |FROM h a JOIN h b ON a.id < b.id
        |WHERE ((a.lo & 65535) = (b.lo & 65535)
        |    OR (a.lo >> 16) = (b.lo >> 16)
        |    OR (a.hi & 65535) = (b.hi & 65535)
        |    OR (a.hi >> 16) = (b.hi >> 16))
        |  AND bit_count(xor(a.lo, b.lo)) + bit_count(xor(a.hi, b.hi)) <= 6
        |ORDER BY id1, id2""".stripMargin,
    "m07_binary_source" ->
      """SELECT doc_id, CAST(length(text) AS BIGINT) AS n_bytes,
        | md5(text) AS h
        |FROM documents ORDER BY doc_id""".stripMargin,
    "m06_blob_dedup" ->
      s"""WITH m AS (
        |  SELECT doc_id AS id, $mixedFormat AS format,
        |    CAST(length(text) AS INT) AS n_bytes, md5(text) AS h
        |  FROM documents),
        |r AS (SELECT *, row_number() OVER (PARTITION BY h ORDER BY id) AS rn
        |      FROM m)
        |SELECT format, CAST(count(*) AS BIGINT) AS n_blobs,
        |  CAST(sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_unique,
        |  CAST(sum(CASE WHEN rn > 1 THEN n_bytes ELSE 0 END) AS BIGINT)
        |    AS freed_bytes
        |FROM r GROUP BY format ORDER BY format""".stripMargin,
    "m05_modality_join" ->
      s"""WITH ${TextQueries.qualityCte}
        |SELECT e.label, q.quality_ok, CAST(count(*) AS BIGINT) AS n_docs,
        |  round(CAST(sum(CAST(q.alpha_ratio AS DECIMAL(14,4))) AS DOUBLE)
        |    / count(*), 4) AS avg_alpha
        |FROM q JOIN embeddings e ON q.doc_id = e.vec_id
        |GROUP BY e.label, q.quality_ok ORDER BY label, quality_ok""".stripMargin,
    "m01_decode_features" ->
      """SELECT doc_id AS id, 'txt' AS format,
        | CAST(length(text) AS INT) AS n_bytes,
        | CAST(ascii(substr(text, 1, 1)) AS INT) AS first_byte,
        | CAST(list_sum(list_transform(range(1, least(16, length(text)) + 1),
        |   i -> ascii(substr(text, i, 1)))) AS BIGINT) AS checksum16,
        | array_to_string(
        |   [CAST(ascii(substr(text, least(length(text) - 1, k * length(text) // 4) + 1, 1)) AS INT)
        |    for k in range(0, 4)], ',') AS frames
        |FROM documents ORDER BY id""".stripMargin,
    "m02_resize" ->
      s"""SELECT doc_id AS id, $mixedFormat AS format,
        | CAST(length(text) AS INT) AS n_bytes,
        | array_to_string(
        |   [CAST((ascii(substr(text, least(length(text) - 1, k * length(text) // 8) + 1, 1))
        |       + ascii(substr(text,
        |           least(length(text) - 1,
        |                 least(length(text) - 1, k * length(text) // 8) + 1) + 1, 1))) // 2 AS INT)
        |    for k in range(0, 8)], ',') AS resized
        |FROM documents ORDER BY id""".stripMargin,
    "m04_frame_explode" ->
      """SELECT doc_id AS id, CAST(t.f.frame_idx AS INT) AS frame_idx,
        |  CAST(t.f.frame_val AS INT) AS frame_val FROM (
        |  SELECT doc_id,
        |    unnest([{'frame_idx': k,
        |             'frame_val': CAST(ascii(substr(text,
        |               least(length(text) - 1, k * length(text) // 4) + 1, 1)) AS INT)}
        |            for k in range(0, 4)]) AS f
        |  FROM documents) t
        |ORDER BY id, frame_idx""".stripMargin,
    "m03_media_stats" ->
      s"""SELECT $mixedFormat AS format,
        | CAST(count(*) AS BIGINT) AS n_media,
        | round(avg(length(text)), 2) AS avg_bytes,
        | CAST(sum(list_sum(list_transform(range(1, least(16, length(text)) + 1),
        |   i -> ascii(substr(text, i, 1))))) AS BIGINT) AS sum_checksum
        |FROM documents GROUP BY 1 ORDER BY format""".stripMargin)
}
