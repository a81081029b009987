package graft.functions

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (BASELINE north star): image/audio/video
  * as opaque `binary` columns with typed metadata, decoded/featurized
  * per partition.
  *
  * The IMAGE leg decodes for real: `javax.imageio` ships in the JDK
  * (headless-safe), so [[PngCodec]] reads actual PNG bytes into actual
  * pixels (m10/m11 round-trip a deterministic pixel law through
  * encode → decode → features). Audio/video codecs are absent from
  * this container, so [[StubDecoder]] computes deterministic byte
  * statistics where a real deployment would call those codecs.
  * Everything around both is the real Spark shape: binary schema,
  * typed Dataset encoders, partition-batched `mapPartitions` (one
  * decoder instance per partition, the same batching contract a
  * Pandas-UDF/Arrow path gives Python), and stride-based frame
  * sampling.
  *
  * Scale notes: decode is embarrassingly parallel and pipelined per
  * partition — no shuffle; the binary payload never moves through a
  * shuffle either (features are projected before any wide op). Partition
  * sizing: media rows are large, so at 100 TB the input would set
  * `spark.sql.files.maxPartitionBytes` low enough that a partition of
  * blobs fits executor memory.
  */
object Multimodal {

  case class MediaRecord(id: Long, format: String, media: Array[Byte])
  case class MediaFeatures(id: Long, format: String, n_bytes: Int,
                           first_byte: Int, checksum16: Long,
                           frames: Seq[Int])
  case class MediaResized(id: Long, format: String, n_bytes: Int,
                          resized: Seq[Int])

  /** The stub codec: real impl would decode pixels/samples; this derives
    * deterministic features from raw bytes so the full pipeline is
    * testable and oracle-checkable. One instance per partition —
    * mirrors per-batch model/codec initialization cost amortization.
    */
  class StubDecoder {
    def features(r: MediaRecord, nFrames: Int): MediaFeatures = {
      val b = r.media
      val n = b.length
      val checksum = b.take(16).foldLeft(0L)((acc, x) => acc + (x & 0xff))
      // "frame sampling": nFrames evenly-strided byte positions
      // long stride math: k * n overflows Int for blobs over ~0.5 GB
      val frames = (0 until nFrames).map { k =>
        if (n == 0) 0 else b(math.min(n - 1L, k.toLong * n / nFrames).toInt) & 0xff
      }
      MediaFeatures(r.id, r.format, n, if (n == 0) 0 else b(0) & 0xff, checksum, frames)
    }

    /** "Resize": nearest-neighbor downsample to `outLen` cells, each the
      * mean of a 2-byte window at its strided position — the byte-level
      * stand-in for image resize / audio resample. */
    def resize(r: MediaRecord, outLen: Int): MediaResized = {
      val b = r.media
      val n = b.length
      val out = (0 until outLen).map { j =>
        if (n == 0) 0
        else {
          val p = math.min(n - 1L, j.toLong * n / outLen).toInt
          val q = math.min(n - 1, p + 1)
          ((b(p) & 0xff) + (b(q) & 0xff)) / 2
        }
      }
      MediaResized(r.id, r.format, n, out)
    }
  }

  /** Decode + featurize: partition-batched, decoder constructed once per
    * partition (NOT per row — that is the whole point of mapPartitions
    * here). */
  def decodeFeatures(media: Dataset[MediaRecord], nFrames: Int = 4): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      val decoder = new StubDecoder // per-partition init (codec handle)
      it.map(decoder.features(_, nFrames))
    }
  }

  /** Resize every media row: same partition-batched contract as
    * [[decodeFeatures]]. */
  def resize(media: Dataset[MediaRecord], outLen: Int = 8): Dataset[MediaResized] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      val decoder = new StubDecoder
      it.map(decoder.resize(_, outLen))
    }
  }

  case class MediaPhash(id: Long, lo: Long, hi: Long)

  /** TLSH-family fuzzy hash over the raw blob: byte-4-gram bucket
    * counts (64 buckets) thresholded against the mean bucket fill, one
    * bit per bucket, emitted as two 32-bit halves (so downstream SQL and
    * the DuckDB oracle stay in non-overflowing BIGINT math). Content
    * n-grams make the signature discriminative across unrelated blobs
    * while insertion/deletion edits only perturb the buckets their
    * n-grams touch — the shift-invariance positional hashes lack, and
    * the public design (ssdeep/TLSH) used for binary/media near-dup in
    * practice. Runs inside the per-partition decoder like every stub
    * kernel; a real deployment would swap in DCT-pHash pixels with the
    * identical downstream plan. */
  def phashOf(r: MediaRecord): MediaPhash = {
    val b = r.media
    val n = b.length - 3
    val counts = new Array[Int](64)
    var i = 0
    while (i < n) {
      val h = ((b(i) & 0xff) * 131 + (b(i + 1) & 0xff) * 137 +
        (b(i + 2) & 0xff) * 139 + (b(i + 3) & 0xff) * 149) % 64
      counts(h) += 1
      i += 1
    }
    val m = if (n > 0) n / 64 else 0
    var lo = 0L
    var hi = 0L
    var k = 0
    while (k < 32) { if (counts(k) > m) lo |= 1L << k; k += 1 }
    while (k < 64) { if (counts(k) > m) hi |= 1L << (k - 32); k += 1 }
    MediaPhash(r.id, lo, hi)
  }

  /** Per-partition fuzzy-hash pass (same mapPartitions contract as
    * [[decodeFeatures]]); blobs shorter than one 4-gram carry no
    * signal and are dropped, mirrored by the oracle's length guard. */
  def phash(media: Dataset[MediaRecord]): Dataset[MediaPhash] = {
    import media.sparkSession.implicits._
    media.filter(r => r.media.length >= 4).mapPartitions(_.map(phashOf))
  }

  // ------------------------------------------------------- real PNG path

  case class PngFeatures(id: Long, width: Int, height: Int,
                         sum_r: Long, sum_g: Long, sum_b: Long, px00: Int)
  case class PngThumb(id: Long, ty: Int, tx: Int, lum: Int)

  /** REAL image decode — `javax.imageio` is part of the JDK
    * (java.desktop, headless-safe), so the PNG leg of the multimodal
    * path needs no external codec after all: actual PNG bytes in,
    * actual pixels out. One codec instance per partition, the same
    * `mapPartitions` contract as the byte-statistic kernels; the
    * deterministic pixel law below makes the round trip
    * oracle-checkable (encode → decode → features must equal the
    * closed-form the SQL computes — a wrong decoder cannot pass). */
  class PngCodec {
    graft.functions.Multimodal.ensureHeadless()
    def decode(bytes: Array[Byte]): java.awt.image.BufferedImage = {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      require(img != null, "not a decodable image")
      img
    }
  }

  private[graft] def ensureHeadless(): Unit =
    if (System.getProperty("java.awt.headless") == null)
      System.setProperty("java.awt.headless", "true")

  /** Deterministic RGB law: every pixel of image `id` is a closed-form
    * function of (id, x, y) — the spec/oracle recompute it without
    * decoding. PNG is lossless, so decode returns these exactly. */
  def pixelArgb(id: Long, x: Int, y: Int): Int = {
    val r = ((31 * id + 7 * x + 13 * y) % 256).toInt
    val g = ((17 * id + 11 * x + 3 * y) % 256).toInt
    val b = ((23 * id + 5 * x + 19 * y) % 256).toInt
    0xFF000000 | (r << 16) | (g << 8) | b
  }

  def pngDims(id: Long): (Int, Int) =
    ((8 + id % 9).toInt, (8 + (id / 3) % 7).toInt)

  /** Real PNG bytes for image `id` under the pixel law (ImageIO encode). */
  def pngBytes(id: Long): Array[Byte] = {
    ensureHeadless()
    val (w, h) = pngDims(id)
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { img.setRGB(x, y, pixelArgb(id, x, y)); x += 1 }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Documents' ids as a REAL PNG media table: per-row encode in the
    * same task that will decode — blobs never shuffle. */
  def pngMedia(spark: SparkSession, dir: String): Dataset[MediaRecord] = {
    import spark.implicits._
    graft.core.Tables.documents(spark, dir)
      .select(col("doc_id")).as[Long]
      .map(id => MediaRecord(id, "png", pngBytes(id)))
  }

  /** Decode features: dimensions, exact per-channel integer sums, and
    * the (0,0) pixel — integer math end to end, so the oracle's
    * closed-form recomputation hash-matches bit-for-bit. */
  def decodePngFeatures(media: Dataset[MediaRecord]): Dataset[PngFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      val codec = new PngCodec // per-partition init
      it.map { r =>
        val img = codec.decode(r.media)
        val (w, h) = (img.getWidth, img.getHeight)
        var (sr, sg, sb) = (0L, 0L, 0L)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val p = img.getRGB(x, y)
            sr += (p >> 16) & 0xFF; sg += (p >> 8) & 0xFF; sb += p & 0xFF
            x += 1
          }
          y += 1
        }
        PngFeatures(r.id, w, h, sr, sg, sb, img.getRGB(0, 0) & 0xFFFFFF)
      }
    }
  }

  /** 4×4 nearest-neighbor luminance thumbnail from DECODED pixels —
    * resize as explicit integer source-index math (deterministic on
    * every JVM, unlike AWT's interpolating scalers), one row per
    * thumbnail cell. */
  def pngThumbnails(media: Dataset[MediaRecord], side: Int = 4): Dataset[PngThumb] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      val codec = new PngCodec
      it.flatMap { r =>
        val img = codec.decode(r.media)
        val (w, h) = (img.getWidth, img.getHeight)
        for (ty <- 0 until side; tx <- 0 until side) yield {
          val sx = tx * w / side
          val sy = ty * h / side
          val p = img.getRGB(sx, sy)
          val lum = (((p >> 16) & 0xFF) + ((p >> 8) & 0xFF) + (p & 0xFF)) / 3
          PngThumb(r.id, ty, tx, lum)
        }
      }
    }
  }

  // ------------------------------------------------------- real WAV path

  case class WavFeatures(id: Long, sample_rate: Int, channels: Int,
                         bits: Int, n_samples: Long, sum_abs: Long,
                         max_amp: Int)

  /** REAL audio decode — `javax.sound.sampled` also ships in the JDK,
    * and WAV/PCM is lossless, so the audio leg gets the same
    * law-render → encode → decode → closed-form-oracle treatment as
    * PNG (m10). Lossy codecs (mp3 etc.) stay behind [[StubDecoder]]:
    * their decoded samples are codec-version-dependent and therefore
    * not oracle-stable, not merely unavailable. */
  class WavCodec {
    def decode(bytes: Array[Byte]): (javax.sound.sampled.AudioFormat, Array[Short]) = {
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      val fmt = in.getFormat
      require(fmt.getSampleSizeInBits == 16 && !fmt.isBigEndian,
        s"WavCodec reads 16-bit little-endian PCM, got $fmt")
      val raw = in.readAllBytes()
      in.close()
      val out = new Array[Short](raw.length / 2)
      var i = 0
      while (i < out.length) {
        out(i) = ((raw(2 * i) & 0xFF) | (raw(2 * i + 1) << 8)).toShort
        i += 1
      }
      (fmt, out)
    }
  }

  /** Deterministic sample law: sample i of clip `id` — the closed form
    * the oracle recomputes. */
  def sampleOf(id: Long, i: Long): Int =
    (((31 * id + 7 * i) % 4096) - 2048).toInt

  def wavSamples(id: Long): Long = 256 + id % 100

  /** Real WAV bytes for clip `id`: 16 kHz mono 16-bit PCM through the
    * actual AudioSystem encoder. */
  def wavBytes(id: Long): Array[Byte] = {
    val n = wavSamples(id)
    val pcm = new Array[Byte]((n * 2).toInt)
    var i = 0L
    while (i < n) {
      val s = sampleOf(id, i)
      pcm((2 * i).toInt) = (s & 0xFF).toByte
      pcm((2 * i + 1).toInt) = ((s >> 8) & 0xFF).toByte
      i += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(16000f, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, n)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** Documents' ids as a REAL WAV media table (encode in-task, blobs
    * never shuffle — the pngMedia contract). */
  def wavMedia(spark: SparkSession, dir: String): Dataset[MediaRecord] = {
    import spark.implicits._
    graft.core.Tables.documents(spark, dir)
      .select(col("doc_id")).as[Long]
      .map(id => MediaRecord(id, "wav", wavBytes(id)))
  }

  /** Decode features: format fields plus exact integer amplitude
    * stats, so the closed-form oracle hash-matches. */
  def decodeWavFeatures(media: Dataset[MediaRecord]): Dataset[WavFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      val codec = new WavCodec // per-partition init
      it.map { r =>
        val (fmt, samples) = codec.decode(r.media)
        var sumAbs = 0L
        var maxAmp = 0
        samples.foreach { s =>
          val a = math.abs(s.toInt)
          sumAbs += a
          if (a > maxAmp) maxAmp = a
        }
        WavFeatures(r.id, fmt.getSampleRate.toInt, fmt.getChannels,
          fmt.getSampleSizeInBits, samples.length.toLong, sumAbs, maxAmp)
      }
    }
  }

  case class WavFrame(id: Long, frame_idx: Long, n_samples: Int, energy: Long)

  /** Per-frame L1 energies from REAL WAV decode: the samples collapse
    * to (id, frame_idx, energy) inside the decoding task — the frame
    * table is what shuffles, never the PCM. The trailing partial frame
    * is kept with its true sample count. */
  def wavFrameEnergies(media: Dataset[MediaRecord],
                       frameLen: Int): Dataset[WavFrame] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      val codec = new WavCodec // per-partition init
      it.flatMap { r =>
        val (_, samples) = codec.decode(r.media)
        samples.grouped(frameLen).zipWithIndex.map { case (fr, fi) =>
          var e = 0L
          fr.foreach(s => e += math.abs(s.toInt))
          WavFrame(r.id, fi.toLong, fr.length, e)
        }
      }
    }
  }

  /** Documents recast as a media table: utf-8 bytes as the opaque blob
    * (the corpus has no real image column; the plumbing is identical). */
  def mediaFromDocuments(spark: SparkSession, dir: String): Dataset[MediaRecord] = {
    import spark.implicits._
    graft.core.Tables.documents(spark, dir)
      .select(col("doc_id").as("id"), lit("txt").as("format"),
        col("text").cast("binary").as("media"))
      .as[MediaRecord]
  }

  /** The mixed-modality variant: pseudo-formats assigned by id so the
    * per-format branch/agg paths run against a heterogeneous table (the
    * real shape: one blob column, a format tag, format-specific decode).
    */
  def mediaMixed(spark: SparkSession, dir: String): Dataset[MediaRecord] = {
    import spark.implicits._
    graft.core.Tables.documents(spark, dir)
      .select(col("doc_id").as("id"),
        when(col("doc_id") % 3 === 0, "txt")
          .when(col("doc_id") % 3 === 1, "img")
          .otherwise("aud").as("format"),
        col("text").cast("binary").as("media"))
      .as[MediaRecord]
  }
}
