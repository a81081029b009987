package graft.functions

import graft.SparkSpec
import graft.functions.Multimodal._

/** The real WAV leg of the multimodal path: AudioSystem encode/decode
  * round trips under the deterministic PCM sample law. */
class WavCodecSpec extends SparkSpec {
  import spark.implicits._

  test("encode → decode round trips samples exactly") {
    val codec = new WavCodec
    Seq(0L, 5L, 321L).foreach { id =>
      val (fmt, samples) = codec.decode(wavBytes(id))
      assert(fmt.getSampleRate === 16000f && fmt.getChannels === 1)
      assert(samples.length === wavSamples(id))
      samples.zipWithIndex.foreach { case (s, i) =>
        assert(s.toInt === sampleOf(id, i), s"sample $i of clip $id")
      }
    }
  }

  test("non-PCM-16LE input is refused with the format in the message") {
    val codec = new WavCodec
    intercept[Exception](codec.decode("RIFFgarbage".getBytes("UTF-8")))
  }

  test("distributed decode features match the law") {
    val media = (0L until 30L).map(id => MediaRecord(id, "wav", wavBytes(id)))
      .toDS().repartition(4)
    val feats = decodeWavFeatures(media).collect().sortBy(_.id)
    assert(feats.length === 30)
    feats.foreach { f =>
      val n = wavSamples(f.id)
      assert(f.n_samples === n)
      val abs = (0L until n).map(i => math.abs(sampleOf(f.id, i)))
      assert(f.sum_abs === abs.sum)
      assert(f.max_amp === abs.max)
      assert((f.sample_rate, f.channels, f.bits) === ((16000, 1, 16)))
    }
  }
}
