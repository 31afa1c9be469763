package graft.ext

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import org.apache.spark.sql.functions._

import graft.SparkTestBase

class AudioFramesSpec extends AnyFunSuite with Matchers with SparkTestBase {

  test("steady sine: every 50ms frame shows the closed-form rms/peak/zcr") {
    val wav = MediaCodec.Fixtures.sineWav(freq = 440, amp = 0.5, seconds = 0.4)
    val frames = MediaCodec.wavFrameFeatures(wav, frameMs = 50)
    frames.size shouldBe 8
    frames.zipWithIndex.foreach { case ((idx, startMs, rms, peak, zcr), i) =>
      idx shouldBe i
      startMs shouldBe i * 50L
      rms shouldBe (0.5 / math.sqrt(2)) +- 0.01
      peak shouldBe 0.5 +- 0.01
      zcr shouldBe (2.0 * 440 / 16000) +- 0.005
    }
  }

  test("burst fixture: voiced and silent frames alternate, silence is exactly zero") {
    // 100ms bursts analyzed at 50ms → frames 0,1 voiced, 2,3 silent, …
    val wav = MediaCodec.Fixtures.burstWav(freq = 400, amp = 0.4, seconds = 0.4, burstMs = 100)
    val frames = MediaCodec.wavFrameFeatures(wav, frameMs = 50)
    frames.size shouldBe 8
    frames.foreach { case (idx, _, rms, peak, zcr) =>
      if ((idx / 2) % 2 == 0) {
        rms shouldBe (0.4 / math.sqrt(2)) +- 0.01
        peak shouldBe 0.4 +- 0.01
        zcr shouldBe (2.0 * 400 / 16000) +- 0.005
      } else {
        rms shouldBe 0.0
        peak shouldBe 0.0
        zcr shouldBe 0.0
      }
    }
  }

  test("trailing partial frame is reported over its actual samples") {
    val wav = MediaCodec.Fixtures.sineWav(freq = 440, amp = 0.5, seconds = 0.425)
    val frames = MediaCodec.wavFrameFeatures(wav, frameMs = 50)
    frames.size shouldBe 9 // 8 full + one 25ms tail
    frames.last._2 shouldBe 400L
    frames.last._3 shouldBe (0.5 / math.sqrt(2)) +- 0.02
  }

  test("non-WAV payloads and nonpositive frame lengths yield no frames") {
    MediaCodec.wavFrameFeatures("not audio at all".getBytes, 50) shouldBe empty
    val wav = MediaCodec.Fixtures.sineWav(440, 0.5)
    MediaCodec.wavFrameFeatures(wav, 0) shouldBe empty
    MediaCodec.wavFrameFeatures(wav, -10) shouldBe empty
  }

  test("whole-payload stats equal the sample-weighted combination of frame stats") {
    val wav = MediaCodec.Fixtures.burstWav(400, 0.4, seconds = 0.4, burstMs = 100)
    val (rms, peak, _, _) = MediaCodec.wavPcmStats(wav).get
    val frames = MediaCodec.wavFrameFeatures(wav, frameMs = 50)
    val n = 16000 * 2 / 5 / 2 // samples: 0.4s at 16kHz
    val per = n / frames.size
    val combined = math.sqrt(frames.map(f => f._3 * f._3 * per).sum / n)
    combined shouldBe rms +- 1e-9
    frames.map(_._4).max shouldBe peak +- 1e-12
  }

  test("audioFrameFeatures: frames only for decodable audio, typed end-to-end") {
    import spark.implicits._
    val media = Seq(
      Multimodal.MediaRow(1L, "audio", MediaCodec.Fixtures.sineWav(440, 0.5, 0.2)),
      Multimodal.MediaRow(2L, "blob", "just bytes".getBytes)).toDS()
    val out = Multimodal.audioFrameFeatures(media, frameMs = 50).toDF()
    out.select("media_id").distinct().collect().map(_.getLong(0)).toSeq shouldBe Seq(1L)
    out.count() shouldBe 4
    out.agg(min(col("rms"))).head().getDouble(0) should be > 0.3
  }

  test("spectral features: pure tone lands exactly on its bin, near-total share") {
    // 500 Hz at 16 kHz, 64 ms frames -> 1024-point FFT, bin 15.625 Hz;
    // 500 = 32 bins exactly (integer cycles per window -> no leakage)
    val wav = MediaCodec.Fixtures.sineWav(freq = 500, amp = 0.5, seconds = 0.256)
    val frames = MediaCodec.wavSpectralFeatures(wav, frameMs = 64)
    frames should not be empty
    frames.foreach { case (_, peakHz, centroidHz, rel) =>
      peakHz shouldBe 500.0 +- 1e-9
      centroidHz shouldBe 500.0 +- 1.0 // FP noise spreads ~0 magnitude
      rel should be > 0.99
    }
  }

  test("spectral features: two tones — peak picks the stronger, centroid sits between") {
    // synthesize 400 Hz (strong) + 2000 Hz (weak) by summing fixtures'
    // PCM is not possible via the fixture API; instead verify ordering
    // across two separate tones: higher tone -> higher peak and centroid
    val lo = MediaCodec.wavSpectralFeatures(
      MediaCodec.Fixtures.sineWav(375, 0.5, 0.128), 64)
    val hi = MediaCodec.wavSpectralFeatures(
      MediaCodec.Fixtures.sineWav(2000, 0.5, 0.128), 64)
    lo.head._2 shouldBe 375.0 +- 1e-9
    hi.head._2 shouldBe 2000.0 +- 1e-9
    hi.head._3 should be > lo.head._3
  }

  test("spectral features: off-bin tone still peaks at the nearest bin") {
    // 440 Hz is NOT a multiple of 15.625; leakage spreads energy but
    // the peak bin must be the nearest (28×15.625 = 437.5)
    val frames = MediaCodec.wavSpectralFeatures(
      MediaCodec.Fixtures.sineWav(440, 0.5, 0.128), 64)
    frames.head._2 shouldBe 437.5 +- 1e-9
    frames.head._4 should be < 0.9 // leakage: share visibly below pure-bin
  }

  test("spectral features: non-WAV and tiny frames yield no rows") {
    MediaCodec.wavSpectralFeatures("not a wav".getBytes, 64) shouldBe empty
    // 1 ms at 16 kHz = 16 samples -> exactly the floor, produces rows;
    // sub-16-sample frames are skipped
    val tiny = MediaCodec.wavSpectralFeatures(
      MediaCodec.Fixtures.sineWav(500, 0.5, 0.01), 0)
    tiny shouldBe empty
  }
}
