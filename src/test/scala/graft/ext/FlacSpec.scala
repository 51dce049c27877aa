package graft.ext

import org.scalatest.funsuite.AnyFunSuite

/** Bit-exact round-trip coverage for the subset FLAC codec: every decoder
  * path (CONSTANT / VERBATIM / FIXED orders, Rice + escape residuals,
  * partition orders, stereo decorrelation modes, wasted-bit-free frames,
  * partial final frame, negative samples, several bit depths) and the
  * CRC/structural rejection paths.
  */
class FlacSpec extends AnyFunSuite {

  private def rng(seed: Long) = new scala.util.Random(seed)

  private def roundTrip(
      samples: Array[Int], rate: Int, channels: Int, bps: Int = 16,
      blockSize: Int = 256, stereoMode: Int = 0, verbatimEvery: Int = 0,
      partitionOrder: Int = 0, escapeResiduals: Boolean = false): Unit = {
    val bytes = Flac.encodeFlac(samples, rate, channels, bps, blockSize,
      stereoMode, verbatimEvery, partitionOrder, escapeResiduals)
    val dec = Flac.decodeFlac(bytes)
    assert(dec.isDefined, "decode failed")
    val a = dec.get
    assert(a.sampleRate == rate && a.channels == channels && a.bps == bps)
    assert(a.totalSamples == samples.length / channels)
    assert(a.samples.toSeq == samples.toSeq, "lossless round trip")
  }

  test("mono ramp: FIXED predictors, partial final frame, exact") {
    val s = Array.tabulate(700)(i => 1000 + i)
    roundTrip(s, 16000, 1)
  }

  test("constant signal: CONSTANT subframes") {
    roundTrip(Array.fill(600)(-12345), 44100, 1)
  }

  test("random noise incl. negatives: Rice residuals, order search") {
    val r = rng(7)
    val s = Array.fill(1500)(r.nextInt(65536) - 32768)
    roundTrip(s, 48000, 1)
  }

  test("forced VERBATIM frames") {
    val r = rng(11)
    val s = Array.fill(900)(r.nextInt(65536) - 32768)
    roundTrip(s, 8000, 1, verbatimEvery = 2)
  }

  test("escape-coded residual partitions") {
    val r = rng(13)
    val s = Array.fill(640)(r.nextInt(4096) - 2048)
    roundTrip(s, 16000, 1, escapeResiduals = true)
  }

  test("partition order 2 residuals") {
    val r = rng(17)
    // total a multiple of blockSize so every frame splits evenly
    val s = Array.fill(1024)(r.nextInt(30000) - 15000)
    roundTrip(s, 22050, 1, partitionOrder = 2)
  }

  test("stereo independent, left/side, right/side, mid/side all lossless") {
    val r = rng(19)
    val s = Array.fill(2 * 777)(r.nextInt(65536) - 32768)
    Seq(0, 8, 9, 10).foreach { mode =>
      roundTrip(s, 32000, 2, stereoMode = mode)
    }
  }

  test("correlated stereo compresses better under mid/side than independent") {
    val r = rng(23)
    var l = 0
    val s = new Array[Int](2 * 4096)
    for (i <- 0 until 4096) {
      l = math.max(-30000, math.min(30000, l + r.nextInt(201) - 100))
      s(2 * i) = l
      s(2 * i + 1) = l + r.nextInt(9) - 4 // right tracks left closely
    }
    val ind = Flac.encodeFlac(s, 44100, 2, stereoMode = 0).length
    val ms = Flac.encodeFlac(s, 44100, 2, stereoMode = 10).length
    assert(ms < ind, s"mid/side $ms !< independent $ind")
    roundTrip(s, 44100, 2, stereoMode = 10)
  }

  test("bit depths 8, 12, 20, 24 round-trip") {
    val r = rng(29)
    for (bps <- Seq(8, 12, 20, 24)) {
      val lim = 1 << (bps - 1)
      val s = Array.fill(500)(r.nextInt(2 * lim) - lim)
      roundTrip(s, 16000, 1, bps = bps)
    }
  }

  test("tiny signal (single VERBATIM-capable frame) and blockSize edge") {
    roundTrip(Array(1, -2, 3), 16000, 1, blockSize = 16)
    roundTrip(Array.tabulate(16)(i => i * 3 - 20), 16000, 1, blockSize = 16)
  }

  test("flacMeta: header-only parse matches encode parameters") {
    val s = Array.tabulate(1234)(i => (i * 7) % 1000)
    val bytes = Flac.encodeFlac(s, 96000, 1, bps = 20, blockSize = 512)
    assert(Flac.flacMeta(bytes).contains((96000, 1, 20, 1234L)))
  }

  test("corruption is rejected: CRC flip, truncation, bad magic") {
    val s = Array.tabulate(600)(i => 500 + i)
    val bytes = Flac.encodeFlac(s, 16000, 1)
    assert(Flac.decodeFlac(bytes).isDefined)
    // flip one byte in the middle of frame data → CRC16 mismatch → None
    val corrupt = bytes.clone()
    corrupt(bytes.length - 10) = (corrupt(bytes.length - 10) ^ 0x40).toByte
    assert(Flac.decodeFlac(corrupt).isEmpty)
    // truncate mid-frame → None (never hangs)
    assert(Flac.decodeFlac(bytes.take(bytes.length - 7)).isEmpty)
    // bad magic
    val wrong = bytes.clone(); wrong(0) = 'g'
    assert(Flac.decodeFlac(wrong).isEmpty && Flac.flacMeta(wrong).isEmpty)
    // garbage input
    assert(Flac.decodeFlac(Array.fill[Byte](100)(0x5a)).isEmpty)
  }

  test("frame numbers spanning multi-byte UTF-8 coding") {
    // 200+ frames at the minimum block size → frame index crosses 0x80,
    // exercising the 2-byte UTF-8 number in both directions
    val r = rng(31)
    val s = Array.fill(16 * 200)(r.nextInt(2000) - 1000)
    roundTrip(s, 16000, 1, blockSize = 16)
  }
}
