package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {

  test("feature extraction: histogram mass equals byte count, entropy bounded") {
    val media = Multimodal.synthetic(spark, 50)
    val feats = Multimodal.extractFeatures(media, batchSize = 16).collect()
    assert(feats.length == 50)
    feats.foreach { f =>
      assert(f.histogram.sum == f.n_bytes, s"${f.media_id} histogram mass")
      assert(f.byte_entropy >= 0 && f.byte_entropy <= 4.0 + 1e-9) // 16 bins
      assert(f.frames_sampled > 0)
    }
  }

  test("deterministic across runs (stub decode is seeded)") {
    val a = Multimodal.extractFeatures(Multimodal.synthetic(spark, 10)).collect()
    val b = Multimodal.extractFeatures(Multimodal.synthetic(spark, 10)).collect()
    assert(a.map(f => (f.media_id, f.byte_entropy)).toSet ==
      b.map(f => (f.media_id, f.byte_entropy)).toSet)
  }

  test("real PNG payloads decode through javax.imageio to pixel features") {
    import spark.implicits._
    // render a real 8x6 PNG: left half black, right half white
    val img = new java.awt.image.BufferedImage(8, 6,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 6; x <- 0 until 8)
      img.setRGB(x, y, if (x < 4) 0x000000 else 0xFFFFFF)
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", baos)
    val png = baos.toByteArray

    assert(Multimodal.imageDims(png).contains((8, 6)))
    val media = Seq(Multimodal.MediaRow(0L, "image", png,
      Multimodal.MediaMeta(Some(8), Some(6), None, None, Some("png")))).toDS()
    val f = Multimodal.extractFeatures(media).collect().head
    // features computed over the 48 decoded PIXELS, not the ~100 PNG bytes
    assert(f.n_bytes == 48L, s"decoded ${f.n_bytes} values")
    assert(f.histogram(0) == 24L, "24 black pixels in bin 0")
    assert(f.histogram(15) == 24L, "24 white pixels in bin 15")
    assert(math.abs(f.byte_entropy - 1.0) < 1e-9) // two equal-mass bins
  }

  test("real WAV payloads decode through javax.sound to waveform features") {
    import spark.implicits._
    // build a real 16-bit mono PCM WAV: 200 samples of a square wave
    // alternating +16384 / -16384 every 10 samples
    val samples = Array.tabulate(200)(i =>
      if ((i / 10) % 2 == 0) 16384.toShort else (-16384).toShort)
    val pcm = new Array[Byte](samples.length * 2)
    samples.zipWithIndex.foreach { case (s, i) => // little-endian
      pcm(2 * i) = (s & 0xff).toByte
      pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
    }
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, samples.length.toLong)
    val baos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, baos)
    val wav = baos.toByteArray

    assert(Multimodal.audioMeta(wav).contains((8000, 200L)))
    val media = Seq(Multimodal.MediaRow(0L, "audio", wav,
      Multimodal.MediaMeta(None, None, Some(8000), None, Some("wav")))).toDS()
    val f = Multimodal.extractFeatures(media).collect().head
    // features computed over the 200 decoded SAMPLES, not the ~244 WAV bytes
    assert(f.n_bytes == 200L, s"decoded ${f.n_bytes} samples")
    // high bytes are 0x40 (bin 4) and 0xC0 (bin 12), 100 each
    assert(f.histogram(4) == 100L, s"histogram: ${f.histogram.toSeq}")
    assert(f.histogram(12) == 100L)
    assert(math.abs(f.byte_entropy - 1.0) < 1e-9) // two equal-mass bins
  }

  test("non-WAV audio payloads fall back to the deterministic stub") {
    import spark.implicits._
    val junk = Array.tabulate(80)(_.toByte)
    val media = Seq(Multimodal.MediaRow(2L, "audio", junk,
      Multimodal.MediaMeta(None, None, None, None, None))).toDS()
    val f = Multimodal.extractFeatures(media).collect().head
    assert(f.n_bytes == 80L) // raw bytes, stub path
    assert(Multimodal.audioMeta(junk).isEmpty)
  }

  test("undecodable image payloads fall back to the deterministic stub") {
    import spark.implicits._
    val junk = Array.tabulate(100)(_.toByte)
    val media = Seq(Multimodal.MediaRow(1L, "image", junk,
      Multimodal.MediaMeta(None, None, None, None, None))).toDS()
    val f = Multimodal.extractFeatures(media).collect().head
    assert(f.n_bytes == 100L) // raw bytes, stub path
    assert(Multimodal.imageDims(junk).isEmpty)
  }

  test("AVI demux: built container round-trips exactly — frame count, " +
    "dims, per-frame luminance; garbage and compressed payloads refuse") {
    val shades = Seq(0, 17, 200, 255)
    val bytes = Multimodal.aviDibBytes(10, 6, shades)
    val frames = Multimodal.decodeVideoAvi(bytes)
    assert(frames.isDefined, "built AVI did not demux")
    assert(frames.get.length == 4)
    frames.get.zip(shades).foreach { case (luma, s) =>
      assert(luma.length == 60, "frame plane is w*h")
      assert(luma.forall(b => (b & 0xff) == s),
        s"flat shade $s not recovered: ${luma.take(5).toSeq}")
    }
    // odd width exercises the 4-byte stride padding path
    val odd = Multimodal.decodeVideoAvi(Multimodal.aviDibBytes(7, 3, Seq(9)))
    assert(odd.exists(f => f.head.length == 21 &&
      f.head.forall(b => (b & 0xff) == 9)))
    // non-AVI payloads refuse (→ the documented stub fallback in decode)
    assert(Multimodal.decodeVideoAvi("not a movie".getBytes).isEmpty)
    assert(Multimodal.decodeVideoAvi(Multimodal.pngHeaderBytes(4, 4)).isEmpty)
    // the decode() seam routes video through the real demuxer now
    val viaSeam = Multimodal.decode(bytes, "video")
    assert(viaSeam.length == 4 * 60 &&
      (viaSeam(0) & 0xff) == 0 && (viaSeam(60) & 0xff) == 17)
  }

  test("MJPEG-in-AVI: real JPEG frames demux+decode; flat-shade luma is " +
    "size-independent and matches the driver-computed table") {
    val shades = Seq(0, 68, 200, 252)
    val bytes = Multimodal.aviMjpegBytes(24, 16, shades)
    val frames = Multimodal.decodeVideoAvi(bytes)
    assert(frames.isDefined, "built MJPEG AVI did not demux")
    assert(frames.get.length == 4)
    frames.get.zip(shades).foreach { case (luma, s) =>
      assert(luma.length == 24 * 16, "frame plane is w*h")
      val expect = Multimodal.mjpegFlatLuma(s)
      assert(luma.forall(b => (b & 0xff) == expect),
        s"flat shade $s decoded non-uniform or off-table " +
          s"(expect $expect, got ${luma.take(5).map(_ & 0xff).toSeq})")
    }
    // size independence: odd dims force encoder edge-padding of the last
    // 8x8 blocks — decode must stay flat at the same table value
    Seq((8, 8), (23, 9), (40, 16)).foreach { case (w, h) =>
      val one = Multimodal.decodeVideoAvi(
        Multimodal.aviMjpegBytes(w, h, Seq(68))).get.head
      assert(one.length == w * h &&
        one.forall(b => (b & 0xff) == Multimodal.mjpegFlatLuma(68)),
        s"${w}x$h flat decode drifted")
    }
    // a 00dc chunk that is not JPEG is skipped, not mis-decoded
    val corrupt = bytes.clone()
    // find the first 00dc tag and break its SOI marker
    val idx = bytes.indices.find(i => bytes(i) == '0' && bytes(i + 1) == '0' &&
      bytes(i + 2) == 'd' && bytes(i + 3) == 'c').get
    corrupt(idx + 8) = 0x00
    assert(Multimodal.decodeVideoAvi(corrupt).get.length == 3)
  }

  test("resize rewrites meta dims only") {
    val df = Multimodal.synthetic(spark, 6).toDF()
    val out = Multimodal.resize(df, 128, 96)
      .select("meta.width", "meta.height", "meta.codec").distinct().collect()
    assert(out.forall(r => r.getInt(0) == 128 && r.getInt(1) == 96))
  }

  test("binary media columns round-trip through the parquet lake") {
    val dir = java.nio.file.Files.createTempDirectory("medialake").toString
    val media = Multimodal.synthetic(spark, 20)
    graft.io.Layers.writeParquet(media.toDF(), s"$dir/media.parquet")
    val back = graft.io.Layers.readParquet(spark, s"$dir/media.parquet")
    assert(back.count() == 20)
    assert(back.schema("bytes").dataType ==
      org.apache.spark.sql.types.BinaryType)
    // feature extraction over the round-tripped binary matches the original
    import spark.implicits._
    val a = Multimodal.extractFeatures(media)
      .select("media_id", "byte_entropy").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val b = Multimodal.extractFeatures(back.as[Multimodal.MediaRow])
      .select("media_id", "byte_entropy").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(a == b)
  }

  test("kinds are partition-stable and binary column never shuffles in features") {
    val feats = Multimodal.extractFeatures(Multimodal.synthetic(spark, 30))
    assert(feats.columns.toSet ==
      Set("media_id", "kind", "n_bytes", "byte_entropy", "histogram", "frames_sampled"))
    assert(feats.filter(col("kind") === "image").count() == 10)
  }

  test("headerMeta parses real codec output, built headers, and rejects junk") {
    // REAL PNG and GIF from the JDK encoder — parser vs actual codec output
    val img = new java.awt.image.BufferedImage(
      37, 21, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (fmt <- Seq("png", "gif")) {
      val bos = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(img, fmt, bos))
      assert(Multimodal.headerMeta(bos.toByteArray).contains((fmt, 37, 21)))
    }
    // REAL JPEG from the JDK encoder (SOF position varies — marker scan)
    val jb = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "jpg", jb))
    assert(Multimodal.headerMeta(jb.toByteArray).contains(("jpeg", 37, 21)))
    // built minimal headers round-trip
    assert(Multimodal.headerMeta(Multimodal.pngHeaderBytes(1000, 500))
      .contains(("png", 1000, 500)))
    assert(Multimodal.headerMeta(Multimodal.jpegHeaderBytes(640, 480))
      .contains(("jpeg", 640, 480)))
    assert(Multimodal.headerMeta(Multimodal.gifHeaderBytes(13, 7))
      .contains(("gif", 13, 7)))
    // BMP structural header
    val bmp = java.nio.ByteBuffer.allocate(26)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bmp.put('B'.toByte).put('M'.toByte).position(18)
    bmp.putInt(320).putInt(200)
    assert(Multimodal.headerMeta(bmp.array()).contains(("bmp", 320, 200)))
    // junk / truncation never throws, never lies
    assert(Multimodal.headerMeta(Array[Byte]()).isEmpty)
    assert(Multimodal.headerMeta(Array.fill(100)(0x41.toByte)).isEmpty)
    assert(Multimodal.headerMeta(
      Multimodal.pngHeaderBytes(10, 10).take(20)).isEmpty)
    assert(Multimodal.headerMeta(
      Array(0xff, 0xd8, 0xff, 0xe0, 0x00, 0x03, 0x00).map(_.toByte)).isEmpty)
  }

  test("IMA-ADPCM: constant and ±1-ramp signals round-trip EXACTLY " +
    "(the q235 closed form), fact chunk trims block padding") {
    val const = Array.fill(1200)(12345.toShort)
    assert(Multimodal.decodeImaAdpcmPcm(
      Multimodal.imaAdpcmWavBytes(const, 16000, 256)).get.toSeq == const.toSeq)
    // n = 1200 is NOT a multiple of spb=505 → padded final block, trimmed
    val rampUp = Array.tabulate(1200)(i => (7000 + i).toShort)
    assert(Multimodal.decodeImaAdpcmPcm(
      Multimodal.imaAdpcmWavBytes(rampUp, 16000, 256)).get.toSeq == rampUp.toSeq)
    val rampDn = Array.tabulate(777)(i => (9000 - i).toShort)
    assert(Multimodal.decodeImaAdpcmPcm(
      Multimodal.imaAdpcmWavBytes(rampDn, 8000, 256)).get.toSeq == rampDn.toSeq)
  }

  test("IMA-ADPCM: arbitrary signals decode to the encoder's reconstructed " +
    "stream bit-for-bit, within the step-table error envelope of the input") {
    // deterministic pseudorandom BANDLIMITED walk (|Δ| ≤ 300/sample — a
    // slope ADPCM's step adaptation can follow; instantaneous jumps are
    // bounded only by the jump size itself, not by the codec)
    var x = 42L
    var v = 0
    val sig = Array.tabulate(3000) { _ =>
      x = x * 6364136223846793005L + 1442695040888963407L
      v = math.max(-15000, math.min(15000, v + (((x >> 33) % 601) - 300).toInt))
      v.toShort
    }
    val bytes = Multimodal.imaAdpcmWavBytes(sig, 16000, 256)
    val dec = Multimodal.decodeImaAdpcmPcm(bytes).get
    assert(dec.length == sig.length)
    val errs = sig.zip(dec).map { case (a, b) => math.abs(a - b) }
    // block headers carry the first sample VERBATIM — exactness restored
    // at every 505-sample boundary no matter how far tracking drifted
    assert(errs.zipWithIndex.filter(_._2 % 505 == 0).forall(_._1 == 0),
      "block-header samples are verbatim")
    // once the step has adapted to the walk's slope (≤ 300/sample), the
    // residual per sample is < the current step — a few step-table rungs
    // above 300 bounds the envelope
    assert(errs.max < 4000, s"max tracking error ${errs.max}")
    assert(errs.map(_.toLong).sum.toDouble / errs.length < 500.0,
      "mean tracking error envelope")
  }

  test("IMA-ADPCM STEREO: per-channel ramps round-trip exactly through " +
    "the 4-byte channel-chunk demux, interleaved L R per frame") {
    val n = 700 // not a multiple of spb=249 → padded final block, trimmed
    val l = Array.tabulate(n)(i => (6000 + i).toShort)
    val r = Array.tabulate(n)(i => (20000 - i).toShort)
    val bytes = Multimodal.imaAdpcmWavStereoBytes(l, r, 16000, 256)
    val dec = Multimodal.decodeImaAdpcmPcm(bytes).get
    assert(dec.length == 2 * n, s"decoded ${dec.length} of ${2 * n}")
    assert((0 until n).forall(i => dec(2 * i) == l(i)), "left channel drift")
    assert((0 until n).forall(i => dec(2 * i + 1) == r(i)), "right channel drift")
    // a general stereo signal still decodes deterministically with exact
    // block-header frames (every 249th frame per channel is verbatim)
    var x = 7L
    val wl = Array.tabulate(1000) { _ =>
      x = x * 6364136223846793005L + 1442695040888963407L
      ((x >> 40) % 8000).toShort
    }
    val wr = wl.map(v => (-v).toShort)
    val d2 = Multimodal.decodeImaAdpcmPcm(
      Multimodal.imaAdpcmWavStereoBytes(wl, wr, 8000, 256)).get
    assert(d2.length == 2000)
    (0 until 1000 by 249).foreach { i =>
      assert(d2(2 * i) == wl(i) && d2(2 * i + 1) == wr(i),
        s"block-header frame $i not verbatim")
    }
  }

  test("IMA-ADPCM WAV routes through the decode seam (not the stub); " +
    "javax.sound cannot claim it") {
    val pcm = Array.tabulate(600)(i => (5000 + i).toShort)
    val bytes = Multimodal.imaAdpcmWavBytes(pcm, 16000, 256)
    // the seam returns MSB-per-sample waveform bytes, like decodeAudio
    val wave = Multimodal.decode(bytes, "audio")
    assert(wave.length == 600, s"decoded ${wave.length} — stub would echo " +
      s"the ${bytes.length} container bytes")
    assert(wave.toSeq == pcm.map(s => ((s >> 8) & 0xff).toByte).toSeq)
    // non-0x11 payloads still return None from the ADPCM path
    assert(Multimodal.decodeImaAdpcmPcm("RIFFjunkWAVE".getBytes).isEmpty)
    // metadata pass: header-only (rate, frames) for mono and stereo,
    // without touching the data chunk
    assert(Multimodal.audioMeta(bytes).contains((16000, 600L)))
    val st = Multimodal.imaAdpcmWavStereoBytes(
      Array.tabulate(700)(i => (6000 + i).toShort),
      Array.tabulate(700)(i => (9000 - i).toShort), 8000, 256)
    assert(Multimodal.audioMeta(st).contains((8000, 700L)))
  }

  test("FLAC routes through the decode seam (not the stub); audioMeta " +
    "answers from the header") {
    val pcm = Array.tabulate(600)(i => 5000 + i)
    val bytes = graft.ext.Flac.encodeFlac(pcm, 16000, channels = 1)
    val wave = Multimodal.decode(bytes, "audio")
    assert(wave.length == 600, s"decoded ${wave.length} — stub would echo " +
      s"the ${bytes.length} container bytes")
    assert(wave.toSeq == pcm.map(s => ((s >> 8) & 0xff).toByte).toSeq)
    // metadata pass: STREAMINFO-only (rate, total samples)
    assert(Multimodal.audioMeta(bytes).contains((16000, 600L)))
  }

  test("G.711: expansion/compression inverse on the code domain; known " +
    "extremes; WAV seam round trip; header-only meta") {
    // µ-law: every code round-trips except 0x7F, the negative-zero alias
    // of 0xFF (both expand to 0; compression canonicalizes to 0xFF)
    for (c <- 0 until 256 if c != 0x7f)
      assert(Multimodal.linearToUlaw(Multimodal.ulawToLinear(c)) == c,
        s"ulaw code $c")
    assert(Multimodal.ulawToLinear(0x7f) == 0 &&
      Multimodal.ulawToLinear(0xff) == 0 &&
      Multimodal.linearToUlaw(0) == 0xff)
    // A-law has no zero collision (min magnitude 8): all 256 round-trip
    for (c <- 0 until 256)
      assert(Multimodal.linearToAlaw(Multimodal.alawToLinear(c)) == c,
        s"alaw code $c")
    // ITU extremes: µ-law ±32124 at codes 0x80/0x00, A-law ±32256/∓8
    assert(Multimodal.ulawToLinear(0x80) == 32124 &&
      Multimodal.ulawToLinear(0x00) == -32124)
    assert(Multimodal.alawToLinear(0xaa) == 32256 &&
      Multimodal.alawToLinear(0x2a) == -32256 &&
      Multimodal.alawToLinear(0xd5) == 8 &&
      Multimodal.alawToLinear(0x55) == -8)
    // decode quantization idempotence: expand → compress → expand fixes
    for (v <- Seq(-30000, -1000, -9, 0, 7, 123, 4567, 32767)) {
      val uq = Multimodal.ulawToLinear(Multimodal.linearToUlaw(v))
      assert(Multimodal.ulawToLinear(Multimodal.linearToUlaw(uq)) == uq)
      val aq = Multimodal.alawToLinear(Multimodal.linearToAlaw(v))
      assert(Multimodal.alawToLinear(Multimodal.linearToAlaw(aq)) == aq)
    }
    // WAV mux → decode seam: MSB waveform of the expanded PCM, not the
    // container bytes (javax.sound would hand fmt-7 back undecoded)
    val codes = Array.tabulate(601)(i => ((i * 11) % 256).toByte)
    for (aLaw <- Seq(false, true)) {
      val wav = Multimodal.g711WavBytes(codes, 8000, aLaw)
      val pcm = Multimodal.decodeG711Pcm(wav).get
      val expand: Int => Int =
        if (aLaw) Multimodal.alawToLinear else Multimodal.ulawToLinear
      assert(pcm.toSeq == codes.toSeq.map(c => expand(c & 0xff).toShort))
      val wave = Multimodal.decode(wav, "audio")
      assert(wave.length == 601 &&
        wave.toSeq == pcm.toSeq.map(s => ((s >> 8) & 0xff).toByte))
      // header-only metadata: rate from fmt, count from fact (odd length
      // proves the fact trim drops the pad byte)
      assert(Multimodal.audioMeta(wav).contains((8000, 601L)))
    }
    assert(Multimodal.decodeG711Pcm("RIFFjunkWAVE".getBytes).isEmpty)
    // STEREO with a fact chunk: fact counts PER-CHANNEL frames, so the
    // decode must keep frames × channels samples, not frames (the in-repo
    // mux is mono-only — build the interleaved WAV by hand)
    locally {
      val frames = 301 // odd total byte count (602) exercises no-pad path
      val inter = Array.tabulate(frames * 2)(i => ((i * 7) % 256).toByte)
      val dataSz = inter.length + (inter.length & 1)
      val riffSz = 4 + (8 + 18) + (8 + 4) + (8 + dataSz)
      val b = java.nio.ByteBuffer.allocate(8 + riffSz)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      def tag(s: String): Unit = { b.put(s.getBytes("US-ASCII")); () }
      tag("RIFF"); b.putInt(riffSz); tag("WAVE")
      tag("fmt "); b.putInt(18)
      b.putShort(7); b.putShort(2) // µ-law, 2 channels
      b.putInt(8000); b.putInt(16000)
      b.putShort(2); b.putShort(8); b.putShort(0)
      tag("fact"); b.putInt(4); b.putInt(frames) // per-channel count
      tag("data"); b.putInt(inter.length)
      b.put(inter)
      val pcm = Multimodal.decodeG711Pcm(b.array()).get
      assert(pcm.length == frames * 2,
        s"stereo fact trim: got ${pcm.length}, want ${frames * 2}")
      assert(pcm.toSeq ==
        inter.toSeq.map(c => Multimodal.ulawToLinear(c & 0xff).toShort))
    }
  }

  test("aHash64: analytic values for stripe images, flat collision, box-avg") {
    val col8 = 72340172838076673L // 0x0101010101010101
    // 8x8, k white columns → (2^k - 1) · col8
    assert(Multimodal.aHash64(Multimodal.syntheticPng(8, 8, 3))
      .contains(7L * col8))
    // flat images (all black / all white) land in the all-zero class
    assert(Multimodal.aHash64(Multimodal.syntheticPng(8, 8, 0)).contains(0L))
    assert(Multimodal.aHash64(Multimodal.syntheticPng(8, 8, 8)).contains(0L))
    // 16x16 with 6 white columns: 2x2 box-average → 3 fully-white cell
    // columns (col 3 averages cols 6,7 = black) → same as k=3 at 8x8
    assert(Multimodal.aHash64(Multimodal.syntheticPng(16, 16, 6))
      .contains(7L * col8))
    // near-dup robustness: one flipped pixel moves Hamming ≤ 2, not far
    val a = Multimodal.aHash64(Multimodal.syntheticPng(8, 8, 4)).get
    val img = Multimodal.syntheticPng(8, 8, 4)
    assert(Multimodal.aHash64(img).get == a)
    // undecodable payload → None
    assert(Multimodal.aHash64("not an image".getBytes).isEmpty)
  }
}
