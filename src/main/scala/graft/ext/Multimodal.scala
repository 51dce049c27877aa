package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns: image/audio/video as opaque `binary` with typed
  * metadata (graft.schema.Schemas.media).
  *
  * The Spark-side plumbing — schema, partitioning, batched per-partition
  * processing, feature schema — is real and tested. IMAGE decode is real
  * (javax.imageio ships with the JDK: PNG/BMP/GIF/JPEG → luminance plane,
  * see `decodeImage`), AUDIO decode is real for the JDK-native formats
  * (javax.sound.sampled: RIFF/WAV, AU, AIFF → waveform bytes, see
  * `decodeAudio`), and VIDEO decode is real for RIFF/AVI containers with
  * uncompressed-DIB ('00db') or MJPEG ('00dc' + JPEG SOI) frames — the
  * container demux below plus the same ImageIO JPEG codec the image path
  * uses. COMPRESSED AUDIO decode is real for IMA-ADPCM WAV (fmt 0x11 —
  * pure-integer predictor/step-table walk, see `decodeImaAdpcmPcm`),
  * for G.711 µ-law/A-law WAV (fmt 7/6 — the telephony companding
  * expansions, see `decodeG711Pcm`), and for FLAC (subset decoder in
  * [[Flac]] — Rice-coded integer predictor residuals,
  * CONSTANT/VERBATIM/FIXED/LPC subframes, stereo
  * decorrelation, CRC-verified); only PERCEPTUAL audio codecs
  * (mp3/ogg-class, no JDK codec and no integer-exact zero-dep decode)
  * remain STUBBED behind `decodeStub`, which produces a deterministic
  * fake "decoded" payload from the bytes. Swapping in further codecs
  * changes only the `decode` seam.
  *
  * Scale notes: feature extraction is `mapPartitions` over batches of
  * `batchSize` rows — the same batch shape a vectorized (Arrow/pandas-style)
  * UDF would use — so codec state is amortized across a batch and memory is
  * bounded per task. Binary payloads never shuffle: features are computed
  * scan-side and the binary column is dropped before any wide operation.
  */
object Multimodal {

  final case class MediaMeta(width: Option[Int], height: Option[Int],
      sample_rate: Option[Int], duration_ms: Option[Long], codec: Option[String])
  final case class MediaRow(media_id: Long, kind: String, bytes: Array[Byte],
      meta: MediaMeta)
  final case class MediaFeatures(media_id: Long, kind: String, n_bytes: Long,
      byte_entropy: Double, histogram: Array[Long], frames_sampled: Int)

  /** STUB decode ??? — deterministic fake for PERCEPTUAL AUDIO codecs (no
    * mp3/ogg-class codec ships with the JDK; H.264-class video likewise
    * stays environment-bound — IMA-ADPCM WAV and FLAC decode for REAL
    * above this floor) and for undecodable payloads: the "decoded
    * frame" is the byte stream itself, so downstream feature math is
    * still exercised end-to-end with stable results. Uncompressed-DIB and
    * MJPEG AVI video and the JDK-native image/audio formats take their
    * REAL decode paths below.
    */
  private def decodeStub(bytes: Array[Byte], kind: String): Array[Byte] = bytes

  /** Decode seam: images go through the REAL JDK codec path (javax.imageio —
    * PNG/BMP/GIF/JPEG ship with the JDK), audio through the REAL IMA-ADPCM
    * decoder (fmt-0x11 WAV, below) then the REAL javax.sound.sampled path
    * (RIFF/WAV/AU/AIFF PCM), and video through the REAL RIFF/AVI demuxer
    * below (uncompressed DIB and MJPEG frames → concatenated per-frame
    * luminance planes). Anything those can't parse — perceptual audio
    * (mp3/ogg) and H.264-class video stay environment-bound — falls back
    * to the stub. Swapping in further codecs changes only this function.
    */
  private[ext] def decode(bytes: Array[Byte], kind: String): Array[Byte] =
    kind match {
      case "image" => decodeImage(bytes).getOrElse(decodeStub(bytes, kind))
      case "audio" =>
        // magic/fmt-tag detection is precise, so the in-house codecs go
        // first (fLaC magic, then fmt-0x11 ADPCM, then fmt-6/7 G.711) —
        // javax.sound may accept a container but cannot decode ADPCM, and
        // hands G.711 back as raw undecoded code bytes
        decodeFlacWav(bytes)
          .orElse(decodeImaAdpcmWav(bytes)).orElse(decodeG711Wav(bytes))
          .orElse(decodeAudio(bytes))
          .getOrElse(decodeStub(bytes, kind))
      case "video" =>
        decodeVideoAvi(bytes).map(_.flatten.toArray)
          .getOrElse(decodeStub(bytes, kind))
      case _ => decodeStub(bytes, kind)
    }

  /** REAL video decode for the formats this JDK can handle end-to-end:
    * RIFF/AVI container demux + uncompressed bottom-up DIB ('00db') frame
    * decode, or MJPEG ('00dc', JPEG SOI payload) frames through the real
    * ImageIO JPEG codec → one BT.601 integer-luminance plane per frame,
    * row-major top-down. This is a genuine container walk (RIFF chunk lengths,
    * LIST skip, stride padding, bottom-up row order), so the q169
    * round-trip argument applies: [[aviDibBytes]] builds real AVI bytes
    * and this parser must recover exactly the written pixels — an
    * analytic oracle predicts every downstream feature in closed form
    * (q233). Returns None for anything that is not an uncompressed-DIB
    * AVI (compressed codecs → the documented stub).
    */
  def decodeVideoAvi(bytes: Array[Byte]): Option[Seq[Array[Byte]]] =
    try {
      def u8(i: Int): Int = bytes(i) & 0xff
      def le32(i: Int): Int =
        u8(i) | (u8(i + 1) << 8) | (u8(i + 2) << 16) | (u8(i + 3) << 24)
      def tag(i: Int): String =
        new String(bytes, i, 4, "US-ASCII")
      if (bytes.length < 24 || tag(0) != "RIFF" || tag(8) != "AVI ")
        return None
      var w = 0
      var h = 0
      val frames = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
      // walk top-level chunks; descend into LISTs (hdrl for avih dims,
      // movi for frames); chunk sizes pad to even offsets per RIFF
      def walk(from: Int, to: Int): Unit = {
        var i = from
        while (i + 8 <= to) {
          val ck = tag(i)
          val sz = le32(i + 4)
          // untrusted size: a negative (or 0xFFFFFFF8-style) value would
          // make the chunk step non-positive and wedge the walk forever
          if (sz < 0) return
          if (ck == "LIST") {
            walk(i + 12, i + 8 + sz)
          } else if (ck == "avih" && sz >= 40) {
            w = le32(i + 8 + 32)
            h = le32(i + 8 + 36)
          } else if (ck == "00dc" && sz >= 2 && u8(i + 8) == 0xff &&
            u8(i + 9) == 0xd8) {
            // COMPRESSED frame chunk carrying an MJPEG payload (JPEG SOI
            // marker): per-frame decode through the same REAL ImageIO JPEG
            // codec the image path uses — r6 VERDICT #3, the compressed-
            // video stub closed with zero new dependencies. Frame dims come
            // from the JPEG itself, so no avih dependency.
            decodeImage(
              java.util.Arrays.copyOfRange(bytes, i + 8, i + 8 + sz))
              .foreach(frames += _)
          } else if (ck == "00db" && w > 0 && h > 0) {
            // bottom-up 24-bit DIB, rows padded to 4 bytes
            val stride = ((w * 3 + 3) / 4) * 4
            if (sz >= stride * h) {
              val luma = new Array[Byte](w * h)
              var y = 0
              while (y < h) {
                val rowOff = i + 8 + (h - 1 - y) * stride
                var x = 0
                while (x < w) {
                  val b = u8(rowOff + x * 3)
                  val g = u8(rowOff + x * 3 + 1)
                  val r = u8(rowOff + x * 3 + 2)
                  luma(y * w + x) = ((r * 299 + g * 587 + b * 114) / 1000).toByte
                  x += 1
                }
                y += 1
              }
              frames += luma
            }
          }
          i += 8 + sz + (sz & 1)
        }
      }
      walk(12, bytes.length)
      // MJPEG frames carry their own dims, so avih w/h may legitimately be
      // zero — any decoded frame is a successful decode. ('00db' DIB frames
      // still require w/h > 0 at their decode site above.)
      if (frames.nonEmpty) Some(frames.toSeq) else None
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Minimal uncompressed-DIB AVI bytes: RIFF(hdrl(avih) + movi('00db'
    * frames)), 24-bit BGR bottom-up rows padded to 4 bytes — each frame a
    * FLAT shade (r = g = b = shade), so the decoded luminance is exactly
    * `shade` per pixel (299+587+114 = 1000 divides out). Deterministic
    * pure data: the q233 oracle predicts the whole census analytically.
    */
  def aviDibBytes(w: Int, h: Int, frameShades: Seq[Int]): Array[Byte] = {
    val stride = ((w * 3 + 3) / 4) * 4
    val frameSz = stride * h
    val avihSz = 56
    val hdrlSz = 4 + 8 + avihSz
    val moviSz = 4 + frameShades.length * (8 + frameSz)
    val riffSz = 4 + 8 + hdrlSz + 8 + moviSz
    val b = java.nio.ByteBuffer.allocate(8 + riffSz)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def tag(s: String): Unit = b.put(s.getBytes("US-ASCII"))
    tag("RIFF"); b.putInt(riffSz); tag("AVI ")
    tag("LIST"); b.putInt(hdrlSz); tag("hdrl")
    tag("avih"); b.putInt(avihSz)
    b.putInt(40000) // usec/frame
    b.putInt(0); b.putInt(0); b.putInt(0)
    b.putInt(frameShades.length) // total frames
    b.putInt(0); b.putInt(1)
    b.putInt(0)
    b.putInt(w); b.putInt(h)
    b.putInt(0); b.putInt(0); b.putInt(0); b.putInt(0)
    tag("LIST"); b.putInt(moviSz); tag("movi")
    frameShades.foreach { s =>
      tag("00db"); b.putInt(frameSz)
      val row = new Array[Byte](stride)
      java.util.Arrays.fill(row, 0, w * 3, s.toByte)
      (0 until h).foreach(_ => b.put(row))
    }
    b.array()
  }

  /** Minimal MJPEG-in-AVI bytes: RIFF(hdrl(avih) + movi('00dc' frames)),
    * each frame a REAL ImageIO-encoded JPEG of a FLAT gray image. Flat
    * frames are DC-only in every 8×8 block, so decode returns a flat
    * raster at [[mjpegFlatLuma]](shade) — quantization shifts the shade
    * deterministically but uniformly, which keeps the census oracle in
    * closed form given the 256-entry shade→luma table (the q80 ADC
    * "driver-computed lookup inlined" pattern).
    */
  def aviMjpegBytes(w: Int, h: Int, frameShades: Seq[Int]): Array[Byte] = {
    val jpegs = frameShades.map(s => jpegFlatBytes(w, h, s))
    def padded(n: Int): Int = n + (n & 1)
    val avihSz = 56
    val hdrlSz = 4 + 8 + avihSz
    val moviSz = 4 + jpegs.map(j => 8 + padded(j.length)).sum
    val riffSz = 4 + 8 + hdrlSz + 8 + moviSz
    val b = java.nio.ByteBuffer.allocate(8 + riffSz)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def tag(s: String): Unit = b.put(s.getBytes("US-ASCII"))
    tag("RIFF"); b.putInt(riffSz); tag("AVI ")
    tag("LIST"); b.putInt(hdrlSz); tag("hdrl")
    tag("avih"); b.putInt(avihSz)
    b.putInt(40000) // usec/frame
    b.putInt(0); b.putInt(0); b.putInt(0)
    b.putInt(jpegs.length) // total frames
    b.putInt(0); b.putInt(1)
    b.putInt(0)
    b.putInt(w); b.putInt(h)
    b.putInt(0); b.putInt(0); b.putInt(0); b.putInt(0)
    tag("LIST"); b.putInt(moviSz); tag("movi")
    jpegs.foreach { j =>
      tag("00dc"); b.putInt(j.length)
      b.put(j)
      if ((j.length & 1) == 1) b.put(0.toByte) // RIFF even padding
    }
    b.array()
  }

  /** REAL ImageIO JPEG encode of a flat gray w×h image. */
  private[ext] def jpegFlatBytes(w: Int, h: Int, shade: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val g = img.getRaster
    val row = Array.fill(w)(shade)
    (0 until h).foreach(y => g.setSamples(0, y, w, 1, 0, row))
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.setUseCache(false)
    javax.imageio.ImageIO.write(img, "jpeg", out)
    out.toByteArray
  }

  /** Decoded luminance of a flat-shade MJPEG frame — size-independent: a
    * flat image is DC-only in every 8×8 block (edge padding replicates the
    * same value), so the decoder returns one uniform value determined by
    * DC quantization alone. Computed by an actual 8×8 encode→decode round
    * trip, memoized; oracle SQL inlines these as literals.
    */
  private val mjpegLumaCache =
    new java.util.concurrent.ConcurrentHashMap[Int, Int]()
  def mjpegFlatLuma(shade: Int): Int =
    mjpegLumaCache.computeIfAbsent(shade, { s =>
      val plane = decodeImage(jpegFlatBytes(8, 8, s)).get
      plane(0) & 0xff
    })

  /** Real image decode: the luminance plane (BT.601 integer weights) of the
    * decoded raster, row-major — so the generic histogram/entropy features
    * downstream operate on PIXELS for real images. Returns None for payloads
    * javax.imageio has no codec for.
    */
  private[ext] def decodeImage(bytes: Array[Byte]): Option[Array[Byte]] =
    try {
      javax.imageio.ImageIO.setUseCache(false) // no tmp-file cache in executors
      Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes)))
        .map { img =>
          val (w, h) = (img.getWidth, img.getHeight)
          val out = new Array[Byte](w * h)
          var y = 0
          var i = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val rgb = img.getRGB(x, y)
              out(i) = ((((rgb >> 16) & 0xff) * 299 + ((rgb >> 8) & 0xff) * 587 +
                (rgb & 0xff) * 114) / 1000).toByte
              i += 1; x += 1
            }
            y += 1
          }
          out
        }
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Real audio decode: the waveform of a RIFF/WAV (or AU/AIFF) payload via
    * javax.sound.sampled (ships with the JDK). First channel only, one byte
    * per sample (the most-significant byte of each PCM sample), so the
    * generic histogram/entropy features downstream operate on the WAVEFORM
    * for real audio. Returns None for payloads the JDK has no codec for
    * (mp3/ogg/etc. → stub).
    */
  private[ext] def decodeAudio(bytes: Array[Byte]): Option[Array[Byte]] =
    try {
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        val fmt = in.getFormat
        val data = in.readAllBytes()
        val bytesPerSample = math.max(1, fmt.getSampleSizeInBits / 8)
        val frame = math.max(bytesPerSample, fmt.getFrameSize)
        val n = data.length / frame
        val out = new Array[Byte](n)
        var i = 0
        while (i < n) {
          val off = i * frame + (if (fmt.isBigEndian) 0 else bytesPerSample - 1)
          out(i) = data(off)
          i += 1
        }
        Some(out)
      } finally in.close()
    } catch { case scala.util.control.NonFatal(_) => None }

  // ------------------------------------------------ IMA-ADPCM (WAV 0x11)

  /** IMA/DVI ADPCM step-size table (public spec: IMA Digital Audio Focus
    * Group "Recommended Practices for Enhancing Digital Audio
    * Compatibility", 1992 — the table every fmt-0x11 WAV codec shares).
    */
  private val imaStepTable: Array[Int] = Array(
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
    6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
    16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767)

  /** Step-index adjustment per 3-bit magnitude code. */
  private val imaIndexTable: Array[Int] = Array(-1, -1, -1, -1, 2, 4, 6, 8)

  /** The shared predictor update — ENCODER AND DECODER run this exact
    * integer arithmetic, which is what makes decode(encode(x)) a
    * deterministic pure-integer function (and constant/±1-ramp signals
    * reconstruct EXACTLY: diff 0 → nibble 0 → delta step>>3 = 0 at
    * step 7; diff ±1 → nibble ±1 → delta step>>2 = 1 — the q235 closed
    * form). Returns (newPredictor, newIndex).
    */
  @inline private def imaStep(pred: Int, index: Int, nibble: Int): (Int, Int) = {
    val step = imaStepTable(index)
    var delta = step >> 3
    if ((nibble & 4) != 0) delta += step
    if ((nibble & 2) != 0) delta += step >> 1
    if ((nibble & 1) != 0) delta += step >> 2
    val p = if ((nibble & 8) != 0) pred - delta else pred + delta
    val pc = math.max(-32768, math.min(32767, p))
    val ic = math.max(0, math.min(88, index + imaIndexTable(nibble & 7)))
    (pc, ic)
  }

  /** REAL IMA-ADPCM encoder → a complete RIFF/WAVE payload with format tag
    * 0x11 (mono): fmt chunk (cbSize 2, wSamplesPerBlock), a `fact` chunk
    * recording the TRUE sample count, and block-aligned data — each block a
    * 4-byte header (int16 predictor = the block's first sample, uint8 step
    * index, reserved 0) followed by (blockAlign−4)·2 nibbles packed
    * LOW-NIBBLE-FIRST. The final partial block pads by repeating the last
    * sample; `fact` lets the decoder trim the padding. Pure integer math,
    * zero dependencies — the compressed-audio sibling of [[aviDibBytes]].
    */
  def imaAdpcmWavBytes(samples: Array[Short], sampleRate: Int,
      blockAlign: Int = 256): Array[Byte] = {
    require(blockAlign >= 8 && blockAlign % 4 == 0, "blockAlign: ≥8, mult of 4")
    require(samples.nonEmpty, "imaAdpcmWavBytes: empty signal")
    val spb = (blockAlign - 4) * 2 + 1 // samples per block, mono
    val nBlocks = (samples.length + spb - 1) / spb
    val dataSz = nBlocks * blockAlign
    val riffSz = 4 + (8 + 20) + (8 + 4) + (8 + dataSz)
    val b = java.nio.ByteBuffer.allocate(8 + riffSz)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def tag(s: String): Unit = b.put(s.getBytes("US-ASCII"))
    tag("RIFF"); b.putInt(riffSz); tag("WAVE")
    tag("fmt "); b.putInt(20)
    b.putShort(0x11) // WAVE_FORMAT_IMA_ADPCM
    b.putShort(1) // mono
    b.putInt(sampleRate)
    b.putInt(sampleRate * blockAlign / spb) // avg bytes/sec (nominal)
    b.putShort(blockAlign.toShort)
    b.putShort(4) // bits per (encoded) sample
    b.putShort(2) // cbSize
    b.putShort(spb.toShort)
    tag("fact"); b.putInt(4); b.putInt(samples.length)
    tag("data"); b.putInt(dataSz)
    var index = 0
    var blk = 0
    while (blk < nBlocks) {
      val base = blk * spb
      def at(i: Int): Int = // pad the tail by repeating the last sample
        samples(math.min(base + i, samples.length - 1)).toInt
      var pred = at(0)
      b.putShort(pred.toShort); b.put(index.toByte); b.put(0.toByte)
      var lowNib = 0 // pending low nibble of the byte under construction
      var i = 1
      while (i < spb) {
        val step = imaStepTable(index)
        var diff = at(i) - pred
        var nib = 0
        if (diff < 0) { nib = 8; diff = -diff }
        if (diff >= step) { nib |= 4; diff -= step }
        if (diff >= (step >> 1)) { nib |= 2; diff -= step >> 1 }
        if (diff >= (step >> 2)) nib |= 1
        val (p2, i2) = imaStep(pred, index, nib) // decoder-lockstep update
        pred = p2; index = i2
        if ((i & 1) == 1) lowNib = nib // low nibble first
        else b.put((lowNib | (nib << 4)).toByte)
        i += 1
      }
      // spb−1 is even, so nibbles always pair up exactly — no flush needed
      blk += 1
    }
    b.array()
  }

  /** REAL IMA-ADPCM decode: RIFF/WAVE payloads whose fmt chunk carries
    * format tag 0x11, MONO OR STEREO. The block walk mirrors
    * [[imaAdpcmWavBytes]]/[[imaAdpcmWavStereoBytes]]: per-channel 4-byte
    * headers (predictor verbatim, step index), then — the stereo layout
    * every fmt-0x11 codec shares — data in 4-BYTE CHANNEL CHUNKS
    * (8 nibbles of L, 8 of R, alternating), nibbles low-first through
    * [[imaStep]]. Output interleaves channels frame by frame, trimmed to
    * the `fact` chunk's per-channel sample count. Returns None for
    * anything else (other codecs → the perceptual-codec stub, the honest
    * floor: mp3/ogg have no integer-exact zero-dep decode).
    */
  def decodeImaAdpcmPcm(bytes: Array[Byte]): Option[Array[Short]] =
    try {
      def u8(i: Int): Int = bytes(i) & 0xff
      def le16(i: Int): Int = u8(i) | (u8(i + 1) << 8)
      def le32(i: Int): Int =
        u8(i) | (u8(i + 1) << 8) | (u8(i + 2) << 16) | (u8(i + 3) << 24)
      def tag(i: Int): String = new String(bytes, i, 4, "US-ASCII")
      if (bytes.length < 12 || tag(0) != "RIFF" || tag(8) != "WAVE")
        return None
      var fmtTag = -1
      var channels = -1
      var blockAlign = -1
      var factSamples = -1
      var dataOff = -1
      var dataLen = -1
      var i = 12
      while (i + 8 <= bytes.length) {
        val ck = tag(i)
        val sz = le32(i + 4)
        // untrusted size: negative would zero/negate the step and hang
        if (sz < 0) return None
        if (ck == "fmt " && sz >= 16) {
          fmtTag = le16(i + 8)
          channels = le16(i + 10)
          blockAlign = le16(i + 20)
        } else if (ck == "fact" && sz >= 4) {
          factSamples = le32(i + 8)
        } else if (ck == "data") {
          dataOff = i + 8
          dataLen = math.min(sz, bytes.length - dataOff)
        }
        i += 8 + sz + (sz & 1)
      }
      if (fmtTag != 0x11 || channels < 1 || channels > 2 ||
        blockAlign < 8 * channels || blockAlign % (4 * channels) != 0 ||
        dataOff < 0 || dataLen < 4 * channels) return None
      val spb = (blockAlign / channels - 4) * 2 + 1 // per channel
      val out = new scala.collection.mutable.ArrayBuffer[Short](
        math.max(16, dataLen / blockAlign * spb * channels))
      val pred = new Array[Int](channels)
      val index = new Array[Int](channels)
      val chan = Array.fill(channels)(new Array[Short](spb))
      var off = dataOff
      val end = dataOff + dataLen
      while (off + 4 * channels <= end) {
        val blockEnd = math.min(off + blockAlign, end)
        var ch = 0
        while (ch < channels) {
          pred(ch) = le16(off + 4 * ch).toShort.toInt // int16 predictor
          index(ch) = math.max(0, math.min(88, u8(off + 4 * ch + 2)))
          chan(ch)(0) = pred(ch).toShort
          ch += 1
        }
        // data walks in 4-byte chunks, channel round-robin; n(ch) tracks
        // how many samples each channel has produced so far
        val n = Array.fill(channels)(1)
        var p = off + 4 * channels
        var chunkCh = 0
        while (p + 4 <= blockEnd) {
          var b = 0
          while (b < 4) {
            val byte = u8(p + b)
            var half = 0
            while (half < 2) {
              val nib = if (half == 0) byte & 0x0f else (byte >> 4) & 0x0f
              val (p2, i2) = imaStep(pred(chunkCh), index(chunkCh), nib)
              pred(chunkCh) = p2; index(chunkCh) = i2
              if (n(chunkCh) < spb) {
                chan(chunkCh)(n(chunkCh)) = p2.toShort
                n(chunkCh) += 1
              }
              half += 1
            }
            b += 1
          }
          p += 4
          chunkCh = (chunkCh + 1) % channels
        }
        // interleave the channels frame by frame
        val frames = n.min
        var f = 0
        while (f < frames) {
          ch = 0
          while (ch < channels) { out += chan(ch)(f); ch += 1 }
          f += 1
        }
        off += blockAlign
      }
      val pcm =
        if (factSamples >= 0 && factSamples * channels <= out.length)
          out.take(factSamples * channels) else out
      Some(pcm.toArray)
    } catch { case scala.util.control.NonFatal(_) => None }

  /** REAL stereo IMA-ADPCM encoder — [[imaAdpcmWavBytes]]'s two-channel
    * sibling: per-block L/R 4-byte headers, then 4-byte channel chunks
    * alternating L, R (8 nibbles each), the layout [[decodeImaAdpcmPcm]]
    * demuxes. `fact` records the TRUE per-channel sample count; the final
    * partial block pads by repeating each channel's last sample.
    */
  def imaAdpcmWavStereoBytes(left: Array[Short], right: Array[Short],
      sampleRate: Int, blockAlign: Int = 256): Array[Byte] = {
    require(left.length == right.length && left.nonEmpty,
      "imaAdpcmWavStereoBytes: equal-length non-empty channels")
    require(blockAlign >= 16 && blockAlign % 8 == 0,
      "blockAlign: ≥16, mult of 8")
    val chans = Array(left, right)
    val spb = (blockAlign / 2 - 4) * 2 + 1 // per channel
    val nBlocks = (left.length + spb - 1) / spb
    val dataSz = nBlocks * blockAlign
    val riffSz = 4 + (8 + 20) + (8 + 4) + (8 + dataSz)
    val b = java.nio.ByteBuffer.allocate(8 + riffSz)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def tag(s: String): Unit = b.put(s.getBytes("US-ASCII"))
    tag("RIFF"); b.putInt(riffSz); tag("WAVE")
    tag("fmt "); b.putInt(20)
    b.putShort(0x11); b.putShort(2)
    b.putInt(sampleRate)
    b.putInt(sampleRate * blockAlign / spb)
    b.putShort(blockAlign.toShort)
    b.putShort(4); b.putShort(2); b.putShort(spb.toShort)
    tag("fact"); b.putInt(4); b.putInt(left.length)
    tag("data"); b.putInt(dataSz)
    val index = new Array[Int](2)
    var blk = 0
    while (blk < nBlocks) {
      val base = blk * spb
      def at(ch: Int, i: Int): Int =
        chans(ch)(math.min(base + i, chans(ch).length - 1)).toInt
      val pred = new Array[Int](2)
      var ch = 0
      while (ch < 2) {
        pred(ch) = at(ch, 0)
        b.putShort(pred(ch).toShort); b.put(index(ch).toByte); b.put(0.toByte)
        ch += 1
      }
      // nibble groups: 8 samples of one channel per 4-byte chunk,
      // channels alternating — i indexes the channel's OWN sample stream
      var group = 0
      val groups = (spb - 1) / 8 // (blockAlign/2 − 4)·2 ≡ 0 (mod 8)
      while (group < groups) {
        ch = 0
        while (ch < 2) {
          var packed = 0L
          var gi = 0
          while (gi < 8) {
            val i = 1 + group * 8 + gi
            val step = imaStepTable(index(ch))
            var diff = at(ch, i) - pred(ch)
            var nib = 0
            if (diff < 0) { nib = 8; diff = -diff }
            if (diff >= step) { nib |= 4; diff -= step }
            if (diff >= (step >> 1)) { nib |= 2; diff -= step >> 1 }
            if (diff >= (step >> 2)) nib |= 1
            val (p2, i2) = imaStep(pred(ch), index(ch), nib)
            pred(ch) = p2; index(ch) = i2
            packed |= (nib.toLong & 0xf) << (4 * gi) // low nibble first
            gi += 1
          }
          b.putInt(packed.toInt)
          ch += 1
        }
        group += 1
      }
      blk += 1
    }
    b.array()
  }

  /** Waveform bytes (MSB per sample — [[decodeAudio]]'s convention) of an
    * IMA-ADPCM WAV payload, for the generic feature math downstream.
    */
  private[ext] def decodeImaAdpcmWav(bytes: Array[Byte]): Option[Array[Byte]] =
    decodeImaAdpcmPcm(bytes).map(_.map(s => ((s >> 8) & 0xff).toByte))

  // -------------------------------------------- G.711 (WAV fmt 6 / 7)

  /** CCITT G.711 µ-law code byte → 16-bit linear sample. The canonical
    * expansion every telephony codec shares (ITU-T G.711 Table 2a):
    * complement the byte, rebuild the biased-mantissa magnitude
    * `((m<<3)+0x84)<<e`, strip the bias. Pure integer shifts/adds —
    * bit-identical in any engine with 64-bit integer ops, which is what
    * makes q241's DuckDB twin possible.
    */
  def ulawToLinear(code: Int): Int = {
    val u = ~code & 0xff
    val t = (((u & 0x0f) << 3) + 0x84) << ((u >> 4) & 7)
    if ((u & 0x80) != 0) 0x84 - t else t - 0x84
  }

  /** G.711 µ-law compression — [[ulawToLinear]]'s inverse on the code
    * domain (MultimodalSpec pins `encode(decode(c)) == c` for all codes
    * except 0x7F, µ-law's negative-zero alias of 0xFF).
    */
  def linearToUlaw(sample: Int): Int = {
    var s = sample
    val sign = if (s < 0) { s = -s; 0x80 } else 0
    if (s > 32635) s = 32635
    s += 0x84
    var exp = 7
    var mask = 0x4000
    while (exp > 0 && (s & mask) == 0) { exp -= 1; mask >>= 1 }
    ~(sign | (exp << 4) | ((s >> (exp + 3)) & 0x0f)) & 0xff
  }

  /** CCITT G.711 A-law code byte → 16-bit linear sample (ITU-T G.711
    * Table 1a): XOR the 0x55 toggle pattern, rebuild the segment
    * magnitude — `(m<<4)+8` in segment 0, `((m<<4)+0x108)<<(seg-1)`
    * above (segment 1 is the shift-0 case of the same form). Sign bit
    * SET means positive in A-law (the opposite of µ-law). Pure integer.
    */
  def alawToLinear(code: Int): Int = {
    val a = (code ^ 0x55) & 0xff
    val seg = (a >> 4) & 7
    val m = a & 0x0f
    val t = if (seg == 0) (m << 4) + 8 else ((m << 4) + 0x108) << (seg - 1)
    if ((a & 0x80) != 0) t else -t
  }

  /** G.711 A-law compression — exact inverse of [[alawToLinear]] on the
    * full code domain (A-law has no ±0 collision: its smallest magnitude
    * is 8, so MultimodalSpec pins all 256 codes round-trip).
    */
  def linearToAlaw(sample: Int): Int = {
    var s = sample
    val sign = if (s >= 0) 0x80 else { s = -s; 0 }
    if (s > 0x7fff) s = 0x7fff
    val msb = 31 - Integer.numberOfLeadingZeros(s | 1)
    val seg = if (msb < 8) 0 else msb - 7
    val m = if (seg == 0) s >> 4 else (s >> (seg + 3)) & 0x0f
    ((sign | (seg << 4) | m) ^ 0x55) & 0xff
  }

  /** RIFF/WAVE mux for a G.711 code stream: fmt tag 6 (A-law) or 7
    * (µ-law), 8 bits per sample, mono, a `fact` chunk with the true
    * sample count, data padded to even length — the layout
    * [[decodeG711Pcm]] demuxes and any telephony WAV reader accepts.
    */
  def g711WavBytes(codes: Array[Byte], sampleRate: Int,
      aLaw: Boolean): Array[Byte] = {
    require(codes.nonEmpty, "g711WavBytes: empty signal")
    val dataSz = codes.length + (codes.length & 1)
    val riffSz = 4 + (8 + 18) + (8 + 4) + (8 + dataSz)
    val b = java.nio.ByteBuffer.allocate(8 + riffSz)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def tag(s: String): Unit = b.put(s.getBytes("US-ASCII"))
    tag("RIFF"); b.putInt(riffSz); tag("WAVE")
    tag("fmt "); b.putInt(18)
    b.putShort(if (aLaw) 6 else 7); b.putShort(1)
    b.putInt(sampleRate); b.putInt(sampleRate) // byteRate = rate × 1 × 1
    b.putShort(1); b.putShort(8); b.putShort(0) // align, bits, cbSize
    tag("fact"); b.putInt(4); b.putInt(codes.length)
    tag("data"); b.putInt(codes.length)
    b.put(codes)
    if ((codes.length & 1) == 1) b.put(0.toByte)
    b.array()
  }

  /** REAL G.711 decode: RIFF/WAVE payloads whose fmt chunk carries format
    * tag 6 (A-law) or 7 (µ-law), any channel count (the expansion is
    * samplewise, so interleaving passes through). One table-free integer
    * expansion per byte; `fact` counts per-channel frames and trims
    * trailing pad bytes at frames × channels. The chunk walk
    * shares the guarded-size discipline (sz < 0 → None) of the ADPCM/AVI
    * walkers.
    */
  def decodeG711Pcm(bytes: Array[Byte]): Option[Array[Short]] =
    try {
      def u8(i: Int): Int = bytes(i) & 0xff
      def le16(i: Int): Int = u8(i) | (u8(i + 1) << 8)
      def le32(i: Int): Int =
        u8(i) | (u8(i + 1) << 8) | (u8(i + 2) << 16) | (u8(i + 3) << 24)
      def tag(i: Int): String = new String(bytes, i, 4, "US-ASCII")
      if (bytes.length < 12 || tag(0) != "RIFF" || tag(8) != "WAVE")
        return None
      var fmtTag = -1
      var channels = -1
      var bits = -1
      var factSamples = -1L
      var dataOff = -1
      var dataLen = -1
      var i = 12
      while (i + 8 <= bytes.length) {
        val ck = tag(i)
        val sz = le32(i + 4)
        if (sz < 0) return None // untrusted size: would stall the walk
        if (ck == "fmt " && sz >= 16) {
          fmtTag = le16(i + 8)
          channels = le16(i + 10)
          bits = le16(i + 22)
        } else if (ck == "fact" && sz >= 4) {
          factSamples = le32(i + 8).toLong
        } else if (ck == "data") {
          dataOff = i + 8; dataLen = sz
        }
        i += 8 + sz + (sz & 1)
      }
      if ((fmtTag != 6 && fmtTag != 7) || bits != 8 || channels < 1 ||
        dataOff < 0)
        return None
      val n0 = math.min(dataLen, bytes.length - dataOff)
      // `fact` counts PER-CHANNEL frames (stereo-ADPCM precedent): trim to
      // frames * channels so multi-channel inputs keep every channel.
      val n = if (factSamples >= 0)
        math.min(n0.toLong, factSamples * channels).toInt
      else n0
      val out = new Array[Short](n)
      var j = 0
      if (fmtTag == 7) {
        while (j < n) { out(j) = ulawToLinear(u8(dataOff + j)).toShort; j += 1 }
      } else {
        while (j < n) { out(j) = alawToLinear(u8(dataOff + j)).toShort; j += 1 }
      }
      Some(out)
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Waveform bytes (MSB per sample — [[decodeAudio]]'s convention) of a
    * G.711 µ-law/A-law WAV payload. Must run BEFORE [[decodeAudio]] in
    * the dispatch: javax.sound hands fmt-6/7 WAVs back as raw UNDECODED
    * code bytes, not linear PCM.
    */
  private[ext] def decodeG711Wav(bytes: Array[Byte]): Option[Array[Byte]] =
    decodeG711Pcm(bytes).map(_.map(s => ((s >> 8) & 0xff).toByte))

  /** Header-only (sampleRate, samples) of a fmt-6/7 G.711 WAV — the
    * [[imaAdpcmMeta]] discipline one codec over: rate from `fmt `, count
    * from `fact` (falling back to the data length — one byte per sample).
    */
  private[ext] def g711Meta(bytes: Array[Byte]): Option[(Int, Long)] =
    try {
      def u8(i: Int): Int = bytes(i) & 0xff
      def le16(i: Int): Int = u8(i) | (u8(i + 1) << 8)
      def le32(i: Int): Int =
        u8(i) | (u8(i + 1) << 8) | (u8(i + 2) << 16) | (u8(i + 3) << 24)
      def tag(i: Int): String = new String(bytes, i, 4, "US-ASCII")
      if (bytes.length < 12 || tag(0) != "RIFF" || tag(8) != "WAVE")
        return None
      var fmtTag = -1
      var channels = -1
      var rate = -1
      var factSamples = -1L
      var dataLen = -1
      var i = 12
      while (i + 8 <= bytes.length) {
        val ck = tag(i)
        val sz = le32(i + 4)
        if (sz < 0) return None
        if (ck == "fmt " && sz >= 16) {
          fmtTag = le16(i + 8)
          channels = le16(i + 10)
          rate = le32(i + 12)
        } else if (ck == "fact" && sz >= 4) {
          factSamples = le32(i + 8).toLong
        } else if (ck == "data") {
          dataLen = sz
        }
        i += 8 + sz + (sz & 1)
      }
      if ((fmtTag != 6 && fmtTag != 7) || channels < 1 || rate <= 0)
        return None
      val frames =
        if (factSamples >= 0) factSamples
        else if (dataLen >= 0) dataLen.toLong / channels
        else return None
      Some((rate, frames))
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Waveform bytes (MSB per sample) of a FLAC payload via the in-house
    * subset decoder ([[Flac.decodeFlac]] — real lossless Rice/LPC integer
    * decode, zero dependencies).
    */
  private[ext] def decodeFlacWav(bytes: Array[Byte]): Option[Array[Byte]] =
    Flac.decodeFlac(bytes).map { a =>
      val shift = math.max(0, a.bps - 8)
      a.samples.map(s => ((s >> shift) & 0xff).toByte)
    }

  /** Sample rate and frame count, when the payload is decodable audio.
    * IMA-ADPCM payloads answer from a PURE HEADER PARSE (fmt sample rate
    * + `fact` per-channel frame count — the headerMeta discipline: ≤ a
    * few hundred bytes read, no decode); everything else goes through
    * javax.sound's format probe.
    */
  def audioMeta(bytes: Array[Byte]): Option[(Int, Long)] =
    Flac.flacMeta(bytes).map { case (rate, _, _, total) => (rate, total) }
      .orElse(imaAdpcmMeta(bytes)).orElse(g711Meta(bytes)).orElse(
      try {
        val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(bytes))
        try Some((in.getFormat.getSampleRate.toInt, in.getFrameLength))
        finally in.close()
      } catch { case scala.util.control.NonFatal(_) => None })

  /** Header-only (sampleRate, frames-per-channel) of a fmt-0x11 WAV:
    * the metadata pass never touches the data chunk. Falls back to the
    * block arithmetic when no `fact` chunk exists.
    */
  private[ext] def imaAdpcmMeta(bytes: Array[Byte]): Option[(Int, Long)] =
    try {
      def u8(i: Int): Int = bytes(i) & 0xff
      def le16(i: Int): Int = u8(i) | (u8(i + 1) << 8)
      def le32(i: Int): Int =
        u8(i) | (u8(i + 1) << 8) | (u8(i + 2) << 16) | (u8(i + 3) << 24)
      def tag(i: Int): String = new String(bytes, i, 4, "US-ASCII")
      if (bytes.length < 12 || tag(0) != "RIFF" || tag(8) != "WAVE")
        return None
      var fmtTag = -1
      var channels = -1
      var rate = -1
      var blockAlign = -1
      var factSamples = -1L
      var dataLen = -1
      var i = 12
      while (i + 8 <= bytes.length) {
        val ck = tag(i)
        val sz = le32(i + 4)
        // untrusted size: negative would zero/negate the step and hang
        if (sz < 0) return None
        if (ck == "fmt " && sz >= 16) {
          fmtTag = le16(i + 8)
          channels = le16(i + 10)
          rate = le32(i + 12)
          blockAlign = le16(i + 20)
        } else if (ck == "fact" && sz >= 4) {
          factSamples = le32(i + 8).toLong
        } else if (ck == "data") {
          dataLen = sz
        }
        i += 8 + sz + (sz & 1)
      }
      if (fmtTag != 0x11 || channels < 1 || rate <= 0 || blockAlign <= 0)
        return None
      val frames =
        if (factSamples >= 0) factSamples
        else { // no fact chunk: full blocks' arithmetic
          val spb = (blockAlign / channels - 4) * 2 + 1
          (dataLen.toLong / blockAlign) * spb
        }
      Some((rate, frames))
    } catch { case scala.util.control.NonFatal(_) => None }

  /** PURE HEADER PARSE — no codec, no decode: container format and pixel
    * dimensions straight from the first bytes of the payload. This is the
    * 100-TB metadata pass: a petabyte image lake gets (format, w, h) from
    * reading ≤ a few hundred bytes per object, never rasterizing.
    *
    *  - PNG: 8-byte signature, then the IHDR chunk's big-endian w/h
    *    (bytes 16-23 — IHDR is required to be first by the spec)
    *  - JPEG: marker scan from SOI to the first SOFn frame header
    *    (C0-CF minus C4/C8/CC), big-endian height then width
    *  - GIF: 6-byte version tag, little-endian logical-screen w/h
    *  - BMP: "BM" + BITMAPINFOHEADER little-endian w/h at offsets 18/22
    *  - MP4/ISO-BMFF: `ftyp` at offset 4 → [[Mp4.meta]]'s guarded box
    *    walk, video-track presentation dimensions
    *
    * Returns None for anything else (or truncated headers).
    */
  def headerMeta(bytes: Array[Byte]): Option[(String, Int, Int)] = {
    def u8(i: Int): Int = bytes(i) & 0xff
    def be32(i: Int): Int = (u8(i) << 24) | (u8(i + 1) << 16) | (u8(i + 2) << 8) | u8(i + 3)
    def be16(i: Int): Int = (u8(i) << 8) | u8(i + 1)
    def le16(i: Int): Int = u8(i) | (u8(i + 1) << 8)
    def le32(i: Int): Int = u8(i) | (u8(i + 1) << 8) | (u8(i + 2) << 16) | (u8(i + 3) << 24)
    if (bytes.length >= 24 && u8(0) == 0x89 && u8(1) == 'P' && u8(2) == 'N' &&
        u8(3) == 'G' && u8(4) == 0x0d && u8(5) == 0x0a && u8(6) == 0x1a &&
        u8(7) == 0x0a)
      Some(("png", be32(16), be32(20)))
    else if (bytes.length >= 4 && u8(0) == 0xff && u8(1) == 0xd8) {
      // marker scan: FF marker len(2) payload…; SOFn payload is
      // precision(1) height(2) width(2)
      var i = 2
      var res: Option[(String, Int, Int)] = None
      while (res.isEmpty && i + 3 < bytes.length) {
        if (u8(i) != 0xff) return None // desynced — not a JPEG stream
        val marker = u8(i + 1)
        if (marker == 0xff) i += 1 // fill bytes before a marker are legal
        else if (marker == 0x01 || (marker >= 0xd0 && marker <= 0xd8)) i += 2
        else if (marker >= 0xc0 && marker <= 0xcf && marker != 0xc4 &&
            marker != 0xc8 && marker != 0xcc) {
          if (i + 8 < bytes.length) res = Some(("jpeg", be16(i + 7), be16(i + 5)))
          else return None
        } else {
          if (i + 3 >= bytes.length) return None
          i += 2 + be16(i + 2)
        }
      }
      res
    } else if (bytes.length >= 10 && u8(0) == 'G' && u8(1) == 'I' &&
        u8(2) == 'F' && u8(3) == '8' && (u8(4) == '7' || u8(4) == '9') &&
        u8(5) == 'a')
      Some(("gif", le16(6), le16(8)))
    else if (bytes.length >= 26 && u8(0) == 'B' && u8(1) == 'M')
      Some(("bmp", le32(18), le32(22)))
    else if (bytes.length >= 12 && u8(4) == 'f' && u8(5) == 't' &&
        u8(6) == 'y' && u8(7) == 'p')
      Mp4.meta(bytes).flatMap(m =>
        m.video.map(v => ("mp4", v.width, v.height)))
    else None
  }

  /** Minimal valid-prefix PNG bytes (signature + IHDR) for the given
    * dimensions — deterministic pure data, used by the q169 round-trip
    * oracle and specs. (CRC left zero: headerMeta reads structure only.)
    */
  def pngHeaderBytes(w: Int, h: Int): Array[Byte] = {
    val b = java.nio.ByteBuffer.allocate(33)
    b.put(Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte))
    b.putInt(13).put("IHDR".getBytes("US-ASCII"))
    b.putInt(w).putInt(h)
    b.put(8.toByte).put(2.toByte).put(0.toByte).put(0.toByte).put(0.toByte)
    b.putInt(0) // CRC placeholder
    b.array()
  }

  /** Minimal JPEG prefix (SOI + APP0/JFIF + SOF0) for the given
    * dimensions — deterministic pure data for the q169 round-trip oracle.
    */
  def jpegHeaderBytes(w: Int, h: Int): Array[Byte] = {
    val b = java.nio.ByteBuffer.allocate(4 + 18 + 19)
    b.put(0xff.toByte).put(0xd8.toByte) // SOI
    b.put(0xff.toByte).put(0xe0.toByte).putShort(16.toShort) // APP0 len 16
    b.put("JFIF".getBytes("US-ASCII")).put(0.toByte)
    b.put(1.toByte).put(1.toByte).put(0.toByte)
    b.putShort(1.toShort).putShort(1.toShort).put(0.toByte).put(0.toByte)
    b.put(0xff.toByte).put(0xc0.toByte).putShort(17.toShort) // SOF0 len 17
    b.put(8.toByte).putShort(h.toShort).putShort(w.toShort)
    b.put(3.toByte) // 3 components, descriptors zeroed
    b.put(new Array[Byte](9))
    b.array()
  }

  /** Minimal GIF89a prefix for the given dimensions (round-trip oracle). */
  def gifHeaderBytes(w: Int, h: Int): Array[Byte] = {
    val b = java.nio.ByteBuffer.allocate(13).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put("GIF89a".getBytes("US-ASCII"))
    b.putShort(w.toShort).putShort(h.toShort)
    b.put(0.toByte).put(0.toByte).put(0.toByte)
    b.array()
  }

  /** Decoded pixel dimensions, when the payload is a decodable image. */
  def imageDims(bytes: Array[Byte]): Option[(Int, Int)] =
    try {
      javax.imageio.ImageIO.setUseCache(false)
      Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes)))
        .map(i => (i.getWidth, i.getHeight))
    } catch { case scala.util.control.NonFatal(_) => None }

  /** 64-bit average-hash (aHash) of a decodable image — the classic
    * perceptual fingerprint for image near-dup dedup: decode (real JDK
    * codec), box-average the BT.601 integer luminance plane down to 8×8
    * (floor divisions only — no Graphics2D resampling, so the value is a
    * DETERMINISTIC integer function of the pixels, reproducible by an
    * oracle that predicts it analytically for generated images — q189),
    * then bit (y·8+x) = 1 iff cell > floor-mean of the 64 cells. Flat
    * images hash to 0 (nothing exceeds the mean) — the canonical aHash
    * collision class. Hamming distance on the result plugs into the
    * simhash bucketing machinery for corpus-scale candidate joins.
    */
  def aHash64(bytes: Array[Byte]): Option[Long] =
    try {
      javax.imageio.ImageIO.setUseCache(false)
      Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes)))
        .map { img =>
          val (w, h) = (img.getWidth, img.getHeight)
          val cells = new Array[Long](64)
          var cy = 0
          while (cy < 8) {
            val y0 = cy * h / 8; val y1 = math.max((cy + 1) * h / 8, y0 + 1)
            var cx = 0
            while (cx < 8) {
              val x0 = cx * w / 8; val x1 = math.max((cx + 1) * w / 8, x0 + 1)
              var sum = 0L; var y = y0
              while (y < h && y < y1) {
                var x = x0
                while (x < w && x < x1) {
                  val rgb = img.getRGB(x, y)
                  sum += (((rgb >> 16) & 0xff) * 299 + ((rgb >> 8) & 0xff) * 587 +
                    (rgb & 0xff) * 114) / 1000
                  x += 1
                }
                y += 1
              }
              val area = (math.min(y1, h) - y0).toLong *
                (math.min(x1, w) - x0).toLong
              cells(cy * 8 + cx) = if (area <= 0) 0L else sum / area
              cx += 1
            }
            cy += 1
          }
          val mean = cells.sum / 64
          cells.zipWithIndex.foldLeft(0L) { case (acc, (c, i)) =>
            if (c > mean) acc | (1L << i) else acc
          }
        }
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Deterministic test image: a w×h PNG whose left `whiteCols` pixel
    * columns are white and the rest black — losslessly encoded, so the
    * decode→aHash value is analytically predictable.
    */
  def syntheticPng(w: Int, h: Int, whiteCols: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        img.setRGB(x, y, if (x < whiteCols) 0xffffff else 0x000000)
        x += 1
      }
      y += 1
    }
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.setUseCache(false)
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  /** Frame sampling stub for video: every `stride`-th 256-byte block stands
    * in for a frame.
    */
  private def sampleFrames(decoded: Array[Byte], stride: Int): Int =
    if (decoded.isEmpty) 0 else 1 + (decoded.length - 1) / (256 * stride)

  /** Batched per-partition feature extraction (byte histogram + entropy —
    * the stand-in for embeddings/spectrograms).
    */
  def extractFeatures(
      media: Dataset[MediaRow],
      batchSize: Int = 64,
      frameStride: Int = 4
  ): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        // batch boundary = where a real codec would init once per batch
        batch.iterator.map { row =>
          val decoded = decode(row.bytes, row.kind)
          val hist = new Array[Long](16)
          var i = 0
          while (i < decoded.length) {
            hist((decoded(i) & 0xff) >> 4) += 1
            i += 1
          }
          val n = decoded.length.toDouble.max(1.0)
          val entropy = -hist.map(_ / n).filter(_ > 0)
            .map(p => p * math.log(p) / math.log(2)).sum
          MediaFeatures(row.media_id, row.kind, decoded.length.toLong,
            math.rint(entropy * 10000) / 10000,
            hist, sampleFrames(decoded, frameStride))
        }
      }
    }
  }

  /** "Resize" stub: metadata-only transform (a real resize would re-encode
    * bytes); keeps the contract that meta describes the payload.
    */
  def resize(df: DataFrame, width: Int, height: Int): DataFrame =
    df.withColumn("meta",
      struct(lit(width).as("width"), lit(height).as("height"),
        col("meta.sample_rate").as("sample_rate"),
        col("meta.duration_ms").as("duration_ms"),
        col("meta.codec").as("codec")))

  /** Deterministic synthetic media table (for tests/demos): payload bytes
    * derived from the id, kind round-robin image/audio/video.
    */
  def synthetic(spark: SparkSession, n: Long, seed: Long = 42L): Dataset[MediaRow] = {
    import spark.implicits._
    spark.range(n).map { id =>
      val kind = (id % 3) match {
        case 0 => "image"; case 1 => "audio"; case _ => "video"
      }
      val rng = new scala.util.Random(seed + id)
      val bytes = Array.fill((256 + (id % 512)).toInt)(rng.nextInt(256).toByte)
      val meta = kind match {
        case "image" => MediaMeta(Some(64), Some(64), None, None, Some("fake-png"))
        case "audio" => MediaMeta(None, None, Some(16000), Some(1000L), Some("fake-wav"))
        case _ => MediaMeta(Some(64), Some(64), None, Some(2000L), Some("fake-mp4"))
      }
      MediaRow(id, kind, bytes, meta)
    }
  }
}
