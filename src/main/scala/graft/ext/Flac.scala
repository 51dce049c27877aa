package graft.ext

/** Subset FLAC codec — REAL lossless audio decode with zero dependencies.
  *
  * FLAC is a pure-integer lossless format (Rice-coded integer predictor
  * residuals — no libm, no floating point anywhere), which makes a subset
  * decoder exactly oracle-able the way IMA-ADPCM was (q235): synthesize a
  * known PCM signal, encode driver-side with [[encodeFlac]], decode with
  * [[decodeFlac]], and a DuckDB twin replays the signal in closed form —
  * any drift in the container walk, frame headers, CRCs, subframe coding,
  * Rice decode, predictor reconstruction, or stereo decorrelation breaks
  * the hash (q240).
  *
  * Scope (the documented subset): STREAMINFO parsing (other metadata
  * blocks skipped), frames with CONSTANT / VERBATIM / FIXED (orders 0-4)
  * / LPC subframes, Rice and Rice2 residual methods incl. escape
  * partitions, wasted bits, 1-8 independent channels plus the three
  * stereo decorrelation modes (left/side, right/side, mid/side), and
  * bits-per-sample up to 31 (sample values must fit an Int — the side
  * channel of b-bit stereo needs b+1 bits, so encode caps at 24). CRC-8
  * (frame header) and CRC-16 (whole frame) are verified; any structural
  * or checksum violation returns None.
  *
  * The encoder exists to SYNTHESIZE test/oracle payloads (the
  * [[Multimodal.imaAdpcmWavBytes]] pattern): fixed-blocksize streams,
  * per-frame explicit 16-bit block size, FIXED-order predictors chosen by
  * least |residual|, single-partition Rice residuals, with optional
  * forced-VERBATIM frames and stereo decorrelation modes so the decoder's
  * paths are all exercised by round-trips.
  */
object Flac {

  /** Decoded stream: `samples` interleaved (ch0, ch1, ch0, ch1, ...). */
  final case class FlacAudio(
      sampleRate: Int,
      channels: Int,
      bps: Int,
      totalSamples: Long,
      samples: Array[Int])

  // ------------------------------------------------------------------ CRC

  private val Crc8Table: Array[Int] = {
    val t = new Array[Int](256)
    var i = 0
    while (i < 256) {
      var c = i
      var b = 0
      while (b < 8) {
        c = if ((c & 0x80) != 0) ((c << 1) ^ 0x07) & 0xff else (c << 1) & 0xff
        b += 1
      }
      t(i) = c
      i += 1
    }
    t
  }

  private val Crc16Table: Array[Int] = {
    val t = new Array[Int](256)
    var i = 0
    while (i < 256) {
      var c = i << 8
      var b = 0
      while (b < 8) {
        c = if ((c & 0x8000) != 0) ((c << 1) ^ 0x8005) & 0xffff
            else (c << 1) & 0xffff
        b += 1
      }
      t(i) = c
      i += 1
    }
    t
  }

  private def crc8(bytes: Array[Byte], from: Int, until: Int): Int = {
    var c = 0
    var i = from
    while (i < until) { c = Crc8Table(c ^ (bytes(i) & 0xff)); i += 1 }
    c
  }

  private def crc16(bytes: Array[Byte], from: Int, until: Int): Int = {
    var c = 0
    var i = from
    while (i < until) {
      c = Crc16Table(((c >>> 8) ^ (bytes(i) & 0xff)) & 0xff) ^
        ((c << 8) & 0xffff)
      i += 1
    }
    c & 0xffff
  }

  // --------------------------------------------------------------- bit IO

  private final class BitWriter {
    private val out = new java.io.ByteArrayOutputStream(4096)
    private var cur = 0
    private var nCur = 0
    def writeBit(b: Int): Unit = {
      cur = (cur << 1) | (b & 1)
      nCur += 1
      if (nCur == 8) { out.write(cur); cur = 0; nCur = 0 }
    }
    def writeBits(value: Long, n: Int): Unit = {
      var i = n - 1
      while (i >= 0) { writeBit(((value >>> i) & 1L).toInt); i -= 1 }
    }
    /** q zero bits then a one bit (libFLAC's unary convention). */
    def writeUnary(q: Int): Unit = {
      var i = 0
      while (i < q) { writeBit(0); i += 1 }
      writeBit(1)
    }
    def alignByte(): Unit = while (nCur != 0) writeBit(0)
    /** Whole bytes emitted so far (call only when byte-aligned). */
    def size: Int = out.size()
    def toByteArray: Array[Byte] = out.toByteArray
  }

  private final class BitReader(bytes: Array[Byte]) {
    var pos: Int = 0 // bit position
    def bytePos: Int = pos >>> 3
    def aligned: Boolean = (pos & 7) == 0
    def readBit(): Int = {
      val b = (bytes(pos >>> 3) >> (7 - (pos & 7))) & 1
      pos += 1
      b
    }
    def readBits(n: Int): Long = {
      var v = 0L
      var i = 0
      while (i < n) { v = (v << 1) | readBit(); i += 1 }
      v
    }
    def readSigned(n: Int): Int = {
      val v = readBits(n)
      ((v << (64 - n)) >> (64 - n)).toInt
    }
    def readUnary(): Int = {
      var q = 0
      while (readBit() == 0) q += 1
      q
    }
    def alignByte(): Unit = pos = (pos + 7) & ~7
    def remainingBits: Int = bytes.length * 8 - pos
  }

  // -------------------------------------------------------------- decoder

  /** Full decode of a FLAC stream within the documented subset. Returns
    * None (never throws, never hangs — every read strictly advances the
    * bit cursor and out-of-bounds is caught) on anything structurally
    * invalid, checksum-failing, or outside the subset.
    */
  def decodeFlac(bytes: Array[Byte]): Option[FlacAudio] =
    try {
      if (bytes.length < 42 || bytes(0) != 'f' || bytes(1) != 'L' ||
        bytes(2) != 'a' || bytes(3) != 'C') return None
      var off = 4
      var sampleRate = 0
      var channels = 0
      var bps = 0
      var total = 0L
      var seenInfo = false
      var last = false
      while (!last) {
        if (off + 4 > bytes.length) return None
        val hdr = bytes(off) & 0xff
        last = (hdr & 0x80) != 0
        val btype = hdr & 0x7f
        val len = ((bytes(off + 1) & 0xff) << 16) |
          ((bytes(off + 2) & 0xff) << 8) | (bytes(off + 3) & 0xff)
        if (btype == 0) {
          if (len < 34) return None
          val r = new BitReader(bytes)
          r.pos = (off + 4) * 8
          r.readBits(16) // min block size
          r.readBits(16) // max block size
          r.readBits(24) // min frame size
          r.readBits(24) // max frame size
          sampleRate = r.readBits(20).toInt
          channels = r.readBits(3).toInt + 1
          bps = r.readBits(5).toInt + 1
          total = r.readBits(36)
          seenInfo = true
        }
        off += 4 + len
        if (off > bytes.length) return None
      }
      if (!seenInfo || sampleRate <= 0 || channels < 1 || channels > 8 ||
        bps < 4 || bps > 31) return None
      val outBuf = new scala.collection.mutable.ArrayBuffer[Int](
        math.max(16, math.min(total * channels, 1 << 22).toInt))
      val r = new BitReader(bytes)
      r.pos = off * 8
      while (r.remainingBits >= 16) {
        val frameStart = r.bytePos
        if (r.readBits(14) != 0x3ffe) return None
        if (r.readBit() != 0) return None // reserved
        r.readBit() // blocking strategy
        val bsCode = r.readBits(4).toInt
        val srCode = r.readBits(4).toInt
        val chAsgn = r.readBits(4).toInt
        val ssCode = r.readBits(3).toInt
        if (r.readBit() != 0) return None // reserved
        readUtf8Number(r) // frame/sample number (position not needed)
        val blockSize = bsCode match {
          case 1 => 192
          case c if c >= 2 && c <= 5 => 576 << (c - 2)
          case 6 => r.readBits(8).toInt + 1
          case 7 => r.readBits(16).toInt + 1
          case c if c >= 8 => 256 << (c - 8)
          case _ => return None
        }
        srCode match { // value only needed to advance the cursor
          case 0 => ()
          case c if c >= 1 && c <= 11 => ()
          case 12 => r.readBits(8)
          case 13 | 14 => r.readBits(16)
          case _ => return None
        }
        val frameBps = ssCode match {
          case 0 => bps
          case 1 => 8
          case 2 => 12
          case 4 => 16
          case 5 => 20
          case 6 => 24
          case 7 => 32
          case _ => return None
        }
        if (frameBps > 31) return None
        if (!r.aligned) return None
        val hcrc = r.readBits(8).toInt
        if (crc8(bytes, frameStart, r.bytePos - 1) != hcrc) return None
        val nCh = if (chAsgn <= 7) chAsgn + 1 else 2
        if (chAsgn > 10 || nCh != channels) return None
        val chan = new Array[Array[Int]](nCh)
        var c = 0
        while (c < nCh) {
          // the difference (side) channel carries one extra bit
          val sbps = frameBps + (chAsgn match {
            case 8 if c == 1 => 1
            case 9 if c == 0 => 1
            case 10 if c == 1 => 1
            case _ => 0
          })
          chan(c) = decodeSubframe(r, blockSize, sbps) match {
            case Some(a) => a
            case None => return None
          }
          c += 1
        }
        chAsgn match {
          case 8 => // left/side: right = left − side
            var i = 0
            while (i < blockSize) {
              chan(1)(i) = chan(0)(i) - chan(1)(i); i += 1
            }
          case 9 => // side/right: left = side + right
            var i = 0
            while (i < blockSize) {
              val l = chan(0)(i) + chan(1)(i)
              chan(0)(i) = l
              i += 1
            }
          case 10 => // mid/side
            var i = 0
            while (i < blockSize) {
              val side = chan(1)(i)
              val mid = (chan(0)(i) << 1) | (side & 1)
              chan(0)(i) = (mid + side) >> 1
              chan(1)(i) = (mid - side) >> 1
              i += 1
            }
          case _ => ()
        }
        r.alignByte()
        val fcrc = r.readBits(16).toInt
        if (crc16(bytes, frameStart, r.bytePos - 2) != fcrc) return None
        var i = 0
        while (i < blockSize) {
          var c2 = 0
          while (c2 < nCh) { outBuf += chan(c2)(i); c2 += 1 }
          i += 1
        }
      }
      val totCh = total * channels
      val samples =
        if (total > 0 && totCh < outBuf.length) outBuf.take(totCh.toInt).toArray
        else outBuf.toArray
      Some(FlacAudio(sampleRate, channels, bps,
        if (total > 0) total else (outBuf.length / channels).toLong, samples))
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Header-only (sampleRate, channels, bps, totalSamples) — the metadata
    * pass: STREAMINFO is within the first ~50 bytes, no frame is touched.
    */
  def flacMeta(bytes: Array[Byte]): Option[(Int, Int, Int, Long)] =
    try {
      if (bytes.length < 42 || bytes(0) != 'f' || bytes(1) != 'L' ||
        bytes(2) != 'a' || bytes(3) != 'C') return None
      // STREAMINFO is mandatory-first per spec
      if ((bytes(4) & 0x7f) != 0) return None
      val r = new BitReader(bytes)
      r.pos = 8 * 8
      r.readBits(16); r.readBits(16); r.readBits(24); r.readBits(24)
      val rate = r.readBits(20).toInt
      val ch = r.readBits(3).toInt + 1
      val bps = r.readBits(5).toInt + 1
      val total = r.readBits(36)
      if (rate <= 0) None else Some((rate, ch, bps, total))
    } catch { case scala.util.control.NonFatal(_) => None }

  private def readUtf8Number(r: BitReader): Long = {
    val b0 = r.readBits(8).toInt
    if ((b0 & 0x80) == 0) return b0.toLong
    var nOnes = 0
    var mask = 0x80
    while (mask != 0 && (b0 & mask) != 0) { nOnes += 1; mask >>= 1 }
    if (nOnes < 2 || nOnes > 7)
      throw new IllegalArgumentException("bad utf8 prefix")
    var v = (b0 & (0xff >>> (nOnes + 1))).toLong
    var i = 1
    while (i < nOnes) {
      val b = r.readBits(8).toInt
      if ((b & 0xc0) != 0x80)
        throw new IllegalArgumentException("bad utf8 continuation")
      v = (v << 6) | (b & 0x3f)
      i += 1
    }
    v
  }

  private def decodeSubframe(
      r: BitReader, n: Int, bps: Int): Option[Array[Int]] = {
    if (r.readBit() != 0) return None // padding bit
    val t = r.readBits(6).toInt
    val wasted =
      if (r.readBit() == 1) r.readUnary() + 1 else 0
    val ebps = bps - wasted
    if (ebps <= 0) return None
    val out = new Array[Int](n)
    if (t == 0) { // CONSTANT
      java.util.Arrays.fill(out, r.readSigned(ebps))
    } else if (t == 1) { // VERBATIM
      var i = 0
      while (i < n) { out(i) = r.readSigned(ebps); i += 1 }
    } else if (t >= 8 && t <= 12) { // FIXED order 0-4
      val order = t - 8
      if (order > n) return None
      var i = 0
      while (i < order) { out(i) = r.readSigned(ebps); i += 1 }
      val res = new Array[Int](n - order)
      if (!readResidual(r, n, order, res)) return None
      restoreFixed(out, order, res)
    } else if (t >= 32) { // LPC order t-31
      val order = t - 31
      if (order > n) return None
      var i = 0
      while (i < order) { out(i) = r.readSigned(ebps); i += 1 }
      val precision = r.readBits(4).toInt + 1
      if (precision == 16) return None // 0b1111 is invalid per spec
      val shift = r.readSigned(5)
      if (shift < 0) return None
      val coefs = new Array[Int](order)
      i = 0
      while (i < order) { coefs(i) = r.readSigned(precision); i += 1 }
      val res = new Array[Int](n - order)
      if (!readResidual(r, n, order, res)) return None
      i = order
      while (i < n) {
        var acc = 0L
        var j = 0
        while (j < order) { acc += coefs(j).toLong * out(i - 1 - j); j += 1 }
        out(i) = res(i - order) + (acc >> shift).toInt
        i += 1
      }
    } else return None
    if (wasted > 0) {
      var i = 0
      while (i < n) { out(i) = out(i) << wasted; i += 1 }
    }
    Some(out)
  }

  private def readResidual(
      r: BitReader, blockSize: Int, order: Int, out: Array[Int]): Boolean = {
    val method = r.readBits(2).toInt
    if (method > 1) return false
    val pBits = if (method == 0) 4 else 5
    val escape = if (method == 0) 0xf else 0x1f
    val partOrder = r.readBits(4).toInt
    val nParts = 1 << partOrder
    if (blockSize % nParts != 0) return false
    val partLen = blockSize >> partOrder
    var idx = 0
    var p = 0
    while (p < nParts) {
      val cnt = if (p == 0) partLen - order else partLen
      if (cnt < 0) return false
      val param = r.readBits(pBits).toInt
      if (param == escape) {
        val raw = r.readBits(5).toInt
        var i = 0
        while (i < cnt) {
          out(idx) = if (raw == 0) 0 else r.readSigned(raw)
          idx += 1
          i += 1
        }
      } else {
        var i = 0
        while (i < cnt) {
          val q = r.readUnary()
          val low = if (param == 0) 0L else r.readBits(param)
          val uval = (q.toLong << param) | low
          out(idx) = ((uval >>> 1) ^ -(uval & 1L)).toInt
          idx += 1
          i += 1
        }
      }
      p += 1
    }
    idx == out.length
  }

  private def restoreFixed(
      out: Array[Int], order: Int, res: Array[Int]): Unit = {
    var i = order
    order match {
      case 0 =>
        while (i < out.length) { out(i) = res(i); i += 1 }
      case 1 =>
        while (i < out.length) { out(i) = res(i - 1) + out(i - 1); i += 1 }
      case 2 =>
        while (i < out.length) {
          out(i) = res(i - 2) + 2 * out(i - 1) - out(i - 2); i += 1
        }
      case 3 =>
        while (i < out.length) {
          out(i) = res(i - 3) + 3 * out(i - 1) - 3 * out(i - 2) + out(i - 3)
          i += 1
        }
      case _ =>
        while (i < out.length) {
          out(i) = res(i - 4) + 4 * out(i - 1) - 6 * out(i - 2) +
            4 * out(i - 3) - out(i - 4)
          i += 1
        }
    }
  }

  // -------------------------------------------------------------- encoder

  /** Encode interleaved `samples` as a subset FLAC stream. `stereoMode`
    * is the frame channel assignment for 2-channel input: 0 independent,
    * 8 left/side, 9 right/side, 10 mid/side. `verbatimEvery` k > 0 forces
    * every k-th frame's subframes to VERBATIM (decoder-coverage knob).
    */
  def encodeFlac(
      samples: Array[Int],
      sampleRate: Int,
      channels: Int,
      bps: Int = 16,
      blockSize: Int = 256,
      stereoMode: Int = 0,
      verbatimEvery: Int = 0,
      partitionOrder: Int = 0,
      escapeResiduals: Boolean = false
  ): Array[Byte] = {
    require(channels >= 1 && channels <= 8, "channels in 1..8")
    require(channels == 2 || stereoMode == 0, "stereoMode needs 2 channels")
    require(Set(0, 8, 9, 10)(stereoMode), "stereoMode in {0, 8, 9, 10}")
    require(samples.length % channels == 0, "ragged interleave")
    require(samples.nonEmpty, "empty signal")
    require(blockSize >= 16 && blockSize <= 65536, "blockSize in 16..65536")
    require(bps >= 4 && bps <= 24, "bps in 4..24")
    require(sampleRate > 0 && sampleRate < (1 << 20), "sampleRate 20-bit")
    val lim = 1 << (bps - 1)
    require(samples.forall(s => s >= -lim && s < lim), s"samples fit $bps bits")
    val total = samples.length / channels
    val w = new BitWriter
    "fLaC".foreach(ch => w.writeBits(ch.toLong, 8))
    // STREAMINFO, flagged last
    w.writeBits(0x80L, 8)
    w.writeBits(34L, 24)
    w.writeBits(blockSize.toLong, 16)
    w.writeBits(blockSize.toLong, 16)
    w.writeBits(0L, 24) // min frame size unknown
    w.writeBits(0L, 24) // max frame size unknown
    w.writeBits(sampleRate.toLong, 20)
    w.writeBits((channels - 1).toLong, 3)
    w.writeBits((bps - 1).toLong, 5)
    w.writeBits(total.toLong, 36)
    var md5i = 0
    while (md5i < 16) { w.writeBits(0L, 8); md5i += 1 } // md5 unsupplied
    val ssCode = bps match {
      case 8 => 1L
      case 12 => 2L
      case 16 => 4L
      case 20 => 5L
      case 24 => 6L
      case _ => 0L // from STREAMINFO
    }
    val chAsgn = if (channels == 2 && stereoMode != 0) stereoMode
      else channels - 1
    var frameIdx = 0L
    var pos = 0
    while (pos < total) {
      val n = math.min(blockSize, total - pos)
      val frameStart = w.size
      w.writeBits(0x3ffeL, 14)
      w.writeBit(0) // reserved
      w.writeBit(0) // fixed-blocksize strategy (number below = frame index)
      w.writeBits(7L, 4) // block size: explicit 16-bit at header end
      w.writeBits(0L, 4) // sample rate: from STREAMINFO
      w.writeBits(chAsgn.toLong, 4)
      w.writeBits(ssCode, 3)
      w.writeBit(0) // reserved
      writeUtf8Number(w, frameIdx)
      w.writeBits((n - 1).toLong, 16)
      val hdr = w.toByteArray
      w.writeBits(crc8(hdr, frameStart, hdr.length).toLong, 8)
      val forceVerbatim =
        verbatimEvery > 0 && frameIdx % verbatimEvery == verbatimEvery - 1
      var c = 0
      while (c < channels) {
        val ch = new Array[Int](n)
        var j = 0
        while (j < n) {
          val l = samples((pos + j) * channels)
          ch(j) =
            if (channels == 2 && stereoMode != 0) {
              val rt = samples((pos + j) * 2 + 1)
              (stereoMode, c) match {
                case (8, 0) => l
                case (8, 1) => l - rt // side
                case (9, 0) => l - rt // side
                case (9, 1) => rt
                case (10, 0) => (l + rt) >> 1 // mid
                case _ => l - rt // (10, 1) side
              }
            } else samples((pos + j) * channels + c)
          j += 1
        }
        val sbps = bps + (chAsgn match {
          case 8 if c == 1 => 1
          case 9 if c == 0 => 1
          case 10 if c == 1 => 1
          case _ => 0
        })
        encodeSubframe(w, ch, sbps, forceVerbatim, partitionOrder,
          escapeResiduals)
        c += 1
      }
      w.alignByte()
      val all = w.toByteArray
      w.writeBits(crc16(all, frameStart, all.length).toLong, 16)
      pos += n
      frameIdx += 1
    }
    w.toByteArray
  }

  private def maskBits(v: Int, bps: Int): Long = v.toLong & ((1L << bps) - 1)

  private def encodeSubframe(
      w: BitWriter, ch: Array[Int], bps: Int, forceVerbatim: Boolean,
      partitionOrder: Int, escapeResiduals: Boolean): Unit = {
    val n = ch.length
    val allEqual = {
      var i = 1
      var e = true
      while (i < n && e) { e = ch(i) == ch(0); i += 1 }
      e
    }
    if (allEqual && !forceVerbatim) { // CONSTANT
      w.writeBit(0); w.writeBits(0L, 6); w.writeBit(0)
      w.writeBits(maskBits(ch(0), bps), bps)
    } else if (forceVerbatim || n <= 4) { // VERBATIM
      w.writeBit(0); w.writeBits(1L, 6); w.writeBit(0)
      var i = 0
      while (i < n) { w.writeBits(maskBits(ch(i), bps), bps); i += 1 }
    } else { // FIXED, least-|residual| order
      val maxOrder = math.min(4, n - 1)
      var best = 0
      var bestCost = Long.MaxValue
      var o = 0
      while (o <= maxOrder) {
        val res = fixedResiduals(ch, o)
        var s = 0L
        var i = 0
        while (i < res.length) { s += math.abs(res(i).toLong); i += 1 }
        if (s < bestCost) { bestCost = s; best = o }
        o += 1
      }
      val order = best
      val res = fixedResiduals(ch, order)
      w.writeBit(0); w.writeBits((8 + order).toLong, 6); w.writeBit(0)
      var i = 0
      while (i < order) { w.writeBits(maskBits(ch(i), bps), bps); i += 1 }
      // a partition order only divides evenly when 2^p | n and the first
      // partition keeps ≥ 0 residuals after the warmup
      val pOrd =
        if (partitionOrder > 0 && n % (1 << partitionOrder) == 0 &&
          (n >> partitionOrder) >= order) partitionOrder
        else 0
      w.writeBits(0L, 2) // method 0: 4-bit Rice params
      w.writeBits(pOrd.toLong, 4)
      val partLen = n >> pOrd
      var idx = 0
      var p = 0
      while (p < (1 << pOrd)) {
        val cnt = if (p == 0) partLen - order else partLen
        if (escapeResiduals) {
          // escape partition: 0b1111 param, 5-bit raw width, plain
          // two's-complement residuals — the decoder's escape path
          var raw = 1
          var i2 = 0
          while (i2 < cnt) {
            val v = res(idx + i2)
            while (raw < 31 && (v < -(1 << (raw - 1)) ||
              v >= (1 << (raw - 1)))) raw += 1
            i2 += 1
          }
          w.writeBits(0xfL, 4)
          w.writeBits(raw.toLong, 5)
          i2 = 0
          while (i2 < cnt) {
            w.writeBits(res(idx + i2).toLong & ((1L << raw) - 1), raw)
            i2 += 1
          }
        } else {
          var sumU = 0L
          var i2 = 0
          while (i2 < cnt) {
            val v = res(idx + i2)
            sumU += ((v << 1) ^ (v >> 31)).toLong & 0xffffffffL
            i2 += 1
          }
          var k = 0
          while (k < 14 && (cnt.toLong << (k + 1)) < sumU) k += 1
          w.writeBits(k.toLong, 4)
          i2 = 0
          while (i2 < cnt) {
            val v = res(idx + i2)
            val uval = ((v << 1) ^ (v >> 31)).toLong & 0xffffffffL
            w.writeUnary((uval >>> k).toInt)
            if (k > 0) w.writeBits(uval & ((1L << k) - 1), k)
            i2 += 1
          }
        }
        idx += cnt
        p += 1
      }
    }
  }

  private def fixedResiduals(ch: Array[Int], order: Int): Array[Int] = {
    val n = ch.length
    val res = new Array[Int](n - order)
    var i = order
    while (i < n) {
      res(i - order) = order match {
        case 0 => ch(i)
        case 1 => ch(i) - ch(i - 1)
        case 2 => ch(i) - 2 * ch(i - 1) + ch(i - 2)
        case 3 => ch(i) - 3 * ch(i - 1) + 3 * ch(i - 2) - ch(i - 3)
        case _ => ch(i) - 4 * ch(i - 1) + 6 * ch(i - 2) - 4 * ch(i - 3) +
          ch(i - 4)
      }
      i += 1
    }
    res
  }

  private def writeUtf8Number(w: BitWriter, v: Long): Unit = {
    require(v >= 0 && v < (1L << 36), "utf8-coded number is 36-bit")
    if (v < 0x80) { w.writeBits(v, 8); return }
    var nBytes = 2
    while (nBytes < 7 && v >= (1L << (5 * nBytes + 1))) nBytes += 1
    if (nBytes <= 6) {
      val header = ((0xff << (8 - nBytes)) & 0xff).toLong |
        ((v >>> (6 * (nBytes - 1))) & ((1 << (7 - nBytes)) - 1))
      w.writeBits(header, 8)
      var i = nBytes - 2
      while (i >= 0) { w.writeBits(0x80L | ((v >>> (6 * i)) & 0x3f), 8); i -= 1 }
    } else {
      w.writeBits(0xfeL, 8)
      var i = 5
      while (i >= 0) { w.writeBits(0x80L | ((v >>> (6 * i)) & 0x3f), 8); i -= 1 }
    }
  }
}
