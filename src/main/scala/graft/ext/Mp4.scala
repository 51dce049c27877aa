package graft.ext

import java.nio.ByteBuffer

/** ISO-BMFF (MP4) container metadata — HEADER-ONLY, no codec: the box
  * walk every video-corpus ingest needs before deciding what to decode.
  * Video training corpora ship as MP4, not AVI; this extends the q169
  * header-census discipline (dimensions from a few hundred bytes per
  * object, never rasterizing) to the container that actually matters.
  *
  * Parser scope: `ftyp` (major brand), `moov/mvhd` (movie timescale +
  * duration), per-`trak` `tkhd` (16.16 fixed-point presentation w/h),
  * `mdia/hdlr` (handler: vide/soun) and `mdia/minf/stbl/stsd` (first
  * sample-entry 4CC = the codec). Box sizes are UNTRUSTED: size==0
  * (to end of enclosing box) and size==1 (64-bit largesize) are
  * handled, anything smaller than its own header or escaping its
  * parent aborts to None (the r9 RIFF sz<0 lesson), and the recursion
  * is depth-capped.
  *
  * The encoder ([[mp4Bytes]]) builds a structurally valid moov-only
  * MP4 from the same fields, so q247 is an encode→parse round trip
  * with a closed-form oracle — the q169 pattern one container deeper.
  */
object Mp4 {

  /** `nSamples`/`sampleBytes`/`sttsDuration` come from the stsz/stts
    * sample tables when present (0 otherwise) — the header-only bitrate/
    * frame-count pass: media data never read.
    */
  final case class TrackMeta(handler: String, codec: String,
      width: Int, height: Int, nSamples: Long = 0L,
      sampleBytes: Long = 0L, sttsDuration: Long = 0L)

  final case class Meta(brand: String, timescale: Long, duration: Long,
      tracks: Seq[TrackMeta]) {
    def video: Option[TrackMeta] = tracks.find(_.handler == "vide")
    def audio: Option[TrackMeta] = tracks.find(_.handler == "soun")
  }

  private val MaxDepth = 8

  /** Parse container metadata from the leading bytes of an MP4/ISO-BMFF
    * payload. Pure byte walk; never throws on crafted input.
    */
  def meta(bytes: Array[Byte]): Option[Meta] =
    try {
      def u8(i: Int): Int = bytes(i) & 0xff
      def be16(i: Int): Int = (u8(i) << 8) | u8(i + 1)
      def be32(i: Int): Long =
        ((u8(i).toLong << 24) | (u8(i + 1) << 16) | (u8(i + 2) << 8) |
          u8(i + 3)) & 0xffffffffL
      def be64(i: Int): Long = (be32(i) << 32) | be32(i + 4)
      def tag(i: Int): String = new String(bytes, i, 4, "US-ASCII")

      // walk the children of [from, to), calling f(boxType, payloadFrom,
      // payloadTo); returns false on any malformed size (caller → None)
      def walk(from: Int, to: Int, depth: Int)(
          f: (String, Int, Int) => Boolean): Boolean = {
        if (depth > MaxDepth) return false
        var i = from
        while (i + 8 <= to) {
          val sz0 = be32(i)
          val tp = tag(i + 4)
          var hdr = 8
          val sz: Long =
            if (sz0 == 1L) {
              if (i + 16 > to) return false
              hdr = 16
              be64(i + 8)
            } else if (sz0 == 0L) (to - i).toLong // to end of enclosing
            else sz0
          // Untrusted size, compare overflow-free: a crafted 64-bit
          // largesize near Long.MaxValue would wrap `i + sz` negative and
          // pass a naive `i + sz > to` check, then step i BACKWARD via the
          // truncated toInt — an infinite walk. `sz > to - i` (all values
          // non-negative after the sz < hdr check, to/i are Ints) cannot
          // overflow, and bounds sz to an Int range so toInt is exact.
          if (sz < hdr || sz > (to - i).toLong) return false
          if (!f(tp, i + hdr, i + sz.toInt)) return false
          i += sz.toInt
        }
        true
      }

      var brand = ""
      var timescale = -1L
      var duration = -1L
      val tracks = scala.collection.mutable.ArrayBuffer[TrackMeta]()

      def parseTrak(from: Int, to: Int): Boolean = {
        var w = 0
        var h = 0
        var handler = ""
        var codec = ""
        var nSamples = 0L
        var sampleBytes = 0L
        var sttsDur = 0L
        val ok = walk(from, to, 2) {
          case ("tkhd", f, t) =>
            val v = u8(f)
            // v0: ... width/height are the LAST 8 bytes of the box
            if (t - f >= (if (v == 1) 92 else 80)) {
              w = (be32(t - 8) >> 16).toInt // 16.16 fixed
              h = (be32(t - 4) >> 16).toInt
            }
            true
          case ("mdia", f, t) =>
            walk(f, t, 3) {
              case ("hdlr", hf, ht) =>
                if (ht - hf >= 12) handler = tag(hf + 8)
                true
              case ("minf", mf, mt) =>
                walk(mf, mt, 4) {
                  case ("stbl", sf, st) =>
                    walk(sf, st, 5) {
                      case ("stsd", df, dt) =>
                        // version/flags(4) entry_count(4) then entries
                        if (dt - df >= 16 && be32(df + 4) >= 1)
                          codec = tag(df + 12)
                        true
                      case ("stts", df, dt) =>
                        // v/f(4) entry_count(4) then (count, delta) pairs;
                        // duration = Σ count·delta — entry count UNTRUSTED
                        if (dt - df >= 8) {
                          val n = be32(df + 4)
                          if (n < 0 || df + 8 + n * 8 > dt) return false
                          // count·delta are untrusted u32s: Σ count·delta
                          // can overflow Long on crafted values — abort
                          // (ArithmeticException → outer catch → None)
                          // rather than report garbage duration stats.
                          var i = 0
                          while (i < n) {
                            sttsDur = Math.addExact(sttsDur,
                              Math.multiplyExact(
                                be32(df + 8 + i * 8), be32(df + 12 + i * 8)))
                            i += 1
                          }
                        }
                        true
                      case ("stsz", df, dt) =>
                        // v/f(4) sample_size(4) sample_count(4); size==0 →
                        // per-sample u32 table follows
                        if (dt - df >= 12) {
                          val sz = be32(df + 4)
                          val n = be32(df + 8)
                          if (n < 0) return false
                          nSamples = n
                          // sz and n are untrusted u32s — sz*n (and the
                          // per-sample sum) overflow Long on crafted
                          // values; abort via the exact-arith throw.
                          if (sz != 0L)
                            sampleBytes = Math.multiplyExact(sz, n)
                          else {
                            if (df + 12 + n * 4 > dt) return false
                            var i = 0
                            while (i < n) {
                              sampleBytes = Math.addExact(sampleBytes,
                                be32(df + 12 + i * 4))
                              i += 1
                            }
                          }
                        }
                        true
                      case _ => true
                    }
                  case _ => true
                }
              case _ => true
            }
          case _ => true
        }
        if (ok) {
          tracks += TrackMeta(handler, codec, w, h, nSamples, sampleBytes,
            sttsDur)
          ()
        }
        ok
      }

      val ok = walk(0, bytes.length, 0) {
        case ("ftyp", f, t) =>
          if (t - f >= 4) brand = tag(f)
          true
        case ("moov", f, t) =>
          walk(f, t, 1) {
            case ("mvhd", mf, mt) =>
              val v = u8(mf)
              if (v == 1 && mt - mf >= 32) {
                timescale = be32(mf + 20)
                duration = be64(mf + 24)
              } else if (v == 0 && mt - mf >= 24) {
                timescale = be32(mf + 12)
                duration = be32(mf + 16)
              }
              true
            case ("trak", tf, tt) => parseTrak(tf, tt)
            case _ => true
          }
        case _ => true
      }
      if (ok && brand.nonEmpty && timescale > 0)
        Some(Meta(brand, timescale, duration, tracks.toSeq))
      else None
    } catch { case scala.util.control.NonFatal(_) => None }

  // ---- encoder (structurally valid moov-only MP4) ------------------

  private def box(tp: String, payload: Array[Byte]): Array[Byte] = {
    val b = ByteBuffer.allocate(8 + payload.length)
    b.putInt(8 + payload.length).put(tp.getBytes("US-ASCII")).put(payload)
    b.array()
  }

  private def cat(bs: Array[Byte]*): Array[Byte] = {
    val out = ByteBuffer.allocate(bs.map(_.length).sum)
    bs.foreach(out.put)
    out.array()
  }

  private def ftyp(brand: String): Array[Byte] = {
    val b = ByteBuffer.allocate(16)
    b.put(brand.getBytes("US-ASCII")).putInt(0x200)
    b.put(brand.getBytes("US-ASCII")).put("iso2".getBytes("US-ASCII"))
    box("ftyp", b.array())
  }

  private def mvhd(timescale: Long, duration: Long): Array[Byte] = {
    val b = ByteBuffer.allocate(100)
    b.putInt(0) // version 0 + flags
    b.putInt(0).putInt(0) // ctime, mtime
    b.putInt(timescale.toInt).putInt(duration.toInt)
    b.putInt(0x00010000).putShort(0x0100.toShort).putShort(0) // rate, volume
    b.put(new Array[Byte](8)) // reserved
    Seq(0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0, 0x40000000)
      .foreach(b.putInt) // unity matrix
    b.put(new Array[Byte](24)) // pre_defined
    b.putInt(3) // next track id
    box("mvhd", b.array())
  }

  private def tkhd(trackId: Int, duration: Long, w: Int, h: Int): Array[Byte] = {
    val b = ByteBuffer.allocate(84)
    b.putInt(7) // version 0, flags = enabled|in_movie|in_preview
    b.putInt(0).putInt(0).putInt(trackId).putInt(0) // times, id, reserved
    b.putInt(duration.toInt)
    b.put(new Array[Byte](8)) // reserved
    b.putShort(0).putShort(0).putShort(0).putShort(0) // layer..volume+resv
    Seq(0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0, 0x40000000)
      .foreach(b.putInt)
    b.putInt(w << 16).putInt(h << 16) // 16.16 fixed
    box("tkhd", b.array())
  }

  private def mdhd(timescale: Long, duration: Long): Array[Byte] = {
    val b = ByteBuffer.allocate(24)
    b.putInt(0).putInt(0).putInt(0)
    b.putInt(timescale.toInt).putInt(duration.toInt)
    b.putShort(0x55c4.toShort).putShort(0) // lang "und", pre_defined
    box("mdhd", b.array())
  }

  private def hdlr(handler: String): Array[Byte] = {
    val b = ByteBuffer.allocate(25)
    b.putInt(0).putInt(0).put(handler.getBytes("US-ASCII"))
    b.put(new Array[Byte](12)).put(0.toByte) // reserved + empty name
    box("hdlr", b.array())
  }

  private def stsdVisual(codec: String, w: Int, h: Int): Array[Byte] = {
    val entry = {
      val b = ByteBuffer.allocate(78)
      b.put(new Array[Byte](6)).putShort(1) // reserved, data_ref_index
      b.putShort(0).putShort(0).put(new Array[Byte](12)) // pre_defined
      b.putShort(w.toShort).putShort(h.toShort)
      b.putInt(0x00480000).putInt(0x00480000) // 72 dpi
      b.putInt(0).putShort(1) // reserved, frame_count
      b.put(new Array[Byte](32)) // compressorname
      b.putShort(0x18).putShort(-1) // depth 24, pre_defined -1
      box(codec, b.array())
    }
    val b = ByteBuffer.allocate(8 + entry.length)
    b.putInt(0).putInt(1).put(entry) // version/flags, entry_count
    box("stsd", b.array())
  }

  private def stsdAudio(codec: String): Array[Byte] = {
    val entry = {
      val b = ByteBuffer.allocate(28)
      b.put(new Array[Byte](6)).putShort(1)
      b.put(new Array[Byte](8)) // reserved
      b.putShort(2).putShort(16).putInt(0) // channels, samplesize, resv
      b.putInt(44100 << 16) // samplerate 16.16
      box(codec, b.array())
    }
    val b = ByteBuffer.allocate(8 + entry.length)
    b.putInt(0).putInt(1).put(entry)
    box("stsd", b.array())
  }

  private def stts(entries: Seq[(Long, Long)]): Array[Byte] = {
    val b = ByteBuffer.allocate(8 + entries.length * 8)
    b.putInt(0).putInt(entries.length)
    entries.foreach { case (n, d) => b.putInt(n.toInt).putInt(d.toInt) }
    box("stts", b.array())
  }

  /** Constant-size mode (`Left(size, count)`) or per-sample table mode
    * (`Right(sizes)`) — both real stsz layouts.
    */
  private def stsz(sizes: Either[(Long, Long), Seq[Long]]): Array[Byte] =
    sizes match {
      case Left((sz, n)) =>
        val b = ByteBuffer.allocate(12)
        b.putInt(0).putInt(sz.toInt).putInt(n.toInt)
        box("stsz", b.array())
      case Right(tbl) =>
        val b = ByteBuffer.allocate(12 + tbl.length * 4)
        b.putInt(0).putInt(0).putInt(tbl.length)
        tbl.foreach(s => b.putInt(s.toInt))
        box("stsz", b.array())
    }

  private def trak(trackId: Int, duration: Long, timescale: Long,
      handler: String, stsd: Array[Byte], w: Int, h: Int,
      sampleTables: Array[Byte] = Array.empty): Array[Byte] =
    box("trak", cat(
      tkhd(trackId, duration, w, h),
      box("mdia", cat(
        mdhd(timescale, duration),
        hdlr(handler),
        box("minf", box("stbl", cat(stsd, sampleTables)))))))

  /** Structurally valid moov-only MP4 for the given fields — the q247
    * round-trip source. `audioCodec = None` emits a single video track.
    * `sttsEntries`/`stszSizes` add real sample tables to the VIDEO track
    * (q250); the defaults emit the q247 layout byte-for-byte.
    */
  def mp4Bytes(brand: String, timescale: Long, duration: Long,
      width: Int, height: Int, videoCodec: String,
      audioCodec: Option[String],
      sttsEntries: Seq[(Long, Long)] = Seq.empty,
      stszSizes: Option[Either[(Long, Long), Seq[Long]]] = None): Array[Byte] = {
    require(width > 0 && height > 0 && timescale > 0 && duration >= 0,
      "mp4Bytes: positive dims/timescale")
    val tables = cat(
      if (sttsEntries.nonEmpty) stts(sttsEntries) else Array.empty[Byte],
      stszSizes.map(stsz).getOrElse(Array.empty[Byte]))
    val traks = cat(
      trak(1, duration, timescale, "vide",
        stsdVisual(videoCodec, width, height), width, height, tables),
      audioCodec.map(c =>
        trak(2, duration, timescale, "soun", stsdAudio(c), 0, 0))
        .getOrElse(Array.empty[Byte]))
    cat(ftyp(brand), box("moov", cat(mvhd(timescale, duration), traks)))
  }
}
