package graft.ext

import org.scalatest.funsuite.AnyFunSuite

/** ISO-BMFF box walk: encode→parse round trip, headerMeta dispatch, and
  * the untrusted-size guards (the r9 RIFF sz<0 lesson applied to MP4).
  */
class Mp4Spec extends AnyFunSuite {

  test("encode -> parse round trip: brand, timescale/duration, tracks, " +
    "16.16 dims, codecs") {
    val b = Mp4.mp4Bytes("isom", 600, 72000, 1920, 1080, "avc1",
      Some("mp4a"))
    val m = Mp4.meta(b).get
    assert(m.brand === "isom")
    assert(m.timescale === 600L && m.duration === 72000L)
    assert(m.tracks.size === 2)
    assert(m.video.get === Mp4.TrackMeta("vide", "avc1", 1920, 1080))
    assert(m.audio.get.codec === "mp4a")
    // video-only
    val v = Mp4.meta(Mp4.mp4Bytes("mp42", 1000, 500, 64, 48, "hev1", None)).get
    assert(v.tracks.size === 1 && v.audio.isEmpty)
    assert(v.video.get.width === 64 && v.video.get.height === 48)
  }

  test("sample tables: stts duration sum, stsz constant and table modes") {
    val tbl = Mp4.meta(Mp4.mp4Bytes("isom", 600, 3072, 64, 48, "avc1", None,
      sttsEntries = Seq((4L, 512L), (1L, 1024L)),
      stszSizes = Some(Right(Seq(100L, 200L, 300L, 400L, 500L))))).get
    assert(tbl.video.get.nSamples === 5L)
    assert(tbl.video.get.sttsDuration === 4 * 512 + 1024)
    assert(tbl.video.get.sampleBytes === 1500L)
    val const = Mp4.meta(Mp4.mp4Bytes("isom", 600, 3072, 64, 48, "avc1",
      None, sttsEntries = Seq((6L, 512L)),
      stszSizes = Some(Left((250L, 6L))))).get
    assert(const.video.get.nSamples === 6L)
    assert(const.video.get.sampleBytes === 1500L)
    assert(const.video.get.sttsDuration === 3072L)
    // without tables the fields stay 0 (q247's layout is untouched)
    val plain = Mp4.meta(
      Mp4.mp4Bytes("isom", 600, 600, 64, 48, "avc1", None)).get
    assert(plain.video.get.nSamples === 0L &&
      plain.video.get.sampleBytes === 0L)
    // crafted stsz count escaping its box aborts, never over-reads
    val b = Mp4.mp4Bytes("isom", 600, 3072, 64, 48, "avc1", None,
      stszSizes = Some(Right(Seq(1L, 2L, 3L))))
    // find the stsz payload and corrupt sample_count to a huge value
    val idx = (0 until b.length - 4)
      .find(i => new String(b, i, 4, "US-ASCII") == "stsz").get
    val bb = java.nio.ByteBuffer.wrap(b)
    bb.putInt(idx + 12, Int.MaxValue)
    assert(Mp4.meta(b).isEmpty)
  }

  test("headerMeta dispatches ftyp payloads to the mp4 walk") {
    val b = Mp4.mp4Bytes("isom", 600, 600, 320, 240, "av01", None)
    assert(Multimodal.headerMeta(b).contains(("mp4", 320, 240)))
  }

  test("untrusted sizes never hang or throw: crafted boxes -> None") {
    val good = Mp4.mp4Bytes("isom", 600, 600, 32, 32, "avc1", None)
    // negative / huge box size (0xFFFFFFF0 as u32 escapes the parent)
    val huge = good.clone()
    huge(0) = 0xff.toByte; huge(1) = 0xff.toByte
    huge(2) = 0xff.toByte; huge(3) = 0xf0.toByte
    assert(Mp4.meta(huge).isEmpty)
    // size smaller than its own header
    val tiny = good.clone()
    tiny(0) = 0; tiny(1) = 0; tiny(2) = 0; tiny(3) = 4
    assert(Mp4.meta(tiny).isEmpty)
    // truncated payload
    assert(Mp4.meta(good.take(20)).isEmpty)
    // largesize escaping the parent
    val b = java.nio.ByteBuffer.allocate(24)
    b.putInt(1).put("ftyp".getBytes("US-ASCII"))
    b.putLong(1L << 40).putLong(0L)
    assert(Mp4.meta(b.array()).isEmpty)
    // not a box stream at all
    assert(Mp4.meta("plainly not an mp4 file".getBytes).isEmpty)
    assert(Mp4.meta(Array.empty[Byte]).isEmpty)
    // crafted 64-bit largesize near Long.MaxValue at a NONZERO offset:
    // a naive `i + sz > to` wraps negative and the toInt-truncated step
    // walks BACKWARD — the overflow-free compare must abort instead of
    // cycling forever (the walk would otherwise hang, not throw)
    val pre = java.nio.ByteBuffer.allocate(8 + 16)
    pre.putInt(8).put("free".getBytes("US-ASCII")) // one small valid box
    pre.putInt(1).put("moov".getBytes("US-ASCII"))
    pre.putLong(Long.MaxValue - 4) // i=8: 8 + (MaxValue-4) wraps negative
    assert(Mp4.meta(pre.array()).isEmpty)
    // crafted stts entries whose Σ count·delta overflows Long → abort,
    // never a silently-wrapped garbage duration
    val stts = java.nio.ByteBuffer.allocate(8 + 8 + 2 * 8)
    stts.putInt(8 + 8 + 16).put("stts".getBytes("US-ASCII"))
    stts.putInt(0).putInt(2)
    stts.putInt(-1).putInt(-1).putInt(-1).putInt(-1) // 2 × (2^32-1)²
    val overflowed = wrapTrack(stts.array())
    assert(Mp4.meta(overflowed).isEmpty)
    // crafted constant-mode stsz sz*n overflowing Long → abort too
    val stsz = java.nio.ByteBuffer.allocate(8 + 12)
    stsz.putInt(8 + 12).put("stsz".getBytes("US-ASCII"))
    stsz.putInt(0).putInt(-1).putInt(-1) // sz = n = 2^32-1
    assert(Mp4.meta(wrapTrack(stsz.array())).isEmpty)
  }

  /** Wrap a raw stbl child box into a minimal ftyp+moov/trak/mdia/minf/stbl
    * container so the sample-table parsers actually reach it.
    */
  private def wrapTrack(stblChild: Array[Byte]): Array[Byte] = {
    def bx(tp: String, p: Array[Byte]): Array[Byte] = {
      val b = java.nio.ByteBuffer.allocate(8 + p.length)
      b.putInt(8 + p.length).put(tp.getBytes("US-ASCII")).put(p)
      b.array()
    }
    val good = Mp4.mp4Bytes("isom", 600, 600, 32, 32, "avc1", None)
    val ftypLen = java.nio.ByteBuffer.wrap(good, 0, 4).getInt
    val mvhdBox = {
      val moovPayload = good.drop(ftypLen + 8)
      val mvhdLen = java.nio.ByteBuffer.wrap(moovPayload, 0, 4).getInt
      moovPayload.take(mvhdLen)
    }
    val trak = bx("trak",
      bx("mdia", bx("minf", bx("stbl", stblChild))))
    good.take(ftypLen) ++ bx("moov", mvhdBox ++ trak)
  }

  test("size==0 (to end of file) and 64-bit largesize both parse") {
    val good = Mp4.mp4Bytes("isom", 600, 600, 32, 32, "avc1", None)
    // rewrite the trailing moov's size to 0 = "extends to EOF"
    val ftypLen = java.nio.ByteBuffer.wrap(good, 0, 4).getInt
    val z = good.clone()
    z(ftypLen) = 0; z(ftypLen + 1) = 0; z(ftypLen + 2) = 0; z(ftypLen + 3) = 0
    assert(Mp4.meta(z).map(_.video.get.width).contains(32))
    // re-wrap ftyp as a largesize box (size=1 + 64-bit size)
    val ftypPayload = good.slice(8, ftypLen)
    val rest = good.drop(ftypLen)
    val b = java.nio.ByteBuffer.allocate(16 + ftypPayload.length + rest.length)
    b.putInt(1).put("ftyp".getBytes("US-ASCII"))
      .putLong(16L + ftypPayload.length).put(ftypPayload).put(rest)
    assert(Mp4.meta(b.array()).map(_.brand).contains("isom"))
  }
}
