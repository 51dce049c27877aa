package graft.ext

import org.scalatest.funsuite.AnyFunSuite
import java.nio.charset.StandardCharsets.UTF_8

/** WARC container codec: encode→parse round trips plus the untrusted-
  * size guards (the Mp4/RIFF discipline applied to the crawl format).
  */
class WarcSpec extends AnyFunSuite {

  private def sample(): Array[Byte] = {
    val body = "<html><body><p>hello crawl</p></body></html>".getBytes(UTF_8)
    Warc.warcBytes(Seq(
      (Seq("WARC-Type" -> "warcinfo",
        "WARC-Record-ID" -> "<urn:uuid:0>",
        "Content-Type" -> "application/warc-fields"),
        "software: graft\r\nformat: WARC/1.1\r\n".getBytes(UTF_8)),
      (Seq("WARC-Type" -> "request",
        "WARC-Record-ID" -> "<urn:uuid:1>",
        "WARC-Target-URI" -> "https://example.com/p",
        "Content-Type" -> "application/http; msgtype=request"),
        Warc.httpRequestBytes("GET", "/p", Seq("Host" -> "example.com"))),
      (Seq("WARC-Type" -> "response",
        "WARC-Record-ID" -> "<urn:uuid:2>",
        "WARC-Target-URI" -> "https://example.com/p",
        "Content-Type" -> "application/http; msgtype=response"),
        Warc.httpResponseBytes(200, "OK",
          Seq("Content-Type" -> "text/html"), body))))
  }

  test("encode -> parse round trip recovers records, headers, payloads") {
    val recs = Warc.records(sample()).get
    assert(recs.map(_.recordType) == Vector("warcinfo", "request",
      "response"))
    assert(recs(1).targetUri == "https://example.com/p")
    // case-insensitive header lookup
    assert(recs(2).header("warc-target-uri")
      .contains("https://example.com/p"))
    val (status, hdrs, body) = Warc.httpSplit(recs(2).payload).get
    assert(status == 200)
    assert(hdrs.collectFirst { case ("Content-Type", v) => v }
      .contains("text/html"))
    assert(new String(body, UTF_8) ==
      "<html><body><p>hello crawl</p></body></html>")
    // request split: no status, request line surfaced
    val (rs, rh, rb) = Warc.httpSplit(recs(1).payload).get
    assert(rs == -1)
    assert(rh.collectFirst { case (":request-line", v) => v }
      .contains("GET /p HTTP/1.1"))
    assert(rb.isEmpty)
  }

  test("LWS header folding joins continuation lines") {
    val raw = ("WARC/1.1\r\nWARC-Type: metadata\r\n" +
      "X-Long: first part\r\n\t and the rest\r\n" +
      "Content-Length: 0\r\n\r\n\r\n\r\n").getBytes(UTF_8)
    val recs = Warc.records(raw).get
    assert(recs.head.header("X-Long").contains("first part and the rest"))
  }

  test("binary payloads survive byte-for-byte (length-delimited)") {
    // payload containing CRLFCRLF and WARC/ markers must NOT confuse
    // the walk — records are length-delimited, not sentinel-delimited
    val tricky = "\r\n\r\nWARC/1.1\r\nContent-Length: 9\r\n\r\nxx"
      .getBytes(UTF_8) ++ Array[Byte](0, -1, 127)
    val enc = Warc.warcBytes(Seq(
      (Seq("WARC-Type" -> "resource"), tricky)))
    val recs = Warc.records(enc).get
    assert(recs.size == 1)
    assert(recs.head.payload.toSeq == tricky.toSeq)
  }

  test("crafted inputs abort to None, never hang or throw") {
    val good = sample()
    // truncated payload (Content-Length escapes the container)
    assert(Warc.records(good.dropRight(10)).isEmpty)
    // huge Content-Length (would over-read); digits-only but > remaining
    val huge = new String(good, UTF_8).replaceFirst(
      "Content-Length: \\d+", "Content-Length: 999999999999999999")
    assert(Warc.records(huge.getBytes(UTF_8)).isEmpty)
    // 19-digit length rejected before any arithmetic (overflow guard)
    val wide = new String(good, UTF_8).replaceFirst(
      "Content-Length: \\d+", "Content-Length: 9999999999999999999")
    assert(Warc.records(wide.getBytes(UTF_8)).isEmpty)
    // non-numeric length
    val bad = new String(good, UTF_8).replaceFirst(
      "Content-Length: \\d+", "Content-Length: -1")
    assert(Warc.records(bad.getBytes(UTF_8)).isEmpty)
    // missing record terminator
    val noTerm = good.dropRight(2)
    assert(Warc.records(noTerm).isEmpty)
    // colon-less header line
    assert(Warc.records(
      "WARC/1.1\r\nnocolonhere\r\nContent-Length: 0\r\n\r\n\r\n\r\n"
        .getBytes(UTF_8)).isEmpty)
    // wrong magic
    assert(Warc.records("HTTP/1.1 200 OK\r\n\r\n".getBytes(UTF_8)).isEmpty)
    // missing Content-Length entirely
    assert(Warc.records(
      "WARC/1.1\r\nWARC-Type: metadata\r\n\r\n\r\n\r\n".getBytes(UTF_8))
      .isEmpty)
    // header flood (guarded at 1024 lines)
    val flood = "WARC/1.1\r\n" + ("X-A: 1\r\n" * 2000) +
      "Content-Length: 0\r\n\r\n\r\n\r\n"
    assert(Warc.records(flood.getBytes(UTF_8)).isEmpty)
    // empty container is a degenerate Some (no records, nothing corrupt)
    assert(Warc.records(Array.empty[Byte]).contains(Vector()))
    // httpSplit: no boundary / non-HTTP start line
    assert(Warc.httpSplit("no boundary at all".getBytes(UTF_8)).isEmpty)
    assert(Warc.httpSplit("not http\r\n\r\n".getBytes(UTF_8)).isEmpty)
  }

  test("multi-record containers concatenate; parse is position-exact") {
    val a = Warc.warcBytes(Seq((Seq("WARC-Type" -> "resource"),
      "aaa".getBytes(UTF_8))))
    val b = Warc.warcBytes(Seq((Seq("WARC-Type" -> "resource"),
      "bb".getBytes(UTF_8))))
    val recs = Warc.records(a ++ b).get
    assert(recs.map(r => new String(r.payload, UTF_8)) ==
      Vector("aaa", "bb"))
  }
}
