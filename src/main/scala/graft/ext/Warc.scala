package graft.ext

import java.nio.charset.StandardCharsets.UTF_8

/** WARC (Web ARChive, ISO 28500) container codec — the raw on-disk input
  * format of web-corpus curation and the missing first stage ahead of
  * the URL-canonicalize / HTML-extract operators: a crawl delivers WARC
  * files whose `response` records hold HTTP messages whose bodies hold
  * the HTML everything downstream consumes.
  *
  * Reference behavior mirrored: the reference pipeline ingests raw
  * crawl-ish text payloads before cleaning (`clean_traffic.py` reads the
  * bronze layer as-delivered); WARC is that bronze layer for web data.
  *
  * Parser scope and guard discipline (the `Mp4.meta` / r9 RIFF lessons):
  *  - record grammar: `WARC/<v>` CRLF, header lines (`Name: value`, with
  *    obsolete LWS continuation folding) up to an empty CRLF line, then
  *    exactly `Content-Length` payload bytes, then CRLF CRLF;
  *  - `Content-Length` is UNTRUSTED: digits-only, ≤ 18 digits (fits a
  *    Long with no overflow), and the remaining-bytes check is written
  *    overflow-free (`len > n - i` on non-negative ints) — a crafted
  *    length can neither over-read nor wrap the cursor backward;
  *  - any malformed record (bad version line, colon-less header line,
  *    missing blank line, truncated payload, missing record terminator)
  *    aborts the WHOLE parse to None — partial containers are corrupt
  *    containers, the caller decides whether to quarantine;
  *  - never throws on crafted input.
  *
  * The encoder ([[warcBytes]] + HTTP message builders) emits the same
  * grammar byte-for-byte, so the q254 oracle is an encode→parse round
  * trip with closed-form DuckDB twins — the q247 container pattern one
  * format wider.
  */
object Warc {

  private val Crlf = "\r\n"

  /** One WARC record: named headers in file order (case preserved;
    * lookup case-insensitive per the spec) and the raw payload block.
    */
  final case class Record(headers: Vector[(String, String)],
      payload: Array[Byte]) {
    def header(name: String): Option[String] =
      headers.collectFirst {
        case (k, v) if k.equalsIgnoreCase(name) => v
      }
    def recordType: String = header("WARC-Type").getOrElse("")
    def targetUri: String = header("WARC-Target-URI").getOrElse("")
  }

  /** Parse a whole WARC container. None on ANY malformed record. */
  def records(bytes: Array[Byte]): Option[Vector[Record]] =
    try {
      val n = bytes.length
      val out = Vector.newBuilder[Record]
      var i = 0
      while (i < n) {
        // ---- version line --------------------------------------------
        val eol = indexOfCrlf(bytes, i)
        if (eol < 0) return None
        val ver = new String(bytes, i, eol - i, UTF_8)
        if (!ver.startsWith("WARC/") ||
          !ver.drop(5).forall(c => c.isDigit || c == '.')) return None
        i = eol + 2
        // ---- header block --------------------------------------------
        val hdrs = Vector.newBuilder[(String, String)]
        var lastIdx = -1
        var contentLength = -1L
        var done = false
        var count = 0
        val folded = scala.collection.mutable.ArrayBuffer[(String, String)]()
        while (!done) {
          val e = indexOfCrlf(bytes, i)
          if (e < 0) return None
          if (e == i) { done = true; i += 2 } // empty line ends headers
          else {
            val line = new String(bytes, i, e - i, UTF_8)
            i = e + 2
            if (line.head == ' ' || line.head == '\t') {
              // obsolete LWS continuation: append to the previous value
              if (lastIdx < 0) return None
              val (k, v) = folded(lastIdx)
              folded(lastIdx) = (k, v + " " + line.trim)
            } else {
              val c = line.indexOf(':')
              if (c <= 0) return None
              folded += ((line.substring(0, c).trim,
                line.substring(c + 1).trim))
              lastIdx = folded.length - 1
            }
            count += 1
            if (count > 1024) return None // crafted header flood
          }
        }
        folded.foreach { case (k, v) =>
          if (k.equalsIgnoreCase("Content-Length")) {
            // UNTRUSTED: digits only, bounded width → no Long overflow
            if (v.isEmpty || v.length > 18 || !v.forall(_.isDigit))
              return None
            contentLength = v.toLong
          }
          hdrs += ((k, v))
        }
        if (contentLength < 0) return None // Content-Length is mandatory
        // overflow-free remaining check (i, n non-negative ints)
        if (contentLength > (n - i).toLong) return None
        val payload = java.util.Arrays.copyOfRange(
          bytes, i, i + contentLength.toInt)
        i += contentLength.toInt
        // ---- record terminator: CRLF CRLF ----------------------------
        if (i + 4 > n || bytes(i) != '\r' || bytes(i + 1) != '\n' ||
          bytes(i + 2) != '\r' || bytes(i + 3) != '\n') return None
        i += 4
        out += Record(hdrs.result(), payload)
      }
      Some(out.result())
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Split an HTTP message payload (`application/http`) into
    * (statusCode, headers-in-order, body). For requests the "status" is
    * -1 and the request line is returned under the pseudo-header
    * `:request-line`. None when there is no header/body boundary or the
    * start line is not HTTP-shaped.
    */
  def httpSplit(payload: Array[Byte])
      : Option[(Int, Vector[(String, String)], Array[Byte])] =
    try {
      val boundary = indexOfDoubleCrlf(payload)
      if (boundary < 0) return None
      val head = new String(payload, 0, boundary, UTF_8)
      val lines = head.split("\r\n", -1)
      if (lines.isEmpty) return None
      val start = lines.head
      val hdrs = Vector.newBuilder[(String, String)]
      var status = -1
      if (start.startsWith("HTTP/")) {
        val parts = start.split(" ", 3)
        if (parts.length < 2 || !parts(1).forall(_.isDigit) ||
          parts(1).length > 3) return None
        status = parts(1).toInt
      } else if (start.nonEmpty && start.split(" ").length >= 3 &&
        start.split(" ").last.startsWith("HTTP/")) {
        hdrs += ((":request-line", start))
      } else return None
      lines.drop(1).foreach { line =>
        val c = line.indexOf(':')
        if (c <= 0) return None
        hdrs += ((line.substring(0, c).trim, line.substring(c + 1).trim))
      }
      val body = java.util.Arrays.copyOfRange(
        payload, boundary + 4, payload.length)
      Some((status, hdrs.result(), body))
    } catch { case scala.util.control.NonFatal(_) => None }

  private def indexOfCrlf(b: Array[Byte], from: Int): Int = {
    var i = from
    while (i + 1 < b.length) {
      if (b(i) == '\r' && b(i + 1) == '\n') return i
      i += 1
    }
    -1
  }

  private def indexOfDoubleCrlf(b: Array[Byte]): Int = {
    var i = 0
    while (i + 3 < b.length) {
      if (b(i) == '\r' && b(i + 1) == '\n' && b(i + 2) == '\r' &&
        b(i + 3) == '\n') return i
      i += 1
    }
    -1
  }

  // ---- encoder -------------------------------------------------------

  /** Serialize records; Content-Length is computed (a caller-supplied
    * one is ignored to keep containers self-consistent by construction).
    */
  def warcBytes(recs: Seq[(Seq[(String, String)], Array[Byte])],
      version: String = "1.1"): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    recs.foreach { case (hdrs, payload) =>
      val sb = new StringBuilder
      sb.append("WARC/").append(version).append(Crlf)
      hdrs.filterNot(_._1.equalsIgnoreCase("Content-Length"))
        .foreach { case (k, v) => sb.append(k).append(": ").append(v)
          .append(Crlf) }
      sb.append("Content-Length: ").append(payload.length).append(Crlf)
      sb.append(Crlf)
      out.write(sb.toString.getBytes(UTF_8))
      out.write(payload)
      out.write(Crlf.getBytes(UTF_8))
      out.write(Crlf.getBytes(UTF_8))
    }
    out.toByteArray
  }

  /** `application/http; msgtype=response` payload bytes. */
  def httpResponseBytes(status: Int, reason: String,
      headers: Seq[(String, String)], body: Array[Byte]): Array[Byte] = {
    val sb = new StringBuilder
    sb.append("HTTP/1.1 ").append(status).append(' ').append(reason)
      .append(Crlf)
    headers.foreach { case (k, v) =>
      sb.append(k).append(": ").append(v).append(Crlf)
    }
    sb.append("Content-Length: ").append(body.length).append(Crlf)
    sb.append(Crlf)
    val head = sb.toString.getBytes(UTF_8)
    val out = new Array[Byte](head.length + body.length)
    System.arraycopy(head, 0, out, 0, head.length)
    System.arraycopy(body, 0, out, head.length, body.length)
    out
  }

  /** `application/http; msgtype=request` payload bytes. */
  def httpRequestBytes(method: String, path: String,
      headers: Seq[(String, String)]): Array[Byte] = {
    val sb = new StringBuilder
    sb.append(method).append(' ').append(path).append(" HTTP/1.1")
      .append(Crlf)
    headers.foreach { case (k, v) =>
      sb.append(k).append(": ").append(v).append(Crlf)
    }
    sb.append(Crlf)
    sb.toString.getBytes(UTF_8)
  }
}
