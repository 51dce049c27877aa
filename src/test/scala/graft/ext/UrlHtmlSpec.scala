package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Edge semantics of the web-curation string operators beyond what the
  * q251/q253 oracles cover: URL canonicalization branch cases and
  * idempotence, HTML extraction block/entity ordering.
  */
class UrlHtmlSpec extends SparkSpec {
  import spark.implicits._

  private def canon(urls: String*): Seq[String] =
    Curation.canonicalizeUrls(urls.toDF("url"), "url")
      .select("canonical_url").as[String].collect().toSeq

  test("url canonicalization: ports, www, dot segments, params, edges") {
    assert(canon("HTTPS://WWW.EX.COM:443/a/./b/../c?utm_source=1&z=2&a=3#f")
      === Seq("https://ex.com/a/c?a=3&z=2"))
    // scheme-default is PER SCHEME: http:443 is not a default
    assert(canon("http://ex.com:443/x") === Seq("http://ex.com:443/x"))
    assert(canon("http://ex.com:80/x") === Seq("http://ex.com/x"))
    // bare host: path normalizes to "/"
    assert(canon("https://Ex.Com") === Seq("https://ex.com/"))
    // query with only tracking params vanishes entirely
    assert(canon("https://ex.com/p?utm_a=1&gclid=2&fbclid=3")
      === Seq("https://ex.com/p"))
    // leading ../ cannot escape the root
    assert(canon("https://ex.com/../../x") === Seq("https://ex.com/x"))
    // double slashes collapse (empty segments skipped)
    assert(canon("https://ex.com//a///b") === Seq("https://ex.com/a/b"))
    // www only strips as a PREFIX label
    assert(canon("https://wwwx.com/a") === Seq("https://wwwx.com/a"))
    // idempotence: canonical output is its own fixpoint
    val once = canon("HTTP://WWW.Ex.com:8080/a/./b/..//c?b=2&a=1#z")
    assert(canon(once.head) === once)
  }

  test("html extraction: blocks dropped whole, decode-once entities, " +
    "tag-free passthrough") {
    def ext(htmls: String*): Seq[String] =
      htmls.toDF("h").select(Curation.htmlToText(col("h")).as("t"))
        .as[String].collect().toSeq
    // the script canary: comparison operators inside a dropped block
    // never reach the tag regex
    assert(ext("<p>a</p><script>if (1 < 2 && x > 0) beep()</script><p>b</p>")
      === Seq("a b"))
    assert(ext("<style>a > b { x: 1 }</style>body") === Seq("body"))
    assert(ext("keep<!-- drop <b>this</b> -->tail") === Seq("keep tail"))
    // decode once: &amp;lt; is a LITERAL "&lt;" in the source text
    assert(ext("x &amp;lt; y") === Seq("x &lt; y"))
    assert(ext("a&nbsp;b &quot;c&quot; &#39;d&#39; e&amp;f")
      === Seq("a b \"c\" 'd' e&f"))
    // plain text with odd spacing collapses, tags with attributes strip
    assert(ext("  no   markup\t\nhere  ") === Seq("no markup here"))
    assert(ext("""<a href="u?a=1&amp;b=2" class='x'>link</a>""")
      === Seq("link"))
    assert(ext("") === Seq(""))
  }
}
