package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ext.{Bpe, Curation, Dedup, TextAnalysis}
import graft.queries.Q._

/** Corpus-curation operators (graft.ext.Curation) over `documents`, every one
  * oracle-backed: the regex subset is Java/RE2-shared, all ratios are exact
  * single divisions, order-dependent double sums route through DECIMAL, and
  * float constants are either written literal-identically in both engines or
  * chosen binary-exact (0.5/0.75/1.5) — see Curation's scaladoc.
  */
object CurationQueries {

  /** The synthetic-PII augmentation used by q83: the test corpus contains no
    * PII by construction, so both engines deterministically append
    * email/phone/IPv4 strings to a doc_id-keyed subset. The OPERATOR under
    * test (piiCount/redactPii) sees a realistic mixed corpus.
    */
  private def augmentedText = concat(
    col("text"),
    when(col("doc_id") % 3 === 0,
      concat(lit(" contact user"), col("doc_id").cast("string"),
        lit("@example.com now"))).otherwise(lit("")),
    when(col("doc_id") % 5 === 0,
      concat(lit(" call +1-555-"),
        lpad((col("doc_id") % 10000).cast("string"), 4, "0"))).otherwise(lit("")),
    when(col("doc_id") % 7 === 0,
      concat(lit(" host 10."), (col("doc_id") % 200).cast("string"),
        lit(".0."), ((col("doc_id") * 3) % 250).cast("string")))
      .otherwise(lit("")))

  // q136 boilerplate grain + threshold (declared ABOVE `defs` — the oracle
  // SQL interpolates them at object init; CLAUDE.md init-order trap)
  private val SegTokens = 10
  private val MinDocFreq = 2

  // q137 BPE learning size
  private val BpeMerges = 5
  private val BpeTopWords = 200

  /** The greedy-LTR merge fold as a DuckDB list_reduce lambda — the exact
    * twin of Spark's `aggregate` HOF in Bpe.applyMerge. `m` is a 1-row
    * merge CTE alias providing (a, b).
    */
  private def bpeFold(symExpr: String): String =
    s"""list_reduce(string_split($symExpr, '|'), (acc, x) ->
       |    CASE WHEN (acc = m.a OR acc LIKE '%|' || m.a) AND x = m.b
       |      THEN substr(acc, 1, length(acc) - length(m.a)) || m.a || m.b
       |      ELSE acc || '|' || x END)""".stripMargin

  /** q249 frozen EXTERNAL merge table (the published-merges stand-in,
    * GPT-2 merges.txt lineage) — inlined identically into the file the
    * Spark side loads and the oracle's literal folds. Rank order is
    * load-bearing: "th e" can only fire after "t h" has formed "th".
    * ABOVE `defs` (init-order trap).
    */
  private val ExtMerges = Seq(
    ("t", "h"), ("th", "e"), ("i", "n"), ("a", "n"), ("an", "d"),
    ("e", "r"), ("o", "n"), ("r", "e"))

  /** 'Ġ' (U+0120), the GPT-2 byte-encoding of space, and the byte-symbol
    * separator U+0400 — explicit escapes (r3 control-char rule). ABOVE
    * `defs` (init-order trap).
    */
  private val G = "\u0120"
  private val BSep = "\u0400"

  /** q257 frozen BYTE-LEVEL merge table (GPT-2 merges.txt lineage over
    * byte-encoder symbols): space-prefixed entries ("Ġ t") are the
    * hallmark of byte-level BPE — "Ġthe" and "the" are different items.
    * Rank-dependence exercised twice: ("Ġt","he") needs both ("Ġ","t")
    * and ("h","e") to have fired first.
    */
  private val ExtByteMerges = Seq(
    (G, "t"), (G, "a"), ("h", "e"), (G + "t", "he"),
    ("e", "r"), (G, "s"), ("r", "e"), ("i", "n"))

  /** q251's messy-URL fixture (every canonicalization rule exercised:
    * case, www, default/explicit ports, dot segments, tracking params,
    * fragment) — shared by q260's per-domain census. Both sides.
    */
  private def messyUrlFixture(id: Column): Column = concat(
    when(id % 2 === 0, lit("HTTPS")).otherwise(lit("http")),
    lit("://WWW.Site"), (id % 7).cast("string"), lit(".COM"),
    when(id % 3 === 0, lit(":443"))
      .when(id % 3 === 1, lit(":8080")).otherwise(lit("")),
    lit("/Dir/./Sub"), (id % 5).cast("string"), lit("/../Page"),
    lit("?utm_source=x&b="), (id % 5).cast("string"),
    lit("&a="), (id % 3).cast("string"),
    when(id % 4 === 0, lit("&gclid=zz")).otherwise(lit("")),
    lit("#Sec"))

  // NOTE: no line starts with '||' — an interpolated fragment whose line
  // begins with | gets mangled by the OUTER oracle string's stripMargin
  private val messyUrlFixtureSql: String =
    """(CASE WHEN doc_id % 2 = 0 THEN 'HTTPS' ELSE 'http' END) ||
      |      '://WWW.Site' || (doc_id % 7) || '.COM' ||
      |      (CASE WHEN doc_id % 3 = 0 THEN ':443'
      |            WHEN doc_id % 3 = 1 THEN ':8080' ELSE '' END) ||
      |      '/Dir/./Sub' || (doc_id % 5) || '/../Page' ||
      |      '?utm_source=x&b=' || (doc_id % 5) ||
      |      '&a=' || (doc_id % 3) ||
      |      (CASE WHEN doc_id % 4 = 0 THEN '&gclid=zz' ELSE '' END) ||
      |      '#Sec'""".stripMargin

  /** The generic URL-canonicalization rule chain (q251's oracle) as
    * reusable CTE text over a CTE `src`(doc_id, url): emits p1..p5 plus
    * `canon`(doc_id, canonical_url, host, path, n_params). Factored so
    * the q255 capstone replays the IDENTICAL chain q251 pins.
    */
  private def urlCanonCtes(src: String, sfx: String = ""): String =
    s"""p1$sfx AS (SELECT doc_id, regexp_replace(url, '#.*', '') AS nf
       |  FROM $src),
       |p2$sfx AS (SELECT doc_id,
       |  lower(regexp_extract(nf, '^([A-Za-z][A-Za-z0-9+.\\-]*)://', 1))
       |    AS scheme,
       |  regexp_replace(nf, '^[A-Za-z][A-Za-z0-9+.\\-]*://', '') AS rest
       |  FROM p1$sfx),
       |p3$sfx AS (SELECT doc_id, scheme,
       |  regexp_extract(rest, '^([^/?]*)', 1) AS hostport,
       |  regexp_replace(rest, '^[^/?]*', '') AS aft
       |  FROM p2$sfx),
       |p4$sfx AS (SELECT doc_id, scheme,
       |  regexp_replace(lower(regexp_extract(hostport, '^([^:]*)', 1)),
       |    '^www\\.', '') AS host,
       |  regexp_extract(hostport, ':([0-9]+)$$', 1) AS port,
       |  regexp_extract(aft, '^([^?]*)', 1) AS pathraw,
       |  CASE WHEN contains(aft, '?')
       |    THEN regexp_replace(aft, '^[^?]*\\?', '') ELSE '' END
       |    AS queryraw
       |  FROM p3$sfx),
       |p5$sfx AS (SELECT doc_id, scheme, host, port,
       |  list_reduce([''] || string_split(pathraw, '/'), (acc, x) ->
       |    CASE WHEN x = '' OR x = '.' THEN acc
       |         WHEN x = '..' THEN regexp_replace(acc, '/[^/]*$$', '')
       |         ELSE acc || '/' || x END) AS path0,
       |  list_sort(list_filter(string_split(queryraw, '&'), x ->
       |    x <> '' AND NOT starts_with(x, 'utm_')
       |      AND NOT starts_with(x, 'fbclid=')
       |      AND NOT starts_with(x, 'gclid='))) AS plist
       |  FROM p4$sfx),
       |canon$sfx AS (SELECT doc_id,
       |  scheme || '://' || host ||
       |    CASE WHEN port <> ''
       |         AND NOT (scheme = 'https' AND port = '443')
       |         AND NOT (scheme = 'http' AND port = '80')
       |       THEN ':' || port ELSE '' END ||
       |    CASE WHEN path0 = '' THEN '/' ELSE path0 END ||
       |    CASE WHEN len(plist) > 0
       |       THEN '?' || array_to_string(plist, '&') ELSE '' END
       |    AS canonical_url,
       |  host,
       |  CASE WHEN path0 = '' THEN '/' ELSE path0 END AS path,
       |  CAST(len(plist) AS BIGINT) AS n_params
       |FROM p5$sfx)""".stripMargin

  /** The HTML→text extraction chain (q253's oracle) as a reusable scalar
    * SQL expression on a column: script/style/comment blocks dropped
    * WHOLE, then tags, then entities with &amp; decoded LAST, then
    * whitespace squeeze+trim — the exact twin of Curation.htmlToText.
    */
  private def htmlToTextSqlExpr(c: String): String =
    s"""trim(regexp_replace(
       |      replace(replace(replace(replace(replace(replace(
       |        regexp_replace(
       |          regexp_replace(
       |            regexp_replace(
       |              regexp_replace($c,
       |                '(?is)<script[^>]*>.*?</script>', ' ', 'g'),
       |              '(?is)<style[^>]*>.*?</style>', ' ', 'g'),
       |            '(?s)<!--.*?-->', ' ', 'g'),
       |          '<[^>]*>', ' ', 'g'),
       |        '&nbsp;', ' '), '&lt;', '<'), '&gt;', '>'),
       |        '&quot;', '"'), '&#39;', ''''), '&amp;', '&'),
       |      '\\s+', ' ', 'g'))""".stripMargin

  /** The q67 quality-score replay as reusable CTE text over
    * `src`(doc_id, textCol): emits `qm$sfx` and `qs$sfx`, the latter
    * with (doc_id, ntok, score). Shared by q255's gate and q256's
    * weak-supervision labels.
    */
  private def qualityScoreCtes(src: String, textCol: String,
      sfx: String = ""): String =
    s"""qm$sfx AS (SELECT doc_id,
       |  len(list_filter(regexp_split_to_array(trim($textCol), '\\s+'),
       |    x -> x <> '')) AS ntok,
       |  CASE WHEN length($textCol) = 0 THEN 0.0
       |       ELSE length(regexp_replace($textCol, '[^a-zA-Z]', '',
       |            'g'))::DOUBLE / length($textCol) END AS alpha,
       |  len(regexp_extract_all(lower($textCol),
       |    '\\b(the|and|of|to|in|is|that|it|was|for)\\b')) AS ens,
       |  length(regexp_replace($textCol, '\\s+', '', 'g')) AS nws,
       |  length($textCol) AS qlen
       |  FROM $src),
       |qs$sfx AS (SELECT doc_id, ntok, round(
       |    least(qlen / 500.0, 1.0) * 0.25 + alpha * 0.35 +
       |    least((CASE WHEN ntok = 0 THEN 0.0
       |      ELSE ens::DOUBLE / ntok END) * 5.0, 1.0) * 0.2 +
       |    (CASE WHEN (CASE WHEN ntok = 0 THEN 0.0
       |      ELSE nws::DOUBLE / ntok END)
       |          BETWEEN 3.0 AND 12.0 THEN 1.0 ELSE 0.3 END) * 0.2, 4)
       |    AS score
       |  FROM qm$sfx)""".stripMargin

  /** q260's oracle: q251's canon chain over the messy-URL fixture, then
    * the q191 datasheet CTEs and the q85 mixture CTEs re-keyed on the
    * canonical domain, plus the exact token share.
    */
  private def domainCensusOracleSql: String =
    s"""WITH raw AS (
       |  SELECT doc_id, text, lang,
       |    $messyUrlFixtureSql AS url
       |  FROM documents WHERE text IS NOT NULL),
       |${urlCanonCtes("raw")},
       |docs AS MATERIALIZED (
       |  SELECT r.doc_id, r.text, r.lang, c.host AS domain
       |  FROM raw r JOIN canon c USING (doc_id)),
       |tok AS MATERIALIZED (SELECT domain, lang, md5(text) AS h,
       |    CAST(len(list_filter(regexp_split_to_array(trim(text), '\\s+'),
       |      x -> x <> '')) AS BIGINT) AS nt
       |  FROM docs),
       |base AS (SELECT domain, count(*) AS n_docs,
       |    sum(nt)::BIGINT AS total_tokens,
       |    round(quantile_cont(nt, 0.5), 1) AS median_tokens
       |  FROM tok GROUP BY domain),
       |hg AS (SELECT domain, h, count(*) AS n FROM tok GROUP BY 1, 2),
       |dups AS (SELECT domain,
       |    sum(CASE WHEN n > 1 THEN n ELSE 0 END)::BIGINT AS dup_docs
       |  FROM hg GROUP BY domain),
       |lg AS (SELECT domain, lang, count(*) AS ln FROM tok GROUP BY 1, 2),
       |nl AS (SELECT domain, count(*) AS n_langs FROM lg GROUP BY domain),
       |top AS (SELECT domain, lang AS top_lang, ln FROM (
       |    SELECT *, row_number() OVER (PARTITION BY domain
       |      ORDER BY ln DESC, lang) AS rn FROM lg) WHERE rn = 1),
       |g AS (SELECT domain, count(*) AS n_docs,
       |    CAST(round(sqrt(CAST(count(*) AS DOUBLE)), 6)
       |      AS DECIMAL(20,6)) AS w
       |  FROM docs GROUP BY 1),
       |wt AS (SELECT domain,
       |    round(CAST(w AS DOUBLE) / CAST(total AS DOUBLE), 6) AS weight
       |  FROM g CROSS JOIN (SELECT sum(w) AS total FROM g)),
       |tt AS (SELECT sum(total_tokens)::BIGINT AS t FROM base)
       |SELECT b.domain, b.n_docs, b.total_tokens, b.median_tokens,
       |  d.dup_docs, nl.n_langs, top.top_lang,
       |  round(CAST(100.0 AS DOUBLE) * top.ln::DOUBLE /
       |    b.n_docs::DOUBLE, 2) AS top_lang_pct,
       |  wt.weight,
       |  round(CAST(b.total_tokens AS DOUBLE) / CAST(tt.t AS DOUBLE), 6)
       |    AS token_share
       |FROM base b JOIN dups d USING (domain)
       |JOIN nl USING (domain) JOIN top USING (domain)
       |JOIN wt USING (domain), tt
       |ORDER BY domain""".stripMargin

  /** q261's oracle: the canon chain twice (page URLs, link targets —
    * suffix-parameterized CTEs; link rows keyed doc_id·10+i), the href
    * extraction twin, and the q99 PageRank iteration chain over the
    * domain-id graph.
    */
  private def linkGraphOracleSql: String = {
    def linkUrlSql(tgt: String): String =
      s"'https://WWW.Site' || ($tgt) || '.COM:443/Ref/./x/../p' || " +
        s"(doc_id % 5) || '?utm_campaign=z&a=1#top'"
    // triple-quoted: \s stays a literal backslash-s for the SQL regex
    val pat = """(?i)<a\s[^>]*href=["'']([^"'']+)["'']"""
    def prIter(k: Int): String =
      s"""c$k AS (SELECT eid.dst,
         |    sum(CAST(r${k - 1}.r / deg.deg AS DECIMAL(28,12))) AS s
         |  FROM eid JOIN deg USING (src)
         |  JOIN r${k - 1} ON r${k - 1}.node = eid.src
         |  GROUP BY 1),
         |r$k AS (SELECT node,
         |    (CAST(1.0 AS DOUBLE) - CAST(0.85 AS DOUBLE)) / n
         |      + CAST(0.85 AS DOUBLE) * coalesce(CAST(s AS DOUBLE), 0.0)
         |      AS r
         |  FROM nodes CROSS JOIN nn LEFT JOIN c$k ON c$k.dst = node)"""
        .stripMargin
    s"""WITH raw AS (
       |  SELECT doc_id,
       |    $messyUrlFixtureSql AS url,
       |    '<html><body><p>' || text || '</p><a href="' ||
       |      ${linkUrlSql("(doc_id + 1) % 7")} ||
       |      '">n1</a><a class=''x'' href=''' ||
       |      ${linkUrlSql("(doc_id * 2 + 3) % 7")} || '''>n2</a>' ||
       |      (CASE WHEN doc_id % 5 = 0 THEN '<a href="' ||
       |        ${linkUrlSql("(doc_id + 4) % 7")} || '">n3</a>'
       |       ELSE '' END) ||
       |      '</body></html>' AS html
       |  FROM documents WHERE text IS NOT NULL),
       |${urlCanonCtes("raw")},
       |own AS MATERIALIZED (SELECT doc_id, host AS src_domain FROM canon),
       |larr AS (SELECT doc_id,
       |    regexp_extract_all(html, '$pat', 1) AS ls
       |  FROM raw),
       |lnk AS (SELECT doc_id * 10 + i AS doc_id, ls[CAST(i AS INT)] AS url
       |  FROM (SELECT doc_id, ls, unnest(range(1, len(ls) + 1)) AS i
       |        FROM larr)),
       |${urlCanonCtes("lnk", "L")},
       |dst AS MATERIALIZED (
       |  SELECT o.doc_id, o.src_domain, cl.host AS dst_domain
       |  FROM canonL cl JOIN own o ON o.doc_id = cl.doc_id // 10),
       |ed AS MATERIALIZED (
       |  SELECT DISTINCT src_domain AS s, dst_domain AS d FROM dst),
       |dim AS MATERIALIZED (SELECT domain,
       |    CAST(row_number() OVER (ORDER BY domain) AS BIGINT) AS nid
       |  FROM (SELECT DISTINCT s AS domain FROM ed
       |        UNION SELECT d FROM ed)),
       |eid AS MATERIALIZED (SELECT ds.nid AS src, dd.nid AS dst
       |  FROM ed JOIN dim ds ON ds.domain = ed.s
       |  JOIN dim dd ON dd.domain = ed.d),
       |deg AS (SELECT src, count(*) AS deg FROM eid GROUP BY 1),
       |nodes AS (SELECT DISTINCT node FROM (
       |  SELECT src AS node FROM eid UNION ALL SELECT dst FROM eid)),
       |nn AS (SELECT count(*) AS n FROM nodes),
       |r0 AS (SELECT node, CAST(1.0 AS DOUBLE) / n AS r
       |  FROM nodes CROSS JOIN nn),
       |${prIter(1)},
       |${prIter(2)},
       |${prIter(3)},
       |ol AS (SELECT src_domain AS domain, count(*) AS n_links
       |  FROM dst GROUP BY 1),
       |od AS (SELECT s AS domain, count(*) AS out_domains FROM ed
       |  GROUP BY 1),
       |idg AS (SELECT d AS domain, count(*) AS in_domains FROM ed
       |  GROUP BY 1)
       |SELECT dim.domain,
       |  CAST(coalesce(ol.n_links, 0) AS BIGINT) AS n_links,
       |  CAST(coalesce(od.out_domains, 0) AS BIGINT) AS out_domains,
       |  CAST(coalesce(idg.in_domains, 0) AS BIGINT) AS in_domains,
       |  round(r3.r, 10) AS rank
       |FROM dim JOIN r3 ON r3.node = dim.nid
       |LEFT JOIN ol USING (domain) LEFT JOIN od USING (domain)
       |LEFT JOIN idg USING (domain)
       |ORDER BY domain""".stripMargin
  }

  /** q256's oracle: the WHOLE classifier training unrolled as chained
    * CTEs. wi0 = zero weights; for k = 0..3, sc_k scores every doc with
    * wi_k's weights through the identical fixed-shape rational chain,
    * ag_k folds the quantized integer sufficient stats, and wi_{k+1}
    * applies the identical update arithmetic — by induction every
    * weight (and hence every loss) is bit-identical to the engine's.
    */
  private def qcTrainOracleSql: String = {
    val nB = 16
    val xcols = (0 until nB).map(j =>
      s"len(list_filter(bks, v -> v = $j))::DOUBLE / ntok::DOUBLE AS x$j")
      .mkString(",\n  ")
    def zChain(w: String): String =
      (0 until nB).foldLeft(s"$w.b")((acc, j) => s"$acc + $w.w$j * f.x$j")
    def scoreBlock(k: Int): String =
      s"""sc$k AS (SELECT f.*, CAST(0.5 AS DOUBLE) +
         |    z / (CAST(2 AS DOUBLE) * (CAST(1 AS DOUBLE) + abs(z))) AS p
         |  FROM (SELECT f.*, ${zChain(s"wi$k")} AS z
         |        FROM fx f, wi$k) f)""".stripMargin
    def aggBlock(k: Int): String = {
      val per = (0 until nB).map(j =>
        s"CAST(sum(round(p * x$j * CAST(1000000 AS DOUBLE))) AS BIGINT)" +
          s" AS p$j,\n  " +
          s"CAST(sum(y * CAST(round(x$j * CAST(1000000 AS DOUBLE))" +
          s" AS BIGINT)) AS BIGINT) AS y$j").mkString(",\n  ")
      s"""ag$k AS (SELECT
         |  CAST(sum(round((p - y) * (p - y) * CAST(1000000 AS DOUBLE)))
         |    AS BIGINT) AS loss,
         |  CAST(count(*) AS BIGINT) AS n,
         |  CAST(sum(round(p * CAST(1000000 AS DOUBLE))) AS BIGINT) AS pb,
         |  CAST(sum(y * 1000000) AS BIGINT) AS yb,
         |  $per
         |FROM sc$k)""".stripMargin
    }
    def updateBlock(k: Int): String = {
      val per = (0 until nB).map(j =>
        s"w.w$j - CAST(0.5 AS DOUBLE) * ((CAST(a.p$j - a.y$j AS DOUBLE)" +
          s" / CAST(1000000 AS DOUBLE)) / CAST(a.n AS DOUBLE)) AS w$j")
        .mkString(",\n  ")
      s"""wi${k + 1} AS (SELECT
         |  w.b - CAST(0.5 AS DOUBLE) * ((CAST(a.pb - a.yb AS DOUBLE)
         |    / CAST(1000000 AS DOUBLE)) / CAST(a.n AS DOUBLE)) AS b,
         |  $per
         |FROM wi$k w, ag$k a)""".stripMargin
    }
    val wi0 = "wi0 AS (SELECT CAST(0 AS DOUBLE) AS b, " +
      (0 until nB).map(j => s"CAST(0 AS DOUBLE) AS w$j").mkString(", ") + ")"
    val chain = (0 to 3).map { k =>
      if (k < 3) Seq(scoreBlock(k), aggBlock(k), updateBlock(k))
      else Seq(scoreBlock(k), aggBlock(k))
    }.flatten.mkString(",\n")
    val rows = (0 to 3).map(k =>
      s"SELECT CAST($k AS BIGINT) AS iter, ag$k.loss AS loss_q, wi$k.*" +
        s" FROM ag$k, wi$k").mkString("\nUNION ALL ")
    s"""WITH ${qualityScoreCtes("documents", "text", "0")},
       |fx AS MATERIALIZED (
       |  SELECT doc_id, y, ntok, $xcols
       |  FROM (
       |    SELECT d.doc_id,
       |      CASE WHEN q.score >= CAST(0.65 AS DOUBLE) THEN 1 ELSE 0
       |        END AS y,
       |      len(toks) AS ntok,
       |      list_transform(toks, t ->
       |        (('0x' || substr(md5(t), 1, 15))::BIGINT) % $nB) AS bks
       |    FROM (SELECT doc_id, text, list_filter(
       |        regexp_split_to_array(trim(lower(text)), '\\s+'),
       |        x -> x <> '') AS toks
       |      FROM documents WHERE text IS NOT NULL) d
       |    JOIN qs0 q USING (doc_id))
       |  WHERE ntok >= 1),
       |$wi0,
       |$chain
       |$rows
       |ORDER BY iter""".stripMargin
  }

  /** q255's oracle: the full web-curation chain as chained CTE blocks —
    * fixture build, HTML extraction ([[htmlToTextSqlExpr]]), URL
    * canonicalization ([[urlCanonCtes]]), URL keep-first dedup, the q46
    * portable-minhash band/verify/drop stages (TextQueries'
    * portableSigCtes/bandKeySql), the q67 quality and q29 langId
    * replays, and the per-domain rollup. Heavily-reused CTEs are
    * MATERIALIZED (the r9 exponential re-evaluation lesson).
    */
  private def webCapstoneOracleSql: String =
    s"""WITH srcw AS MATERIALIZED (
       |  SELECT doc_id, text,
       |    (CASE WHEN doc_id % 2 = 0 THEN 'HTTPS' ELSE 'https' END) ||
       |      '://' ||
       |      (CASE WHEN doc_id % 5 = 0 THEN 'WWW.' ELSE '' END) ||
       |      'Site' || (doc_id % 7) || '.COM' ||
       |      (CASE WHEN doc_id % 3 = 0 THEN ':443' ELSE '' END) ||
       |      '/w/./x/../doc/' || substr(md5(text), 1, 8) ||
       |      (CASE WHEN doc_id % 2 = 0 THEN '?b=2&a=1&utm_source=x'
       |            ELSE '?a=1&b=2' END) ||
       |      (CASE WHEN doc_id % 6 = 0 THEN '#frag' ELSE '' END) AS url,
       |    '<html><head><title>P' || (doc_id % 9) ||
       |      '</title><script>if (1 < 2 && 3 > 2) { x(); }</script>' ||
       |      '</head><body><h1>Dom ' || (doc_id % 7) ||
       |      '</h1><p>' || text ||
       |      '</p><div>footer &amp; &lt;nav&gt;</div></body></html>'
       |      AS rawhtml
       |  FROM documents WHERE text IS NOT NULL),
       |extw AS MATERIALIZED (
       |  SELECT doc_id, url, ${htmlToTextSqlExpr("rawhtml")} AS txt
       |  FROM srcw),
       |${urlCanonCtes("extw")},
       |pages AS MATERIALIZED (
       |  SELECT e.doc_id, e.txt, c.canonical_url, c.host,
       |    row_number() OVER (PARTITION BY c.canonical_url
       |      ORDER BY e.doc_id) AS rn
       |  FROM extw e JOIN canon c USING (doc_id)),
       |ex2 AS MATERIALIZED (
       |  SELECT doc_id, txt AS text FROM pages WHERE rn = 1),
       |${TextQueries.portableSigCtes("ex2")},
       |bands AS (
       |  ${TextQueries.bandKeySql("sigs")}),
       |cand AS (SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b
       |  FROM bands x JOIN bands y
       |    ON x.band = y.band AND x.bk = y.bk AND x.doc_id < y.doc_id),
       |hsets AS (SELECT doc_id, list_distinct(list_transform(g,
       |    x -> ('0x' || substr(md5(x), 1, 15))::BIGINT)) AS st
       |  FROM grams WHERE len(g) > 0),
       |dropids AS (SELECT DISTINCT id_b FROM (
       |  SELECT id_b,
       |    round(CASE WHEN len(list_distinct(a.st || b.st)) = 0 THEN 0.0
       |      ELSE len(list_intersect(a.st, b.st))::DOUBLE /
       |           len(list_distinct(a.st || b.st)) END, 4) AS j
       |    FROM cand JOIN hsets a ON a.doc_id = cand.id_a
       |              JOIN hsets b ON b.doc_id = cand.id_b)
       |  WHERE j >= CAST(0.7 AS DOUBLE)),
       |${qualityScoreCtes("pages", "txt")},
       |lg AS (SELECT doc_id,
       |  CASE WHEN greatest(s_en, s_es, s_de, s_fr, s_zh) = 0 THEN 'und'
       |       WHEN s_de >= s_en AND s_de >= s_es AND s_de >= s_fr
       |         AND s_de >= s_zh THEN 'de'
       |       WHEN s_en >= s_es AND s_en >= s_fr AND s_en >= s_zh
       |         THEN 'en'
       |       WHEN s_es >= s_fr AND s_es >= s_zh THEN 'es'
       |       WHEN s_fr >= s_zh THEN 'fr'
       |       ELSE 'zh' END AS pred_lang
       |  FROM (SELECT doc_id,
       |    len(regexp_extract_all(lower(txt),
       |      '\\b(the|and|of|to|in|is|that|it|was|for)\\b')) AS s_en,
       |    len(regexp_extract_all(lower(txt),
       |      '\\b(el|la|de|que|y|los|las|en|un|una)\\b')) AS s_es,
       |    len(regexp_extract_all(lower(txt),
       |      '\\b(der|die|das|und|ist|nicht|ein|eine|zu|mit)\\b')) AS s_de,
       |    len(regexp_extract_all(lower(txt),
       |      '\\b(le|la|les|de|et|un|une|est|que|pour)\\b')) AS s_fr,
       |    len(regexp_extract_all(lower(txt), '[一-鿿]')) AS s_zh
       |    FROM pages)),
       |tg AS (
       |  SELECT p.host,
       |    p.rn = 1 AS url_ok,
       |    p.rn = 1 AND p.doc_id NOT IN (SELECT id_b FROM dropids)
       |      AS near_ok,
       |    p.rn = 1 AND p.doc_id NOT IN (SELECT id_b FROM dropids)
       |      AND q.score >= 0.3 AND l.pred_lang = 'en'
       |      AND q.ntok BETWEEN 5 AND 100000 AS kept,
       |    q.ntok
       |  FROM pages p JOIN qs q USING (doc_id) JOIN lg l USING (doc_id))
       |SELECT host AS domain,
       |  CAST(count(*) AS BIGINT) AS n_pages,
       |  CAST(sum(CASE WHEN url_ok THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_url_unique,
       |  CAST(sum(CASE WHEN near_ok THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_near_unique,
       |  CAST(sum(CASE WHEN kept THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       |  CAST(coalesce(sum(CASE WHEN kept THEN ntok END), 0) AS BIGINT)
       |    AS total_tokens
       |FROM tg GROUP BY host ORDER BY domain""".stripMargin

  /** [[bpeFold]] with the merge pair inlined as LITERALS (no merge CTE —
    * the frozen-merges q249 path).
    */
  private def bpeFoldLit(symExpr: String, a: String, b: String,
      sep: String = "|"): String =
    s"""list_reduce(string_split($symExpr, '$sep'), (acc, x) ->
       |    CASE WHEN (acc = '$a' OR acc LIKE '%$sep' || '$a') AND x = '$b'
       |      THEN substr(acc, 1, length(acc) - ${a.length}) || '$a' || '$b'
       |      ELSE acc || '$sep' || x END)""".stripMargin

  /** q257 oracle: the GPT-2 byte-level encode chain — the RE2-safe twin
    * of the pretokenizer (valid on this [a-z ]-pure corpus, where the
    * lookahead branch can never fire), per-char byte-encoding (ASCII:
    * only space changes, to 'Ġ'), then one literal fold per byte-level
    * merge in rank order, per-source stats at the distinct-pretoken
    * grain.
    */
  private val bpeByteLevelOracle: String = {
    val encodes = ExtByteMerges.zipWithIndex.map { case ((a, b), i) =>
      s"""b${i + 1} AS MATERIALIZED (
         |  SELECT pt, ${bpeFoldLit("sym", a, b, BSep)} AS sym
         |  FROM b$i)""".stripMargin
    }.mkString(",\n")
    val re2Twin =
      "''s|''t|''re|''ve|''m|''ll|''d| ?[A-Za-z]+| ?[0-9]+|" +
        " ?[^ A-Za-z0-9]+| +"
    s"""WITH pts AS MATERIALIZED (
       |  SELECT source, unnest(regexp_extract_all(text,
       |    '$re2Twin')) AS pt
       |  FROM documents WHERE text IS NOT NULL),
       |dict AS MATERIALIZED (SELECT DISTINCT pt FROM pts),
       |b0 AS MATERIALIZED (
       |  SELECT pt, array_to_string(list_transform(
       |      range(1, strlen(pt) + 1),
       |      i -> CASE WHEN substr(pt, CAST(i AS INT), 1) = ' '
       |           THEN '$G' ELSE substr(pt, CAST(i AS INT), 1) END),
       |    '$BSep') AS sym
       |  FROM dict),
       |$encodes,
       |benc AS MATERIALIZED (
       |  SELECT pt, CAST(len(string_split(sym, '$BSep')) AS BIGINT)
       |    AS n_pieces
       |  FROM b${ExtByteMerges.length})
       |SELECT source,
       |  count(*) AS n_pretokens,
       |  CAST(sum(strlen(pt)) AS BIGINT) AS n_bytes,
       |  CAST(sum(n_pieces) AS BIGINT) AS n_pieces,
       |  round(CAST(sum(n_pieces) AS DOUBLE)
       |    / CAST(sum(strlen(pt)) AS BIGINT), 6) AS pieces_per_byte
       |FROM pts JOIN benc USING (pt)
       |GROUP BY source ORDER BY source""".stripMargin
  }

  /** q249 oracle: the q139 encode/compression tail under the FROZEN
    * external merge table — e0 symbolize, one literal fold per merge in
    * rank order, per-source stats. ABOVE `defs` (init-order trap).
    */
  private val bpeExtMergesOracle: String = {
    val encodes = ExtMerges.zipWithIndex.map { case ((a, b), i) =>
      s"""e${i + 1} AS MATERIALIZED (
         |  SELECT w, ${bpeFoldLit("sym", a, b)} AS sym
         |  FROM e$i)""".stripMargin
    }.mkString(",\n")
    s"""WITH tok AS MATERIALIZED (
       |  SELECT source, w FROM (
       |    SELECT source, unnest(list_filter(
       |      regexp_split_to_array(trim(lower(text)), '\\s+'),
       |      x -> x <> '')) AS w
       |    FROM documents)
       |  WHERE regexp_matches(w, '^[a-z]+${"$"}') AND length(w) >= 2),
       |vocab AS MATERIALIZED (SELECT DISTINCT w FROM tok),
       |e0 AS MATERIALIZED (
       |  SELECT w, array_to_string(list_transform(range(1, length(w) + 1),
       |      i -> substr(w, CAST(i AS INT), 1)), '|') AS sym
       |  FROM vocab),
       |$encodes,
       |enc AS MATERIALIZED (
       |  SELECT w, CAST(len(string_split(sym, '|')) AS BIGINT) AS n_pieces
       |  FROM e${ExtMerges.length})
       |SELECT source,
       |  count(*) AS n_words,
       |  CAST(sum(length(w)) AS BIGINT) AS n_chars,
       |  CAST(sum(n_pieces) AS BIGINT) AS n_pieces,
       |  round(CAST(sum(n_pieces) AS DOUBLE) / CAST(sum(length(w)) AS BIGINT),
       |        6) AS pieces_per_char
       |FROM tok JOIN enc USING (w)
       |GROUP BY source ORDER BY source""".stripMargin
  }

  /** Shared learn-stage CTEs for the BPE oracles (q137/q139): word counts,
    * the top-`BpeTopWords` symbolized dictionary, and `BpeMerges` unrolled
    * rounds of pair-count argmax (m1..mN) + fold application (v1..vN).
    * Pair counts via range+unnest (the 1-based twin of Spark's
    * explode(sequence)); every CTE MATERIALIZED (the q135 lesson: plain
    * CTEs re-inline per reference).
    */
  private val bpeLearnCtes: String = {
    val rounds = (1 to BpeMerges).map { r =>
      val prev = s"v${r - 1}"
      s"""p$r AS MATERIALIZED (
         |  SELECT t[i] AS a, t[i+1] AS b, CAST(sum(c) AS BIGINT) AS cnt FROM (
         |    SELECT t, c, unnest(range(1, len(t))) AS i FROM (
         |      SELECT string_split(sym, '|') AS t, c FROM $prev))
         |  GROUP BY 1, 2),
         |m$r AS MATERIALIZED (
         |  SELECT a, b, cnt FROM p$r ORDER BY cnt DESC, a, b LIMIT 1),
         |v$r AS MATERIALIZED (
         |  SELECT ${bpeFold("sym")} AS sym, c
         |  FROM $prev, m$r AS m)""".stripMargin
    }.mkString(",\n")
    s"""wc AS MATERIALIZED (
       |  SELECT w, count(*) AS c FROM (
       |    SELECT unnest(list_filter(
       |      regexp_split_to_array(trim(lower(text)), '\\s+'),
       |      x -> x <> '')) AS w
       |    FROM documents)
       |  WHERE regexp_matches(w, '^[a-z]+${"$"}') AND length(w) >= 2
       |  GROUP BY w),
       |v0 AS MATERIALIZED (
       |  SELECT array_to_string(list_transform(range(1, length(w) + 1),
       |      i -> substr(w, CAST(i AS INT), 1)), '|') AS sym, c
       |  FROM (SELECT w, c FROM wc ORDER BY c DESC, w LIMIT $BpeTopWords)),
       |$rounds""".stripMargin
  }

  /** q137 oracle: the learned merge table itself. */
  private val bpeOracle: String = {
    val union = (1 to BpeMerges)
      .map(r => s"SELECT $r AS r, a, b, cnt FROM m$r")
      .mkString("\n  UNION ALL ")
    s"""WITH $bpeLearnCtes
       |SELECT CAST(r AS BIGINT) AS merge_rank, a AS left_sym, b AS right_sym,
       |  cnt AS pair_count, a || b AS merged
       |FROM (
       |  $union)
       |ORDER BY merge_rank""".stripMargin
  }

  /** q139 oracle: encode the DISTINCT eligible vocabulary with the learned
    * merges (e0 symbolize → e1..eN one fold per merge), then join piece
    * counts back over the token stream for per-source compression stats.
    */
  private val bpeEncodeOracle: String = {
    val encodes = (1 to BpeMerges).map { r =>
      s"""e$r AS MATERIALIZED (
         |  SELECT w, ${bpeFold("sym")} AS sym
         |  FROM e${r - 1}, m$r AS m)""".stripMargin
    }.mkString(",\n")
    s"""WITH $bpeLearnCtes,
       |tok AS MATERIALIZED (
       |  SELECT source, w FROM (
       |    SELECT source, unnest(list_filter(
       |      regexp_split_to_array(trim(lower(text)), '\\s+'),
       |      x -> x <> '')) AS w
       |    FROM documents)
       |  WHERE regexp_matches(w, '^[a-z]+${"$"}') AND length(w) >= 2),
       |vocab AS MATERIALIZED (SELECT DISTINCT w FROM tok),
       |e0 AS MATERIALIZED (
       |  SELECT w, array_to_string(list_transform(range(1, length(w) + 1),
       |      i -> substr(w, CAST(i AS INT), 1)), '|') AS sym
       |  FROM vocab),
       |$encodes,
       |enc AS MATERIALIZED (
       |  SELECT w, CAST(len(string_split(sym, '|')) AS BIGINT) AS n_pieces
       |  FROM e$BpeMerges)
       |SELECT source,
       |  count(*) AS n_words,
       |  CAST(sum(length(w)) AS BIGINT) AS n_chars,
       |  CAST(sum(n_pieces) AS BIGINT) AS n_pieces,
       |  round(CAST(sum(n_pieces) AS DOUBLE) / CAST(sum(length(w)) AS BIGINT),
       |        6) AS pieces_per_char
       |FROM tok JOIN enc USING (w)
       |GROUP BY source ORDER BY source""".stripMargin
  }

  val defs: Seq[QueryDef] = Seq(

    // ---- PII scan + redaction census over the augmented corpus
    QueryDef(
      "q83_pii_scan",
      (s, dir) => {
        val perDoc = t(s, dir, "documents")
          .select(augmentedText.as("t"))
          .select(
            Curation.piiCount(col("t"), "email").as("e"),
            Curation.piiCount(col("t"), "phone").as("p"),
            Curation.piiCount(col("t"), "ipv4").as("i"),
            md5(Curation.redactPii(col("t")).cast("binary")).as("r"))
        perDoc.agg(
          count(lit(1)).cast("long").as("n_docs"),
          sum(col("e")).as("total_emails"),
          sum(col("p")).as("total_phones"),
          sum(col("i")).as("total_ipv4"),
          sum(when(col("e") + col("p") + col("i") > 0, 1L).otherwise(0L))
            .as("docs_with_pii"),
          countDistinct(col("r")).as("n_distinct_redacted"))
      },
      Some("""WITH aug AS (
             |  SELECT text
             |    || CASE WHEN doc_id % 3 = 0 THEN ' contact user' || doc_id || '@example.com now' ELSE '' END
             |    || CASE WHEN doc_id % 5 = 0 THEN ' call +1-555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ELSE '' END
             |    || CASE WHEN doc_id % 7 = 0 THEN ' host 10.' || (doc_id % 200) || '.0.' || ((doc_id * 3) % 250) ELSE '' END AS t
             |  FROM documents),
             |c AS (SELECT
             |  len(regexp_extract_all(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS e,
             |  len(regexp_extract_all(t, '\+[0-9]{1,2}-[0-9]{3}-[0-9]{3,6}')) AS p,
             |  len(regexp_extract_all(t, '\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b')) AS i,
             |  md5(regexp_replace(regexp_replace(regexp_replace(t,
             |      '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '[EMAIL]', 'g'),
             |      '\+[0-9]{1,2}-[0-9]{3}-[0-9]{3,6}', '[PHONE]', 'g'),
             |      '\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b', '[IPV4]', 'g')) AS r
             |  FROM aug)
             |SELECT count(*) AS n_docs,
             |  CAST(sum(e) AS BIGINT) AS total_emails,
             |  CAST(sum(p) AS BIGINT) AS total_phones,
             |  CAST(sum(i) AS BIGINT) AS total_ipv4,
             |  CAST(sum(CASE WHEN e + p + i > 0 THEN 1 ELSE 0 END) AS BIGINT) AS docs_with_pii,
             |  count(DISTINCT r) AS n_distinct_redacted
             |FROM c""".stripMargin)
    ),

    // ---- Gopher-style repetition/quality rules, per document
    QueryDef(
      "q84_repetition_rules",
      (s, dir) =>
        Curation.repetitionMetrics(t(s, dir, "documents"), "doc_id", "text")
          .orderBy(col("doc_id")),
      Some("""WITH toks AS (
             |  SELECT doc_id, list_filter(regexp_split_to_array(trim(text), '\s+'),
             |                             x -> x <> '') AS t
             |  FROM documents),
             |scan AS (
             |  SELECT doc_id, len(t) AS n_words, len(list_distinct(t)) AS n_distinct,
             |    coalesce(list_sum(list_transform(t, x -> len(x))), 0) AS chars,
             |    CASE WHEN len(t) < 2 THEN []::VARCHAR[]
             |         ELSE list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i+1])
             |    END AS bg
             |  FROM toks),
             |uni AS (SELECT doc_id, w, count(*) AS c
             |        FROM (SELECT doc_id, unnest(t) AS w FROM toks) GROUP BY 1, 2),
             |top AS (SELECT doc_id, max(c) AS top_cnt FROM uni GROUP BY 1),
             |m AS (
             |  SELECT s.doc_id,
             |    CAST(s.n_words AS BIGINT) AS n_words,
             |    CAST(s.n_distinct AS BIGINT) AS n_distinct_words,
             |    CASE WHEN s.n_words = 0 THEN 0.0
             |         ELSE round(CAST(s.chars AS DOUBLE) / s.n_words, 6) END AS mean_word_len,
             |    CASE WHEN s.n_words = 0 THEN 0.0
             |         ELSE round(CAST(coalesce(top.top_cnt, 0) AS DOUBLE) / s.n_words, 6) END AS top_word_frac,
             |    CASE WHEN len(s.bg) = 0 THEN 0.0
             |         ELSE round(1.0 - CAST(len(list_distinct(s.bg)) AS DOUBLE) / len(s.bg), 6) END AS dup_bigram_frac
             |  FROM scan s LEFT JOIN top ON s.doc_id = top.doc_id)
             |SELECT doc_id, n_words, n_distinct_words, mean_word_len,
             |  top_word_frac, dup_bigram_frac,
             |  (n_words >= 5 AND mean_word_len BETWEEN 2.0 AND 12.0
             |   AND top_word_frac <= 0.2 AND dup_bigram_frac <= 0.4) AS keep
             |FROM m ORDER BY doc_id""".stripMargin)
    ),

    // ---- temperature-weighted domain mixture (alpha = 0.5 resampling)
    QueryDef(
      "q85_domain_mixture",
      (s, dir) =>
        Curation.mixtureWeights(t(s, dir, "documents"), "source")
          .orderBy(col("source")),
      Some("""WITH g AS (
             |  SELECT source, count(*) AS n_docs,
             |    CAST(round(sqrt(CAST(count(*) AS DOUBLE)), 6) AS DECIMAL(20,6)) AS w
             |  FROM documents GROUP BY 1),
             |tot AS (SELECT sum(w) AS total FROM g)
             |SELECT source, n_docs,
             |  round(CAST(w AS DOUBLE) / CAST(total AS DOUBLE), 6) AS weight
             |FROM g CROSS JOIN tot ORDER BY source""".stripMargin)
    ),

    // ---- fixed-weight logistic quality-classifier inference
    QueryDef(
      "q86_quality_classifier",
      (s, dir) => {
        val docs = t(s, dir, "documents")
        val score = Curation.logisticScore(
          Curation.qualityFeatures(col("text")),
          Curation.qualityWeights, Curation.qualityBias)
        docs
          .select(col("doc_id"), score.as("score"))
          .withColumn("keep", col("score") >= 0.5)
          .orderBy(col("doc_id"))
      },
      Some("""WITH f AS (
             |  SELECT doc_id,
             |    least(CAST(len(text) AS DOUBLE) / 500.0, 1.0) AS f1,
             |    CASE WHEN len(text) = 0 THEN 0.0
             |         ELSE CAST(len(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS DOUBLE) / len(text) END AS f2,
             |    len(list_filter(regexp_split_to_array(trim(text), '\s+'), x -> x <> '')) AS ntok,
             |    len(regexp_extract_all(lower(text), '\b(the|and|of|to|in|is|that|it|was|for)\b')) AS hits,
             |    len(regexp_replace(text, '\s+', '', 'g')) AS nchars
             |  FROM documents),
             |z AS (
             |  SELECT doc_id,
             |    round(-1.2
             |      + f1 * 0.8
             |      + f2 * 1.5
             |      + least((CASE WHEN ntok = 0 THEN 0.0 ELSE CAST(hits AS DOUBLE) / ntok END) * 5.0, 1.0) * 2.0
             |      + least((CASE WHEN ntok = 0 THEN 0.0 ELSE CAST(nchars AS DOUBLE) / ntok END) / 10.0, 1.0) * (-0.7), 6) AS zv
             |  FROM f)
             |SELECT doc_id, round(1.0 / (1.0 + exp(-zv)), 4) AS score,
             |  round(1.0 / (1.0 + exp(-zv)), 4) >= 0.5 AS keep
             |FROM z ORDER BY doc_id""".stripMargin)
    ),

    // ---- BM25 top-k retrieval over the corpus
    QueryDef(
      "q87_bm25_topk",
      (s, dir) =>
        Curation.bm25TopK(t(s, dir, "documents"), "doc_id", "text",
          terms = Seq("spark", "join", "window", "hash"),
          k = 10, k1 = 1.5, b = 0.75),
      Some("""WITH toks AS (
             |  SELECT doc_id, list_filter(regexp_split_to_array(trim(lower(text)), '\s+'),
             |                             x -> x <> '') AS t
             |  FROM documents),
             |base AS (
             |  SELECT doc_id, len(t) AS dl,
             |    [len(list_filter(t, x -> x = 'spark')),
             |     len(list_filter(t, x -> x = 'join')),
             |     len(list_filter(t, x -> x = 'window')),
             |     len(list_filter(t, x -> x = 'hash'))] AS tfs
             |  FROM toks),
             |pairs AS (
             |  SELECT doc_id, dl,
             |    (['spark','join','window','hash'])[i] AS term, tfs[i] AS tf
             |  FROM base CROSS JOIN (SELECT unnest([1, 2, 3, 4]) AS i) u
             |  WHERE tfs[i] > 0),
             |stats AS (SELECT count(*) AS n, CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl FROM base),
             |dfreq AS (SELECT term, count(*) AS dfc FROM pairs GROUP BY 1),
             |partial AS (
             |  SELECT p.doc_id,
             |    CAST(round(
             |      ln(1.0 + (n - dfc + 0.5) / (dfc + 0.5))
             |        * (tf * 2.5)
             |        / (tf + 1.5 * (0.25 + 0.75 * dl / avgdl)),
             |      6) AS DECIMAL(20,6)) AS ts
             |  FROM pairs p JOIN dfreq USING (term) CROSS JOIN stats),
             |scored AS (
             |  SELECT doc_id, round(CAST(sum(ts) AS DOUBLE), 4) AS bm25,
             |    count(*) AS n_terms_hit
             |  FROM partial GROUP BY 1)
             |SELECT doc_id, bm25, n_terms_hit,
             |  CAST(row_number() OVER (ORDER BY bm25 DESC, doc_id) AS BIGINT) AS rank
             |FROM scored ORDER BY bm25 DESC, doc_id LIMIT 10""".stripMargin)
    ),

    // ---- corpus-level top-k bigrams (heavy hitters)
    QueryDef(
      "q88_top_bigrams",
      (s, dir) =>
        Curation.topBigrams(t(s, dir, "documents"), "text", k = 20),
      Some("""WITH toks AS (
             |  SELECT list_filter(regexp_split_to_array(trim(lower(text)), '\s+'),
             |                     x -> x <> '') AS t
             |  FROM documents),
             |grams AS (
             |  SELECT unnest(list_transform(range(1, len(t)),
             |                               i -> t[i] || ' ' || t[i+1])) AS ngram
             |  FROM toks WHERE len(t) >= 2),
             |counted AS (
             |  SELECT ngram, count(*) AS cnt FROM grams GROUP BY 1)
             |SELECT ngram, cnt,
             |  CAST(row_number() OVER (ORDER BY cnt DESC, ngram) AS BIGINT) AS rank
             |FROM counted ORDER BY cnt DESC, ngram LIMIT 20""".stripMargin)
    ),

    // ---- blocklist decontamination: Bloom fast path + exact anti-join
    QueryDef(
      "q89_blocklist_filter",
      (s, dir) => {
        val withFp = t(s, dir, "documents")
          .withColumn("fp", graft.ext.TextAnalysis.fingerprintMd5(col("text")))
        val block = withFp.filter(col("doc_id") % 10 === 0).select(col("fp"))
        Curation.blocklistFilter(withFp, block, "fp", expectedItems = 100000L)
          .agg(
            count(lit(1)).cast("long").as("n_survivors"),
            sum(col("n_chars")).as("total_chars"),
            min(col("doc_id")).as("min_id"),
            max(col("doc_id")).as("max_id"))
      },
      Some("""WITH fp AS (
             |  SELECT doc_id, n_chars,
             |    md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS f
             |  FROM documents),
             |bl AS (SELECT DISTINCT f FROM fp WHERE doc_id % 10 = 0)
             |SELECT count(*) AS n_survivors,
             |  CAST(sum(n_chars) AS BIGINT) AS total_chars,
             |  min(doc_id) AS min_id, max(doc_id) AS max_id
             |FROM fp WHERE f NOT IN (SELECT f FROM bl)""".stripMargin)
    ),

    // ---- declarative data-quality rule audit: one conditional-count pass
    //      (rules = aggregate registers, not extra scans); per-rule rows
    //      exploded from the single aggregate row. Predicates chosen
    //      Spark/DuckDB-identical (comparisons only, no arithmetic)
    QueryDef(
      "q122_quality_rules",
      (s, dir) =>
        Curation.qualityRules(t(s, dir, "lineitem"), Seq(
            "discount_out_of_band" ->
              (col("l_discount") < 0 || col("l_discount") > 0.08),
            "negative_price" -> (col("l_extendedprice") < 0),
            "nonpositive_qty" -> (col("l_quantity") <= 0),
            "null_partkey" -> col("l_partkey").isNull,
            "stale_shipdate" ->
              (col("l_shipdate").cast("date") >
                lit("1997-12-31").cast("date")),
            "tax_exceeds_discount" -> (col("l_tax") > col("l_discount"))))
          .orderBy("rule"),
      Some {
        val rules = Seq(
          "discount_out_of_band" -> "l_discount < 0 OR l_discount > 0.08",
          "negative_price" -> "l_extendedprice < 0",
          "nonpositive_qty" -> "l_quantity <= 0",
          "null_partkey" -> "l_partkey IS NULL",
          "stale_shipdate" -> "CAST(l_shipdate AS DATE) > DATE '1997-12-31'",
          "tax_exceeds_discount" -> "l_tax > l_discount")
        val counters = rules.zipWithIndex.map { case ((_, p), i) =>
          s"count(*) FILTER (WHERE $p) AS v$i" }.mkString(",\n    ")
        val branches = rules.zipWithIndex.map { case ((n, _), i) =>
          s"SELECT '$n' AS rule, v$i AS n_violations, n AS n_rows, " +
            s"round(CAST(v$i AS DOUBLE) / n * CAST(100.0 AS DOUBLE), 6) " +
            "AS violation_pct FROM a"
        }.mkString("\nUNION ALL ")
        s"""WITH a AS (
           |  SELECT count(*) AS n,
           |    $counters
           |  FROM lineitem)
           |$branches
           |ORDER BY rule""".stripMargin
      }
    ),

    // ---- collocation mining by lift (PMI ranking without the log):
    //      rational-only arithmetic on exact counts → DuckDB twin replays
    //      the identical doubles; top-20 over the ≥20-count bigrams
    QueryDef(
      "q123_collocations_lift",
      (s, dir) =>
        Curation.collocationsByLift(t(s, dir, "documents"), "text",
          k = 20, minPairCount = 20L),
      Some("""WITH toks AS (
             |  SELECT list_filter(regexp_split_to_array(trim(lower(text)), '\s+'),
             |                     x -> x <> '') AS t
             |  FROM documents),
             |tot AS (
             |  SELECT CAST(sum(len(t)) AS BIGINT) AS t_tokens,
             |    CAST(sum(CASE WHEN len(t) >= 2 THEN len(t) - 1 ELSE 0 END)
             |         AS BIGINT) AS b_pairs
             |  FROM toks),
             |uc AS (
             |  SELECT w, count(*) AS uc
             |  FROM (SELECT unnest(t) AS w FROM toks) GROUP BY 1),
             |bc AS (
             |  SELECT ngram, count(*) AS pair_count
             |  FROM (SELECT unnest(list_transform(range(1, len(t)),
             |                                     i -> t[i] || ' ' || t[i+1]))
             |          AS ngram
             |        FROM toks WHERE len(t) >= 2)
             |  GROUP BY 1 HAVING count(*) >= 20),
             |j AS (
             |  SELECT ngram, pair_count,
             |    string_split(ngram, ' ')[1] AS w1,
             |    string_split(ngram, ' ')[2] AS w2
             |  FROM bc)
             |SELECT ngram, pair_count,
             |  round(((((CAST(pair_count AS DOUBLE) * t_tokens) / b_pairs)
             |          * t_tokens) / u1.uc) / u2.uc, 6) AS lift
             |FROM j JOIN uc u1 ON j.w1 = u1.w JOIN uc u2 ON j.w2 = u2.w, tot
             |ORDER BY lift DESC, ngram LIMIT 20""".stripMargin)
    ),

    // ---- dataset-lineage census per source: internal duplication (rows
    //      minus distinct fingerprints) AND external contamination
    //      (fingerprints also shipped by ≥1 other source). All joins run
    //      on the DISTINCT (source, fingerprint) table — a hash repeated
    //      by many rows still contributes at most |sources| join rows —
    //      and the per-source row count makes the audit informative even
    //      when the answer is "no cross-source duplication"
    QueryDef(
      "q126_source_lineage",
      (s, dir) => {
        val fp = t(s, dir, "documents")
          .select(col("source"), md5(col("text").cast("binary")).as("f"))
        val docCounts = fp.groupBy("source")
          .agg(count(lit(1)).cast("long").as("n_docs"))
        val sf = fp.distinct()
        val spread = sf.groupBy("f")
          .agg(count(lit(1)).cast("long").as("ns"))
        val perSource = sf.join(spread, "f")
          .groupBy("source")
          .agg(count(lit(1)).cast("long").as("n_unique_fp"),
            count(when(col("ns") >= 2, 1)).cast("long").as("n_external_fp"))
        docCounts.join(perSource, "source")
          .select(col("source"), col("n_docs"), col("n_unique_fp"),
            (col("n_docs") - col("n_unique_fp")).as("n_internal_dup_docs"),
            col("n_external_fp"),
            round(col("n_external_fp").cast("double") / col("n_unique_fp")
              * lit(100.0).cast("double"), 6).as("external_pct"))
          .orderBy("source")
      },
      Some("""WITH fp AS (SELECT source, md5(text) AS f FROM documents),
             |dc AS (SELECT source, count(*) AS n_docs FROM fp GROUP BY 1),
             |sf AS (SELECT DISTINCT source, f FROM fp),
             |spread AS (SELECT f, count(*) AS ns FROM sf GROUP BY 1),
             |ps AS (
             |  SELECT source, count(*) AS n_unique_fp,
             |    count(*) FILTER (WHERE ns >= 2) AS n_external_fp
             |  FROM sf JOIN spread USING (f) GROUP BY 1)
             |SELECT source, n_docs, n_unique_fp,
             |  n_docs - n_unique_fp AS n_internal_dup_docs,
             |  n_external_fp,
             |  round(CAST(n_external_fp AS DOUBLE) / n_unique_fp
             |        * CAST(100.0 AS DOUBLE), 6) AS external_pct
             |FROM dc JOIN ps USING (source)
             |ORDER BY source""".stripMargin)
    ),

    // ---- cross-document boilerplate removal (C4-style) at segment grain:
    //      per-source census of segments dropped because their exact text
    //      repeats across >= MinDocFreq distinct docs. Only 8-byte segment
    //      hashes shuffle for the doc-frequency count; the boilerplate set
    //      broadcasts; the doc rebuild is the one text shuffle (doc-key,
    //      linear)
    QueryDef(
      "q136_boilerplate_segments",
      (s, dir) => {
        val docs = t(s, dir, "documents")
        val cleaned = Curation.removeBoilerplateSegments(
          docs, "doc_id", "text", SegTokens, MinDocFreq)
        docs
          .select(col("doc_id"), col("source"),
            TextAnalysis.tokenCount(col("text")).as("tb"))
          .join(cleaned, "doc_id")
          .withColumn("ta", TextAnalysis.tokenCount(col("clean_text")))
          .groupBy("source")
          .agg(count(lit(1)).cast("long").as("n_docs"),
            sum("n_segments").cast("long").as("n_segments"),
            sum("n_removed").cast("long").as("n_removed"),
            sum("tb").cast("long").as("n_tokens_before"),
            sum("ta").cast("long").as("n_tokens_after"),
            count(when(col("ta") === 0 && col("tb") > 0, 1)).cast("long")
              .as("n_docs_emptied"))
          .orderBy("source")
      },
      Some(s"""WITH toks AS (
             |  SELECT doc_id, source,
             |    list_filter(regexp_split_to_array(trim(text), '\\s+'),
             |                x -> x <> '') AS t
             |  FROM documents),
             |p AS (
             |  SELECT doc_id, source, t,
             |    greatest(1, (len(t) + ${SegTokens - 1}) // $SegTokens) AS nc
             |  FROM toks),
             |x AS (SELECT doc_id, source, t, unnest(range(0, nc)) AS sid FROM p),
             |segs AS MATERIALIZED (
             |  SELECT doc_id, source, sid,
             |    array_to_string(
             |      t[sid * $SegTokens + 1 : sid * $SegTokens + $SegTokens],
             |      ' ') AS seg,
             |    len(t[sid * $SegTokens + 1 : sid * $SegTokens + $SegTokens])
             |      AS ntok
             |  FROM x),
             |boiler AS (
             |  SELECT seg FROM segs GROUP BY seg
             |  HAVING count(DISTINCT doc_id) >= $MinDocFreq),
             |flag AS (
             |  SELECT s.doc_id, s.source, s.ntok, (b.seg IS NOT NULL) AS is_b
             |  FROM segs s LEFT JOIN boiler b ON s.seg = b.seg),
             |perdoc AS (
             |  SELECT doc_id, source, count(*) AS n_segs,
             |    count(*) FILTER (WHERE is_b) AS n_rm,
             |    sum(ntok) AS tb,
             |    coalesce(sum(ntok) FILTER (WHERE NOT is_b), 0) AS ta
             |  FROM flag GROUP BY 1, 2)
             |SELECT source,
             |  count(*) AS n_docs,
             |  CAST(sum(n_segs) AS BIGINT) AS n_segments,
             |  CAST(sum(n_rm) AS BIGINT) AS n_removed,
             |  CAST(sum(tb) AS BIGINT) AS n_tokens_before,
             |  CAST(sum(ta) AS BIGINT) AS n_tokens_after,
             |  count(*) FILTER (WHERE ta = 0 AND tb > 0) AS n_docs_emptied
             |FROM perdoc GROUP BY 1 ORDER BY source""".stripMargin)
    ),

    // ---- distributed BPE vocabulary learning: first 5 merges from the
    //      word-frequency dictionary (the corpus contributes ONE shuffle —
    //      the word count — and every merge round runs on <= 200 dict
    //      rows). Greedy LTR fold identical in both engines; ties break
    //      (count DESC, left ASC, right ASC)
    QueryDef(
      "q137_bpe_merges",
      (s, dir) => {
        val ms = Bpe.learnMerges(t(s, dir, "documents"), "text",
          nMerges = BpeMerges, topWords = BpeTopWords)
        import s.implicits._
        ms.map(m => (m.rank.toLong, m.left, m.right, m.count, m.left + m.right))
          .toDF("merge_rank", "left_sym", "right_sym", "pair_count", "merged")
          .orderBy("merge_rank")
      },
      Some(bpeOracle)
    ),

    // ---- BPE corpus encode: apply the learned merges and measure the
    //      per-source compression. The fold runs once per word TYPE
    //      (distinct vocabulary), and the (word → pieces) map broadcasts
    //      back over the token stream — the corpus itself is never folded
    QueryDef(
      "q139_bpe_encode",
      (s, dir) => {
        val docs = t(s, dir, "documents")
        val merges = Bpe.learnMerges(docs, "text",
          nMerges = BpeMerges, topWords = BpeTopWords)
        val words = docs
          .select(col("source"),
            explode(TextAnalysis.tokens(lower(col("text")))).as("w"))
          .filter(col("w").rlike("^[a-z]+$") && length(col("w")) >= 2)
        val enc = Bpe.encodeVocab(words.select("w").distinct(), "w", merges)
          .select(col("w"), col("n_pieces"))
        words.join(broadcast(enc), "w")
          .groupBy("source")
          .agg(count(lit(1)).cast("long").as("n_words"),
            sum(length(col("w"))).cast("long").as("n_chars"),
            sum(col("n_pieces")).cast("long").as("n_pieces"),
            round(sum(col("n_pieces")).cast("double")
              / sum(length(col("w"))), 6).as("pieces_per_char"))
          .orderBy("source")
      },
      Some(bpeEncodeOracle)
    ),

    // ---- BPE encode under an EXTERNAL merge table (r10, q246's sibling
    //      for the GPT lineage): real pipelines tokenize with a fixed
    //      PUBLISHED merges.txt, not a corpus-learned one. The query
    //      writes the frozen table in the merges.txt format (#version
    //      header, one "left right" per line, rank = line order), loads
    //      it back through Bpe.loadMergesFile, and encodes the distinct
    //      vocabulary in rank order; the DuckDB twin folds the identical
    //      literal pairs. Rank dependence is exercised ("th e" only
    //      fires on the output of "t h") — a parse or ordering drift
    //      breaks the hash.
    QueryDef(
      "q249_bpe_ext_merges",
      (s, dir) => {
        val path = graft.util.ArtifactFiles.writeAtomic(
          "graft_q249_merges.txt", Bpe.mergesFileLines(ExtMerges))
        val merges = Bpe.loadMergesFile(s, path.toString)
        require(merges.map(m => (m.left, m.right)) == ExtMerges,
          "merges.txt round trip drifted")
        val words = t(s, dir, "documents")
          .select(col("source"),
            explode(TextAnalysis.tokens(lower(col("text")))).as("w"))
          .filter(col("w").rlike("^[a-z]+$") && length(col("w")) >= 2)
        val enc = Bpe.encodeVocab(words.select("w").distinct(), "w", merges)
          .select(col("w"), col("n_pieces"))
        words.join(broadcast(enc), "w")
          .groupBy("source")
          .agg(count(lit(1)).cast("long").as("n_words"),
            sum(length(col("w"))).cast("long").as("n_chars"),
            sum(col("n_pieces")).cast("long").as("n_pieces"),
            round(sum(col("n_pieces")).cast("double")
              / sum(length(col("w"))), 6).as("pieces_per_char"))
          .orderBy("source")
      },
      Some(bpeExtMergesOracle)
    ),

    // ---- BYTE-LEVEL BPE pretokenization + encode (r11, VERDICT r10
    //      #4 — the GPT-2 lineage q249 only approximated): the REAL
    //      published pretokenizer regex (contractions, optional-space-
    //      prefixed runs, lookahead whitespace split) segments the raw
    //      text, each pretoken's UTF-8 bytes map through the GPT-2
    //      bytes→unicode table (space → 'Ġ' — leading spaces are part
    //      of the vocabulary item), and the frozen byte-level merges
    //      fold in rank order over a round-tripped merges.txt. Encoding
    //      runs at the distinct-PRETOKEN grain (the q246/q249 scale
    //      shape); the oracle replays the chain with the RE2-safe twin
    //      regex (exact on this corpus) and per-char byte mapping.
    QueryDef(
      "q257_bpe_byte_level",
      (s, dir) => {
        val path = graft.util.ArtifactFiles.writeAtomic(
          "graft_q257_byte_merges.txt",
          Bpe.mergesFileLines(ExtByteMerges))
        val merges = Bpe.loadMergesFile(s, path.toString)
        require(merges.map(m => (m.left, m.right)) == ExtByteMerges,
          "byte-level merges.txt round trip drifted")
        val pts = t(s, dir, "documents")
          .filter(col("text").isNotNull)
          .select(col("source"),
            explode(Bpe.gpt2Pretokenize(col("text"))).as("pt"))
        val enc = Bpe.encodeVocabBytes(
            pts.select("pt").distinct(), "pt", merges)
          .select(col("pt"), col("n_pieces"))
        pts.join(broadcast(enc), "pt")
          .groupBy("source")
          .agg(count(lit(1)).cast("long").as("n_pretokens"),
            sum(octet_length(col("pt"))).cast("long").as("n_bytes"),
            sum(col("n_pieces")).cast("long").as("n_pieces"),
            round(sum(col("n_pieces")).cast("double")
              / sum(octet_length(col("pt"))), 6).as("pieces_per_byte"))
          .orderBy("source")
      },
      Some(bpeByteLevelOracle)
    ),

    // ---- URL canonicalization (r10): the web-corpus dedup key — two
    //      spellings of one resource must collapse BEFORE any exact/
    //      near-dup pass sees them. Synthetic raws (identical
    //      construction in both engines) exercise every rule: scheme/
    //      host case, www stripping, scheme-default port drop (https:443
    //      drops, http:443 KEEPS, :8080 keeps), dot-segment resolution
    //      (/./ skip, /../ pop via the string-accumulator fold —
    //      aggregate HOF ≡ list_reduce with a prepended init element),
    //      tracking-param removal (utm_*, gclid), bytewise param sort,
    //      fragment drop. The twin replays the same chain; anchored
    //      regexes keep Spark's replace-all and DuckDB's replace-first
    //      semantics identical.
    QueryDef(
      "q251_url_canonicalize",
      (s, dir) => {
        val id = col("doc_id")
        graft.ext.Curation.canonicalizeUrls(
            t(s, dir, "documents")
              .select(id, messyUrlFixture(id).as("url")), "url")
          .select(col("doc_id"), col("canonical_url"),
            col("_host").as("host"), col("_path").as("path"),
            col("_n_params").as("n_params"))
          .orderBy("doc_id")
      },
      Some(s"""WITH raw AS (
             |  SELECT doc_id,
             |    $messyUrlFixtureSql AS url
             |  FROM documents),
             |${urlCanonCtes("raw")}
             |SELECT doc_id, canonical_url, host, path, n_params
             |FROM canon ORDER BY doc_id""".stripMargin)
    ),

    // ---- HTML → text extraction (r10): the WET step every web-corpus
    //      pipeline runs before any text analysis. Each doc's text is
    //      wrapped in a real page skeleton whose script block contains
    //      `1 < 2 && 3 > 2` — a canary that shreds the naive tag regex
    //      unless script/style/comment blocks are dropped WHOLE — plus
    //      entities (&amp; decoded LAST, the double-decode pitfall).
    //      The twin replays the chain with the 'g' flag (Spark
    //      regexp_replace is always replace-all); extracted text pinned
    //      by md5, length, and word count.
    QueryDef(
      "q253_html_extract",
      (s, dir) => {
        val id = col("doc_id")
        val raw = concat(
          lit("<html><head><title>T"), (id % 9).cast("string"),
          lit("</title><style>p { color: red; }</style>" +
            "<script>var x = 1 < 2 && 3 > 2;</script></head>" +
            "<body><!-- hidden --><h1 class=\"hd\">Head&nbsp;"),
          (id % 7).cast("string"),
          lit("</h1><p>"), coalesce(col("text"), lit("")),
          lit("</p><br/><div id='d'>tail &amp; &lt;b&gt; &quot;q&quot; " +
            "&#39;s&#39;</div></body></html>"))
        t(s, dir, "documents")
          .select(id, raw.as("_raw"))
          .withColumn("_txt", graft.ext.Curation.htmlToText(col("_raw")))
          .select(id,
            length(col("_raw")).cast("long").as("n_chars_raw"),
            length(col("_txt")).cast("long").as("n_chars_text"),
            size(filter(split(col("_txt"), " "), x => x =!= ""))
              .cast("long").as("n_words"),
            md5(col("_txt").cast("binary")).as("text_md5"))
          .orderBy("doc_id")
      },
      Some(s"""WITH raw AS (
             |  SELECT doc_id,
             |    '<html><head><title>T' || (doc_id % 9)
             |      || '</title><style>p { color: red; }</style>'
             |      || '<script>var x = 1 < 2 && 3 > 2;</script></head>'
             |      || '<body><!-- hidden --><h1 class="hd">Head&nbsp;'
             |      || (doc_id % 7)
             |      || '</h1><p>' || coalesce(text, '')
             |      || '</p><br/><div id=''d''>tail &amp; &lt;b&gt; '
             |      || '&quot;q&quot; &#39;s&#39;</div></body></html>'
             |      AS raw
             |  FROM documents),
             |ext AS (
             |  SELECT doc_id, raw,
             |    ${htmlToTextSqlExpr("raw")} AS txt
             |  FROM raw)
             |SELECT doc_id,
             |  CAST(len(raw) AS BIGINT) AS n_chars_raw,
             |  CAST(len(txt) AS BIGINT) AS n_chars_text,
             |  CAST(len(list_filter(string_split(txt, ' '), x -> x <> ''))
             |    AS BIGINT) AS n_words,
             |  md5(txt) AS text_md5
             |FROM ext ORDER BY doc_id""".stripMargin)
    ),

    // ---- WARC container ingestion (r11, VERDICT r10 #1): the raw
    //      on-disk format of web curation — the missing first stage of
    //      the q251/q253 lineage. Each row builds a real 3-record WARC
    //      container (warcinfo + request + response, the crawl layout)
    //      whose response holds an HTTP message whose body holds the
    //      page HTML; Warc.records walks it back under the guarded-
    //      size discipline (Content-Length untrusted, overflow-free
    //      remaining check, abort-to-None) and Warc.httpSplit recovers
    //      status/headers/body. The DuckDB twin rebuilds the container
    //      STRING byte-for-byte (chr(13)||chr(10) line ends) and md5s
    //      it — the hash pins every byte of the encoder AND, through
    //      the parsed-back fields, the parser. Per-row work is scan-
    //      local (no shuffle before the final order); the 100× channel
    //      rides the scan-side-text budget family.
    QueryDef(
      "q254_warc_ingest",
      (s, dir) => {
        import s.implicits._
        def md5hex(b: Array[Byte]): String =
          java.security.MessageDigest.getInstance("MD5").digest(b)
            .map("%02x".format(_)).mkString
        t(s, dir, "documents")
          .filter(col("text").isNotNull)
          .select(col("doc_id"), col("text")).as[(Long, String)]
          .map { case (id, text) =>
            val uri = s"https://example.com/doc/$id"
            val body = s"<html><body><p>$text</p></body></html>"
              .getBytes("UTF-8")
            val warc = graft.ext.Warc.warcBytes(Seq(
              (Seq("WARC-Type" -> "warcinfo",
                "WARC-Record-ID" -> s"<urn:uuid:$id-info>",
                "Content-Type" -> "application/warc-fields"),
                "software: graft\r\nformat: WARC File Format 1.1\r\n"
                  .getBytes("UTF-8")),
              (Seq("WARC-Type" -> "request",
                "WARC-Record-ID" -> s"<urn:uuid:$id-req>",
                "WARC-Target-URI" -> uri,
                "Content-Type" -> "application/http; msgtype=request"),
                graft.ext.Warc.httpRequestBytes("GET", s"/doc/$id",
                  Seq("Host" -> "example.com"))),
              (Seq("WARC-Type" -> "response",
                "WARC-Record-ID" -> s"<urn:uuid:$id-resp>",
                "WARC-Target-URI" -> uri,
                "Content-Type" -> "application/http; msgtype=response"),
                graft.ext.Warc.httpResponseBytes(200, "OK",
                  Seq("Content-Type" -> "text/html"), body))))
            val recs = graft.ext.Warc.records(warc).get
            val resp = recs.find(_.recordType == "response").get
            val (status, hdrs, out) =
              graft.ext.Warc.httpSplit(resp.payload).get
            val ctype = hdrs.collectFirst {
              case (k, v) if k.equalsIgnoreCase("Content-Type") => v
            }.getOrElse("")
            val clen = hdrs.collectFirst {
              case (k, v) if k.equalsIgnoreCase("Content-Length") =>
                v.toLong
            }.getOrElse(-1L)
            (id, warc.length.toLong, md5hex(warc), recs.size.toLong,
              recs.map(_.recordType).mkString(","), resp.targetUri,
              status.toLong, ctype, clen, out.length.toLong, md5hex(out))
          }
          .toDF("doc_id", "warc_bytes", "warc_md5", "n_records",
            "rec_types", "target_uri", "status", "content_type",
            "content_length", "body_bytes", "body_md5")
          .orderBy("doc_id")
      },
      Some("""WITH nlv AS (SELECT chr(13::INT) || chr(10::INT) AS nl),
             |parts AS (
             |  SELECT doc_id, nl,
             |    'https://example.com/doc/' || doc_id AS uri,
             |    '<html><body><p>' || text || '</p></body></html>' AS body
             |  FROM documents, nlv WHERE text IS NOT NULL),
             |pay AS (
             |  SELECT doc_id, nl, uri, body,
             |    'software: graft' || nl
             |      || 'format: WARC File Format 1.1' || nl AS p1,
             |    'GET /doc/' || doc_id || ' HTTP/1.1' || nl
             |      || 'Host: example.com' || nl || nl AS p2,
             |    'HTTP/1.1 200 OK' || nl
             |      || 'Content-Type: text/html' || nl
             |      || 'Content-Length: ' || strlen(body) || nl || nl
             |      || body AS p3
             |  FROM parts),
             |recs AS (
             |  SELECT doc_id, uri, body,
             |    'WARC/1.1' || nl || 'WARC-Type: warcinfo' || nl
             |      || 'WARC-Record-ID: <urn:uuid:' || doc_id || '-info>'
             |      || nl || 'Content-Type: application/warc-fields' || nl
             |      || 'Content-Length: ' || strlen(p1) || nl || nl
             |      || p1 || nl || nl
             |    || 'WARC/1.1' || nl || 'WARC-Type: request' || nl
             |      || 'WARC-Record-ID: <urn:uuid:' || doc_id || '-req>'
             |      || nl || 'WARC-Target-URI: ' || uri || nl
             |      || 'Content-Type: application/http; msgtype=request'
             |      || nl || 'Content-Length: ' || strlen(p2) || nl || nl
             |      || p2 || nl || nl
             |    || 'WARC/1.1' || nl || 'WARC-Type: response' || nl
             |      || 'WARC-Record-ID: <urn:uuid:' || doc_id || '-resp>'
             |      || nl || 'WARC-Target-URI: ' || uri || nl
             |      || 'Content-Type: application/http; msgtype=response'
             |      || nl || 'Content-Length: ' || strlen(p3) || nl || nl
             |      || p3 || nl || nl AS warc
             |  FROM pay)
             |SELECT doc_id,
             |  CAST(strlen(warc) AS BIGINT) AS warc_bytes,
             |  md5(warc) AS warc_md5,
             |  CAST(3 AS BIGINT) AS n_records,
             |  'warcinfo,request,response' AS rec_types,
             |  uri AS target_uri,
             |  CAST(200 AS BIGINT) AS status,
             |  'text/html' AS content_type,
             |  CAST(strlen(body) AS BIGINT) AS content_length,
             |  CAST(strlen(body) AS BIGINT) AS body_bytes,
             |  md5(body) AS body_md5
             |FROM recs ORDER BY doc_id""".stripMargin)
    ),

    // ---- web-curation CAPSTONE (r11, VERDICT r10 #2 — the q207 pattern
    //      for the web lineage): ONE composed query running the whole
    //      chain a web corpus actually goes through —
    //        WARC encode→parse round trip (q254's container)
    //        → HTML→text extraction (q253's operator)
    //        → URL canonicalization (q251's operator)
    //        → URL-key exact dedup (keep lowest doc_id per canonical)
    //        → portable-minhash near-dup drop (q46's banded stage)
    //        → quality + language gate (q67/q29's scoring)
    //        → per-domain datasheet rollup.
    //      The fixture makes every stage load-bearing: raw URLs carry
    //      id-varying decorations (case, www, :443, utm junk, dot
    //      segments, fragments) that all collapse canonically, the page
    //      path is keyed on md5(text) so URL dups == exact-text dups
    //      within a domain, and the SAME text posted under two domains
    //      survives URL dedup but gets caught by minhash (a cross-host
    //      mirror). The oracle chains the already-proven CTE blocks
    //      (urlCanonCtes + htmlToTextSqlExpr + TextQueries'
    //      portableSigCtes/bandKeySql + the q67 quality and q29 langId
    //      replays) — the hash pins the COMPOSITION end-to-end.
    QueryDef(
      "q255_web_curation_capstone",
      (s, dir) => {
        import s.implicits._
        val id = col("doc_id")
        val rawUri = concat(
          when(id % 2 === 0, lit("HTTPS")).otherwise(lit("https")),
          lit("://"),
          when(id % 5 === 0, lit("WWW.")).otherwise(lit("")),
          lit("Site"), (id % 7).cast("string"), lit(".COM"),
          when(id % 3 === 0, lit(":443")).otherwise(lit("")),
          lit("/w/./x/../doc/"),
          substring(md5(col("text").cast("binary")), 1, 8),
          when(id % 2 === 0, lit("?b=2&a=1&utm_source=x"))
            .otherwise(lit("?a=1&b=2")),
          when(id % 6 === 0, lit("#frag")).otherwise(lit("")))
        val rawHtml = concat(
          lit("<html><head><title>P"), (id % 9).cast("string"),
          lit("</title><script>if (1 < 2 && 3 > 2) { x(); }</script>" +
            "</head><body><h1>Dom "),
          (id % 7).cast("string"),
          lit("</h1><p>"), col("text"),
          lit("</p><div>footer &amp; &lt;nav&gt;</div></body></html>"))
        // stage 0: real WARC bytes in, parsed fields out (per row — the
        // crawl-file grain; the container layer itself is pinned by q254)
        val parsed = t(s, dir, "documents")
          .filter(col("text").isNotNull)
          .select(id, rawUri.as("_uri"), rawHtml.as("_html"))
          // r11: spread the row-at-a-time WARC encode+parse — a
          // single-file input otherwise runs the whole typed map in ONE
          // task (the q140 scan-side lesson)
          .repartition(s.sparkContext.defaultParallelism)
          .as[(Long, String, String)]
          .map { case (i, uri, h) =>
            val warc = graft.ext.Warc.warcBytes(Seq((Seq(
              "WARC-Type" -> "response",
              "WARC-Record-ID" -> s"<urn:uuid:$i>",
              "WARC-Target-URI" -> uri,
              "Content-Type" -> "application/http; msgtype=response"),
              graft.ext.Warc.httpResponseBytes(200, "OK",
                Seq("Content-Type" -> "text/html"),
                h.getBytes("UTF-8")))))
            val rec = graft.ext.Warc.records(warc).get.head
            val (_, _, body) = graft.ext.Warc.httpSplit(rec.payload).get
            (i, rec.targetUri, new String(body, "UTF-8"))
          }
          .toDF("doc_id", "url", "html")
        // stages 1-2: WET extraction + canonical dedup key (scan-side)
        val canon = Curation.canonicalizeUrls(
          parsed.withColumn("txt", Curation.htmlToText(col("html")))
            .drop("html"),
          "url")
        // stage 3: URL-key exact dedup — keep the lowest doc_id. LAZY
        // checkpoint (r11): ranked feeds BOTH the near-dup channel and the
        // final rollup — without it the WARC parse + WET extraction +
        // canonicalization chain executed twice.
        val ranked = canon.withColumn("_rn", row_number().over(
            Window.partitionBy("canonical_url").orderBy("doc_id")))
          .localCheckpoint(false)
        // stage 4: near-dup drop among URL survivors (portable twin)
        val drops = Dedup.minHashPairsPortable(
            ranked.filter(col("_rn") === 1).select(col("doc_id"), col("txt")),
            "doc_id", "txt", threshold = 0.7)
          .select(col("id_b").as("doc_id")).distinct()
          .withColumn("_neardrop", lit(true))
        // stages 5-6: quality/lang gate + per-domain datasheet
        val tagged = ranked.join(drops, Seq("doc_id"), "left")
          .withColumn("_url_ok", col("_rn") === 1)
          .withColumn("_near_ok", col("_url_ok") && col("_neardrop").isNull)
          .withColumn("_ntok", TextAnalysis.tokenCount(col("txt")))
          .withColumn("_q", TextAnalysis.qualityScore(col("txt")))
          .withColumn("_kept", col("_near_ok") && col("_q") >= 0.3 &&
            TextAnalysis.langId(col("txt")) === "en" &&
            col("_ntok").between(5L, 100000L))
        tagged.groupBy(col("_host").as("domain"))
          .agg(count(lit(1)).cast("long").as("n_pages"),
            sum(when(col("_url_ok"), 1L).otherwise(0L)).cast("long")
              .as("n_url_unique"),
            sum(when(col("_near_ok"), 1L).otherwise(0L)).cast("long")
              .as("n_near_unique"),
            sum(when(col("_kept"), 1L).otherwise(0L)).cast("long")
              .as("n_kept"),
            coalesce(sum(when(col("_kept"), col("_ntok"))), lit(0L))
              .cast("long").as("total_tokens"))
          .orderBy("domain")
      },
      Some(webCapstoneOracleSql)
    ),

    // ---- PER-DOMAIN curation census (r11, VERDICT r10 #7): the domain-
    //      mixing decision table every web corpus needs — canonical
    //      domain (canonicalizeUrls' _host) promoted to the first-class
    //      group key, the q191 datasheet machinery rolled up per domain
    //      (volume, exact median, dup load, language mix), the exact
    //      token share, and the q85 temperature mixture weight the
    //      training sampler consumes. One chain: canon → datasheet ⋈
    //      mixtureWeights ⋈ share; the oracle composes the proven q251/
    //      q191/q85 CTE blocks over the domain key.
    QueryDef(
      "q260_domain_census",
      (s, dir) => {
        val id = col("doc_id")
        val docs = t(s, dir, "documents")
          .filter(col("text").isNotNull)
          .select(id, col("text"), col("lang"),
            messyUrlFixture(id).as("url"))
        val canon = Curation.canonicalizeUrls(docs, "url")
          .withColumn("domain", col("_host"))
        val sheet = Curation.datasheet(canon, "domain", "text", "lang")
          .withColumnRenamed("source", "domain")
        val mix = Curation.mixtureWeights(canon, "domain")
          .select(col("domain"), col("weight"))
        val total = broadcast(
          sheet.agg(sum(col("total_tokens")).as("_tt")))
        sheet.join(mix, Seq("domain"))
          .crossJoin(total)
          .withColumn("token_share",
            round(col("total_tokens").cast("double")
              / col("_tt").cast("double"), 6))
          .drop("_tt")
          .orderBy("domain")
      },
      Some(domainCensusOracleSql)
    ),

    // ---- LINK-GRAPH extraction + domain PageRank (r11): the crawl-
    //      frontier half of web curation — anchor hrefs pulled from the
    //      page HTML (both quote styles, attribute junk tolerated),
    //      canonicalized with the SAME rule chain as the page URLs, and
    //      folded into a distinct domain→domain edge list that the q99
    //      PageRank machinery ranks (DECIMAL-routed contributions, 3
    //      iterations). Per-domain readout: raw link volume, distinct
    //      out/in domains, rank. The oracle runs the canon chain TWICE
    //      (page URLs + link targets, suffix-parameterized CTEs) and
    //      replays the q99 iteration chain on the tiny domain graph.
    QueryDef(
      "q261_link_graph_pagerank",
      (s, dir) => {
        val id = col("doc_id")
        def linkUrl(tgt: Column): Column = concat(
          lit("https://WWW.Site"), tgt.cast("string"),
          lit(".COM:443/Ref/./x/../p"), (id % 5).cast("string"),
          lit("?utm_campaign=z&a=1#top"))
        val html = concat(
          lit("<html><body><p>"), col("text"),
          lit("</p><a href=\""), linkUrl((id + 1) % 7),
          lit("\">n1</a><a class='x' href='"),
          linkUrl((id * 2 + 3) % 7), lit("'>n2</a>"),
          when(id % 5 === 0,
            concat(lit("<a href=\""), linkUrl((id + 4) % 7),
              lit("\">n3</a>"))).otherwise(lit("")),
          lit("</body></html>"))
        val docs = t(s, dir, "documents").filter(col("text").isNotNull)
          .select(id, messyUrlFixture(id).as("url"), html.as("_html"))
        val own = Curation.canonicalizeUrls(docs, "url")
          .select(id, col("_host").as("src_domain"), col("_html"))
        val pat = "(?i)<a\\s[^>]*href=[\"']([^\"']+)[\"']"
        val links = own.select(col("doc_id"), col("src_domain"),
          explode(regexp_extract_all(col("_html"), lit(pat), lit(1)))
            .as("href"))
        val dst = Curation.canonicalizeUrls(links, "href")
          .select(col("doc_id"), col("src_domain"),
            col("_host").as("dst_domain"))
        val edges = dst.select("src_domain", "dst_domain").distinct()
          .localCheckpoint(true)
        // |domains|-sized dim — the partitionless window sees a handful
        // of rows, never the corpus
        val dim = edges.select(col("src_domain").as("domain"))
          .union(edges.select(col("dst_domain")))
          .distinct()
          .withColumn("nid",
            row_number().over(Window.orderBy("domain")).cast("long"))
          .localCheckpoint(true)
        val eIds = edges
          .join(dim.select(col("domain").as("src_domain"),
            col("nid").as("sid")), "src_domain")
          .join(dim.select(col("domain").as("dst_domain"),
            col("nid").as("did")), "dst_domain")
          .select("sid", "did")
        val ranks = graft.ext.Graph.pageRank(eIds, "sid", "did",
          iterations = 3, assumeDistinct = true)
        val outLinks = dst.groupBy("src_domain")
          .agg(count(lit(1)).cast("long").as("n_links"))
        val outDeg = edges.groupBy("src_domain")
          .agg(count(lit(1)).cast("long").as("out_domains"))
        val inDeg = edges.groupBy("dst_domain")
          .agg(count(lit(1)).cast("long").as("in_domains"))
        dim.join(ranks, dim("nid") === ranks("node"))
          .join(outLinks.withColumnRenamed("src_domain", "domain"),
            Seq("domain"), "left")
          .join(outDeg.withColumnRenamed("src_domain", "domain"),
            Seq("domain"), "left")
          .join(inDeg.withColumnRenamed("dst_domain", "domain"),
            Seq("domain"), "left")
          .select(col("domain"),
            coalesce(col("n_links"), lit(0L)).as("n_links"),
            coalesce(col("out_domains"), lit(0L)).as("out_domains"),
            coalesce(col("in_domains"), lit(0L)).as("in_domains"),
            round(col("r"), 10).as("rank"))
          .orderBy("domain")
      },
      Some(linkGraphOracleSql)
    ),

    // ---- IN-ENGINE quality-classifier TRAINING (r11, VERDICT r10 #3):
    //      distill the heuristic quality gate into a linear classifier
    //      over hashed-unigram relative frequencies — 3 unrolled batch-
    //      GD steps with the RATIONAL fast-sigmoid link (no libm),
    //      quantized integer sufficient-stat sums (order-independent),
    //      fixed-shape driver-side weight updates. The oracle replays
    //      the entire training as chained CTEs (the FA-EM/Bradley-Terry
    //      pattern): per-iteration loss strictly decreases IN THE DATA
    //      and every weight double is bit-identical. Production-width
    //      sparse training (2^12 buckets, xxhash64, broadcast weight
    //      dim) is the x256 channel.
    QueryDef(
      "q256_quality_classifier_train",
      (s, dir) =>
        graft.ext.QualityClassifier.trainDense(
          t(s, dir, "documents").filter(col("text").isNotNull),
          "text",
          TextAnalysis.qualityScore(col("text")) >= 0.65,
          nBuckets = 16, iters = 3, lr = 0.5, portable = true)
          .orderBy("iter"),
      Some(qcTrainOracleSql)
    ),

    // ---- bigram-LM surprisal signals (the perplexity-filter family in
    //      rational arithmetic): corpus-learned absolute-discount bigram
    //      probabilities scored back per document. min/avg/low-count
    //      signals rank docs like mean log-prob without any libm call;
    //      per-doc sums DECIMAL-routed (order-independent)
    QueryDef(
      "q142_bigram_lm_surprisal",
      (s, dir) =>
        TextAnalysis.bigramLmScores(t(s, dir, "documents"), "doc_id", "text"),
      Some("""WITH toks AS (
             |  SELECT doc_id, list_filter(
             |    regexp_split_to_array(trim(lower(text)), '\s+'),
             |    x -> x <> '') AS w
             |  FROM documents),
             |bge AS (
             |  SELECT doc_id, w[i] AS w1, w[i + 1] AS w2
             |  FROM (SELECT doc_id, w, unnest(range(1, len(w))) AS i
             |        FROM toks WHERE len(w) >= 2)),
             |big AS (SELECT w1, w2, count(*) AS c12 FROM bge GROUP BY 1, 2),
             |ctx AS (SELECT w1, sum(c12) AS c1, count(*) AS n1p
             |        FROM big GROUP BY 1),
             |uni AS (SELECT u AS w2, count(*) AS c2
             |        FROM (SELECT unnest(w) AS u FROM toks) GROUP BY 1),
             |tot AS (SELECT sum(c2) AS t FROM uni),
             |lm AS (
             |  SELECT b.w1, b.w2,
             |    ((CAST(c12 AS DOUBLE) - CAST(0.5 AS DOUBLE))
             |      + CAST(0.5 AS DOUBLE) * CAST(n1p AS DOUBLE)
             |        * (CAST(c2 AS DOUBLE) / CAST(t AS DOUBLE)))
             |      / CAST(c1 AS DOUBLE) AS p
             |  FROM big b JOIN ctx USING (w1) JOIN uni ON b.w2 = uni.w2, tot)
             |SELECT doc_id,
             |  CAST(count(*) AS BIGINT) AS n_bigrams,
             |  round(min(p), 6) AS min_p,
             |  round(CAST(sum(CAST(round(p, 9) AS DECIMAL(18,9))) AS DOUBLE)
             |        / count(*), 6) AS avg_p,
             |  CAST(count(*) FILTER (p < CAST(0.01 AS DOUBLE)) AS BIGINT)
             |    AS n_low
             |FROM bge JOIN lm USING (w1, w2)
             |GROUP BY doc_id ORDER BY doc_id""".stripMargin)
    ),

    // ---- token-budget water-filling: fill B = total DIV 2 tokens across
    //      sources at a common level θ (small sources give everything,
    //      big ones cap at θ) — the budgeted form of domain mixing. The
    //      sweep runs on the |sources|-row table; one corpus aggregate
    QueryDef(
      "q144_token_budget_waterfill",
      (s, dir) =>
        Curation.tokenBudgetAllocation(t(s, dir, "documents"),
          "source", "text"),
      Some("""WITH counts AS (
             |  SELECT source, CAST(sum(len(list_filter(
             |    regexp_split_to_array(trim(text), '\s+'),
             |    x -> x <> ''))) AS BIGINT) AS n
             |  FROM documents GROUP BY source),
             |tot AS (SELECT CAST(sum(n) AS BIGINT) AS t,
             |        CAST(count(*) AS BIGINT) AS m,
             |        CAST(min(n) AS BIGINT) AS minn FROM counts),
             |ord AS (SELECT source, n,
             |        row_number() OVER (ORDER BY n, source) AS i,
             |        sum(n) OVER (ORDER BY n, source) AS cum,
             |        lead(n, 1) OVER (ORDER BY n, source) AS lead_n
             |        FROM counts),
             |cands AS (
             |  SELECT CAST(i AS BIGINT) AS i, CAST(cum AS BIGINT) AS cum,
             |         n AS ni, lead_n FROM ord
             |  UNION ALL
             |  SELECT 0, 0, NULL, minn FROM tot),
             |sel AS (
             |  SELECT CAST(((t * 1) // 2) - cum AS DOUBLE)
             |           / CAST(m - i AS DOUBLE) AS theta,
             |         CAST((t * 1) // 2 AS BIGINT) AS b
             |  FROM cands, tot
             |  WHERE (ni IS NULL OR
             |      CAST(((t * 1) // 2) - cum AS DOUBLE)
             |        / CAST(m - i AS DOUBLE) >= CAST(ni AS DOUBLE))
             |    AND (lead_n IS NULL OR
             |      CAST(((t * 1) // 2) - cum AS DOUBLE)
             |        / CAST(m - i AS DOUBLE) <= CAST(lead_n AS DOUBLE))
             |  ORDER BY i LIMIT 1)
             |SELECT source, n AS n_tokens, b AS budget,
             |  round(least(CAST(n AS DOUBLE), theta), 4) AS allocated,
             |  CAST(n AS DOUBLE) <= theta AS saturated
             |FROM counts, sel ORDER BY source""".stripMargin)
    ),

    // ---- per-source dataset datasheet (the published corpus card):
    //      volume, exact median tokens, within-source exact-dup load,
    //      language mix with deterministic top-language pick
    QueryDef(
      "q191_dataset_datasheet",
      (s, dir) =>
        Curation.datasheet(t(s, dir, "documents"), "source", "text", "lang"),
      Some("""WITH tok AS (SELECT source, lang, md5(text) AS h,
             |    CAST(len(list_filter(regexp_split_to_array(trim(text), '\s+'),
             |      x -> x <> '')) AS BIGINT) AS nt
             |  FROM documents),
             |base AS (SELECT source, count(*) AS n_docs,
             |    sum(nt)::BIGINT AS total_tokens,
             |    round(quantile_cont(nt, 0.5), 1) AS median_tokens
             |  FROM tok GROUP BY source),
             |hg AS (SELECT source, h, count(*) AS n FROM tok GROUP BY 1, 2),
             |dups AS (SELECT source,
             |    sum(CASE WHEN n > 1 THEN n ELSE 0 END)::BIGINT AS dup_docs
             |  FROM hg GROUP BY source),
             |lg AS (SELECT source, lang, count(*) AS ln FROM tok GROUP BY 1, 2),
             |nl AS (SELECT source, count(*) AS n_langs FROM lg GROUP BY source),
             |top AS (SELECT source, lang AS top_lang, ln FROM (
             |    SELECT *, row_number() OVER (PARTITION BY source
             |      ORDER BY ln DESC, lang) AS rn FROM lg) WHERE rn = 1)
             |SELECT b.source, b.n_docs, b.total_tokens, b.median_tokens,
             |  d.dup_docs, nl.n_langs, top.top_lang,
             |  round(CAST(100.0 AS DOUBLE) * top.ln::DOUBLE /
             |    b.n_docs::DOUBLE, 2) AS top_lang_pct
             |FROM base b JOIN dups d USING (source)
             |JOIN nl USING (source) JOIN top USING (source)
             |ORDER BY source""".stripMargin)
    ),

    // ---- length-bucketed batching plan: docs → smallest power-of-two
    //      token bucket; per bucket the padding waste and batch count a
    //      4096-token budget yields, plus the ~global pad-to-max row the
    //      bucketing is beating. All integer math (ceil via
    //      (a+b−1) div b; DuckDB // truncates identically on positives).
    QueryDef(
      "q198_length_bucket_batching",
      (s, dir) =>
        Curation.lengthBucketBatching(t(s, dir, "documents"), "text",
          batchTokens = 4096),
      Some("""WITH tok AS (SELECT
             |    CAST(len(list_filter(regexp_split_to_array(trim(text), '\s+'),
             |      x -> x <> '')) AS BIGINT) AS n
             |  FROM documents),
             |b AS (SELECT n,
             |    CASE WHEN n <= 16 THEN 16 WHEN n <= 32 THEN 32
             |      WHEN n <= 64 THEN 64 WHEN n <= 128 THEN 128
             |      ELSE 256 END AS bk
             |  FROM tok),
             |per AS (SELECT 'b' || lpad(bk::VARCHAR, 3, '0') AS bucket_label,
             |    bk AS bucket, count(*) AS n_docs, sum(n) AS sum_tokens,
             |    sum((n + bk - 1) // bk) AS nsegs
             |  FROM b GROUP BY 1, 2),
             |gall AS (SELECT '~global' AS bucket_label, max(n) AS bucket,
             |    count(*) AS n_docs, sum(n) AS sum_tokens,
             |    count(*) AS nsegs
             |  FROM tok),
             |u AS (SELECT * FROM per UNION ALL SELECT * FROM gall),
             |w AS (SELECT bucket_label, bucket, n_docs, sum_tokens, nsegs,
             |    nsegs * bucket AS padded_tokens,
             |    nsegs * bucket - sum_tokens AS waste_tokens
             |  FROM u)
             |SELECT bucket_label, CAST(bucket AS BIGINT) AS bucket,
             |  CAST(n_docs AS BIGINT) AS n_docs,
             |  CAST(sum_tokens AS BIGINT) AS sum_tokens,
             |  CAST(padded_tokens AS BIGINT) AS padded_tokens,
             |  CAST(waste_tokens AS BIGINT) AS waste_tokens,
             |  round(CAST(100.0 AS DOUBLE) * CAST(waste_tokens AS DOUBLE) /
             |    CAST(padded_tokens AS DOUBLE), 4) AS waste_pct,
             |  CAST((nsegs + greatest(1, 4096 // bucket) - 1) //
             |    greatest(1, 4096 // bucket) AS BIGINT) AS n_batches
             |FROM w ORDER BY bucket_label""".stripMargin)
    ),

    // ---- mixture REWEIGHTING + effective sample size: importance
    //      weights reshaping the observed source mix into a
    //      descending-linear target, ESS = (Σnw)²/(Σnw²) via the
    //      driver-side ascending fold whose DuckDB twin is an ordered
    //      list_sum (q182/q184 pattern) — identical IEEE sequences.
    QueryDef(
      "q202_mixture_reweighting",
      (s, dir) =>
        graft.ext.Sampling.mixtureReweight(t(s, dir, "documents"), "source"),
      Some("""WITH src AS (SELECT source, count(*) AS n FROM documents
             |  GROUP BY 1),
             |tot AS (SELECT CAST(sum(n) AS BIGINT) AS nn, count(*) AS k
             |  FROM src),
             |rk AS (SELECT source, n,
             |    row_number() OVER (ORDER BY source) AS r
             |  FROM src),
             |w AS (SELECT rk.source, rk.n,
             |    CAST(tot.k + 1 - rk.r AS DOUBLE) /
             |      CAST((tot.k * (tot.k + 1)) // 2 AS DOUBLE) AS tf,
             |    tot.nn
             |  FROM rk, tot),
             |w2 AS (SELECT source, n, tf,
             |    tf / (CAST(n AS DOUBLE) / CAST(nn AS DOUBLE)) AS wt
             |  FROM w),
             |e AS (SELECT
             |    list_sum(list(CAST(n AS DOUBLE) * wt ORDER BY source))
             |      AS s1,
             |    list_sum(list(CAST(n AS DOUBLE) * wt * wt ORDER BY source))
             |      AS s2
             |  FROM w2)
             |SELECT source, CAST(n AS BIGINT) AS n_docs, tf AS target_frac,
             |  wt AS weight, CAST(n AS DOUBLE) * wt AS eff_docs,
             |  e.s1 * e.s1 / e.s2 AS corpus_ess
             |FROM w2, e ORDER BY source""".stripMargin)
    ),

    // ---- CURRICULUM mixing schedule: natural→target interpolation per
    //      epoch (e/4 is exact dyadic), integer token quotas via
    //      LARGEST-REMAINDER apportionment — every epoch sums to exactly
    //      the budget (SamplingSpec pins it), and the remainder ranking
    //      is an IEEE sort both engines order identically.
    QueryDef(
      "q204_curriculum_schedule",
      (s, dir) =>
        graft.ext.Sampling.curriculumSchedule(t(s, dir, "documents"),
          "source", epochs = 4, budget = 100000L),
      Some("""WITH src AS (SELECT source, count(*) AS n FROM documents
             |  GROUP BY 1),
             |tot AS (SELECT CAST(sum(n) AS BIGINT) AS nn, count(*) AS k
             |  FROM src),
             |rk AS (SELECT source, n,
             |    row_number() OVER (ORDER BY source) AS r
             |  FROM src),
             |sh AS (SELECT rk.source,
             |    CAST(rk.n AS DOUBLE) / CAST(tot.nn AS DOUBLE) AS nat,
             |    CAST(tot.k + 1 - rk.r AS DOUBLE) /
             |      CAST((tot.k * (tot.k + 1)) // 2 AS DOUBLE) AS tgt
             |  FROM rk, tot),
             |ep AS (SELECT CAST(e AS BIGINT) AS epoch
             |  FROM generate_series(1, 4) t(e)),
             |s2 AS (SELECT epoch, source,
             |    nat + (tgt - nat) * (CAST(epoch AS DOUBLE) /
             |      CAST(4 AS DOUBLE)) AS share
             |  FROM sh, ep),
             |q AS (SELECT epoch, source, share,
             |    CAST(100000 AS DOUBLE) * share AS raw
             |  FROM s2),
             |q2 AS (SELECT epoch, source, share, raw, floor(raw) AS base,
             |    raw - floor(raw) AS rem
             |  FROM q),
             |q3 AS (SELECT *,
             |    100000 - sum(base) OVER (PARTITION BY epoch) AS leftv,
             |    row_number() OVER (PARTITION BY epoch
             |      ORDER BY rem DESC, source) AS rk2
             |  FROM q2)
             |SELECT epoch, source, share,
             |  CAST(base + CASE WHEN rk2 <= leftv THEN 1 ELSE 0 END
             |    AS BIGINT) AS quota_tokens
             |FROM q3 ORDER BY epoch, source""".stripMargin)
    ),

    // ---- TRAINING-PLAN capstone: the operators COMPOSE — exact dedup
    //      (q23) → mixture reweighting (q202) → final-epoch quota
    //      apportionment (q204) → batch math (q198), one per-source plan
    //      table from one survivors scan. The oracle chains the same four
    //      proven CTE blocks, so the hash pins the composition, not just
    //      the pieces.
    QueryDef(
      "q207_training_plan",
      (s, dir) => {
        val docs = t(s, dir, "documents")
        // consumed by reweight + schedule + token sums: checkpoint once
        val survivors = graft.ext.Dedup
          .exact(docs, "doc_id", Seq("text")).localCheckpoint(true)
        val rw = graft.ext.Sampling.mixtureReweight(survivors, "source")
          .select(col("source"), col("n_docs"), col("weight"))
        val sched = graft.ext.Sampling
          .curriculumSchedule(survivors, "source",
            epochs = 4, budget = 100000L)
          .filter(col("epoch") === 4)
          .select(col("source"), col("quota_tokens"))
        val toks = survivors.groupBy("source")
          .agg(sum(TextAnalysis.tokenCount(col("text"))).cast("long")
            .as("sum_tokens"))
        rw.join(sched, Seq("source")).join(toks, Seq("source"))
          .select(col("source"), col("n_docs"), col("sum_tokens"),
            col("weight"), col("quota_tokens"),
            expr("(least(quota_tokens, sum_tokens) + 4095) div 4096")
              .cast("long").as("planned_batches"))
          .orderBy("source")
      },
      Some("""WITH ranked AS (SELECT *,
             |    row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id)
             |      AS rn
             |  FROM documents),
             |s0 AS (SELECT * FROM ranked WHERE rn = 1),
             |src AS (SELECT source, count(*) AS n FROM s0 GROUP BY 1),
             |tot AS (SELECT CAST(sum(n) AS BIGINT) AS nn, count(*) AS k
             |  FROM src),
             |rk AS (SELECT source, n,
             |    row_number() OVER (ORDER BY source) AS r
             |  FROM src),
             |w AS (SELECT rk.source, rk.n,
             |    CAST(rk.n AS DOUBLE) / CAST(tot.nn AS DOUBLE) AS nat,
             |    CAST(tot.k + 1 - rk.r AS DOUBLE) /
             |      CAST((tot.k * (tot.k + 1)) // 2 AS DOUBLE) AS tf,
             |    tot.nn
             |  FROM rk, tot),
             |w2 AS (SELECT source, n, nat, tf,
             |    tf / (CAST(n AS DOUBLE) / CAST(nn AS DOUBLE)) AS wt
             |  FROM w),
             |sh AS (SELECT source, n, wt,
             |    nat + (tf - nat) * (CAST(4 AS DOUBLE) / CAST(4 AS DOUBLE))
             |      AS share
             |  FROM w2),
             |q AS (SELECT source, n, wt,
             |    CAST(100000 AS DOUBLE) * share AS raw
             |  FROM sh),
             |q2 AS (SELECT *, floor(raw) AS base, raw - floor(raw) AS rem
             |  FROM q),
             |q3 AS (SELECT *,
             |    100000 - sum(base) OVER () AS leftv,
             |    row_number() OVER (ORDER BY rem DESC, source) AS rk2
             |  FROM q2),
             |qv AS (SELECT source, n, wt,
             |    CAST(base + CASE WHEN rk2 <= leftv THEN 1 ELSE 0 END
             |      AS BIGINT) AS quota
             |  FROM q3),
             |toks AS (SELECT source,
             |    CAST(sum(len(list_filter(
             |      regexp_split_to_array(trim(text), '\s+'),
             |      x -> x <> ''))) AS BIGINT) AS sum_tokens
             |  FROM s0 GROUP BY 1)
             |SELECT qv.source, CAST(qv.n AS BIGINT) AS n_docs,
             |  toks.sum_tokens, qv.wt AS weight,
             |  qv.quota AS quota_tokens,
             |  CAST((least(qv.quota, toks.sum_tokens) + 4095) // 4096
             |    AS BIGINT) AS planned_batches
             |FROM qv JOIN toks USING (source)
             |ORDER BY source""".stripMargin)
    ),

    // ---- SCHEDULE REALIZATION: the loader's half of q204 — per (epoch,
    //      source), greedily admit docs in portable-hash order until the
    //      cumulative token count reaches the epoch quota (prefix fill:
    //      a doc enters iff the running sum THROUGH it stays ≤ quota).
    //      Deterministic shuffle order + integer cumsum ⇒ byte-identical
    //      epochs on any cluster; windows partition on (epoch, source).
    QueryDef(
      "q208_schedule_realization",
      (s, dir) => {
        val docs = t(s, dir, "documents")
        val sched = graft.ext.Sampling
          .curriculumSchedule(docs, "source", epochs = 4, budget = 100000L)
          .select(col("epoch"), col("source"), col("quota_tokens"))
        val toks = docs.select(col("source"),
          graft.ext.Dedup.portableHash60(col("doc_id").cast("string"))
            .as("_h"),
          TextAnalysis.tokenCount(col("text")).as("_nt"))
        // explicit ROWS frame: the default RANGE frame would hand hash-tie
        // peers one shared cum value while the oracle pins ROWS (ADVICE r4)
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("epoch", "source").orderBy("_h")
          .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
            org.apache.spark.sql.expressions.Window.currentRow)
        val filled = toks.join(broadcast(sched), Seq("source"))
          .withColumn("_cum", sum(col("_nt")).over(w))
          .filter(col("_cum") <= col("quota_tokens"))
        filled.groupBy("epoch", "source", "quota_tokens")
          .agg(count(lit(1)).cast("long").as("n_docs_selected"),
            sum(col("_nt")).cast("long").as("tokens_selected"))
          .select(col("epoch"), col("source"), col("quota_tokens"),
            col("n_docs_selected"), col("tokens_selected"),
            round(lit(100.0) * col("tokens_selected").cast("double") /
              col("quota_tokens").cast("double"), 2).as("fill_pct"))
          .orderBy("epoch", "source")
      },
      Some("""WITH src AS (SELECT source, count(*) AS n FROM documents
             |  GROUP BY 1),
             |tot AS (SELECT CAST(sum(n) AS BIGINT) AS nn, count(*) AS k
             |  FROM src),
             |rk AS (SELECT source, n,
             |    row_number() OVER (ORDER BY source) AS r
             |  FROM src),
             |sh AS (SELECT rk.source,
             |    CAST(rk.n AS DOUBLE) / CAST(tot.nn AS DOUBLE) AS nat,
             |    CAST(tot.k + 1 - rk.r AS DOUBLE) /
             |      CAST((tot.k * (tot.k + 1)) // 2 AS DOUBLE) AS tgt
             |  FROM rk, tot),
             |ep AS (SELECT CAST(e AS BIGINT) AS epoch
             |  FROM generate_series(1, 4) t(e)),
             |s2 AS (SELECT epoch, source,
             |    nat + (tgt - nat) * (CAST(epoch AS DOUBLE) /
             |      CAST(4 AS DOUBLE)) AS share
             |  FROM sh, ep),
             |q AS (SELECT epoch, source,
             |    CAST(100000 AS DOUBLE) * share AS raw
             |  FROM s2),
             |q2 AS (SELECT epoch, source, raw, floor(raw) AS base,
             |    raw - floor(raw) AS rem
             |  FROM q),
             |q3 AS (SELECT *,
             |    100000 - sum(base) OVER (PARTITION BY epoch) AS leftv,
             |    row_number() OVER (PARTITION BY epoch
             |      ORDER BY rem DESC, source) AS rk2
             |  FROM q2),
             |sched AS (SELECT epoch, source,
             |    CAST(base + CASE WHEN rk2 <= leftv THEN 1 ELSE 0 END
             |      AS BIGINT) AS quota
             |  FROM q3),
             |toks AS (SELECT source,
             |    ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
             |      AS h,
             |    CAST(len(list_filter(
             |      regexp_split_to_array(trim(text), '\s+'),
             |      x -> x <> '')) AS BIGINT) AS nt
             |  FROM documents),
             |filled AS (SELECT s.epoch, s.source, s.quota, t.nt,
             |    sum(t.nt) OVER (PARTITION BY s.epoch, s.source
             |      ORDER BY t.h
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
             |  FROM toks t JOIN sched s ON s.source = t.source),
             |sel AS (SELECT * FROM filled WHERE cum <= quota)
             |SELECT epoch, source, quota AS quota_tokens,
             |  CAST(count(*) AS BIGINT) AS n_docs_selected,
             |  CAST(sum(nt) AS BIGINT) AS tokens_selected,
             |  round(CAST(100.0 AS DOUBLE) *
             |    CAST(sum(nt) AS DOUBLE) / CAST(quota AS DOUBLE), 2)
             |    AS fill_pct
             |FROM sel GROUP BY epoch, source, quota
             |ORDER BY epoch, source""".stripMargin)
    ),

    // ---- k-ANONYMITY / l-DIVERSITY release audit: equivalence classes of
    //      the (segment, nation) quasi-identifier over customers, with the
    //      banded account balance as the sensitive attribute — class size
    //      ≥ k and ≥ l distinct sensitive values gate a privacy-safe
    //      export. Counts shuffle, rows don't; one exact distinct per agg.
    QueryDef(
      "q218_k_anonymity_audit",
      (s, dir) => {
        val c = t(s, dir, "customer")
          .select(col("c_mktsegment"),
            col("c_nationkey").cast("long").as("c_nationkey"),
            floor(col("c_acctbal") / lit(1000.0).cast("double"))
              .cast("long").as("_band"))
        Curation.kAnonymityCensus(c,
          Seq("c_mktsegment", "c_nationkey"), "_band", k = 50, l = 5)
      },
      Some("""SELECT c_mktsegment,
             |  CAST(c_nationkey AS BIGINT) AS c_nationkey,
             |  CAST(count(*) AS BIGINT) AS n_rows,
             |  CAST(count(DISTINCT CAST(floor(c_acctbal /
             |    CAST(1000.0 AS DOUBLE)) AS BIGINT)) AS BIGINT)
             |    AS n_sensitive,
             |  count(*) >= 50 AS k_anonymous,
             |  CAST(count(DISTINCT CAST(floor(c_acctbal /
             |    CAST(1000.0 AS DOUBLE)) AS BIGINT)) AS BIGINT) >= 5
             |    AS l_diverse
             |FROM customer
             |GROUP BY c_mktsegment, c_nationkey
             |ORDER BY c_mktsegment NULLS FIRST, c_nationkey NULLS FIRST"""
        .stripMargin)
    ),

    // ---- GENERALIZATION LADDER companion to q218: audit the whole domain
    //      hierarchy for the (segment, nation, balance) quasi-identifier
    //      in one query and mark the first level meeting k=25 — the
    //      release decision, with per-level suppression cost. One
    //      partial-agg groupBy per level (class keys + counts shuffle,
    //      rows never); the marking broadcasts a 1-row minimum.
    QueryDef(
      "q221_anonymization_ladder",
      (s, dir) => {
        val c = t(s, dir, "customer")
        val nation = col("c_nationkey").cast("long")
        val seg = col("c_mktsegment")
        val bal = col("c_acctbal").cast("double")
        Curation.anonymizationLadder(c,
          Seq(
            "balance_exact" -> Seq(seg, nation, bal),
            "balance_100" ->
              Seq(seg, nation, floor(bal / lit(100.0).cast("double"))),
            "balance_1000" ->
              Seq(seg, nation, floor(bal / lit(1000.0).cast("double"))),
            "drop_balance" -> Seq(seg, nation),
            "segment_only" -> Seq(seg)),
          k = 25)
      },
      Some {
        val levels = Seq(
          ("balance_exact",
            "c_mktsegment, CAST(c_nationkey AS BIGINT), CAST(c_acctbal AS DOUBLE)"),
          ("balance_100",
            "c_mktsegment, CAST(c_nationkey AS BIGINT), floor(CAST(c_acctbal AS DOUBLE) / CAST(100.0 AS DOUBLE))"),
          ("balance_1000",
            "c_mktsegment, CAST(c_nationkey AS BIGINT), floor(CAST(c_acctbal AS DOUBLE) / CAST(1000.0 AS DOUBLE))"),
          ("drop_balance", "c_mktsegment, CAST(c_nationkey AS BIGINT)"),
          ("segment_only", "c_mktsegment"))
        val perLevel = levels.zipWithIndex.map { case ((nm, keys), i) =>
          s"""a$i AS (SELECT CAST($i AS BIGINT) AS level,
             |  '$nm' AS level_name,
             |  CAST(count(*) AS BIGINT) AS n_classes,
             |  CAST(min(sz) AS BIGINT) AS min_class_size,
             |  CAST(coalesce(sum(sz) FILTER (WHERE sz < 25), 0) AS BIGINT)
             |    AS rows_below_k,
             |  min(sz) >= 25 AS meets_k
             |FROM (SELECT count(*) AS sz FROM customer GROUP BY $keys))"""
            .stripMargin
        }.mkString(",\n")
        val union = levels.indices.map(i => s"SELECT * FROM a$i")
          .mkString(" UNION ALL ")
        s"""WITH $perLevel,
           |u AS ($union),
           |fl AS (SELECT coalesce(min(level) FILTER (WHERE meets_k), -1)
           |  AS _first FROM u)
           |SELECT u.*, u.level = fl._first AS chosen
           |FROM u, fl ORDER BY level""".stripMargin
      })
  )
}
