package graft.queries

import org.apache.spark.sql.functions._
import graft.ext.Sketches
import graft.queries.Q._

/** Mergeable-sketch operators (q178-q180): KMV distinct-count sketches,
  * Bloom membership pre-filtering, and the HLL accuracy certification.
  * The KMV/Bloom math runs on the portable md5-derived hash, so even the
  * ESTIMATES hash-match a DuckDB twin (the q68-q73 portable-twin family);
  * production swaps in xxhash64 on the identical code path.
  */
object SketchQueries {

  /** KMV sketch size. ABOVE `defs` — the oracle strings interpolate it
    * eagerly while `defs` is constructed (round-3 init-order trap).
    */
  private val KmvK = 64
  private val BloomM = 1 << 15
  private val BloomKh = 5
  private val CmW = 16
  private val CmD = 3
  private val SetK = 256
  private val HistW = 8 // histogram bucket width (value units)
  private val HistB = 64 // histogram bucket count

  val defs: Seq[QueryDef] = Seq(
    // ---- KMV (k-minimum-values) distinct sketch per shard + merged
    //      global row. The Spark side derives the global row by MERGING
    //      the shard sketches; the oracle derives it from the raw keys —
    //      hash equality is the mergeability proof (union of bottom-k
    //      supersets the global bottom-k).
    QueryDef(
      "q178_kmv_distinct",
      (s, dir) =>
        Sketches.kmvCensus(t(s, dir, "orders"), "o_orderpriority",
          "o_custkey", k = KmvK),
      Some(kmvOracleSql)
    ),

    // ---- incrementally-maintained KMV: the stored pre-1998 sketch merges
    //      with the 1998+ delta sketch by set-union → re-bottom-k, never
    //      re-reading the state's raw keys. The oracle is the BATCH census
    //      over all orders (same SQL as q178) — hash equality is the
    //      incremental≡batch proof, the q97/q120/q150 pattern applied to
    //      a sketch artifact.
    QueryDef(
      "q186_kmv_incremental",
      (s, dir) => {
        val o = t(s, dir, "orders")
        val cut = to_timestamp(lit("1998-01-01"))
        Sketches.kmvCensusIncremental(
          o.filter(col("o_orderdate") < cut),
          o.filter(col("o_orderdate") >= cut),
          "o_orderpriority", "o_custkey", k = KmvK)
      },
      Some(kmvOracleSql)
    ),

    // ---- sketch-driven join-size estimation: the lineitem⋈lineitem-on-
    //      partkey cardinality (the "is this join about to explode /
    //      should it broadcast" planner input) estimated from per-key
    //      count profiles + one KMV key sample — the join itself never
    //      runs, and the hash gate pins estimate AND control exactly
    QueryDef(
      "q232_join_cardinality_sketch",
      (s, dir) => {
        val li = t(s, dir, "lineitem")
        graft.ext.Sketches.joinCardinalityEstimate(
          li, "l_partkey", li, "l_partkey", k = 256)
      },
      Some("""WITH cl AS (SELECT l_partkey AS key,
             |    CAST(count(*) AS BIGINT) AS c
             |  FROM lineitem WHERE l_partkey IS NOT NULL GROUP BY 1),
             |u AS (SELECT DISTINCT key FROM cl),
             |hh AS (SELECT key,
             |    ('0x' || substr(md5(CAST(key AS VARCHAR)), 1, 15))::BIGINT
             |      AS h
             |  FROM u),
             |s AS (SELECT key, h FROM hh ORDER BY h LIMIT 256),
             |st AS (SELECT CAST(count(*) AS BIGINT) AS n,
             |    CAST(max(s.h) AS BIGINT) AS hk,
             |    CAST(sum(cl.c * cl.c) AS BIGINT) AS ps
             |  FROM s JOIN cl USING (key)),
             |ex AS (SELECT CAST(sum(c * c) AS BIGINT) AS exact_rows,
             |    CAST(count(*) AS BIGINT) AS du FROM cl),
             |d AS (SELECT st.n, st.ps,
             |    CASE WHEN st.n < 256 THEN CAST(st.n AS DOUBLE)
             |         ELSE CAST(255 AS DOUBLE) *
             |              CAST(1152921504606846976 AS DOUBLE) /
             |              CAST(st.hk AS DOUBLE) END AS de
             |  FROM st),
             |e AS (SELECT n, de,
             |    (de / CAST(n AS DOUBLE)) * CAST(ps AS DOUBLE) AS est
             |  FROM d)
             |SELECT ex.exact_rows AS exact_join_rows,
             |  ex.du AS union_distinct_exact,
             |  e.n AS sampled_keys, e.de AS union_distinct_est,
             |  e.est AS est_join_rows,
             |  (e.est - CAST(ex.exact_rows AS DOUBLE)) /
             |    CAST(ex.exact_rows AS DOUBLE) AS rel_err
             |FROM ex, e""".stripMargin)
    )
  ) ++ moreDefs

  /** The q178/q186 oracle — the BATCH KMV census computed from raw keys.
    * q186 reaching this hash through the state⊕delta merge is the
    * mergeability/incremental-maintenance proof.
    */
  private def kmvOracleSql: String =
    s"""WITH h AS (SELECT DISTINCT o_orderpriority AS shard,
             |    ('0x'||substr(md5(o_custkey::VARCHAR),1,15))::BIGINT AS h
             |  FROM orders),
             |ranked AS (SELECT shard, h,
             |    row_number() OVER (PARTITION BY shard ORDER BY h) AS rn
             |  FROM h),
             |sk AS (SELECT shard, count(*) AS n_sk, max(h) AS hk
             |  FROM ranked WHERE rn <= $KmvK GROUP BY shard),
             |gr AS (SELECT h, row_number() OVER (ORDER BY h) AS rn
             |  FROM (SELECT DISTINCT h FROM h)),
             |gsk AS (SELECT '~all' AS shard, count(*) AS n_sk, max(h) AS hk
             |  FROM gr WHERE rn <= $KmvK),
             |allsk AS (SELECT * FROM sk UNION ALL SELECT * FROM gsk),
             |ex AS (SELECT o_orderpriority AS shard,
             |    count(DISTINCT o_custkey) AS n_exact FROM orders GROUP BY 1
             |  UNION ALL
             |  SELECT '~all', count(DISTINCT o_custkey) FROM orders),
             |est AS (SELECT s.shard, e.n_exact,
             |    CASE WHEN s.n_sk < $KmvK THEN s.n_sk::DOUBLE
             |      ELSE CAST(${KmvK - 1} AS DOUBLE) *
             |        CAST(1152921504606846976 AS DOUBLE) / s.hk::DOUBLE
             |    END AS kmv
             |  FROM allsk s JOIN ex e USING (shard))
             |SELECT shard, n_exact, round(kmv, 1) AS kmv_est,
             |  round(CAST(100.0 AS DOUBLE) * abs(kmv - n_exact::DOUBLE) /
             |    n_exact::DOUBLE, 2) AS rel_err_pct
             |FROM est ORDER BY shard""".stripMargin

  /** The q185/q194 oracle — the BATCH Count-Min census from raw tokens.
    * q194 reaching this hash through the state⊕delta cell-wise merge is
    * the mergeability/incremental-maintenance proof.
    */
  private def cmOracleSql: String =
    s"""WITH tok AS (SELECT tok AS token FROM (
       |    SELECT unnest(string_split(lower(text), ' ')) AS tok
       |    FROM documents) WHERE tok <> ''),
       |cells AS (SELECT g.r,
       |    ('0x'||substr(md5('cm'||g.r||'|'||token),1,15))::BIGINT % $CmW AS pos,
       |    count(*) AS cnt
       |  FROM tok, generate_series(0, ${CmD - 1}) g(r) GROUP BY 1, 2),
       |exact AS (SELECT token, count(*) AS n_exact FROM tok
       |  GROUP BY token ORDER BY n_exact DESC, token LIMIT 20),
       |probes AS (SELECT e.token, e.n_exact, g.r,
       |    ('0x'||substr(md5('cm'||g.r||'|'||e.token),1,15))::BIGINT % $CmW AS pos
       |  FROM exact e, generate_series(0, ${CmD - 1}) g(r)),
       |est AS (SELECT p.token, p.n_exact, min(c.cnt)::BIGINT AS cms_est
       |  FROM probes p JOIN cells c ON c.r = p.r AND c.pos = p.pos
       |  GROUP BY p.token, p.n_exact)
       |SELECT token, n_exact, cms_est, cms_est - n_exact AS overcount
       |FROM est ORDER BY n_exact DESC, token""".stripMargin

  private def moreDefs: Seq[QueryDef] = Seq(
    // ---- Bloom membership pre-filter for incremental dedup: the even
    //      half of `documents` is the stored index (reduced to ≤ m int
    //      positions — the broadcastable "bitmap"), the odd half probes
    //      it; bloom-positives (ALL kH probe positions present) resolve
    //      through the exact content join, separating true dups from the
    //      filter's false positives.
    QueryDef(
      "q179_bloom_prefilter",
      (s, dir) => {
        val d = t(s, dir, "documents")
        Sketches.bloomPrefilterCensus(
          d.filter(col("doc_id") % 2 === 0),
          d.filter(col("doc_id") % 2 === 1),
          "doc_id", "text", m = BloomM, kH = BloomKh)
      },
      Some(s"""WITH idx AS (SELECT text FROM documents WHERE doc_id % 2 = 0),
             |prb AS (SELECT doc_id, text FROM documents WHERE doc_id % 2 = 1),
             |ih AS (SELECT ('0x'||substr(md5(text),1,15))::BIGINT AS h1,
             |    ('0x'||substr(md5('b2|'||text),1,15))::BIGINT AS h2 FROM idx),
             |ph AS (SELECT doc_id,
             |    ('0x'||substr(md5(text),1,15))::BIGINT AS h1,
             |    ('0x'||substr(md5('b2|'||text),1,15))::BIGINT AS h2 FROM prb),
             |pos AS (SELECT DISTINCT (h1 + i*h2) % $BloomM AS pos
             |  FROM ih, generate_series(0, ${BloomKh - 1}) g(i)),
             |ppos AS (SELECT DISTINCT doc_id, (h1 + i*h2) % $BloomM AS pos
             |  FROM ph, generate_series(0, ${BloomKh - 1}) g(i)),
             |perdoc AS (SELECT p.doc_id, count(*) AS np,
             |    sum(CASE WHEN s.pos IS NOT NULL THEN 1 ELSE 0 END) AS nh
             |  FROM ppos p LEFT JOIN pos s USING (pos) GROUP BY p.doc_id),
             |pass AS (SELECT doc_id FROM perdoc WHERE np = nh),
             |passed AS (SELECT p.doc_id, md5(p.text) AS ch
             |  FROM pass JOIN prb p USING (doc_id)),
             |v AS (SELECT count(*) AS n_bloom_pass,
             |    coalesce(sum(CASE WHEN EXISTS
             |      (SELECT 1 FROM idx i WHERE md5(i.text) = passed.ch)
             |      THEN 1 ELSE 0 END), 0)::BIGINT AS n_true_dup
             |  FROM passed)
             |SELECT (SELECT count(*) FROM prb) AS n_probe,
             |  n_bloom_pass, n_true_dup,
             |  n_bloom_pass - n_true_dup AS n_false_pos,
             |  round(CAST(100.0 AS DOUBLE) *
             |    (n_bloom_pass - n_true_dup)::DOUBLE /
             |    (SELECT count(*) FROM prb)::DOUBLE, 3) AS fp_pct
             |FROM v""".stripMargin)
    ),

    // ---- HLL accuracy certification (the q98 pattern for cardinality):
    //      per-source exact distinct text count next to a boolean that
    //      hash-fails if approx_count_distinct ever drifts past 3·rsd.
    //      At 100 TB the approx path is the only affordable one; this
    //      entry is the standing proof it stays honest.
    QueryDef(
      "q180_hll_certification",
      (s, dir) =>
        t(s, dir, "documents")
          .groupBy("source")
          .agg(count_distinct(col("text")).as("n_exact"),
            approx_count_distinct(col("text"), rsd = 0.05).as("_a"))
          .select(col("source"), col("n_exact"),
            (abs(col("_a").cast("double") - col("n_exact").cast("double")) <=
              greatest(col("n_exact").cast("double") * 0.15, lit(3.0)))
              .as("hll_ok"))
          .orderBy("source"),
      Some("""SELECT source, count(DISTINCT text) AS n_exact,
             |  TRUE AS hll_ok
             |FROM documents GROUP BY source ORDER BY source""".stripMargin)
    ),

    // ---- Count-Min sketch certification: a deliberately narrow grid
    //      (depth 3 × width 16 against a ~31-token vocabulary) so the
    //      collision overcounts are REAL and the min-over-rows recovery
    //      is visible — est ≥ exact structurally; the sketch itself is
    //      depth·width cells and merges by addition across shards.
    QueryDef(
      "q185_countmin_census",
      (s, dir) =>
        Sketches.countMinCensus(t(s, dir, "documents"), "text",
          width = CmW, depth = CmD, topK = 20),
      Some(cmOracleSql)
    ),

    // ---- incrementally-maintained Count-Min: the even-id half is the
    //      stored grid, the odd-id half the delta; grids merge by
    //      CELL-WISE ADDITION (counters are linear). Oracle = the batch
    //      census over all documents (q185's SQL) — the hash match is the
    //      incremental≡batch proof, the q186 pattern for sketch family 2.
    QueryDef(
      "q194_countmin_incremental",
      (s, dir) => {
        val d = t(s, dir, "documents")
        Sketches.countMinCensusIncremental(
          d.filter(col("doc_id") % 2 === 0),
          d.filter(col("doc_id") % 2 === 1),
          "text", width = CmW, depth = CmD, topK = 20)
      },
      Some(cmOracleSql)
    ),

    // ---- KMV set operations: union/intersection cardinality of two key
    //      populations (urgent-priority vs low-priority customers) from
    //      their bottom-k sketches alone — 2·k longs of state; exact
    //      counts ride along as certification. The minhash-Jaccard-on-
    //      the-union-sample estimator, fully portable-hash-oracled.
    QueryDef(
      "q190_kmv_set_ops",
      (s, dir) => {
        val o = t(s, dir, "orders")
        Sketches.kmvSetOpsCensus(
          o.filter(col("o_orderpriority") === "1-URGENT")
            .select("o_custkey"),
          o.filter(col("o_orderpriority") === "5-LOW")
            .select("o_custkey"),
          "o_custkey", k = SetK)
      },
      Some(s"""WITH a AS (SELECT DISTINCT
             |    ('0x'||substr(md5(o_custkey::VARCHAR),1,15))::BIGINT AS h
             |  FROM orders WHERE o_orderpriority = '1-URGENT'),
             |b AS (SELECT DISTINCT
             |    ('0x'||substr(md5(o_custkey::VARCHAR),1,15))::BIGINT AS h
             |  FROM orders WHERE o_orderpriority = '5-LOW'),
             |sa AS (SELECT h FROM a ORDER BY h LIMIT $SetK),
             |sb AS (SELECT h FROM b ORDER BY h LIMIT $SetK),
             |u AS (SELECT h FROM (SELECT h FROM sa UNION SELECT h FROM sb)
             |  ORDER BY h LIMIT $SetK),
             |m AS (SELECT count(*)::BIGINT AS m FROM u
             |  WHERE EXISTS (SELECT 1 FROM sa WHERE sa.h = u.h)
             |    AND EXISTS (SELECT 1 FROM sb WHERE sb.h = u.h)),
             |us AS (SELECT count(*)::BIGINT AS nu, max(h) AS hk FROM u),
             |ex AS (SELECT
             |  (SELECT count(DISTINCT o_custkey) FROM orders
             |    WHERE o_orderpriority = '1-URGENT') AS n_a,
             |  (SELECT count(DISTINCT o_custkey) FROM orders
             |    WHERE o_orderpriority = '5-LOW') AS n_b,
             |  (SELECT count(*) FROM
             |    (SELECT DISTINCT o_custkey FROM orders
             |      WHERE o_orderpriority = '1-URGENT') x
             |    JOIN (SELECT DISTINCT o_custkey FROM orders
             |      WHERE o_orderpriority = '5-LOW') y USING (o_custkey))
             |    AS n_inter,
             |  (SELECT count(DISTINCT o_custkey) FROM orders
             |    WHERE o_orderpriority IN ('1-URGENT', '5-LOW')) AS n_union),
             |est AS (SELECT m.m,
             |    m.m::DOUBLE / LEAST(us.nu, $SetK)::DOUBLE AS jacc,
             |    CASE WHEN us.nu < $SetK THEN us.nu::DOUBLE
             |      ELSE CAST(${SetK - 1} AS DOUBLE) *
             |        CAST(1152921504606846976 AS DOUBLE) / us.hk::DOUBLE
             |    END AS uest
             |  FROM us, m)
             |SELECT ex.n_a, ex.n_b, ex.n_inter, ex.n_union,
             |  round(jacc, 4) AS jaccard_est,
             |  round(jacc * uest, 1) AS inter_est,
             |  round(uest, 1) AS union_est
             |FROM ex, est""".stripMargin)
    ),

    // ---- trailing-7-day distinct users per day, answered from per-day
    //      KMV sketches only (k longs/day of state; mergeability in the
    //      TIME dimension). Exact counts ride along as certification.
    QueryDef(
      "q192_kmv_trailing_distinct",
      (s, dir) =>
        Sketches.kmvTrailingDistinct(t(s, dir, "events"), "ts", "user_id",
          windowDays = 7, k = KmvK),
      Some(s"""WITH h AS (SELECT DISTINCT ts::DATE AS day,
             |    ('0x'||substr(md5(user_id::VARCHAR),1,15))::BIGINT AS h
             |  FROM events),
             |ranked AS (SELECT day, h,
             |    row_number() OVER (PARTITION BY day ORDER BY h) AS rn
             |  FROM h),
             |dsk AS (SELECT day, h FROM ranked WHERE rn <= $KmvK),
             |days AS (SELECT DISTINCT day FROM dsk),
             |tw AS (SELECT DISTINCT t.day AS day, s.h
             |  FROM days t JOIN dsk s ON s.day BETWEEN t.day - 6 AND t.day),
             |rw AS (SELECT day, h,
             |    row_number() OVER (PARTITION BY day ORDER BY h) AS rn
             |  FROM tw),
             |sk AS (SELECT day, count(*) AS n_sk, max(h) AS hk
             |  FROM rw WHERE rn <= $KmvK GROUP BY day),
             |du AS (SELECT DISTINCT ts::DATE AS d, user_id AS u FROM events),
             |ex AS (SELECT t.day, count(DISTINCT du.u) AS n_exact
             |  FROM days t JOIN du ON du.d BETWEEN t.day - 6 AND t.day
             |  GROUP BY t.day),
             |est AS (SELECT s.day, e.n_exact,
             |    CASE WHEN s.n_sk < $KmvK THEN s.n_sk::DOUBLE
             |      ELSE CAST(${KmvK - 1} AS DOUBLE) *
             |        CAST(1152921504606846976 AS DOUBLE) / s.hk::DOUBLE
             |    END AS kmv
             |  FROM sk s JOIN ex e USING (day))
             |SELECT strftime(day, '%Y-%m-%d') AS day, n_exact,
             |  round(kmv, 1) AS kmv_est,
             |  round(CAST(100.0 AS DOUBLE) * abs(kmv - n_exact::DOUBLE) /
             |    n_exact::DOUBLE, 2) AS rel_err_pct
             |FROM est ORDER BY day""".stripMargin)
    ),

    // ---- trailing-7-day P50/P90 from per-day HISTOGRAM sketches — the
    //      third mergeable-sketch family (order statistics): counters are
    //      linear, so day-grids merge cell-wise across the window; the
    //      quantile readout is INTEGER rank math over the merged grid
    //      (rank = ceil(q·W), estimate = the holding bucket's lower
    //      bound). Exact lower quantiles ride along as certification —
    //      they re-scan the window's raw rows (harness, not product).
    QueryDef(
      "q196_hist_trailing_quantiles",
      (s, dir) =>
        Sketches.histTrailingQuantiles(t(s, dir, "events"), "ts", "value",
          windowDays = 7, width = HistW.toDouble, nBuckets = HistB),
      Some(s"""WITH e AS (SELECT ts::DATE AS d, value::DOUBLE AS v FROM events
             |  WHERE value IS NOT NULL),
             |hist AS (SELECT d AS day,
             |    CAST(least(greatest(floor(v / $HistW), 0), ${HistB - 1})
             |      AS BIGINT) AS bucket,
             |    count(*) AS cnt
             |  FROM e GROUP BY 1, 2),
             |days AS (SELECT DISTINCT day FROM hist),
             |merged AS (SELECT t.day AS t, h.bucket, sum(h.cnt) AS cnt
             |  FROM days t JOIN hist h ON h.day BETWEEN t.day - 6 AND t.day
             |  GROUP BY 1, 2),
             |tot AS (SELECT t, sum(cnt) AS w FROM merged GROUP BY 1),
             |cum AS (SELECT m.t, m.bucket, tot.w,
             |    sum(m.cnt) OVER (PARTITION BY m.t ORDER BY m.bucket) AS cum
             |  FROM merged m JOIN tot ON tot.t = m.t),
             |est AS (SELECT t, w,
             |    min(CASE WHEN cum >= floor((w + 1) / 2) THEN bucket END)
             |      * CAST($HistW AS DOUBLE) AS p50_est,
             |    min(CASE WHEN cum >= floor((w * 9 + 9) / 10) THEN bucket END)
             |      * CAST($HistW AS DOUBLE) AS p90_est
             |  FROM cum GROUP BY t, w),
             |ranked AS (SELECT t.day AS t, e.v,
             |    row_number() OVER (PARTITION BY t.day ORDER BY e.v) AS rn
             |  FROM days t JOIN e ON e.d BETWEEN t.day - 6 AND t.day),
             |ex AS (SELECT r.t, tot.w,
             |    min(CASE WHEN rn = floor((tot.w + 1) / 2) THEN v END)
             |      AS p50_exact,
             |    min(CASE WHEN rn = floor((tot.w * 9 + 9) / 10) THEN v END)
             |      AS p90_exact
             |  FROM ranked r JOIN tot ON tot.t = r.t
             |  WHERE rn = floor((tot.w + 1) / 2)
             |     OR rn = floor((tot.w * 9 + 9) / 10)
             |  GROUP BY r.t, tot.w),
             |o AS (SELECT est.t, est.w, p50_est, p50_exact, p90_est, p90_exact
             |  FROM est JOIN ex ON ex.t = est.t)
             |SELECT strftime(t, '%Y-%m-%d') AS day, CAST(w AS BIGINT) AS n,
             |  p50_est, p50_exact, p90_est, p90_exact
             |FROM o ORDER BY day""".stripMargin)
    ),

    // ---- incrementally-maintained histogram quantiles: the pre-cutoff
    //      grid merges with the delta batch's grid by CELL-WISE ADDITION,
    //      never re-reading state values; the oracle is the BATCH census
    //      over all events, so the hash match is the incremental≡batch
    //      proof for the THIRD sketch family (KMV q186, CMS q194,
    //      histogram q203 — the mergeability matrix closed).
    QueryDef(
      "q203_hist_incremental",
      (s, dir) => {
        val e = t(s, dir, "events")
        val cut = to_timestamp(lit("2024-01-25 00:00:00"))
        Sketches.histQuantileIncremental(
          e.filter(col("ts") < cut), e.filter(col("ts") >= cut),
          "value", width = HistW.toDouble, nBuckets = HistB)
      },
      Some(s"""WITH e AS (SELECT value::DOUBLE AS v FROM events
             |  WHERE value IS NOT NULL),
             |hist AS (SELECT
             |    CAST(least(greatest(floor(v / $HistW), 0), ${HistB - 1})
             |      AS BIGINT) AS bucket,
             |    count(*) AS cnt
             |  FROM e GROUP BY 1),
             |tot AS (SELECT sum(cnt) AS w FROM hist),
             |cum AS (SELECT bucket, cnt, tot.w,
             |    sum(cnt) OVER (ORDER BY bucket) AS cum
             |  FROM hist, tot),
             |est AS (SELECT w,
             |    min(CASE WHEN cum >= floor((w + 1) / 2) THEN bucket END)
             |      * CAST($HistW AS DOUBLE) AS p50_est,
             |    min(CASE WHEN cum >= floor((w * 9 + 9) / 10) THEN bucket END)
             |      * CAST($HistW AS DOUBLE) AS p90_est
             |  FROM cum GROUP BY w),
             |rk AS (SELECT v, row_number() OVER (ORDER BY v) AS rn FROM e),
             |ex AS (SELECT
             |    min(CASE WHEN rn = floor((tot.w + 1) / 2) THEN v END)
             |      AS p50_exact,
             |    min(CASE WHEN rn = floor((tot.w * 9 + 9) / 10) THEN v END)
             |      AS p90_exact
             |  FROM rk, tot)
             |SELECT CAST(est.w AS BIGINT) AS n, p50_est, ex.p50_exact,
             |  p90_est, ex.p90_exact
             |FROM est, ex""".stripMargin)
    )
  )
}
