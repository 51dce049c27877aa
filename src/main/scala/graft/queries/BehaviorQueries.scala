package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, LongType}
import graft.analytics.{Behavior, Concentration}
import graft.queries.Q._

/** Sequence / cohort / concentration analytics (q157–q162): user-journey
  * transition matrices, weekly cohort retention, revenue inequality and
  * market concentration, Kaplan-Meier churn survival, and the triangle
  * census of the co-purchase graph. Every query is exactly DuckDB-
  * oracle-able — integer counts, DECIMAL-routed sums, fixed-shape IEEE
  * readouts, and (for KM) an explicitly ordered multiply fold.
  */
object BehaviorQueries {

  val defs: Seq[QueryDef] = Seq(

    // ---- First-order Markov transition matrix of the user event journey:
    //      lead() within (user, ts, id) order, one transition-count
    //      aggregate, row-normalized by a broadcast per-source total
    QueryDef(
      "q157_markov_transitions",
      (s, dir) =>
        Behavior.markovTransitions(
          t(s, dir, "events"), "user_id", "ts", "event_id", "event_type"),
      Some("""WITH p AS (SELECT event_type AS from_type,
             |    lead(event_type) OVER (PARTITION BY user_id
             |      ORDER BY ts, event_id) AS to_type
             |  FROM events),
             |c AS (SELECT from_type, to_type, CAST(count(*) AS BIGINT) AS n
             |  FROM p WHERE to_type IS NOT NULL GROUP BY 1, 2),
             |t AS (SELECT from_type, CAST(sum(n) AS BIGINT) AS n_from
             |  FROM c GROUP BY 1)
             |SELECT c.from_type, to_type, n,
             |  round(CAST(n AS DOUBLE)/CAST(n_from AS DOUBLE), 6) AS prob
             |FROM c JOIN t USING (from_type)
             |ORDER BY from_type, to_type""".stripMargin)
    ),

    // ---- Weekly cohort retention: first-active-week cohorts via ONE
    //      collect_set(week)-per-user shuffle; epoch-week integer math
    //      (day div 7) sidesteps engine week-of-year semantics
    QueryDef(
      "q158_cohort_retention",
      (s, dir) =>
        Behavior.cohortRetention(t(s, dir, "events"), "user_id", "ts"),
      Some("""WITH uw AS (SELECT DISTINCT user_id AS u,
             |    (CAST(ts AS DATE) - DATE '1970-01-01') // 7 AS wk
             |  FROM events),
             |c AS (SELECT u, min(wk) AS cw FROM uw GROUP BY 1),
             |r AS (SELECT cw AS cohort_week, wk - cw AS week_offset,
             |    CAST(count(*) AS BIGINT) AS n_active
             |  FROM uw JOIN c USING (u) GROUP BY 1, 2),
             |s AS (SELECT cohort_week, n_active AS cohort_size FROM r
             |  WHERE week_offset = 0)
             |SELECT CAST(cohort_week AS BIGINT) AS cohort_week,
             |  CAST(week_offset AS BIGINT) AS week_offset, n_active,
             |  cohort_size,
             |  round(CAST(n_active AS DOUBLE)/CAST(cohort_size AS DOUBLE), 6)
             |    AS retention
             |FROM r JOIN s USING (cohort_week)
             |ORDER BY cohort_week, week_offset""".stripMargin)
    ),

    // ---- Gini coefficient of customer order revenue per nation: exact
    //      integer cents, rank window per nation, rank-weighted sums
    //      through DECIMAL — one IEEE division at the end
    QueryDef(
      "q159_gini_customer_revenue",
      (s, dir) => {
        val rev = t(s, dir, "orders")
          .groupBy(col("o_custkey"))
          .agg((sum(col("o_totalprice").cast(DecimalType(18, 2))) * 100)
            .cast(LongType).as("cents"))
        val per = rev
          .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
          .select(col("c_nationkey").cast(LongType).as("g"),
            col("c_custkey").as("e"), col("cents"))
        Concentration.giniByGroup(per, "nationkey")
      },
      Some("""WITH rev AS (SELECT o_custkey,
             |    CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT)
             |      AS cents
             |  FROM orders GROUP BY 1),
             |per AS (SELECT CAST(c_nationkey AS BIGINT) AS g, c_custkey AS e,
             |    cents
             |  FROM rev JOIN customer ON o_custkey = c_custkey),
             |rk AS (SELECT g, cents,
             |    CAST(row_number() OVER (PARTITION BY g ORDER BY cents, e)
             |      AS BIGINT) AS i
             |  FROM per),
             |a AS (SELECT g, CAST(count(*) AS BIGINT) AS n,
             |    sum(CAST(cents AS DECIMAL(28,0))) AS s,
             |    sum(CAST(i * cents AS DECIMAL(28,0))) AS s1
             |  FROM rk GROUP BY 1)
             |SELECT g AS nationkey, n AS n_entities,
             |  round((CAST(2.0 AS DOUBLE)*CAST(s1 AS DOUBLE)
             |      - CAST(n + 1 AS DOUBLE)*CAST(s AS DOUBLE))
             |    /(CAST(n AS DOUBLE)*CAST(s AS DOUBLE)), 6) AS gini
             |FROM a ORDER BY nationkey""".stripMargin)
    ),

    // ---- HHI market concentration of supplier lineitem revenue per
    //      region: DECIMAL(18,0) cents square to width 37 and sum inside
    //      width 38 in both engines (the width discipline)
    QueryDef(
      "q160_hhi_supplier_share",
      (s, dir) => {
        val rev = t(s, dir, "lineitem")
          .groupBy(col("l_suppkey"))
          .agg((sum(col("l_extendedprice").cast(DecimalType(18, 2))) * 100)
            .cast(LongType).as("cents"))
        val per = rev
          .join(t(s, dir, "supplier"), col("l_suppkey") === col("s_suppkey"))
          .join(t(s, dir, "nation"), col("s_nationkey") === col("n_nationkey"))
          .join(t(s, dir, "region"), col("n_regionkey") === col("r_regionkey"))
          .select(col("r_name").as("g"), col("cents"))
        Concentration.hhiByGroup(per, "region")
      },
      Some("""WITH rev AS (SELECT l_suppkey,
             |    CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) * 100
             |      AS BIGINT) AS cents
             |  FROM lineitem GROUP BY 1),
             |per AS (SELECT r_name AS g, cents FROM rev
             |  JOIN supplier ON l_suppkey = s_suppkey
             |  JOIN nation ON s_nationkey = n_nationkey
             |  JOIN region ON n_regionkey = r_regionkey),
             |a AS (SELECT g, CAST(count(*) AS BIGINT) AS n,
             |    sum(CAST(cents AS DECIMAL(19,0))) AS s,
             |    sum(CAST(cents AS DECIMAL(19,0))
             |      * CAST(cents AS DECIMAL(19,0))) AS s2,
             |    max(cents) AS mx
             |  FROM per GROUP BY 1)
             |SELECT g AS region, n AS n_entities,
             |  round(CAST(s2 AS DOUBLE)
             |    /(CAST(s AS DOUBLE)*CAST(s AS DOUBLE)), 6) AS hhi,
             |  round(CAST(mx AS DOUBLE)/CAST(s AS DOUBLE), 6) AS top_share,
             |  round((CAST(s AS DOUBLE)*CAST(s AS DOUBLE))
             |    /CAST(s2 AS DOUBLE), 4) AS effective_n
             |FROM a ORDER BY region""".stripMargin)
    ),

    // ---- Kaplan-Meier churn survival at fixed horizons, right-censored
    //      at 7 idle days: risk table on the tiny lifetime grain; S(h) is
    //      an explicitly t-ordered multiply fold (Spark `aggregate` HOF ≡
    //      DuckDB `list_reduce` over `list(... ORDER BY t)` — the q139
    //      init-prepend trick)
    QueryDef(
      "q161_kaplan_meier",
      (s, dir) =>
        Behavior.kaplanMeier(t(s, dir, "events"), "user_id", "ts",
          censorDays = 7, horizons = Seq(7, 14, 28, 56, 84)),
      Some("""WITH pu AS (SELECT user_id AS u,
             |    min(CAST(ts AS DATE) - DATE '1970-01-01') AS fday,
             |    max(CAST(ts AS DATE) - DATE '1970-01-01') AS lday
             |  FROM events GROUP BY 1),
             |mx AS (SELECT max(lday) AS m FROM pu),
             |lt AS (SELECT
             |    CASE WHEN lday <= m - 7 THEN lday - fday ELSE m - fday END
             |      AS t,
             |    CASE WHEN lday <= m - 7 THEN 1 ELSE 0 END AS is_d
             |  FROM pu, mx),
             |st AS (SELECT t, CAST(sum(is_d) AS BIGINT) AS dd,
             |    CAST(sum(1 - is_d) AS BIGINT) AS cc FROM lt GROUP BY 1),
             |rk AS (SELECT t, dd,
             |    CAST((SELECT sum(dd + cc) FROM st) AS BIGINT)
             |      - CAST(coalesce(sum(dd + cc) OVER (ORDER BY t
             |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
             |        0) AS BIGINT) AS n_risk
             |  FROM st),
             |tm AS (SELECT t, CAST(1.0 AS DOUBLE)
             |    - CAST(dd AS DOUBLE)/CAST(n_risk AS DOUBLE) AS term
             |  FROM rk WHERE dd > 0),
             |h AS (SELECT unnest([7,14,28,56,84]) AS horizon),
             |f AS (SELECT horizon, CAST(count(*) AS BIGINT) AS n_steps,
             |    round(list_reduce(
             |      list_prepend(CAST(1.0 AS DOUBLE), list(term ORDER BY t)),
             |      (a,b) -> a*b), 6) AS s
             |  FROM h JOIN tm ON tm.t <= h.horizon GROUP BY 1)
             |SELECT CAST(h.horizon AS BIGINT) AS horizon,
             |  coalesce(n_steps, CAST(0 AS BIGINT)) AS n_steps,
             |  coalesce(s, CAST(1.0 AS DOUBLE)) AS s_km
             |FROM h LEFT JOIN f USING (horizon)
             |ORDER BY horizon""".stripMargin)
    ),

    // ---- Triangle census + transitivity of the Q1-1995 co-purchase
    //      graph (q135's edge construction): degree-oriented enumeration
    //      bounds wedge fan-out at O(√m) per node; counts stay integers,
    //      transitivity 3T/W is the one division
    QueryDef(
      "q162_triangle_census",
      (s, dir) => {
        val ords = t(s, dir, "orders")
          .filter(col("o_orderdate").cast("date")
            .between("1995-01-01", "1995-03-31"))
          .select(col("o_orderkey"))
        val items = t(s, dir, "lineitem")
          .select(col("l_orderkey"), col("l_partkey"))
          .join(ords, col("l_orderkey") === col("o_orderkey"))
          .select("l_orderkey", "l_partkey")
          .distinct()
        val x = items.select(col("l_orderkey").as("k"), col("l_partkey").as("pa"))
        val y = items.select(col("l_orderkey").as("k"), col("l_partkey").as("pb"))
        val pairs = x.join(y, Seq("k")).filter(col("pa") < col("pb"))
          .select(col("pa").as("src"), col("pb").as("dst"))
        graft.ext.Graph.triangleCensus(pairs, "src", "dst")
      },
      Some("""WITH ords AS (SELECT o_orderkey FROM orders
             |    WHERE CAST(o_orderdate AS DATE)
             |      BETWEEN DATE '1995-01-01' AND DATE '1995-03-31'),
             |items AS (SELECT DISTINCT l_orderkey AS k, l_partkey AS p
             |  FROM lineitem JOIN ords ON l_orderkey = o_orderkey),
             |e AS (SELECT DISTINCT x.p AS a, y.p AS b
             |  FROM items x JOIN items y USING (k) WHERE x.p < y.p),
             |deg AS (SELECT node, CAST(count(*) AS BIGINT) AS deg FROM
             |    (SELECT a AS node FROM e UNION ALL SELECT b FROM e)
             |  GROUP BY 1),
             |o AS (SELECT
             |    CASE WHEN (da.deg < db.deg)
             |      OR (da.deg = db.deg AND a < b) THEN a ELSE b END AS u,
             |    CASE WHEN (da.deg < db.deg)
             |      OR (da.deg = db.deg AND a < b) THEN b ELSE a END AS v
             |  FROM e JOIN deg da ON da.node = a JOIN deg db ON db.node = b),
             |w AS (SELECT e1.v AS y, e2.v AS z FROM o e1
             |  JOIN o e2 ON e1.u = e2.u WHERE e1.v < e2.v),
             |tri AS (SELECT CAST(count(*) AS BIGINT) AS t FROM w
             |  JOIN o o3 ON least(o3.u, o3.v) = w.y
             |    AND greatest(o3.u, o3.v) = w.z),
             |st AS (SELECT CAST(count(*) AS BIGINT) AS n_nodes,
             |    CAST(sum(deg) AS BIGINT) // 2 AS n_edges,
             |    CAST(sum(deg*(deg-1)) AS BIGINT) // 2 AS n_wedges
             |  FROM deg)
             |SELECT n_nodes, n_edges, n_wedges, t AS n_triangles,
             |  round(CAST(3.0 AS DOUBLE)*CAST(t AS DOUBLE)
             |    /CAST(n_wedges AS DOUBLE), 6) AS transitivity
             |FROM st, tri""".stripMargin)
    ),

    // ---- Feature hashing (the hashing trick): tokens → 64 portable-hash
    //      buckets, per-bucket mass / doc frequency / corpus share — the
    //      no-vocabulary bounded-width encoder
    QueryDef(
      "q163_feature_hashing",
      (s, dir) =>
        graft.ext.TextAnalysis.featureHashBuckets(
          t(s, dir, "documents"), "doc_id", "text", nBuckets = 64),
      Some("""WITH tk AS (SELECT doc_id,
             |    unnest(list_filter(regexp_split_to_array(trim(text), '\s+'),
             |      x -> x <> '')) AS tok
             |  FROM documents),
             |b AS (SELECT doc_id,
             |    ('0x' || substr(md5(tok), 1, 15))::BIGINT % 64 AS bucket
             |  FROM tk),
             |g AS (SELECT bucket, CAST(count(*) AS BIGINT) AS n_tokens,
             |    CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
             |  FROM b GROUP BY 1),
             |t AS (SELECT CAST(sum(n_tokens) AS BIGINT) AS tot FROM g)
             |SELECT bucket, n_tokens, n_docs,
             |  round(CAST(n_tokens AS DOUBLE)/CAST(tot AS DOUBLE), 6)
             |    AS share
             |FROM g, t ORDER BY bucket""".stripMargin)
    ),

    // ---- Chi-square feature screening: source vs is-English label,
    //      one-vs-rest 2×2 per category; exact counts, pinned-order IEEE
    //      cell terms (the q145 chi-square family)
    QueryDef(
      "q164_chi2_feature_screen",
      (s, dir) =>
        graft.analytics.FeaturePrep.chi2Screen(
          t(s, dir, "documents"),
          col("source"),
          coalesce(col("lang"), lit("")) === "en"),
      Some {
        def cell(o: String, r: String, c: String): String =
          s"""(CASE WHEN CAST($r AS DOUBLE)*CAST($c AS DOUBLE)
             |      /CAST(nn AS DOUBLE) > CAST(0.0 AS DOUBLE)
             |    THEN (CAST($o AS DOUBLE) - CAST($r AS DOUBLE)
             |        *CAST($c AS DOUBLE)/CAST(nn AS DOUBLE))
             |      *(CAST($o AS DOUBLE) - CAST($r AS DOUBLE)
             |        *CAST($c AS DOUBLE)/CAST(nn AS DOUBLE))
             |      /(CAST($r AS DOUBLE)*CAST($c AS DOUBLE)
             |        /CAST(nn AS DOUBLE))
             |    ELSE CAST(0.0 AS DOUBLE) END)""".stripMargin
        s"""WITH g AS (SELECT source AS category,
           |    CAST(count(*) AS BIGINT) AS n,
           |    CAST(sum(CASE WHEN coalesce(lang, '') = 'en' THEN 1 ELSE 0
           |      END) AS BIGINT) AS pos
           |  FROM documents GROUP BY 1),
           |t AS (SELECT CAST(sum(n) AS BIGINT) AS nn,
           |    CAST(sum(pos) AS BIGINT) AS pp FROM g)
           |SELECT category, n AS n_docs, pos AS n_pos,
           |  round(${cell("pos", "n", "pp")}
           |    + ${cell("n - pos", "n", "nn - pp")}
           |    + ${cell("pp - pos", "nn - n", "pp")}
           |    + ${cell("(nn - n) - (pp - pos)", "nn - n", "nn - pp")}, 6)
           |    AS chi2
           |FROM g, t ORDER BY category""".stripMargin
      }
    ),

    // ---- Top-20 journey trigrams: two leads in the (user, ts, id)
    //      window, |types|³-bounded count key, TakeOrderedAndProject
    QueryDef(
      "q165_journey_trigrams",
      (s, dir) =>
        Behavior.journeyTrigrams(
          t(s, dir, "events"), "user_id", "ts", "event_id", "event_type",
          topN = 20),
      Some("""WITH s AS (SELECT event_type AS t1,
             |    lead(event_type, 1) OVER w AS t2,
             |    lead(event_type, 2) OVER w AS t3
             |  FROM events
             |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
             |g AS (SELECT t1, t2, t3, CAST(count(*) AS BIGINT) AS n FROM s
             |  WHERE t2 IS NOT NULL AND t3 IS NOT NULL GROUP BY 1, 2, 3)
             |SELECT t1, t2, t3, n FROM g
             |ORDER BY n DESC, t1, t2, t3 LIMIT 20""".stripMargin)
    ),

    // ---- Reciprocal-rank fusion of two query rankings (multi-query
    //      retrieval): top-100 lists by the q31-exact 4-dp cosine order,
    //      score = Σ 1/(60+rank), full-outer on the tiny lists
    QueryDef(
      "q166_rrf_fusion",
      (s, dir) =>
        graft.ext.Similarity.rrfFuse(
          t(s, dir, "embeddings"), "vec_id", "embedding",
          queryIds = Seq(1L, 2L), listSize = 100, kRrf = 60, topN = 20),
      Some {
        def cosList(qid: Long, out: String): String =
          s"""q$out AS (SELECT embedding AS qe FROM embeddings
             |  WHERE vec_id = $qid),
             |c$out AS (SELECT e.vec_id, round(
             |    list_sum(list_transform(range(1, len(e.embedding) + 1),
             |      i -> e.embedding[i]::DOUBLE * qe[i]::DOUBLE)) /
             |    (sqrt(list_sum(list_transform(e.embedding,
             |        x -> x::DOUBLE * x::DOUBLE))) *
             |     sqrt(list_sum(list_transform(qe,
             |        x -> x::DOUBLE * x::DOUBLE)))), 4) AS cs
             |  FROM embeddings e, q$out WHERE e.vec_id <> $qid),
             |l$out AS (SELECT vec_id, r FROM (SELECT vec_id,
             |    CAST(row_number() OVER (ORDER BY cs DESC, vec_id)
             |      AS BIGINT) AS r FROM c$out) WHERE r <= 100)""".stripMargin
        s"""WITH ${cosList(1L, "0")},
           |${cosList(2L, "1")},
           |f AS (SELECT coalesce(l0.vec_id, l1.vec_id) AS vec_id,
           |    l0.r AS r0, l1.r AS r1
           |  FROM l0 FULL JOIN l1 ON l0.vec_id = l1.vec_id)
           |SELECT vec_id, CAST(coalesce(r0, 0) AS BIGINT) AS rank_0,
           |  CAST(coalesce(r1, 0) AS BIGINT) AS rank_1,
           |  round((CASE WHEN r0 IS NULL THEN CAST(0.0 AS DOUBLE)
           |      ELSE CAST(1.0 AS DOUBLE)/CAST(60 + r0 AS DOUBLE) END)
           |    + (CASE WHEN r1 IS NULL THEN CAST(0.0 AS DOUBLE)
           |      ELSE CAST(1.0 AS DOUBLE)/CAST(60 + r1 AS DOUBLE) END), 6)
           |    AS rrf
           |FROM f ORDER BY rrf DESC, vec_id LIMIT 20""".stripMargin
      }
    ),

    // ---- Leakage-safe (group-consistent) split: identical-content
    //      groups assigned train/val/test as a unit by the portable hash
    //      of the group representative; max_splits_per_group == 1 is the
    //      no-leakage proof riding the output
    QueryDef(
      "q167_groupsafe_split",
      (s, dir) =>
        graft.ext.Sampling.groupSafeSplit(
          t(s, dir, "documents"), "doc_id", "text"),
      Some("""WITH g AS (SELECT doc_id AS id,
             |    ('0x' || substr(md5(text), 1, 15))::BIGINT AS ch
             |  FROM documents),
             |rep AS (SELECT ch, min(id) AS rep FROM g GROUP BY 1),
             |a AS (SELECT id, g.ch,
             |    CASE WHEN ('0x' || substr(md5(CAST(rep AS VARCHAR)), 1, 15))
             |        ::BIGINT % 10 < 8 THEN 'train'
             |      WHEN ('0x' || substr(md5(CAST(rep AS VARCHAR)), 1, 15))
             |        ::BIGINT % 10 = 8 THEN 'val'
             |      ELSE 'test' END AS split
             |  FROM g JOIN rep USING (ch)),
             |sp AS (SELECT CAST(max(ns) AS BIGINT) AS msg FROM
             |    (SELECT count(DISTINCT split) AS ns FROM a GROUP BY ch)),
             |t AS (SELECT CAST(count(*) AS BIGINT) AS tot FROM a)
             |SELECT split, CAST(count(*) AS BIGINT) AS n_docs,
             |  CAST(count(DISTINCT ch) AS BIGINT) AS n_groups,
             |  round(CAST(count(*) AS DOUBLE)/CAST(tot AS DOUBLE), 6)
             |    AS share,
             |  msg AS max_splits_per_group
             |FROM a, t, sp GROUP BY split, tot, msg
             |ORDER BY split""".stripMargin)
    ),

    // ---- Bradley-Terry preference ratings (the RLHF pairwise-comparison
    //      readout): per-part supplier price duels → (winner, loser)
    //      counts (≤ k² cells, the only distributed state) → 3 driver MM
    //      passes whose every fold is ascending-j, mirrored bit-for-bit
    //      by the twin's list_sum(list(… ORDER BY j)).
    QueryDef(
      "q184_bradley_terry",
      (s, dir) => {
        val games = graft.ext.Preference.pairwiseGamesFromScores(
          t(s, dir, "lineitem"), "l_partkey", "l_suppkey",
          "l_extendedprice")
        graft.ext.Preference.bradleyTerry(games, iters = 3, topK = 20,
          itemOut = "supp_key")
      },
      Some(bradleyTerryOracleSql)
    ),

    // ---- deterministic synchronous label propagation on the Q1-1995
    //      co-purchase graph (q162's edges): 3 sweeps, most-frequent
    //      neighbor label, ties to the lowest — community census. The
    //      oracle unrolls the 3 rounds; counts stay integers throughout
    QueryDef(
      "q224_label_propagation",
      (s, dir) => {
        val ords = t(s, dir, "orders")
          .filter(col("o_orderdate").cast("date")
            .between("1995-01-01", "1995-03-31"))
          .select(col("o_orderkey"))
        val items = t(s, dir, "lineitem")
          .select(col("l_orderkey"), col("l_partkey"))
          .join(ords, col("l_orderkey") === col("o_orderkey"))
          .select("l_orderkey", "l_partkey")
          .distinct()
        val x = items.select(col("l_orderkey").as("k"), col("l_partkey").as("pa"))
        val y = items.select(col("l_orderkey").as("k"), col("l_partkey").as("pb"))
        val pairs = x.join(y, Seq("k")).filter(col("pa") < col("pb"))
          .select(col("pa").as("src"), col("pb").as("dst"))
        graft.ext.Graph.labelPropagation(pairs, "src", "dst", rounds = 3)
          .groupBy("community")
          .agg(count(lit(1)).cast("long").as("n_members"))
          .orderBy("community")
      },
      Some(labelPropagationOracleSql)
    ),

    // ---- common-neighbor link prediction on the same Q1-1995 co-purchase
    //      graph: top-20 NON-edges by shared-neighbor count (+ Jaccard
    //      normalization) — "which parts will co-sell next". Wedge pairs
    //      partial-aggregate map-side (q141 pattern); the k survivors
    //      broadcast into the degree lookups, never the reverse
    QueryDef(
      "q228_link_prediction",
      (s, dir) => {
        val ords = t(s, dir, "orders")
          .filter(col("o_orderdate").cast("date")
            .between("1995-01-01", "1995-03-31"))
          .select(col("o_orderkey"))
        val items = t(s, dir, "lineitem")
          .select(col("l_orderkey"), col("l_partkey"))
          .join(ords, col("l_orderkey") === col("o_orderkey"))
          .select("l_orderkey", "l_partkey")
          .distinct()
        val x = items.select(col("l_orderkey").as("k"), col("l_partkey").as("pa"))
        val y = items.select(col("l_orderkey").as("k"), col("l_partkey").as("pb"))
        val pairs = x.join(y, Seq("k")).filter(col("pa") < col("pb"))
          .select(col("pa").as("src"), col("pb").as("dst"))
        graft.ext.Graph.commonNeighborTopK(pairs, "src", "dst", topK = 20)
      },
      Some("""WITH ords AS (SELECT o_orderkey FROM orders
             |    WHERE CAST(o_orderdate AS DATE)
             |      BETWEEN DATE '1995-01-01' AND DATE '1995-03-31'),
             |items AS (SELECT DISTINCT l_orderkey AS k, l_partkey AS p
             |  FROM lineitem JOIN ords ON l_orderkey = o_orderkey),
             |e AS (SELECT DISTINCT CAST(x.p AS BIGINT) AS a,
             |    CAST(y.p AS BIGINT) AS b
             |  FROM items x JOIN items y USING (k) WHERE x.p < y.p),
             |adj AS (SELECT a AS ctr, b AS nbr FROM e
             |  UNION ALL SELECT b, a FROM e),
             |deg AS (SELECT ctr, CAST(count(*) AS BIGINT) AS deg
             |  FROM adj GROUP BY 1),
             |cn AS (SELECT x.nbr AS a, y.nbr AS b,
             |    CAST(count(*) AS BIGINT) AS cn
             |  FROM adj x JOIN adj y ON x.ctr = y.ctr AND x.nbr < y.nbr
             |  GROUP BY 1, 2),
             |cand AS (SELECT cn.a, cn.b, cn.cn FROM cn
             |  ANTI JOIN e ON cn.a = e.a AND cn.b = e.b),
             |top AS (SELECT * FROM cand ORDER BY cn DESC, a, b LIMIT 20)
             |SELECT t.a, t.b, t.cn, da.deg AS deg_a, db.deg AS deg_b,
             |  CAST(t.cn AS DOUBLE) / CAST(da.deg + db.deg - t.cn AS DOUBLE)
             |    AS jaccard
             |FROM top t JOIN deg da ON da.ctr = t.a
             |  JOIN deg db ON db.ctr = t.b
             |ORDER BY t.cn DESC, t.a, t.b""".stripMargin)
    )
  )

  /** The q224 oracle: the same co-purchase edge set as q162, then 3
    * unrolled synchronous LPA rounds — per round a (node, label) count and
    * a (count DESC, label ASC) argmax via row_number, mirroring the
    * engine's struct-max exactly.
    */
  private def labelPropagationOracleSql: String = {
    val sb = new StringBuilder(
      """WITH ords AS (SELECT o_orderkey FROM orders
        |    WHERE CAST(o_orderdate AS DATE)
        |      BETWEEN DATE '1995-01-01' AND DATE '1995-03-31'),
        |items AS (SELECT DISTINCT l_orderkey AS k, l_partkey AS p
        |  FROM lineitem JOIN ords ON l_orderkey = o_orderkey),
        |e AS (SELECT DISTINCT x.p AS a, y.p AS b
        |  FROM items x JOIN items y USING (k) WHERE x.p < y.p),
        |adj AS (SELECT a AS node, b AS nbr FROM e
        |  UNION ALL SELECT b, a FROM e),
        |r0 AS (SELECT DISTINCT node, node AS community FROM adj),"""
        .stripMargin)
    for (k <- 1 to 3)
      sb ++= s"""
                |c$k AS (SELECT adj.node, l.community AS nl,
                |    CAST(count(*) AS BIGINT) AS c
                |  FROM adj JOIN r${k - 1} l ON l.node = adj.nbr
                |  GROUP BY 1, 2),
                |r$k AS (SELECT node, nl AS community FROM (
                |    SELECT node, nl, row_number()
                |      OVER (PARTITION BY node ORDER BY c DESC, nl) AS rn
                |    FROM c$k) WHERE rn = 1),""".stripMargin
    sb.toString.stripSuffix(",") +
      """
        |SELECT community, CAST(count(*) AS BIGINT) AS n_members
        |FROM r3 GROUP BY 1 ORDER BY 1""".stripMargin
  }

  /** The q184 oracle: 3 unrolled MM iterations; each denominator is a
    * `list_sum` over the ascending-j list — the exact fold order the
    * driver uses — and every count stays integer until the one division.
    */
  private def bradleyTerryOracleSql: String = {
    val sb = new StringBuilder
    sb ++= """WITH ps AS (SELECT l_partkey AS p, l_suppkey AS s,
             |    min(l_extendedprice) AS pr
             |  FROM lineitem GROUP BY 1, 2),
             |games AS (SELECT
             |    CASE WHEN a.pr < b.pr OR (a.pr = b.pr AND a.s < b.s)
             |      THEN a.s ELSE b.s END AS w,
             |    CASE WHEN a.pr < b.pr OR (a.pr = b.pr AND a.s < b.s)
             |      THEN b.s ELSE a.s END AS l
             |  FROM ps a JOIN ps b ON a.p = b.p AND a.s < b.s),
             |cnt AS (SELECT w, l, count(*) AS n FROM games GROUP BY 1, 2),
             |nijg AS (SELECT i, j, sum(n)::BIGINT AS n FROM (
             |    SELECT w AS i, l AS j, n FROM cnt
             |    UNION ALL SELECT l, w, n FROM cnt) GROUP BY 1, 2),
             |wins AS (SELECT w AS i, sum(n)::BIGINT AS wn FROM cnt GROUP BY 1),
             |r0 AS (SELECT DISTINCT i, CAST(1.0 AS DOUBLE) AS r FROM nijg),""".stripMargin
    for (k <- 1 to 3)
      sb ++= s"""
                |r$k AS (SELECT g.i,
                |    coalesce(any_value(w.wn), 0)::DOUBLE /
                |      list_sum(list(g.n::DOUBLE / (ri.r + rj.r) ORDER BY g.j)) AS r
                |  FROM nijg g
                |  JOIN r${k - 1} ri ON ri.i = g.i
                |  JOIN r${k - 1} rj ON rj.i = g.j
                |  LEFT JOIN wins w ON w.i = g.i
                |  GROUP BY g.i),""".stripMargin
    sb.toString.stripSuffix(",") +
      """
        |SELECT g.i AS supp_key, sum(g.n)::BIGINT AS n_games,
        |  coalesce(any_value(w.wn), 0)::BIGINT AS n_wins,
        |  round(any_value(r3.r), 6) AS rating
        |FROM nijg g JOIN r3 ON r3.i = g.i LEFT JOIN wins w ON w.i = g.i
        |GROUP BY g.i ORDER BY any_value(r3.r) DESC, supp_key LIMIT 20""".stripMargin
  }
}
