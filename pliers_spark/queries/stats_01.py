"""Registry module (split from the former queries.py monolith; same
@query/ORACLES contract as every sibling).

Queries: negative_sample, rake_keywords, circadian_entropy,
    semi_join_returns, custdist_hist, state_churn, attribution,
    stickiness, lead_lag_corr, cube_events, source_vocab_overlap,
    shrunk_means, share_shift, transition_entropy, group_quantiles,
    basket_lift, longest_streak, spearman_rho, benford_audit,
    session_paths, hazard_table, key_skew_report, khop_reach, mad_scale,
    time_weighted_avg, dense_counts, naive_bayes_lang, skipgram_counts,
    quantile_normalize, seasonality_strength, revenue_hierarchy,
    median_impute, rollup_multires, hash_split, rate_sample,
    stratified_sample, mixture_sample
"""
from __future__ import annotations

from ._registry import (
    F,
    T,
    TP,
    Window,
    _docs,
    _events,
    load_table,
    md5_int,
    md5_int_sql,
    query,
)
from .temporal_core import _SESSION_GAP_S
from .relational import _tok_sql
from .dedup_sim import _STOPWORD_SQL_LIST
from .curation_b import _NEG_K, _WEEK_US, _mixture_sql, _rollup_sql



@query(
    "negative_sample",
    f"""WITH anchors AS (
         SELECT doc_id AS anchor_id FROM documents WHERE doc_id < 50),
       n AS (SELECT count(*) AS n_docs FROM documents),
       cand AS (
         SELECT a.anchor_id, k.k,
                {md5_int_sql("concat('neg:', CAST(k.k AS VARCHAR), ':', CAST(a.anchor_id AS VARCHAR))")}
                  % n.n_docs AS neg_id
         FROM anchors a
         CROSS JOIN (SELECT unnest(range({_NEG_K}))::BIGINT AS k) k
         CROSS JOIN n)
       SELECT c.anchor_id, c.k, c.neg_id::BIGINT AS neg_id,
              length(trim(d.text))::BIGINT AS neg_len
       FROM cand c JOIN documents d ON d.doc_id = c.neg_id
       WHERE c.neg_id <> c.anchor_id""",
)
def q_negative_sample(spark, sf_dir):
    """Deterministic random negative sampling for contrastive training
    pairs: negative k for an anchor is md5('neg:k:anchor') mod corpus
    size — reproducible across retries and executors (a rand()-based
    sampler breaks resume and the oracle), self-pairs dropped
    explicitly. The candidate ids then JOIN the corpus to materialize
    the negatives' features — at scale that's a shuffle join on the id
    (anchors×K is the small side and broadcasts). The standard data
    prep for embedding/contrastive objectives."""
    d = _docs(spark, sf_dir)
    n_docs = d.agg(F.count(F.lit(1)).alias("n_docs"))
    anchors = d.where(F.col("doc_id") < 50).select(
        F.col("doc_id").alias("anchor_id")
    )
    cand = (
        anchors.crossJoin(
            F.broadcast(spark.range(_NEG_K).select(F.col("id").alias("k")))
        )
        .crossJoin(F.broadcast(n_docs))
        .select(
            "anchor_id", "k",
            (
                md5_int(
                    F.concat(
                        F.lit("neg:"), F.col("k").cast("string"),
                        F.lit(":"), F.col("anchor_id").cast("string"),
                    )
                ) % F.col("n_docs")
            ).alias("neg_id"),
        )
        .where(F.col("neg_id") != F.col("anchor_id"))
    )
    corpus = d.select(
        F.col("doc_id").alias("neg_id"),
        T.text_length("text").cast("long").alias("neg_len"),
    )
    return cand.join(corpus, "neg_id").select(
        "anchor_id", "k",
        F.col("neg_id").cast("long").alias("neg_id"),
        "neg_len",
    )



@query(
    "rake_keywords",
    f"""WITH tok AS (
         SELECT doc_id, pos, token,
                CASE WHEN lower(token) IN ({_STOPWORD_SQL_LIST})
                     THEN 1 ELSE 0 END AS is_stop
         FROM (SELECT doc_id,
                      unnest(range(len(string_split(trim(text), ' '))))::BIGINT AS pos,
                      unnest(string_split(trim(text), ' ')) AS token
               FROM documents)),
       seg AS (
         SELECT *, sum(is_stop) OVER (PARTITION BY doc_id ORDER BY pos
                    ROWS UNBOUNDED PRECEDING) AS phrase_id
         FROM tok),
       words AS (SELECT doc_id, phrase_id, pos, lower(token) AS w
                 FROM seg WHERE is_stop = 0),
       plen AS (
         SELECT doc_id, phrase_id, count(*)::BIGINT AS phrase_len
         FROM words GROUP BY 1, 2),
       wstat AS (
         SELECT w, count(*)::BIGINT AS freq, sum(p.phrase_len)::BIGINT AS deg,
                CAST(round(sum(p.phrase_len)::DOUBLE * 1000000.0 / count(*))
                     AS BIGINT) AS wscore_fp
         FROM words JOIN plen p USING (doc_id, phrase_id)
         GROUP BY w),
       phrases AS (
         SELECT wo.doc_id, wo.phrase_id,
                string_agg(wo.w, ' ' ORDER BY wo.pos) AS phrase,
                sum(ws.wscore_fp)::BIGINT AS score_fp
         FROM words wo JOIN wstat ws USING (w)
         GROUP BY 1, 2),
       top AS (
         SELECT doc_id, phrase, score_fp,
                row_number() OVER (PARTITION BY doc_id
                  ORDER BY score_fp DESC, phrase) AS rnk
         FROM phrases)
       SELECT doc_id, rnk::BIGINT AS rnk, phrase, score_fp
       FROM top WHERE rnk <= 3""",
)
def q_rake_keywords(spark, sf_dir):
    """RAKE keyword extraction (Rose et al. 2010) — stopword-delimited
    candidate phrases scored by summed word degree/frequency ratios:
    phrase segmentation is the SESSIONIZE pattern transplanted to token
    streams (running sum of stopword flags = phrase id, one doc-keyed
    window pass), word degree/frequency is a corpus census with
    map-side partial aggs, and each word score is rounded ONCE to
    micro-units so phrase scores are exact integer sums. Top-3 phrases
    per doc with a lexicographic tiebreak."""
    stop_arr = F.array(*[F.lit(w) for w in T.ENGLISH_STOPWORDS])
    d = _docs(spark, sf_dir)
    tok = d.select(
        "doc_id", F.posexplode(T.tokenize(F.col("text"))).alias("pos", "token")
    ).select(
        "doc_id", "pos", "token",
        F.when(F.array_contains(stop_arr, F.lower(F.col("token"))), 1)
        .otherwise(0).alias("is_stop"),
    )
    wseg = (
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    words = (
        tok.withColumn("phrase_id", F.sum("is_stop").over(wseg))
        .where(F.col("is_stop") == 0)
        .select("doc_id", "phrase_id", "pos", F.lower(F.col("token")).alias("w"))
    )
    plen = words.groupBy("doc_id", "phrase_id").agg(
        F.count(F.lit(1)).cast("long").alias("phrase_len")
    )
    wstat = (
        words.join(plen, ["doc_id", "phrase_id"])
        .groupBy("w")
        .agg(
            F.count(F.lit(1)).cast("long").alias("freq"),
            F.sum("phrase_len").cast("long").alias("deg"),
        )
        .select(
            "w",
            F.round(F.col("deg").cast("double") * F.lit(1e6) / F.col("freq"), 0)
            .cast("long").alias("wscore_fp"),
        )
    )
    phrases = (
        words.join(wstat, "w")
        .groupBy("doc_id", "phrase_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct(F.col("pos"), F.col("w")))
                    ),
                    lambda s: s.w,
                ),
                " ",
            ).alias("phrase"),
            F.sum("wscore_fp").cast("long").alias("score_fp"),
        )
    )
    wt = Window.partitionBy("doc_id").orderBy(F.desc("score_fp"), "phrase")
    return (
        phrases.withColumn("rnk", F.row_number().over(wt))
        .where(F.col("rnk") <= 3)
        .select("doc_id", F.col("rnk").cast("long").alias("rnk"),
                "phrase", "score_fp")
    )



@query(
    "circadian_entropy",
    """WITH hcnt AS (
         SELECT user_id, hour(ts) AS hod, count(*)::BIGINT AS c
         FROM events GROUP BY 1, 2),
       tot AS (
         SELECT user_id, sum(c) AS n, count(*)::BIGINT AS n_active_hours
         FROM hcnt GROUP BY user_id)
       SELECT h.user_id, t.n::BIGINT AS n_events, t.n_active_hours,
              sum(CAST(round(-(h.c::DOUBLE / t.n) * ln(h.c::DOUBLE / t.n)
                             * 1000000.0) AS BIGINT))::BIGINT AS entropy_fp
       FROM hcnt h JOIN tot t USING (user_id)
       GROUP BY h.user_id, t.n, t.n_active_hours""",
)
def q_circadian_entropy(spark, sf_dir):
    """Circadian regularity per entity: Shannon entropy of the
    hour-of-day histogram (0 = always the same hour, ln 24 ≈ 3.178 =
    uniform) — the bot-vs-human / scheduled-vs-organic signal for
    crawl sources. Hour counts are one partial agg; each entropy term
    is rounded ONCE to micro-nats (the feature_psi recipe) so the
    per-entity sum is an exact integer sum. The totals join is
    entity-grain on both sides — co-partitioned by the same key,
    no extra fact shuffle."""
    ev = _events(spark, sf_dir)
    hcnt = ev.groupBy("user_id", F.hour("ts").alias("hod")).agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    tot = hcnt.groupBy("user_id").agg(
        F.sum("c").alias("n"),
        F.count(F.lit(1)).cast("long").alias("n_active_hours"),
    )
    p = F.col("c").cast("double") / F.col("n")
    term = F.round(-p * F.log(p) * F.lit(1e6), 0).cast("long")
    return (
        hcnt.join(tot, "user_id")
        .groupBy("user_id", "n", "n_active_hours")
        .agg(F.sum(term).cast("long").alias("entropy_fp"))
        .select(
            "user_id",
            F.col("n").cast("long").alias("n_events"),
            "n_active_hours",
            "entropy_fp",
        )
    )



@query(
    "semi_join_returns",
    """SELECT o_orderpriority, count(*)::BIGINT AS order_count
       FROM orders
       WHERE o_orderdate >= TIMESTAMP '1995-07-01'
         AND o_orderdate < TIMESTAMP '1996-07-01'
         AND EXISTS (SELECT 1 FROM lineitem
                     WHERE l_orderkey = o_orderkey
                       AND l_returnflag = 'R')
       GROUP BY o_orderpriority""",
)
def q_semi_join_returns(spark, sf_dir):
    """TPC-H Q4's LEFT SEMI join shape (order-priority checking,
    adapted to this schema's columns): existence of a returned
    lineitem, never materializing match multiplicity (a plain join
    would double-count orders with several returned lines and force a
    distinct). The date filter pushes to the orders scan; the semi
    join shuffles both sides on the key once and AQE handles any hot
    order. Complements dq_checks' ANTI joins — both existence
    polarities covered."""
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    late = lineitem.where(F.col("l_returnflag") == "R").select(
        F.col("l_orderkey").alias("o_orderkey")
    )
    return (
        orders.where(
            (F.col("o_orderdate") >= F.lit("1995-07-01 00:00:00").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1996-07-01 00:00:00").cast("timestamp"))
        )
        .join(late, "o_orderkey", "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).cast("long").alias("order_count"))
    )



@query(
    "custdist_hist",
    """WITH c_orders AS (
         SELECT c.c_custkey, count(o.o_orderkey)::BIGINT AS c_count
         FROM customer c LEFT JOIN orders o
           ON c.c_custkey = o.o_custkey
          AND o.o_orderpriority <> '1-URGENT'
         GROUP BY c.c_custkey)
       SELECT c_count, count(*)::BIGINT AS custdist
       FROM c_orders GROUP BY c_count""",
)
def q_custdist_hist(spark, sf_dir):
    """Customer distribution (TPC-H Q13 shape) — the left-outer join
    with a JOIN-TIME predicate (the priority filter must sit in the ON
    clause, not a WHERE, or zero-order customers silently vanish from
    the histogram) followed by two-level re-aggregation:
    orders-per-customer, then the histogram of that. The second
    groupBy runs over customer-grain data — already tiny — and the
    first gets map-side partial counts. The classic 'distribution of
    engagement' report shape."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    o = orders.where(F.col("o_orderpriority") != "1-URGENT").select(
        "o_custkey", "o_orderkey"
    )
    c_orders = (
        customer.select("c_custkey")
        .join(o, customer.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").cast("long").alias("c_count"))
    )
    return c_orders.groupBy("c_count").agg(
        F.count(F.lit(1)).cast("long").alias("custdist")
    )



_CHURN_T1 = "2024-01-15 00:00:00"

_CHURN_T2 = "2024-01-30 00:00:00"



@query(
    "state_churn",
    f"""WITH s1 AS (
         SELECT user_id, event_type AS state_t1 FROM (
           SELECT user_id, event_type,
                  row_number() OVER (PARTITION BY user_id
                    ORDER BY ts DESC, event_id DESC) AS rn
           FROM events WHERE ts <= TIMESTAMP '{_CHURN_T1}') WHERE rn = 1),
       s2 AS (
         SELECT user_id, event_type AS state_t2 FROM (
           SELECT user_id, event_type,
                  row_number() OVER (PARTITION BY user_id
                    ORDER BY ts DESC, event_id DESC) AS rn
           FROM events WHERE ts <= TIMESTAMP '{_CHURN_T2}') WHERE rn = 1)
       SELECT s2.user_id, s1.state_t1, s2.state_t2,
              (s1.state_t1 IS NOT NULL
               AND s1.state_t1 <> s2.state_t2) AS changed
       FROM s2 LEFT JOIN s1 USING (user_id)""",
)
def q_state_churn(spark, sf_dir):
    """State churn between two snapshot cutoffs — how volatile is the
    latest-known state per entity (the crawl-freshness planning
    signal: high churn → revisit often): latest state as-of T1 and
    as-of T2 via max-by-(ts, id) structs (argmax with a deterministic
    tiebreak, NO window sort — one partial-aggregable max per cutoff),
    then an entity-grain compare. Both aggs and the join share the
    entity key; entities born after T1 report NULL→state (not
    'changed')."""
    from pliers_spark.operators._util import epoch_micros

    ev = _events(spark, sf_dir)
    u = epoch_micros(ev, "ts")

    def latest_before(cutoff, out):
        return (
            ev.where(F.col("ts") <= F.lit(cutoff).cast("timestamp"))
            .groupBy("user_id")
            .agg(
                F.max(
                    F.struct(
                        u.alias("u"),
                        F.col("event_id").alias("eid"),
                        F.col("event_type").alias("state"),
                    )
                ).getField("state").alias(out)
            )
        )

    s1 = latest_before(_CHURN_T1, "state_t1")
    s2 = latest_before(_CHURN_T2, "state_t2")
    return s2.join(s1, "user_id", "left").select(
        "user_id", "state_t1", "state_t2",
        (
            F.col("state_t1").isNotNull()
            & (F.col("state_t1") != F.col("state_t2"))
        ).alias("changed"),
    )



_ATTR_WIN_US = 7 * 86_400_000_000



@query(
    "attribution",
    f"""WITH base AS (
         SELECT event_id, user_id, event_type, epoch_us(ts) AS u FROM events),
       scanned AS (
         SELECT *,
                min(CASE WHEN event_type = 'click' THEN u END) OVER w
                  AS first_click_u,
                max(CASE WHEN event_type = 'click' THEN u END) OVER w
                  AS last_click_u
         FROM base
         WINDOW w AS (PARTITION BY user_id ORDER BY u
                      RANGE BETWEEN {_ATTR_WIN_US} PRECEDING AND 1 PRECEDING))
       SELECT event_id, user_id,
              first_click_u::BIGINT AS first_click_u,
              last_click_u::BIGINT AS last_click_u,
              (u - last_click_u)::BIGINT AS gap_to_last_click_us
       FROM scanned WHERE event_type = 'purchase'""",
)
def q_attribution(spark, sf_dir):
    """First-touch / last-touch attribution — for every conversion,
    the earliest and latest preceding click inside a 7-day lookback:
    two conditional extremes over ONE strictly-past range frame (the
    same single (user, u) Exchange+Sort as every other windowed
    feature; frames end 1µs before the purchase so a same-instant
    click never self-attributes). NULL when no click is in window —
    the 'organic conversion' signal. The revenue-assignment primitive
    behind every marketing-mix table."""
    from pliers_spark.operators._util import epoch_micros

    ev = _events(spark, sf_dir)
    base = ev.select(
        "event_id", "user_id", "event_type", epoch_micros(ev, "ts").alias("u")
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("u")
        .rangeBetween(-_ATTR_WIN_US, -1)
    )
    click_u = F.when(F.col("event_type") == "click", F.col("u"))
    scanned = base.select(
        "*",
        F.min(click_u).over(w).alias("first_click_u"),
        F.max(click_u).over(w).alias("last_click_u"),
    )
    return scanned.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id",
        F.col("first_click_u").cast("long").alias("first_click_u"),
        F.col("last_click_u").cast("long").alias("last_click_u"),
        (F.col("u") - F.col("last_click_u")).cast("long")
        .alias("gap_to_last_click_us"),
    )



@query(
    "stickiness",
    f"""WITH uw AS (
         SELECT DISTINCT user_id, epoch_us(ts) // {_WEEK_US} AS w FROM events),
       weeks AS (SELECT DISTINCT w FROM uw),
       wau AS (SELECT w, count(*)::BIGINT AS n_wau FROM uw GROUP BY w),
       m4 AS (
         SELECT wk.w, count(DISTINCT u.user_id)::BIGINT AS n_m4
         FROM weeks wk JOIN uw u ON u.w BETWEEN wk.w - 3 AND wk.w
         GROUP BY wk.w)
       SELECT w::BIGINT AS w, wau.n_wau, m4.n_m4,
              CAST(round(wau.n_wau::DOUBLE * 1000000.0 / m4.n_m4) AS BIGINT)
                AS stickiness_fp
       FROM wau JOIN m4 USING (w)""",
)
def q_stickiness(spark, sf_dir):
    """WAU / 4-week-AU stickiness ratio (the DAU/MAU engagement metric
    at week grain): the fact table collapses ONCE to distinct
    (entity, epoch-week) pairs — everything after runs on that tiny
    entity-week grain, including the sliding 4-week distinct, which is
    a self-range-join of the small table against its own week spine
    (never a sliding distinct over raw events). Integer micro-ratios
    rounded once."""
    from pliers_spark.operators._util import epoch_micros

    ev = _events(spark, sf_dir)
    uw = ev.select(
        "user_id", F.floor(epoch_micros(ev, "ts") / _WEEK_US).alias("w")
    ).distinct()
    weeks = uw.select("w").distinct()
    wau = uw.groupBy("w").agg(F.count(F.lit(1)).cast("long").alias("n_wau"))
    u2 = uw.select(F.col("user_id"), F.col("w").alias("uw_w"))
    m4 = (
        weeks.join(
            u2,
            (F.col("uw_w") >= F.col("w") - 3) & (F.col("uw_w") <= F.col("w")),
        )
        .groupBy("w")
        .agg(F.countDistinct("user_id").cast("long").alias("n_m4"))
    )
    return (
        wau.join(m4, "w")
        .select(
            F.col("w").cast("long").alias("w"),
            "n_wau",
            "n_m4",
            F.round(
                F.col("n_wau").cast("double") * F.lit(1e6) / F.col("n_m4"), 0
            ).cast("long").alias("stickiness_fp"),
        )
    )



_XCORR_MAX_LAG = 6



@query(
    "lead_lag_corr",
    f"""WITH hc AS (
         SELECT epoch_us(ts) // 3600000000 AS h,
                sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)::BIGINT AS x,
                sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)::BIGINT AS y
         FROM events GROUP BY h),
       lags AS (SELECT unnest(range({_XCORR_MAX_LAG + 1}))::BIGINT AS lag),
       pairs AS (
         SELECT l.lag, a.x, b.y
         FROM lags l
         JOIN hc a ON TRUE
         JOIN hc b ON b.h = a.h + l.lag),
       s AS (
         SELECT lag, count(*)::BIGINT AS n, sum(x) AS sx, sum(y) AS sy,
                sum(x * y) AS sxy, sum(x * x) AS sxx, sum(y * y) AS syy
         FROM pairs GROUP BY lag)
       SELECT lag, n,
              CASE WHEN n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0
                   THEN CAST(round((n * sxy - sx * sy)::DOUBLE
                     / (sqrt((n * sxx - sx * sx)::DOUBLE)
                        * sqrt((n * syy - sy * sy)::DOUBLE))
                     * 1000000.0) AS BIGINT)
              END AS r_fp
       FROM s""",
)
def q_lead_lag_corr(spark, sf_dir):
    """Lead-lag cross-correlation between two event streams (do clicks
    lead purchases, and by how many hours): the fact table collapses
    ONCE to an hourly two-series table, every lag then correlates that
    tiny series against its own shifted self (equi-join on h = h+lag —
    never a window per lag, never the fact table again). Pearson r per
    lag from exact int64 sufficient statistics, the autocorr_lag1
    recipe; the argmax lag is the actionable lead time."""
    from pliers_spark.operators._util import epoch_micros

    ev = _events(spark, sf_dir)
    hc = ev.groupBy(
        F.floor(epoch_micros(ev, "ts") / F.lit(3_600_000_000)).alias("h")
    ).agg(
        F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0))
        .cast("long").alias("x"),
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
        .cast("long").alias("y"),
    )
    lags = spark.range(_XCORR_MAX_LAG + 1).select(F.col("id").alias("lag"))
    a = hc.select("h", "x")
    b = hc.select(F.col("h").alias("hb"), "y")
    pairs = (
        F.broadcast(lags)
        .crossJoin(a)
        .join(b, F.col("hb") == F.col("h") + F.col("lag"))
    )
    s = pairs.groupBy("lag").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    vx = n * F.col("sxx") - sx * sx
    vy = n * F.col("syy") - sy * sy
    r = F.round(
        (n * F.col("sxy") - sx * sy).cast("double")
        / (F.sqrt(vx.cast("double")) * F.sqrt(vy.cast("double")))
        * F.lit(1e6),
        0,
    ).cast("long")
    return s.select(
        "lag", "n", F.when((vx > 0) & (vy > 0), r).alias("r_fp")
    )



@query(
    "cube_events",
    """SELECT coalesce(event_type, 'ALL') AS event_type,
              coalesce(hod, -1)::BIGINT AS hod,
              grouping(event_type)::BIGINT + 2 * grouping(hod)::BIGINT
                AS grouping_id,
              count(*)::BIGINT AS n,
              sum(CAST(round(value * 1000000.0) AS BIGINT))::BIGINT AS sum_fp
       FROM (SELECT event_type, hour(ts)::BIGINT AS hod, value FROM events)
       GROUP BY CUBE (event_type, hod)""",
)
def q_cube_events(spark, sf_dir):
    """OLAP CUBE over (event_type, hour-of-day) — all four grouping
    sets (detail, each one-way rollup, grand total) in ONE aggregation:
    Spark's Expand operator fans each row into its grouping
    combinations map-side and the partial aggs still combine before
    the single shuffle — at 10^12 rows that beats four separate
    groupBys by 4× on scan cost alone. grouping() flags disambiguate
    the NULL-as-total rows (coalesced to sentinels so the hash compare
    has no NULL/total ambiguity)."""
    ev = _events(spark, sf_dir)
    base = ev.select(
        "event_type",
        F.hour("ts").cast("long").alias("hod"),
        F.round(F.col("value") * F.lit(1e6), 0).cast("long").alias("v_fp"),
    )
    out = base.cube("event_type", "hod").agg(
        (
            F.grouping("event_type").cast("long")
            + 2 * F.grouping("hod").cast("long")
        ).alias("grouping_id"),
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("v_fp").cast("long").alias("sum_fp"),
    )
    return out.select(
        F.coalesce(F.col("event_type"), F.lit("ALL")).alias("event_type"),
        F.coalesce(F.col("hod"), F.lit(-1)).cast("long").alias("hod"),
        "grouping_id",
        "n",
        "sum_fp",
    )



@query(
    "source_vocab_overlap",
    f"""WITH st AS (
         SELECT DISTINCT source, unnest({_tok_sql()}) AS token FROM documents),
       sizes AS (SELECT source, count(*)::BIGINT AS n FROM st GROUP BY source),
       inter AS (
         SELECT a.source AS src_a, b.source AS src_b, count(*)::BIGINT AS n_inter
         FROM st a JOIN st b ON a.token = b.token AND a.source < b.source
         GROUP BY 1, 2)
       SELECT i.src_a, i.src_b, sa.n AS n_a, sb.n AS n_b, i.n_inter,
              CAST(round(i.n_inter::DOUBLE * 1000000.0
                         / (sa.n + sb.n - i.n_inter)) AS BIGINT) AS jaccard_fp
       FROM inter i
       JOIN sizes sa ON sa.source = i.src_a
       JOIN sizes sb ON sb.source = i.src_b""",
)
def q_source_vocab_overlap(spark, sf_dir):
    """Vocabulary overlap between corpus sources (the diversity audit
    before mixing: near-identical vocabularies mean the 'new' source
    adds little): the corpus collapses ONCE to distinct (source, token)
    pairs, the token-keyed self-join counts intersections (source
    cardinality is tiny, so pair fan-out per token is bounded by
    |sources|² — and the ordered predicate halves it), and Jaccard is
    exact integer |∩| / (|A|+|B|−|∩|) rounded once. Size dims broadcast
    back onto the pair table."""
    d = _docs(spark, sf_dir)
    st = d.select(
        "source", F.explode(T.tokenize(F.col("text"))).alias("token")
    ).distinct()
    sizes = st.groupBy("source").agg(F.count(F.lit(1)).cast("long").alias("n"))
    a = st.select(F.col("source").alias("src_a"), "token")
    b = st.select(F.col("source").alias("src_b"), "token")
    inter = (
        a.join(b, "token")
        .where(F.col("src_a") < F.col("src_b"))
        .groupBy("src_a", "src_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_inter"))
    )
    sa = sizes.select(F.col("source").alias("src_a"), F.col("n").alias("n_a"))
    sb = sizes.select(F.col("source").alias("src_b"), F.col("n").alias("n_b"))
    return (
        inter.join(F.broadcast(sa), "src_a")
        .join(F.broadcast(sb), "src_b")
        .select(
            "src_a", "src_b", "n_a", "n_b", "n_inter",
            F.round(
                F.col("n_inter").cast("double") * F.lit(1e6)
                / (F.col("n_a") + F.col("n_b") - F.col("n_inter")),
                0,
            ).cast("long").alias("jaccard_fp"),
        )
    )



_SHRINK_K = 20



@query(
    "shrunk_means",
    f"""WITH base AS (
         SELECT event_type, CAST(round(value * 1000000.0) AS BIGINT) AS v_fp
         FROM events),
       g AS (SELECT sum(v_fp) AS gs, count(*) AS gn FROM base),
       c AS (
         SELECT event_type, count(*)::BIGINT AS n, sum(v_fp) AS s
         FROM base GROUP BY event_type)
       SELECT c.event_type, c.n,
              CAST(round(c.s::DOUBLE / c.n) AS BIGINT) AS raw_mean_fp,
              CAST(round(g.gs::DOUBLE / g.gn) AS BIGINT) AS prior_mean_fp,
              CAST(round((c.s::DOUBLE + {_SHRINK_K}.0 * (g.gs::DOUBLE / g.gn))
                         / (c.n + {_SHRINK_K})) AS BIGINT) AS shrunk_mean_fp
       FROM c CROSS JOIN g""",
)
def q_shrunk_means(spark, sf_dir):
    """Empirical-Bayes (James-Stein-style) shrunk category means — the
    production form of mean/target encoding: rare categories pull
    toward the global prior with pseudo-count k={_SHRINK_K}, so a
    category seen 3 times can't memorize its 3 labels (the
    regularization target_encode_pit's strictly-past frame still
    needs when categories are sparse). Two partial aggs — category
    sums and a 1-row broadcast prior — and one mirrored IEEE
    expression per category, rounded once."""
    ev = _events(spark, sf_dir)
    base = ev.select(
        "event_type",
        F.round(F.col("value") * F.lit(1e6), 0).cast("long").alias("v_fp"),
    )
    g = base.agg(
        F.sum("v_fp").alias("gs"), F.count(F.lit(1)).alias("gn")
    )
    c = base.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"), F.sum("v_fp").alias("s")
    )
    prior = F.col("gs").cast("double") / F.col("gn")
    return c.crossJoin(F.broadcast(g)).select(
        "event_type",
        "n",
        F.round(F.col("s").cast("double") / F.col("n"), 0)
        .cast("long").alias("raw_mean_fp"),
        F.round(prior, 0).cast("long").alias("prior_mean_fp"),
        F.round(
            (F.col("s").cast("double") + _SHRINK_K * prior)
            / (F.col("n") + _SHRINK_K),
            0,
        ).cast("long").alias("shrunk_mean_fp"),
    )



@query(
    "share_shift",
    f"""WITH wk AS (
         SELECT epoch_us(ts) // {_WEEK_US} AS w, event_type,
                count(*)::BIGINT AS n
         FROM events GROUP BY 1, 2),
       tot AS (SELECT w, sum(n) AS wn FROM wk GROUP BY w),
       shares AS (
         SELECT wk.w, wk.event_type, wk.n,
                CAST(round(wk.n::DOUBLE * 1000000.0 / tot.wn) AS BIGINT)
                  AS share_fp
         FROM wk JOIN tot USING (w))
       SELECT w::BIGINT AS w, event_type, n, share_fp,
              (share_fp - lag(share_fp) OVER
                 (PARTITION BY event_type ORDER BY w))::BIGINT
                AS share_delta_fp
       FROM shares""",
)
def q_share_shift(spark, sf_dir):
    """Share-of-total per week + week-over-week share shift (the mix
    drift report: which event type is gaining share): weekly counts
    are one partial agg, the weekly totals join runs at week grain,
    shares are single-rounded micro-fractions, and the WoW delta is a
    lag over the tiny (type, week) table — the fact table is touched
    exactly once. Integer epoch weeks, no calendar ambiguity."""
    from pliers_spark.operators._util import epoch_micros

    ev = _events(spark, sf_dir)
    wk = ev.groupBy(
        F.floor(epoch_micros(ev, "ts") / _WEEK_US).alias("w"), "event_type"
    ).agg(F.count(F.lit(1)).cast("long").alias("n"))
    tot = wk.groupBy("w").agg(F.sum("n").alias("wn"))
    shares = wk.join(tot, "w").select(
        "w", "event_type", "n",
        F.round(F.col("n").cast("double") * F.lit(1e6) / F.col("wn"), 0)
        .cast("long").alias("share_fp"),
    )
    wl = Window.partitionBy("event_type").orderBy("w")
    return shares.select(
        F.col("w").cast("long").alias("w"),
        "event_type",
        "n",
        "share_fp",
        (F.col("share_fp") - F.lag("share_fp").over(wl)).cast("long")
        .alias("share_delta_fp"),
    )



@query(
    "transition_entropy",
    """WITH pairs AS (
         SELECT user_id,
                lag(event_type) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS prev_type,
                event_type AS next_type
         FROM events),
       cnt AS (
         SELECT user_id, prev_type, next_type, count(*)::BIGINT AS c
         FROM pairs WHERE prev_type IS NOT NULL GROUP BY 1, 2, 3),
       rowtot AS (
         SELECT user_id, prev_type, sum(c) AS rn FROM cnt GROUP BY 1, 2),
       terms AS (
         SELECT c.user_id, c.prev_type, r.rn, c.c,
                CAST(round(-(c.c::DOUBLE / r.rn) * ln(c.c::DOUBLE / r.rn)
                           * 1000000.0) AS BIGINT) AS term_fp
         FROM cnt c JOIN rowtot r USING (user_id, prev_type)),
       hrow AS (
         SELECT user_id, prev_type, max(rn) AS rn,
                sum(term_fp)::BIGINT AS h_fp
         FROM terms GROUP BY 1, 2),
       utot AS (SELECT user_id, sum(rn) AS un FROM hrow GROUP BY user_id)
       SELECT h.user_id,
              CAST(round(sum(h.h_fp * h.rn)::DOUBLE / u.un) AS BIGINT)
                AS entropy_rate_fp
       FROM hrow h JOIN utot u USING (user_id)
       GROUP BY h.user_id, u.un""",
)
def q_transition_entropy(spark, sf_dir):
    """Per-entity Markov entropy RATE — how predictable is each
    entity's next event given its current one: H(next|prev) = Σ_prev
    p(prev)·H(next|prev=s), the sequence-predictability feature that
    separates scripted agents (≈0) from organic users. Bigram counts
    from one sorted lag pass; per-row entropies use the micro-nat
    single-rounding recipe; the p(prev) mixture weights are exact
    count ratios applied as an EXACT int64 weighted sum (Σ h_fp·rn,
    divided once at the end — a double-valued sum would be
    accumulation-order-dependent across engines). Every join after the
    lag runs on (entity, type) grain — never the fact table twice."""
    ev = _events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = ev.select(
        "user_id",
        F.lag("event_type").over(w).alias("prev_type"),
        F.col("event_type").alias("next_type"),
    ).where(F.col("prev_type").isNotNull())
    cnt = pairs.groupBy("user_id", "prev_type", "next_type").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    rowtot = cnt.groupBy("user_id", "prev_type").agg(F.sum("c").alias("rn"))
    p = F.col("c").cast("double") / F.col("rn")
    terms = cnt.join(rowtot, ["user_id", "prev_type"]).select(
        "user_id", "prev_type", "rn", "c",
        F.round(-p * F.log(p) * F.lit(1e6), 0).cast("long").alias("term_fp"),
    )
    hrow = terms.groupBy("user_id", "prev_type").agg(
        F.max("rn").alias("rn"), F.sum("term_fp").cast("long").alias("h_fp")
    )
    utot = hrow.groupBy("user_id").agg(F.sum("rn").alias("un"))
    return (
        hrow.join(utot, "user_id")
        .groupBy("user_id", "un")
        .agg(F.sum(F.col("h_fp") * F.col("rn")).alias("wsum"))
        .select(
            "user_id",
            F.round(F.col("wsum").cast("double") / F.col("un"), 0)
            .cast("long").alias("entropy_rate_fp"),
        )
    )



@query(
    "group_quantiles",
    """WITH base AS (
         SELECT event_type, CAST(round(value * 1000000.0) AS BIGINT) AS v_fp,
                event_id
         FROM events),
       ranked AS (
         SELECT event_type, v_fp,
                row_number() OVER (PARTITION BY event_type
                                   ORDER BY v_fp, event_id) AS rn,
                count(*) OVER (PARTITION BY event_type) AS n
         FROM base)
       SELECT event_type, max(n)::BIGINT AS n,
              max(CASE WHEN rn = (10 * n + 99) // 100 THEN v_fp END)::BIGINT
                AS p10_fp,
              max(CASE WHEN rn = (50 * n + 99) // 100 THEN v_fp END)::BIGINT
                AS p50_fp,
              max(CASE WHEN rn = (90 * n + 99) // 100 THEN v_fp END)::BIGINT
                AS p90_fp
       FROM ranked GROUP BY event_type""",
)
def q_group_quantiles(spark, sf_dir):
    """Exact per-group quantiles as ORDER STATISTICS (p10/p50/p90 via
    rank = ceil(p·n)) — actual data values selected by integer rank,
    the winsorize discipline generalized to a quantile report: no
    interpolation formula, no approx-percentile sketch error, nothing
    for two engines to disagree on. One keyed rank window + one
    conditional-max agg sharing the group shuffle; at corpus scale the
    sort is partition-sized per group."""
    ev = _events(spark, sf_dir)
    base = ev.select(
        "event_type",
        F.round(F.col("value") * F.lit(1e6), 0).cast("long").alias("v_fp"),
        "event_id",
    )
    wr = Window.partitionBy("event_type").orderBy("v_fp", "event_id")
    wall = Window.partitionBy("event_type")
    ranked = base.select(
        "event_type", "v_fp",
        F.row_number().over(wr).alias("rn"),
        F.count(F.lit(1)).over(wall).alias("n"),
    )

    def at(p):
        rank = F.floor((p * F.col("n") + 99) / 100)
        return F.max(F.when(F.col("rn") == rank, F.col("v_fp"))).cast("long")

    return ranked.groupBy("event_type").agg(
        F.max("n").cast("long").alias("n"),
        at(10).alias("p10_fp"),
        at(50).alias("p50_fp"),
        at(90).alias("p90_fp"),
    )



@query(
    "basket_lift",
    f"""WITH flagged AS (
         SELECT user_id, ts, event_id, event_type,
                CASE WHEN lag(ts) OVER w IS NULL
                          OR epoch(ts) - epoch(lag(ts) OVER w) > {_SESSION_GAP_S}
                     THEN 1 ELSE 0 END AS is_new
         FROM events
         WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
       sess AS (
         SELECT user_id, event_type,
                sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                  ROWS UNBOUNDED PRECEDING) AS session_id
         FROM flagged),
       baskets AS (SELECT DISTINCT user_id, session_id, event_type FROM sess),
       nb AS (SELECT count(DISTINCT (user_id, session_id)) AS n FROM baskets),
       item AS (
         SELECT event_type, count(*)::BIGINT AS c FROM baskets GROUP BY 1),
       pair AS (
         SELECT a.event_type AS item_a, b.event_type AS item_b,
                count(*)::BIGINT AS c_ab
         FROM baskets a JOIN baskets b
           ON a.user_id = b.user_id AND a.session_id = b.session_id
          AND a.event_type < b.event_type
         GROUP BY 1, 2)
       SELECT p.item_a, p.item_b, p.c_ab, ia.c AS c_a, ib.c AS c_b,
              CAST(round(p.c_ab::DOUBLE * 1000000.0 / ia.c) AS BIGINT)
                AS confidence_fp,
              CAST(round(p.c_ab::DOUBLE * nb.n / (ia.c::DOUBLE * ib.c)
                         * 1000000.0) AS BIGINT) AS lift_fp
       FROM pair p
       JOIN item ia ON ia.event_type = p.item_a
       JOIN item ib ON ib.event_type = p.item_b
       CROSS JOIN nb""",
)
def q_basket_lift(spark, sf_dir):
    """Market-basket association mining over SESSIONS as baskets:
    support, confidence, and lift for every event-type pair that
    co-occurs inside a gap-session. The basket table is distinct
    (entity, session, type) — tiny — so the pair self-join fans out by
    at most |types|² per basket, never by raw events; item supports
    and the basket count are broadcast dims. Lift > 1e6 (micro-units)
    = genuinely associated behaviors, the recommender/bundling
    primitive. Reuses temporal.sessionize's running-flag pattern."""
    ev = _events(spark, sf_dir).select("user_id", "ts", "event_id", "event_type")
    s = TP.sessionize(ev, ["user_id"], "ts", gap_seconds=_SESSION_GAP_S)
    baskets = s.select("user_id", "session_id", "event_type").distinct()
    nb = baskets.select("user_id", "session_id").distinct().agg(
        F.count(F.lit(1)).alias("n")
    )
    item = baskets.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    a = baskets.select("user_id", "session_id", F.col("event_type").alias("item_a"))
    b = baskets.select("user_id", "session_id", F.col("event_type").alias("item_b"))
    pair = (
        a.join(b, ["user_id", "session_id"])
        .where(F.col("item_a") < F.col("item_b"))
        .groupBy("item_a", "item_b")
        .agg(F.count(F.lit(1)).cast("long").alias("c_ab"))
    )
    ia = item.select(F.col("event_type").alias("item_a"), F.col("c").alias("c_a"))
    ib = item.select(F.col("event_type").alias("item_b"), F.col("c").alias("c_b"))
    return (
        pair.join(F.broadcast(ia), "item_a")
        .join(F.broadcast(ib), "item_b")
        .crossJoin(F.broadcast(nb))
        .select(
            "item_a", "item_b", "c_ab", "c_a", "c_b",
            F.round(F.col("c_ab").cast("double") * F.lit(1e6) / F.col("c_a"), 0)
            .cast("long").alias("confidence_fp"),
            F.round(
                F.col("c_ab").cast("double") * F.col("n")
                / (F.col("c_a").cast("double") * F.col("c_b"))
                * F.lit(1e6),
                0,
            ).cast("long").alias("lift_fp"),
        )
    )



@query(
    "longest_streak",
    """WITH flagged AS (
         SELECT user_id, ts, event_id, event_type,
                CASE WHEN lag(event_type) OVER w IS NULL
                          OR lag(event_type) OVER w <> event_type
                     THEN 1 ELSE 0 END AS is_new
         FROM events
         WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
       runs AS (
         SELECT user_id, event_type,
                sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                  ROWS UNBOUNDED PRECEDING) AS run_id
         FROM flagged),
       runlen AS (
         SELECT user_id, event_type, run_id, count(*)::BIGINT AS len
         FROM runs GROUP BY 1, 2, 3)
       SELECT user_id, len::BIGINT AS max_streak, event_type AS streak_type
       FROM (SELECT *, row_number() OVER (PARTITION BY user_id
               ORDER BY len DESC, event_type DESC) AS rnk FROM runlen)
       WHERE rnk = 1""",
)
def q_longest_streak(spark, sf_dir):
    """Longest same-type run per entity — the gaps-and-islands pattern
    on VALUE changes rather than time gaps (sessionize's sibling):
    change flags from one lag pass, run ids from the running flag sum,
    run lengths from a grain-reduced groupBy, then max-with-tiebreak
    (longest run, lexicographically-LAST type on equal lengths — the
    struct-max convention both engines share, fully deterministic). Burst/monotony signal: a 40-event 'error' streak
    is an incident, a 40-event 'click' streak is a bot."""
    ev = _events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag("event_type").over(w)
    flagged = ev.select(
        "user_id", "ts", "event_id", "event_type",
        F.when(prev.isNull() | (prev != F.col("event_type")), 1)
        .otherwise(0).alias("is_new"),
    )
    wc = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    runs = flagged.withColumn("run_id", F.sum("is_new").over(wc))
    runlen = runs.groupBy("user_id", "event_type", "run_id").agg(
        F.count(F.lit(1)).cast("long").alias("len")
    )
    best = F.max(
        F.struct(F.col("len"), F.col("event_type").alias("t"))
    )
    return runlen.groupBy("user_id").agg(
        F.max("len").cast("long").alias("max_streak"),
        best.getField("t").alias("streak_type"),
    )



@query(
    "spearman_rho",
    """WITH f AS (
         SELECT doc_id, length(trim(text))::BIGINT AS a,
                len(string_split(trim(text), ' '))::BIGINT AS b
         FROM documents),
       ranked AS (
         SELECT doc_id,
                2 * rank() OVER (ORDER BY a) + count(*) OVER (PARTITION BY a)
                  - 1 AS ra2,
                2 * rank() OVER (ORDER BY b) + count(*) OVER (PARTITION BY b)
                  - 1 AS rb2
         FROM f)
       SELECT count(*)::BIGINT AS n,
              CAST(round(
                (count(*) * sum(ra2 * rb2) - sum(ra2) * sum(rb2))::DOUBLE
                / (sqrt((count(*) * sum(ra2 * ra2) - sum(ra2) * sum(ra2))::DOUBLE)
                   * sqrt((count(*) * sum(rb2 * rb2) - sum(rb2) * sum(rb2))::DOUBLE))
                * 1000000.0) AS BIGINT) AS rho_fp
       FROM ranked""",
)
def q_spearman_rho(spark, sf_dir):
    """EXACT Spearman rank correlation between two features (doc
    length vs token count): tie-averaged ranks stay INTEGER via the
    2×rank + tie_count − 1 identity (the roc_auc trick), so Pearson on
    the doubled ranks runs on exact int64 sufficient statistics with
    separate sqrt terms and ONE final rounding. The robust dependence
    measure feature selection uses when the relationship is monotone
    but not linear. CENSUS GRAIN (r4): raw rows contract to (a,b)
    cells in one map-side-combined shuffle; the doubled avg-rank of
    each distinct value comes from a census-frame window
    (operators/census.py) and joins back by broadcast, so no
    unpartitioned window ever sees raw rows — sums weight each cell by
    its count, identical arithmetic to the per-row form."""
    from pliers_spark.operators.census import with_census_ranks

    d = _docs(spark, sf_dir)
    f = d.select(
        T.text_length("text").cast("long").alias("a"),
        F.size(T.tokenize(F.col("text"))).cast("long").alias("b"),
    )
    cells = f.groupBy("a", "b").agg(F.count(F.lit(1)).alias("n_ab"))
    ca = with_census_ranks(
        cells.groupBy("a").agg(F.sum("n_ab").alias("cnt")), "a", r2="ra2"
    )
    cb = with_census_ranks(
        cells.groupBy("b").agg(F.sum("n_ab").alias("cnt")), "b", r2="rb2"
    )
    j = (
        cells.join(F.broadcast(ca.select("a", "ra2")), "a")
        .join(F.broadcast(cb.select("b", "rb2")), "b")
    )
    w = F.col("n_ab")
    n = F.sum(w)
    sa = F.sum(w * F.col("ra2"))
    sb = F.sum(w * F.col("rb2"))
    sab = F.sum(w * F.col("ra2") * F.col("rb2"))
    saa = F.sum(w * F.col("ra2") * F.col("ra2"))
    sbb = F.sum(w * F.col("rb2") * F.col("rb2"))
    return j.agg(
        n.cast("long").alias("n"),
        F.round(
            (n * sab - sa * sb).cast("double")
            / (
                F.sqrt((n * saa - sa * sa).cast("double"))
                * F.sqrt((n * sbb - sb * sb).cast("double"))
            )
            * F.lit(1e6),
            0,
        ).cast("long").alias("rho_fp"),
    )



@query(
    "benford_audit",
    """WITH d1 AS (
         SELECT CAST(substr(CAST(CAST(round(value * 100.0) AS BIGINT)
                            AS VARCHAR), 1, 1) AS BIGINT) AS digit
         FROM events WHERE value >= 0.01),
       cnt AS (SELECT digit, count(*)::BIGINT AS n FROM d1 GROUP BY digit),
       tot AS (SELECT sum(n) AS t FROM cnt)
       SELECT c.digit, c.n,
              CAST(round(c.n::DOUBLE * 1000000.0 / tot.t) AS BIGINT)
                AS observed_fp,
              CAST(round(ln(1.0 + 1.0 / c.digit) / ln(10.0) * 1000000.0)
                   AS BIGINT) AS benford_fp,
              (CAST(round(c.n::DOUBLE * 1000000.0 / tot.t) AS BIGINT)
               - CAST(round(ln(1.0 + 1.0 / c.digit) / ln(10.0) * 1000000.0)
                      AS BIGINT))::BIGINT AS dev_fp
       FROM cnt c CROSS JOIN tot""",
)
def q_benford_audit(spark, sf_dir):
    """Benford's-law first-digit audit — the forensic data-quality
    check for fabricated or truncated numeric columns: first
    significant digit of the centi-scaled value (string head of the
    exact integer — no float log10 needed for extraction), observed
    share vs the log10(1+1/d) expectation, both micro-rounded once,
    and the signed deviation. One digit census with map-side partial
    agg + a 1-row broadcast total; a synthetic uniform column shows
    flat ~111,111 shares, flagging itself."""
    ev = _events(spark, sf_dir)
    c = F.round(F.col("value") * F.lit(100.0), 0).cast("long")
    d1 = ev.where(F.col("value") >= 0.01).select(
        F.substring(c.cast("string"), 1, 1).cast("long").alias("digit")
    )
    cnt = d1.groupBy("digit").agg(F.count(F.lit(1)).cast("long").alias("n"))
    tot = cnt.agg(F.sum("n").alias("t"))
    observed = F.round(
        F.col("n").cast("double") * F.lit(1e6) / F.col("t"), 0
    ).cast("long")
    benford = F.round(
        F.log(1.0 + 1.0 / F.col("digit")) / F.log(F.lit(10.0)) * F.lit(1e6), 0
    ).cast("long")
    return cnt.crossJoin(F.broadcast(tot)).select(
        "digit", "n",
        observed.alias("observed_fp"),
        benford.alias("benford_fp"),
        (observed - benford).cast("long").alias("dev_fp"),
    )



_PATH_CAP = 8



@query(
    "session_paths",
    f"""WITH flagged AS (
         SELECT user_id, ts, event_id, event_type,
                CASE WHEN lag(ts) OVER w IS NULL
                          OR epoch(ts) - epoch(lag(ts) OVER w) > {_SESSION_GAP_S}
                     THEN 1 ELSE 0 END AS is_new
         FROM events
         WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
       sess AS (
         SELECT user_id, ts, event_id, event_type,
                sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                  ROWS UNBOUNDED PRECEDING) AS session_id
         FROM flagged),
       stepped AS (
         SELECT user_id, session_id, event_type,
                row_number() OVER (PARTITION BY user_id, session_id
                  ORDER BY ts, event_id) AS step
         FROM sess),
       paths AS (
         SELECT user_id, session_id,
                string_agg(event_type, '>' ORDER BY step) AS path
         FROM stepped WHERE step <= {_PATH_CAP}
         GROUP BY 1, 2),
       pcnt AS (SELECT path, count(*)::BIGINT AS n FROM paths GROUP BY path)
       SELECT path, n FROM pcnt ORDER BY n DESC, path LIMIT 25""",
)
def q_session_paths(spark, sf_dir):
    """Top session paths — the most common event-type sequences per
    gap-session (the UX/behavior-flow report): sessions from the
    running-flag pattern, per-session paths truncated to the first
    {_PATH_CAP} steps (unbounded concat of a pathological session
    would make one unbounded string — the same cap discipline as
    minhash_lsh's bucket gate), then a path census and deterministic
    top-25. Path assembly is sort-within-group + join, never a
    driver-side collect."""
    ev = _events(spark, sf_dir).select("user_id", "ts", "event_id", "event_type")
    s = TP.sessionize(ev, ["user_id"], "ts", gap_seconds=_SESSION_GAP_S)
    ws = Window.partitionBy("user_id", "session_id").orderBy("ts", "event_id")
    stepped = s.select(
        "user_id", "session_id", "event_type",
        F.row_number().over(ws).alias("step"),
    ).where(F.col("step") <= _PATH_CAP)
    paths = stepped.groupBy("user_id", "session_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct(F.col("step"), F.col("event_type")))
                ),
                lambda x: x.event_type,
            ),
            ">",
        ).alias("path")
    )
    pcnt = paths.groupBy("path").agg(F.count(F.lit(1)).cast("long").alias("n"))
    return pcnt.orderBy(F.desc("n"), "path").limit(25)



@query(
    "hazard_table",
    """WITH firsts AS (
         SELECT user_id,
                min(CASE WHEN event_type = 'view' THEN epoch_us(ts) END) AS v_u,
                min(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END) AS p_u,
                max(epoch_us(ts)) AS last_u
         FROM events GROUP BY user_id),
       spans AS (
         SELECT user_id,
                CASE WHEN p_u IS NOT NULL AND p_u > v_u
                     THEN (p_u - v_u) // 86400000000 END AS conv_day,
                (last_u - v_u) // 86400000000 AS censor_day
         FROM firsts WHERE v_u IS NOT NULL),
       days AS (SELECT unnest(range(30))::BIGINT AS day),
       tbl AS (
         SELECT d.day,
                sum(CASE WHEN coalesce(s.conv_day, s.censor_day) >= d.day
                         THEN 1 ELSE 0 END)::BIGINT AS n_at_risk,
                sum(CASE WHEN s.conv_day = d.day THEN 1 ELSE 0 END)::BIGINT
                  AS n_converted
         FROM days d CROSS JOIN spans s GROUP BY d.day)
       SELECT day, n_at_risk, n_converted,
              CASE WHEN n_at_risk > 0
                   THEN CAST(round(n_converted::DOUBLE * 1000000.0 / n_at_risk)
                             AS BIGINT) END AS hazard_fp
       FROM tbl WHERE n_at_risk > 0""",
)
def q_hazard_table(spark, sf_dir):
    """Discrete-time hazard table for time-to-conversion (first view →
    first purchase) with right-censoring at the entity's last observed
    event — the survival-analysis primitive behind 'how long until a
    crawled page converts/changes': risk sets and conversion counts
    are EXACT integer sums (a Kaplan-Meier cumulative product would
    need an order-dependent float product — the hazard table carries
    the same information exactly), hazard = d/n rounded once per day.
    The entity table collapses to one row each before the 30-row day
    spine fans it out (broadcast), so the fact table is scanned
    once."""
    from pliers_spark.operators._util import epoch_micros

    ev = _events(spark, sf_dir)
    u = epoch_micros(ev, "ts")
    firsts = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", u)).alias("v_u"),
        F.min(F.when(F.col("event_type") == "purchase", u)).alias("p_u"),
        F.max(u).alias("last_u"),
    )
    day_us = 86_400_000_000
    spans = firsts.where(F.col("v_u").isNotNull()).select(
        "user_id",
        F.when(
            F.col("p_u").isNotNull() & (F.col("p_u") > F.col("v_u")),
            F.floor((F.col("p_u") - F.col("v_u")) / day_us),
        ).alias("conv_day"),
        F.floor((F.col("last_u") - F.col("v_u")) / day_us).alias("censor_day"),
    )
    days = spark.range(30).select(F.col("id").alias("day"))
    tbl = (
        F.broadcast(days)
        .crossJoin(spans)
        .groupBy("day")
        .agg(
            F.sum(
                F.when(
                    F.coalesce(F.col("conv_day"), F.col("censor_day"))
                    >= F.col("day"),
                    1,
                ).otherwise(0)
            ).cast("long").alias("n_at_risk"),
            F.sum(
                F.when(F.col("conv_day") == F.col("day"), 1).otherwise(0)
            ).cast("long").alias("n_converted"),
        )
    )
    return tbl.where(F.col("n_at_risk") > 0).select(
        "day", "n_at_risk", "n_converted",
        F.when(
            F.col("n_at_risk") > 0,
            F.round(
                F.col("n_converted").cast("double") * F.lit(1e6)
                / F.col("n_at_risk"),
                0,
            ).cast("long"),
        ).alias("hazard_fp"),
    )



@query(
    "key_skew_report",
    """WITH kc AS (
         SELECT l_orderkey AS key, count(*)::BIGINT AS c
         FROM lineitem GROUP BY l_orderkey),
       tot AS (SELECT sum(c) AS t, count(*) AS nk FROM kc),
       ranked AS (
         SELECT key, c, row_number() OVER (ORDER BY c DESC, key) AS rnk,
                row_number() OVER (ORDER BY c, key) AS rn_asc
         FROM kc),
       gini AS (
         SELECT CAST(round(sum((2 * rn_asc - tot.nk - 1) * c)::DOUBLE
                           / (tot.nk * tot.t) * 1000000.0) AS BIGINT) AS g_fp
         FROM ranked CROSS JOIN tot GROUP BY tot.nk, tot.t)
       SELECT r.rnk AS rnk, r.key, r.c,
              CAST(round(r.c::DOUBLE * 1000000.0 / tot.t) AS BIGINT) AS share_fp,
              gini.g_fp AS key_gini_fp
       FROM ranked r CROSS JOIN tot CROSS JOIN gini
       WHERE r.rnk <= 10""",
)
def q_key_skew_report(spark, sf_dir):
    """Join-key skew diagnostic — the report you read BEFORE choosing
    salting factors or AQE thresholds: per-key census (map-side
    partial agg collapses the fact table to key grain), top-10 heavy
    hitters with their traffic share, plus the Gini concentration of
    the whole key distribution (gini_tokens' exact rank-weighted
    integer sum, reused on keys). Only the key-grain table ever sorts.
    Pairs with operators/asof.detect_heavy_hitters — this is its
    offline, human-readable face."""
    li = load_table(spark, sf_dir, "lineitem")
    kc = li.groupBy(F.col("l_orderkey").alias("key")).agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    tot = kc.agg(F.sum("c").alias("t"), F.count(F.lit(1)).alias("nk"))
    wd = Window.orderBy(F.desc("c"), "key")
    wa = Window.orderBy("c", "key")
    ranked = kc.select(
        "key", "c",
        F.row_number().over(wd).alias("rnk"),
        F.row_number().over(wa).alias("rn_asc"),
    )
    gini = (
        ranked.crossJoin(F.broadcast(tot))
        .groupBy("nk", "t")
        .agg(
            F.round(
                F.sum((2 * F.col("rn_asc") - F.col("nk") - 1) * F.col("c"))
                .cast("double")
                / (F.col("nk") * F.col("t"))
                * F.lit(1e6),
                0,
            ).cast("long").alias("g_fp")
        )
        .select("g_fp")
    )
    return (
        ranked.where(F.col("rnk") <= 10)
        .crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(gini))
        .select(
            "rnk", "key", "c",
            F.round(F.col("c").cast("double") * F.lit(1e6) / F.col("t"), 0)
            .cast("long").alias("share_fp"),
            F.col("g_fp").alias("key_gini_fp"),
        )
    )



def _khop_sql(hops: int = 3, n_hosts: int = 50, links: int = 3) -> str:
    def dst(j: int) -> str:
        h = md5_int_sql(f"concat(doc_id::VARCHAR, ':{j}')")
        return f"({h} % {n_hosts})::BIGINT"

    link_union = " UNION ALL ".join(
        f"SELECT (doc_id % {n_hosts})::BIGINT AS src, {dst(j)} AS dst FROM documents"
        for j in range(links)
    )
    ctes = [
        f"edges AS (SELECT DISTINCT src, dst FROM ({link_union}) WHERE src != dst)",
        "s0 AS (SELECT unnest([0, 1])::BIGINT AS node)",
    ]
    for k in range(1, hops + 1):
        ctes.append(
            f"s{k} AS (SELECT DISTINCT node FROM (SELECT node FROM s{k-1} "
            f"UNION ALL SELECT e.dst FROM edges e JOIN s{k-1} p ON e.src = p.node))"
        )
    dist = "CASE " + " ".join(
        f"WHEN node IN (SELECT node FROM s{k}) THEN {k}"
        for k in range(hops + 1)
    ) + " END"
    return (
        "WITH " + ",\n".join(ctes)
        + f"\nSELECT node, ({dist})::BIGINT AS dist FROM s{hops}"
    )



@query("khop_reach", _khop_sql())
def q_khop_reach(spark, sf_dir):
    """k-hop BFS reachability over the host link graph (seed hosts
    {0,1}, 3 hops) — the frontier-expansion primitive behind crawl
    scheduling and influence radius: each round joins the CURRENT
    frontier (small) against the edge table and anti-joins out the
    already-reached set, so per-round shuffle cost is frontier-sized,
    never graph-sized; distances are the round at which a node first
    appears (exact min-hop by construction). The oracle unrolls the
    same rounds as chained CTEs — same DAG, declarative form."""
    from ..operators.graph import host_link_edges

    edges = host_link_edges(_docs(spark, sf_dir))
    reached = spark.createDataFrame(
        [(0, 0), (1, 0)], "node long, dist long"
    )
    frontier = reached.select("node")
    for k in range(1, 4):
        nxt = (
            edges.join(
                frontier.select(F.col("node").alias("src")), "src"
            )
            .select(F.col("dst").alias("node"))
            .distinct()
            .join(reached.select("node"), "node", "left_anti")
            .select("node", F.lit(k).cast("long").alias("dist"))
        )
        nxt = nxt.stableCheckpoint()
        reached = reached.unionAll(nxt)
        frontier = nxt.select("node")
    return reached.select("node", "dist")



@query(
    "mad_scale",
    """WITH f AS (
         SELECT doc_id, lang, length(trim(text))::BIGINT AS ql FROM documents),
       ranked AS (
         SELECT lang, ql,
                row_number() OVER (PARTITION BY lang ORDER BY ql, doc_id) AS rn,
                count(*) OVER (PARTITION BY lang) AS n
         FROM f),
       med AS (
         SELECT lang, max(n)::BIGINT AS n,
                max(CASE WHEN rn = (50 * n + 99) // 100 THEN ql END)::BIGINT
                  AS median_ql
         FROM ranked GROUP BY lang),
       dev AS (
         SELECT f.lang, abs(f.ql - m.median_ql) AS d, f.doc_id
         FROM f JOIN med m USING (lang)),
       dranked AS (
         SELECT lang, d,
                row_number() OVER (PARTITION BY lang ORDER BY d, doc_id) AS rn,
                count(*) OVER (PARTITION BY lang) AS n
         FROM dev)
       SELECT m.lang, m.n, m.median_ql,
              max(CASE WHEN dr.rn = (50 * dr.n + 99) // 100 THEN dr.d END)
                ::BIGINT AS mad
       FROM dranked dr JOIN med m USING (lang)
       GROUP BY m.lang, m.n, m.median_ql""",
)
def q_mad_scale(spark, sf_dir):
    """Median absolute deviation per group — the robust scale estimate
    that (unlike stddev) one outlier can't poison: median by exact
    rank selection (the winsorize/group_quantiles discipline), absolute
    deviations against the broadcast group medians, then a second rank
    selection for the MAD — all integer order statistics, nothing to
    interpolate. Both rank passes are keyed windows; the med dim is
    group-grain and broadcasts. Completes the robust trio: winsorize
    (clip), ecdf_normalize (rank transform), mad_scale (scale)."""
    d = _docs(spark, sf_dir)
    f = d.select("doc_id", "lang", T.text_length("text").cast("long").alias("ql"))
    wr = Window.partitionBy("lang").orderBy("ql", "doc_id")
    wall = Window.partitionBy("lang")
    ranked = f.select(
        "lang", "ql",
        F.row_number().over(wr).alias("rn"),
        F.count(F.lit(1)).over(wall).alias("n"),
    )
    med_rank = F.floor((50 * F.col("n") + 99) / 100)
    med = ranked.groupBy("lang").agg(
        F.max("n").cast("long").alias("n"),
        F.max(F.when(F.col("rn") == med_rank, F.col("ql")))
        .cast("long").alias("median_ql"),
    )
    dev = f.join(F.broadcast(med), "lang").select(
        "lang", "doc_id", F.abs(F.col("ql") - F.col("median_ql")).alias("d")
    )
    wd = Window.partitionBy("lang").orderBy("d", "doc_id")
    dranked = dev.select(
        "lang", "d",
        F.row_number().over(wd).alias("rn"),
        F.count(F.lit(1)).over(wall).alias("n"),
    )
    mad_rank = F.floor((50 * F.col("n") + 99) / 100)
    mad = dranked.groupBy("lang").agg(
        F.max(F.when(F.col("rn") == mad_rank, F.col("d")))
        .cast("long").alias("mad")
    )
    return med.join(mad, "lang").select("lang", "n", "median_ql", "mad")



@query(
    "time_weighted_avg",
    """WITH base AS (
         SELECT user_id, epoch_us(ts) AS u, event_id,
                CAST(round(value * 100.0) AS BIGINT) AS c
         FROM events),
       held AS (
         SELECT user_id, c,
                (lead(u) OVER (PARTITION BY user_id ORDER BY u, event_id) - u)
                  // 1000000 AS dur_s
         FROM base)
       SELECT user_id, count(*)::BIGINT AS n_intervals,
              sum(dur_s)::BIGINT AS total_s,
              CAST(round(sum(c * dur_s)::DOUBLE * 10000.0 / sum(dur_s))
                   AS BIGINT) AS twap_fp
       FROM held WHERE dur_s IS NOT NULL AND dur_s > 0
       GROUP BY user_id""",
)
def q_time_weighted_avg(spark, sf_dir):
    """Time-weighted average (TWAP) per entity — the state's integral
    over time, not the per-event mean (an entity that held value 100
    for a month and 0 for a second should read ≈100): each observation
    is held until the next one (lead), weights are whole-second
    durations and values centi-scaled so Σ value·duration stays in
    int64 at any realistic per-entity history, one division rounded
    once. Zero-duration intervals (same-second bursts) drop —
    documented whole-second granularity. One sorted window pass +
    groupBy on the shared entity shuffle."""
    from pliers_spark.operators._util import epoch_micros

    ev = _events(spark, sf_dir)
    base = ev.select(
        "user_id",
        epoch_micros(ev, "ts").alias("u"),
        "event_id",
        F.round(F.col("value") * F.lit(100.0), 0).cast("long").alias("c"),
    )
    w = Window.partitionBy("user_id").orderBy("u", "event_id")
    held = base.select(
        "user_id", "c",
        F.floor((F.lead("u").over(w) - F.col("u")) / F.lit(1_000_000))
        .alias("dur_s"),
    ).where(F.col("dur_s").isNotNull() & (F.col("dur_s") > 0))
    return held.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_intervals"),
        F.sum("dur_s").cast("long").alias("total_s"),
        F.round(
            F.sum(F.col("c") * F.col("dur_s")).cast("double")
            * F.lit(1e4)
            / F.sum("dur_s"),
            0,
        ).cast("long").alias("twap_fp"),
    )



@query(
    "dense_counts",
    """WITH days AS (
         SELECT DISTINCT epoch_us(ts) // 86400000000 AS day FROM events),
       types AS (SELECT DISTINCT event_type FROM events),
       grid AS (SELECT d.day, t.event_type FROM days d CROSS JOIN types t),
       cnt AS (
         SELECT epoch_us(ts) // 86400000000 AS day, event_type,
                count(*)::BIGINT AS n
         FROM events GROUP BY 1, 2)
       SELECT g.day::BIGINT AS day, g.event_type,
              coalesce(c.n, 0)::BIGINT AS n
       FROM grid g LEFT JOIN cnt c
         ON c.day = g.day AND c.event_type = g.event_type""",
)
def q_dense_counts(spark, sf_dir):
    """Sparse→dense densification: the complete (day × type) grid with
    explicit zeros — what every charting/forecasting consumer needs
    (a missing combination is a ZERO, not an absent row; models
    trained on sparse counts silently skip the zeros that matter
    most). The spine is the cross product of two DISTINCT dims (tiny),
    the left join back fills gaps, and the fact table aggregates once
    map-side. Integer epoch days."""
    from pliers_spark.operators._util import epoch_micros

    ev = _events(spark, sf_dir)
    day = F.floor(epoch_micros(ev, "ts") / F.lit(86_400_000_000)).alias("day")
    days = ev.select(day).distinct()
    types = ev.select("event_type").distinct()
    grid = days.crossJoin(F.broadcast(types))
    cnt = ev.groupBy(day, "event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    return grid.join(cnt, ["day", "event_type"], "left").select(
        F.col("day").cast("long").alias("day"),
        "event_type",
        F.coalesce(F.col("n"), F.lit(0)).cast("long").alias("n"),
    )



@query(
    "naive_bayes_lang",
    f"""WITH docs2 AS (
         SELECT doc_id, lang, list_distinct({_tok_sql()}) AS toks
         FROM documents),
       train AS (SELECT * FROM docs2 WHERE doc_id % 5 <> 0),
       test  AS (SELECT * FROM docs2 WHERE doc_id % 5 = 0),
       classes AS (
         SELECT lang AS c, count(*)::BIGINT AS n_docs FROM train GROUP BY lang),
       ntr AS (SELECT sum(n_docs) AS n FROM classes),
       tokc AS (
         SELECT t.token, tr.lang AS c, count(*)::BIGINT AS df
         FROM (SELECT doc_id, unnest(toks) AS token FROM train) t
         JOIN train tr USING (doc_id) GROUP BY 1, 2),
       vocab AS (SELECT count(DISTINCT token) AS v FROM tokc),
       llik AS (
         SELECT tok.token, cl.c,
                CAST(round(ln((coalesce(tc.df, 0) + 1.0)
                              / (cl.n_docs + 2.0)) * 1000000.0) AS BIGINT)
                  AS lp_fp
         FROM (SELECT DISTINCT token FROM tokc) tok
         CROSS JOIN classes cl
         LEFT JOIN tokc tc ON tc.token = tok.token AND tc.c = cl.c),
       scored AS (
         SELECT te.doc_id, te.lang, cl.c,
                CAST(round(ln(cl.n_docs::DOUBLE / ntr.n) * 1000000.0) AS BIGINT)
                + coalesce(sum(l.lp_fp), 0) AS score_fp
         FROM test te
         CROSS JOIN classes cl CROSS JOIN ntr
         LEFT JOIN (SELECT DISTINCT doc_id, unnest(toks) AS token FROM test) tt
           ON tt.doc_id = te.doc_id
         LEFT JOIN llik l ON l.token = tt.token AND l.c = cl.c
         GROUP BY te.doc_id, te.lang, cl.c, cl.n_docs, ntr.n),
       pred AS (
         SELECT doc_id, lang, c AS pred_lang, score_fp::BIGINT AS best_score_fp
         FROM (SELECT *, row_number() OVER (PARTITION BY doc_id
                 ORDER BY score_fp DESC, c DESC) AS rnk FROM scored)
         WHERE rnk = 1)
       SELECT doc_id, lang, pred_lang, best_score_fp,
              (lang = pred_lang) AS correct
       FROM pred""",
)
def q_naive_bayes_lang(spark, sf_dir):
    """Bernoulli Naive Bayes trained AND scored in one DAG with fully
    EXACT arithmetic: per-(token, class) Laplace log-likelihoods are
    rounded ONCE corpus-side to integer micro-nats, so every document
    score is an exact int64 SUM of small integers (float log-prob
    accumulation would be order-dependent — the whole reason NB is
    usually hard to bit-reproduce distributed). 80/20 hash split,
    class priors from a broadcast dim, prediction = argmax with a
    deterministic class tiebreak, per-doc correctness against truth.
    The trainable-classifier pattern (edu_classifier's learned cousin):
    token census → broadcast model → per-doc exact additive scoring."""
    d = _docs(spark, sf_dir)
    docs2 = d.select(
        "doc_id", "lang", F.array_distinct(T.tokenize(F.col("text"))).alias("toks")
    )
    train = docs2.where(F.col("doc_id") % 5 != 0)
    test = docs2.where(F.col("doc_id") % 5 == 0)
    classes = train.groupBy(F.col("lang").alias("c")).agg(
        F.count(F.lit(1)).cast("long").alias("n_docs")
    )
    ntr = classes.agg(F.sum("n_docs").alias("n"))
    tokc = (
        train.select("doc_id", F.col("lang").alias("c"), F.explode("toks").alias("token"))
        .groupBy("token", "c")
        .agg(F.count(F.lit(1)).cast("long").alias("df"))
    )
    vocab_toks = tokc.select("token").distinct()
    llik = (
        vocab_toks.crossJoin(F.broadcast(classes))
        .join(tokc, ["token", "c"], "left")
        .select(
            "token", "c",
            F.round(
                F.log(
                    (F.coalesce(F.col("df"), F.lit(0)) + F.lit(1.0))
                    / (F.col("n_docs") + F.lit(2.0))
                )
                * F.lit(1e6),
                0,
            ).cast("long").alias("lp_fp"),
        )
    )
    tt = test.select("doc_id", F.explode("toks").alias("token")).distinct()
    prior = F.round(
        F.log(F.col("n_docs").cast("double") / F.col("n")) * F.lit(1e6), 0
    ).cast("long")
    scored = (
        test.select("doc_id", "lang")
        .crossJoin(F.broadcast(classes))
        .crossJoin(F.broadcast(ntr))
        .join(tt, "doc_id", "left")
        .join(llik, ["token", "c"], "left")
        .groupBy("doc_id", "lang", "c", "n_docs", "n")
        .agg(F.coalesce(F.sum("lp_fp"), F.lit(0)).alias("tok_fp"))
        .select(
            "doc_id", "lang", "c",
            (prior + F.col("tok_fp")).cast("long").alias("score_fp"),
        )
    )
    best = F.max(F.struct(F.col("score_fp"), F.col("c")))
    pred = scored.groupBy("doc_id", "lang").agg(
        best.getField("c").alias("pred_lang"),
        F.max("score_fp").cast("long").alias("best_score_fp"),
    )
    return pred.select(
        "doc_id", "lang", "pred_lang", "best_score_fp",
        (F.col("lang") == F.col("pred_lang")).alias("correct"),
    )



_SKIP_WIN = 2



@query(
    "skipgram_counts",
    f"""WITH toks AS (
         SELECT doc_id, {_tok_sql()} AS t FROM documents),
       pos AS (
         SELECT doc_id, t, unnest(range(len(t)))::BIGINT AS p FROM toks),
       pairs AS (
         SELECT lower(t[p + 1]) AS w, lower(t[p + 1 + o]) AS c
         FROM pos
         CROSS JOIN (SELECT unnest(range(1, {_SKIP_WIN + 1}))::BIGINT AS o)
         WHERE p + 1 + o <= len(t)),
       cnt AS (SELECT w, c, count(*)::BIGINT AS n FROM pairs GROUP BY 1, 2)
       SELECT w, c, n FROM cnt ORDER BY n DESC, w, c LIMIT 100""",
)
def q_skipgram_counts(spark, sf_dir):
    """Skip-gram co-occurrence census (window +{_SKIP_WIN}, the
    word2vec/GloVe preprocessing): context pairs come from ARRAY
    offsets — element_at against the token array per (position,
    offset), no self-join of an exploded table on doc & position
    (which would shuffle the corpus against itself); one groupBy with
    map-side partial counts, deterministic top-100. Directional pairs
    (left→right) so each unordered co-occurrence is counted exactly
    once per offset."""
    d = _docs(spark, sf_dir)
    toks = d.select(T.tokenize(F.col("text")).alias("t"))
    pos = toks.select(
        "t", F.posexplode(F.col("t")).alias("p", "_w")
    )
    offs = spark.range(1, _SKIP_WIN + 1).select(F.col("id").alias("o"))
    pairs = (
        pos.crossJoin(F.broadcast(offs))
        .where(F.col("p") + 1 + F.col("o") <= F.size("t"))
        .select(
            F.lower(F.element_at("t", (F.col("p") + 1).cast("int"))).alias("w"),
            F.lower(
                F.element_at("t", (F.col("p") + 1 + F.col("o")).cast("int"))
            ).alias("c"),
        )
    )
    cnt = pairs.groupBy("w", "c").agg(F.count(F.lit(1)).cast("long").alias("n"))
    return cnt.orderBy(F.desc("n"), "w", "c").limit(100)



@query(
    "quantile_normalize",
    """WITH f AS (
         SELECT doc_id, lang, length(trim(text))::BIGINT AS ql FROM documents),
       grp AS (
         SELECT doc_id, lang, ql,
                row_number() OVER (PARTITION BY lang ORDER BY ql, doc_id) AS rn,
                count(*) OVER (PARTITION BY lang) AS n
         FROM f),
       pooled AS (
         SELECT ql AS pooled_ql,
                row_number() OVER (ORDER BY ql, doc_id) AS pr
         FROM f),
       ptot AS (SELECT count(*) AS pn FROM f),
       target AS (
         SELECT g.doc_id, g.lang, g.ql,
                greatest(1, (g.rn * ptot.pn + g.n - 1) // g.n) AS want
         FROM grp g CROSS JOIN ptot)
       SELECT t.doc_id, t.lang, t.ql, p.pooled_ql AS ql_qnorm
       FROM target t JOIN pooled p ON p.pr = t.want""",
)
def q_quantile_normalize(spark, sf_dir):
    """Quantile normalization — remap every group's values onto the
    POOLED distribution's order statistics (rank i of n in a group →
    the pooled value at ceil(i·N/n)), the microarray-era technique
    that makes per-source feature distributions directly comparable
    before mixing corpora: all integer rank arithmetic (the winsorize
    discipline), two rank passes plus an equi-join on the target rank
    — no interpolation, no float quantiles. CENSUS GRAIN (r4): the
    only cross-value cumulatives run on (lang,ql) / ql census frames
    (operators/census.py), broadcast back; per-row ranks are recovered
    as census cum_lt + a PARTITIONED row_number within the (ql) or
    (lang,ql) cell — no unpartitioned window ever sees raw rows."""
    from pliers_spark.operators.census import with_census_ranks

    d = _docs(spark, sf_dir)
    f = d.select("doc_id", "lang", T.text_length("text").cast("long").alias("ql"))

    # per-(lang, ql) census; lang-partitioned cumulative below each value
    lc = f.groupBy("lang", "ql").agg(F.count(F.lit(1)).alias("cnt"))
    wlang = (
        Window.partitionBy("lang")
        .orderBy("ql")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    lc = lc.withColumn("cum_lt", F.coalesce(F.sum("cnt").over(wlang), F.lit(0)))
    wn = Window.partitionBy("lang")
    lc = lc.withColumn("n", F.sum("cnt").over(wn))

    # pooled ql census: global cumulative over the (bounded) value census
    pc = with_census_ranks(
        f.groupBy("ql").agg(F.count(F.lit(1)).alias("pcnt")),
        "ql",
        cnt_col="pcnt",
        lt="pcum_lt",
    )
    ptot = f.agg(F.count(F.lit(1)).alias("pn"))

    # per-row ranks: census cum_lt + partitioned row_number inside the cell
    w_cell = Window.partitionBy("lang", "ql").orderBy("doc_id")
    grp = (
        f.join(F.broadcast(lc.select("lang", "ql", "cum_lt", "n")), ["lang", "ql"])
        .withColumn("rn", F.col("cum_lt") + F.row_number().over(w_cell))
    )
    w_pcell = Window.partitionBy("ql").orderBy("doc_id")
    pooled = (
        f.join(F.broadcast(pc.select("ql", "pcum_lt")), "ql")
        .select(
            F.col("ql").alias("pooled_ql"),
            (F.col("pcum_lt") + F.row_number().over(w_pcell)).alias("pr"),
        )
    )
    target = grp.crossJoin(F.broadcast(ptot)).select(
        "doc_id", "lang", "ql",
        F.greatest(
            F.lit(1),
            F.floor((F.col("rn") * F.col("pn") + F.col("n") - 1) / F.col("n")),
        ).alias("want"),
    )
    return target.join(pooled, target.want == pooled.pr).select(
        "doc_id", "lang", "ql", F.col("pooled_ql").alias("ql_qnorm")
    )



@query(
    "seasonality_strength",
    """WITH base AS (
         SELECT hour(ts) AS hod, CAST(round(value * 100.0) AS BIGINT) AS c
         FROM events),
       h AS (
         SELECT hod, count(*)::BIGINT AS n, sum(c) AS s, sum(c * c) AS ss
         FROM base GROUP BY hod),
       terms AS (
         SELECT CAST(round(s * s / n::DOUBLE) AS BIGINT) AS t_fp, n, s, ss
         FROM h),
       tot AS (
         SELECT sum(n) AS tn, sum(s) AS ts, sum(ss) AS tss,
                sum(t_fp) AS bsum_fp
         FROM terms)
       SELECT tn::BIGINT AS n,
              CAST(round(
                (bsum_fp - CAST(round(ts * ts / tn::DOUBLE) AS BIGINT))::DOUBLE
                / (tss - CAST(round(ts * ts / tn::DOUBLE) AS BIGINT))
                * 1000000.0) AS BIGINT) AS strength_fp
       FROM tot""",
)
def q_seasonality_strength(spark, sf_dir):
    """Seasonality strength = between-hour variance share of total
    variance (the one-way ANOVA R²): how much of the signal the
    hour-of-day profile explains — ≈0 means seasonal_profile's
    residuals carry everything, ≈1 means the clock IS the signal.
    Sufficient statistics per hour (count, Σc, Σc²) are exact int64;
    each s²/n term is rounded ONCE to an integer before summing (a
    float sum of the 24 terms would be accumulation-order-dependent
    across engines — the PSI/MI recipe applies to variance terms too),
    then the R² ratio is one rounded expression."""
    ev = _events(spark, sf_dir)
    base = ev.select(
        F.hour("ts").alias("hod"),
        F.round(F.col("value") * F.lit(100.0), 0).cast("long").alias("c"),
    )
    h = base.groupBy("hod").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("c").alias("s"),
        F.sum(F.col("c") * F.col("c")).alias("ss"),
    )
    terms = h.select(
        "n", "s", "ss",
        F.round(F.col("s") * F.col("s") / F.col("n").cast("double"), 0)
        .cast("long").alias("t_fp"),
    )
    tot = terms.agg(
        F.sum("n").alias("tn"),
        F.sum("s").alias("ts"),
        F.sum("ss").alias("tss"),
        F.sum("t_fp").alias("bsum_fp"),
    )
    grand = F.round(
        F.col("ts") * F.col("ts") / F.col("tn").cast("double"), 0
    ).cast("long")
    return tot.select(
        F.col("tn").cast("long").alias("n"),
        F.round(
            (F.col("bsum_fp") - grand).cast("double")
            / (F.col("tss") - grand)
            * F.lit(1e6),
            0,
        ).cast("long").alias("strength_fp"),
    )



@query(
    "revenue_hierarchy",
    """WITH rev AS (
         SELECT c.c_nationkey,
                sum(CAST(round(o.o_totalprice * 100.0) AS BIGINT)) AS cents
         FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
         GROUP BY c.c_nationkey),
       nat AS (
         SELECT n.n_name AS nation, r.r_name AS region, rev.cents
         FROM rev
         JOIN nation n ON n.n_nationkey = rev.c_nationkey
         JOIN region r ON r.r_regionkey = n.n_regionkey)
       SELECT region, nation, cents::BIGINT AS revenue_cents,
              CAST(round(cents::DOUBLE * 1000000.0
                         / sum(cents) OVER (PARTITION BY region)) AS BIGINT)
                AS share_of_region_fp,
              CAST(round(sum(cents) OVER (PARTITION BY region) * 1000000.0
                         / sum(cents) OVER ()) AS BIGINT)
                AS region_share_fp
       FROM nat""",
)
def q_revenue_hierarchy(spark, sf_dir):
    """Percent-of-parent hierarchy rollup (region → nation revenue
    shares, the drill-down report every BI layer renders): the fact
    join aggregates to nation grain FIRST (map-side partial sums of
    integer cents), then both share levels are window sums over the
    ≤25-row nation table — the dimension joins broadcast, the fact
    table shuffles once on the join key, and no percent is computed
    against un-aggregated data. Exact integer cents; shares rounded
    once."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    cents = F.round(F.col("o_totalprice") * F.lit(100.0), 0).cast("long")
    rev = (
        orders.join(
            F.broadcast(customer.select("c_custkey", "c_nationkey")),
            orders.o_custkey == customer.c_custkey,
        )
        .groupBy("c_nationkey")
        .agg(F.sum(cents).alias("cents"))
    )
    nat = (
        rev.join(
            F.broadcast(nation.select("n_nationkey", "n_name", "n_regionkey")),
            rev.c_nationkey == nation.n_nationkey,
        )
        .join(
            F.broadcast(region.select("r_regionkey", "r_name")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select(
            F.col("r_name").alias("region"),
            F.col("n_name").alias("nation"),
            "cents",
        )
    )
    # CENSUS GRAIN (r4): region totals + the grand total come from a
    # region-level aggregate (its one global window sits above that
    # aggregate, never above the dimension-joined fact rows) and
    # broadcast back — same integer arithmetic, no unpartitioned window
    # over a frame whose size the planner can't bound.
    reg = nat.groupBy("region").agg(F.sum("cents").alias("region_cents"))
    reg = reg.withColumn(
        "total_cents", F.sum("region_cents").over(Window.partitionBy())
    )
    return nat.join(F.broadcast(reg), "region").select(
        "region", "nation",
        F.col("cents").cast("long").alias("revenue_cents"),
        F.round(
            F.col("cents").cast("double") * F.lit(1e6) / F.col("region_cents"), 0
        ).cast("long").alias("share_of_region_fp"),
        F.round(
            F.col("region_cents") * F.lit(1e6) / F.col("total_cents"), 0
        ).cast("long").alias("region_share_fp"),
    )



@query(
    "median_impute",
    """WITH base AS (
         SELECT event_id, event_type,
                CASE WHEN event_id % 7 = 0 THEN NULL
                     ELSE CAST(round(value * 1000000.0) AS BIGINT) END AS v_fp
         FROM events),
       present AS (
         SELECT event_type, v_fp,
                row_number() OVER (PARTITION BY event_type
                                   ORDER BY v_fp, event_id) AS rn,
                count(*) OVER (PARTITION BY event_type) AS n
         FROM base WHERE v_fp IS NOT NULL),
       med AS (
         SELECT event_type,
                max(CASE WHEN rn = (50 * n + 99) // 100 THEN v_fp END)::BIGINT
                  AS med_fp
         FROM present GROUP BY event_type)
       SELECT b.event_id, b.event_type,
              coalesce(b.v_fp, m.med_fp)::BIGINT AS v_imputed_fp,
              (b.v_fp IS NULL) AS was_imputed
       FROM base b JOIN med m USING (event_type)""",
)
def q_median_impute(spark, sf_dir):
    """Group-median imputation with an explicit provenance flag — the
    standard missing-value fill that (unlike mean-fill) a skewed tail
    can't distort, and (unlike silent fills) downstream models can
    condition on `was_imputed`: medians by exact rank selection over
    the PRESENT values only (the winsorize discipline), broadcast back
    as a group-grain dim so imputation is a pure per-row map.
    Missingness is synthesized deterministically (event_id % 7) so
    the oracle replays the identical holes."""
    ev = _events(spark, sf_dir)
    v_fp = F.round(F.col("value") * F.lit(1e6), 0).cast("long")
    base = ev.select(
        "event_id", "event_type",
        F.when(F.col("event_id") % 7 == 0, F.lit(None).cast("long"))
        .otherwise(v_fp).alias("v_fp"),
    )
    present = base.where(F.col("v_fp").isNotNull())
    wr = Window.partitionBy("event_type").orderBy("v_fp", "event_id")
    wall = Window.partitionBy("event_type")
    ranked = present.select(
        "event_type", "v_fp",
        F.row_number().over(wr).alias("rn"),
        F.count(F.lit(1)).over(wall).alias("n"),
    )
    med_rank = F.floor((50 * F.col("n") + 99) / 100)
    med = ranked.groupBy("event_type").agg(
        F.max(F.when(F.col("rn") == med_rank, F.col("v_fp")))
        .cast("long").alias("med_fp")
    )
    return base.join(F.broadcast(med), "event_type").select(
        "event_id", "event_type",
        F.coalesce(F.col("v_fp"), F.col("med_fp")).cast("long")
        .alias("v_imputed_fp"),
        F.col("v_fp").isNull().alias("was_imputed"),
    )



@query("rollup_multires", _rollup_sql())
def q_rollup_multires(spark, sf_dir):
    """Hour→day→week event rollup where every coarser level re-aggregates
    the level below it (raw scanned ONCE, DAG cut at the hour partials);
    the oracle computes all three levels directly from raw, so green
    equality proves the int64 partial-merge is exact
    (operators/rollup.multires_rollup)."""
    from pliers_spark.operators.rollup import multires_rollup

    return multires_rollup(_events(spark, sf_dir))



def _hash_split_sql() -> str:
    from pliers_spark.operators.sampling import hash_split_sql

    return hash_split_sql("documents", "doc_id", "doc_id, lang")



@query("hash_split", _hash_split_sql())
def q_hash_split(spark, sf_dir):
    """Deterministic train/valid/test split (98/1/1) by id hash — the
    reproducible-corpus-construction split convention (C4/The Pile): a
    pure projection (zero shuffle, no RNG), every row's split
    recomputable from its id alone (operators/sampling.hash_split)."""
    from pliers_spark.operators.sampling import hash_split

    return hash_split(_docs(spark, sf_dir).select("doc_id", "lang"), "doc_id")



def _rate_sample_sql() -> str:
    from pliers_spark.operators.sampling import rate_sample_sql

    return f"""WITH s AS ({rate_sample_sql('documents', 'doc_id', 250000, seed=3)})
       SELECT doc_id, lang, source FROM s"""



@query("rate_sample", _rate_sample_sql())
def q_rate_sample(spark, sf_dir):
    """Seeded Bernoulli-by-hash down-sampling gate (keep 25%): a plain
    deterministic filter that pushes below wide operators and is stable
    under task retries — the smoke-slice / ablation-corpus sampler
    (operators/sampling.rate_sample)."""
    from pliers_spark.operators.sampling import rate_sample

    return rate_sample(
        _docs(spark, sf_dir).select("doc_id", "lang", "source"), "doc_id", 250000, seed=3
    )



def _stratified_sql() -> str:
    from pliers_spark.operators.sampling import stratified_sample_sql

    return stratified_sample_sql("documents", ["lang", "source"], "doc_id", 5)



@query("stratified_sample", _stratified_sql())
def q_stratified_sample(spark, sf_dir):
    """Exact-k-per-stratum sample (5 per lang×source), winners = the k
    smallest (hash(id), id) per stratum — deterministic and
    layout-independent, unlike 'first k seen'. One shuffle on the
    strata key (operators/sampling.stratified_sample)."""
    from pliers_spark.operators.sampling import stratified_sample

    return stratified_sample(_docs(spark, sf_dir), ["lang", "source"], "doc_id", 5)



@query("mixture_sample", _mixture_sql())
def q_mixture_sample(spark, sf_dir):
    """Data-mixture balancing across the `source` column (equalize to
    the smallest group): group census → broadcast rates → narrow
    integer-hash filter; kept rows carry group/min weights. The corpus
    scan itself never shuffles (operators/curation.mixture_sample)."""
    from pliers_spark.operators.curation import mixture_sample

    return mixture_sample(_docs(spark, sf_dir))
