"""Registry module (split from the former queries.py monolith; same
@query/ORACLES contract as every sibling).

Queries: two_proportion_ci, dup_token_inflation, iv_2sls, panel_fe,
    page_trend, hyperloglog_users, matrix_profile_daily, err_at_k,
    croston_sba, anderson_darling, theta_forecast, allan_variance,
    sample_entropy, witten_bell_ppl, ccf_peak_lag, transfer_entropy,
    dfa_alpha, yule_k, mahalanobis_outliers, ipf_raking, yake_keywords,
    char_trigram_entropy, sentence_moments, katz_centrality, psi_drift,
    ts_cv_folds, rocchio_classify, silhouette_centroid
"""
from __future__ import annotations

from ._registry import F, T, Window, _docs, _events, load_table, query
from .stats_09 import _dsg_graph_sql



@query(
    "two_proportion_ci",
    """WITH u AS (
         SELECT (user_id % 2)::INT AS variant,
                max((event_type = 'purchase')::INT) AS conv
         FROM events GROUP BY user_id),
       c AS (
         SELECT sum(CASE WHEN variant = 0 THEN conv ELSE 0 END)::BIGINT AS x1,
                sum(CASE WHEN variant = 0 THEN 1 ELSE 0 END)::BIGINT AS n1,
                sum(CASE WHEN variant = 1 THEN conv ELSE 0 END)::BIGINT AS x2,
                sum(CASE WHEN variant = 1 THEN 1 ELSE 0 END)::BIGINT AS n2
         FROM u),
       wil AS (
         SELECT n1, n2, x1, x2,
                x1::DOUBLE / n1 AS p1, x2::DOUBLE / n2 AS p2,
                (x1 + 1.9208) / (n1 + 3.8416)
                  - 1.96 * sqrt(x1::DOUBLE * (n1 - x1) / n1 + 0.9604) / (n1 + 3.8416) AS l1,
                (x1 + 1.9208) / (n1 + 3.8416)
                  + 1.96 * sqrt(x1::DOUBLE * (n1 - x1) / n1 + 0.9604) / (n1 + 3.8416) AS u1,
                (x2 + 1.9208) / (n2 + 3.8416)
                  - 1.96 * sqrt(x2::DOUBLE * (n2 - x2) / n2 + 0.9604) / (n2 + 3.8416) AS l2,
                (x2 + 1.9208) / (n2 + 3.8416)
                  + 1.96 * sqrt(x2::DOUBLE * (n2 - x2) / n2 + 0.9604) / (n2 + 3.8416) AS u2
         FROM c)
       SELECT n1, n2, round(p1, 6) AS p1, round(p2, 6) AS p2,
              round(p1 - p2, 6) AS diff,
              round(p1 - p2 - sqrt((p1 - l1) * (p1 - l1) + (u2 - p2) * (u2 - p2)), 6)
                AS ci_lo,
              round(p1 - p2 + sqrt((u1 - p1) * (u1 - p1) + (p2 - l2) * (p2 - l2)), 6)
                AS ci_hi
       FROM wil""",
)
def q_two_proportion_ci(spark, sf_dir):
    """Two-proportion difference with the Newcombe hybrid-Wilson 95%
    interval (Newcombe, Stat. Med. 1998 method 10 — the
    score-interval composition that never collapses at p̂∈{0,1},
    unlike the Wald CI): per-variant Wilson limits (z=1.96 literals,
    z²=3.8416) combine by the root-sum-square rule into the CI for
    p₁−p₂ — the frequentist interval twin of `bayes_ab_beta`'s
    posterior probability on the same user-parity split. Exact
    integer conversion counts; the interval is one mirrored
    expression."""
    ev = _events(spark, sf_dir)
    u = ev.groupBy("user_id").agg(
        F.max((F.col("event_type") == "purchase").cast("int")).alias("conv")
    ).select((F.col("user_id") % 2).cast("int").alias("variant"), "conv")
    c = u.agg(
        F.sum(F.when(F.col("variant") == 0, F.col("conv")).otherwise(0)).cast("long").alias("x1"),
        F.sum(F.when(F.col("variant") == 0, 1).otherwise(0)).cast("long").alias("n1"),
        F.sum(F.when(F.col("variant") == 1, F.col("conv")).otherwise(0)).cast("long").alias("x2"),
        F.sum(F.when(F.col("variant") == 1, 1).otherwise(0)).cast("long").alias("n2"),
    )
    d_ = lambda x: F.col(x).cast("double")  # noqa: E731

    def wilson(x, nn):
        center = (F.col(x) + F.lit(1.9208)) / (F.col(nn) + F.lit(3.8416))
        half = (
            F.lit(1.96)
            * F.sqrt(d_(x) * (F.col(nn) - F.col(x)) / F.col(nn) + F.lit(0.9604))
            / (F.col(nn) + F.lit(3.8416))
        )
        return center - half, center + half

    p1 = d_("x1") / F.col("n1")
    p2 = d_("x2") / F.col("n2")
    l1, u1 = wilson("x1", "n1")
    l2, u2 = wilson("x2", "n2")
    return c.select(
        "n1", "n2",
        F.round(p1, 6).alias("p1"), F.round(p2, 6).alias("p2"),
        F.round(p1 - p2, 6).alias("diff"),
        F.round(p1 - p2 - F.sqrt((p1 - l1) * (p1 - l1) + (u2 - p2) * (u2 - p2)), 6).alias("ci_lo"),
        F.round(p1 - p2 + F.sqrt((u1 - p1) * (u1 - p1) + (p2 - l2) * (p2 - l2)), 6).alias("ci_hi"),
    )



def _dup_inflation_sql() -> str:
    return """WITH toks AS (
         SELECT doc_id, len(string_split(trim(text), ' '))::BIGINT AS ntok
         FROM documents),
       sh AS (
         SELECT a.doc_id AS da, b.doc_id AS db
         FROM documents a JOIN documents b
           ON b.doc_id > a.doc_id AND lower(trim(a.text)) = lower(trim(b.text))),
       dup_docs AS (
         SELECT DISTINCT doc_id FROM (
           SELECT da AS doc_id FROM sh UNION ALL SELECT db FROM sh)),
       agg AS (
         SELECT (SELECT sum(ntok) FROM toks)::BIGINT AS total_tokens,
                (SELECT coalesce(sum(t.ntok), 0) FROM toks t
                 JOIN dup_docs d USING (doc_id))::BIGINT AS dup_tokens,
                (SELECT count(*) FROM toks)::BIGINT AS n_docs,
                (SELECT count(*) FROM dup_docs)::BIGINT AS n_dup_docs)
       SELECT n_docs, n_dup_docs, total_tokens, dup_tokens,
              round(dup_tokens::DOUBLE / total_tokens, 6) AS token_inflation
       FROM agg"""



@query("dup_token_inflation", _dup_inflation_sql())
def q_dup_token_inflation(spark, sf_dir):
    """Token-inflation KPI of exact (casefolded) duplicate documents:
    the share of corpus TOKENS living in docs that have at least one
    duplicate — the number that turns `dedup_exact`'s doc counts into
    training-budget terms (epochs effectively spent re-reading; Lee
    et al. 2022 report the same statistic for C4). Duplicate pairs
    come from a self-equi-join on the normalized text key (hash-join,
    never pairwise similarity); token mass is an exact census. The
    curation dashboard's headline ratio."""
    docs = _docs(spark, sf_dir)
    toks = docs.select("doc_id", F.size(F.split(F.trim(F.col("text")), " ")).cast("long").alias("ntok"))
    key = F.lower(F.trim(F.col("text")))
    keyed = docs.select("doc_id", key.alias("k"))
    sizes = keyed.groupBy("k").agg(F.count(F.lit(1)).alias("kc"))
    dup_docs = keyed.join(sizes.where(F.col("kc") > 1), "k").select("doc_id").distinct()
    tot = toks.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("ntok").cast("long").alias("total_tokens"),
    )
    dup = toks.join(dup_docs, "doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_dup_docs"),
        F.coalesce(F.sum("ntok"), F.lit(0)).cast("long").alias("dup_tokens"),
    )
    return tot.crossJoin(dup).select(
        "n_docs", "n_dup_docs", "total_tokens", "dup_tokens",
        F.round(F.col("dup_tokens").cast("double") / F.col("total_tokens"), 6).alias("token_inflation"),
    )



@query(
    "iv_2sls",
    """WITH u AS (
         SELECT user_id,
                (user_id % 2)::BIGINT AS z,
                sum((event_type = 'click')::INT)::BIGINT AS x,
                sum((event_type = 'purchase')::INT)::BIGINT AS y
         FROM events GROUP BY user_id),
       s AS (
         SELECT count(*)::BIGINT AS n, sum(z)::BIGINT AS sz,
                sum(z * x)::BIGINT AS szx, sum(z * y)::BIGINT AS szy,
                sum(x)::BIGINT AS sx, sum(y)::BIGINT AS sy,
                sum(x * x)::BIGINT AS sxx, sum(x * y)::BIGINT AS sxy
         FROM u)
       SELECT n,
              round((n * sxy - sx * sy)::DOUBLE / (n * sxx - sx * sx), 6) AS beta_ols,
              round((n * szy - sz * sy)::DOUBLE / (n * szx - sz * sx), 6) AS beta_iv,
              round((n * szx - sz * sx)::DOUBLE / (n * sz - sz * sz), 6) AS first_stage_slope
       FROM s""",
)
def q_iv_2sls(spark, sf_dir):
    """Instrumental-variable estimate of purchases-per-click via
    two-stage least squares with the binary instrument z = user-id
    parity (the same randomization-unit split `bayes_ab_beta` and
    `two_proportion_ci` use): with one binary instrument 2SLS
    collapses to the Wald estimator cov(z,y)/cov(z,x), reported next
    to the pooled-OLS slope it corrects (endogeneity gap = the two
    betas' spread) and the first-stage slope whose weakness would
    invalidate it. One user-grain census (map-side partial agg, one
    shuffle), then all four moments come from a single row of exact
    BIGINT cross-moments — the division is the only float op, so the
    estimate is bit-reproducible at any scale."""
    ev = _events(spark, sf_dir)
    u = ev.groupBy("user_id").agg(
        F.sum((F.col("event_type") == "click").cast("int")).cast("long").alias("x"),
        F.sum((F.col("event_type") == "purchase").cast("int")).cast("long").alias("y"),
    ).select((F.col("user_id") % 2).cast("long").alias("z"), "x", "y")
    s = u.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("z").cast("long").alias("sz"),
        F.sum(F.col("z") * F.col("x")).cast("long").alias("szx"),
        F.sum(F.col("z") * F.col("y")).cast("long").alias("szy"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
    )
    d_ = lambda c: F.col(c).cast("double")  # noqa: E731
    return s.select(
        "n",
        F.round((d_("n") * F.col("sxy") - d_("sx") * F.col("sy"))
                / (d_("n") * F.col("sxx") - d_("sx") * F.col("sx")), 6).alias("beta_ols"),
        F.round((d_("n") * F.col("szy") - d_("sz") * F.col("sy"))
                / (d_("n") * F.col("szx") - d_("sz") * F.col("sx")), 6).alias("beta_iv"),
        F.round((d_("n") * F.col("szx") - d_("sz") * F.col("sx"))
                / (d_("n") * F.col("sz") - d_("sz") * F.col("sz")), 6).alias("first_stage_slope"),
    )



@query(
    "panel_fe",
    """WITH pd AS (
         SELECT user_id, date_trunc('day', ts)::TIMESTAMP AS day,
                sum((event_type = 'click')::INT)::BIGINT AS x,
                sum((event_type = 'purchase')::INT)::BIGINT AS y
         FROM events GROUP BY user_id, day),
       pu AS (
         SELECT user_id, count(*)::BIGINT AS ni,
                sum(x)::BIGINT AS sx, sum(y)::BIGINT AS sy,
                sum(x * y)::BIGINT AS sxy, sum(x * x)::BIGINT AS sxx
         FROM pd GROUP BY user_id),
       fp AS (
         SELECT count(*)::BIGINT AS n_users, sum(ni)::BIGINT AS n_obs,
                sum(round(1e6 * (sxy - sx::DOUBLE * sy / ni), 0)::BIGINT)::BIGINT AS num_fp,
                sum(round(1e6 * (sxx - sx::DOUBLE * sx / ni), 0)::BIGINT)::BIGINT AS den_fp,
                sum(sx)::BIGINT AS gsx, sum(sy)::BIGINT AS gsy,
                sum(sxy)::BIGINT AS gsxy, sum(sxx)::BIGINT AS gsxx
         FROM pu)
       SELECT n_users, n_obs,
              round(num_fp::DOUBLE / den_fp, 6) AS beta_fe,
              round((n_obs * gsxy - gsx * gsy)::DOUBLE
                    / (n_obs * gsxx - gsx * gsx), 6) AS beta_pooled
       FROM fp""",
)
def q_panel_fe(spark, sf_dir):
    """One-way fixed-effects (within) estimator on the user × day
    click → purchase panel (Wooldridge 2010 §10.5): per-user demeaning
    absorbs every time-invariant user trait, so beta_fe is identified
    purely from WITHIN-user day-to-day variation while beta_pooled
    (reported for contrast) also soaks up cross-user heterogeneity.
    Per-user demeaned cross-products use exact BIGINT moments with ONE
    rational division each, immediately re-quantized to 1e-6 fixed
    point before the global integer sum — associativity-proof, so the
    user-partitioned partial aggregation can combine in any order on
    any cluster. Two shuffles total (user×day census, user rollup)."""
    ev = _events(spark, sf_dir)
    pd_ = ev.groupBy("user_id", F.date_trunc("day", F.col("ts")).alias("day")).agg(
        F.sum((F.col("event_type") == "click").cast("int")).cast("long").alias("x"),
        F.sum((F.col("event_type") == "purchase").cast("int")).cast("long").alias("y"),
    )
    pu = pd_.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("ni"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
    )
    num = F.round(F.lit(1e6) * (F.col("sxy") - F.col("sx").cast("double") * F.col("sy") / F.col("ni")), 0).cast("long")
    den = F.round(F.lit(1e6) * (F.col("sxx") - F.col("sx").cast("double") * F.col("sx") / F.col("ni")), 0).cast("long")
    fp = pu.agg(
        F.count(F.lit(1)).cast("long").alias("n_users"),
        F.sum("ni").cast("long").alias("n_obs"),
        F.sum(num).cast("long").alias("num_fp"),
        F.sum(den).cast("long").alias("den_fp"),
        F.sum("sx").cast("long").alias("gsx"),
        F.sum("sy").cast("long").alias("gsy"),
        F.sum("sxy").cast("long").alias("gsxy"),
        F.sum("sxx").cast("long").alias("gsxx"),
    )
    d_ = lambda c: F.col(c).cast("double")  # noqa: E731
    return fp.select(
        "n_users", "n_obs",
        F.round(d_("num_fp") / F.col("den_fp"), 6).alias("beta_fe"),
        F.round((d_("n_obs") * F.col("gsxy") - d_("gsx") * F.col("gsy"))
                / (d_("n_obs") * F.col("gsxx") - d_("gsx") * F.col("gsx")), 6).alias("beta_pooled"),
    )



@query(
    "page_trend",
    """WITH grid AS (
         SELECT (datediff('day', DATE '2024-01-01', date_trunc('day', ts)::DATE) % 7)::BIGINT AS wd,
                (datediff('day', DATE '2024-01-01', date_trunc('day', ts)::DATE) // 7)::BIGINT AS wi,
                count(*)::BIGINT AS x
         FROM events GROUP BY wd, wi),
       full_w AS (SELECT wi FROM grid GROUP BY wi HAVING count(*) = 7),
       ranked AS (
         SELECT g.wd, g.wi,
                2 * rank() OVER (PARTITION BY g.wi ORDER BY g.x)
                  + count(*) OVER (PARTITION BY g.wi, g.x) - 1 AS ar2
         FROM grid g JOIN full_w USING (wi)),
       rsum AS (SELECT wd, sum(ar2)::BIGINT AS r2 FROM ranked GROUP BY wd),
       s AS (
         SELECT sum((wd + 1) * r2)::BIGINT AS l2,
                (SELECT count(*)::BIGINT FROM full_w) AS m
         FROM rsum)
       SELECT m AS n_weeks,
              round(l2::DOUBLE / 2, 6) AS l_stat,
              round(m::DOUBLE * 112, 6) AS e_l,
              round((l2::DOUBLE / 2 - m::DOUBLE * 112)
                    / sqrt(m::DOUBLE * 49 * 48 * 8 / 144), 6) AS z
       FROM s""",
)
def q_page_trend(spark, sf_dir):
    """Page's L test (Page, JASA 1963) for a monotone weekday trend in
    daily event volume: weeks are blocks, weekdays (anchor-relative
    0..6, the engine-neutral DOW of `median_polish`) the ordered
    treatments, L = Σ_j j·R_j over within-week ranks. Ranks are kept
    as EXACT integers by the doubled-midrank trick ar2 = 2·rank +
    ties − 1 (average rank is always a multiple of ½), so L arrives
    as one BIGINT l2 before a single closed-form standardization
    (E[L] = mk(k+1)²/4 = 112m, Var = mk²(k²−1)(k+1)/144, no-ties
    form, k=7). Partial weeks at the data boundary are excluded so
    every block ranks exactly 7 cells. One day-grain census, then
    week-partitioned windows over ≤7-row groups — nothing here grows
    with row count at 100 TB except the first aggregation."""
    ev = _events(spark, sf_dir)
    day = F.date_trunc("day", F.col("ts")).cast("date")
    dd = F.datediff(day, F.lit("2024-01-01").cast("date"))
    grid = ev.groupBy(
        (dd % 7).cast("long").alias("wd"), F.floor(dd / 7).cast("long").alias("wi")
    ).agg(F.count(F.lit(1)).cast("long").alias("x"))
    full_w = grid.groupBy("wi").agg(F.count(F.lit(1)).alias("nw")).where(F.col("nw") == 7).select("wi")
    wrk = Window.partitionBy("wi").orderBy("x")
    wties = Window.partitionBy("wi", "x")
    ranked = grid.join(F.broadcast(full_w), "wi").select(
        "wd", "wi",
        (F.lit(2) * F.rank().over(wrk) + F.count(F.lit(1)).over(wties) - 1).alias("ar2"),
    )
    rsum = ranked.groupBy("wd").agg(F.sum("ar2").cast("long").alias("r2"))
    m_df = full_w.agg(F.count(F.lit(1)).cast("long").alias("m"))
    s = rsum.agg(F.sum((F.col("wd") + 1) * F.col("r2")).cast("long").alias("l2")).crossJoin(
        F.broadcast(m_df)
    )
    return s.select(
        F.col("m").alias("n_weeks"),
        F.round(F.col("l2") / F.lit(2.0), 6).alias("l_stat"),
        F.round(F.col("m") * F.lit(112.0), 6).alias("e_l"),
        F.round(
            (F.col("l2") / F.lit(2.0) - F.col("m") * F.lit(112.0))
            / F.sqrt(F.col("m") * F.lit(49.0) * F.lit(48.0) * F.lit(8.0) / F.lit(144.0)),
            6,
        ).alias("z"),
    )



_HLL_M = 256  # 2^8 registers; md5 chars 1-2 pick the register, 3-15 feed rho

# bit-length of a nonzero hex digit (leading-bit position within its nibble)
_HEX_BITLEN = {"1": 1, "2": 2, "3": 2, "4": 3, "5": 3, "6": 3, "7": 3,
               "8": 4, "9": 4, "a": 4, "b": 4, "c": 4, "d": 4, "e": 4, "f": 4}



def _hll_sql() -> str:
    blcase = " ".join(f"WHEN '{h}' THEN {b}" for h, b in _HEX_BITLEN.items())
    return f"""WITH h AS (
         SELECT DISTINCT md5(user_id::VARCHAR) AS hx FROM events),
       rho AS (
         SELECT CAST(concat('0x', substr(hx, 1, 2)) AS BIGINT) AS reg,
                trim(LEADING '0' FROM substr(hx, 3, 13)) AS st
         FROM h),
       reg AS (
         SELECT reg,
                max(CASE WHEN st = '' THEN 53
                         ELSE 4 * (13 - length(st)) + 5
                              - (CASE substr(st, 1, 1) {blcase} END)
                    END)::BIGINT AS m
         FROM rho GROUP BY reg),
       s AS (
         SELECT count(*)::BIGINT AS obs,
                sum(round(1e15 * pow(2.0, -m), 0)::BIGINT)::BIGINT AS s_fp
         FROM reg),
       est AS (
         SELECT obs,
                (0.7213 / (1 + 1.079 / 256)) * 65536.0
                  / (s_fp::DOUBLE / 1e15 + (256 - obs)) AS raw,
                (256 - obs)::BIGINT AS v,
                (SELECT count(DISTINCT user_id)::BIGINT FROM events) AS n_exact
         FROM s),
       fin AS (
         SELECT n_exact, obs,
                CASE WHEN raw <= 640.0 AND v > 0
                     THEN 256.0 * ln(256.0 / v) ELSE raw END AS e
         FROM est)
       SELECT n_exact AS exact_distinct, obs AS registers_hit,
              round(e, 3) AS est_distinct,
              round((e - n_exact) / n_exact, 6) AS rel_err
       FROM fin"""



@query("hyperloglog_users", _hll_sql())
def q_hyperloglog_users(spark, sf_dir):
    """HyperLogLog distinct-user estimate (Flajolet et al., AofA 2007)
    with the registers built EXPLICITLY so the sketch is bit-reproducible
    cross-engine — the complement of `kmv_distinct`, which documents why
    Spark's own approx_count_distinct can't be oracle-checked. p=8: md5
    hex chars 1-2 pick one of 256 registers, chars 3-15 give a 52-bit
    tail whose leading-zero count is extracted ARITHMETICALLY (strip
    leading hex zeros, then a 15-entry nibble bit-length map) — no
    bin()/log2 float paths. The harmonic mean's power sum is re-quantized
    per register to 1e-15 fixed point (max term 5e14, so a full 256-
    register sum stays far inside int64) so the 256-term sum is an exact
    order-free BIGINT; the small-range linear-counting branch and bias
    constant alpha_256 follow the paper. Registers are a 256-row
    aggregate of a distinct-hash census: at 10^12 rows the shuffle
    carries ONLY (register, max-rho) pairs after map-side combine."""
    ev = _events(spark, sf_dir)
    hx = ev.select(F.md5(F.col("user_id").cast("string")).alias("hx")).distinct()
    st = F.expr("trim(LEADING '0' FROM substr(hx, 3, 13))")
    blmap = F.create_map(*[F.lit(x) for kv in _HEX_BITLEN.items() for x in kv])
    rho = hx.select(
        F.conv(F.substring("hx", 1, 2), 16, 10).cast("long").alias("reg"),
        F.when(st == "", F.lit(53)).otherwise(
            F.lit(4) * (F.lit(13) - F.length(st)) + F.lit(5)
            - blmap[F.substring(st, 1, 1)]
        ).cast("long").alias("rho"),
    )
    reg = rho.groupBy("reg").agg(F.max("rho").alias("m"))
    s = reg.agg(
        F.count(F.lit(1)).cast("long").alias("obs"),
        F.sum(F.round(F.lit(1e15) * F.pow(F.lit(2.0), -F.col("m")), 0).cast("long")).cast("long").alias("s_fp"),
    )
    n_exact = ev.agg(F.countDistinct("user_id").cast("long").alias("n_exact"))
    alpha_m2 = (0.7213 / (1 + 1.079 / 256)) * 65536.0
    raw = F.lit(alpha_m2) / (F.col("s_fp").cast("double") / F.lit(1e15) + (F.lit(256) - F.col("obs")))
    v = (F.lit(256) - F.col("obs")).cast("long")
    e = F.when((raw <= F.lit(640.0)) & (v > 0), F.lit(256.0) * F.log(F.lit(256.0) / v)).otherwise(raw)
    return s.crossJoin(F.broadcast(n_exact)).select(
        F.col("n_exact").alias("exact_distinct"),
        F.col("obs").alias("registers_hit"),
        F.round(e, 3).alias("est_distinct"),
        F.round((e - F.col("n_exact")) / F.col("n_exact"), 6).alias("rel_err"),
    )



_MP_M = 7  # subsequence length (one week of daily counts)



def _matrix_profile_sql() -> str:
    d2 = " + ".join(
        f"(a.x{k} - b.x{k}) * (a.x{k} - b.x{k})" for k in range(_MP_M)
    )
    leads = ", ".join(
        f"lead(x, {k}) OVER (ORDER BY dd) AS x{k}" for k in range(_MP_M)
    )
    return f"""WITH daily AS (
         SELECT datediff('day', DATE '2024-01-01', date_trunc('day', ts)::DATE)::BIGINT AS dd,
                count(*)::BIGINT AS x
         FROM events GROUP BY dd),
       idx AS (
         SELECT row_number() OVER (ORDER BY dd)::BIGINT AS i, x FROM daily),
       win AS (
         SELECT i, {leads.replace('ORDER BY dd', 'ORDER BY i')}
         FROM (SELECT i, x FROM idx)),
       w AS (SELECT * FROM win WHERE x{_MP_M - 1} IS NOT NULL),
       pairs AS (
         SELECT a.i AS i, b.i AS j, ({d2})::BIGINT AS dist2
         FROM w a JOIN w b ON abs(a.i - b.i) >= {_MP_M}),
       ranked AS (
         SELECT i, j, dist2,
                row_number() OVER (PARTITION BY i ORDER BY dist2, j) AS rn
         FROM pairs)
       SELECT i, j AS nn_idx, dist2 FROM ranked WHERE rn = 1"""



@query("matrix_profile_daily", _matrix_profile_sql())
def q_matrix_profile_daily(spark, sf_dir):
    """Matrix profile of the daily event-count series (Yeh et al., ICDM
    2016): for every length-7 subsequence, the nearest-neighbor distance
    to any non-overlapping subsequence (exclusion zone = full window
    |i−j| ≥ 7) plus the neighbor's index — the discord/motif primitive
    (high profile = anomalous week, low = repeated weekly motif). The
    non-normalized Euclidean variant keeps dist² an EXACT BIGINT sum of
    7 squared integer differences — zero float ops end-to-end. Plan:
    day-grain census first (the only input-sized stage), subsequences
    via 6 lead() columns on the ≤O(days) series, then the all-pairs join
    on the profile grain — quadratic only in DAYS, never rows, so this
    stays a broadcast-sized tail computation at any corpus scale."""
    ev = _events(spark, sf_dir)
    day = F.date_trunc("day", F.col("ts")).cast("date")
    dd = F.datediff(day, F.lit("2024-01-01").cast("date"))
    daily = ev.groupBy(dd.cast("long").alias("dd")).agg(F.count(F.lit(1)).cast("long").alias("x"))
    widx = Window.orderBy("dd")
    idx = daily.select(F.row_number().over(widx).cast("long").alias("i"), "x")
    wi = Window.orderBy("i")
    win_cols = [F.lead("x", k).over(wi).alias(f"x{k}") for k in range(_MP_M)]
    w = idx.select("i", *win_cols).where(F.col(f"x{_MP_M - 1}").isNotNull()).stableCheckpoint(eager=True)
    a, b = w.alias("a"), w.alias("b")
    dist2 = sum(
        (F.col(f"a.x{k}") - F.col(f"b.x{k}")) * (F.col(f"a.x{k}") - F.col(f"b.x{k}"))
        for k in range(_MP_M)
    ).cast("long")
    pairs = a.join(b, F.abs(F.col("a.i") - F.col("b.i")) >= _MP_M).select(
        F.col("a.i").alias("i"), F.col("b.i").alias("j"), dist2.alias("dist2")
    )
    wr = Window.partitionBy("i").orderBy("dist2", "j")
    return (
        pairs.select("i", "j", "dist2", F.row_number().over(wr).alias("rn"))
        .where(F.col("rn") == 1)
        .select("i", F.col("j").alias("nn_idx"), "dist2")
    )



# ERR stopping probability per relevance grade rel∈0..6: (2^rel − 1)/64.
# All values are exact dyadic rationals, so products/sums below stay exact.
_ERR_R = {0: 0.0, 1: 0.015625, 2: 0.046875, 3: 0.109375,
          4: 0.234375, 5: 0.484375, 6: 0.984375}

# integer micro-weights for 1/rank, shared verbatim by both engines
_ERR_W = {1: 1000000, 2: 500000, 3: 333333, 4: 250000, 5: 200000}



def _err_sql(k: int = 5) -> str:
    from pliers_spark.operators.ir import bm25_topk_sql

    r_case = " ".join(f"WHEN {r} THEN {v}" for r, v in _ERR_R.items())
    w_case = " ".join(f"WHEN {r} THEN {w}" for r, w in _ERR_W.items())
    tail = f""", rel AS (
  SELECT b.q_id, b.doc_id, b.rank, count(tf.term)::BIGINT AS rel
  FROM bm25 b
  JOIN qt ON qt.q_id = b.q_id
  LEFT JOIN tf ON tf.doc_id = b.doc_id AND tf.term = qt.term
  GROUP BY 1, 2, 3),
probs AS (
  SELECT q_id, rank,
         (CASE rel {r_case} END)::DOUBLE AS r
  FROM rel),
stopped AS (
  SELECT q_id, rank, r,
         coalesce(product(1.0 - r) OVER (
           PARTITION BY q_id ORDER BY rank
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 1.0) AS p
  FROM probs),
agg AS (
  SELECT q_id,
         sum((CASE rank {w_case} END) * r * p) AS err_fp
  FROM stopped GROUP BY q_id)
SELECT q_id, round(err_fp / 1e6, 6) AS err
FROM agg"""
    return f"""WITH seeds AS (
         SELECT doc_id, string_split(trim(text), ' ') AS t
         FROM documents ORDER BY doc_id LIMIT 8),
       queries AS (
         SELECT doc_id AS q_id, unnest(t[1:6]) AS term FROM seeds),
       {bm25_topk_sql(k=k, tail=tail)}"""



@query("err_at_k", _err_sql())
def q_err_at_k(spark, sf_dir):
    """Expected Reciprocal Rank @5 (Chapelle et al., CIKM 2009) over the
    engine's own BM25 rankings — the cascade-model companion to
    `ndcg_at_k`: the user scans down the list and stops at rank r with
    probability R_r·Π(1−R_i), giving ERR = Σ 1/r·R_r·Π_{i<r}(1−R_i).
    Stopping probabilities (2^rel−1)/2^6 are EXACT dyadic rationals, so
    the windowed cumulative product and the stop-mass products are exact
    IEEE doubles in ANY evaluation order; the only non-dyadic factor 1/r
    enters as the same once-rounded integer micro-weights as NDCG's
    discount. Same plan shape as ndcg_at_k: corpus touched once by the
    BM25 postings pass, evaluation on the (queries×k) grain."""
    from pliers_spark.operators.ir import bm25_topk

    docs = _docs(spark, sf_dir)
    seeds = (
        docs.orderBy("doc_id")
        .limit(8)
        .select(
            F.col("doc_id").alias("q_id"),
            F.explode(F.slice(T.tokenize(F.col("text")), 1, 6)).alias("term"),
        )
    )
    cand = bm25_topk(docs, seeds, k=5).stableCheckpoint(eager=True)
    qt = seeds.distinct().stableCheckpoint(eager=True)
    cand_docs = cand.select("doc_id").distinct()
    doc_terms = (
        docs.join(F.broadcast(cand_docs), "doc_id")
        .select("doc_id", F.explode(T.tokenize(F.col("text"))).alias("term"))
        .distinct()
    )
    matched = (
        doc_terms.join(F.broadcast(qt), "term")
        .groupBy("q_id", "doc_id")
        .agg(F.count(F.lit(1)).cast("long").alias("rel"))
    )
    rmap = F.create_map(*[F.lit(x) for kv in _ERR_R.items() for x in kv])
    wmap = F.create_map(*[F.lit(x) for kv in _ERR_W.items() for x in kv])
    probs = (
        cand.join(matched, ["q_id", "doc_id"], "left")
        .select(
            "q_id", "rank",
            rmap[F.coalesce(F.col("rel"), F.lit(0))].cast("double").alias("r"),
        )
    )
    wp = Window.partitionBy("q_id").orderBy("rank").rowsBetween(Window.unboundedPreceding, -1)
    stopped = probs.select(
        "q_id", "rank", "r",
        F.coalesce(F.product(F.lit(1.0) - F.col("r")).over(wp), F.lit(1.0)).alias("p"),
    )
    agg = stopped.groupBy("q_id").agg(
        F.sum(wmap[F.col("rank")].cast("double") * F.col("r") * F.col("p")).alias("err_fp")
    )
    return agg.select("q_id", F.round(F.col("err_fp") / F.lit(1e6), 6).alias("err"))



_CRO_A = 0.2  # Croston smoothing constant



def _croston_sql() -> str:
    a = _CRO_A
    return f"""WITH daily AS (
         SELECT event_type,
                datediff('day', DATE '2024-01-01', date_trunc('day', ts)::DATE)::BIGINT AS dd,
                count(*)::BIGINT AS d
         FROM events GROUP BY event_type, dd),
       seq AS (
         SELECT event_type, dd, d,
                row_number() OVER (PARTITION BY event_type ORDER BY dd)::BIGINT AS j,
                count(*) OVER (PARTITION BY event_type)::BIGINT AS k,
                dd - lag(dd) OVER (PARTITION BY event_type ORDER BY dd) AS q
         FROM daily),
       ok AS (SELECT event_type FROM seq GROUP BY event_type HAVING max(k) >= 2),
       terms AS (
         SELECT s.event_type, s.k,
                round(1e9 * d * (CASE WHEN j = 1 THEN pow({1 - a}, k - 1)
                                      ELSE {a} * pow({1 - a}, k - j) END), 0)::BIGINT AS z_t,
                CASE WHEN j = 1 THEN 0
                     WHEN j = 2 THEN round(1e9 * q * pow({1 - a}, k - 2), 0)::BIGINT
                     ELSE round(1e9 * q * {a} * pow({1 - a}, k - j), 0)::BIGINT END AS p_t
         FROM seq s JOIN ok USING (event_type)),
       agg AS (
         SELECT event_type, max(k) AS n_demands,
                sum(z_t)::BIGINT AS z_fp, sum(p_t)::BIGINT AS p_fp
         FROM terms GROUP BY event_type)
       SELECT event_type, n_demands,
              round(z_fp / 1e9, 6) AS z_level,
              round(p_fp / 1e9, 6) AS p_interval,
              round(z_fp::DOUBLE / p_fp, 6) AS croston,
              round({1 - a / 2} * z_fp::DOUBLE / p_fp, 6) AS sba
       FROM agg ORDER BY event_type"""



@query("croston_sba", _croston_sql())
def q_croston_sba(spark, sf_dir):
    """Croston's intermittent-demand forecast with the Syntetos-Boylan
    approximation (Croston, Oper. Res. Q. 1972; Syntetos & Boylan, IJF
    2005): per event type, separate exponential smoothing (α=0.2) of
    the nonzero daily demand SIZES and of the INTER-demand intervals,
    forecast = z/p, debiased SBA = (1−α/2)·z/p — the standard spare-
    parts/sparse-event forecaster that `demand_classes` (Syntetos-
    Boylan quadrant) routes to. Both recursions are unrolled to their
    closed weighted-sum form, each term re-quantized to 1e-9 fixed
    point so the partial-aggregated sums are exact int64 in any
    combine order. Zero-demand days never materialize — intervals come
    from day-index gaps, so no calendar spine is needed. One day-grain
    census, then type-partitioned windows."""
    a = _CRO_A
    ev = _events(spark, sf_dir)
    day = F.date_trunc("day", F.col("ts")).cast("date")
    dd = F.datediff(day, F.lit("2024-01-01").cast("date")).cast("long")
    daily = ev.groupBy("event_type", dd.alias("dd")).agg(
        F.count(F.lit(1)).cast("long").alias("d")
    )
    w = Window.partitionBy("event_type").orderBy("dd")
    wa = Window.partitionBy("event_type")
    seq = daily.select(
        "event_type", "dd", "d",
        F.row_number().over(w).cast("long").alias("j"),
        F.count(F.lit(1)).over(wa).cast("long").alias("k"),
        (F.col("dd") - F.lag("dd").over(w)).alias("q"),
    ).where(F.col("k") >= 2)
    z_t = F.round(
        F.lit(1e9) * F.col("d")
        * F.when(F.col("j") == 1, F.pow(F.lit(1 - a), F.col("k") - 1))
        .otherwise(F.lit(a) * F.pow(F.lit(1 - a), F.col("k") - F.col("j"))),
        0,
    ).cast("long")
    p_t = (
        F.when(F.col("j") == 1, F.lit(0))
        .when(F.col("j") == 2, F.round(F.lit(1e9) * F.col("q") * F.pow(F.lit(1 - a), F.col("k") - 2), 0))
        .otherwise(F.round(F.lit(1e9) * F.col("q") * F.lit(a) * F.pow(F.lit(1 - a), F.col("k") - F.col("j")), 0))
        .cast("long")
    )
    agg = seq.select("event_type", "k", z_t.alias("z_t"), p_t.alias("p_t")).groupBy("event_type").agg(
        F.max("k").alias("n_demands"),
        F.sum("z_t").cast("long").alias("z_fp"),
        F.sum("p_t").cast("long").alias("p_fp"),
    )
    return agg.select(
        "event_type", "n_demands",
        F.round(F.col("z_fp") / F.lit(1e9), 6).alias("z_level"),
        F.round(F.col("p_fp") / F.lit(1e9), 6).alias("p_interval"),
        F.round(F.col("z_fp").cast("double") / F.col("p_fp"), 6).alias("croston"),
        F.round(F.lit(1 - a / 2) * F.col("z_fp").cast("double") / F.col("p_fp"), 6).alias("sba"),
    ).orderBy("event_type")



def _erf_sql(x: str) -> str:
    """Abramowitz & Stegun 7.1.26 erf as a DuckDB fragment — the exact
    same literal coefficients and nesting as the Spark twin, so both
    engines execute identical IEEE-double op sequences."""
    return (
        f"(CASE WHEN {x} < 0 THEN -1.0 ELSE 1.0 END) * "
        f"(1.0 - (1.0 / (1.0 + 0.3275911 * abs({x}))) * "
        f"(0.254829592 + (1.0 / (1.0 + 0.3275911 * abs({x}))) * "
        f"(-0.284496736 + (1.0 / (1.0 + 0.3275911 * abs({x}))) * "
        f"(1.421413741 + (1.0 / (1.0 + 0.3275911 * abs({x}))) * "
        f"(-1.453152027 + (1.0 / (1.0 + 0.3275911 * abs({x}))) * 1.061405429)))) "
        f"* exp(-abs({x}) * abs({x})))"
    )



def _erf_col(x):
    t = F.lit(1.0) / (F.lit(1.0) + F.lit(0.3275911) * F.abs(x))
    poly = F.lit(0.254829592) + t * (
        F.lit(-0.284496736) + t * (
            F.lit(1.421413741) + t * (F.lit(-1.453152027) + t * F.lit(1.061405429))
        )
    )
    sign = F.when(x < 0, F.lit(-1.0)).otherwise(F.lit(1.0))
    return sign * (F.lit(1.0) - t * poly * F.exp(-F.abs(x) * F.abs(x)))



def _ad_sql() -> str:
    phi = f"(0.5 * (1.0 + {_erf_sql('z / sqrt(2.0)')}))"
    return f"""WITH daily AS (
         SELECT datediff('day', DATE '2024-01-01', date_trunc('day', ts)::DATE)::BIGINT AS dd,
                count(*)::BIGINT AS x
         FROM events GROUP BY dd),
       mom AS (
         SELECT count(*)::BIGINT AS n, sum(x)::BIGINT AS sx, sum(x * x)::BIGINT AS sxx
         FROM daily),
       z AS (
         SELECT row_number() OVER (ORDER BY x, dd)::BIGINT AS i, m.n,
                (x - m.sx::DOUBLE / m.n)
                  / sqrt((m.sxx - m.sx::DOUBLE * m.sx / m.n) / (m.n - 1)) AS z
         FROM daily, mom m),
       lp AS (
         SELECT i, n, ln(greatest({phi}, 1e-300)) AS lf,
                ln(greatest(1.0 - {phi}, 1e-300)) AS lcf
         FROM z),
       terms AS (
         SELECT a.n,
                round(1e9 * (2 * a.i - 1) * (a.lf + b.lcf), 0)::BIGINT AS t_fp
         FROM lp a JOIN lp b ON b.i = a.n + 1 - a.i),
       agg AS (SELECT max(n) AS n, sum(t_fp)::BIGINT AS s_fp FROM terms)
       SELECT n,
              round(-n - s_fp / (n * 1e9), 6) AS a2,
              round((-n - s_fp / (n * 1e9))
                    * (1.0 + 0.75 / n + 2.25 / (n * n)), 6) AS a2_star
       FROM agg"""



@query("anderson_darling", _ad_sql())
def q_anderson_darling(spark, sf_dir):
    """Anderson-Darling normality test (Anderson & Darling, AMS 1952;
    Stephens, JASA 1974 case 3 with estimated μ,σ) on the daily event-
    count series: A² = −n − (1/n)Σ(2i−1)[ln Φ(z_(i)) + ln(1−Φ(z_(n+1−i)))]
    plus Stephens' small-sample correction A*² = A²(1+0.75/n+2.25/n²) —
    the tail-weighted EDF statistic that catches the departures
    `ks_drift`'s supremum misses. Φ comes from the Abramowitz-Stegun
    7.1.26 erf polynomial written ONCE with identical literal nesting
    in both engines (no libm erf dependency); each (2i−1)-weighted
    log term is re-quantized to 1e-9 fixed point so the sum is an exact
    int64. The order statistic pairs i ↔ n+1−i via a rank self-join on
    the ≤O(days) grain — input-sized work is only the day census."""
    ev = _events(spark, sf_dir)
    day = F.date_trunc("day", F.col("ts")).cast("date")
    dd = F.datediff(day, F.lit("2024-01-01").cast("date")).cast("long")
    daily = ev.groupBy(dd.alias("dd")).agg(F.count(F.lit(1)).cast("long").alias("x"))
    mom = daily.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
    )
    wi = Window.orderBy("x", "dd")
    z_expr = (
        (F.col("x") - F.col("sx").cast("double") / F.col("n"))
        / F.sqrt((F.col("sxx") - F.col("sx").cast("double") * F.col("sx") / F.col("n")) / (F.col("n") - 1))
    )
    zdf = daily.crossJoin(F.broadcast(mom)).select(
        F.row_number().over(wi).cast("long").alias("i"), "n", z_expr.alias("z")
    )
    phi = F.lit(0.5) * (F.lit(1.0) + _erf_col(F.col("z") / F.sqrt(F.lit(2.0))))
    lp = zdf.select(
        "i", "n",
        F.log(F.greatest(phi, F.lit(1e-300))).alias("lf"),
        F.log(F.greatest(F.lit(1.0) - phi, F.lit(1e-300))).alias("lcf"),
    ).stableCheckpoint(eager=True)
    a, b = lp.alias("a"), lp.alias("b")
    terms = a.join(b, F.col("b.i") == F.col("a.n") + 1 - F.col("a.i")).select(
        F.col("a.n").alias("n"),
        F.round(F.lit(1e9) * (2 * F.col("a.i") - 1) * (F.col("a.lf") + F.col("b.lcf")), 0)
        .cast("long").alias("t_fp"),
    )
    agg = terms.groupBy().agg(F.max("n").alias("n"), F.sum("t_fp").cast("long").alias("s_fp"))
    a2 = -F.col("n") - F.col("s_fp") / (F.col("n") * F.lit(1e9))
    return agg.select(
        "n",
        F.round(a2, 6).alias("a2"),
        F.round(a2 * (F.lit(1.0) + F.lit(0.75) / F.col("n") + F.lit(2.25) / (F.col("n") * F.col("n"))), 6).alias("a2_star"),
    )



_THETA_H = 7  # forecast horizon (days)



def _theta_sql() -> str:
    return f"""WITH daily AS (
         SELECT datediff('day', DATE '2024-01-01', date_trunc('day', ts)::DATE)::BIGINT AS dd,
                count(*)::BIGINT AS y
         FROM events GROUP BY dd),
       idx AS (SELECT row_number() OVER (ORDER BY dd)::BIGINT AS t, y FROM daily),
       mom AS (
         SELECT count(*)::BIGINT AS n, sum(t)::BIGINT AS st, sum(y)::BIGINT AS sy,
                sum(t * y)::BIGINT AS sty, sum(t * t)::BIGINT AS stt
         FROM idx),
       ab AS (
         SELECT n,
                (n * sty - st * sy)::DOUBLE / (n * stt - st * st) AS b,
                (sy::DOUBLE - (n * sty - st * sy)::DOUBLE / (n * stt - st * st) * st) / n AS a
         FROM mom),
       ses AS (
         SELECT max(ab.n) AS n, max(ab.a) AS a, max(ab.b) AS b,
                sum(round(1e9 * (2.0 * y - (ab.a + ab.b * t))
                          * (CASE WHEN t = 1 THEN pow(0.5, ab.n - 1)
                                  ELSE pow(0.5, ab.n - t + 1) END), 0)::BIGINT)::BIGINT AS s_fp
         FROM idx, ab),
       h AS (SELECT unnest(generate_series(1, {_THETA_H}))::BIGINT AS h)
       SELECT h.h AS horizon,
              round(0.5 * s.s_fp / 1e9 + 0.5 * (s.a + s.b * (s.n + h.h)), 6) AS forecast
       FROM h, ses s ORDER BY horizon"""



@query("theta_forecast", _theta_sql())
def q_theta_forecast(spark, sf_dir):
    """Theta-method forecast (Assimakopoulos & Nikolopoulos, IJF 2000 —
    the M3-competition winner) of daily event volume, 7-day horizon:
    the series decomposes into the θ=0 line (the OLS linear trend,
    extrapolated) and the θ=2 line (2y_t − trend, double-curvature),
    which is flattened by simple exponential smoothing and the two are
    averaged. α is pinned at 0.5 so every SES weight 0.5^k is an exact
    dyadic double; each weighted term is still re-quantized to 1e-9
    fixed point so the unrolled sum is an exact int64 in any combine
    order. Trend coefficients come from exact BIGINT moment sums. The
    only input-sized stage is the day census; everything after runs on
    the ≤O(days) grain."""
    ev = _events(spark, sf_dir)
    day = F.date_trunc("day", F.col("ts")).cast("date")
    dd = F.datediff(day, F.lit("2024-01-01").cast("date")).cast("long")
    daily = ev.groupBy(dd.alias("dd")).agg(F.count(F.lit(1)).cast("long").alias("y"))
    wt = Window.orderBy("dd")
    idx = daily.select(F.row_number().over(wt).cast("long").alias("t"), "y")
    mom = idx.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("t").cast("long").alias("st"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("t") * F.col("y")).cast("long").alias("sty"),
        F.sum(F.col("t") * F.col("t")).cast("long").alias("stt"),
    )
    b = (F.col("n") * F.col("sty") - F.col("st") * F.col("sy")).cast("double") / (
        F.col("n") * F.col("stt") - F.col("st") * F.col("st")
    )
    ab = mom.select("n", b.alias("b"), ((F.col("sy").cast("double") - b * F.col("st")) / F.col("n")).alias("a"))
    weight = F.when(F.col("t") == 1, F.pow(F.lit(0.5), F.col("n") - 1)).otherwise(
        F.pow(F.lit(0.5), F.col("n") - F.col("t") + 1)
    )
    ses = idx.crossJoin(F.broadcast(ab)).agg(
        F.max("n").alias("n"), F.max("a").alias("a"), F.max("b").alias("b"),
        F.sum(
            F.round(F.lit(1e9) * (F.lit(2.0) * F.col("y") - (F.col("a") + F.col("b") * F.col("t"))) * weight, 0)
            .cast("long")
        ).cast("long").alias("s_fp"),
    )
    horizons = spark.range(1, _THETA_H + 1).select(F.col("id").cast("long").alias("horizon"))
    return horizons.crossJoin(F.broadcast(ses)).select(
        "horizon",
        F.round(
            F.lit(0.5) * F.col("s_fp") / F.lit(1e9)
            + F.lit(0.5) * (F.col("a") + F.col("b") * (F.col("n") + F.col("horizon"))),
            6,
        ).alias("forecast"),
    ).orderBy("horizon")



_AVAR_TAUS = (1, 2, 4, 8)



def _allan_sql() -> str:
    taus = ", ".join(str(t) for t in _AVAR_TAUS)
    return f"""WITH daily AS (
         SELECT datediff('day', DATE '2024-01-01', date_trunc('day', ts)::DATE)::BIGINT AS dd,
                count(*)::BIGINT AS x
         FROM events GROUP BY dd),
       idx AS (SELECT row_number() OVER (ORDER BY dd)::BIGINT - 1 AS t, x FROM daily),
       taus AS (SELECT unnest([{taus}])::BIGINT AS tau),
       blocks AS (
         SELECT taus.tau, idx.t // taus.tau AS k,
                sum(idx.x)::BIGINT AS s, count(*)::BIGINT AS nb
         FROM idx, taus GROUP BY 1, 2),
       full_b AS (SELECT tau, k, s FROM blocks WHERE nb = tau),
       diffs AS (
         SELECT tau, (s - lag(s) OVER (PARTITION BY tau ORDER BY k)) AS d
         FROM full_b),
       agg AS (
         SELECT tau, count(d)::BIGINT AS n_pairs, sum(d * d)::BIGINT AS sd2
         FROM diffs WHERE d IS NOT NULL GROUP BY tau)
       SELECT tau, n_pairs,
              round(sd2::DOUBLE / (2.0 * tau * tau * n_pairs), 6) AS avar
       FROM agg ORDER BY tau"""



@query("allan_variance", _allan_sql())
def q_allan_variance(spark, sf_dir):
    """Allan variance of the daily event-count series at averaging
    times τ ∈ {1,2,4,8} days (Allan, Proc. IEEE 1966; the oscillator-
    stability statistic repurposed for rate-stability monitoring):
    AVAR(τ) = ½⟨(ȳ_{k+1} − ȳ_k)²⟩ over adjacent non-overlapping
    τ-day block means. Its slope over τ separates white noise
    (AVAR ∝ 1/τ) from drift — distinguishing jitter from real rate
    change where plain variance conflates them. Block MEANS never
    materialize: the math runs on block SUMS, so squared differences
    are exact BIGINT and the single division by 2τ²·n happens once per
    τ. Day census, then a 4-τ × blocks grain — constant-size tail at
    any corpus scale."""
    ev = _events(spark, sf_dir)
    day = F.date_trunc("day", F.col("ts")).cast("date")
    dd = F.datediff(day, F.lit("2024-01-01").cast("date")).cast("long")
    daily = ev.groupBy(dd.alias("dd")).agg(F.count(F.lit(1)).cast("long").alias("x"))
    idx = daily.select((F.row_number().over(Window.orderBy("dd")) - 1).cast("long").alias("t"), "x")
    taus = spark.createDataFrame([(t,) for t in _AVAR_TAUS], "tau long")
    blocks = idx.crossJoin(F.broadcast(taus)).groupBy(
        "tau", F.floor(F.col("t") / F.col("tau")).alias("k")
    ).agg(F.sum("x").cast("long").alias("s"), F.count(F.lit(1)).cast("long").alias("nb"))
    full_b = blocks.where(F.col("nb") == F.col("tau"))
    wd = Window.partitionBy("tau").orderBy("k")
    diffs = full_b.select("tau", (F.col("s") - F.lag("s").over(wd)).alias("d")).where(
        F.col("d").isNotNull()
    )
    agg = diffs.groupBy("tau").agg(
        F.count("d").cast("long").alias("n_pairs"),
        F.sum(F.col("d") * F.col("d")).cast("long").alias("sd2"),
    )
    return agg.select(
        "tau", "n_pairs",
        F.round(F.col("sd2").cast("double") / (F.lit(2.0) * F.col("tau") * F.col("tau") * F.col("n_pairs")), 6).alias("avar"),
    ).orderBy("tau")



def _sampen_sql() -> str:
    return """WITH daily AS (
         SELECT datediff('day', DATE '2024-01-01', date_trunc('day', ts)::DATE)::BIGINT AS dd,
                count(*)::BIGINT AS x
         FROM events GROUP BY dd),
       idx AS (SELECT row_number() OVER (ORDER BY dd)::BIGINT AS i, x FROM daily),
       mom AS (
         SELECT count(*)::BIGINT AS n, sum(x)::BIGINT AS sx, sum(x * x)::BIGINT AS sxx
         FROM idx),
       w AS (
         SELECT i, x AS x0,
                lead(x, 1) OVER (ORDER BY i) AS x1,
                lead(x, 2) OVER (ORDER BY i) AS x2
         FROM idx),
       r AS (
         SELECT 0.2 * sqrt((sxx - sx::DOUBLE * sx / n) / (n - 1)) AS r FROM mom),
       pairs AS (
         SELECT a.i AS i, b.i AS j,
                greatest(abs(a.x0 - b.x0), abs(a.x1 - b.x1)) AS dm,
                CASE WHEN a.x2 IS NOT NULL AND b.x2 IS NOT NULL
                     THEN greatest(abs(a.x0 - b.x0), abs(a.x1 - b.x1), abs(a.x2 - b.x2))
                END AS dm1
         FROM w a JOIN w b ON a.i < b.i AND a.x1 IS NOT NULL AND b.x1 IS NOT NULL),
       cnt AS (
         SELECT sum((dm <= r.r)::INT)::BIGINT AS b,
                sum((dm1 IS NOT NULL AND dm1 <= r.r)::INT)::BIGINT AS a
         FROM pairs, r)
       SELECT b AS template_matches_m2, a AS template_matches_m3,
              CASE WHEN a > 0 AND b > 0 THEN round(-ln(a::DOUBLE / b), 6) END AS sampen
       FROM cnt"""



@query("sample_entropy", _sampen_sql())
def q_sample_entropy(spark, sf_dir):
    """Sample entropy of the daily event-count series (Richman &
    Moorman, Am. J. Physiol. 2000), m=2, r=0.2σ: −ln(A/B) where B
    counts template pairs whose length-2 windows stay within r under
    the Chebyshev distance and A the same at length 3 — the
    regularity statistic (low SampEn = predictable rhythm) that,
    unlike approximate entropy, excludes self-matches and is
    length-consistent. Window distances are exact BIGINT Chebyshev
    maxima compared against ONE shared tolerance r derived from exact
    integer moments, so the pair censuses are bit-deterministic. The
    all-pairs stage is quadratic only in DAYS (lead-built windows,
    i<j half-matrix) after the one input-sized day census."""
    ev = _events(spark, sf_dir)
    day = F.date_trunc("day", F.col("ts")).cast("date")
    dd = F.datediff(day, F.lit("2024-01-01").cast("date")).cast("long")
    daily = ev.groupBy(dd.alias("dd")).agg(F.count(F.lit(1)).cast("long").alias("x"))
    idx = daily.select(F.row_number().over(Window.orderBy("dd")).cast("long").alias("i"), "x")
    mom = idx.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
    )
    r_df = mom.select(
        (F.lit(0.2) * F.sqrt((F.col("sxx") - F.col("sx").cast("double") * F.col("sx") / F.col("n")) / (F.col("n") - 1))).alias("r")
    )
    wi = Window.orderBy("i")
    w = idx.select(
        "i", F.col("x").alias("x0"),
        F.lead("x", 1).over(wi).alias("x1"),
        F.lead("x", 2).over(wi).alias("x2"),
    ).stableCheckpoint(eager=True)
    a, b = w.alias("a"), w.alias("b")
    dm = F.greatest(
        F.abs(F.col("a.x0") - F.col("b.x0")), F.abs(F.col("a.x1") - F.col("b.x1"))
    )
    dm1 = F.when(
        F.col("a.x2").isNotNull() & F.col("b.x2").isNotNull(),
        F.greatest(
            F.abs(F.col("a.x0") - F.col("b.x0")),
            F.abs(F.col("a.x1") - F.col("b.x1")),
            F.abs(F.col("a.x2") - F.col("b.x2")),
        ),
    )
    pairs = a.join(
        b,
        (F.col("a.i") < F.col("b.i")) & F.col("a.x1").isNotNull() & F.col("b.x1").isNotNull(),
    ).select(dm.alias("dm"), dm1.alias("dm1"))
    cnt = pairs.crossJoin(F.broadcast(r_df)).agg(
        F.sum((F.col("dm") <= F.col("r")).cast("int")).cast("long").alias("b"),
        F.sum((F.col("dm1").isNotNull() & (F.col("dm1") <= F.col("r"))).cast("int")).cast("long").alias("a"),
    )
    return cnt.select(
        F.col("b").alias("template_matches_m2"),
        F.col("a").alias("template_matches_m3"),
        F.when(
            (F.col("a") > 0) & (F.col("b") > 0),
            F.round(-F.log(F.col("a").cast("double") / F.col("b")), 6),
        ).alias("sampen"),
    )



def _wb_sql() -> str:
    return """WITH base AS (
         SELECT doc_id, source, string_split(trim(text), ' ') AS toks FROM documents),
       uni AS (
         SELECT t AS w, count(*)::BIGINT AS c
         FROM (SELECT unnest(toks) AS t FROM base) GROUP BY t),
       tot AS (SELECT sum(c)::BIGINT AS n FROM uni),
       bi AS (
         SELECT source,
                unnest(toks[1:len(toks)-1]) AS w1,
                unnest(toks[2:len(toks)]) AS w2
         FROM base),
       model AS (SELECT w1, w2, count(*)::BIGINT AS cb FROM bi GROUP BY w1, w2),
       ctx AS (SELECT w1, sum(cb)::BIGINT AS cw, count(*)::BIGINT AS t1 FROM model GROUP BY w1),
       lp AS (
         SELECT m.w1, m.w2,
                CAST(round(ln(m.cb / (c.cw + c.t1)::DOUBLE
                              + (c.t1 / (c.cw + c.t1)::DOUBLE)
                                * (u.c / t.n::DOUBLE)) * 1e6) AS BIGINT) AS lp_unats
         FROM model m JOIN ctx c USING (w1)
              JOIN uni u ON u.w = m.w2 CROSS JOIN tot t),
       sb AS (SELECT source, w1, w2, count(*)::BIGINT AS sc FROM bi GROUP BY 1, 2, 3),
       per_src AS (
         SELECT sb.source, sum(sb.sc)::BIGINT AS n_bigrams,
                sum(sb.sc * lp.lp_unats)::BIGINT AS sum_lp
         FROM sb JOIN lp USING (w1, w2) GROUP BY sb.source)
       SELECT source, n_bigrams,
              round((sum_lp::DOUBLE / n_bigrams) / 1e6, 6) AS avg_lp,
              round(exp(-round((sum_lp::DOUBLE / n_bigrams) / 1e6, 6)), 6) AS ppl
       FROM per_src ORDER BY source"""



@query("witten_bell_ppl", _wb_sql())
def q_witten_bell_ppl(spark, sf_dir):
    """Per-source perplexity under a Witten-Bell-smoothed bigram LM
    (Witten & Bell, IEEE Trans. IT 1991; Chen & Goodman 1999 §2.5):
    p(w2|w1) = c12/(c1+T1) + T1/(c1+T1)·p_ML(w2), where T1 = distinct
    successor types — the diversity-based interpolation filling the
    smoothing-family slot between `deleted_interpolation` (held-out λ)
    and `kn_perplexity` (absolute discounting). Trained on the full
    corpus and scored per source, so every scored bigram is in-model.
    Same discipline as the other LMs: per-TYPE log-probs in
    once-rounded integer micro-nats, per-source totals as exact
    count-weighted int64 sums, one exp at the end. Bigram-grain model
    agg + (source,bigram) census — two shuffles over the corpus."""
    docs = _docs(spark, sf_dir)
    base = docs.select("doc_id", "source", T.tokenize(F.col("text")).alias("toks"))
    uni = base.select(F.explode("toks").alias("w")).groupBy("w").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    tot = uni.agg(F.sum("c").cast("long").alias("n"))
    bi = base.select(
        "source",
        F.explode(
            F.zip_with(
                F.slice(F.col("toks"), 1, F.greatest(F.size("toks") - 1, F.lit(0))),
                F.slice(F.col("toks"), 2, F.greatest(F.size("toks") - 1, F.lit(0))),
                lambda x, y: F.struct(x.alias("w1"), y.alias("w2")),
            )
        ).alias("p"),
    ).select("source", F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
    model = bi.groupBy("w1", "w2").agg(F.count(F.lit(1)).cast("long").alias("cb"))
    ctx = model.groupBy("w1").agg(
        F.sum("cb").cast("long").alias("cw"), F.count(F.lit(1)).cast("long").alias("t1")
    )
    lp = (
        model.join(ctx, "w1")
        .join(uni.withColumnRenamed("w", "w2").withColumnRenamed("c", "c2"), "w2")
        .crossJoin(F.broadcast(tot))
        .select(
            "w1", "w2",
            F.round(
                F.log(
                    F.col("cb") / (F.col("cw") + F.col("t1")).cast("double")
                    + (F.col("t1") / (F.col("cw") + F.col("t1")).cast("double"))
                    * (F.col("c2") / F.col("n").cast("double"))
                ) * F.lit(1e6),
                0,
            ).cast("long").alias("lp_unats"),
        )
    )
    sb = bi.groupBy("source", "w1", "w2").agg(F.count(F.lit(1)).cast("long").alias("sc"))
    per_src = sb.join(lp, ["w1", "w2"]).groupBy("source").agg(
        F.sum("sc").cast("long").alias("n_bigrams"),
        F.sum(F.col("sc") * F.col("lp_unats")).cast("long").alias("sum_lp"),
    )
    avg = F.round((F.col("sum_lp").cast("double") / F.col("n_bigrams")) / F.lit(1e6), 6)
    return per_src.select(
        "source", "n_bigrams",
        avg.alias("avg_lp"),
        F.round(F.exp(-avg), 6).alias("ppl"),
    ).orderBy("source")



_CCF_MAXLAG = 7



def _ccf_sql() -> str:
    return f"""WITH daily AS (
         SELECT datediff('day', DATE '2024-01-01', date_trunc('day', ts)::DATE)::BIGINT AS dd,
                sum((event_type = 'click')::INT)::BIGINT AS x,
                sum((event_type = 'purchase')::INT)::BIGINT AS y
         FROM events GROUP BY dd),
       lags AS (SELECT unnest(generate_series(-{_CCF_MAXLAG}, {_CCF_MAXLAG}))::BIGINT AS lag),
       pairs AS (
         SELECT l.lag, a.x, b.y
         FROM lags l JOIN daily a ON true JOIN daily b ON b.dd = a.dd + l.lag),
       mo AS (
         SELECT lag, count(*)::BIGINT AS n,
                sum(x)::BIGINT AS sx, sum(y)::BIGINT AS sy,
                sum(x * y)::BIGINT AS sxy, sum(x * x)::BIGINT AS sxx,
                sum(y * y)::BIGINT AS syy
         FROM pairs GROUP BY lag),
       r AS (
         SELECT lag, n,
                round((n * sxy - sx * sy)::DOUBLE
                      / sqrt((n * sxx - sx * sx)::DOUBLE * (n * syy - sy * sy)::DOUBLE), 6) AS ccf
         FROM mo),
       pk AS (
         SELECT lag, n, ccf,
                row_number() OVER (ORDER BY abs(ccf) DESC, lag) AS pr
         FROM r)
       SELECT lag, n AS n_overlap, ccf, (pr = 1) AS is_peak
       FROM pk ORDER BY lag"""



@query("ccf_peak_lag", _ccf_sql())
def q_ccf_peak_lag(spark, sf_dir):
    """Cross-correlation function between the daily click and purchase
    series at lags −7..+7 (Box & Jenkins ch. 11 prewhitening
    companion): ccf(L) = corr(clicks_t, purchases_{t+L}), the
    lead/lag-structure diagnostic behind `granger_lag1`'s F-test —
    the peak lag (flagged deterministically, |ccf| then lag as
    tiebreak) estimates the click→purchase delay. Per-lag moments are
    exact BIGINT sums over the overlap window built by a 15-row lag
    spine joined against the day census — the correlation is computed
    once per lag from one fused census row, and the input-sized work
    is a single day-grain aggregation."""
    ev = _events(spark, sf_dir)
    day = F.date_trunc("day", F.col("ts")).cast("date")
    dd = F.datediff(day, F.lit("2024-01-01").cast("date")).cast("long")
    daily = ev.groupBy(dd.alias("dd")).agg(
        F.sum((F.col("event_type") == "click").cast("int")).cast("long").alias("x"),
        F.sum((F.col("event_type") == "purchase").cast("int")).cast("long").alias("y"),
    ).stableCheckpoint(eager=True)
    lags = spark.range(-_CCF_MAXLAG, _CCF_MAXLAG + 1).select(F.col("id").cast("long").alias("lag"))
    a = daily.alias("a")
    b = daily.alias("b")
    pairs = (
        lags.crossJoin(a)
        .join(b, F.col("b.dd") == F.col("a.dd") + F.col("lag"))
        .select("lag", F.col("a.x").alias("x"), F.col("b.y").alias("y"))
    )
    mo = pairs.groupBy("lag").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("long").alias("syy"),
    )
    r = mo.select(
        "lag", "n",
        F.round(
            (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
            / F.sqrt(
                (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
                * (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).cast("double")
            ),
            6,
        ).alias("ccf"),
    )
    pk = r.select(
        "lag", "n", "ccf",
        F.row_number().over(Window.orderBy(F.abs(F.col("ccf")).desc(), "lag")).alias("pr"),
    )
    return pk.select(
        "lag", F.col("n").alias("n_overlap"), "ccf", (F.col("pr") == 1).alias("is_peak")
    ).orderBy("lag")



def _te_sql() -> str:
    def med(col):
        return f"""(SELECT {col} FROM (
             SELECT {col}, row_number() OVER (ORDER BY {col}, dd) AS rn,
                    count(*) OVER () AS ng
             FROM daily) WHERE rn = (ng + 1) // 2)"""

    return f"""WITH daily AS (
         SELECT datediff('day', DATE '2024-01-01', date_trunc('day', ts)::DATE)::BIGINT AS dd,
                sum((event_type = 'click')::INT)::BIGINT AS c,
                sum((event_type = 'purchase')::INT)::BIGINT AS p
         FROM events GROUP BY dd),
       sym AS (
         SELECT row_number() OVER (ORDER BY dd)::BIGINT AS t,
                (c > {med('c')})::BIGINT AS cs,
                (p > {med('p')})::BIGINT AS ps
         FROM daily),
       tr AS (
         SELECT a.cs AS x, a.ps AS y, b.ps AS y1, a.cs AS xr, a.ps AS yr, b.cs AS x1
         FROM sym a JOIN sym b ON b.t = a.t + 1),
       fwd AS (
         SELECT sum(t_fp)::BIGINT AS s_fp, sum(c)::BIGINT AS n FROM (
           SELECT c, round(1e9 * c * ln(c::DOUBLE * ny / (nyx::DOUBLE * nyy1)), 0)::BIGINT AS t_fp
           FROM (
             SELECT y1, y, x, count(*)::BIGINT AS c,
                    sum(count(*)) OVER (PARTITION BY y, x)::BIGINT AS nyx,
                    sum(count(*)) OVER (PARTITION BY y1, y)::BIGINT AS nyy1,
                    sum(count(*)) OVER (PARTITION BY y)::BIGINT AS ny
             FROM tr GROUP BY y1, y, x))),
       rev AS (
         SELECT sum(t_fp)::BIGINT AS s_fp FROM (
           SELECT round(1e9 * c * ln(c::DOUBLE * ny / (nyx::DOUBLE * nyy1)), 0)::BIGINT AS t_fp
           FROM (
             SELECT x1 AS y1, xr AS y, yr AS x, count(*)::BIGINT AS c,
                    sum(count(*)) OVER (PARTITION BY xr, yr)::BIGINT AS nyx,
                    sum(count(*)) OVER (PARTITION BY x1, xr)::BIGINT AS nyy1,
                    sum(count(*)) OVER (PARTITION BY xr)::BIGINT AS ny
             FROM tr GROUP BY x1, xr, yr)))
       SELECT fwd.n AS n_transitions,
              round(fwd.s_fp / (fwd.n * 1e9), 6) AS te_click_to_purchase,
              round(rev.s_fp / (fwd.n * 1e9), 6) AS te_purchase_to_click
       FROM fwd, rev"""



@query("transfer_entropy", _te_sql())
def q_transfer_entropy(spark, sf_dir):
    """Transfer entropy between the median-binarized daily click and
    purchase series, both directions (Schreiber, PRL 2000):
    TE_{X→Y} = Σ p(y_{t+1},y_t,x_t)·ln[p(y_{t+1}|y_t,x_t)/p(y_{t+1}|y_t)]
    — the directed, model-free counterpart of `granger_lag1` (Granger
    causality equals TE only under Gaussian assumptions; this plug-in
    estimator sees any nonlinear coupling). Binarization thresholds
    are deterministic lower medians; the 8-cell joint histogram comes
    from one transition census, conditional ratios are pure integer-
    count ratios, and each cell's count-weighted log is re-quantized
    to 1e-9 fixed point so both direction sums are exact int64. Day
    census → ≤8-row probability grain; nothing downstream scales with
    corpus size."""
    ev = _events(spark, sf_dir)
    day = F.date_trunc("day", F.col("ts")).cast("date")
    dd = F.datediff(day, F.lit("2024-01-01").cast("date")).cast("long")
    daily = ev.groupBy(dd.alias("dd")).agg(
        F.sum((F.col("event_type") == "click").cast("int")).cast("long").alias("c"),
        F.sum((F.col("event_type") == "purchase").cast("int")).cast("long").alias("p"),
    ).stableCheckpoint(eager=True)

    def med(df, col):
        w = Window.orderBy(col, "dd")
        return (
            df.select(col, "dd", F.row_number().over(w).alias("rn"),
                      F.count(F.lit(1)).over(Window.partitionBy()).alias("ng"))
            .where(F.col("rn") == F.floor((F.col("ng") + 1) / 2))
            .select(F.col(col).alias(f"med_{col}"))
        )

    sym = (
        daily.crossJoin(F.broadcast(med(daily, "c")))
        .crossJoin(F.broadcast(med(daily, "p")))
        .select(
            F.row_number().over(Window.orderBy("dd")).cast("long").alias("t"),
            (F.col("c") > F.col("med_c")).cast("long").alias("cs"),
            (F.col("p") > F.col("med_p")).cast("long").alias("ps"),
        )
    )
    a, b = sym.alias("a"), sym.alias("b")
    tr = a.join(b, F.col("b.t") == F.col("a.t") + 1).select(
        F.col("a.cs").alias("x"), F.col("a.ps").alias("y"), F.col("b.ps").alias("y1"),
        F.col("b.cs").alias("x1"),
    ).stableCheckpoint(eager=True)

    def te(df, y1c, yc, xc):
        cells = df.groupBy(y1c, yc, xc).agg(F.count(F.lit(1)).cast("long").alias("cnt"))
        nyx = Window.partitionBy(yc, xc)
        nyy1 = Window.partitionBy(y1c, yc)
        ny = Window.partitionBy(yc)
        t_fp = F.round(
            F.lit(1e9) * F.col("cnt")
            * F.log(
                F.col("cnt").cast("double") * F.sum("cnt").over(ny)
                / (F.sum("cnt").over(nyx).cast("double") * F.sum("cnt").over(nyy1))
            ),
            0,
        ).cast("long")
        return cells.select(F.col("cnt"), t_fp.alias("t_fp")).agg(
            F.sum("t_fp").cast("long").alias("s_fp"), F.sum("cnt").cast("long").alias("n")
        )

    fwd = te(tr, "y1", "y", "x").select(F.col("s_fp").alias("f_fp"), "n")
    rev = te(tr, "x1", "x", "y").select(F.col("s_fp").alias("r_fp"))
    return fwd.crossJoin(rev).select(
        F.col("n").alias("n_transitions"),
        F.round(F.col("f_fp") / (F.col("n") * F.lit(1e9)), 6).alias("te_click_to_purchase"),
        F.round(F.col("r_fp") / (F.col("n") * F.lit(1e9)), 6).alias("te_purchase_to_click"),
    )



_DFA_SCALES = (4, 8, 16)



def _dfa_sql() -> str:
    scales = ", ".join(str(s) for s in _DFA_SCALES)
    return f"""WITH daily AS (
         SELECT datediff('day', DATE '2024-01-01', date_trunc('day', ts)::DATE)::BIGINT AS dd,
                count(*)::BIGINT AS x
         FROM events GROUP BY dd),
       idx AS (
         SELECT row_number() OVER (ORDER BY dd)::BIGINT AS t, x,
                sum(x) OVER (ORDER BY dd ROWS UNBOUNDED PRECEDING)::BIGINT AS pf,
                count(*) OVER ()::BIGINT AS n, sum(x) OVER ()::BIGINT AS sx
         FROM daily),
       prof AS (SELECT t, n, (n * pf - t * sx)::BIGINT AS z FROM idx),
       scales AS (SELECT unnest([{scales}])::BIGINT AS s),
       boxed AS (
         SELECT sc.s, (p.t - 1) // sc.s AS box, p.t, p.z, p.n
         FROM prof p, scales sc),
       bm AS (
         SELECT s, box, max(n) AS n, count(*)::BIGINT AS k,
                sum(z)::BIGINT AS sz, sum(t)::BIGINT AS st,
                sum(z * t)::BIGINT AS szt, sum(t * t)::BIGINT AS stt,
                sum(z * z)::BIGINT AS szz
         FROM boxed GROUP BY s, box),
       rss AS (
         SELECT s, n, k,
                (szz - sz::DOUBLE * sz / k)
                  - (szt - st::DOUBLE * sz / k) * (szt - st::DOUBLE * sz / k)
                    / (stt - st::DOUBLE * st / k) AS r
         FROM bm WHERE k = s),
       fl AS (
         SELECT s, max(n) AS n, count(*)::BIGINT AS n_boxes,
                sum(round(r, 0)::BIGINT)::BIGINT AS rs_fp
         FROM rss GROUP BY s),
       fs AS (
         SELECT s, n_boxes,
                sqrt(rs_fp::DOUBLE / (n::DOUBLE * n * s * n_boxes)) AS f
         FROM fl),
       al AS (
         SELECT count(*)::BIGINT AS m, sum(ln(s::DOUBLE)) AS sl, sum(ln(f)) AS sf,
                sum(ln(s::DOUBLE) * ln(f)) AS slf, sum(ln(s::DOUBLE) * ln(s::DOUBLE)) AS sll
         FROM fs)
       SELECT fs.s AS scale, fs.n_boxes, round(fs.f, 6) AS fluctuation,
              round((al.m * al.slf - al.sl * al.sf) / (al.m * al.sll - al.sl * al.sl), 6) AS alpha
       FROM fs, al ORDER BY scale"""



@query("dfa_alpha", _dfa_sql())
def q_dfa_alpha(spark, sf_dir):
    """Detrended fluctuation analysis of daily event volume (Peng et
    al., Phys. Rev. E 1994): integrate the mean-centered series, split
    into boxes of s ∈ {4,8,16} days, least-squares-detrend each box,
    and fit the log-log slope α of the RMS fluctuation F(s) — the
    long-range-correlation exponent that cross-checks
    `hurst_exponent`'s R/S estimate (α≈H for stationary series) while
    being robust to the linear trends R/S misreads. The profile is
    kept EXACT by the n-scaling trick z_t = n·cumsum − t·total
    (integer; the /n is deferred into F(s)'s denominator), per-box
    RSS comes from exact BIGINT moments with two rational divisions,
    and box RSS values are integer-rounded before the cross-box sum
    (absolute error <0.5 on ~1e12 magnitudes, identical both
    engines). Only the day census touches the input. The 3-point
    log-log OLS runs on one broadcast row."""
    ev = _events(spark, sf_dir)
    day = F.date_trunc("day", F.col("ts")).cast("date")
    dd = F.datediff(day, F.lit("2024-01-01").cast("date")).cast("long")
    daily = ev.groupBy(dd.alias("dd")).agg(F.count(F.lit(1)).cast("long").alias("x"))
    wo = Window.orderBy("dd")
    wall = Window.partitionBy()
    idx = daily.select(
        F.row_number().over(wo).cast("long").alias("t"),
        F.sum("x").over(wo.rowsBetween(Window.unboundedPreceding, 0)).cast("long").alias("pf"),
        F.count(F.lit(1)).over(wall).cast("long").alias("n"),
        F.sum("x").over(wall).cast("long").alias("sx"),
    )
    prof = idx.select("t", "n", (F.col("n") * F.col("pf") - F.col("t") * F.col("sx")).cast("long").alias("z"))
    scales = spark.createDataFrame([(s,) for s in _DFA_SCALES], "s long")
    boxed = prof.crossJoin(F.broadcast(scales)).select(
        "s", F.floor((F.col("t") - 1) / F.col("s")).alias("box"), "t", "z", "n"
    )
    bm = boxed.groupBy("s", "box").agg(
        F.max("n").alias("n"), F.count(F.lit(1)).cast("long").alias("k"),
        F.sum("z").cast("long").alias("sz"), F.sum("t").cast("long").alias("st"),
        F.sum(F.col("z") * F.col("t")).cast("long").alias("szt"),
        F.sum(F.col("t") * F.col("t")).cast("long").alias("stt"),
        F.sum(F.col("z") * F.col("z")).cast("long").alias("szz"),
    )
    r = (
        (F.col("szz") - F.col("sz").cast("double") * F.col("sz") / F.col("k"))
        - (F.col("szt") - F.col("st").cast("double") * F.col("sz") / F.col("k"))
        * (F.col("szt") - F.col("st").cast("double") * F.col("sz") / F.col("k"))
        / (F.col("stt") - F.col("st").cast("double") * F.col("st") / F.col("k"))
    )
    rss = bm.where(F.col("k") == F.col("s")).select("s", "n", r.alias("r"))
    fl = rss.groupBy("s").agg(
        F.max("n").alias("n"), F.count(F.lit(1)).cast("long").alias("n_boxes"),
        F.sum(F.round(F.col("r"), 0).cast("long")).cast("long").alias("rs_fp"),
    )
    fs = fl.select(
        "s", "n_boxes",
        F.sqrt(F.col("rs_fp").cast("double") / (F.col("n").cast("double") * F.col("n") * F.col("s") * F.col("n_boxes"))).alias("f"),
    ).stableCheckpoint(eager=True)
    ls = F.log(F.col("s").cast("double"))
    al = fs.agg(
        F.count(F.lit(1)).cast("long").alias("m"),
        F.sum(ls).alias("sl"),
        F.sum(F.log("f")).alias("sf"),
        F.sum(ls * F.log("f")).alias("slf"),
        F.sum(ls * ls).alias("sll"),
    )
    return fs.crossJoin(F.broadcast(al)).select(
        F.col("s").alias("scale"), "n_boxes",
        F.round(F.col("f"), 6).alias("fluctuation"),
        F.round(
            (F.col("m") * F.col("slf") - F.col("sl") * F.col("sf"))
            / (F.col("m") * F.col("sll") - F.col("sl") * F.col("sl")),
            6,
        ).alias("alpha"),
    ).orderBy("scale")



@query(
    "yule_k",
    """WITH toks AS (
         SELECT source, unnest(string_split(trim(text), ' ')) AS token FROM documents),
       tc AS (SELECT source, token, count(*)::BIGINT AS c FROM toks GROUP BY 1, 2),
       agg AS (
         SELECT source, sum(c)::BIGINT AS n, count(*)::BIGINT AS v,
                sum(c * c)::BIGINT AS s2
         FROM tc GROUP BY source)
       SELECT source, n AS n_tokens, v AS n_types,
              round(10000.0 * (s2 - n) / (n::DOUBLE * n), 6) AS yule_k,
              round(ln(v::DOUBLE) / ln(n::DOUBLE), 6) AS herdan_c,
              round(v / sqrt(n::DOUBLE), 6) AS guiraud_r
       FROM agg ORDER BY source""",
)
def q_yule_k(spark, sf_dir):
    """Lexical-richness profile per source: Yule's characteristic K
    (Yule, 'Statistical Study of Literary Vocabulary' 1944) —
    10⁴·(Σc²−N)/N² over the token frequency spectrum, the repeat-rate
    statistic that unlike raw TTR is (asymptotically) text-length
    invariant — plus Herdan's C (ln V/ln N) and Guiraud's R (V/√N),
    the two classical length-corrected type-token ratios. Complements
    `mattr_diversity` (windowed TTR) and `heaps_law` (growth curve)
    with closed-form spectrum constants. Σc² rides the same
    (source,token) census every richness metric shares; all three
    statistics are single divisions over exact BIGINT sums."""
    d = _docs(spark, sf_dir)
    tc = d.select("source", F.explode(T.tokenize(F.col("text"))).alias("token")).groupBy(
        "source", "token"
    ).agg(F.count(F.lit(1)).cast("long").alias("c"))
    agg = tc.groupBy("source").agg(
        F.sum("c").cast("long").alias("n"),
        F.count(F.lit(1)).cast("long").alias("v"),
        F.sum(F.col("c") * F.col("c")).cast("long").alias("s2"),
    )
    return agg.select(
        "source", F.col("n").alias("n_tokens"), F.col("v").alias("n_types"),
        F.round(F.lit(10000.0) * (F.col("s2") - F.col("n")) / (F.col("n").cast("double") * F.col("n")), 6).alias("yule_k"),
        F.round(F.log(F.col("v").cast("double")) / F.log(F.col("n").cast("double")), 6).alias("herdan_c"),
        F.round(F.col("v") / F.sqrt(F.col("n").cast("double")), 6).alias("guiraud_r"),
    ).orderBy("source")



_MAHA_TOPK = 20



def _maha_sql() -> str:
    return f"""WITH u AS (
         SELECT user_id,
                sum((event_type = 'click')::INT)::BIGINT AS x,
                sum((event_type = 'purchase')::INT)::BIGINT AS y
         FROM events GROUP BY user_id),
       mo AS (
         SELECT count(*)::BIGINT AS n, sum(x)::BIGINT AS sx, sum(y)::BIGINT AS sy,
                sum(x * x)::BIGINT AS sxx, sum(y * y)::BIGINT AS syy,
                sum(x * y)::BIGINT AS sxy
         FROM u),
       cov AS (
         SELECT n, sx::DOUBLE / n AS mx, sy::DOUBLE / n AS my,
                (sxx - sx::DOUBLE * sx / n) / (n - 1) AS vx,
                (syy - sy::DOUBLE * sy / n) / (n - 1) AS vy,
                (sxy - sx::DOUBLE * sy / n) / (n - 1) AS vxy
         FROM mo),
       d2 AS (
         SELECT u.user_id,
                ((u.x - c.mx) * (u.x - c.mx) * c.vy
                 - 2 * (u.x - c.mx) * (u.y - c.my) * c.vxy
                 + (u.y - c.my) * (u.y - c.my) * c.vx)
                  / (c.vx * c.vy - c.vxy * c.vxy) AS d2
         FROM u, cov c),
       ranked AS (
         SELECT user_id, round(d2, 6) AS d2,
                row_number() OVER (ORDER BY round(d2, 6) DESC, user_id) AS rnk
         FROM d2)
       SELECT rnk::BIGINT AS rnk, user_id, d2
       FROM ranked WHERE rnk <= {_MAHA_TOPK} ORDER BY rnk"""



@query("mahalanobis_outliers", _maha_sql())
def q_mahalanobis_outliers(spark, sf_dir):
    """Top-20 multivariate outliers by squared Mahalanobis distance on
    the per-user (clicks, purchases) plane (Mahalanobis, 1936): the
    covariance-aware distance that flags users whose click/purchase
    MIX is anomalous even when each marginal looks normal — the
    correlated-feature complement of `ecod_scores`' marginal-tail
    method. The 2×2 covariance inverts in closed form, so d² is one
    arithmetic expression over exact BIGINT moments; ranking compares
    the ONCE-rounded d² (ties broken by user_id) so the order is
    bit-deterministic cross-engine. One user census, one broadcast
    moment row, one top-k window."""
    ev = _events(spark, sf_dir)
    u = ev.groupBy("user_id").agg(
        F.sum((F.col("event_type") == "click").cast("int")).cast("long").alias("x"),
        F.sum((F.col("event_type") == "purchase").cast("int")).cast("long").alias("y"),
    )
    mo = u.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("long").alias("syy"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
    )
    cov = mo.select(
        "n",
        (F.col("sx").cast("double") / F.col("n")).alias("mx"),
        (F.col("sy").cast("double") / F.col("n")).alias("my"),
        ((F.col("sxx") - F.col("sx").cast("double") * F.col("sx") / F.col("n")) / (F.col("n") - 1)).alias("vx"),
        ((F.col("syy") - F.col("sy").cast("double") * F.col("sy") / F.col("n")) / (F.col("n") - 1)).alias("vy"),
        ((F.col("sxy") - F.col("sx").cast("double") * F.col("sy") / F.col("n")) / (F.col("n") - 1)).alias("vxy"),
    )
    d2 = u.crossJoin(F.broadcast(cov)).select(
        "user_id",
        (
            (
                (F.col("x") - F.col("mx")) * (F.col("x") - F.col("mx")) * F.col("vy")
                - F.lit(2) * (F.col("x") - F.col("mx")) * (F.col("y") - F.col("my")) * F.col("vxy")
                + (F.col("y") - F.col("my")) * (F.col("y") - F.col("my")) * F.col("vx")
            )
            / (F.col("vx") * F.col("vy") - F.col("vxy") * F.col("vxy"))
        ).alias("d2"),
    )
    ranked = d2.select(
        "user_id", F.round("d2", 6).alias("d2")
    ).select(
        "user_id", "d2",
        F.row_number().over(Window.orderBy(F.col("d2").desc(), "user_id")).cast("long").alias("rnk"),
    )
    return ranked.where(F.col("rnk") <= _MAHA_TOPK).select("rnk", "user_id", "d2").orderBy("rnk")



_IPF_ITERS = 8



def _ipf_sql() -> str:
    # unroll the row/column scaling iterations as alternating CTEs; the
    # weight is re-quantized to integer ppm after every step, so both
    # engines walk the same exact int64 trajectory
    steps = []
    prev = "w0"
    for it in range(_IPF_ITERS):
        r, c = f"r{it}", f"c{it}"
        steps.append(
            f"""{r} AS (
         SELECT wd, event_type,
                round(w::DOUBLE * (SELECT tr FROM tgt)
                      / sum(w) OVER (PARTITION BY wd), 0)::BIGINT AS w
         FROM {prev})"""
        )
        steps.append(
            f"""{c} AS (
         SELECT wd, event_type,
                round(w::DOUBLE * (SELECT tc FROM tgt)
                      / sum(w) OVER (PARTITION BY event_type), 0)::BIGINT AS w
         FROM {r})"""
        )
        prev = c
    body = ",\n       ".join(steps)
    return f"""WITH grid AS (
         SELECT (datediff('day', DATE '2024-01-01', date_trunc('day', ts)::DATE) % 7)::BIGINT AS wd,
                event_type, count(*)::BIGINT AS n
         FROM events GROUP BY wd, event_type),
       tot AS (SELECT sum(n)::BIGINT AS t, count(DISTINCT wd)::BIGINT AS nr,
                      count(DISTINCT event_type)::BIGINT AS nc
               FROM grid),
       tgt AS (SELECT 1000000.0 * t / nr AS tr, 1000000.0 * t / nc AS tc FROM tot),
       w0 AS (SELECT wd, event_type, n * 1000000 AS w FROM grid),
       {body}
       SELECT g.wd, g.event_type, g.n AS observed, f.w AS weight_ppm,
              round(f.w / (1000000.0 * g.n), 6) AS adj_factor
       FROM grid g JOIN {prev} f USING (wd, event_type)
       ORDER BY wd, event_type"""



@query("ipf_raking", _ipf_sql())
def q_ipf_raking(spark, sf_dir):
    """Iterative proportional fitting / raking (Deming & Stephan, AMS
    1940) of the weekday × event-type contingency table to UNIFORM
    margins: 8 alternating row/column scaling passes produce the
    calibration weights that survey post-stratification (`kish_weights`)
    consumes when only margins — not the joint — are known. Every
    half-step re-quantizes the weight to integer ppm, so both engines
    walk the SAME exact int64 trajectory and the classic IPF
    convergence (within ppm) is bit-reproducible; margins and targets
    derive from one exact census. The grid is (7 × #types) — after the
    single input-sized aggregation the whole fit is constant-size, and
    the Spark loop stableCheckpoints nothing because the lineage is 16
    window ops over ≤70 rows."""
    ev = _events(spark, sf_dir)
    day = F.date_trunc("day", F.col("ts")).cast("date")
    dd = F.datediff(day, F.lit("2024-01-01").cast("date")).cast("long")
    grid = ev.groupBy((dd % 7).alias("wd"), "event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    tot = grid.agg(
        F.sum("n").cast("long").alias("t"),
        F.countDistinct("wd").cast("long").alias("nr"),
        F.countDistinct("event_type").cast("long").alias("nc"),
    )
    tgt = tot.select(
        (F.lit(1000000.0) * F.col("t") / F.col("nr")).alias("tr"),
        (F.lit(1000000.0) * F.col("t") / F.col("nc")).alias("tc"),
    )
    w = grid.crossJoin(F.broadcast(tgt)).select(
        "wd", "event_type", "n", "tr", "tc", (F.col("n") * F.lit(1000000)).cast("long").alias("w")
    )
    for _ in range(_IPF_ITERS):
        wr = Window.partitionBy("wd")
        w = w.withColumn(
            "w",
            F.round(F.col("w").cast("double") * F.col("tr") / F.sum("w").over(wr), 0).cast("long"),
        )
        wc = Window.partitionBy("event_type")
        w = w.withColumn(
            "w",
            F.round(F.col("w").cast("double") * F.col("tc") / F.sum("w").over(wc), 0).cast("long"),
        )
    return w.select(
        "wd", "event_type", F.col("n").alias("observed"),
        F.col("w").alias("weight_ppm"),
        F.round(F.col("w") / (F.lit(1000000.0) * F.col("n")), 6).alias("adj_factor"),
    ).orderBy("wd", "event_type")



_YAKE_TOPK = 5



def _yake_sql() -> str:
    return f"""WITH toks AS (
         SELECT doc_id,
                unnest(range(len(string_split(trim(text), ' '))))::BIGINT AS pos,
                unnest(string_split(trim(text), ' ')) AS tok
         FROM documents),
       st AS (
         SELECT doc_id, pos, tok,
                coalesce(sum((tok = 'the')::INT) OVER (
                  PARTITION BY doc_id ORDER BY pos
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::BIGINT AS sidx,
                lag(tok) OVER (PARTITION BY doc_id ORDER BY pos) AS ltok,
                lead(tok) OVER (PARTITION BY doc_id ORDER BY pos) AS rtok
         FROM toks),
       term AS (
         SELECT doc_id, tok, count(*)::BIGINT AS tf,
                count(DISTINCT ltok)::BIGINT AS dl,
                count(DISTINCT rtok)::BIGINT AS dr,
                count(DISTINCT sidx)::BIGINT AS sf
         FROM st GROUP BY doc_id, tok),
       medp AS (
         SELECT doc_id, tok, pos + 1 AS med1 FROM (
           SELECT doc_id, tok, pos,
                  row_number() OVER (PARTITION BY doc_id, tok ORDER BY pos) AS rn,
                  count(*) OVER (PARTITION BY doc_id, tok) AS tf
           FROM st) WHERE rn = (tf + 1) // 2),
       docs AS (
         SELECT doc_id, count(*)::BIGINT AS v, sum(tf)::BIGINT AS stf,
                sum(tf * tf)::BIGINT AS stf2, max(tf)::BIGINT AS max_tf
         FROM term GROUP BY doc_id),
       sents AS (
         SELECT doc_id, count(DISTINCT sidx)::BIGINT AS n_sents FROM st GROUP BY doc_id),
       feat AS (
         SELECT t.doc_id, t.tok,
                ln(3.0 + m.med1) AS wpos,
                (1.0 + (t.dl::DOUBLE / t.tf + t.dr::DOUBLE / t.tf) * t.tf / d.max_tf) AS wrel,
                t.tf / (d.stf::DOUBLE / d.v
                        + sqrt((d.stf2 - d.stf::DOUBLE * d.stf / d.v) / (d.v - 1))) AS wfreq,
                t.sf::DOUBLE / s.n_sents AS wdif
         FROM term t JOIN medp m USING (doc_id, tok)
              JOIN docs d ON d.doc_id = t.doc_id AND d.v >= 2
              JOIN sents s ON s.doc_id = t.doc_id),
       scored AS (
         SELECT doc_id, tok,
                round((wrel * wpos) / (wfreq / wrel + wdif / wrel), 6) AS score
         FROM feat),
       ranked AS (
         SELECT doc_id, tok, score,
                row_number() OVER (PARTITION BY doc_id ORDER BY score, tok)::BIGINT AS rnk
         FROM scored)
       SELECT doc_id, rnk, tok AS term, score
       FROM ranked WHERE rnk <= {_YAKE_TOPK}"""



@query("yake_keywords", _yake_sql())
def q_yake_keywords(spark, sf_dir):
    """YAKE unsupervised keyword extraction (Campos et al., Inf. Sci.
    2020), top-5 lowest-score terms per document from the paper's
    per-term statistical features — position (ln(3+median 1-based
    position), lower-median so it stays integer), frequency normalized
    by doc mean+std, left/right neighbor diversity feeding the
    relatedness penalty WRel, and sentence dispersion — composed with
    the paper's S(t) formula (the casing feature is identically zero
    on this lowercase corpus and is dropped). Sentence indices derive
    from the same deterministic 'the'-boundary rule as
    `sentence_split`, computed as a running boundary count — no
    string reassembly. Everything reduces over ONE positional token
    census with doc-partitioned windows (neighbor lag/lead ride the
    same shuffle); scores are once-rounded before the per-doc top-k so
    ranking is bit-deterministic. The third keyword family next to
    `textrank_keywords` (graph) and `rake_keywords` (phrase-run)."""
    d = _docs(spark, sf_dir)
    toks = d.select(
        "doc_id", F.posexplode(T.tokenize(F.col("text"))).alias("pos", "tok")
    ).withColumn("pos", F.col("pos").cast("long"))
    wd = Window.partitionBy("doc_id").orderBy("pos")
    st = toks.select(
        "doc_id", "pos", "tok",
        F.coalesce(
            F.sum((F.col("tok") == "the").cast("int")).over(
                wd.rowsBetween(Window.unboundedPreceding, -1)
            ),
            F.lit(0),
        ).cast("long").alias("sidx"),
        F.lag("tok").over(wd).alias("ltok"),
        F.lead("tok").over(wd).alias("rtok"),
    ).stableCheckpoint(eager=True)
    term = st.groupBy("doc_id", "tok").agg(
        F.count(F.lit(1)).cast("long").alias("tf"),
        F.countDistinct("ltok").cast("long").alias("dl"),
        F.countDistinct("rtok").cast("long").alias("dr"),
        F.countDistinct("sidx").cast("long").alias("sf"),
    )
    wmt = Window.partitionBy("doc_id", "tok").orderBy("pos")
    wct = Window.partitionBy("doc_id", "tok")
    medp = (
        st.select(
            "doc_id", "tok", "pos",
            F.row_number().over(wmt).alias("rn"),
            F.count(F.lit(1)).over(wct).alias("tf"),
        )
        .where(F.col("rn") == F.floor((F.col("tf") + 1) / 2))
        .select("doc_id", "tok", (F.col("pos") + 1).alias("med1"))
    )
    docs_m = term.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("v"),
        F.sum("tf").cast("long").alias("stf"),
        F.sum(F.col("tf") * F.col("tf")).cast("long").alias("stf2"),
        F.max("tf").cast("long").alias("max_tf"),
    ).where(F.col("v") >= 2)
    sents = st.groupBy("doc_id").agg(F.countDistinct("sidx").cast("long").alias("n_sents"))
    wrel = F.lit(1.0) + (
        F.col("dl").cast("double") / F.col("tf") + F.col("dr").cast("double") / F.col("tf")
    ) * F.col("tf") / F.col("max_tf")
    wfreq = F.col("tf") / (
        F.col("stf").cast("double") / F.col("v")
        + F.sqrt((F.col("stf2") - F.col("stf").cast("double") * F.col("stf") / F.col("v")) / (F.col("v") - 1))
    )
    feat = (
        term.join(medp, ["doc_id", "tok"])
        .join(docs_m, "doc_id")
        .join(sents, "doc_id")
        .select(
            "doc_id", "tok",
            F.log(F.lit(3.0) + F.col("med1")).alias("wpos"),
            wrel.alias("wrel"),
            wfreq.alias("wfreq"),
            (F.col("sf").cast("double") / F.col("n_sents")).alias("wdif"),
        )
    )
    scored = feat.select(
        "doc_id", "tok",
        F.round(
            (F.col("wrel") * F.col("wpos")) / (F.col("wfreq") / F.col("wrel") + F.col("wdif") / F.col("wrel")),
            6,
        ).alias("score"),
    )
    wr = Window.partitionBy("doc_id").orderBy("score", "tok")
    return (
        scored.select("doc_id", "tok", "score", F.row_number().over(wr).cast("long").alias("rnk"))
        .where(F.col("rnk") <= _YAKE_TOPK)
        .select("doc_id", "rnk", F.col("tok").alias("term"), "score")
    )



def _tri_entropy_sql() -> str:
    return """WITH tris AS (
         SELECT source, substr(trim(text), i + 1, 3) AS tri
         FROM documents, unnest(range(len(trim(text)) - 2)) AS u(i)
         WHERE len(trim(text)) >= 3),
       sc AS (SELECT source, tri, count(*)::BIGINT AS c FROM tris GROUP BY 1, 2),
       sm AS (SELECT source, sum(c)::BIGINT AS m FROM sc GROUP BY source),
       gc AS (SELECT tri, sum(c)::BIGINT AS g FROM sc GROUP BY tri),
       gt AS (SELECT sum(c)::BIGINT AS gm FROM sc),
       terms AS (
         SELECT sc.source, sm.m,
                round(1e6 * sc.c * ln(sc.c::DOUBLE / sm.m), 0)::BIGINT AS h_fp,
                round(1e6 * sc.c * ln(gc.g::DOUBLE / gt.gm), 0)::BIGINT AS ce_fp
         FROM sc JOIN sm USING (source) JOIN gc USING (tri) CROSS JOIN gt),
       agg AS (
         SELECT source, max(m) AS m,
                sum(h_fp)::BIGINT AS sh, sum(ce_fp)::BIGINT AS sce
         FROM terms GROUP BY source)
       SELECT source, m AS n_trigrams,
              round(-sh / (m * 1e6), 6) AS entropy,
              round(-sce / (m * 1e6), 6) AS cross_entropy,
              round((sh - sce) / (m * 1e6), 6) AS kl_vs_corpus
       FROM agg ORDER BY source"""



@query("char_trigram_entropy", _tri_entropy_sql())
def q_char_trigram_entropy(spark, sf_dir):
    """Character-trigram entropy profile per source: plug-in Shannon
    entropy of each source's trigram distribution, cross-entropy under
    the corpus-wide model, and their gap KL(source‖corpus) — the
    compressibility / distinctiveness signal behind n-gram language-ID
    and the CCNet-style 'how unusual is this slice' ranking
    (complements `source_kl` which works on token unigrams). Trigrams
    come from an in-place sliding substr (no string explosion beyond
    the 3-char grain); per-TYPE count-weighted logs are re-quantized
    to 1e-6 fixed point so the three statistics are exact int64 sums
    with one division each. Two shuffles: (source,trigram) census and
    the corpus rollup it rides."""
    d = _docs(spark, sf_dir)
    tris = d.select(
        "source",
        F.explode(
            F.expr("transform(sequence(1, greatest(length(trim(text)) - 2, 0)), i -> substring(trim(text), i, 3))")
        ).alias("tri"),
    )
    sc_ = tris.groupBy("source", "tri").agg(F.count(F.lit(1)).cast("long").alias("c"))
    sm = sc_.groupBy("source").agg(F.sum("c").cast("long").alias("m"))
    gc_ = sc_.groupBy("tri").agg(F.sum("c").cast("long").alias("g"))
    gt = sc_.agg(F.sum("c").cast("long").alias("gm"))
    terms = (
        sc_.join(sm, "source")
        .join(gc_, "tri")
        .crossJoin(F.broadcast(gt))
        .select(
            "source", "m",
            F.round(F.lit(1e6) * F.col("c") * F.log(F.col("c").cast("double") / F.col("m")), 0).cast("long").alias("h_fp"),
            F.round(F.lit(1e6) * F.col("c") * F.log(F.col("g").cast("double") / F.col("gm")), 0).cast("long").alias("ce_fp"),
        )
    )
    agg = terms.groupBy("source").agg(
        F.max("m").alias("m"),
        F.sum("h_fp").cast("long").alias("sh"),
        F.sum("ce_fp").cast("long").alias("sce"),
    )
    return agg.select(
        "source", F.col("m").alias("n_trigrams"),
        F.round(-F.col("sh") / (F.col("m") * F.lit(1e6)), 6).alias("entropy"),
        F.round(-F.col("sce") / (F.col("m") * F.lit(1e6)), 6).alias("cross_entropy"),
        F.round((F.col("sh") - F.col("sce")) / (F.col("m") * F.lit(1e6)), 6).alias("kl_vs_corpus"),
    ).orderBy("source")



def _sentmom_sql() -> str:
    return """WITH toks AS (
         SELECT doc_id,
                unnest(range(len(string_split(trim(text), ' '))))::BIGINT AS pos,
                unnest(string_split(trim(text), ' ')) AS tok
         FROM documents),
       st AS (
         SELECT d.source, t.doc_id,
                coalesce(sum((t.tok = 'the')::INT) OVER (
                  PARTITION BY t.doc_id ORDER BY t.pos
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::BIGINT AS sidx
         FROM toks t JOIN documents d USING (doc_id)),
       sl AS (
         SELECT source, doc_id, sidx, count(*)::BIGINT AS l
         FROM st GROUP BY 1, 2, 3),
       mo AS (
         SELECT source, count(*)::BIGINT AS n, sum(l)::BIGINT AS s1,
                sum(l * l)::BIGINT AS s2, sum(l * l * l)::BIGINT AS s3,
                sum(l * l * l * l)::BIGINT AS s4
         FROM sl GROUP BY source),
       ctr AS (
         SELECT source, n, s1::DOUBLE / n AS mean,
                (s2 - s1::DOUBLE * s1 / n) / n AS m2,
                (s3 - 3.0 * s2 * s1 / n + 2.0 * s1::DOUBLE * s1 * s1 / (n::DOUBLE * n)) / n AS m3,
                (s4 - 4.0 * s3 * s1 / n + 6.0 * s2 * s1::DOUBLE * s1 / (n::DOUBLE * n)
                 - 3.0 * s1::DOUBLE * s1 * s1 * s1 / (n::DOUBLE * n * n)) / n AS m4
         FROM mo)
       SELECT source, n AS n_sentences,
              round(mean, 6) AS mean_len,
              round(sqrt(m2), 6) AS sd_len,
              round(m3 / pow(m2, 1.5), 6) AS skewness,
              round(m4 / (m2 * m2) - 3.0, 6) AS excess_kurtosis
       FROM ctr ORDER BY source"""



@query("sentence_moments", _sentmom_sql())
def q_sentence_moments(spark, sf_dir):
    """Sentence-length distribution shape per source: mean, SD,
    skewness m₃/m₂^1.5 and excess kurtosis m₄/m₂²−3 of token counts
    per sentence — the stylometric shape profile (burstiness of long
    sentences) that `readability` and `lexical_density` don't see
    because they only use first moments. Sentences reuse the
    deterministic boundary rule of `sentence_split`/`yake_keywords`
    as a running count, lengths are an exact integer census, and all
    four central moments expand from exact BIGINT power sums (s1..s4)
    in one pass — s4 of ≤50-token sentences stays ≤6×10⁶ per row, far
    inside int64 at any corpus scale since the per-source sum grows
    only linearly with rows."""
    d = _docs(spark, sf_dir)
    toks = d.select(
        "doc_id", "source", F.posexplode(T.tokenize(F.col("text"))).alias("pos", "tok")
    )
    wd = Window.partitionBy("doc_id").orderBy("pos")
    st = toks.select(
        "source", "doc_id",
        F.coalesce(
            F.sum((F.col("tok") == "the").cast("int")).over(
                wd.rowsBetween(Window.unboundedPreceding, -1)
            ),
            F.lit(0),
        ).cast("long").alias("sidx"),
    )
    sl = st.groupBy("source", "doc_id", "sidx").agg(F.count(F.lit(1)).cast("long").alias("l"))
    mo = sl.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("l").cast("long").alias("s1"),
        F.sum(F.col("l") * F.col("l")).cast("long").alias("s2"),
        F.sum(F.col("l") * F.col("l") * F.col("l")).cast("long").alias("s3"),
        F.sum(F.col("l") * F.col("l") * F.col("l") * F.col("l")).cast("long").alias("s4"),
    )
    n, s1, s2, s3, s4 = (F.col(c) for c in ["n", "s1", "s2", "s3", "s4"])
    nd = n.cast("double")
    mean = s1.cast("double") / n
    m2 = (s2 - s1.cast("double") * s1 / n) / n
    m3 = (s3 - F.lit(3.0) * s2 * s1 / n + F.lit(2.0) * s1.cast("double") * s1 * s1 / (nd * n)) / n
    m4 = (
        s4 - F.lit(4.0) * s3 * s1 / n + F.lit(6.0) * s2 * s1.cast("double") * s1 / (nd * n)
        - F.lit(3.0) * s1.cast("double") * s1 * s1 * s1 / (nd * n * n)
    ) / n
    return mo.select(
        "source", F.col("n").alias("n_sentences"),
        F.round(mean, 6).alias("mean_len"),
        F.round(F.sqrt(m2), 6).alias("sd_len"),
        F.round(m3 / F.pow(m2, F.lit(1.5)), 6).alias("skewness"),
        F.round(m4 / (m2 * m2) - F.lit(3.0), 6).alias("excess_kurtosis"),
    ).orderBy("source")



_KATZ_ROUNDS = 5

_KATZ_ALPHA = 0.1



def _katz_sql(rounds: int = _KATZ_ROUNDS) -> str:
    parts = [
        _dsg_graph_sql(),
        """sym AS MATERIALIZED (SELECT u, v FROM e0 UNION ALL SELECT v, u FROM e0),
       k0 AS MATERIALIZED (SELECT DISTINCT u AS node, 1000000::BIGINT AS x FROM sym)""",
    ]
    prev = "k0"
    for r in range(1, rounds + 1):
        parts.append(
            f"""k{r} AS MATERIALIZED (
         SELECT s.u AS node,
                (1000000 + round({_KATZ_ALPHA} * sum(xp.x), 0))::BIGINT AS x
         FROM sym s JOIN {prev} xp ON xp.node = s.v
         GROUP BY s.u)"""
        )
        prev = f"k{r}"
    return (
        "WITH " + ",\n       ".join(parts)
        + f"""
       SELECT node, round(x / 1e6, 6) AS katz
       FROM {prev}
       ORDER BY x DESC, node LIMIT 25"""
    )



@query("katz_centrality", _katz_sql())
def q_katz_centrality(spark, sf_dir):
    """Katz centrality by fixed-round iteration (Katz, Psychometrika
    1953): x ← β + α·A·x with α=0.1, β=1, 5 rounds from the uniform
    vector over the part co-purchase graph — the damped walk-count
    prestige that completes the centrality family: degree counts
    length-1 walks, eigenvector (`eigenvector_centrality`) the
    λmax-limit, PageRank (`host_pagerank`) the degree-normalized
    variant; Katz keeps the additive β that gives isolated-ish nodes
    nonzero scores. Same execution scheme as the siblings: each round
    one edge-join + groupBy-sum with the iterate re-rounded to integer
    micro-units, so the fixed-round vector is bit-identical
    cross-engine (unrolled MATERIALIZED oracle). Deterministic top-25."""
    li = load_table(spark, sf_dir, "lineitem")
    op = li.select("l_orderkey", "l_partkey").distinct()
    sized = (
        op.groupBy("l_orderkey").agg(F.count(F.lit(1)).alias("bs"))
        .where((F.col("bs") >= 2) & (F.col("bs") <= 20)).select("l_orderkey")
    )
    b = op.join(sized, "l_orderkey")
    e = (
        b.alias("x").join(b.alias("y"), "l_orderkey")
        .where(F.col("x.l_partkey") < F.col("y.l_partkey"))
        .select(F.col("x.l_partkey").alias("u"), F.col("y.l_partkey").alias("v"))
        .distinct()
    )
    sym = e.unionAll(
        e.select(F.col("v").alias("u"), F.col("u").alias("v"))
    ).stableCheckpoint(eager=True)
    x = sym.select(F.col("u").alias("node")).distinct().withColumn(
        "x", F.lit(1000000).cast("long")
    )
    for _ in range(_KATZ_ROUNDS):
        x = (
            sym.join(x.withColumnRenamed("node", "v"), "v")
            .groupBy(F.col("u").alias("node"))
            .agg((F.lit(1000000) + F.round(F.lit(_KATZ_ALPHA) * F.sum("x"), 0)).cast("long").alias("x"))
            .stableCheckpoint(eager=True)
        )
    return (
        x.orderBy(F.col("x").desc(), "node")
        .limit(25)
        .select("node", F.round(F.col("x") / F.lit(1e6), 6).alias("katz"))
    )



def _psi_sql() -> str:
    return """WITH bounds AS (
         SELECT min(datediff('day', DATE '2024-01-01', date_trunc('day', ts)::DATE))::BIGINT AS lo,
                max(datediff('day', DATE '2024-01-01', date_trunc('day', ts)::DATE))::BIGINT AS hi
         FROM events),
       ua AS (
         SELECT user_id,
                (datediff('day', DATE '2024-01-01', date_trunc('day', ts)::DATE)
                 >= (SELECT (lo + hi + 1) // 2 FROM bounds))::INT AS half,
                count(*)::BIGINT AS a
         FROM events GROUP BY 1, 2),
       ref AS (SELECT a, row_number() OVER (ORDER BY a, user_id) AS rn,
                      count(*) OVER () AS n
               FROM ua WHERE half = 0),
       edges AS (
         SELECT k, max(a) AS edge FROM (
           SELECT a, rn, n, unnest(range(1, 10)) AS k FROM ref)
         WHERE rn <= (k * n + 9) // 10 GROUP BY k),
       binned AS (
         SELECT u.half, u.user_id,
                coalesce(sum(CASE WHEN u.a > e.edge THEN 1 END), 0)::BIGINT AS bin
         FROM ua u CROSS JOIN edges e GROUP BY u.half, u.user_id, u.a),
       cells AS (
         SELECT b.bin,
                sum((half = 0)::INT)::BIGINT AS c1,
                sum((half = 1)::INT)::BIGINT AS c2
         FROM binned b GROUP BY b.bin),
       tots AS (SELECT sum(c1)::BIGINT AS n1, sum(c2)::BIGINT AS n2 FROM cells),
       contrib AS (
         SELECT round(1e9 * ((c1 + 0.5) / (n1 + 5.0) - (c2 + 0.5) / (n2 + 5.0))
                      * ln(((c1 + 0.5) / (n1 + 5.0)) / ((c2 + 0.5) / (n2 + 5.0))), 0)::BIGINT AS t_fp,
                n1, n2
         FROM cells, tots)
       SELECT max(n1) AS n_users_first, max(n2) AS n_users_second,
              round(sum(t_fp) / 1e9, 6) AS psi
       FROM contrib"""



@query("psi_drift", _psi_sql())
def q_psi_drift(spark, sf_dir):
    """Population stability index of per-user activity between the
    first and second half of the observation window (the credit-
    scoring drift gauge; PSI = Σ(p−q)ln(p/q) ≈ symmetrized KL): the
    binned-distribution companion to `ks_drift` (supremum) and
    `wasserstein_1d` (transport) with the industry's 0.1/0.25
    warn/act thresholds. Bins are DATA-DRIVEN — lower-decile order
    statistics of the first-half activity with deterministic tie
    keys — so the binning itself is reproducible; both halves bin by
    counting exceeded edges (no CASE ladders to keep in sync), cells
    get Jeffreys +0.5 smoothing so empty bins stay finite, and each
    bin's contribution is re-quantized to 1e-9 fixed point. One
    user×half census, a 9-row broadcast edge table, a 10-row tail."""
    ev = _events(spark, sf_dir)
    day = F.date_trunc("day", F.col("ts")).cast("date")
    dd = F.datediff(day, F.lit("2024-01-01").cast("date")).cast("long")
    bounds = ev.agg(F.min(dd).alias("lo"), F.max(dd).alias("hi")).select(
        F.floor((F.col("lo") + F.col("hi") + 1) / 2).cast("long").alias("mid")
    )
    ua = (
        ev.crossJoin(F.broadcast(bounds))
        .groupBy("user_id", (dd >= F.col("mid")).cast("int").alias("half"))
        .agg(F.count(F.lit(1)).cast("long").alias("a"))
    ).stableCheckpoint(eager=True)
    # CENSUS GRAIN (r4): each decile edge is the least census value
    # whose cumulative count reaches its target rank
    # (operators/census.py) — no global rank window over the
    # (unbounded) user grain.
    from pliers_spark.operators.census import with_census_ranks

    refc = ua.where(F.col("half") == 0)
    cells = with_census_ranks(
        refc.groupBy("a").agg(F.count(F.lit(1)).alias("cnt")), "a", le="cum_le"
    )
    nr = refc.agg(F.count(F.lit(1)).alias("n"))
    ks = spark.range(1, 10).select(F.col("id").alias("k"))
    edges = (
        cells.crossJoin(F.broadcast(nr))
        .crossJoin(F.broadcast(ks))
        .where(F.col("cum_le") >= F.floor((F.col("k") * F.col("n") + 9) / 10))
        .groupBy("k").agg(F.min("a").alias("edge"))
    )
    binned = (
        ua.crossJoin(F.broadcast(edges))
        .groupBy("half", "user_id", "a")
        .agg(F.coalesce(F.sum(F.when(F.col("a") > F.col("edge"), 1)), F.lit(0)).cast("long").alias("bin"))
    )
    cells = binned.groupBy("bin").agg(
        F.sum((F.col("half") == 0).cast("int")).cast("long").alias("c1"),
        F.sum((F.col("half") == 1).cast("int")).cast("long").alias("c2"),
    )
    tots = cells.agg(F.sum("c1").cast("long").alias("n1"), F.sum("c2").cast("long").alias("n2"))
    p = (F.col("c1") + F.lit(0.5)) / (F.col("n1") + F.lit(5.0))
    q = (F.col("c2") + F.lit(0.5)) / (F.col("n2") + F.lit(5.0))
    contrib = cells.crossJoin(F.broadcast(tots)).select(
        "n1", "n2",
        F.round(F.lit(1e9) * (p - q) * F.log(p / q), 0).cast("long").alias("t_fp"),
    )
    return contrib.agg(
        F.max("n1").alias("n_users_first"),
        F.max("n2").alias("n_users_second"),
        F.round(F.sum("t_fp") / F.lit(1e9), 6).alias("psi"),
    )



_TSCV_K = 5



def _tscv_sql() -> str:
    return f"""WITH b AS (
         SELECT min(datediff('day', DATE '2024-01-01', date_trunc('day', ts)::DATE))::BIGINT AS lo,
                max(datediff('day', DATE '2024-01-01', date_trunc('day', ts)::DATE))::BIGINT AS hi
         FROM events),
       ch AS (
         SELECT f.fold, b.lo,
                b.lo + ((b.hi - b.lo + 1) * f.fold) // {_TSCV_K + 1} AS tr_end,
                b.lo + ((b.hi - b.lo + 1) * (f.fold + 1)) // {_TSCV_K + 1} AS te_end
         FROM b, (SELECT unnest(range(1, {_TSCV_K + 1}))::BIGINT AS fold) f),
       ev AS (
         SELECT datediff('day', DATE '2024-01-01', date_trunc('day', ts)::DATE)::BIGINT AS dd,
                (event_type = 'purchase')::INT AS pur
         FROM events),
       stats AS (
         SELECT c.fold,
                c.tr_end - c.lo AS train_days, c.te_end - c.tr_end AS test_days,
                sum((e.dd < c.tr_end)::INT)::BIGINT AS n_train,
                sum((e.dd >= c.tr_end AND e.dd < c.te_end)::INT)::BIGINT AS n_test,
                sum(CASE WHEN e.dd < c.tr_end THEN e.pur ELSE 0 END)::BIGINT AS p_train,
                sum(CASE WHEN e.dd >= c.tr_end AND e.dd < c.te_end THEN e.pur ELSE 0 END)::BIGINT AS p_test
         FROM ch c, ev e GROUP BY 1, 2, 3)
       SELECT fold, train_days, test_days, n_train, n_test,
              round(p_train::DOUBLE / n_train, 6) AS purchase_rate_train,
              round(p_test::DOUBLE / n_test, 6) AS purchase_rate_test
       FROM stats ORDER BY fold"""



@query("ts_cv_folds", _tscv_sql())
def q_ts_cv_folds(spark, sf_dir):
    """Expanding-window time-series cross-validation folds (Hyndman &
    Athanasopoulos, FPP3 §5.10 'time series cross-validation'): the
    observation window splits into K+1=6 equal day chunks; fold i
    trains on chunks 1..i and tests on chunk i+1, so train always
    precedes test — the temporally-valid CV that the zero-leakage
    north rule forces (`split_leakage_audit` checks a split; this
    query GENERATES the compliant ones). Fold boundaries are pure
    integer day arithmetic; per-fold event counts and purchase-rate
    summaries come from one census with boundary predicates — the
    whole fold table is a 5-row broadcast join against the day-tagged
    events, no repeated scans per fold."""
    ev = _events(spark, sf_dir)
    day = F.date_trunc("day", F.col("ts")).cast("date")
    dd = F.datediff(day, F.lit("2024-01-01").cast("date")).cast("long")
    b = ev.agg(F.min(dd).alias("lo"), F.max(dd).alias("hi"))
    folds = spark.range(1, _TSCV_K + 1).select(F.col("id").cast("long").alias("fold"))
    ch = folds.crossJoin(F.broadcast(b)).select(
        "fold", "lo",
        (F.col("lo") + F.floor((F.col("hi") - F.col("lo") + 1) * F.col("fold") / (_TSCV_K + 1))).alias("tr_end"),
        (F.col("lo") + F.floor((F.col("hi") - F.col("lo") + 1) * (F.col("fold") + 1) / (_TSCV_K + 1))).alias("te_end"),
    )
    evd = ev.select(dd.alias("dd"), (F.col("event_type") == "purchase").cast("int").alias("pur"))
    stats = evd.crossJoin(F.broadcast(ch)).groupBy(
        "fold",
        (F.col("tr_end") - F.col("lo")).alias("train_days"),
        (F.col("te_end") - F.col("tr_end")).alias("test_days"),
    ).agg(
        F.sum((F.col("dd") < F.col("tr_end")).cast("int")).cast("long").alias("n_train"),
        F.sum(((F.col("dd") >= F.col("tr_end")) & (F.col("dd") < F.col("te_end"))).cast("int")).cast("long").alias("n_test"),
        F.sum(F.when(F.col("dd") < F.col("tr_end"), F.col("pur")).otherwise(0)).cast("long").alias("p_train"),
        F.sum(F.when((F.col("dd") >= F.col("tr_end")) & (F.col("dd") < F.col("te_end")), F.col("pur")).otherwise(0)).cast("long").alias("p_test"),
    )
    return stats.select(
        "fold", "train_days", "test_days", "n_train", "n_test",
        F.round(F.col("p_train").cast("double") / F.col("n_train"), 6).alias("purchase_rate_train"),
        F.round(F.col("p_test").cast("double") / F.col("n_test"), 6).alias("purchase_rate_test"),
    ).orderBy("fold")



def _emb_micro_spark(df, id_cols=("vec_id",), vec_col="embedding"):
    """(id..., label) + exploded (dim, vu) micro-unit int64 coordinates —
    the kmeans_assign/semantic_dedup quantization (floor(x*1e6+0.5))."""
    return df.select(
        *id_cols, "label", F.posexplode(F.col(vec_col)).alias("dim", "x")
    ).select(
        *id_cols, "label", "dim",
        F.floor(F.col("x").cast("double") * F.lit(1e6) + F.lit(0.5)).cast("long").alias("vu"),
    )



_EMB_MICRO_SQL = """ve AS (
         SELECT vec_id, label, i - 1 AS dim,
                CAST(floor(embedding[i]::DOUBLE * 1e6 + 0.5) AS BIGINT) AS vu
         FROM embeddings, unnest(range(1, len(embedding) + 1)) AS u(i)),
       cent AS (
         SELECT label AS c_label, dim,
                round(sum(vu)::DOUBLE / count(*), 0)::BIGINT AS cu
         FROM ve GROUP BY 1, 2),
       dist AS (
         SELECT v.vec_id, v.label, c.c_label,
                sum((v.vu - c.cu) * (v.vu - c.cu))::BIGINT AS d2
         FROM ve v JOIN cent c USING (dim)
         GROUP BY 1, 2, 3)"""



@query(
    "rocchio_classify",
    f"""WITH {_EMB_MICRO_SQL},
       pred AS (
         SELECT vec_id, label, c_label,
                row_number() OVER (PARTITION BY vec_id ORDER BY d2, c_label) AS rn
         FROM dist)
       SELECT label AS true_label, c_label AS pred_label, count(*)::BIGINT AS n_vecs
       FROM pred WHERE rn = 1
       GROUP BY 1, 2 ORDER BY 1, 2""",
)
def q_rocchio_classify(spark, sf_dir):
    """Nearest-centroid (Rocchio) classification of the embedding table
    against its own label centroids, reported as a confusion matrix
    (Rocchio 1971; Manning et al., IIR §14.2) — the linear prototype
    classifier whose per-class accuracy exposes which label clusters
    actually separate in embedding space, complementing
    `kmeans_fit` (unsupervised) and `triplet_eval` (margin-based).
    Coordinates use the kmeans/semDeDup micro-unit quantization; the
    centroid is re-quantized half-up per dimension, so every squared
    Euclidean distance is an exact int64 sum and the argmin (ties →
    smaller label) is bit-deterministic. Plan: one exploded-dim census,
    a 10×64 broadcast centroid table, one dim-join reduction per
    (vector, class) — linear in vectors, never pairwise."""
    emb = load_table(spark, sf_dir, "embeddings")
    ve = _emb_micro_spark(emb)
    cent = ve.groupBy(F.col("label").alias("c_label"), "dim").agg(
        F.round(F.sum("vu").cast("double") / F.count(F.lit(1)), 0).cast("long").alias("cu")
    )
    dist = (
        ve.join(F.broadcast(cent), "dim")
        .groupBy("vec_id", "label", "c_label")
        .agg(F.sum((F.col("vu") - F.col("cu")) * (F.col("vu") - F.col("cu"))).cast("long").alias("d2"))
    )
    wp = Window.partitionBy("vec_id").orderBy("d2", "c_label")
    pred = dist.select("vec_id", "label", "c_label", F.row_number().over(wp).alias("rn")).where(
        F.col("rn") == 1
    )
    return (
        pred.groupBy(F.col("label").alias("true_label"), F.col("c_label").alias("pred_label"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_vecs"))
        .orderBy("true_label", "pred_label")
    )



@query(
    "silhouette_centroid",
    f"""WITH {_EMB_MICRO_SQL},
       ab AS (
         SELECT vec_id, label,
                min(CASE WHEN c_label = label THEN d2 END) AS a2,
                min(CASE WHEN c_label != label THEN d2 END) AS b2
         FROM dist GROUP BY 1, 2),
       s AS (
         SELECT label,
                round(1e6 * (sqrt(b2::DOUBLE) - sqrt(a2::DOUBLE))
                      / greatest(sqrt(a2::DOUBLE), sqrt(b2::DOUBLE)), 0)::BIGINT AS s_fp
         FROM ab)
       SELECT label, count(*)::BIGINT AS n_vecs,
              round(sum(s_fp) / (count(*) * 1e6), 6) AS mean_silhouette
       FROM s GROUP BY label ORDER BY label""",
)
def q_silhouette_centroid(spark, sf_dir):
    """Per-label simplified silhouette (Rousseeuw, JCAM 1987; the
    centroid variant a.k.a. 'simplified silhouette', Hruschka et al.
    2004): s = (b−a)/max(a,b) with a = distance to the OWN-label
    centroid and b = distance to the nearest other centroid — the
    O(n·k) cluster-quality score that replaces the O(n²) pairwise
    silhouette at corpus scale, sitting beside `davies_bouldin` and
    `calinski_harabasz` as the labeled-geometry triad. Distances ride
    the same exact micro-unit int64 d² as `rocchio_classify`; the two
    sqrt calls and one division are quantized per-vector to 1e-6
    before the per-label mean, so the aggregate is an exact integer
    sum in any combine order."""
    emb = load_table(spark, sf_dir, "embeddings")
    ve = _emb_micro_spark(emb)
    cent = ve.groupBy(F.col("label").alias("c_label"), "dim").agg(
        F.round(F.sum("vu").cast("double") / F.count(F.lit(1)), 0).cast("long").alias("cu")
    )
    dist = (
        ve.join(F.broadcast(cent), "dim")
        .groupBy("vec_id", "label", "c_label")
        .agg(F.sum((F.col("vu") - F.col("cu")) * (F.col("vu") - F.col("cu"))).cast("long").alias("d2"))
    )
    ab = dist.groupBy("vec_id", "label").agg(
        F.min(F.when(F.col("c_label") == F.col("label"), F.col("d2"))).alias("a2"),
        F.min(F.when(F.col("c_label") != F.col("label"), F.col("d2"))).alias("b2"),
    )
    s_fp = F.round(
        F.lit(1e6)
        * (F.sqrt(F.col("b2").cast("double")) - F.sqrt(F.col("a2").cast("double")))
        / F.greatest(F.sqrt(F.col("a2").cast("double")), F.sqrt(F.col("b2").cast("double"))),
        0,
    ).cast("long")
    return (
        ab.select("label", s_fp.alias("s_fp"))
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_vecs"),
            F.round(F.sum("s_fp") / (F.count(F.lit(1)) * F.lit(1e6)), 6).alias("mean_silhouette"),
        )
        .orderBy("label")
    )



_KNNLOO_K = 5

_KNNLOO_SAMPLE_MOD = 5  # deterministic 1-in-5 sample gate for the LOO pass
