"""Batch 76: Fellegi-Sunter linkage, DP histogram release, k-center
coreset, Cramér-von Mises drift, Wilcoxon signed-rank."""

import hashlib
import math
import os
from datetime import datetime


def _write(spark, tmp_path, name, rows, schema):
    d = str(tmp_path)
    spark.createDataFrame(rows, schema).write.mode("overwrite").parquet(
        os.path.join(d, f"{name}.parquet")
    )
    return d


DOCS = "doc_id long, text string, lang string, source string, n_chars long"
EVENTS = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)
EMB = "vec_id long, embedding array<float>, label int"


def test_fellegi_sunter_all_agree_pair_tops(spark, tmp_path):
    """Among 10 same-block records where only (0,1) share every field,
    that pair scores highest with n_agree=4; an all-disagree pair is
    not emitted (negative weight)."""
    from pliers_spark.queries import QUERIES

    rows = [(0, "alpha mid omega", "en", "s0", 60), (1, "alpha mid omega", "en", "s0", 61)]
    for i in range(2, 10):
        rows.append((i, f"tok{i} mid end{i}", f"l{i}", f"s{i}", 60 + i))
    sf = _write(spark, tmp_path, "documents", rows, DOCS)
    out = {(r.id_a, r.id_b): r for r in QUERIES["fellegi_sunter"](spark, sf).collect()}
    assert (0, 1) in out and out[(0, 1)].n_agree == 4
    assert out[(0, 1)].fs_score == max(r.fs_score for r in out.values())
    assert (2, 3) not in out


def test_dp_token_hist_thresholds_rare_tokens(spark, tmp_path):
    """A 100x token is released with |noise| <= 14; a 1x token is
    released iff its deterministic noisy count clears tau=10."""
    from pliers_spark.queries import QUERIES

    text = " ".join(["aaa"] * 100) + " rare"
    sf = _write(spark, tmp_path, "documents", [(0, text, "en", "s", len(text))], DOCS)
    out = {r.tok: r.noisy_count for r in QUERIES["dp_token_hist"](spark, sf).collect()}
    assert "aaa" in out and abs(out["aaa"] - 100) <= 14

    def noise(tok):
        h = int(hashlib.md5(f"77:{tok}".encode()).hexdigest()[:15], 16) % 1000000
        u = (h + 0.5) / 1e6
        lap = -1.0 * math.copysign(1.0, u - 0.5) * math.log(1 - 2 * abs(u - 0.5))
        return round(lap)

    expect_rare = 1 + noise("rare") >= 10
    assert ("rare" in out) == expect_rare
    assert out["aaa"] == 100 + noise("aaa")


def test_kcenter_greedy_on_a_line(spark, tmp_path):
    """Points at x = 0,1,2,3,10,20 (ids 0..5): greedy from 0 picks
    20, 10, 3, then the md=1 tie breaks to the lower vec_id."""
    from pliers_spark.queries import QUERIES

    xs = [0.0, 1.0, 2.0, 3.0, 10.0, 20.0]
    rows = [(i, [x, 0.0, 0.0, 0.0], 0) for i, x in enumerate(xs)]
    sf = _write(spark, tmp_path, "embeddings", rows, EMB)
    out = sorted(QUERIES["kcenter_coreset"](spark, sf).collect(), key=lambda r: r.pick_order)
    assert [r.vec_id for r in out] == [0, 5, 4, 3, 1]
    assert [r.dist_micro for r in out] == [0, 400_000_000, 100_000_000, 9_000_000, 1_000_000]


def test_cvm_separated_beats_identical(spark, tmp_path):
    """Fully separated samples score far above identically-distributed
    ones."""
    from pliers_spark.queries import QUERIES

    def rows(view_vals):
        r, eid = [], 0
        for v in (1.0, 2.0, 3.0, 4.0, 5.0):
            r.append((eid, datetime(2024, 1, 1), 1, "click", v, "")); eid += 1
        for v in view_vals:
            r.append((eid, datetime(2024, 1, 1), 2, "view", v, "")); eid += 1
        return r

    sf = _write(spark, tmp_path, "events", rows((101.0, 102.0, 103.0, 104.0, 105.0)), EVENTS)
    sep = QUERIES["cvm_drift"](spark, sf).collect()[0]
    sf = _write(spark, tmp_path, "events", rows((1.0, 2.0, 3.0, 4.0, 5.0)), EVENTS)
    same = QUERIES["cvm_drift"](spark, sf).collect()[0]
    assert sep.n_x == 5 and sep.n_y == 5
    assert sep.cvm_t > 0.5 > same.cvm_t


def test_wilcoxon_all_positive_shifts(spark, tmp_path):
    """10 users, each strictly higher in the second half: W+ = 55,
    z = 27.5 / sqrt(96.25)."""
    from pliers_spark.queries import QUERIES

    rows, eid = [], 0
    for u in range(10):
        for j, v in enumerate((1.0, 1.0, 5.0 + u, 5.0 + u)):
            rows.append((eid, datetime(2024, 1, 1, j), u, "t", v, "")); eid += 1
    sf = _write(spark, tmp_path, "events", rows, EVENTS)
    out = QUERIES["wilcoxon_signed"](spark, sf).collect()[0]
    assert out.n_pairs == 10 and out.w_plus == 55.0
    assert abs(out.z - 27.5 / math.sqrt(96.25)) < 1e-6


def test_compaction_bins_capacity_invariant(spark, tmp_path):
    """Every closed (full) HARMONIC bin fits the 1024 cap, and class-1
    items sit one per bin."""
    from pliers_spark.queries import QUERIES

    rows = [(i, "t", "en", "s", sz) for i, sz in enumerate(
        [900, 800, 700, 400, 400, 300, 120, 110, 100, 90, 80, 70, 60, 50])]
    sf = _write(spark, tmp_path, "documents", rows, DOCS)
    out = QUERIES["compaction_bins"](spark, sf).collect()
    assert all(r.fill_chars <= 1024 for r in out)
    ones = [r for r in out if r.size_class == 1]
    assert all(r.n_items == 1 for r in ones) and len(ones) == 3
    full = [r for r in out if r.n_items == r.size_class and r.size_class < 8]
    assert all(r.fill_ratio > r.size_class / (r.size_class + 1.0) - 1e-9 for r in full)


def test_knn_probe_separable_clusters(spark, tmp_path):
    """Two well-separated label clusters -> 100% LOO accuracy."""
    from pliers_spark.queries import QUERIES

    rows = []
    for i in range(6):
        rows.append((i, [10.0 + i * 0.1, 0.0, 0.0, 1.0], 0))
    for i in range(6):
        rows.append((10 + i, [0.0, 10.0 + i * 0.1, 0.0, 1.0], 1))
    sf = _write(spark, tmp_path, "embeddings", rows, EMB)
    out = {r.label: r for r in QUERIES["knn_probe"](spark, sf).collect()}
    assert out[0].n == 6 and out[0].acc == 1.0
    assert out[1].n == 6 and out[1].acc == 1.0


def test_permutation_test_huge_gap_min_p(spark, tmp_path):
    """src0 docs 10x longer than src1 -> observed diff beats every
    permutation: p = 1/(K+1)."""
    from pliers_spark.queries import QUERIES

    rows = [(i, "t", "en", "src0", 5000) for i in range(15)]
    rows += [(100 + i, "t", "en", "src1", 50) for i in range(15)]
    sf = _write(spark, tmp_path, "documents", rows, DOCS)
    out = QUERIES["permutation_test"](spark, sf).collect()[0]
    assert out.n_a == 15 and out.n_b == 15
    assert out.obs_diff == 4950.0
    assert abs(out.p_value - 1 / 21.0) < 1e-6


def test_offpolicy_uniform_logs_identity(spark, tmp_path):
    """Logged policy == target support with equal counts and constant
    rewards: IPS = SNIPS = DR = reward of target actions; full ESS on
    target rows."""
    from pliers_spark.queries import QUERIES

    rows, eid = [], 0
    for a, r in (("click", 2.0), ("purchase", 2.0), ("view", 9.0), ("error", 9.0)):
        for _ in range(5):
            rows.append((eid, datetime(2024, 1, 1), 1, a, r, "")); eid += 1
    sf = _write(spark, tmp_path, "events", rows, EVENTS)
    out = QUERIES["offpolicy_eval"](spark, sf).collect()[0]
    # target = uniform over {click, purchase}, both reward 2.0
    assert out.snips == 2.0 and out.dr == 2.0
    assert abs(out.ips - 2.0) < 1e-6
    assert out.n == 20


def test_silhouette_tight_separated_clusters(spark, tmp_path):
    """Two tight, far-apart clusters -> silhouette near 1 for both."""
    from pliers_spark.queries import QUERIES

    rows = []
    for i in range(5):
        rows.append((i, [0.0 + 0.01 * i, 0.0, 0.0, 0.0], 0))
        rows.append((10 + i, [100.0 + 0.01 * i, 0.0, 0.0, 0.0], 1))
    sf = _write(spark, tmp_path, "embeddings", rows, EMB)
    out = {r.label: r.silhouette for r in QUERIES["silhouette_simplified"](spark, sf).collect()}
    assert out[0] > 0.99 and out[1] > 0.99


def test_anchor_text_index_modal_anchor(spark, tmp_path):
    """All docs share a lead token -> every host's top_anchor is it and
    anchor vocabulary is 1."""
    from pliers_spark.queries import QUERIES

    rows = [(i, "promo deal page", "en", "s", 20) for i in range(30)]
    sf = _write(spark, tmp_path, "documents", rows, DOCS)
    out = QUERIES["anchor_text_index"](spark, sf).collect()
    assert len(out) > 0
    assert all(r.top_anchor == "promo" and r.n_unique_anchors == 1 for r in out)
    assert sum(r.in_degree for r in out) <= 30 * 3  # self-links excluded
