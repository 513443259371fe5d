"""Batch 84: Yuen trimmed test, LOO stupid backoff, Kaplan-Meier."""

import math
import os
from datetime import datetime, timedelta


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


def test_yuen_trim_ignores_outlier(spark, tmp_path):
    """click=[1..10] with g=2 trims ranks {1,2} and {9,10}; an extreme
    outlier replacing 10 leaves the trimmed mean unchanged."""
    from pliers_spark.queries import QUERIES

    def ev(i, t, v):
        return (i, datetime(2024, 1, 1, 0, 0, i), i, t, float(v), "{}")

    base = [ev(i, "click", v) for i, v in enumerate([1, 2, 3, 4, 5, 6, 7, 8, 9, 10])]
    base += [ev(20 + i, "view", v) for i, v in enumerate([1, 2, 3, 4, 5, 6, 7, 8, 9, 10])]
    sf = _write(spark, tmp_path, "events", base, EVENTS)
    r0 = QUERIES["yuen_trimmed"](spark, sf).collect()[0]
    assert (r0.h1, r0.h2) == (6, 6)
    assert r0.trimmed_diff == 0.0

    spiked = [row for row in base if row[4] != 10.0 or row[3] != "click"]
    spiked.append(ev(19, "click", 1000.0))
    sf2 = _write(spark, tmp_path, "events", spiked, EVENTS)
    r1 = QUERIES["yuen_trimmed"](spark, sf2).collect()[0]
    # outlier sits in the trimmed tail: trimmed means still equal
    assert r1.trimmed_diff == 0.0 and r1.t_yuen == 0.0


def test_yuen_trimmed_mean_hand_value(spark, tmp_path):
    """click=[1..10]: 20% trim keeps ranks 3..8 -> mean 5.5; view
    shifted +2 -> trimmed_diff = -2."""
    from pliers_spark.queries import QUERIES

    def ev(i, t, v):
        return (i, datetime(2024, 1, 1, 0, 0, i), i, t, float(v), "{}")

    rows = [ev(i, "click", i + 1) for i in range(10)]
    rows += [ev(20 + i, "view", i + 3) for i in range(10)]
    sf = _write(spark, tmp_path, "events", rows, EVENTS)
    r = QUERIES["yuen_trimmed"](spark, sf).collect()[0]
    assert r.trimmed_diff == -2.0
    assert r.t_yuen < 0


def test_stupid_backoff_repeated_vs_unique(spark, tmp_path):
    """A doc whose bigrams also occur in 3 twin docs scores higher
    (less negative) than a doc of corpus-unique bigrams."""
    from pliers_spark.queries import QUERIES

    rows = [(i, "a b c d e", "en", "s", 9) for i in range(4)]
    rows.append((9, "p q r s t", "en", "s", 9))
    sf = _write(spark, tmp_path, "documents", rows, DOCS)
    out = {r.doc_id: r.avg_logscore for r in QUERIES["stupid_backoff_loo"](spark, sf).collect()}
    assert out[0] > out[9]
    # doc 0 LOO: each bigram survives with b-bd = 3, u1-ud = 3 -> ln(1) = 0
    assert out[0] == 0.0


def test_kaplan_meier_curve(spark, tmp_path):
    """3 users view at day 0; u1 converts day 1, u2 converts day 2,
    u3 censored day 3: S = 1, 2/3, 1/3 then flat."""
    from pliers_spark.queries import QUERIES

    rows = []
    eid = 0

    def ev(u, day, typ):
        nonlocal eid
        rows.append((eid, datetime(2024, 1, 1) + timedelta(days=day), u, typ, 1.0, "{}"))
        eid += 1

    for u in (1, 2, 3):
        ev(u, 0, "view")
    ev(1, 1, "purchase")
    ev(2, 2, "purchase")
    ev(3, 3, "click")
    sf = _write(spark, tmp_path, "events", rows, EVENTS)
    out = {r.day: r for r in QUERIES["kaplan_meier"](spark, sf).collect()}
    assert out[0].n_at_risk == 3 and out[0].n_events == 0 and out[0].survival == 1.0
    assert out[1].n_events == 1
    s1 = round(math.exp(round(1e6 * math.log(1 - 1 / 3)) / 1e6), 6)
    assert out[1].survival == s1
    assert out[2].n_at_risk == 2 and out[2].n_events == 1
    assert out[3].survival == out[2].survival  # censoring doesn't drop S
    assert out[29].n_at_risk == 0
