"""Batch 101: AdaBoost stumps, FK discovery, FD validation."""

import os


def _write(spark, tmp_path, name, rows, schema):
    d = str(tmp_path)
    spark.createDataFrame(rows, schema).write.mode("overwrite").parquet(
        os.path.join(d, f"{name}.parquet")
    )
    return d


DOCS = "doc_id long, text string, lang string, source string, n_chars long"


def test_adaboost_separable_first_round(spark, tmp_path):
    """Length perfectly separates labels: round 0 finds a clean
    threshold, eps near 0, alpha large; every round keeps eps < 0.5."""
    from pliers_spark.queries import QUERIES

    rows = [(i, "w", "en", "s", 800 + i) for i in range(20)]
    rows += [(100 + i, "w", "fr", "s", 100 + i) for i in range(20)]
    sf = _write(spark, tmp_path, "documents", rows, DOCS)
    out = {r.round: r for r in QUERIES["adaboost_stumps"](spark, sf).collect()}
    assert set(out) == {0, 1, 2}
    assert 119 <= out[0].threshold < 800 and out[0].polarity == 1
    assert out[0].eps < 0.05
    assert out[0].alpha > 1
    assert all(r.eps < 0.5 for r in out.values())


def test_adaboost_reweights_hard_points(spark, tmp_path):
    """Noisy labels: round-1 eps is higher than a clean split, and the
    boosting invariant eps_t < 0.5 still holds each round."""
    from pliers_spark.queries import QUERIES

    rows = []
    for i in range(30):
        lang = "en" if (i < 15) != (i % 7 == 0) else "fr"
        rows.append((i, "w", lang, "s", 100 + i * 20))
    sf = _write(spark, tmp_path, "documents", rows, DOCS)
    out = {r.round: r for r in QUERIES["adaboost_stumps"](spark, sf).collect()}
    assert all(0 < r.eps < 0.5 for r in out.values())
    assert all(r.alpha > 0 for r in out.values())


def test_fk_discovery_on_real_tables(spark):
    """On sf0.001 TPC-H: the three true FK directions have inclusion 1,
    the reversed customer->orders direction does not."""
    from pliers_spark.queries import QUERIES

    out = {r.candidate: r for r in QUERIES["fk_discovery"](spark, "/root/testdata/sf0.001").collect()}
    assert out["orders.o_custkey->customer.c_custkey"].is_fk_candidate == 1
    assert out["customer.c_nationkey->nation.n_nationkey"].is_fk_candidate == 1
    assert out["lineitem.l_partkey->part.p_partkey"].is_fk_candidate == 1
    rev = out["orders.o_orderkey->lineitem.l_orderkey"]
    assert rev.inclusion < 1.0 and rev.is_fk_candidate == 0


def test_fd_violations_on_real_tables(spark):
    """Key-functional FDs hold exactly; the behavioral candidates are
    violated (a customer has many priorities)."""
    from pliers_spark.queries import QUERIES

    out = {r.fd: r for r in QUERIES["fd_violations"](spark, "/root/testdata/sf0.001").collect()}
    assert out["nation: n_nationkey->n_regionkey"].holds == 1
    assert out["customer: c_custkey->c_nationkey"].holds == 1
    assert out["orders: o_custkey->o_orderpriority"].g3_confidence < 1.0
    assert out["lineitem: l_orderkey->l_returnflag"].n_lhs > 0
