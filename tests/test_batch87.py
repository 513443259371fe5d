"""Batch 87: min-plus closure, SCC, bow-tie decomposition, eccentricity."""


def test_minplus_closure_line_graph(spark):
    """1->2->3->4: dist(1,4)=3, no backward pairs, no self pairs."""
    from pliers_spark.operators.graph import minplus_closure

    e = spark.createDataFrame([(1, 2), (2, 3), (3, 4)], "src long, dst long")
    out = {(r.src, r.dst): r.dist for r in minplus_closure(e).collect()}
    assert out[(1, 4)] == 3 and out[(1, 2)] == 1 and out[(2, 4)] == 2
    assert (4, 1) not in out and (1, 1) not in out


def test_minplus_closure_cycle_self_dist(spark):
    """Cycle 1->2->1: self-distance 2 on both, cross distance 1."""
    from pliers_spark.operators.graph import minplus_closure

    e = spark.createDataFrame([(1, 2), (2, 1)], "src long, dst long")
    out = {(r.src, r.dst): r.dist for r in minplus_closure(e).collect()}
    assert out[(1, 1)] == 2 and out[(2, 2)] == 2
    assert out[(1, 2)] == 1 and out[(2, 1)] == 1


def test_minplus_shortcut_over_long_path(spark):
    """Long path 1..5 plus direct 1->5: shortest wins."""
    from pliers_spark.operators.graph import minplus_closure

    e = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5), (1, 5)], "src long, dst long"
    )
    out = {(r.src, r.dst): r.dist for r in minplus_closure(e).collect()}
    assert out[(1, 5)] == 1 and out[(1, 4)] == 3


def test_scc_and_bowtie_consistency(spark):
    """On real sf0.001 data: scc partition covers all hosts, sizes
    consistent; bow-tie classes partition the same node set."""
    from pliers_spark.queries import QUERIES

    sf = "/root/testdata/sf0.001"
    scc = QUERIES["scc_components"](spark, sf).collect()
    by_id = {}
    for r in scc:
        by_id.setdefault(r.scc_id, []).append(r)
    for sid, rows in by_id.items():
        assert all(r.scc_size == len(rows) for r in rows)
        assert min(r.node for r in rows) == sid
    bow = QUERIES["bowtie_structure"](spark, sf).collect()
    assert sum(r.n_hosts for r in bow) == len(scc)
    comp = {r.component for r in bow}
    assert "CORE" in comp
    core_sz = next(r.n_hosts for r in bow if r.component == "CORE")
    assert core_sz == max(len(v) for v in by_id.values())


def test_eccentricity_periphery(spark):
    """Every host's ecc <= diameter; at least one attains it."""
    from pliers_spark.queries import QUERIES

    out = QUERIES["eccentricity"](spark, "/root/testdata/sf0.001").collect()
    dia = max(r.ecc for r in out)
    assert all((r.ecc == dia) == bool(r.is_periphery) for r in out)
    assert any(r.is_periphery for r in out)
    assert all(r.n_reachable >= 1 for r in out)
