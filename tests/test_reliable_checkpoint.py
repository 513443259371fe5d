"""Checkpoint durability modes (plans/reliable.py).

VERDICT r3 "What's wrong" #1: data-path ``localCheckpoint`` is not
fault-tolerant on a real cluster (executor loss kills the truncated
lineage).  Every engine call site now routes through
``DataFrame.stableCheckpoint``; these tests pin that (a) the reliable
and disk modes produce byte-identical results to local mode on the
operators that lean hardest on lineage truncation (vectorizer's
doc-term frame, LSH dedup, iterative connected components), and (b) the
reliable mode really does write to a fault-tolerant checkpoint dir
(RDD.isCheckpointed, files on disk) rather than executor-local blocks.
"""

import os

import pytest

from pliers_spark.plans import reliable as R

SF = "/root/testdata/sf0.001"


def _rows(df):
    cols = sorted(df.columns)
    out = [tuple(str(r[c]) for c in cols) for r in df.collect()]
    return sorted(out)


@pytest.mark.parametrize("mode", ["reliable", "disk"])
def test_modes_match_local_on_lineage_heavy_operators(spark, mode):
    from pliers_spark.queries import QUERIES

    names = ["tfidf", "minhash_lsh", "dup_clusters"]
    for name in names:
        with R.checkpoint_mode("local"):
            base = _rows(QUERIES[name](spark, SF))
        with R.checkpoint_mode(mode):
            got = _rows(QUERIES[name](spark, SF))
        assert got == base, f"{name}: {mode} mode diverged from local"


def test_reliable_mode_checkpoints_to_reliable_storage(spark, tmp_path):
    ckpt_dir = str(tmp_path / "ckpt")
    os.environ["PLIERS_SPARK_CHECKPOINT_DIR"] = ckpt_dir
    try:
        # force (re)pointing the context at our dir for this test
        spark.sparkContext.setCheckpointDir(ckpt_dir)
        df = spark.range(0, 1000).selectExpr("id", "id % 7 AS k")
        with R.checkpoint_mode("reliable"):
            out = df.groupBy("k").count().stableCheckpoint(eager=True)
        # df.checkpoint() snapshots the plan's internal RDD (out.rdd is a
        # fresh conversion, so isCheckpointed() on it is meaningless) —
        # the observable contract is the files in the reliable dir:
        found = [
            os.path.join(dp, f)
            for dp, _, fs in os.walk(ckpt_dir)
            for f in fs
        ]
        assert found, "reliable checkpoint wrote no files to the checkpoint dir"
        assert out.count() == 7
    finally:
        os.environ.pop("PLIERS_SPARK_CHECKPOINT_DIR", None)


def test_local_mode_is_default_and_mode_validation():
    assert R.get_checkpoint_mode() == "local"
    with pytest.raises(ValueError):
        R.set_checkpoint_mode("bogus")
    with R.checkpoint_mode("disk"):
        assert R.get_checkpoint_mode() == "disk"
    assert R.get_checkpoint_mode() == "local"


def test_no_raw_localcheckpoint_call_sites_remain():
    """Every data-path lineage truncation must go through the durability
    switch — a raw ``.localCheckpoint(`` call would silently bypass the
    cluster-grade mode."""
    pkg = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    offenders = []
    for dirpath, _, files in os.walk(os.path.join(pkg, "pliers_spark")):
        for fn in files:
            if not fn.endswith(".py"):
                continue
            path = os.path.join(dirpath, fn)
            if path.endswith(os.path.join("plans", "reliable.py")):
                continue  # the switch itself
            with open(path) as f:
                for i, line in enumerate(f, 1):
                    if ".localCheckpoint(" in line:
                        offenders.append(f"{path}:{i}")
    assert not offenders, f"raw localCheckpoint call sites: {offenders}"
