"""Census-grain rank machinery (operators/census.py): each scalable
form must be row-for-row identical to the naive global window it
replaces, including ties, descending order, and bucket boundaries."""

import random

from pyspark.sql import Window
from pyspark.sql import functions as F

from pliers_spark.operators.census import (
    scalable_row_number,
    scalable_running_max,
    scalable_running_sum,
    value_counts,
    with_census_ranks,
)


def _frame(spark, seed=7, n=500):
    rng = random.Random(seed)
    rows = [(i, rng.randint(0, 40), rng.randint(-5, 5)) for i in range(n)]
    return spark.createDataFrame(rows, "id long, v long, d long")


def test_with_census_ranks_identities(spark):
    df = _frame(spark)
    cells = with_census_ranks(
        value_counts(df, "v"), "v", lt="lt", r2="r2", le="le"
    ).collect()
    # reference: per-row ranks from the naive windows
    w = Window.orderBy("v")
    ref = (
        df.select(
            "v",
            (2 * F.rank().over(w) + F.count(F.lit(1)).over(Window.partitionBy("v")) - 1).alias("r2"),
            (F.rank().over(w) - 1).alias("lt"),
        )
        .groupBy("v").agg(F.max("r2").alias("r2"), F.max("lt").alias("lt"), F.count(F.lit(1)).alias("cnt"))
        .collect()
    )
    got = {r.v: r for r in cells}
    for r in ref:
        assert got[r.v].r2 == r.r2, f"r2 mismatch at v={r.v}"
        assert got[r.v].lt == r.lt, f"cum_lt mismatch at v={r.v}"
        assert got[r.v].le == r.lt + r.cnt, f"cum_le mismatch at v={r.v}"


def test_scalable_row_number_matches_window(spark):
    df = _frame(spark)
    naive = df.select(
        "id", F.row_number().over(Window.orderBy("v", "id")).alias("rn")
    )
    # small bucket count forces multi-value buckets AND boundary cells
    got = scalable_row_number(df, "v", out="rn", num_buckets=7, tiebreak=("id",))
    diff = naive.join(got.select("id", F.col("rn").alias("rn2")), "id").where(
        F.col("rn") != F.col("rn2")
    )
    assert diff.count() == 0


def test_scalable_row_number_desc(spark):
    df = _frame(spark)
    naive = df.select(
        "id", F.row_number().over(Window.orderBy(F.desc("v"), "id")).alias("rn")
    )
    got = scalable_row_number(df, "v", out="rn", num_buckets=5, desc=True, tiebreak=("id",))
    diff = naive.join(got.select("id", F.col("rn").alias("rn2")), "id").where(
        F.col("rn") != F.col("rn2")
    )
    assert diff.count() == 0


def test_scalable_row_number_constant_column(spark):
    df = spark.createDataFrame([(i, 3) for i in range(50)], "id long, v long")
    got = scalable_row_number(df, "v", out="rn", tiebreak=("id",)).collect()
    assert sorted(r.rn for r in got) == list(range(1, 51))


def test_scalable_running_sum_matches_window(spark):
    df = _frame(spark)
    w = Window.orderBy("v", "id").rowsBetween(Window.unboundedPreceding, 0)
    naive = df.select("id", F.sum("d").over(w).alias("s"))
    got = scalable_running_sum(df, "d", "v", out="s", num_buckets=7, tiebreak=("id",))
    diff = naive.join(got.select("id", F.col("s").alias("s2")), "id").where(
        F.col("s") != F.col("s2")
    )
    assert diff.count() == 0


def test_scalable_running_max_matches_window(spark):
    df = _frame(spark)
    w = Window.orderBy("v", "id").rowsBetween(Window.unboundedPreceding, 0)
    naive = df.select("id", F.max("d").over(w).alias("m"))
    got = scalable_running_max(df, "d", "v", out="m", num_buckets=7, tiebreak=("id",))
    diff = naive.join(got.select("id", F.col("m").alias("m2")), "id").where(
        F.col("m") != F.col("m2")
    )
    assert diff.count() == 0


def test_scalable_forms_are_lint_clean(spark):
    """The helpers must themselves pass the linter they exist to satisfy."""
    from pliers_spark.plans.scale_lint import audit_scale_hazards

    df = _frame(spark)
    for out in (
        scalable_row_number(df, "v", tiebreak=("id",)),
        scalable_running_sum(df, "d", "v"),
        scalable_running_max(df, "d", "v"),
    ):
        assert audit_scale_hazards(out) == []
