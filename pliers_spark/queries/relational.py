"""Registry module (split from the former queries.py monolith; same
@query/ORACLES contract as every sibling).

Queries: tpch_q3, tpch_q5, top_customers
"""
from __future__ import annotations

from ._registry import F, load_table, query



@query(
    "tpch_q3",
    """SELECT l.l_orderkey,
              round(sum(l.l_extendedprice * (1 - l.l_discount)), 6) AS revenue,
              o.o_orderdate, o.o_orderpriority
       FROM customer c
       JOIN orders o ON c.c_custkey = o.o_custkey
       JOIN lineitem l ON l.l_orderkey = o.o_orderkey
       WHERE c.c_mktsegment = 'BUILDING'
         AND o.o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
         AND l.l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
       GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
       ORDER BY revenue DESC, l.l_orderkey
       LIMIT 10""",
)
def q_tpch_q3(spark, sf_dir):
    """Shipping-priority (TPC-H Q3 shape): selective dim filter pushed
    to the customer scan, customer⋈orders broadcast (filtered dim),
    orders⋈lineitem on the fact key, partial-agg revenue, distributed
    top-k (TakeOrderedAndProject — no global sort). The multi-join
    demonstrates Catalyst join reordering + AQE over a star schema;
    nothing hand-scheduled."""
    c = load_table(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    o = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderdate") < F.lit("1998-03-15 00:00:00").cast("timestamp")
    )
    l = load_table(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") > F.lit("1998-03-15 00:00:00").cast("timestamp")
    )
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 6
            ).alias("revenue")
        )
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )



@query(
    "tpch_q5",
    """SELECT n.n_name,
              round(sum(l.l_extendedprice * (1 - l.l_discount)), 6) AS revenue
       FROM customer c
       JOIN orders o ON c.c_custkey = o.o_custkey
       JOIN lineitem l ON l.l_orderkey = o.o_orderkey
       JOIN supplier s ON l.l_suppkey = s.s_suppkey
                      AND c.c_nationkey = s.s_nationkey
       JOIN nation n ON s.s_nationkey = n.n_nationkey
       JOIN region r ON n.n_regionkey = r.r_regionkey
       WHERE r.r_name = 'ASIA'
         AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
         AND o.o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
       GROUP BY n.n_name""",
)
def q_tpch_q5(spark, sf_dir):
    """Local-supplier-volume (TPC-H Q5 shape): a 6-table star join with
    a region→nation snowflake filter, the classic co-location predicate
    (customer and supplier share a nation), and a per-nation revenue
    rollup. region/nation/supplier/customer are broadcast dims; the
    fact-side orders⋈lineitem shuffles once on the order key. The
    canonical 'let Catalyst reorder it' benchmark shape."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    )
    l = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(
            F.broadcast(s),
            (l.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey),
        )
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 6
            ).alias("revenue")
        )
    )



@query(
    "top_customers",
    """WITH rev AS (
         SELECT o.o_custkey, sum(o.o_totalprice) AS revenue
         FROM orders o GROUP BY o.o_custkey),
       ranked AS (
         SELECT c.c_custkey, c.c_name, round(r.revenue, 6) AS revenue,
                row_number() OVER (ORDER BY r.revenue DESC, c.c_custkey) AS rk
         FROM rev r JOIN customer c ON c.c_custkey = r.o_custkey)
       SELECT c_custkey, c_name, revenue FROM ranked WHERE rk <= 10""",
)
def q_top_customers(spark, sf_dir):
    """Broadcast dim join + agg + deterministic top-k."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    rev = orders.groupBy("o_custkey").agg(F.sum("o_totalprice").alias("revenue"))
    joined = rev.join(F.broadcast(cust), rev.o_custkey == cust.c_custkey)
    # orderBy+limit → TakeOrderedAndProject (distributed heap top-k), not
    # a single-partition global row_number window.
    return (
        joined.select("c_custkey", "c_name", F.col("revenue"))
        .orderBy(F.desc("revenue"), F.col("c_custkey"))
        .limit(10)
        .select("c_custkey", "c_name", F.round("revenue", 6).alias("revenue"))
    )



# --------------------------------------------------------------------------
# dedup / similarity / fingerprints over documents & embeddings
# (training-data pipeline operators; hashes are md5-derived so the DuckDB
# oracle reproduces them bit-for-bit — see functions/hashing.py)


def _tok_sql(src: str = "trim(text)") -> str:
    return f"string_split({src}, ' ')"
