"""Relational analytics over the TPC-H-shaped tables — the engine's
general scan/filter/join/aggregate surface (SURVEY.md §2.4), expressed the
way Catalyst wants it:

- filters and column selections sit directly on the scans (predicate
  pushdown + column pruning reach the parquet reader — `PushedFilters` /
  `ReadSchema` in PLANS.md);
- dimension tables (region/nation/customer/supplier) are explicitly
  `F.broadcast` — fact-table joins are map-side, no fact shuffle;
- the only wide stages are the final hash aggregations, keyed on
  low-cardinality group keys with map-side partial aggregation.

Money math is INTEGER end-to-end for cross-engine bit-stability (the
repo's integer-moment discipline, functions/stats.py): prices/discounts
convert to integral cents first, and revenue
``extprice·(1−discount)`` becomes
``cents(extprice) × (100 − cents%(discount))`` — an exact integer in
hundredths-of-a-cent units, summed exactly in any order on any engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _cents(col: str) -> F.Column:
    return F.round(F.col(col) * 100).cast("bigint")


#: revenue line item in 1e-4 currency units: cents(price) × (100 − pct(discount))
def _revenue_e4() -> F.Column:
    return _cents("l_extendedprice") * (F.lit(100) - _cents("l_discount"))


def pricing_summary(spark: SparkSession, sf_dir: str, cutoff: str = "1998-09-02") -> DataFrame:
    """Q1 shape: scan-filter-aggregate over the fact table only.  One
    shuffle (hash agg on 2 low-cardinality keys, partial+final)."""
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") <= F.lit(cutoff))
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(F.round(F.col("l_quantity")).cast("bigint")).alias("sum_qty"),
            F.sum(_cents("l_extendedprice")).alias("sum_base_cents"),
            F.sum(_revenue_e4()).alias("sum_disc_e4"),
            F.count("*").alias("count_order"),
        )
        .select(
            "l_returnflag", "l_linestatus", "sum_qty", "sum_base_cents",
            "sum_disc_e4", "count_order",
        )
    )


def shipping_priority(
    spark: SparkSession,
    sf_dir: str,
    segment: str = "BUILDING",
    orderdate_lt: str = "1998-01-01",
    shipdate_gt: str = "1998-01-01",
    n: int = 10,
) -> DataFrame:
    """Q3 shape: selective dimension (customers of one segment, ~300 rows)
    BROADCAST into orders, that join broadcast... no — orders survive the
    customer filter at fact scale, so orders⋈lineitem stays a shuffled
    equi-join on the uniform orderkey; only the customer side broadcasts.
    Top-N via TakeOrderedAndProject (bounded heaps, no full sort)."""
    cust = (
        _t(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == segment)
        .select("c_custkey")
    )
    orders = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit(orderdate_lt)
    ).select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit(shipdate_gt)
    ).select("l_orderkey", "l_extendedprice", "l_discount")
    joined = orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey).join(
        li, orders.o_orderkey == li.l_orderkey
    )
    agg = joined.groupBy("o_orderkey", "o_orderdate", "o_orderpriority").agg(
        F.sum(_revenue_e4()).alias("revenue_e4")
    )
    return (
        agg.orderBy(F.desc("revenue_e4"), F.asc("o_orderkey"))
        .limit(n)
        .select(
            "o_orderkey",
            F.col("o_orderdate").cast("string").alias("o_orderdate"),
            "o_orderpriority",
            "revenue_e4",
        )
    )


def revenue_by_nation(
    spark: SparkSession,
    sf_dir: str,
    region: str = "ASIA",
    date_from: str = "1996-01-01",
    date_to: str = "1997-01-01",
) -> DataFrame:
    """Q5 shape: fact table joined against a chain of broadcast dims
    (region→nation→customer and supplier), with the classic local-supplier
    condition c_nationkey = s_nationkey.  The fact shuffles once on
    orderkey; every dimension join is map-side."""
    region_df = _t(spark, sf_dir, "region").filter(F.col("r_name") == region)
    nation = _t(spark, sf_dir, "nation").join(
        F.broadcast(region_df), F.col("n_regionkey") == F.col("r_regionkey")
    ).select("n_nationkey", "n_name")
    cust = _t(spark, sf_dir, "customer").join(
        F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey")
    ).select("c_custkey", "c_nationkey")
    supp = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit(date_from)) & (F.col("o_orderdate") < F.lit(date_to))
    ).select("o_orderkey", "o_custkey")
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    joined = (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(li, orders.o_orderkey == li.l_orderkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .filter(F.col("c_nationkey") == F.col("s_nationkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
    )
    return (
        joined.groupBy("n_name")
        .agg(F.sum(_revenue_e4()).alias("revenue_e4"))
        .select("n_name", "revenue_e4")
    )


# ---------------------------------------------------------------------------
# DuckDB oracle SQL (same integer money units)
# ---------------------------------------------------------------------------

_REV_E4 = (
    "CAST(round(l_extendedprice * 100) AS BIGINT)"
    " * (100 - CAST(round(l_discount * 100) AS BIGINT))"
)


def pricing_summary_sql(cutoff: str = "1998-09-02") -> str:
    # Every sum() carries an OUTER cast: DuckDB's sum(BIGINT) yields HUGEINT
    # (Arrow decimal128), which hash-mismatches Spark's int64 even when the
    # values are identical.  Same convention as events_windowed's oracle.
    return f"""
SELECT l_returnflag, l_linestatus,
       CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty,
       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sum_base_cents,
       CAST(sum({_REV_E4}) AS BIGINT) AS sum_disc_e4,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '{cutoff} 00:00:00'
GROUP BY l_returnflag, l_linestatus"""


def shipping_priority_sql(
    segment: str = "BUILDING",
    orderdate_lt: str = "1998-01-01",
    shipdate_gt: str = "1998-01-01",
    n: int = 10,
) -> str:
    return f"""
SELECT o_orderkey,
       CAST(o_orderdate AS VARCHAR) AS o_orderdate,
       o_orderpriority,
       CAST(sum({_REV_E4}) AS BIGINT) AS revenue_e4
FROM customer
JOIN orders   ON o_custkey = c_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = '{segment}'
  AND o_orderdate < TIMESTAMP '{orderdate_lt} 00:00:00'
  AND l_shipdate > TIMESTAMP '{shipdate_gt} 00:00:00'
GROUP BY o_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue_e4 DESC, o_orderkey
LIMIT {n}"""


def revenue_by_nation_sql(
    region: str = "ASIA", date_from: str = "1996-01-01", date_to: str = "1997-01-01"
) -> str:
    return f"""
SELECT n_name, CAST(sum({_REV_E4}) AS BIGINT) AS revenue_e4
FROM region
JOIN nation   ON n_regionkey = r_regionkey
JOIN customer ON c_nationkey = n_nationkey
JOIN orders   ON o_custkey = c_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON s_suppkey = l_suppkey AND s_nationkey = c_nationkey
WHERE r_name = '{region}'
  AND o_orderdate >= TIMESTAMP '{date_from} 00:00:00'
  AND o_orderdate <  TIMESTAMP '{date_to} 00:00:00'
GROUP BY n_name"""
