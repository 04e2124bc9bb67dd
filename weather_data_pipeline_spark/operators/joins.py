"""Join operators over the star schema.

The reference is single-table (SURVEY.md §2.3 — no relational joins), but the
engine's query surface declares the standard equi/broadcast/semi/anti shapes
the reference's users get "for free" when switching: dimension enrichment is
the exact analog of joining observations to a city dimension.

Scale notes: dimension tables (region/nation/supplier/part/customer) are tiny
relative to facts — they are broadcast explicitly so the fact table never
shuffles for enrichment. Fact-fact joins (lineitem ⋈ orders) are left to
Catalyst/AQE, which picks sort-merge with skew splitting; at 100 TB you would
additionally bucket both tables by orderkey at write time (see
sources/tables.py:write_bucketed).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def enrich_orders(orders: DataFrame, customer: DataFrame, nation: DataFrame) -> DataFrame:
    """orders ⋈ customer ⋈ nation with broadcast dimensions."""
    return orders.join(
        F.broadcast(customer), orders.o_custkey == customer.c_custkey
    ).join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)


def revenue_by_nation(
    lineitem: DataFrame, orders: DataFrame, customer: DataFrame, nation: DataFrame
) -> DataFrame:
    """Revenue per nation: fact-fact sort-merge join + broadcast dims."""
    # decimal accumulation → order-independent, bit-exact vs the SQL oracle
    rev = (
        F.sum((F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,6)"))
        .cast("double")
        .alias("revenue")
    )
    return (
        lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(rev, F.count(F.lit(1)).alias("n_items"))
        .orderBy("n_name")
    )


def customers_with_orders(customer: DataFrame, orders: DataFrame) -> DataFrame:
    """Left-semi join: EXISTS (reference users' 'has data' filter)."""
    return customer.join(
        orders, customer.c_custkey == orders.o_custkey, "left_semi"
    )


def customers_without_orders(customer: DataFrame, orders: DataFrame) -> DataFrame:
    """Left-anti join: NOT EXISTS."""
    return customer.join(
        orders, customer.c_custkey == orders.o_custkey, "left_anti"
    )
