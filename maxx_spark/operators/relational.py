"""Relational operators: aggregations, joins, dedup-by-precedence, top-k.

Scale notes (100 TB design):
- Money arithmetic runs in DECIMAL so partial aggregation is exact and
  order-independent — the same query gives bit-identical results on 1
  partition or 10,000 (doubles would drift with shuffle order).
- Small dimensions (region/nation/supplier, the classic <10 MB tables) are
  broadcast explicitly; the probe side never shuffles for them.
- Final rounding happens once, after exact aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from maxx_spark.operators.spread import spread_scan

DEC = "decimal(18,4)"


def _money(c):
    return F.col(c).cast(DEC)


def pricing_summary(lineitem: DataFrame, cutoff: str = "1998-09-02") -> DataFrame:
    """TPC-H Q1-style pricing summary report.

    groupBy is a map-side-combinable hash aggregate on two low-cardinality
    keys — the shuffle moves only |flags|x|status| x partials rows.
    """
    disc_price = (_money("l_extendedprice") * (F.lit(1).cast(DEC) - _money("l_discount"))).alias("dp")
    charge = (
        _money("l_extendedprice")
        * (F.lit(1).cast(DEC) - _money("l_discount"))
        * (F.lit(1).cast(DEC) + _money("l_tax"))
    ).alias("ch")
    return (
        lineitem.where(F.col("l_shipdate") <= F.lit(cutoff).cast("date"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum(_money("l_quantity")), 2).cast("double").alias("sum_qty"),
            F.round(F.sum(_money("l_extendedprice")), 2).cast("double").alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).cast("double").alias("sum_disc_price"),
            F.round(F.sum(charge), 2).cast("double").alias("sum_charge"),
            F.round((F.sum(_money("l_quantity")).cast("double") / F.count(F.lit(1))), 6).alias("avg_qty"),
            F.round((F.sum(_money("l_extendedprice")).cast("double") / F.count(F.lit(1))), 6).alias("avg_price"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def revenue_by_nation(customer: DataFrame, orders: DataFrame, lineitem: DataFrame, nation: DataFrame, region: DataFrame) -> DataFrame:
    """Revenue per nation: fact-to-fact join on orderkey, dims broadcast.

    lineitem⨝orders is the only real shuffle (both sides hashed on
    o_orderkey); customer/nation/region ride along as broadcast hash joins.
    """
    rev = (F.col("l_extendedprice").cast(DEC) * (F.lit(1).cast(DEC) - F.col("l_discount").cast(DEC)))
    # customer scales linearly with SF (~150k x SF rows) — no broadcast hint;
    # AQE still broadcasts it at runtime when it is genuinely small. Hints
    # stay only on nation/region, the fixed 25/5-row dims.
    # spread_scan: when every dim broadcasts, the probe side runs decode +
    # 4 hash probes + partial agg with NO exchange anywhere — an
    # unsplittable single-row-group fact file serializes that whole chain
    # on one task (guide §2.5); no-op on an already-parallel scan.
    return (
        spread_scan(lineitem).join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("n_name", "r_name")
        .agg(
            F.round(F.sum(rev), 2).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .orderBy("n_name")
    )


def top_parts_by_brand(lineitem: DataFrame, part: DataFrame, k: int = 3) -> DataFrame:
    """Top-k parts per brand by shipped quantity — bounded-buffer aggregation,
    no per-brand rank window.

    Aggregate first (shrinks the fact table to |parts| rows), then take the
    top k with k ``max_by`` passes. Each pass is a map-side-combinable
    aggregate whose buffer holds ONE row per brand, so its shuffle moves only
    |brands| x map-partials rows; the winners-so-far set (<= i x |brands|
    rows) anti-joins back with no hint — AQE broadcasts it at runtime. Unlike
    ``Window.partitionBy(p_brand)`` rank, no single task ever sorts a whole
    brand's aggregated parts (~|parts|/|brands| rows, which scales with SF).
    Catalyst reuses the aggregation exchange across the k passes. part scales
    with SF (~200k x SF rows) so it carries no broadcast hint either.
    """
    agg = (
        lineitem.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_partkey", "p_name")
        .agg(F.round(F.sum(F.col("l_quantity").cast(DEC)), 2).cast("double").alias("total_qty"))
        # pin the aggregated set so the k passes + anti-joins read it once
        # instead of re-scanning the fact join per pass (lazy: the first
        # pass's full scan materializes it — A/B at sf0.1: 3.0 -> 2.7 s
        # warm; the window shape it replaces was 1.4 s but single-task per
        # brand at scale)
        .localCheckpoint(eager=False)
    )
    # total order: total_qty desc, p_partkey asc (negated so max_by sees asc)
    ordk = F.struct(F.col("total_qty").alias("q"), (-F.col("p_partkey")).alias("npk"))
    winners: list[DataFrame] = []
    remaining = agg
    for i in range(1, k + 1):
        win = (
            remaining.groupBy("p_brand")
            .agg(F.max_by(F.struct("p_partkey", "p_name", "total_qty"), ordk).alias("w"))
            .select(
                "p_brand",
                F.col("w.p_partkey").alias("p_partkey"),
                F.col("w.p_name").alias("p_name"),
                F.col("w.total_qty").alias("total_qty"),
                F.lit(i).alias("rnk"),
            )
        )
        winners.append(win)
        if i < k:
            remaining = remaining.join(
                win.select("p_brand", "p_partkey"), ["p_brand", "p_partkey"], "left_anti"
            )
    out = winners[0]
    for w in winners[1:]:
        out = out.unionByName(w)
    return out.orderBy("p_brand", "rnk")


def order_priority_counts(orders: DataFrame, lineitem: DataFrame) -> DataFrame:
    """TPC-H Q4-style: orders with at least one late lineitem, by priority.

    The EXISTS is a left-semi join — no row multiplication, and Catalyst
    pushes the l_shipdate predicate into the scan.
    """
    late = lineitem.select("l_orderkey").distinct()
    return (
        orders.join(late, F.col("o_orderkey") == F.col("l_orderkey"), "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


def dedup_by_precedence(df: DataFrame, identifier: str, order_cols: list[str], keep_cols: list[str]) -> DataFrame:
    """Shadowing dedup (SURVEY.md E7): first row wins per identifier under a
    total order. MATLAB path-shadowing semantics (reference
    collection.py:467,517 — first path on the search path wins) generalized.

    row_number over (partition by identifier order by precedence) — the
    partial ordering shuffles once on the identifier; no skew risk at scale
    because identifier cardinality is high; for mega-key skew use
    ``windows.salted_agg`` shapes instead.
    """
    w = Window.partitionBy(identifier).orderBy(*[F.col(c) for c in order_cols])
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .select(identifier, *keep_cols)
    )


def latest_event_per_user(events: DataFrame) -> DataFrame:
    """Concrete E7 instance on the events table: latest event per user
    (ts desc, event_id desc as deterministic tiebreak)."""
    w = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    return (
        events.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("user_id", "event_id", "event_type", "ts")
        .orderBy("user_id")
    )
