"""Unit tests for operators/ranking.range_ranked — the distributed exact
row_number that replaces single-partition windows (vocab ids, stratify
ranks). Pins: exact equality with the window formulation, independence
from partition count, empty input, and the no-unpartitioned-Window plan
property of its consumers."""

import random

from pyspark.sql import Window
from pyspark.sql import functions as F

from maxx_spark.operators.ranking import range_ranked


def _window_rank(df, order_cols, name):
    w = Window.orderBy(*order_cols)
    return df.withColumn(name, (F.row_number().over(w) - 1).cast("long"))


def test_range_ranked_matches_window_row_number(spark):
    rng = random.Random(7)
    rows = [(i, rng.randrange(50), rng.randrange(1000)) for i in range(800)]
    df = spark.createDataFrame(rows, "id long, grp long, val long")
    order = [F.desc("grp"), F.asc("val"), F.asc("id")]  # id = unique tiebreak
    got = {r["id"]: r["rk"] for r in range_ranked(df, order, "rk").collect()}
    want = {r["id"]: r["rk"] for r in _window_rank(df, order, "rk").collect()}
    assert got == want


def test_range_ranked_partition_count_invariant(spark):
    rows = [(i, i % 13) for i in range(300)]
    df = spark.createDataFrame(rows, "id long, grp long")
    order = [F.asc("grp"), F.asc("id")]
    a = {r["id"]: r["rk"] for r in range_ranked(df, order, "rk", num_partitions=2).collect()}
    b = {r["id"]: r["rk"] for r in range_ranked(df, order, "rk", num_partitions=17).collect()}
    assert a == b
    assert sorted(a.values()) == list(range(300))  # contiguous 0-based


def test_range_ranked_empty_and_single_row(spark):
    df = spark.createDataFrame([], "id long, v long")
    assert range_ranked(df, [F.asc("v"), F.asc("id")], "rk").count() == 0
    one = spark.createDataFrame([(5, 9)], "id long, v long")
    [r] = range_ranked(one, [F.asc("v"), F.asc("id")], "rk").collect()
    assert r["rk"] == 0 and r["id"] == 5


def test_range_ranked_property_random(spark):
    """Property check (hypothesis-driven data shapes, deterministic seeds):
    for ANY multiset of (grp, val) rows with a unique id tiebreak and ANY
    partition count, range_ranked == the single-window row_number."""
    from hypothesis import given, settings, strategies as st

    @settings(max_examples=8, deadline=None)
    @given(
        rows=st.lists(
            st.tuples(st.integers(0, 5), st.integers(-50, 50)), min_size=0, max_size=60
        ),
        nparts=st.integers(1, 9),
    )
    def check(rows, nparts):
        df = spark.createDataFrame(
            [(i, g, v) for i, (g, v) in enumerate(rows)], "id long, grp long, val long"
        )
        order = [F.asc("grp"), F.desc("val"), F.asc("id")]
        got = {r["id"]: r["rk"]
               for r in range_ranked(df, order, "rk", num_partitions=nparts).collect()}
        want = {r["id"]: r["rk"] for r in _window_rank(df, order, "rk").collect()}
        assert got == want

    check()
