"""Temporal joins (as-of, range, funnel) and the search-path registry."""

import datetime as dt

from pyspark.sql import functions as F

from maxx_spark.operators.joins import asof_join, funnel_counts, value_band_counts
from maxx_spark.operators.searchpath import SearchPath


def test_asof_join_semantics(spark):
    t = dt.datetime(2024, 1, 1)

    def ts(m):
        return t + dt.timedelta(minutes=m)

    left = spark.createDataFrame(
        [(1, ts(10), 100), (1, ts(20), 101), (2, ts(5), 102)],
        "user_id long, ts timestamp, lid long",
    )
    right = spark.createDataFrame(
        [(1, ts(9), 900), (1, ts(15), 901), (1, ts(20), 902), (3, ts(1), 903)],
        "user_id long, r_ts timestamp, rid long",
    )
    out = {
        r["lid"]: r["r_rid"]
        for r in asof_join(left, right, "user_id", "ts", "r_ts", ["rid"]).collect()
    }
    assert out[100] == 900  # latest right at or before ts(10) is ts(9)
    assert out[101] == 902  # equal timestamps match (>= rule)
    assert out[102] is None  # no right rows for user 2 → left kept with NULL


def test_value_band_counts_match_plain(spark, sf_dir):
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    got = {r["band_id"]: r["n_events"] for r in value_band_counts(events).collect()}
    want = {
        r["b"]: r["n"]
        for r in events.where("value >= 0 and value < 200")
        .select(F.floor(F.col("value") / 25).cast("int").alias("b"))
        .groupBy("b")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert got == want


def test_funnel_counts(spark, sf_dir):
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    rows = funnel_counts(events).collect()
    # sanity: every funnel count is at most that user's purchase count
    purchases = {
        r["user_id"]: r["n"]
        for r in events.where("event_type = 'purchase'")
        .groupBy("user_id").agg(F.count("*").alias("n")).collect()
    }
    for r in rows:
        assert 0 < r["n_funnels"] <= purchases[r["user_id"]]


def test_searchpath_precedence(spark):
    from maxx_spark.extract import extract_code_units
    from maxx_spark.gen import generate_pages_df

    units = extract_code_units(generate_pages_df(spark, n_projects=1, n_filler=0)).cache()
    top = "https://mega-mat.example.com/matlab/toolbox"
    sub = f"{top}/subdir"

    win_top = SearchPath([top, sub]).resolve(units).where(
        (F.col("unit_path") == "accumulate") & (F.col("kind") == "function")
    ).first()
    assert "/subdir/" not in win_top["url"]

    win_sub = SearchPath([sub, top]).resolve(units).where(
        (F.col("unit_path") == "accumulate") & (F.col("kind") == "function")
    ).first()
    assert "/subdir/" in win_sub["url"]

    # rmpath restores the other winner; addpath(to_end) does not shadow
    sp = SearchPath([sub, top]).rmpath(sub).addpath(sub, to_end=True)
    win = sp.resolve(units).where(
        (F.col("unit_path") == "accumulate") & (F.col("kind") == "function")
    ).first()
    assert "/subdir/" not in win["url"]


def test_cohort_retention_matrix(spark):
    """Hand-built two-week cohort: users first seen in week A or week B;
    the (cohort, active) matrix counts distinct users, and trunc(min) ≡
    min(trunc) (a user's first partial week anchors their cohort)."""
    from maxx_spark.operators.windows import cohort_retention

    def t(day, hour=12):
        return dt.datetime(2024, 1, day, hour)  # 2024-01-01 is a Monday

    rows = [
        # u1: first event wk1, active wk1+wk2 (two events in wk2 -> still 1 user)
        (1, t(2), 10.0), (1, t(9), 10.0), (1, t(10), 10.0),
        # u2: first event wk1 only
        (2, t(3), 10.0),
        # u3: first event wk2 only
        (3, t(8), 10.0),
    ]
    events = spark.createDataFrame(
        [(i, ts, uid, "click", v, "{}") for i, (uid, ts, v) in enumerate(rows)],
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    )
    out = {(r["cohort_week"], r["active_week"]): r["n_users"] for r in cohort_retention(events).collect()}
    wk1, wk2 = dt.datetime(2024, 1, 1), dt.datetime(2024, 1, 8)
    assert out == {(wk1, wk1): 2, (wk1, wk2): 1, (wk2, wk2): 1}


def test_event_funnel_strict_order(spark):
    """q64: chained strict-order funnel — a click at the SAME timestamp as
    the view does not advance the funnel (strict >), click-before-view
    does not count, and conversion per-mille is vs the entry step."""
    import datetime as dt

    from maxx_spark.operators.windows import event_funnel

    t = lambda m: dt.datetime(2024, 1, 1, 0, m)
    rows = [
        # u1: full ordered funnel
        (1, t(0), "view"), (1, t(1), "click"), (1, t(2), "purchase"),
        # u2: click BEFORE view -> stalls at step 0 (purchase needs click-after-view)
        (2, t(0), "click"), (2, t(1), "view"), (2, t(2), "purchase"),
        # u3: view then purchase, no click -> step 0 only
        (3, t(0), "view"), (3, t(1), "purchase"),
        # u4: never views -> not in funnel at all
        (4, t(0), "click"), (4, t(1), "purchase"),
        # u5: click at the SAME ts as view -> strict > rejects it
        (5, t(0), "view"), (5, t(0), "click"),
    ]
    events = spark.createDataFrame(
        [(i, ts, uid, et, 1.0, "{}") for i, (uid, ts, et) in enumerate(rows)],
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    )
    out = {r["step_idx"]: r for r in event_funnel(events).collect()}
    assert [(out[i]["step"], out[i]["n_users"]) for i in range(3)] == [
        ("view", 4), ("click", 1), ("purchase", 1)
    ]
    assert [out[i]["conv_pm"] for i in range(3)] == [1000, 250, 250]


def test_session_paths_gap_and_order(spark):
    """q66: 30-min-gap sessionization on exact microsecond longs, paths in
    strict (ts, event_id) order (same-ts events break by event_id), first-8
    truncation, and the (n_sessions DESC, path ASC) top-k total order."""
    import datetime as dt

    from maxx_spark.operators.windows import session_event_paths

    t = lambda m: dt.datetime(2024, 1, 1, 0) + dt.timedelta(minutes=m)
    rows = [
        # u1: one session (0,1,2 min), then a 60-min gap -> second session
        (1, t(0), "view"), (1, t(1), "click"), (1, t(2), "purchase"), (1, t(70), "view"),
        # u2: 29-min gap stays in-session (gap is strict >30min); then new
        (2, t(0), "view"), (2, t(29), "click"), (2, t(90), "view"),
        # u3: 10 views in one session -> path truncates to 8
        *[(3, t(i), "view") for i in range(10)],
        # u4: two events at the SAME ts -> event_id (insertion order) decides
        (4, t(0), "click"), (4, t(0), "view"),
    ]
    events = spark.createDataFrame(
        [(i, ts, uid, et, 1.0, "{}") for i, (uid, ts, et) in enumerate(rows)],
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    )
    out = [(r["path"], r["n_sessions"], r["n_users"]) for r in session_event_paths(events).collect()]
    assert out == [
        ("view", 2, 2),                      # u1 session 2, u2 session 2
        ("click>view", 1, 1),                # u4: same-ts, event_id order
        ("view>click", 1, 1),                # u2 session 1 (29-min gap held)
        ("view>click>purchase", 1, 1),       # u1 session 1
        ("view>view>view>view>view>view>view>view", 1, 1),  # u3 truncated at 8
    ]
