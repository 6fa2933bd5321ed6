"""Stateful streaming resolution (E5/E6) — ``applyInPandasWithState``.

E6 — out-of-order base-class join: both sides of the reference's lazy
``Alias.target`` / ``Class.resolved_bases`` resolution (objects.py:602-618,
794-808) are routed to one state key ``(host, identifier)``:

- a *definition* event when a unit with ``unit_path == identifier`` arrives;
- a *need* event when a class naming that identifier as a base arrives.

Whichever side arrives first waits in state; matches emit immediately, so
arrival order never changes the output set. Event-time timeout (driven by
the watermark) flushes needs whose base never arrives as unresolved rows —
bounding state exactly like the reference's debug-and-skip path.

E5 — class-folder assembly: member files of ``@Cls/`` fold into keyed state
``(host, class_path)``; the session-gap timeout emits one assembled row per
class folder (the streaming twin of ``_collect_classfolder``,
collection.py:230-270).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from maxx_spark.operators.codeunits import with_host

# Clock-tick sentinel keys. Rows that carry no def/need/member payload must
# still REACH the stateful operator (a filter between withWatermark and the
# stateful op gets pushed below the EventTimeWatermark node and freezes the
# clock — see CLAUDE.md), but they only need to touch *a* key to advance it,
# not the same key: the salt spreads tick traffic over TICK_SALT state keys
# per host, so a mega-host's ticks never funnel through one task (VERDICT r1
# flagged the unsalted (host, '') key as a 50%-of-stream hot key). The \t
# prefix cannot collide with real identifiers or @ClassFolder names.
TICK_PREFIX = "\ttick:"
TICK_SALT = 64


def _tick_key():
    return F.concat(
        F.lit(TICK_PREFIX), F.pmod(F.xxhash64(F.col("url")), F.lit(TICK_SALT)).cast("string")
    )


RESOLVE_OUT = StructType(
    [
        StructField("host", StringType()),
        StructField("identifier", StringType()),
        StructField("derived", StringType()),
        StructField("resolved", BooleanType()),
        StructField("base_kind", StringType()),
    ]
)

RESOLVE_STATE = StructType(
    [
        StructField("def_kind", StringType()),
        StructField("pending", ArrayType(StringType())),
        StructField("max_ts_ms", LongType()),
    ]
)


def _resolve_fn(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
    host, ident = key
    if ident.startswith(TICK_PREFIX):  # clock tick — advances the watermark only
        for _ in pdfs:
            pass
        return
    if state.exists:
        def_kind, pending, max_ts = state.get
        pending = list(pending or [])
    else:
        def_kind, pending, max_ts = None, [], 0

    if state.hasTimedOut:
        rows = [(host, ident, d, False, None) for d in pending]
        state.remove()
        if rows:
            yield pd.DataFrame(rows, columns=RESOLVE_OUT.fieldNames())
        return

    out: list[tuple] = []
    for pdf in pdfs:
        for side, path, kind, ts in zip(pdf["side"], pdf["unit_path"], pdf["kind"], pdf["warc_ts"]):
            ts_ms = int(pd.Timestamp(ts).value // 1_000_000) if ts is not None else 0
            max_ts = max(max_ts, ts_ms)
            if side == "def":
                if def_kind is None:
                    def_kind = kind
                    for d in pending:
                        out.append((host, ident, d, True, def_kind))
                    pending = []
            else:  # need
                if def_kind is not None:
                    out.append((host, ident, path, True, def_kind))
                else:
                    pending.append(path)

    state.update((def_kind, pending, max_ts))
    # state eviction horizon: 10 minutes of event time past the newest event
    state.setTimeoutTimestamp(max_ts + 600_000)
    if out:
        yield pd.DataFrame(out, columns=RESOLVE_OUT.fieldNames())


def resolve_bases_stream(units: DataFrame, delay: str = "10 minutes") -> DataFrame:
    """E6 over a (streaming or batch) code_units DataFrame.

    Neither branch filters below the watermark: rows that are not a def
    (e.g. kind='error' pages) or not a need (explode_outer keeps base-less
    rows) are mapped to salted tick keys and consumed by _resolve_fn, so a
    micro-batch of only error pages still advances the event clock and
    flushes pending unresolved bases (ADVICE r1: the old kind-filters froze
    the watermark on error-only batches)."""
    u = with_host(units).withWatermark("warc_ts", delay)
    is_def = F.col("kind").isin("class", "function", "script", "live_script")
    defs = u.select(
        "host",
        F.when(is_def, F.col("unit_path")).otherwise(_tick_key()).alias("identifier"),
        F.when(is_def, F.lit("def")).otherwise(F.lit("tick")).alias("side"),
        "unit_path",
        "kind",
        "warc_ts",
    )
    is_need = (F.col("kind") == "class") & F.col("base_name").isNotNull()
    needs = (
        u.select(
            "host",
            F.explode_outer("bases").alias("base_name"),
            "unit_path",
            "kind",
            "warc_ts",
            "url",
        )
        .select(
            "host",
            F.when(is_need, F.col("base_name")).otherwise(_tick_key()).alias("identifier"),
            F.when(is_need, F.lit("need")).otherwise(F.lit("tick")).alias("side"),
            "unit_path",
            "kind",
            "warc_ts",
        )
    )
    both = defs.unionByName(needs)
    return both.groupBy("host", "identifier").applyInPandasWithState(
        _resolve_fn,
        RESOLVE_OUT,
        RESOLVE_STATE,
        "append",
        GroupStateTimeout.EventTimeTimeout,
    )


# ---------------------------------------------------------------------------
# E5: class-folder assembly
# ---------------------------------------------------------------------------

ASSEMBLE_OUT = StructType(
    [
        StructField("host", StringType()),
        StructField("class_path", StringType()),
        StructField("n_member_files", IntegerType()),
        StructField("member_files", ArrayType(StringType())),
        StructField("has_classdef", BooleanType()),
    ]
)

ASSEMBLE_STATE = StructType(
    [
        StructField("members", ArrayType(StringType())),
        StructField("has_classdef", BooleanType()),
        StructField("max_ts_ms", LongType()),
    ]
)


def _assemble_fn(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
    host, class_path = key
    if class_path.startswith(TICK_PREFIX):  # clock tick — advances the watermark only
        for _ in pdfs:
            pass
        return
    if state.exists:
        members, has_classdef, max_ts = state.get
        members = list(members or [])
    else:
        members, has_classdef, max_ts = [], False, 0

    if state.hasTimedOut:
        yield pd.DataFrame(
            [(host, class_path, len(members), sorted(members), bool(has_classdef))],
            columns=ASSEMBLE_OUT.fieldNames(),
        )
        state.remove()
        return

    for pdf in pdfs:
        for stem, kind, ts in zip(pdf["stem"], pdf["kind"], pdf["warc_ts"]):
            ts_ms = int(pd.Timestamp(ts).value // 1_000_000) if ts is not None else 0
            max_ts = max(max_ts, ts_ms)
            if stem not in members:
                members.append(stem)
            if kind == "class":
                has_classdef = True

    state.update((members, has_classdef, max_ts))
    state.setTimeoutTimestamp(max_ts + 120_000)  # session gap: 2 min event time


def assemble_classfolders_stream(units: DataFrame, delay: str = "10 minutes") -> DataFrame:
    """E5: one assembled row per (host, @ClassFolder) emitted when the
    session gap elapses in event time."""
    u = with_host(units).withWatermark("warc_ts", delay)
    stem = F.regexp_extract(F.col("url"), r"/([^/]+)\.m$", 1)
    # NO filter between the watermark node and the stateful operator:
    # Catalyst pushes filters below EventTimeWatermark, and a filtered-out
    # page would then stop advancing the event clock. Non-classfolder rows
    # map to salted tick keys and are consumed as clock ticks in the state
    # fn (salted so a mega-host's ticks spread over TICK_SALT keys instead
    # of hammering one state task).
    is_cf_file = F.col("url").rlike(r"/@[^/]+/") & (
        (F.col("kind") == "class")
        | ((F.col("kind") == "function") & (F.col("name") == stem))
    )
    cf = u.select(
        "host",
        F.when(is_cf_file, F.regexp_extract(F.col("url"), r"/@([^/]+)/", 1))
        .otherwise(_tick_key())
        .alias("class_path"),
        stem.alias("stem"),
        "kind",
        "warc_ts",
    )
    return cf.groupBy("host", "class_path").applyInPandasWithState(
        _assemble_fn,
        ASSEMBLE_OUT,
        ASSEMBLE_STATE,
        "append",
        GroupStateTimeout.EventTimeTimeout,
    )
