"""E6 on the ``transformWithState`` API (Spark 4 StatefulProcessor).

The north rule names "a stateful stream-stream join in transformWithState/
applyInPandasWithState"; ``resolver.py`` implements the applyInPandasWithState
form, this module the transformWithState form — same contract, same salted
tick-key discipline, but with first-class per-key event-time TIMERS instead
of a single timeout timestamp, and RocksDB-backed keyed state (the API
requires the RocksDB provider, which is also the 100 TB configuration).

Semantics (identical to resolver._resolve_fn): one state key per
(host, identifier); *definition* events resolve queued *needs* immediately
and flip the key to resolved; needs with no definition wait in state; a
per-key event-time timer 10 minutes past the newest event flushes the
still-unresolved needs and clears the state.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.stateful_processor import (
    ExpiredTimerInfo,
    StatefulProcessor,
    StatefulProcessorHandle,
    TimerValues,
)

from maxx_spark.streaming.resolver import RESOLVE_OUT, TICK_PREFIX, _tick_key
from maxx_spark.operators.codeunits import with_host

_EVICT_MS = 600_000  # 10 minutes of event time past the newest event


class _ResolveProcessor(StatefulProcessor):
    def init(self, handle: StatefulProcessorHandle) -> None:
        self._handle = handle
        self._state = handle.getValueState(
            "resolve", "def_kind string, pending array<string>, timer_ms bigint"
        )

    def handleInputRows(self, key, rows, timerValues: TimerValues) -> Iterator[pd.DataFrame]:
        host, ident = key[0], key[1]
        if ident.startswith(TICK_PREFIX):  # clock tick — watermark driver only
            for _ in rows:
                pass
            return
        if self._state.exists():
            def_kind, pending, old_timer = self._state.get()
            pending = list(pending or [])
        else:
            def_kind, pending, old_timer = None, [], None

        out: list[tuple] = []
        max_ts = 0
        for pdf in rows:
            for side, path, kind, ts in zip(
                pdf["side"], pdf["unit_path"], pdf["kind"], pdf["warc_ts"]
            ):
                ts_ms = int(pd.Timestamp(ts).value // 1_000_000) if ts is not None else 0
                max_ts = max(max_ts, ts_ms)
                if side == "def":
                    if def_kind is None:
                        def_kind = kind
                        out.extend((host, ident, d, True, def_kind) for d in pending)
                        pending = []
                else:  # need
                    if def_kind is not None:
                        out.append((host, ident, path, True, def_kind))
                    else:
                        pending.append(path)

        new_timer = max_ts + _EVICT_MS
        if old_timer is not None and old_timer != new_timer:
            self._handle.deleteTimer(old_timer)
        self._handle.registerTimer(new_timer)
        self._state.update((def_kind, pending, new_timer))
        if out:
            yield pd.DataFrame(out, columns=RESOLVE_OUT.fieldNames())

    def handleExpiredTimer(
        self, key, timerValues: TimerValues, expiredTimerInfo: ExpiredTimerInfo
    ) -> Iterator[pd.DataFrame]:
        host, ident = key[0], key[1]
        if not self._state.exists():
            return
        def_kind, pending, timer_ms = self._state.get()
        if timer_ms != expiredTimerInfo.getExpiryTimeInMs():
            return  # stale timer superseded by a newer event
        rows = [(host, ident, d, False, None) for d in (pending or [])]
        self._state.clear()
        if rows:
            yield pd.DataFrame(rows, columns=RESOLVE_OUT.fieldNames())

    def close(self) -> None:
        pass


def resolve_bases_tws(units: DataFrame, delay: str = "10 minutes") -> DataFrame:
    """transformWithState twin of resolver.resolve_bases_stream — identical
    def/need/tick routing (no filter below the watermark), per-key
    event-time timers for unresolved flush + state eviction."""
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
    return both.groupBy("host", "identifier").transformWithStateInPandas(
        statefulProcessor=_ResolveProcessor(),
        outputStructType=RESOLVE_OUT,
        outputMode="Append",
        timeMode="EventTime",
    )
