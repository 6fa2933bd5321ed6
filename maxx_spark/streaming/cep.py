"""Streaming CEP: per-user strict-order funnel matching — the streaming
twin of ``operators/windows.event_funnel`` (q64), built on
``applyInPandasWithState`` with event-time timers.

Semantics (identical to the batch mirror): a user advances to step k on the
FIRST event of type ``steps[k]`` whose timestamp is STRICTLY after the
user's step-(k-1) time (first-touch). Out-of-order arrival cannot change
the match: incoming events are buffered in state and replayed in
(ts, event_id) order only once the event-time watermark has passed them —
the same finalize-below-the-watermark discipline Spark's own windowed
aggregates use, so a network-reordered stream and the batch mirror emit the
same (user, step) set whenever the watermark ``delay`` covers the arrival
disorder (events later than that are dropped by Spark's watermark filter
before reaching the operator — the standard contract, identical to E2).
Because finalized events are replayed in event-time order and anything
older than the watermark can never arrive, a finalized event that does not
match the user's current step is discarded exactly — no earlier-ts event
can appear afterwards to change the machine's past. Completed funnels drop their state immediately;
incomplete funnels are evicted by an event-time timer ``deadline`` past the
user's newest event (state is bounded by ACTIVE users in the deadline
horizon, not by corpus history — the E6 lesson, resolver.py:118).

No filter sits between ``withWatermark`` and the stateful operator
(CLAUDE.md invariant: Catalyst would push it below the watermark node and
freeze the clock): every event of every type reaches its user's key;
non-step types merely advance the user's clock and are never buffered.

Scale: one shuffle, keyed by uniform user_id. Per-user state holds only
not-yet-finalized step-type events inside the watermark delay plus at most
len(steps) matched timestamps — arrival-rate bounded, not history bounded.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

FUNNEL_OUT = StructType(
    [
        StructField("user_id", LongType()),
        StructField("step_idx", IntegerType()),
        StructField("step", StringType()),
        StructField("step_ts_ms", LongType()),
    ]
)

FUNNEL_STATE = StructType(
    [
        StructField("buf_ts", ArrayType(LongType())),
        StructField("buf_id", ArrayType(LongType())),
        StructField("buf_type", ArrayType(StringType())),
        StructField("step_ts", ArrayType(LongType())),
        StructField("max_ts", LongType()),
    ]
)


def _ts_ms(ts) -> int:
    if ts is None:
        return 0
    return int(pd.Timestamp(ts).value // 1_000_000)


def _make_funnel_fn(steps: tuple[str, ...], deadline_ms: int):
    def fn(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
        (user_id,) = key
        if state.exists:
            buf_ts, buf_id, buf_type, step_ts, max_ts = state.get
            buf = list(zip(buf_ts, buf_id, buf_type))
            step_ts = list(step_ts)
        else:
            buf, step_ts, max_ts = [], [], 0
        was_complete = len(step_ts) >= len(steps)

        if not state.hasTimedOut:  # timer firings carry no input rows
            # buffer only types that can still match: steps only advance,
            # so anything outside the REMAINING suffix can never be used —
            # per-user state shrinks as the funnel progresses (a bot
            # re-sending completed-step types buffers nothing)
            remaining = set(steps[len(step_ts):])
            for pdf in pdfs:
                for ts, eid, etype in zip(pdf["ts"], pdf["event_id"], pdf["event_type"]):
                    ms = _ts_ms(ts)
                    max_ts = max(max_ts, ms)
                    if etype in remaining:  # other types only advance the clock
                        buf.append((ms, int(eid), str(etype)))

        # finalize: replay events at or below the watermark in strict
        # (ts, event_id) order; later events stay buffered
        wm = state.getCurrentWatermarkMs()
        # STRICTLY below the watermark only (r6 advisory): Spark's late
        # filter admits an event with ts exactly equal to the watermark, so
        # finalizing at <= wm could order a same-ms straggler after events
        # already replayed — ts == wm stays buffered until wm passes it
        ripe = sorted(ev for ev in buf if ev[0] < wm)
        buf = [ev for ev in buf if ev[0] >= wm]
        out: list[tuple] = []
        for ms, eid, etype in ripe:
            if len(step_ts) >= len(steps):
                break
            need = steps[len(step_ts)]
            if etype == need and (not step_ts or ms > step_ts[-1]):
                step_ts.append(ms)
                out.append((user_id, len(step_ts) - 1, need, ms))

        if state.hasTimedOut and was_complete:
            state.remove()  # tombstone past its deadline: evict
        elif len(step_ts) >= len(steps):
            # complete: keep a TOMBSTONE (steps full, buffer empty) so
            # post-completion events cannot RESTART the funnel — removing
            # immediately made a mega-user re-enter and re-emit (caught by
            # the r6 skew bench: rows_out inflated, throughput -34%). The
            # deadline timer evicts the tombstone; an active user keeps
            # re-arming it, so no-re-entry holds for the whole active
            # horizon (the standard streaming-state guarantee bound).
            state.update(([], [], [], step_ts, max_ts))
            state.setTimeoutTimestamp(max(max_ts, wm) + deadline_ms)
        elif state.hasTimedOut and not buf and wm >= max_ts + deadline_ms:
            state.remove()  # idle past the deadline: expire the funnel
        else:
            state.update(
                (
                    [ev[0] for ev in buf],
                    [ev[1] for ev in buf],
                    [ev[2] for ev in buf],
                    step_ts,
                    max_ts,
                )
            )
            if buf:
                # ripeness timer: groups get NO further invocations without
                # input, so re-fire just past the earliest buffered event
                # (strictly ahead of wm — anything < wm was finalized above)
                state.setTimeoutTimestamp(min(ev[0] for ev in buf) + 1)
            else:
                # expiry timer: deadline past the newer of user clock and
                # watermark (timestamps behind the watermark throw)
                state.setTimeoutTimestamp(max(max_ts, wm) + deadline_ms)
        if out:
            yield pd.DataFrame(out, columns=FUNNEL_OUT.fieldNames())

    return fn


def funnel_stream(
    events: DataFrame,
    steps: tuple[str, ...] = ("view", "click", "purchase"),
    delay: str = "10 minutes",
    deadline: str = "1 hour",
) -> DataFrame:
    """Attach the streaming funnel to a (streaming or batch) events frame
    with columns (user_id, event_id, event_type, ts). Emits one append-mode
    row per (user, reached step) with the first-touch event time;
    ``groupBy(step_idx).count()`` over a drained stream equals q64's
    n_users column (parity pinned by test_streaming_funnel_*)."""
    _UNITS = {"second": 1, "seconds": 1, "minute": 60, "minutes": 60,
              "hour": 3600, "hours": 3600}
    try:
        n, unit = deadline.split()
        deadline_ms = int(n) * _UNITS[unit] * 1000
    except (ValueError, KeyError):
        raise ValueError(
            f"deadline must look like '<n> second(s)|minute(s)|hour(s)', got {deadline!r}"
        ) from None
    e = events.select("user_id", "event_id", "event_type", "ts").withWatermark("ts", delay)
    return e.groupBy("user_id").applyInPandasWithState(
        _make_funnel_fn(tuple(steps), deadline_ms),
        FUNNEL_OUT,
        FUNNEL_STATE,
        "append",
        GroupStateTimeout.EventTimeTimeout,
    )


# ---------------------------------------------------------------------------
# Streaming session-path assembly (streaming twin of q66)
# ---------------------------------------------------------------------------

PATHS_OUT = StructType(
    [
        StructField("user_id", LongType()),
        StructField("session_start_ms", LongType()),
        StructField("path", StringType()),
        StructField("n_events", IntegerType()),
    ]
)

PATHS_STATE = StructType(
    [
        StructField("buf_ts", ArrayType(LongType())),
        StructField("buf_id", ArrayType(LongType())),
        StructField("buf_type", ArrayType(StringType())),
        # open session, O(max_len) regardless of session length: only the
        # HEAD (first max_len finalized (ts, type) pairs — all the path
        # ever renders), the last event ts (the gap horizon), and the
        # event count. A bot streaming one endless session grows NOTHING.
        StructField("cur_ts", ArrayType(LongType())),
        StructField("cur_type", ArrayType(StringType())),
        StructField("cur_last", LongType()),
        StructField("cur_n", IntegerType()),
    ]
)


def _make_paths_fn(gap_ms: int, max_len: int):
    def fn(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
        (user_id,) = key
        if state.exists:
            buf_ts, buf_id, buf_type, cur_ts, cur_type, cur_last, cur_n = state.get
            buf = list(zip(buf_ts, buf_id, buf_type))
            head = list(zip(cur_ts, cur_type))
        else:
            buf, head, cur_last, cur_n = [], [], 0, 0

        if not state.hasTimedOut:
            for pdf in pdfs:
                for ts, eid, etype in zip(pdf["ts"], pdf["event_id"], pdf["event_type"]):
                    buf.append((_ts_ms(ts), int(eid), str(etype)))

        wm = state.getCurrentWatermarkMs()
        # STRICTLY below the watermark only (r6 advisory): Spark's late
        # filter admits an event with ts exactly equal to the watermark, so
        # finalizing at <= wm could order a same-ms straggler after events
        # already replayed — ts == wm stays buffered until wm passes it
        ripe = sorted(ev for ev in buf if ev[0] < wm)
        buf = [ev for ev in buf if ev[0] >= wm]

        out: list[tuple] = []

        def close():
            out.append(
                (user_id, head[0][0], ">".join(t for _, t in head), cur_n)
            )

        for ms, eid, etype in ripe:
            if cur_n and ms > cur_last + gap_ms:
                close()
                head, cur_n = [], 0
            if cur_n < max_len:
                head.append((ms, etype))
            cur_last, cur_n = ms, cur_n + 1
        # the open session closes once the WATERMARK has passed its gap —
        # no event at or below cur_last + gap can arrive anymore
        if cur_n and wm > cur_last + gap_ms:
            close()
            head, cur_n = [], 0

        if not cur_n and not buf:
            if state.exists:
                state.remove()  # nothing pending: a future event recreates state
        else:
            state.update(
                (
                    [ev[0] for ev in buf],
                    [ev[1] for ev in buf],
                    [ev[2] for ev in buf],
                    [e[0] for e in head],
                    [e[1] for e in head],
                    cur_last,
                    cur_n,
                )
            )
            if buf:
                state.setTimeoutTimestamp(min(ev[0] for ev in buf) + 1)
            else:  # open session only: fire once its gap elapses
                state.setTimeoutTimestamp(max(cur_last + gap_ms, wm) + 1)
        if out:
            yield pd.DataFrame(out, columns=PATHS_OUT.fieldNames())

    return fn


def session_paths_stream(
    events: DataFrame,
    gap_seconds: int = 1800,
    max_len: int = 8,
    delay: str = "10 minutes",
) -> DataFrame:
    """Streaming twin of ``operators/windows.session_event_paths`` (q66):
    gap-based session assembly per user with watermark-ordered replay.
    Emits one append-mode row per CLOSED session — a session closes when an
    in-order event lands beyond the gap, or when the watermark itself
    passes the gap horizon (an event-time timer fires the flush, so idle
    sessions emit without waiting for more traffic). State per user =
    not-yet-finalized events inside the watermark delay + O(max_len) for
    the open session (head types + last ts + count — a bot streaming one
    endless session grows NOTHING with session length) — arrival-rate
    bounded. groupBy(path) counts over a drained stream equal the batch
    mirror's n_sessions (parity pinned by test)."""
    e = events.select("user_id", "event_id", "event_type", "ts").withWatermark("ts", delay)
    return e.groupBy("user_id").applyInPandasWithState(
        _make_paths_fn(int(gap_seconds) * 1000, max_len),
        PATHS_OUT,
        PATHS_STATE,
        "append",
        GroupStateTimeout.EventTimeTimeout,
    )
