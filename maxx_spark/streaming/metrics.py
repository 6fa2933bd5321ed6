"""Throughput metrics (E10): a StreamingQueryListener recording per-batch
input rows, processing time, and rows/sec — the figures BENCH/BASELINE.md
reports for the two-parallelism scaling criterion."""

from __future__ import annotations

import json
import threading

from pyspark.sql.streaming import StreamingQueryListener


class ThroughputListener(StreamingQueryListener):
    def __init__(self):
        self._lock = threading.Lock()
        self.batches: list[dict] = []

    def onQueryStarted(self, event):  # noqa: N802
        pass

    def onQueryProgress(self, event):  # noqa: N802
        p = event.progress
        with self._lock:
            self.batches.append(
                {
                    "batch_id": p.batchId,
                    "num_input_rows": p.numInputRows,
                    "duration_ms": (p.durationMs or {}).get("triggerExecution"),
                    # full engine breakdown (addBatch/getBatch/latestOffset/
                    # queryPlanning/walCommit/commitOffsets) — the per-batch
                    # FIXED-cost ledger the scaling protocol optimizes against
                    "duration_breakdown_ms": dict(p.durationMs or {}),
                    "rows_per_sec": p.processedRowsPerSecond,
                }
            )

    def onQueryTerminated(self, event):  # noqa: N802
        pass

    def onQueryIdle(self, event):  # noqa: N802
        pass

    def summary(self) -> dict:
        with self._lock:
            bs = [b for b in self.batches if b["num_input_rows"]]
        rows = sum(b["num_input_rows"] for b in bs)
        secs = sum((b["duration_ms"] or 0) for b in bs) / 1000.0
        return {
            "batches": len(bs),
            "input_rows": rows,
            "wall_s": round(secs, 3),
            "rows_per_sec": round(rows / secs, 2) if secs else None,
            "detail": bs,
        }

    def dump(self, path: str) -> None:
        with open(path, "w") as f:
            json.dump(self.summary(), f, indent=2)
