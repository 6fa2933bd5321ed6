"""Layer E — the Structured Streaming engine (SURVEY.md §2.2).

- ``source``: file-stream source (Iceberg-shaped; parquet-dir fallback).
- ``pipeline``: watermarked extraction + tumbling/sliding/session window
  queries (the streaming twins of ``operators.windows``).
- ``sink``: exactly-once idempotent foreachBatch sink with commit log and
  per-partition lineage (E9/E10).
- ``resolver``: stateful cross-file resolution — class-folder assembly and
  out-of-order base-class joins in ``applyInPandasWithState`` (E5/E6).
- ``metrics``: StreamingQueryListener throughput recorder.
"""
