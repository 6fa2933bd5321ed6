"""Adaptive input spread for unsplittable / under-partitioned sources.

The optimization guide's input-skew rule (§2.5): "one huge unsplittable
file (gzip), or a partitioned table where one partition holds most of the
data — fix at the source if you can; otherwise repartition immediately
after the read." A parquet file written as a single row group is exactly
that case: Spark assigns splits by byte range but a row group is the unit
of work, so an N-core session decodes — and runs every fused per-row
expression of the first stage (regex normalization, md5 shingling, Arrow
UDF batches) — on ONE task.

``spread_scan(df)`` redistributes rows round-robin to the session's
default parallelism ONLY when the source provides fewer than half that
many partitions. At cluster scale a 100 TB table scans as ~10^5 splits, so
the helper is a no-op there — the condition is runtime-derived from the
actual scan, never a constant tuned to the sandbox. Round-robin (not a
hash on some column) keeps the spread key-free and deterministic: Spark
sorts rows before round-robin assignment (sortBeforeRepartition, on by
default) so retried tasks reproduce the same placement.

Operators call this only in front of HEAVY per-row compute (shingle
hashing, quality regexes, vectorized UDF stages). Cheap pure projections
(hash_split, pii_scan, quality_classifier) deliberately do not: their
scan-speed zero-exchange plans are the right 100 TB shape and an extra
exchange buys nothing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread_scan(df: DataFrame, factor: int = 2) -> DataFrame:
    """Round-robin ``df`` to the session's default parallelism when its
    current partitioning is more than ``factor``x below it. No-op for
    streaming inputs and for already-parallel scans."""
    if df.isStreaming:
        return df
    sc = df.sparkSession.sparkContext
    par = sc.defaultParallelism
    try:
        n = df.rdd.getNumPartitions()
    except Exception:
        return df
    if n * factor >= par:
        return df
    return df.repartition(par)
