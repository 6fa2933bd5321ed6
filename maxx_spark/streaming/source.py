"""Streaming source (E1). Iceberg-shaped: ``readStream.table`` when a
catalog is configured; parquet-directory stream otherwise (the sandbox
path). ``maxFilesPerTrigger`` bounds micro-batch size — the knob that keeps
per-batch state/shuffle memory flat at any input backlog."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from maxx_spark.schema import PAGES


def pages_stream(
    spark: SparkSession,
    path_or_table: str,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    if "/" not in path_or_table:  # catalog table name
        return spark.readStream.table(path_or_table)
    r = spark.readStream.schema(PAGES)
    if max_files_per_trigger:
        r = r.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return r.parquet(path_or_table)


def stage_pages_dir(spark: SparkSession, out_dir: str, n_chunks: int = 4, **gen_kwargs) -> int:
    """Write the synthetic pages table as N parquet files (micro-batch
    boundaries for tests/bench). Returns total row count."""
    from maxx_spark.gen import generate_pages_rows

    rows = generate_pages_rows(**gen_kwargs)
    chunk = (len(rows) + n_chunks - 1) // n_chunks
    for i in range(n_chunks):
        part = rows[i * chunk : (i + 1) * chunk]
        if not part:
            continue
        spark.createDataFrame(part, PAGES).coalesce(1).write.mode(
            "append"
        ).parquet(out_dir)
    return len(rows)
