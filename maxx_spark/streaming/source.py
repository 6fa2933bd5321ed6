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


def stage_heavy_pages(
    spark: SparkSession, out_dir: str, n_pages: int, n_files: int = 64
) -> int:
    """Distributed staging of a large heavyweight pages table (throughput
    benchmarking): ~11 KB classdef sources cycled from gen.HEAVY_TEMPLATES,
    a 50% mega-host skew, and monotone-with-jitter event times. Generation
    runs in Spark (spark.range), not on the driver."""
    from pyspark.sql import functions as F

    from maxx_spark.gen import HEAVY_TEMPLATES

    tpl = F.array(*[F.lit(t) for t in HEAVY_TEMPLATES])
    df = (
        spark.range(n_pages)
        .withColumn(
            "host",
            F.when(F.col("id") % 2 == 0, F.lit("mega-mat.example.com")).otherwise(
                F.concat(F.lit("proj"), (F.col("id") % 64).cast("string"), F.lit(".example.org"))
            ),
        )
        .select(
            F.concat(
                F.lit("https://"), F.col("host"), F.lit("/toolbox/Heavy"),
                (F.col("id") % 4).cast("string"), F.lit("_"), F.col("id").cast("string"),
                F.lit(".m"),
            ).alias("url"),
            (
                F.lit("2024-03-01 00:00:00").cast("timestamp")
                + (F.col("id") % 86400) * F.expr("INTERVAL 1 SECOND")
            ).alias("warc_ts"),
            F.lit(None).cast("binary").alias("html"),
            F.element_at(tpl, (F.col("id") % 4 + 1).cast("int")).alias("text"),
            F.lit("matlab").alias("lang"),
        )
    )
    df.repartition(n_files).write.mode("overwrite").parquet(out_dir)
    return n_pages
