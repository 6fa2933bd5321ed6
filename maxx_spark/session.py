"""SparkSession factory tuned for this engine.

Defaults are sized for the sandbox (local[N], 128 GiB, parquet inputs) but
every knob is chosen to also be the right *shape* at cluster scale:

- AQE on (runtime re-planning, skew-join splitting, partition coalescing).
- Arrow enabled and batch-size-bounded (the extraction stage ships BINARY
  html blobs through Arrow; unbounded batches would OOM Python workers).
- shuffle.partitions defaults to cores*2 locally; on a real cluster this is
  overridden (or left to AQE coalescing from a high initial number).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "maxx_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    master = master or os.environ.get("SPARK_GRAFT_MASTER") or f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
    # parse core count out of local[N] for shuffle sizing
    cores = 32
    if master.startswith("local["):
        inner = master[6:-1]
        if inner.isdigit():
            cores = int(inner)
        elif inner == "*":
            cores = os.cpu_count() or 8
    if shuffle_partitions is None:
        shuffle_partitions = max(cores * 2, 8)

    b = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # bound Arrow batches: html BINARY payloads can be large; at 100 TB
        # scale a 10k-row batch of 1 MB pages would be 10 GB in the Python
        # worker — cap well below that.
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "2048")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        # parquet scans: 128 MB splits are the right granularity for both
        # local[32] at sf0.1 and a 1000-executor cluster at 100 TB.
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        .config("spark.sql.shuffle.spill.compress", "true")
        # INT96 (the default) carries no parquet column statistics; the
        # sink's footer-based lineage needs min/max on the event-time column
        .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def load_tables(spark: SparkSession, sf_dir: str, names: tuple[str, ...] | None = None):
    """Load the driver testdata parquet tables as a dict of DataFrames."""
    names = names or (
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    )
    return {n: spark.read.parquet(f"{sf_dir}/{n}.parquet") for n in names}
