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
import shutil
import tempfile

from pyspark.sql import SparkSession


def _warm_session(spark: SparkSession, cores: int) -> None:
    """One-time session warmup (fixed ~5-7 s, data-independent, disable
    with SPARK_GRAFT_WARMUP=0). Deliberate targets, each measured to
    otherwise land inside the FIRST user query that needs them:

    1. the Python worker pool — worker spawn is ~60-100 ms each and pool
       growth happens lazily at the first Arrow-batched stage wide enough
       to need it (the r4 extract order A/B measured the same effect on the
       extraction stage: first-in-session runs ~2x slower purely from
       per-worker import + spawn; bench.py warms extraction for exactly
       this reason — this generalizes the contract to every pandas/Arrow
       operator);
    2. whole-stage-codegen + parquet read/write machinery — Janino, the
       vectorized parquet reader, hash-agg and shuffle paths JIT on first
       use; a tiny synthetic roundtrip moves that out of the first queries.

    Everything here is synthetic (spark.range), nothing touches input data
    or caches results — it is JVM/worker warmup, not precomputation."""
    from pyspark.sql import functions as F

    try:
        base = spark.range(cores * 512).repartition(cores)
        # (1) grow the Python worker pool to `cores` in one wide Arrow stage;
        # mapInPandas (not mapInArrow) so every worker also imports pandas
        # here, not inside the first real pandas-UDF query
        base.mapInPandas(lambda it: it, "id long").agg(F.count(F.lit(1))).collect()
        # (2) codegen + shuffle + common expression classes
        proj = base.select(
            (F.col("id") % 7).alias("k"),
            F.md5(F.col("id").cast("string")).alias("h"),
        )
        proj.groupBy("k").agg(
            F.sum(F.col("id").cast("decimal(18,4)")),
            F.count(F.lit(1)),
        ).orderBy("k").collect()
        # (3) parquet write + vectorized read (incl. DECIMAL decode) +
        # filter pushdown path
        d = tempfile.mkdtemp(prefix="maxx_warm_")
        try:
            proj.withColumn("v", F.col("id").cast("double")).withColumn(
                "m", F.col("id").cast("decimal(18,4)")
            ).write.mode("overwrite").parquet(f"{d}/w")
            back = spark.read.parquet(f"{d}/w")
            back.where(F.col("id") > 10).agg(
                F.sum("v"), F.max("h"), F.sum("m")
            ).collect()
            # (4) window + sort-merge join machinery (UnsafeExternalSorter,
            # SMJ iterators, WindowExec frames JIT once per JVM)
            from pyspark.sql import Window

            w = Window.partitionBy("k").orderBy("id")
            lhs = back.select("k", "id", F.row_number().over(w).alias("rn"))
            rhs = back.select(F.col("k").alias("k2"), F.col("id").alias("id2"))
            lhs.hint("merge").join(
                rhs, (F.col("k") == F.col("k2")) & (F.col("id") == F.col("id2"))
            ).agg(F.count(F.lit(1))).collect()
        finally:
            shutil.rmtree(d, ignore_errors=True)
    except Exception:
        pass  # warmup is best-effort; a failure must never block a session


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
        # let AQE re-plan INSIDE cached plans too (default false): the dedup
        # suite caches its shared shingle index, and with the default every
        # consumer stage inherits the cache's full static shuffle partition
        # count — no runtime coalescing anywhere downstream of a cache. The
        # cost (a cached plan's output partitioning may change between runs,
        # so a consumer counting on it may re-exchange) doesn't apply here:
        # consumers key on the same columns AQE preserves. Size-based and
        # scale-neutral (measured −3 s on the sf0.1 dedup chain).
        .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
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
        # answer bare MIN/MAX/COUNT aggregates from parquet footer
        # statistics instead of scanning row groups (off by default; pure
        # scan-level win at any scale — q09's watermark-chunk bounds agg
        # is footer-only with it)
        .config("spark.sql.parquet.aggregatePushdown", "true")
        .config("spark.sql.shuffle.spill.compress", "true")
        # INT96 (the default) carries no parquet column statistics; the
        # sink's footer-based lineage needs min/max on the event-time column
        .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    if os.environ.get("SPARK_GRAFT_WARMUP", "1") != "0" and not spark.conf.get(
        "spark.maxx.warmed", None
    ):
        spark.conf.set("spark.maxx.warmed", "1")  # once per session, not per get_spark
        _warm_session(spark, cores)
    return spark


def load_tables(spark: SparkSession, sf_dir: str, names: tuple[str, ...] | None = None):
    """Load the driver testdata parquet tables as a dict of DataFrames."""
    names = names or (
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    )
    return {n: spark.read.parquet(f"{sf_dir}/{n}.parquet") for n in names}
