"""Source layer (E1): batch + streaming readers and test/bench staging.

Iceberg-shaped: ``pages_stream`` takes a catalog table name when an Iceberg
catalog is configured, else a parquet directory (the sandbox fallback —
same schema, same downstream plan)."""

from maxx_spark.session import load_tables  # noqa: F401
from maxx_spark.streaming.source import (  # noqa: F401
    pages_stream,
    stage_heavy_pages,
    stage_pages_dir,
)
