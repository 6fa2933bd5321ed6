"""Exactly-once sink (E9) + per-partition lineage & metrics (E10).

Iceberg's idempotent-commit semantics emulated on a filesystem:

- Output rows of micro-batch B land under ``data/batch_id=B/`` written ONCE:
  a commit marker ``_commits/B.json`` is checked first; foreachBatch replays
  (after failure/restart) see the marker and skip — the committed row set is
  exactly the union over distinct batch ids.
- The marker is written atomically (temp file + ``os.replace``) AFTER data
  and lineage land, so a crash between data-write and marker-write replays
  the batch into the same deterministic path (overwrite) — never duplicates.
- Lineage: one row per (batch_id, partition_id) with input rows and event-
  time bounds, written under ``lineage/``.

At cluster scale the same protocol holds with an object store + Iceberg
table commits; the marker becomes the Iceberg snapshot with
``commit.retry`` keyed on (batch_id) — the logic here is the portable part.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class ExactlyOnceParquetSink:
    def __init__(self, base_dir: str, ts_col: str = "warc_ts"):
        self.base = base_dir
        self.ts_col = ts_col
        os.makedirs(f"{base_dir}/_commits", exist_ok=True)
        os.makedirs(f"{base_dir}/data", exist_ok=True)
        os.makedirs(f"{base_dir}/lineage", exist_ok=True)
        os.makedirs(f"{base_dir}/errors", exist_ok=True)

    # -- commit log ---------------------------------------------------------

    def _marker(self, batch_id: int) -> str:
        return f"{self.base}/_commits/{batch_id}.json"

    def is_committed(self, batch_id: int) -> bool:
        return os.path.exists(self._marker(batch_id))

    def _commit(self, batch_id: int, meta: dict) -> None:
        tmp = self._marker(batch_id) + ".tmp"
        with open(tmp, "w") as f:
            json.dump(meta, f)
        os.replace(tmp, self._marker(batch_id))  # atomic

    def committed_batches(self) -> list[int]:
        out = []
        for name in os.listdir(f"{self.base}/_commits"):
            if name.endswith(".json"):
                out.append(int(name[:-5]))
        return sorted(out)

    # -- foreachBatch body ----------------------------------------------------

    def __call__(self, df: DataFrame, batch_id: int) -> None:
        if self.is_committed(batch_id):
            return  # replay after restart — already durable
        t0 = time.time()
        data_dir = f"{self.base}/data/batch_id={batch_id}"
        # ONE pass over the (expensive) batch plan: write data including the
        # producing partition id.
        df.withColumn("__pid", F.spark_partition_id()).write.mode(
            "overwrite"
        ).parquet(data_dir)
        t_data = time.time()

        # Lineage from the parquet FOOTERS (Iceberg-manifest style): one
        # output file per task ↔ partition, so per-file row counts and
        # warc_ts column statistics ARE the per-partition lineage — read
        # driver-side, no second Spark job over the batch. Footers read in
        # a thread pool (per-file work is GIL-releasing pyarrow IO+parse):
        # serial scan was the dominant slice of the per-batch fixed cost
        # at 64-128 output files per trigger.
        lineage_rows, has_errors = self._footer_lineage(data_dir, batch_id)
        n_rows = sum(r["rows"] for r in lineage_rows)
        self._write_lineage(lineage_rows, batch_id)
        t_lineage = time.time()

        # dead-letter routing (P34): only scan for error rows when the
        # footers show any non-null `error` values — and route on the SAME
        # predicate that triggered detection (error IS NOT NULL), so a
        # producer emitting error without kind='error' cannot silently lose
        # rows from the DLQ (the sink is schema-generic).
        if has_errors:
            spark = df.sparkSession
            written = spark.read.parquet(data_dir)
            (
                written.where(F.col("error").isNotNull())
                .coalesce(1)
                .write.mode("overwrite")
                .parquet(f"{self.base}/errors/batch_id={batch_id}")
            )
        now = time.time()
        self._commit(
            batch_id,
            {
                "rows": n_rows,
                "wall_s": round(now - t0, 3),
                # fixed-cost breakdown (observability for the scaling work):
                # data = the batch plan + parquet write; lineage = footer
                # scan + lineage file; dlq = error re-read when triggered
                "data_s": round(t_data - t0, 3),
                "lineage_s": round(t_lineage - t_data, 3),
                "dlq_s": round(now - t_lineage, 3),
                "ts": now,
            },
        )

    def _footer_lineage(self, data_dir: str, batch_id: int):
        import glob
        from concurrent.futures import ThreadPoolExecutor

        import pyarrow.parquet as pq

        def one(path: str):
            md = pq.ParquetFile(path).metadata
            n = md.num_rows
            mn = mx = None
            err_values = 0
            part_id = None
            schema_names = {md.schema.column(i).name: i for i in range(md.num_columns)}
            # producing partition id from the __pid column stats (constant
            # per file: one task writes one file); filename index fallback
            if "__pid" in schema_names and md.num_row_groups > 0:
                st = md.row_group(0).column(schema_names["__pid"]).statistics
                if st and st.has_min_max:
                    part_id = int(st.min)
            if part_id is None:
                part_id = int(os.path.basename(path).split("-")[1])
            for rg in range(md.num_row_groups):
                g = md.row_group(rg)
                if self.ts_col in schema_names:
                    st = g.column(schema_names[self.ts_col]).statistics
                    if st and st.has_min_max:
                        mn = min(mn, st.min) if mn is not None else st.min
                        mx = max(mx, st.max) if mx is not None else st.max
                if "error" in schema_names:
                    st = g.column(schema_names["error"]).statistics
                    if st is not None and st.null_count is not None:
                        err_values += g.column(schema_names["error"]).num_values - st.null_count
                    else:  # no stats → must assume errors possible
                        err_values += 1
            row = {
                "partition_id": part_id,
                "rows": n,
                "min_ts": str(mn) if mn is not None else None,
                "max_ts": str(mx) if mx is not None else None,
                "batch_id": batch_id,
            }
            return row, err_values > 0

        paths = sorted(glob.glob(f"{data_dir}/part-*.parquet"))
        if not paths:
            return [], False
        with ThreadPoolExecutor(max_workers=min(16, len(paths))) as ex:
            results = list(ex.map(one, paths))
        return [r for r, _ in results], any(e for _, e in results)

    def _write_lineage(self, rows: list[dict], batch_id: int) -> None:
        import pyarrow as pa
        import pyarrow.parquet as pq

        out_dir = f"{self.base}/lineage/batch_id={batch_id}"
        os.makedirs(out_dir, exist_ok=True)
        schema = pa.schema(
            [
                ("partition_id", pa.int32()),
                ("rows", pa.int64()),
                ("min_ts", pa.string()),
                ("max_ts", pa.string()),
                ("batch_id", pa.int64()),
            ]
        )
        table = pa.Table.from_pylist(rows, schema=schema)
        pq.write_table(table, f"{out_dir}/lineage.parquet")

    # -- readers --------------------------------------------------------------

    def read_committed(self, spark) -> DataFrame:
        """All rows of committed batches (the exactly-once result set)."""
        committed = set(self.committed_batches())
        dirs = [
            f"{self.base}/data/batch_id={b}" for b in sorted(committed)
            if os.path.isdir(f"{self.base}/data/batch_id={b}")
        ]
        if not dirs:
            from maxx_spark.schema import CODE_UNITS

            return spark.createDataFrame([], CODE_UNITS)
        df = spark.read.parquet(*dirs)
        return df.drop("__pid") if "__pid" in df.columns else df

    def read_lineage(self, spark) -> DataFrame:
        import glob

        dirs = glob.glob(f"{self.base}/lineage/batch_id=*")
        return spark.read.parquet(*dirs) if dirs else None
