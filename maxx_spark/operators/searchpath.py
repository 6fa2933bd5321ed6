"""MATLAB search-path registry (P22 — reference collection.py:564-652):
``addpath``/``rmpath`` maintain an ordered root list; the FIRST root on
the path wins when two files define the same identifier
(collection.py:467,517). Distributed resolution = rank column + dedup
window, no driver-side state."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


class SearchPath:
    def __init__(self, roots: list[str] | None = None):
        self._roots: list[str] = list(roots or [])

    def addpath(self, root: str, to_end: bool = False) -> "SearchPath":
        if root in self._roots:
            self._roots.remove(root)
        if to_end:
            self._roots.append(root)
        else:
            self._roots.insert(0, root)  # MATLAB addpath prepends by default
        return self

    def rmpath(self, root: str) -> "SearchPath":
        if root in self._roots:
            self._roots.remove(root)
        return self

    @property
    def roots(self) -> list[str]:
        return list(self._roots)

    def rank_expr(self, url_col: str = "url") -> Column:
        """Rank of the first matching root (lower = higher precedence);
        urls under no root get rank len(roots) (lowest precedence)."""
        rank = F.lit(len(self._roots))
        for i in reversed(range(len(self._roots))):
            rank = F.when(
                F.col(url_col).startswith(self._roots[i]), F.lit(i)
            ).otherwise(rank)
        return rank

    def resolve(self, units: DataFrame, identifier_col: str = "unit_path") -> DataFrame:
        """One winner per (host, identifier) under path precedence —
        the distributed form of PathsCollection.__getitem__'s first-hit
        rule. Files under no registered root are shadowed by any
        registered file."""
        from maxx_spark.operators.codeunits import with_host

        u = with_host(units).withColumn("__path_rank", self.rank_expr())
        w = Window.partitionBy("host", identifier_col).orderBy(
            "__path_rank", "url", "warc_ts"
        )
        return (
            u.withColumn("__rn", F.row_number().over(w))
            .where(F.col("__rn") == 1)
            .drop("__rn", "__path_rank")
        )
