"""MATLAB search-path registry (P22/P23 — reference collection.py:564-652).

``addpath``/``rmpath`` maintain an ordered root list; the FIRST root on the
path wins when two files define the same identifier (collection.py:467,517).
Registration follows the PathGlobber membership rules (operators/globber.py):
``addpath(root, recursive=...)`` registers exactly the files the reference's
``_PathGlobber(path, recursive)`` would yield, so Contents.m, private dirs,
and plain dirs below ``+pkg``/``@Cls`` stay unregistered.

Per-directory *local collections* (collection.py:605-619): a working
directory's own direct members take precedence over the whole search path —
``resolve(units, working_directory=...)`` ranks them ahead of every root,
the distributed twin of ``get_member(identifier, working_directory)``.

``rmpath(root, recursive=True)`` also drops registered subdirectory roots
(collection.py:650-652). Everything resolves as rank column + dedup window —
no driver-side state, one shuffle on (host, identifier).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from maxx_spark.operators.globber import glob_member_under


class SearchPath:
    def __init__(
        self,
        roots: list[str | tuple[str, bool]] | None = None,
        parse_live_scripts: bool = True,
    ):
        # ordered (root_url, recursive) pairs, highest precedence first
        self._roots: list[tuple[str, bool]] = [
            (r, False) if isinstance(r, str) else (r[0], bool(r[1]))
            for r in (roots or [])
        ]
        self._pls = parse_live_scripts

    def addpath(self, root: str, to_end: bool = False, recursive: bool = False) -> "SearchPath":
        self._roots = [(r, rec) for r, rec in self._roots if r != root]
        if to_end:
            self._roots.append((root, recursive))
        else:
            self._roots.insert(0, (root, recursive))  # MATLAB addpath prepends
        return self

    def rmpath(self, root: str, recursive: bool = False) -> "SearchPath":
        keep = []
        for r, rec in self._roots:
            if r == root:
                continue
            if recursive and r.startswith(root.rstrip("/") + "/"):
                continue  # registered subdirectory roots drop too
            keep.append((r, rec))
        self._roots = keep
        return self

    @property
    def roots(self) -> list[str]:
        return [r for r, _ in self._roots]

    def rank_expr(self, url_col: str = "url") -> Column:
        """Rank of the first root whose GLOB MEMBERSHIP covers the url
        (lower = higher precedence); urls registered by no root get rank
        len(roots) — callers decide whether those are kept at lowest
        precedence or dropped as unregistered."""
        url = F.col(url_col)
        rank = F.lit(len(self._roots))
        for i in reversed(range(len(self._roots))):
            root, rec = self._roots[i]
            rank = F.when(
                glob_member_under(url, root, recursive=rec, parse_live_scripts=self._pls),
                F.lit(i),
            ).otherwise(rank)
        return rank

    def resolve(
        self,
        units: DataFrame,
        identifier_col: str = "unit_path",
        working_directory: str | None = None,
        keep_unregistered: bool = False,
    ) -> DataFrame:
        """One winner per (host, identifier) under path precedence — the
        distributed form of PathsCollection.__getitem__'s first-hit rule.
        With ``working_directory``, that directory's direct members outrank
        every root (the local-collection rule, collection.py:605-619).
        Unregistered files (outside every root's glob membership) are
        dropped unless ``keep_unregistered``; rows with a null identifier
        (error/readme carriers) are never registry members."""
        from maxx_spark.operators.codeunits import with_host

        rank = self.rank_expr()
        if working_directory is not None:
            rank = F.when(
                glob_member_under(
                    F.col("url"), working_directory,
                    recursive=False, parse_live_scripts=self._pls,
                ),
                F.lit(-1),
            ).otherwise(rank)
        u = with_host(units).withColumn("__path_rank", rank)
        u = u.where(F.col(identifier_col).isNotNull())
        if not keep_unregistered:
            u = u.where(F.col("__path_rank") < len(self._roots))
        w = Window.partitionBy("host", identifier_col).orderBy(
            "__path_rank", "url", "warc_ts"
        )
        return (
            u.withColumn("__rn", F.row_number().over(w))
            .where(F.col("__rn") == 1)
            .drop("__rn", "__path_rank")
        )

    def point_lookup(
        self,
        units: DataFrame,
        identifier: str,
        working_directory: str | None = None,
    ) -> DataFrame:
        """P23: identifier point lookup (reference collection.py:510-562).

        - plain / dotted identifier → the registry winner whose unit_path
          equals it (``a.b.Cls.method`` works because member unit_paths are
          materialized columns — the reference's get_member chain walk);
        - ``/``-path → resolved against the working directory: with a file
          suffix the exact file's rows, without one the folder's direct
          file-unit members.
        """
        if "/" in identifier:
            if working_directory is None:
                raise ValueError("'/'-path lookup requires a working_directory")
            ident = identifier.strip("/")
            target = working_directory.rstrip("/") + "/" + ident
            last = ident.rsplit("/", 1)[-1]
            if "." in last:  # file path → that page's unit rows
                return units.where(F.col("url") == target)
            # folder path → direct file units of that folder
            return units.where(
                F.col("url").rlike("^" + _re_escape(target) + "/[^/]+$")
            )
        resolved = self.resolve(units, working_directory=working_directory)
        return resolved.where(F.col("unit_path") == identifier)


def _re_escape(s: str) -> str:
    import re

    return re.escape(s)
