"""MATLAB path-glob membership as pure URL-segment predicates (P1).

The reference's PathGlobber (collection.py:50-75) walks a directory with
these rules:

- files: ``.m`` is a member unless named ``Contents.m``; ``.mlx`` only when
  ``parse_live_scripts`` is set.
- ``+pkg`` / ``@Cls`` dirs are ALWAYS descended — but the descent resets the
  recursive flag, so below a prefixed dir only further ``+``/``@`` dirs are
  reachable.
- plain dirs are descended only in ``recursive`` mode, and never a dir named
  ``private``.

Flattened over a crawl url that means the relative dir chain must be
``plain* prefixed*`` (plain segments allowed only while recursive and only
before the first ``+``/``@`` segment, never ``private``), which is a single
anchored regex — the whole membership test stays in the JVM scan as a
pushable predicate, no Python and no shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# one relative dir chain segment each, with trailing slash
_PREFIXED = r"[+@][^/]*/"
_PLAIN = r"(?!private/)[^+@/][^/]*/"


def _rel_membership(rel: Column, recursive: bool, parse_live_scripts: bool) -> Column:
    fname = F.regexp_extract(rel, r"([^/]*)$", 1)
    dirpath = F.regexp_extract(rel, r"^(.*/)?[^/]*$", 1)

    if recursive:
        dirs_ok = dirpath.rlike(rf"^({_PLAIN})*({_PREFIXED})*$")
    else:
        dirs_ok = dirpath.rlike(rf"^({_PREFIXED})*$")

    file_ok = fname.endswith(".m") & (fname != "Contents.m")
    if parse_live_scripts:
        file_ok = file_ok | fname.endswith(".mlx")

    return (rel != "") & dirs_ok & file_ok


def glob_member(
    url: Column,
    root_path: str,
    recursive: bool = False,
    parse_live_scripts: bool = False,
) -> Column:
    """Boolean column: is this url a glob member of ``root_path``?

    ``root_path`` is the path prefix below the host (e.g.
    ``matlab/toolbox``); membership is evaluated host-locally, so one call
    covers every host in the frame.
    """
    rel = F.regexp_extract(url, rf"^[a-z]+://[^/]+/{root_path}/(.+)$", 1)
    return _rel_membership(rel, recursive, parse_live_scripts)


def glob_member_under(
    url: Column,
    root_url: str,
    recursive: bool = False,
    parse_live_scripts: bool = False,
) -> Column:
    """Like glob_member, but anchored to one FULL url prefix (a registered
    search-path root like ``https://host/matlab/toolbox``)."""
    import re

    rel = F.regexp_extract(url, "^" + re.escape(root_url.rstrip("/")) + "/(.+)$", 1)
    return _rel_membership(rel, recursive, parse_live_scripts)


def glob_filter(
    pages: DataFrame,
    root_path: str,
    recursive: bool = False,
    parse_live_scripts: bool = False,
    url_col: str = "url",
) -> DataFrame:
    """Rows of ``pages`` that are glob members of ``root_path``."""
    return pages.where(
        glob_member(F.col(url_col), root_path, recursive, parse_live_scripts)
    )
