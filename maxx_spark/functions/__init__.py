"""Column-expression function library (all JVM-side built-ins; every
function here returns a Column and stays inside whole-stage codegen).

The cross-engine determinism contract: each function has an exact ANSI-SQL
mirror used by the DuckDB oracles (see __spark_entry__.py)."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from maxx_spark.operators.dedup import (  # noqa: F401
    md5i,
    normalized,
    word_shingle_keys,
    word_shingles,
)


def host_of(url: Column | str) -> Column:
    """Host component of a url — the session/skew key of the engine."""
    c = F.col(url) if isinstance(url, str) else url
    return F.regexp_extract(c, r"^[a-z]+://([^/]+)/", 1)


def dot_product(a: Column, b: Column) -> Column:
    """Left-fold dot product in IEEE double (order-stable across engines)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(dot_product(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot_product(a, b) / (l2_norm(a) * l2_norm(b))


def salted(key: Column | str, n_salt: int = 16) -> Column:
    """Deterministic salt bucket for two-phase skew aggregation (E8)."""
    c = F.col(key) if isinstance(key, str) else key
    return (F.hash(c) % n_salt + n_salt) % n_salt


def tokens(text: Column | str) -> Column:
    c = F.col(text) if isinstance(text, str) else text
    return F.split(normalized(c), " ")
