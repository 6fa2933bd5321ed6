"""Repo-scale end-to-end extraction smoke — the engine-side mirror of the
reference's strongest e2e signal (tests/test_submodules.py:11-24 parses
three real GitHub projects and asserts every alias resolves).

The reference's submodule checkouts at /root/reference/submodule/ are EMPTY
in this sandbox (bare directories, nothing fetched), so the always-on test
drives an O(10^2-10^3)-page corpus from the deterministic generator instead:
30 full projects (each replicating the 33-file feature corpus: namespaces,
class folders, private dirs, inheritance chains, a known-malformed file)
plus filler. Asserted end-to-end, exactly as the reference does per-alias:

- every error row traces to the one known-bad fixture file;
- every class base resolves — host-locally to another extracted unit, or
  to the builtins dim (handle, int8, ...); none dangles;
- extraction throughput is measured and printed (pages/s) for the record.

A second test runs the same assertions over the real submodule trees the
moment a checkout appears; until then it skips with the reason.
"""

import time
from pathlib import Path

from pyspark.sql import functions as F

SUBMODULES = Path("/root/reference/submodule")


def _assert_bases_resolve(units, spark):
    from maxx_spark.operators.codeunits import class_edges, with_host

    u = with_host(units)
    all_bases = (
        u.where(F.col("kind") == "class")
        .select("host", F.col("unit_path").alias("cls"), F.explode("bases").alias("base_name"))
    )
    local = class_edges(units).select("host", "cls", F.col("base").alias("resolved"))
    from maxx_spark.operators.builtins import builtins_dim

    bdim = builtins_dim(spark).select(F.col("builtin_name").alias("base_name")).distinct()
    dangling = (
        all_bases.join(local, ["host", "cls"], "left_anti")
        .join(bdim, "base_name", "left_anti")
        .collect()
    )
    assert dangling == [], f"dangling bases: {dangling[:10]}"


def test_synthetic_repo_scale_extraction(spark):
    from maxx_spark.extract import extract_code_units
    from maxx_spark.gen import generate_pages_df

    pages = generate_pages_df(spark, n_projects=30, n_filler=300).cache()
    n_pages = pages.where(F.col("lang") == "matlab").count()
    assert n_pages >= 900  # O(10^2-10^3) MATLAB files, like gnu-octave-statistics

    t0 = time.monotonic()
    units = extract_code_units(pages).cache()
    n_units = units.count()
    dt = time.monotonic() - t0
    print(f"\nscale-smoke: {n_pages} pages -> {n_units} units, "
          f"{n_pages / dt:,.0f} pages/s (local[4])")
    assert n_units > 30 * 40  # every project contributes its full unit set

    # P34 contract: any error row traces to the known-malformed fixture
    # (the parser's recovery may legally classify it as a script instead —
    # tests/test_extract.py pins that file to kind ∈ {script, error})
    bad = units.where(F.col("kind") == "error").select("url").collect()
    assert all(r["url"].endswith("malformed_unit.m") for r in bad)

    _assert_bases_resolve(units, spark)
    pages.unpersist()
    units.unpersist()


def test_submodule_checkouts_if_present(spark):
    """Mirror of the reference submodule e2e over the real project trees —
    activates automatically once the checkouts contain files."""
    import pytest

    m_files = list(SUBMODULES.rglob("*.m")) if SUBMODULES.is_dir() else []
    if not m_files:
        pytest.skip("reference submodule checkouts are empty in this sandbox")

    from maxx_spark.extract import extract_code_units
    from maxx_spark.schema import PAGES
    import datetime as dt

    rows = []
    for p in m_files:
        text = p.read_text(errors="replace")
        rel = p.relative_to(SUBMODULES)
        url = f"https://{rel.parts[0]}.example.org/matlab/toolbox/{'/'.join(rel.parts[1:])}"
        rows.append((url, dt.datetime(2024, 3, 1), text.encode(), text, "matlab"))
    pages = spark.createDataFrame(rows, PAGES)
    units = extract_code_units(pages).cache()
    n_err = units.where(F.col("kind") == "error").count()
    assert n_err / max(1, len(rows)) < 0.05  # real code parses
    _assert_bases_resolve(units, spark)
    units.unpersist()
