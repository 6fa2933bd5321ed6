"""P22 tail + P23: glob-based registration, recursive addpath/rmpath,
working-directory local precedence, point lookup — hand-written cases."""

import pytest
from pyspark.sql import functions as F

from maxx_spark.extract import extract_code_units
from maxx_spark.gen import generate_pages_df
from maxx_spark.operators.searchpath import SearchPath

TOP = "https://mega-mat.example.com/matlab/toolbox"
SUB = f"{TOP}/subdir"


@pytest.fixture(scope="module")
def units(spark):
    u = extract_code_units(generate_pages_df(spark, n_projects=1, n_filler=0)).cache()
    u.count()
    return u


def test_registration_follows_glob_rules(units):
    """A non-recursive root registers exactly its PathGlobber members:
    Contents.m, private dirs, plain subdirs stay unregistered."""
    got = {r["unit_path"] for r in SearchPath([TOP]).resolve(units).collect()}
    assert "accumulate" in got            # direct .m file
    assert "metrics.rescale_span" in got  # +pkg always descended
    assert "Ledger" in got                # @Cls main file
    assert "Contents" not in got          # Contents.m never registered
    assert "top_secret" not in got        # private/ dir
    assert "util" not in got              # plain dir under +metrics
    assert "deep.tool" not in got         # plain subdir, non-recursive root


def test_recursive_root_registers_subdirs(units):
    sp = SearchPath()
    sp.addpath(TOP, recursive=True)
    got = {r["unit_path"] for r in sp.resolve(units).collect()}
    assert "deep.tool" in got             # subdir/nested/+deep reachable
    assert "top_secret" not in got        # private still excluded
    assert "util" not in got              # plain-below-+pkg still excluded


def test_rmpath_recursive_drops_subroots(units):
    sp = SearchPath([SUB, TOP])
    sp.rmpath(TOP, recursive=True)        # removes TOP and its subroot SUB
    assert sp.roots == []
    sp2 = SearchPath([SUB, TOP]).rmpath(TOP)  # non-recursive keeps SUB
    assert sp2.roots == [SUB]


def test_working_directory_local_precedence(units):
    """collection.py:605-619: the working directory's own members outrank
    the whole search path."""
    base = SearchPath([TOP, SUB]).resolve(units).where(
        (F.col("unit_path") == "accumulate") & (F.col("kind") == "function")
    ).first()
    assert "/subdir/" not in base["url"]
    local = SearchPath([TOP, SUB]).resolve(units, working_directory=SUB).where(
        (F.col("unit_path") == "accumulate") & (F.col("kind") == "function")
    ).first()
    assert "/subdir/" in local["url"]


def test_point_lookup_dotted_and_slash(units):
    sp = SearchPath([TOP, SUB])
    # dotted member walk
    adv = sp.point_lookup(units, "Tracker.advance").collect()
    assert len(adv) == 1 and adv[0]["kind"] == "function"
    deep = sp.point_lookup(units, "metrics.inner.Gauge.bump").collect()
    assert len(deep) == 1
    # '/'-path with file suffix → that page's unit rows
    page = sp.point_lookup(units, "subdir/accumulate.m", working_directory=TOP)
    urls = {r["url"] for r in page.collect()}
    assert urls == {f"{TOP}/subdir/accumulate.m"}
    # '/'-path without suffix → the folder's direct file units
    folder = sp.point_lookup(units, "subdir/", working_directory=TOP)
    stems = {r["url"].rsplit("/", 1)[1] for r in folder.collect()}
    assert "accumulate.m" in stems and "README.md" in stems
    # requires a working directory
    with pytest.raises(ValueError):
        sp.point_lookup(units, "a/b")
