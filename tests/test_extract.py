"""End-to-end tests for the Spark extraction stage over the synthetic
pages table (gen.py corpus)."""

import pytest
from pyspark.sql import functions as F

from maxx_spark.extract import extract_code_units, identifier_from_url, extract_rows_for_page
from maxx_spark.gen import generate_pages_df, generate_pages_rows


def test_identifier_from_url():
    i = identifier_from_url("https://h.com/x/+a/+b/f.m")
    assert i["identifier"] == "a.b.f" and i["namespace"] == "a.b"
    i = identifier_from_url("https://h.com/x/@Cls/meth.m")
    assert i["identifier"] == "Cls" and i["classfolder"] == "Cls" and i["stem"] == "meth"
    i = identifier_from_url("https://h.com/x/@Cls/private/p.m")
    assert i["classfolder"] == "Cls" and i["is_private"]
    i = identifier_from_url("https://h.com/t/private/q.m")
    assert i["is_private"] and i["identifier"] == "q"
    i = identifier_from_url("https://h.com/t/plain.m")
    assert i["identifier"] == "plain" and not i["is_private"]


def test_generator_deterministic():
    a = generate_pages_rows(n_projects=2, n_filler=20, seed=7)
    b = generate_pages_rows(n_projects=2, n_filler=20, seed=7)
    assert a == b
    c = generate_pages_rows(n_projects=2, n_filler=20, seed=8)
    assert a != c


def test_extract_rows_pure_python():
    rows = extract_rows_for_page(
        "https://h/x/+metrics/rescale_span.m",
        None,
        None,
        "function y = rescale_span(x)\n% Doc line\ny = x;\nend\n",
    )
    assert rows[0]["unit_path"] == "metrics.rescale_span"
    assert rows[0]["kind"] == "function"
    assert rows[0]["docstring"] == "Doc line"
    assert rows[0]["extracted_text"].startswith("function y = rescale_span")


def test_extract_end_to_end(spark):
    pages = generate_pages_df(spark, n_projects=2, n_filler=40)
    units = extract_code_units(pages).cache()

    kinds = {r["kind"]: r["count"] for r in units.groupBy("kind").agg(F.count("*").alias("count")).collect()}
    assert kinds.get("class", 0) >= 2 * 8  # 8 class-ish file units per project
    assert kinds.get("function", 0) > 0
    assert kinds.get("property", 0) > 0
    assert kinds.get("enumeration", 0) == 2 * 3
    assert kinds.get("script", 0) >= 2
    assert kinds.get("live_script", 0) >= 2

    # no filler page may reach the extractor output
    assert units.where(F.col("url").contains("/page/")).count() == 0

    # namespace identifiers
    ns = units.where(F.col("unit_path") == "metrics.Gauge").collect()
    assert len(ns) == 2 and all(r["parent_path"] == "+metrics" for r in ns)

    # class-folder method file parented to the class
    cf = units.where(
        (F.col("unit_path") == "Ledger.summarize") & F.col("url").contains("@Ledger/summarize")
    ).collect()
    assert cf and all(r["parent_path"] == "Ledger" for r in cf)

    # arguments structs survive Arrow round-trip
    adv = units.where(F.col("unit_path") == "Tracker.advance").first()
    assert adv["arguments"][0]["name"] == "step"
    assert adv["arguments"][0]["validators"] == "{mustBeReal}"

    # byte-identity: extracted_text equals the dedented source slice
    tr = units.where((F.col("unit_path") == "Tracker") & (F.col("kind") == "class")).first()
    assert tr["extracted_text"].startswith("classdef Tracker < handle")
    assert tr["extracted_text"].rstrip().endswith("end")

    units.unpersist()


def test_extract_error_row(spark):
    from maxx_spark.schema import PAGES
    import datetime as dt

    rows = [
        ("https://h/x/bad.m", dt.datetime(2024, 1, 1), None, None, "matlab"),
    ]
    df = spark.createDataFrame(rows, PAGES)
    out = extract_code_units(df).collect()
    # empty text parses as an (empty) script rather than dying
    assert len(out) == 1 and out[0]["kind"] in ("script", "error")


def test_streaming_compatible(spark, tmp_path):
    """The extraction stage must run under Structured Streaming."""
    pages = generate_pages_df(spark, n_projects=1, n_filler=10)
    src = str(tmp_path / "pages_parquet")
    pages.write.parquet(src)

    stream = spark.readStream.schema(pages.schema).parquet(src)
    units = extract_code_units(stream)
    q = (
        units.writeStream.format("memory")
        .queryName("units_stream_t")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    n = spark.sql("select count(*) c from units_stream_t").first()["c"]
    assert n > 20
