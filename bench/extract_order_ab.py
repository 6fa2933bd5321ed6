"""Driver-order extraction A/B (round-3 question: BENCH_r03 recorded
extract_pages_per_sec 6.4k where in-session builder runs saw ~10.8k —
throttle from 60+ s of preceding all-core suite work, or a real
regression?).

Protocol: ONE local[32] session at sf0.1, all Python workers warmed, then
alternating measurements of the SAME extraction workload (bench.py's 4,980
pages) taken FIRST (cold suite), after the full 38-query suite (the
driver's ordering), and again after a second suite pass. Same session, same
input, same code — any spread between positions is machine state (VM
throttling under sustained all-core load), not engine behavior.

Writes BENCH/extract_order_ab.json and prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def measure_extraction(spark) -> dict:
    from maxx_spark.extract import extract_code_units
    from maxx_spark.gen import generate_pages_df

    pages = generate_pages_df(spark, n_filler=3000, n_projects=60).cache()
    n_pages = pages.count()
    t0 = time.perf_counter()
    n_units = extract_code_units(pages).count()
    dt = time.perf_counter() - t0
    pages.unpersist()
    return {"pages": n_pages, "units": n_units, "sec": round(dt, 3),
            "pages_per_sec": round(n_pages / dt, 1)}


def run_suite(spark, sf_dir: str) -> float:
    """The full query suite (bench.py's materialization contract), used
    here purely as the all-core load between extraction measurements."""
    t0 = time.perf_counter()
    qs = __import__("__spark_entry__").queries()
    from pyspark.sql import functions as F

    for name, fn in qs.items():
        if not name.startswith("q"):
            continue
        df = fn(spark, sf_dir)
        df.select(
            F.bit_xor(F.xxhash64(*[F.col(c).cast("string") for c in df.columns])).alias("h")
        ).collect()
    return round(time.perf_counter() - t0, 3)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from maxx_spark.session import get_spark

    spark = get_spark("extract-ab", master="local[32]")
    # warm EVERY worker (repartitioned — limit() would warm one)
    from maxx_spark.gen import generate_pages_df
    from maxx_spark.extract import extract_code_units

    warm = generate_pages_df(spark, n_filler=0, n_projects=8).repartition(32)
    extract_code_units(warm).count()

    seq = []
    seq.append({"position": "first_cold_suite", **measure_extraction(spark)})
    suite1 = run_suite(spark, sf_dir)
    seq.append({"position": "after_suite_1", **measure_extraction(spark)})
    suite2 = run_suite(spark, sf_dir)
    seq.append({"position": "after_suite_2", **measure_extraction(spark)})
    # cooldown probe: does a 60 s idle restore the first-position rate?
    time.sleep(60)
    seq.append({"position": "after_60s_idle", **measure_extraction(spark)})
    spark.stop()

    rates = [s["pages_per_sec"] for s in seq]
    result = {
        "measurements": seq,
        "suite_secs": [suite1, suite2],
        "first_vs_after_suite_ratio": round(rates[1] / rates[0], 3),
        "idle_recovery_ratio": round(rates[3] / rates[0], 3),
    }
    with open(os.path.join(REPO, "BENCH", "extract_order_ab.json"), "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
