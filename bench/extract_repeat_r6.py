"""Round-6 extraction-throughput A/B (VERDICT r5 item 4): r5 sessions read
8.0k pages/s where r4's recovered-box run read 12.2k — but the extraction
code is byte-identical between the rounds (git diff 028875e..HEAD touches no
extraction file). With no code delta to alternate, the A/B degenerates to
REPEATED legs of the same workload in one warmed session: if the
within-session spread (same code, same input, minutes apart) covers the
r4-vs-r5 band, the delta is box phase, not a regression.

Protocol: one local[32] session, every Python worker warmed via a
repartition(32) extraction pass (limit() would warm one worker), then
N_LEGS consecutive measurements of bench.py's exact extraction workload
(generate_pages_df(n_filler=3000, n_projects=60); identical to the
workload behind the recorded r4/r5 figures). No concurrent load — the
bench owns the box. Writes BENCH/extract_repeat_r6.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N_LEGS = 8
R4_RECORDED = 12200.0  # r4 recovered-box warm reading (BENCH/BASELINE.md)
R5_RECORDED = 8000.0   # r5 session reading the verdict flagged


def main() -> None:
    import argparse

    ap = argparse.ArgumentParser()
    # default workload = bench.py's extraction row (4,980 pages); at ~1.5 s
    # per leg that granularity is JIT/noise-dominated (first run measured a
    # 3.15x spread with rates still CLIMBING across identical legs) — use
    # --scale to lengthen legs until the plateau is readable
    ap.add_argument("--scale", type=int, default=1)
    ap.add_argument("--legs", type=int, default=N_LEGS)
    ap.add_argument("--out", default="extract_repeat_r6.json")
    args = ap.parse_args()

    from maxx_spark.extract import extract_code_units
    from maxx_spark.gen import generate_pages_df
    from maxx_spark.session import get_spark

    spark = get_spark("extract-repeat", master="local[32]")
    warm = generate_pages_df(spark, n_filler=0, n_projects=8).repartition(32)
    extract_code_units(warm).count()

    pages = generate_pages_df(
        spark, n_filler=3000 * args.scale, n_projects=60 * args.scale
    ).cache()
    n_pages = pages.count()
    legs = []
    for i in range(args.legs):
        t0 = time.perf_counter()
        n_units = extract_code_units(pages).count()
        dt = time.perf_counter() - t0
        legs.append({"leg": i, "sec": round(dt, 3),
                     "pages_per_sec": round(n_pages / dt, 1)})
        print(json.dumps(legs[-1]), flush=True)
    pages.unpersist()
    spark.stop()

    rates = sorted(l["pages_per_sec"] for l in legs)
    med = rates[len(rates) // 2]
    result = {
        "workload": {"pages": n_pages, "units": n_units,
                     "note": "identical to bench.py's extraction row and the recorded r4/r5 figures"},
        "legs": legs,
        "rate_min": rates[0],
        "rate_median": med,
        "rate_max": rates[-1],
        "spread_max_over_min": round(rates[-1] / rates[0], 3),
        "r4_recorded": R4_RECORDED,
        "r5_recorded": R5_RECORDED,
        "r4_r5_band_ratio": round(R4_RECORDED / R5_RECORDED, 3),
        "verdict_rule": "box phase iff within-session max/min spread covers the r4/r5 ratio, "
                        "or the session's range overlaps both recorded figures",
    }
    with open(os.path.join(REPO, "BENCH", args.out), "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps({k: v for k, v in result.items() if k != "legs"}))


if __name__ == "__main__":
    main()
