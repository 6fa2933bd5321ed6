"""Unit tests for the dataset-assembly operators (q46-q49). The DuckDB
oracle compare covers end-to-end values; these pin the semantic properties
the oracle mirror alone can't certify — content-keyed split stability,
prefix-sum packing arithmetic, mixture-weight rebalancing, ntile fairness.
"""

import math

from pyspark.sql import functions as F


def _docs(spark, rows):
    """rows: list of (doc_id, text, lang, source)."""
    return spark.createDataFrame(
        [(i, t, lg, src, len(t)) for (i, t, lg, src) in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    )


def test_hash_split_content_keyed_and_partitioned(spark):
    """Byte-variant duplicates (case/whitespace/punct) land in the SAME
    split; buckets are in [0,100); labels follow the bucket thresholds."""
    from maxx_spark.operators.corpus import hash_split

    rows = [
        (0, "The quick brown fox jumps over the lazy dog", "en", "a"),
        (1, "the QUICK  brown fox\tjumps over the lazy dog!!", "en", "b"),  # same content
        (2, "a completely different document body here", "en", "a"),
        (3, "", "en", "a"),
    ]
    out = {r["doc_id"]: r for r in hash_split(_docs(spark, rows)).collect()}
    assert len(out) == 4
    assert out[0]["bucket"] == out[1]["bucket"] and out[0]["split"] == out[1]["split"]
    for r in out.values():
        assert 0 <= r["bucket"] < 100
        expect = "train" if r["bucket"] < 90 else ("val" if r["bucket"] < 95 else "test")
        assert r["split"] == expect


def test_hash_split_stable_under_growth(spark):
    """Adding documents never moves an existing doc's split."""
    from maxx_spark.operators.corpus import hash_split

    base = [(i, f"document number {i} with body text {i * 7}", "en", "a") for i in range(20)]
    small = {r["doc_id"]: r["split"] for r in hash_split(_docs(spark, base)).collect()}
    grown = base + [(100 + i, f"new doc {i}", "en", "b") for i in range(20)]
    big = {r["doc_id"]: r["split"] for r in hash_split(_docs(spark, grown)).collect()}
    assert all(big[k] == v for k, v in small.items())


def test_sequence_packing_prefix_sums_and_spans(spark):
    """tok_offset is the exact running sum per source in doc_id order;
    span arithmetic matches a hand-rolled concat-and-chunk; empty docs
    occupy zero sequences."""
    from maxx_spark.operators.corpus import sequence_packing

    # token counts by construction: 'w0 w1 ... w(n-1)' has n regex tokens
    def body(n):
        return " ".join(f"w{i}" for i in range(n))

    rows = [
        (0, body(100), "en", "a"),
        (1, body(200), "en", "a"),
        (2, "", "en", "a"),          # zero tokens mid-stream
        (3, body(300), "en", "a"),   # crosses a 256 boundary
        (4, body(10), "en", "b"),    # second source: independent offsets
    ]
    out = {r["doc_id"]: r for r in sequence_packing(_docs(spark, rows), budget=256).collect()}
    # per-source running offsets
    assert [out[i]["tok_offset"] for i in range(4)] == [0, 100, 300, 300]
    assert out[4]["tok_offset"] == 0
    # doc 1 spans tokens [100, 300) -> sequences 0..1
    assert (out[1]["seq_first"], out[1]["seq_last"], out[1]["n_seqs"]) == (0, 1, 2)
    # empty doc: zero span, anchored at its offset's sequence
    assert (out[2]["n_tok"], out[2]["n_seqs"]) == (0, 0)
    assert out[2]["seq_first"] == out[2]["seq_last"] == 300 // 256
    # doc 3 spans [300, 600) -> sequences 1..2
    assert (out[3]["seq_first"], out[3]["seq_last"], out[3]["n_seqs"]) == (1, 2, 2)
    # total sequence count agrees with ceil(total/budget)
    total = 100 + 200 + 300
    assert max(out[i]["seq_last"] for i in range(4)) == math.ceil(total / 256) - 1


def test_mixture_weights_rebalance_to_uniform(spark):
    """weight(s) * tokens(s) is the same for every source (that's the
    definition of rebalancing to a uniform token mixture), and shares sum
    to 1."""
    from maxx_spark.operators.corpus import mixture_weights

    rows = [
        (0, " ".join(["tok"] * 50), "en", "big"),
        (1, " ".join(["tok"] * 30), "en", "big"),
        (2, " ".join(["tok"] * 10), "en", "mid"),
        (3, " ".join(["tok"] * 10), "en", "tiny"),
    ]
    out = {r["source"]: r for r in mixture_weights(_docs(spark, rows)).collect()}
    assert out["big"]["n_tokens"] == 80 and out["big"]["n_docs"] == 2
    assert abs(sum(r["token_share"] for r in out.values()) - 1.0) < 1e-6
    masses = [r["weight"] * r["n_tokens"] for r in out.values()]
    assert max(masses) - min(masses) < 1e-3
    # uniform target: each source's rebalanced mass = total / n_src
    assert abs(masses[0] - 100 / 3) < 1e-3


def test_quality_stratify_ntile_fairness(spark):
    """Within each language: bucket sizes differ by <=1, buckets are
    contiguous under the (quality desc, doc_id) order, and bucket 1 holds
    the best-quality docs."""
    from maxx_spark.operators.corpus import quality_stratify

    good = ("the cat and the dog is of a kind to all in the end, "
            "and the story is told in a calm way of the old land.")
    rows = []
    for i in range(17):
        # alternate good text with junk (no stopwords, heavy punct)
        text = good if i % 2 == 0 else "!!! ??? ;;; ::: ,,," * 3
        rows.append((i, text, "en" if i < 12 else "de", f"s{i % 3}"))
    out = quality_stratify(_docs(spark, rows), n_buckets=4).collect()
    by_lang = {}
    for r in out:
        by_lang.setdefault(r["lang"], []).append(r)
    for lang, rs in by_lang.items():
        sizes = {}
        for r in rs:
            sizes[r["bucket"]] = sizes.get(r["bucket"], 0) + 1
        assert max(sizes.values()) - min(sizes.values()) <= 1, (lang, sizes)
        # recompute expected ntile by hand
        order = sorted(rs, key=lambda r: (-r["quality"], r["doc_id"]))
        n, k = len(order), 4
        expect = []
        big, rem = divmod(n, k)
        for b in range(k):
            expect += [b + 1] * (big + (1 if b < rem else 0))
        assert [r["bucket"] for r in order] == expect, lang
