"""Unit tests for the round-3 corpus operators (q42-q45). The DuckDB
oracle compare covers end-to-end values at sf0.001/0.01; these pin the
algorithmic properties the small-SF corpus may not exercise — chain-graph
convergence, tie-breaks, zero-hit probes."""

from pyspark.sql import functions as F


def _docs(spark, rows):
    return spark.createDataFrame(
        [(i, t, "en", f"src{i % 2}", len(t)) for i, t in enumerate(rows)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )


def test_connected_components_chain_and_singleton(spark):
    """A 4-node CHAIN (diameter 3 — needs multiple propagation rounds),
    a separate pair, and an isolated pair; labels = component min."""
    from maxx_spark.operators.dedup import connected_components

    pairs = spark.createDataFrame(
        [(10, 20), (20, 30), (30, 40), (100, 200), (7, 8)],
        "doc_a long, doc_b long",
    )
    expect = {
        10: (10, 4), 20: (10, 4), 30: (10, 4), 40: (10, 4),
        100: (100, 2), 200: (100, 2),
        7: (7, 2), 8: (7, 2),
    }
    # both solve paths must agree: driver-side union-find (small graphs)
    # and the distributed min-label loop (forced via local_threshold=0)
    for thr in (100_000, 0):
        out = {r["doc_id"]: (r["cluster_id"], r["cluster_size"])
               for r in connected_components(pairs, local_threshold=thr).collect()}
        assert out == expect, thr


def test_connected_components_reversed_chain(spark):
    """Worst case for min-propagation: the min id sits at the chain END
    (edges point 'away'), forcing label flow across the full diameter."""
    from maxx_spark.operators.dedup import connected_components

    pairs = spark.createDataFrame(
        [(50, 40), (40, 30), (30, 20), (20, 1)], "doc_a long, doc_b long"
    )
    for thr in (100_000, 0):
        out = {r["doc_id"]: r["cluster_id"]
               for r in connected_components(pairs, local_threshold=thr).collect()}
        assert set(out.values()) == {1} and len(out) == 5, thr


def test_connected_components_star_variant(spark):
    """algorithm='star' (large-star/small-star) must (a) agree byte-for-byte
    with union-find and with propagation on ordinary graphs, and (b) solve a
    long PATH — propagation's worst case, where rounds = diameter — within a
    round budget propagation provably blows."""
    import random

    from maxx_spark.operators.dedup import (
        _cc_propagation,
        _cc_star,
        connected_components,
    )

    # ordinary graphs: random edges + a 3-node chain — star == others
    rng = random.Random(3)
    nodes = list(range(0, 400, 7))
    random_pairs = [(rng.choice(nodes), rng.choice(nodes)) for _ in range(60)]
    pairs = spark.createDataFrame(
        [(a, b) for a, b in random_pairs if a != b] + [(900, 901), (901, 902)],
        "doc_a long, doc_b long",
    )
    want = {r["doc_id"]: (r["cluster_id"], r["cluster_size"])
            for r in connected_components(pairs).collect()}  # union-find path
    for algo in ("propagation", "star", "auto"):
        got = {r["doc_id"]: (r["cluster_id"], r["cluster_size"])
               for r in connected_components(pairs, local_threshold=0, algorithm=algo).collect()}
        assert got == want, algo

    # 120-node path, min at the far end: diameter 119. In 8 rounds
    # propagation moves the min label only ~8 hops (not converged); star
    # collapses the whole path to one root and converges strictly early.
    path = spark.createDataFrame(
        [(i, i + 1) for i in range(119)], "doc_a long, doc_b long"
    )
    und = path.select(F.col("doc_a"), F.col("doc_b"))
    prop_labels, prop_rounds, prop_conv = _cc_propagation(und, max_iters=8)
    star_labels, star_rounds = _cc_star(und, max_iters=12)
    star = {r["doc_id"]: r["label"] for r in star_labels.collect()}
    assert star == {i: 0 for i in range(120)}
    # O(log^2 n) contraction: 8 working rounds + 1 stationary confirm round
    assert star_rounds <= 9, star_rounds
    assert prop_conv is False  # the signal auto escalates on
    prop = {r["doc_id"]: r["label"] for r in prop_labels.collect()}
    assert prop[119] != 0  # diameter-bound: propagation can't finish in 8


def test_connected_components_auto_escalation(spark):
    """The 'auto' selection rule: converge-in-K graphs never escalate
    (propagation round count only); a diameter-119 path escalates after K
    rounds and still lands the exact component min via the quotient-graph
    star hand-off."""
    from maxx_spark.operators.dedup import _cc_auto, _cc_propagation

    # clique through a canonical doc (the common dedup shape, diameter 2):
    # auto must stop inside the propagation budget — no escalation rounds
    clique = spark.createDataFrame(
        [(5, x) for x in (9, 23, 41)] + [(9, 23)], "doc_a long, doc_b long"
    )
    labels, rounds = _cc_auto(clique, max_iters=20, escalate_after=4)
    assert rounds <= 4
    assert {r["doc_id"]: r["label"] for r in labels.collect()} == {
        5: 5, 9: 5, 23: 5, 41: 5,
    }

    # 120-node path, min at the end: propagation alone needs 119 rounds;
    # auto runs K=4, hands the label-quotient chain to star, total rounds
    # far below the diameter
    path = spark.createDataFrame(
        [(i, i + 1) for i in range(119)], "doc_a long, doc_b long"
    )
    labels, rounds = _cc_auto(path, max_iters=20, escalate_after=4)
    got = {r["doc_id"]: r["label"] for r in labels.collect()}
    assert got == {i: 0 for i in range(120)}
    assert rounds < 119 // 2, rounds
    # sanity: the same budget pure propagation provably cannot finish in
    _, _, conv = _cc_propagation(path, max_iters=4)
    assert conv is False


def test_top_terms_tie_breaks(spark):
    """tf desc, then df asc (rarer wins), then term asc."""
    from maxx_spark.operators.text import top_terms

    docs = _docs(spark, [
        "alpha alpha beta beta gamma",   # alpha/beta tf=2; gamma tf=1
        "beta delta delta",              # beta appears in 2 docs, alpha in 1
    ])
    out = [(r["doc_id"], r["rnk"], r["term"], r["tf"], r["df"])
           for r in top_terms(docs, k=3).collect()]
    # doc 0: alpha (tf2, df1) beats beta (tf2, df2) on rarity; gamma third
    assert out[0] == (0, 1, "alpha", 2, 1)
    assert out[1] == (0, 2, "beta", 2, 2)
    assert out[2] == (0, 3, "gamma", 1, 1)
    # doc 1: delta (tf2) first, then beta
    assert out[3] == (1, 1, "delta", 2, 1)
    assert out[4] == (1, 2, "beta", 1, 2)


def test_contamination_zero_hit_probe_still_emitted(spark):
    from maxx_spark.operators.text import contamination_check

    docs = _docs(spark, ["the hash join order wins", "nothing to see"])
    out = {r["probe"]: (r["n_docs"], r["first_doc_id"])
           for r in contamination_check(
               docs, probes=["hash join order", "never present ngram"]).collect()}
    assert out["hash join order"] == (1, 0)
    assert out["never present ngram"] == (0, None)


def test_source_quality_counts_distinct_content(spark):
    from maxx_spark.operators.text import source_quality

    # doc 0/2 -> src0 (identical text -> 1 distinct), doc 1/3 -> src1
    docs = _docs(spark, ["same text here ok", "one of a kind", "same text here ok", "another text"])
    out = {r["source"]: (r["n_docs"], r["n_distinct"]) for r in source_quality(docs).collect()}
    assert out["src0"] == (2, 1)
    assert out["src1"] == (2, 2)


def test_vocab_build_ids_and_min_df(spark):
    """Contiguous ids from 0 in (df desc, tf desc, term asc) order; terms
    below min_df dropped; tf is the TOTAL occurrence count."""
    from maxx_spark.operators.text import vocab_build

    docs = _docs(spark, [
        "alpha alpha beta",      # alpha tf=2 here
        "alpha beta gamma",
        "beta delta",            # delta df=1 -> dropped at min_df=2
    ])
    out = [(r["vocab_id"], r["term"], r["tf"], r["df"]) for r in vocab_build(docs).collect()]
    # beta: df=3; alpha: df=2 tf=3; gamma/delta df=1 dropped... gamma df=1 too
    assert out == [(0, "beta", 3, 3), (1, "alpha", 3, 2)]
    all_terms = vocab_build(docs, min_df=1).collect()
    assert [r["vocab_id"] for r in all_terms] == list(range(len(all_terms)))
    assert {r["term"] for r in all_terms} == {"alpha", "beta", "gamma", "delta"}


def test_decontamination_overlap_fractions(spark):
    """Exact per-doc overlap fractions against an explicit probe dim;
    within-doc repeats of a shingle count once (distinct index); sub-n
    docs emit no row."""
    from maxx_spark.operators.text import decontamination_overlap

    probes = ["b c d", "x y z"]
    rows = [
        "a b c d e",          # shingles: abc bcd cde -> 1/3 contaminated
        "b c d b c d",        # bcd cdb dbc (distinct: bcd, cdb, dbc, ...) -> counted once
        "p q r s",            # no overlap
        "a b",                # < 3 words -> no row
    ]
    docs = _docs(spark, rows)
    out = {r["doc_id"]: r for r in decontamination_overlap(docs, probes=probes).collect()}
    assert set(out) == {0, 1, 2}
    assert (out[0]["n_shingles"], out[0]["n_contaminated"]) == (3, 1)
    assert out[0]["overlap_fraction"] == round(1 / 3, 6)
    assert out[1]["n_contaminated"] == 1  # 'b c d' present (twice in text, once distinct)
    assert out[2]["n_contaminated"] == 0


def test_pii_scan_patterns(spark):
    """Positive cases the synthetic corpus lacks: emails, IPv4-shaped runs,
    SSN-shaped triples, long digit runs; indicator counts, not validators
    (999.999.999.999 intentionally matches the IPv4 SHAPE)."""
    from maxx_spark.operators.text import pii_scan

    rows = [
        "contact me at jane.doe+spam@example.co.uk or bob@x.io today",
        "server at 10.0.0.1 and backup 999.999.999.999 respond",
        "ssn 123-45-6789 appears once; account 9876543210 is long",
        "clean text with no identifiers at all",
    ]
    out = {r["doc_id"]: r for r in pii_scan(_docs(spark, rows)).collect()}
    assert (out[0]["n_emails"], out[0]["needs_scrub"]) == (2, 1)
    assert (out[1]["n_ipv4"], out[1]["needs_scrub"]) == (2, 1)
    assert (out[2]["n_ssn_like"], out[2]["n_long_digit_runs"], out[2]["needs_scrub"]) == (1, 1, 1)
    assert (out[3]["n_emails"], out[3]["n_ipv4"], out[3]["needs_scrub"]) == (0, 0, 0)


def test_lexical_diversity_exact(spark):
    from maxx_spark.operators.text import lexical_diversity

    rows = ["a a b c", "unique words only here"]
    out = {r["doc_id"]: r for r in lexical_diversity(_docs(spark, rows)).collect()}
    r0 = out[0]
    assert (r0["n_tokens"], r0["n_types"], r0["n_hapax"]) == (4, 3, 2)
    assert r0["ttr"] == 0.75 and r0["hapax_frac"] == round(2 / 3, 6)
    r1 = out[1]
    assert r1["ttr"] == 1.0 and r1["hapax_frac"] == 1.0


def test_duplicated_span_stats_exact(spark):
    """q60: cross-doc duplicated 5-gram fraction — one shared span counts
    for both docs, within-doc repetition does NOT count, short docs get an
    explicit 0/0 row."""
    from maxx_spark.operators.dedup import duplicated_span_stats

    rows = [
        "one two three four five six",        # grams: {1-5, 2-6}; shares 1-5 with d1
        "zero one two three four five",       # grams: {0-4, 1-5}
        "totally different words here now",   # 1 unique gram
        "too short",                          # < 5 words -> no grams
        "x y z w v x y z w v",                # 5 distinct grams, all internal repeats
    ]
    out = {r["doc_id"]: r for r in duplicated_span_stats(_docs(spark, rows)).collect()}
    assert (out[0]["total_ngrams"], out[0]["dup_ngrams"], out[0]["dup_fraction"]) == (2, 1, 0.5)
    assert (out[1]["total_ngrams"], out[1]["dup_ngrams"], out[1]["dup_fraction"]) == (2, 1, 0.5)
    assert (out[2]["total_ngrams"], out[2]["dup_ngrams"], out[2]["dup_fraction"]) == (1, 0, 0.0)
    assert (out[3]["total_ngrams"], out[3]["dup_ngrams"], out[3]["dup_fraction"]) == (0, 0, 0.0)
    assert (out[4]["total_ngrams"], out[4]["dup_ngrams"], out[4]["dup_fraction"]) == (5, 0, 0.0)


def test_shared_shingle_index_identical(spark, sf_dir):
    """VERDICT r5 item 7: q12/q13/q44/q60 accept a pre-built shingle-key
    index (build ONCE at pipeline scale); passing it must be byte-identical
    to each operator's inline build at the same n."""
    from maxx_spark.operators.dedup import (
        dedup_clusters,
        duplicated_span_stats,
        minhash_lsh_pairs,
        ngram_jaccard_pairs,
        word_shingle_keys,
    )
    from maxx_spark.session import load_tables

    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    idx = word_shingle_keys(docs, 3).persist()
    try:
        idx.count()  # materialize once, as a pipeline would
        for fn in (ngram_jaccard_pairs, minhash_lsh_pairs, duplicated_span_stats):
            base = fn(docs, n=3)
            shared = fn(docs, n=3, index=idx)
            assert sorted(map(tuple, base.collect())) == sorted(map(tuple, shared.collect())), fn.__name__
        base = dedup_clusters(docs, n=3)
        shared = dedup_clusters(docs, n=3, index=idx)
        assert sorted(map(tuple, base.collect())) == sorted(map(tuple, shared.collect()))
    finally:
        idx.unpersist()


def test_quality_classifier_exact(spark):
    """q61: hand-computed per-mille features and BIGINT dot product.
    Row 0: 8 tokens, 7 stopwords -> stop_pm floor(7000/8)=875; 17 alpha
    chars of 24 -> alpha_pm floor(17000/24)=708; score 3*875+2*708=4041.
    Row 1: punctuation soup -> punct_pm 1000, score -4000, dropped.
    Row 2: single clean word -> alpha_pm 1000, score exactly at the 2000
    threshold boundary -> kept."""
    from maxx_spark.operators.text import quality_classifier

    rows = ["the a of to is and in or", "!!!!", "abcd"]
    out = {r["doc_id"]: r for r in quality_classifier(_docs(spark, rows)).collect()}
    r0 = out[0]
    assert (r0["stop_pm"], r0["alpha_pm"], r0["punct_pm"], r0["len_bucket"]) == (875, 708, 0, 0)
    assert (r0["q_score"], r0["keep"]) == (4041, 1)
    assert (out[1]["punct_pm"], out[1]["q_score"], out[1]["keep"]) == (1000, -4000, 0)
    assert (out[2]["alpha_pm"], out[2]["q_score"], out[2]["keep"]) == (1000, 2000, 1)


def test_token_histogram_exact(spark):
    """q62: decimal-magnitude buckets (digits of the word-token count),
    all-integer rollup per (source, bucket); single hash exchange, no
    Python stages."""
    from maxx_spark.operators.text import token_histogram
    from maxx_spark.plans import plan_summary

    rows = [
        "a b c",                      # src0: 3 tokens  -> bucket 1
        "one two three four five six seven eight nine ten eleven twelve",  # src1: 12 -> bucket 2
        "x " * 10,                    # src0: 10 tokens -> bucket 2
        "",                           # src1: 0 tokens  -> bucket 1
    ]
    out = {(r["source"], r["bucket"]): r for r in token_histogram(_docs(spark, rows)).collect()}
    assert set(out) == {("src0", 1), ("src0", 2), ("src1", 1), ("src1", 2)}
    assert (out[("src0", 1)]["n_docs"], out[("src0", 1)]["sum_tokens"]) == (1, 3)
    assert (out[("src0", 2)]["min_tokens"], out[("src0", 2)]["max_tokens"]) == (10, 10)
    assert (out[("src1", 1)]["n_docs"], out[("src1", 1)]["sum_tokens"]) == (1, 0)
    assert (out[("src1", 2)]["sum_tokens"], out[("src1", 2)]["max_tokens"]) == (12, 12)
    s = plan_summary(token_histogram(_docs(spark, rows)))
    assert s["shuffles"] == 1 and s["python_stages"] == 0


def test_source_overlap_exact(spark):
    """q63: distinct-shingle containment between sources; a shingle shared
    by MANY docs of the same pair still counts once (distinct before the
    self-join), and a prebuilt index= gives byte-identical output."""
    from maxx_spark.operators.dedup import source_ngram_overlap, word_shingle_keys

    rows = [
        "one two three four",    # src0: {one-two-three, two-three-four}
        "one two three five",    # src1: {one-two-three, two-three-five}
        "alpha beta gamma",      # src0: {alpha-beta-gamma}
        "one two three four",    # src1: duplicate of d0's grams (multiplicity probe)
    ]
    docs = _docs(spark, rows)
    out = source_ngram_overlap(docs).collect()
    assert len(out) == 1
    r = out[0]
    # src0 = {otf's 2, abg} = 3; src1 = {otf's 2 from d3, ott, tt5} = 3... see sets:
    # src0 grams {o-t-t, t-t-f, a-b-g} = 3; src1 grams {o-t-t, t-t-5, t-t-f} = 3
    assert (r["source_a"], r["source_b"]) == ("src0", "src1")
    assert (r["n_a"], r["n_b"], r["n_shared"]) == (3, 3, 2)
    assert r["containment_pm"] == 666  # floor(1000*2/3)
    pre = source_ngram_overlap(docs, index=word_shingle_keys(docs, 3)).collect()
    assert [tuple(x) for x in pre] == [tuple(x) for x in out]


def test_length_percentiles_exact(spark):
    """q67: percentile_disc semantics on the bounded histogram — smallest
    n_chars whose cumulative count reaches ceil(pm/1000 * n); integer-ceil
    rank (no float); per-source isolation."""
    from maxx_spark.operators.text import length_percentiles

    # src0 gets doc lengths 1..10 (doc_ids even), src1 a single length-5 doc
    rows = [("x" * L) for L in [1, 3, 5, 7, 9, 11, 13, 15, 17, 19, 5]]
    docs = spark.createDataFrame(
        [(i, t, "en", "src0" if i < 10 else "src1", len(t)) for i, t in enumerate(rows)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    out = {r["source"]: r for r in length_percentiles(docs).collect()}
    # src0: n=10; p50 -> rank ceil(5.0)=5 -> 5th smallest = 9
    # p90 -> rank 9 -> 17; p99 -> rank ceil(9.9)=10 -> 19
    assert (out["src0"]["n_docs"], out["src0"]["p50"], out["src0"]["p90"], out["src0"]["p99"]) == (10, 9, 17, 19)
    # src1: single doc -> every percentile is that value
    assert (out["src1"]["n_docs"], out["src1"]["p50"], out["src1"]["p99"]) == (1, 5, 5)


def test_dedup_df_modes_equivalent(spark):
    """_capped_shingles df_mode='join' (the AQE-splittable default since
    r6) must produce byte-identical q12 output to the count-window form
    (kept for single-box squeezing)."""
    from maxx_spark.operators.dedup import ngram_jaccard_pairs

    rows = [
        "the quick brown fox jumps over the lazy dog",
        "the quick brown fox jumps over the lazy cat",
        "completely different text with no shared grams at all here",
        "the quick brown fox jumps over the lazy dog",  # exact dup of d0
        " ".join(["viral gram here"] * 30),  # repeated shingle inside one doc
    ]
    docs = _docs(spark, rows)
    a = sorted(tuple(r) for r in ngram_jaccard_pairs(docs, max_df=3).collect())
    b = sorted(tuple(r) for r in ngram_jaccard_pairs(docs, max_df=3, df_mode="window").collect())
    assert a == b and len(a) > 0


def test_minhash_string_index_equivalent(spark, sf_dir):
    """r7: minhash_lsh_pairs builds its hash arithmetic as SQL strings with
    two x-derivations (pre-hashed bigint keys vs md5i over a raw STRING
    shingle index). Both index forms must produce identical pairs — pins
    the rarely-exercised string branch against the rewrite."""
    from maxx_spark.operators.dedup import minhash_lsh_pairs, word_shingles
    from maxx_spark.session import load_tables

    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    idx_str = word_shingles(docs, 3)
    assert dict(idx_str.dtypes)["shingle"] == "string"
    base = minhash_lsh_pairs(docs, n=3)
    via_str = minhash_lsh_pairs(docs, n=3, index=idx_str)
    assert sorted(map(tuple, base.collect())) == sorted(map(tuple, via_str.collect()))


def test_drop_late_events_matches_sequential_reference(spark):
    """r7: drop_late_events switched from sampled range partitions to
    deterministic event_id chunks — pin the kept set against a sequential
    reference (arrival order = event_id; watermark = running max(ts) over
    strictly-earlier arrivals minus delay; late iff ts < wm), including
    sparse/skewed id spaces and an all-late tail."""
    import datetime as dt

    from pyspark.sql import functions as F

    from maxx_spark.operators.windows import drop_late_events

    base = dt.datetime(2024, 1, 1)
    rows = []
    # sparse, non-contiguous ids; ts deliberately out of order with a late
    # straggler far behind the running max
    spec = [
        (3, 0), (10, 50), (11, 40), (500, 45), (501, 2), (502, 55),
        (90_000, 56), (90_001, 30), (90_002, 57), (90_003, 58),
    ]
    for eid, mins in spec:
        rows.append((eid, base + dt.timedelta(minutes=mins), eid % 3, "t", 1.0))
    events = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
    )
    delay_min = 10
    kept_ref = []
    mx = None
    for eid, mins in sorted(spec):
        ts = base + dt.timedelta(minutes=mins)
        wm = None if mx is None else mx - dt.timedelta(minutes=delay_min)
        if wm is None or ts >= wm:
            kept_ref.append(eid)
        mx = ts if mx is None else max(mx, ts)
    got = sorted(
        r["event_id"]
        for r in drop_late_events(events, delay=f"{delay_min} minutes").collect()
    )
    assert got == sorted(kept_ref), (got, kept_ref)
