"""Blocked-GEMM near-dup: block sizing + skew robustness.

The operator assigns rows to blocks by xxhash64(vec_id) % NB so structured
id spaces (all-even ids, id ranges with gaps) can't empty half the blocks;
and with n_blocks=None it derives NB from count x dim. These tests pin
both properties against a brute-force numpy oracle.
"""

import numpy as np
import pytest


def _brute_pairs(ids, vecs, threshold):
    m = np.array(vecs, dtype=np.float64)
    m /= np.linalg.norm(m, axis=1, keepdims=True)
    cos = m @ m.T
    out = []
    for i in range(len(ids)):
        for j in range(len(ids)):
            if ids[i] < ids[j] and cos[i, j] >= threshold:
                out.append((ids[i], ids[j]))
    return sorted(out)


def _make_embeddings(spark, ids, rng, dim=8, n_dup_pairs=4):
    vecs = [list(rng.uniform(-1, 1, dim)) for _ in ids]
    # plant near-duplicates: copy + tiny jitter
    for k in range(n_dup_pairs):
        src, dst = 2 * k, 2 * k + 1
        vecs[dst] = [v + 1e-3 * rng.uniform(-1, 1) for v in vecs[src]]
    rows = [(int(i), [float(x) for x in v]) for i, v in zip(ids, vecs)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    # float32 round-trip so the oracle sees exactly what Spark stores
    stored = {r["vec_id"]: list(np.array(r["embedding"], dtype=np.float32)) for r in df.collect()}
    return df, stored


@pytest.mark.parametrize("stride", [1, 16])  # stride 16: all ids ≡ 0 (mod 16)
def test_gemm_pairs_match_bruteforce_under_id_skew(spark, stride):
    from maxx_spark.operators.similarity import cosine_near_dup_pairs

    rng = np.random.RandomState(7)
    ids = [i * stride for i in range(60)]
    df, stored = _make_embeddings(spark, ids, rng)
    got = [
        (r["vec_a"], r["vec_b"])
        for r in cosine_near_dup_pairs(df, threshold=0.9, n_blocks=8).collect()
    ]
    want = _brute_pairs(list(stored), list(stored.values()), 0.9)
    assert sorted(got) == want
    assert len(want) >= 4  # the planted duplicates are actually found


def test_gemm_autoderives_block_count(spark):
    from maxx_spark.operators.similarity import cosine_near_dup_pairs

    rng = np.random.RandomState(11)
    df, stored = _make_embeddings(spark, list(range(40)), rng)
    got = [
        (r["vec_a"], r["vec_b"])
        for r in cosine_near_dup_pairs(df, threshold=0.9).collect()  # n_blocks=None
    ]
    assert sorted(got) == _brute_pairs(list(stored), list(stored.values()), 0.9)


def test_gemm_block_guard_trips_on_oversized_block(spark, monkeypatch):
    """A manual n_blocks override that packs too much into one block must
    fail with the sizing rule, not an opaque row-limit overflow."""
    import maxx_spark.operators.similarity as S

    monkeypatch.setattr(S, "_BLOCK_MAX_BYTES", 1024)  # 1 KiB cap for the test
    rng = np.random.RandomState(3)
    df, _ = _make_embeddings(spark, list(range(64)), rng, dim=8)
    with pytest.raises(Exception, match="raise n_blocks"):
        S.cosine_near_dup_pairs(df, threshold=0.9, n_blocks=1).collect()


def test_knn_quantized_exact(spark):
    """q65: int8-style symmetric quantization (floor, not round — no
    half-even ambiguity) and EXACT integer-dot ranking; ties break by
    neighbor id; zero vectors quantize to all-zero codes."""
    from maxx_spark.operators.similarity import knn_cosine_quantized

    rows = [
        (0, [1.0, 0.0]),    # query: codes [127, 0]
        (1, [0.5, 0.5]),    # s=0.5 -> [127, 127]
        (2, [1.0, 0.1]),    # [127, floor(0.1*127/1.0)=12]
        (3, [-1.0, 0.0]),   # [-127, 0]
        (4, [0.0, 0.0]),    # zero vector -> [0, 0]
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = [tuple(r) for r in knn_cosine_quantized(df, n_queries=1, k=4).collect()]
    # dequantized-cosine ranking vs query [1,0]: the raw idot TIES v1/v2 at
    # 16129, but the scales/norms dequantize them apart — v2 (sb=1.0,
    # nb=sqrt(1.01), cos~0.995) outranks v1 (sb=0.5, nb=sqrt(0.5),
    # cos~0.707); the zero vector scores the -2.0 sentinel, above v3's
    # negative cosine
    assert out == [
        (0, 2, 16129, 1),
        (0, 1, 16129, 2),
        (0, 4, 0, 3),
        (0, 3, -16129, 4),
    ]
