"""Text-analysis operators over the documents table: language ID, quality
scoring, token counting, fingerprinting.

All pure built-in column expressions — no Python in the hot path, every
operator whole-stage-codegen eligible, trivially linear-scalable (no
shuffle at all except the final optional orderBy for display).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from maxx_spark.operators.dedup import normalized

# Tiny per-language stopword marker sets for the n-gram/stopword heuristic.
# Deterministic and mirrored verbatim in the SQL oracle.
STOPWORDS = {
    "en": ["the", "a", "of", "and", "to", "in", "is"],
    "de": ["der", "die", "das", "und", "ist", "nicht"],
    "fr": ["le", "la", "les", "et", "est", "une"],
    "es": ["el", "la", "los", "y", "es", "una"],
}


def _tok(col):
    return F.split(normalized(col), " ")


def lang_id(documents: DataFrame) -> DataFrame:
    """Stopword-ratio language ID: for each language, ratio of tokens in its
    marker set; predict argmax language if its ratio >= 0.02 else 'und'.
    Ties break by language code order (deterministic)."""
    toks = _tok(F.col("text"))
    n = F.greatest(F.size(toks), F.lit(1))
    cols = {}
    for lang, words in STOPWORDS.items():
        hits = F.size(F.filter(toks, lambda t: t.isin(*words)))
        cols[lang] = (hits.cast("double") / n.cast("double"))
    df = documents.select("doc_id", "lang", *[v.alias(f"r_{k}") for k, v in cols.items()])
    langs = sorted(STOPWORDS)
    best_ratio = F.greatest(*[F.col(f"r_{k}") for k in langs])
    pred = F.lit("und")
    for k in reversed(langs):  # earlier codes win ties → apply in reverse
        pred = F.when((F.col(f"r_{k}") >= 0.02) & (F.col(f"r_{k}") == best_ratio), F.lit(k)).otherwise(pred)
    return (
        df.select(
            "doc_id",
            F.col("lang").alias("declared_lang"),
            pred.alias("pred_lang"),
            F.round(best_ratio, 6).alias("best_ratio"),
        )
        .orderBy("doc_id")
    )


def quality_score(documents: DataFrame) -> DataFrame:
    """Length / punctuation / stopword quality components + composite.

    Components are integer or exactly-derived ratios rounded once at the
    end, so the oracle matches bit-for-bit.
    """
    text = F.col("text")
    toks = _tok(text)
    n_tok = F.size(toks)
    n_char = F.length(text)
    n_alpha = F.length(F.regexp_replace(text, r"[^A-Za-z]", ""))
    n_punct = F.length(F.regexp_replace(text, r"[^.,;:!?]", ""))
    en = STOPWORDS["en"]
    n_stop = F.size(F.filter(toks, lambda t: t.isin(*en)))
    mean_wl = F.when(n_tok > 0, n_alpha.cast("double") / n_tok.cast("double")).otherwise(F.lit(0.0))
    stop_ratio = F.when(n_tok > 0, n_stop.cast("double") / n_tok.cast("double")).otherwise(F.lit(0.0))
    punct_ratio = F.when(n_char > 0, n_punct.cast("double") / n_char.cast("double")).otherwise(F.lit(0.0))
    composite = (
        F.when((n_tok >= 10) & (n_tok <= 100000), F.lit(1)).otherwise(F.lit(0))
        + F.when((mean_wl >= 2.0) & (mean_wl <= 12.0), F.lit(1)).otherwise(F.lit(0))
        + F.when(stop_ratio >= 0.01, F.lit(1)).otherwise(F.lit(0))
        + F.when(punct_ratio <= 0.2, F.lit(1)).otherwise(F.lit(0))
    )
    return documents.select(
        "doc_id",
        n_tok.alias("n_tokens"),
        n_char.cast("long").alias("n_chars_obs"),
        F.round(mean_wl, 6).alias("mean_word_len"),
        F.round(stop_ratio, 6).alias("stopword_ratio"),
        F.round(punct_ratio, 6).alias("punct_ratio"),
        composite.alias("quality"),
    ).orderBy("doc_id")


def token_counts(documents: DataFrame) -> DataFrame:
    """Token counting two ways: whitespace tokens and regex word tokens
    ([a-z0-9]+ over the lowered text — a BPE-ish pre-tokenizer split)."""
    text = F.col("text")
    ws = F.size(F.split(F.trim(text), r"\s+"))
    wordish = F.size(F.regexp_extract_all(F.lower(text), F.lit(r"[a-z0-9]+"), 0))
    return documents.select(
        "doc_id",
        ws.alias("ws_tokens"),
        wordish.alias("word_tokens"),
    ).orderBy("doc_id")


def fingerprint(documents: DataFrame) -> DataFrame:
    """Document fingerprint: md5 of aggressively normalized text (lower,
    non-alnum → space, collapse, trim) — canonical near-exact-dup key."""
    norm = F.trim(F.regexp_replace(F.regexp_replace(F.lower(F.col("text")), r"[^a-z0-9]+", " "), r"\s+", " "))
    return documents.select(
        "doc_id",
        F.md5(norm).alias("fp_md5"),
        F.length(norm).cast("long").alias("norm_len"),
    ).orderBy("doc_id")


def rolling_fingerprint(documents: DataFrame, window: int = 8, keep: int = 4) -> DataFrame:
    """Winnowing-style rolling fingerprint: md5i of each ``window``-token
    shingle, keep the ``keep`` smallest per doc (a robust partial-overlap
    signature). Built-ins only: transform over index range + array_sort +
    slice. Emitted exploded (doc_id, sig_rank, sig_hash) so the oracle
    compares scalar columns."""
    from maxx_spark.operators.dedup import md5i

    toks = _tok(F.col("text"))
    idx = F.when(
        F.size(toks) >= window, F.sequence(F.lit(0), F.size(toks) - window)
    ).otherwise(F.expr("array()").cast("array<int>"))
    hashes = F.transform(idx, lambda i: md5i(F.concat_ws(" ", F.slice(toks, i + 1, window))))
    sig = F.slice(F.array_sort(hashes), 1, keep)
    return (
        documents.select("doc_id", F.posexplode(sig).alias("sig_rank", "sig_hash"))
        .orderBy("doc_id", "sig_rank")
    )
