"""Text-analysis operators for large-scale training-data pipelines:
language-ID, quality scoring, token counting, document fingerprinting.

All hot-path expressions are pure Catalyst (``pyspark.sql.functions`` —
JVM-side, whole-stage codegen); nothing here crosses into Python at
runtime. These go beyond the reference (a per-document validator) as the
engine-level operators the north rule's pipeline context requires.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# Token counting
# ---------------------------------------------------------------------------

#: BPE-ish token pattern: word pieces OR single non-space punctuation.
TOKEN_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def whitespace_token_count(col: Column | str) -> Column:
    """Number of whitespace-separated tokens."""
    c = F.col(col) if isinstance(col, str) else col
    trimmed = F.trim(c)
    return F.when(F.length(trimmed) == 0, F.lit(0)).otherwise(
        F.size(F.split(trimmed, r"\s+"))
    )


def bpe_ish_token_count(col: Column | str) -> Column:
    """Approximate subword token count: alpha runs + digit runs + each
    punctuation char — a cheap, deterministic proxy for BPE vocab size
    estimation at corpus scale."""
    c = F.col(col) if isinstance(col, str) else col
    return F.coalesce(F.regexp_count(c, F.lit(TOKEN_PATTERN)), F.lit(0))


# ---------------------------------------------------------------------------
# Quality scoring
# ---------------------------------------------------------------------------

_STOPWORDS_EN = (
    "the", "of", "and", "to", "in", "a", "is", "that", "it", "for",
    "was", "on", "are", "with", "as", "be", "this", "at", "by",
)


def quality_features(col: Column | str) -> Column:
    """struct(n_chars, n_tokens, alpha_ratio, punct_ratio, digit_ratio,
    stopword_ratio, avg_token_len, uppercase_ratio) — the classic cheap
    quality signals (C4/Gopher-style heuristics) as one projection."""
    c = F.col(col) if isinstance(col, str) else col
    n_chars = F.length(c).cast("double")
    safe = F.greatest(n_chars, F.lit(1.0))
    n_alpha = F.coalesce(F.regexp_count(c, F.lit(r"[A-Za-z]")), F.lit(0))
    n_punct = F.coalesce(
        F.regexp_count(c, F.lit(r"[^\w\s]")), F.lit(0)
    )
    n_digit = F.coalesce(F.regexp_count(c, F.lit(r"[0-9]")), F.lit(0))
    n_upper = F.coalesce(F.regexp_count(c, F.lit(r"[A-Z]")), F.lit(0))
    n_tokens = whitespace_token_count(c).cast("double")
    safe_tokens = F.greatest(n_tokens, F.lit(1.0))
    stopword_pattern = r"(?i)\b(" + "|".join(_STOPWORDS_EN) + r")\b"
    n_stop = F.coalesce(
        F.regexp_count(c, F.lit(stopword_pattern)), F.lit(0)
    )
    return F.struct(
        n_chars.cast("long").alias("n_chars"),
        n_tokens.cast("long").alias("n_tokens"),
        (n_alpha / safe).alias("alpha_ratio"),
        (n_punct / safe).alias("punct_ratio"),
        (n_digit / safe).alias("digit_ratio"),
        (n_stop / safe_tokens).alias("stopword_ratio"),
        (n_chars / safe_tokens).alias("avg_token_len"),
        (n_upper / F.greatest(n_alpha.cast("double"), F.lit(1.0)))
        .alias("uppercase_ratio"),
    )


def quality_score(col: Column | str) -> Column:
    """Scalar [0,1] quality score from :func:`quality_features` — a
    monotone blend tuned so clean prose scores high and
    punctuation/digit soup scores low."""
    f = quality_features(col)
    length_ok = F.least(f["n_tokens"].cast("double") / F.lit(20.0), F.lit(1.0))
    alpha = f["alpha_ratio"]
    not_punct = F.lit(1.0) - F.least(f["punct_ratio"] * 4, F.lit(1.0))
    not_digit = F.lit(1.0) - F.least(f["digit_ratio"] * 4, F.lit(1.0))
    stop = F.least(f["stopword_ratio"] * 3, F.lit(1.0))
    score = (
        length_ok * 0.2 + alpha * 0.3 + not_punct * 0.2
        + not_digit * 0.15 + stop * 0.15
    )
    return F.round(score, 6)


# ---------------------------------------------------------------------------
# Language ID (n-gram / stopword heuristic)
# ---------------------------------------------------------------------------

_LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "is", "that", "with", "this", "have"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "ein", "mit"),
    "fr": ("le", "la", "les", "des", "est", "une", "dans", "pour"),
    "es": ("el", "los", "las", "una", "por", "con", "para", "este"),
    "it": ("il", "che", "di", "della", "per", "con", "sono", "una"),
}


def lang_scores(col: Column | str) -> Column:
    """struct(<lang>: double …) — per-language marker-word hit rate."""
    c = F.col(col) if isinstance(col, str) else col
    n_tokens = F.greatest(
        whitespace_token_count(c).cast("double"), F.lit(1.0)
    )
    scores = []
    for lang, words in _LANG_MARKERS.items():
        pat = r"(?i)\b(" + "|".join(words) + r")\b"
        hits = F.coalesce(F.regexp_count(c, F.lit(pat)), F.lit(0))
        scores.append((hits / n_tokens).alias(lang))
    return F.struct(*scores)


def lang_id(col: Column | str, *, min_score: float = 0.01) -> Column:
    """Best-scoring language code, or 'und' when nothing clears
    ``min_score``. Pure Catalyst argmax via a when-chain."""
    s = lang_scores(col)
    langs = list(_LANG_MARKERS)
    best = F.greatest(*[s[l] for l in langs])
    expr = F.lit("und")
    # reversed so earlier languages win ties (stable priority order)
    for lang in reversed(langs):
        expr = F.when(
            (s[lang] >= F.lit(min_score)) & (s[lang] == best), F.lit(lang)
        ).otherwise(expr)
    return expr


# ---------------------------------------------------------------------------
# Fingerprinting
# ---------------------------------------------------------------------------

def normalized_text(col: Column | str) -> Column:
    """Canonical form for exact-dup detection: lowercase, punctuation
    stripped, whitespace collapsed."""
    c = F.col(col) if isinstance(col, str) else col
    return F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(c), r"[^\w\s]", ""),
            r"\s+",
            " ",
        )
    )


def doc_fingerprint(col: Column | str) -> Column:
    """64-bit content fingerprint over the normalized text (xxhash64 —
    a rolling-hash-class digest computed JVM-side)."""
    return F.xxhash64(normalized_text(col))


def with_text_analysis(
    df: DataFrame, text_col: str = "text"
) -> DataFrame:
    """Convenience: df + (quality struct, quality_score, lang, n_tokens,
    n_bpe_tokens, fingerprint) in one projection."""
    return df.select(
        "*",
        quality_features(text_col).alias("quality"),
        quality_score(text_col).alias("quality_score"),
        lang_id(text_col).alias("lang_pred"),
        whitespace_token_count(text_col).alias("n_tokens"),
        bpe_ish_token_count(text_col).alias("n_bpe_tokens"),
        doc_fingerprint(text_col).alias("fingerprint"),
    )
