"""Text-analysis operators for training-data pipelines.

All hot-path logic is built-in ``pyspark.sql.functions`` (JVM, codegen) — token
counting, quality ratios, fingerprints, and the n-gram language-ID heuristic are
pure Column expressions that survive a 100 TB scan without Python in the loop.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# Tiny per-language stopword marker sets for the heuristic language ID.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "a", "in", "is"],
    "es": ["el", "la", "de", "que", "y", "en", "los"],
    "fr": ["le", "la", "de", "et", "les", "des", "un"],
    "de": ["der", "die", "das", "und", "nicht", "ein", "zu"],
}


def tokens(col: Column) -> Column:
    """Whitespace tokenization; empty/blank text → empty array (not [''])."""
    t = F.split(F.trim(col), r"\s+")
    return F.when(F.trim(col) == "", F.array().cast("array<string>")).otherwise(t)


def bpe_ish_tokens(col: Column) -> Column:
    """A BPE-flavored regex tokenizer: words, numbers, punctuation runs —
    approximates subword token counts for budget estimation."""
    return F.regexp_extract_all(
        col, F.lit(r"([A-Za-z]+|[0-9]+|[^\sA-Za-z0-9]+)"), 1)


def token_count(df: DataFrame, text_col: str = "text",
                out_col: str = "n_tokens") -> DataFrame:
    return df.withColumn(out_col, F.size(tokens(F.col(text_col))))


_ASCII_LETTERS = ("ABCDEFGHIJKLMNOPQRSTUVWXYZ"
                  "abcdefghijklmnopqrstuvwxyz")
_ASCII_DIGITS = "0123456789"
# Java regex \s == [ \t\n\x0B\f\r] exactly (no Unicode flag anywhere here)
_JAVA_WS = " \t\n\x0b\f\r"


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Length / punctuation / digit / word-shape quality signals per document.

    Char-class counts use ``translate`` (a per-character map lookup, fully
    codegen) instead of ``regexp_replace`` (NFA regex engine per char) —
    measured ~3x cheaper per pass at sf1.0 with bit-identical results: the
    classes are exact ASCII sets, so "count of [A-Za-z]" ==
    ``length(c) - length(translate(c, letters, ''))`` (guide §4.1: prefer
    built-ins; the cheapest built-in that computes the same thing wins).
    """
    c = F.col(text_col)
    toks = tokens(c)
    n_chars = F.length(c)
    n_alpha = n_chars - F.length(F.translate(c, _ASCII_LETTERS, ""))
    n_digit = n_chars - F.length(F.translate(c, _ASCII_DIGITS, ""))
    n_punct = F.length(F.translate(
        c, _ASCII_LETTERS + _ASCII_DIGITS + _JAVA_WS, ""))
    n_tok = F.size(toks)
    return df.withColumns({
        "n_chars_calc": n_chars,
        "n_tokens": n_tok,
        "avg_token_len": F.round(F.when(n_tok > 0,
                                        (n_chars - (n_tok - 1)) / n_tok)
                                 .otherwise(F.lit(0.0)), 6),
        "alpha_ratio": F.round(n_alpha / F.greatest(n_chars, F.lit(1)), 6),
        "digit_ratio": F.round(n_digit / F.greatest(n_chars, F.lit(1)), 6),
        "punct_ratio": F.round(n_punct / F.greatest(n_chars, F.lit(1)), 6),
    })


def lang_scores(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic language ID: per-language stopword-hit ratio over tokens,
    plus the argmax language ('und' when nothing matches)."""
    toks = tokens(F.lower(F.col(text_col)))
    n = F.greatest(F.size(toks), F.lit(1))
    out = df
    score_cols = []
    for lang, markers in LANG_MARKERS.items():
        marker_arr = F.array(*[F.lit(m) for m in markers])
        hits = F.size(F.filter(toks, lambda t: F.array_contains(marker_arr, t)))
        out = out.withColumn(f"score_{lang}", F.round(hits / n, 6))
        score_cols.append(f"score_{lang}")
    best = F.greatest(*[F.col(c) for c in score_cols])
    pred = F.lit("und")
    for lang in reversed(list(LANG_MARKERS)):
        pred = F.when((F.col(f"score_{lang}") == best) & (best > 0),
                      F.lit(lang)).otherwise(pred)
    return out.withColumn("lang_pred", pred)


def fingerprint(df: DataFrame, text_col: str = "text",
                out_col: str = "fp") -> DataFrame:
    """Deterministic document fingerprint: md5 of case/whitespace-normalized
    text. (md5 so the DuckDB oracle can reproduce it byte-for-byte.)"""
    norm = F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " ")
    return df.withColumn(out_col, F.md5(norm))


def rolling_hash_fingerprint(df: DataFrame, text_col: str = "text",
                             out_col: str = "rh", base: int = 31,
                             mod: int = (1 << 31) - 1) -> DataFrame:
    """Rabin-Karp polynomial rolling hash over characters — an order-sensitive
    content fingerprint that, unlike md5, can be computed incrementally and
    compared per-prefix: h = fold(c ∈ chars, (acc·base + codepoint(c)) % mod).

    Uses only arithmetic + ``ascii``/``substr`` so the DuckDB oracle reproduces
    it bit-for-bit (``list_reduce`` over the same fold). ``mod`` must satisfy
    ``mod * base + 0x10FFFF < 2^63`` — the fold stays in a signed long under
    ANSI overflow checking (default: Mersenne 2^31-1)."""
    c = F.col(text_col)
    # split('') is ONE pass over the string; an index-based
    # transform(sequence(1, length), i -> ascii(substr(c, i, 1))) is O(n²)
    # because each substr seeks from the start of the UTF-8 string —
    # measured 2.4× the whole-query wall on sf0.1 documents
    codes = F.transform(F.split(c, ""),
                        lambda ch: F.ascii(ch).cast("long"))
    h = F.aggregate(codes, F.lit(0).cast("long"),
                    lambda acc, x: F.pmod(acc * F.lit(base) + x, F.lit(mod)))
    # sequence(1, 0) would run DESCENDING — guard the empty string explicitly
    return df.withColumn(
        out_col, F.when(F.length(c) == 0, F.lit(0).cast("long")).otherwise(h))


def quality_filter(df: DataFrame, text_col: str = "text",
                   id_col: str = "doc_id",
                   min_tokens: int = 5, max_tokens: int = 100_000,
                   min_alpha_ratio: float = 0.5,
                   max_digit_ratio: float = 0.3,
                   max_punct_ratio: float = 0.2) -> DataFrame:
    """Training-data quality gate: per document, every threshold verdict plus
    an overall ``keep`` flag — one shuffle-free projection over
    :func:`quality_features`'s signals.

    Emits the REASONS, not just the survivors (``drop_reasons``:
    array<string>): at corpus scale the drop distribution is the thing you
    audit before trusting a filter — a silent 40% drop from one rule is a
    bug report, not a cleaning step. Filter with ``.where("keep")``; audit
    with ``groupBy(explode(drop_reasons))``.
    """
    q = quality_features(df, text_col)
    checks = [
        ("too_few_tokens", F.col("n_tokens") < min_tokens),
        ("too_many_tokens", F.col("n_tokens") > max_tokens),
        ("low_alpha_ratio", F.col("alpha_ratio") < min_alpha_ratio),
        ("high_digit_ratio", F.col("digit_ratio") > max_digit_ratio),
        ("high_punct_ratio", F.col("punct_ratio") > max_punct_ratio),
    ]
    reasons = F.array_compact(F.array(
        *[F.when(cond, F.lit(name)) for name, cond in checks]))
    return (q.withColumn("drop_reasons", reasons)
            .withColumn("keep", F.size("drop_reasons") == 0))
