"""Text-analysis operators for training-data pipelines.

All pure Column algebra (JVM, codegen) — no Python UDFs in the hot path;
a 100 TB corpus scan stays whole-stage-codegen'd end to end.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Wordlist-based language ID: tiny per-language function-word lists.
# (n-gram heuristic in the tokenized regime; real pipelines plug fasttext
# via a pandas_udf — the scoring/argmax scaffolding is identical.)
STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "a", "in", "is", "it", "for", "on"),
    "de": ("der", "die", "das", "und", "ist", "von", "mit", "für", "auf", "ein"),
    "fr": ("le", "la", "les", "et", "de", "un", "une", "est", "pour", "dans"),
    "es": ("el", "la", "los", "las", "y", "de", "un", "una", "es", "para"),
    "zh": ("的", "了", "是", "在", "我", "有", "和", "就", "不", "人"),
}

# BPE-ish word/number/symbol segmentation (shared with the DuckDB oracle —
# plain RE2/Java-compatible character classes only).
TOKEN_REGEX = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"

FINGERPRINT_MOD = 1_000_000_007  # keeps acc*31+cp < 2^63 at every fold step


def tokens(col: Column | str) -> Column:
    """Whitespace tokenization, empty-safe."""
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(F.split(c, r"\s+"), lambda x: x != "")


def token_count(col: Column | str) -> Column:
    return F.size(tokens(col))


def regex_token_count(col: Column | str) -> Column:
    """BPE-ish token count: letter-runs + digit-runs + single symbols."""
    c = F.col(col) if isinstance(col, str) else col
    return F.size(F.regexp_extract_all(c, F.lit(TOKEN_REGEX), F.lit(0)))


def language_scores(col: Column | str) -> list[Column]:
    """Per-language stopword-hit counts over the token array."""
    toks = F.transform(tokens(col), F.lower)
    return [
        F.size(F.filter(toks, lambda x: x.isin(*words))).alias(f"score_{lang}")
        for lang, words in STOPWORDS.items()
    ]


def predicted_language(col: Column | str) -> Column:
    """Argmax language (alphabetical tiebreak): array of (score, -ord, lang)
    structs reduced with array_max — single pass, no shuffle."""
    toks = F.transform(tokens(col), F.lower)
    entries = [
        F.struct(
            F.size(F.filter(toks, lambda x: x.isin(*words))).alias("score"),
            F.lit(-i).alias("prio"),  # earlier (alphabetical) wins ties
            F.lit(lang).alias("lang"),
        )
        for i, (lang, words) in enumerate(sorted(STOPWORDS.items()))
    ]
    return F.array_max(F.array(*entries))["lang"]


def quality_features(col: Column | str) -> dict[str, Column]:
    """Length / punctuation / digit / stopword statistics — the classic
    pre-training quality filters (C4-style heuristics)."""
    c = F.col(col) if isinstance(col, str) else col
    toks = tokens(c)
    n_tok = F.size(toks)
    n_chars = F.length(c)
    alpha_chars = F.length(F.regexp_replace(c, r"[^A-Za-z]", ""))
    digit_chars = F.length(F.regexp_replace(c, r"[^0-9]", ""))
    punct_chars = F.length(F.regexp_replace(c, r"[^.,;:!?'\"()-]", ""))
    en_stop = STOPWORDS["en"]
    stop_hits = F.size(F.filter(F.transform(toks, F.lower), lambda x: x.isin(*en_stop)))
    mean_tok_len = F.when(
        n_tok > 0,
        F.aggregate(toks, F.lit(0), lambda acc, x: acc + F.length(x)).cast("double") / n_tok,
    ).otherwise(F.lit(0.0))
    return {
        "n_chars": n_chars.cast("bigint"),
        "n_tokens": n_tok.cast("bigint"),
        "mean_token_len": mean_tok_len,
        "alpha_ratio": alpha_chars.cast("double") / F.greatest(n_chars, F.lit(1)),
        "digit_ratio": digit_chars.cast("double") / F.greatest(n_chars, F.lit(1)),
        "punct_ratio": punct_chars.cast("double") / F.greatest(n_chars, F.lit(1)),
        "stopword_ratio": stop_hits.cast("double") / F.greatest(n_tok, F.lit(1)),
    }


def fingerprint(col: Column | str, mod: int = FINGERPRINT_MOD) -> Column:
    """Deterministic rolling-hash document fingerprint:
    fold(acc*31 + codepoint) % mod over the characters. Engine-portable
    (DuckDB: list_reduce over ascii codes) and order-sensitive, unlike
    set-based sketches."""
    c = F.col(col) if isinstance(col, str) else col
    chars = F.split(c, "")
    return F.aggregate(
        chars,
        F.lit(0).cast("long"),
        lambda acc, ch: (acc * 31 + F.ascii(ch)) % mod,
    )


def with_text_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Attach the full feature set — one projection, zero shuffles."""
    feats = quality_features(text_col)
    out = df
    for name, colx in feats.items():
        out = out.withColumn(name, colx)
    return (
        out.withColumn("predicted_lang", predicted_language(text_col))
        .withColumn("bpe_token_count", regex_token_count(text_col))
        .withColumn("fingerprint", fingerprint(text_col))
    )


def gopher_rules(
    col: Column | str,
    min_tokens: int = 50,
    max_tokens: int = 100_000,
    min_mean_token_len: float = 3.0,
    max_mean_token_len: float = 10.0,
    max_symbol_ratio: float = 0.1,
    min_alpha_token_ratio: float = 0.8,
    max_repeated_top_token_ratio: float = 0.2,
) -> dict[str, Column]:
    """Gopher-style document quality rules (Rae et al., "Scaling Language
    Models" appendix quality heuristics — public literature): per-document
    boolean verdicts plus the underlying stats. Pure column algebra — a
    100 TB scan evaluates these in the same pass as the read.

    Rules: token-count bounds, mean-token-length bounds, symbol(#/...)
    to-token ratio, fraction of tokens with an alphabetic char, and
    top-token domination (most frequent token's share)."""
    c = F.col(col) if isinstance(col, str) else col
    toks = tokens(c)
    n_tok = F.size(toks)
    mean_len = F.when(
        n_tok > 0,
        F.aggregate(toks, F.lit(0), lambda acc, x: acc + F.length(x)).cast("double")
        / n_tok,
    ).otherwise(F.lit(0.0))
    n_symbols = F.size(F.filter(toks, lambda t: t.rlike(r"^(#+|\.{3,})$")))
    alpha_toks = F.size(F.filter(toks, lambda t: t.rlike("[A-Za-z]")))
    # top-token share via sort + longest-equal-run fold: O(n log n) per
    # row (a distinct-list x count scan would be quadratic and blow up on
    # max_tokens-sized docs)
    run = F.aggregate(
        F.array_sort(toks),
        F.struct(
            F.lit("").alias("prev"),
            F.lit(0).alias("run"),
            F.lit(0).alias("best"),
        ),
        lambda acc, x: F.struct(
            x.alias("prev"),
            (F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1))).alias("run"),
            F.greatest(
                acc["best"],
                F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1)),
            ).alias("best"),
        ),
        lambda acc: acc["best"],
    )
    top_count = F.when(n_tok > 0, run).otherwise(F.lit(0))
    safe_n = F.greatest(n_tok, F.lit(1))
    stats = {
        "g_n_tokens": n_tok.cast("bigint"),
        "g_mean_token_len": mean_len,
        "g_symbol_ratio": n_symbols.cast("double") / safe_n,
        "g_alpha_token_ratio": alpha_toks.cast("double") / safe_n,
        "g_top_token_ratio": F.coalesce(
            top_count.cast("double") / safe_n, F.lit(0.0)
        ),
    }
    verdict = (
        (n_tok >= min_tokens)
        & (n_tok <= max_tokens)
        & (stats["g_mean_token_len"] >= min_mean_token_len)
        & (stats["g_mean_token_len"] <= max_mean_token_len)
        & (stats["g_symbol_ratio"] <= max_symbol_ratio)
        & (stats["g_alpha_token_ratio"] >= min_alpha_token_ratio)
        & (stats["g_top_token_ratio"] <= max_repeated_top_token_ratio)
    )
    return {**stats, "g_pass": verdict}


def with_gopher_rules(df: DataFrame, text_col: str = "text", **kw) -> DataFrame:
    feats = gopher_rules(text_col, **kw)
    return df.withColumns(feats)
