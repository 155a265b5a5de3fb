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


# ---------------------------------------------------------------------------
# Trained language ID: Cavnar-Trenkle character-n-gram rank profiles
# ("N-Gram-Based Text Categorization", 1994 — public literature). Upgrades
# the stopword-list fallback above to a model TRAINED from labeled data:
# per-language top-K n-gram rank profiles, classification by out-of-place
# rank distance. Both phases are pure DataFrame algebra (explode + count +
# row_number + broadcast join), so the whole train->classify pipeline is
# SQL-oracle-able and scales as two groupBys over corpus char-grams.
# ---------------------------------------------------------------------------


def char_ngrams(
    col: Column | str,
    n_set: tuple[int, ...] = (1, 2, 3),
    unit: str = "char",
) -> Column:
    """All n-grams (lengths in n_set) of the lowercased text, duplicates
    kept. ``unit='char'`` is the classic Cavnar-Trenkle alphabet;
    ``unit='word'`` ranks token n-grams instead — the right signal when
    languages share an alphabet but differ in word frequency. Guarded
    against short texts (sequence(1, 0) is a DESCENDING [1, 0], not
    empty)."""
    c = F.lower(F.col(col) if isinstance(col, str) else col)
    if unit == "word":
        toks = F.filter(F.split(c, r"\s+"), lambda x: x != "")

        def grams_of(n):
            cnt = F.size(toks) - (n - 1)
            return F.when(
                cnt >= 1,
                F.transform(
                    F.sequence(F.lit(1), cnt),
                    lambda i: F.array_join(F.slice(toks, i, n), " "),
                ),
            ).otherwise(F.array().cast("array<string>"))

    else:

        def grams_of(n):
            cnt = F.length(c) - (n - 1)
            return F.when(
                cnt >= 1,
                F.transform(
                    F.sequence(F.lit(1), cnt), lambda i: c.substr(i, F.lit(n))
                ),
            ).otherwise(F.array().cast("array<string>"))

    return F.concat(*[grams_of(n) for n in n_set])


def language_ngram_profiles(
    df: DataFrame,
    text_col: str = "text",
    lang_col: str = "lang",
    top_k: int = 300,
    n_set: tuple[int, ...] = (1, 2, 3),
    unit: str = "char",
) -> DataFrame:
    """(lang, gram, rank): each language's top_k most frequent char
    n-grams ranked 1..top_k (count desc, gram asc — a deterministic,
    engine-portable total order). Profile size is languages x top_k —
    tiny, broadcastable regardless of corpus size."""
    from pyspark.sql import Window

    grams = df.select(
        F.col(lang_col).alias("lang"),
        F.explode(char_ngrams(text_col, n_set, unit)).alias("gram"),
    )
    counts = grams.groupBy("lang", "gram").agg(F.count(F.lit(1)).alias("c"))
    w = Window.partitionBy("lang").orderBy(F.col("c").desc(), F.col("gram").asc())
    return (
        counts.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top_k)
        .select("lang", "gram", "rank")
    )


def classify_language_ngram(
    df: DataFrame,
    profiles: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    top_k: int = 300,
    n_set: tuple[int, ...] = (1, 2, 3),
    unit: str = "char",
) -> DataFrame:
    """(id, predicted_lang, distance): Cavnar-Trenkle out-of-place
    classification. Each document's own top_k rank profile joins the
    broadcast language profiles on gram; distance(lang) = sum over doc
    grams of |doc_rank - lang_rank|, with an out-of-place penalty of
    top_k for grams absent from the language profile; argmin language
    (alphabetical tiebreak). Shuffles: doc-gram groupBy + the final
    per-doc argmin groupBy — both keyed by id, corpus-linear."""
    from pyspark.sql import Window

    doc_grams = df.select(
        F.col(id_col), F.explode(char_ngrams(text_col, n_set, unit)).alias("gram")
    )
    doc_counts = doc_grams.groupBy(id_col, "gram").agg(
        F.count(F.lit(1)).alias("c")
    )
    w = Window.partitionBy(id_col).orderBy(F.col("c").desc(), F.col("gram").asc())
    doc_prof = (
        doc_counts.withColumn("drank", F.row_number().over(w))
        .filter(F.col("drank") <= top_k)
        .select(id_col, "gram", "drank")
    )
    n_langs = profiles.select("lang").distinct()
    n_doc = doc_prof.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_grams"))
    matched = (
        doc_prof.join(F.broadcast(profiles), "gram")
        .groupBy(id_col, "lang")
        .agg(
            F.sum(F.abs(F.col("drank") - F.col("rank"))).alias("in_place"),
            F.count(F.lit(1)).alias("n_matched"),
        )
    )
    # every (doc, lang) pair exists via the cross with the (tiny) lang
    # list, so languages matching NO grams still score (all out-of-place)
    scored = (
        n_doc.crossJoin(F.broadcast(n_langs))
        .join(matched, [id_col, "lang"], "left")
        .select(
            F.col(id_col),
            "lang",
            (
                F.coalesce(F.col("in_place"), F.lit(0))
                + (F.col("n_grams") - F.coalesce(F.col("n_matched"), F.lit(0)))
                * F.lit(top_k)
            ).alias("distance"),
        )
    )
    best = Window.partitionBy(id_col).orderBy(
        F.col("distance").asc(), F.col("lang").asc()
    )
    return (
        scored.withColumn("__rk", F.row_number().over(best))
        .filter(F.col("__rk") == 1)
        .select(F.col(id_col), F.col("lang").alias("predicted_lang"), "distance")
    )


# --- repetition metrics (RefinedWeb / Gopher "repetition removal") ---------


def dup_ngram_stats(col, n: int = 10):
    """(n_grams, n_dup_grams, dup_fraction) over whitespace-token n-grams —
    the Gopher/RefinedWeb duplicated-n-gram repetition signal. A doc whose
    top n-grams repeat heavily (boilerplate, SEO spam, template churn) has
    a high dup_fraction. Pure per-row array algebra: windows via
    transform(sequence), counted with aggregate over a sorted array — no
    shuffle, engine-portable integers."""
    toks = tokens(col)
    size = F.size(toks)
    grams = F.when(size < n, F.array().cast("array<string>")).otherwise(
        F.transform(
            F.sequence(F.lit(0), F.greatest(size - n, F.lit(0))),
            lambda i: F.array_join(F.slice(toks, i + 1, n), " "),
        )
    )
    n_grams = F.size(grams)
    n_distinct = F.size(F.array_distinct(grams))
    n_dup = n_grams - n_distinct
    frac = F.when(n_grams > 0, n_dup.cast("double") / n_grams.cast("double")).otherwise(
        F.lit(0.0)
    )
    return n_grams, n_dup, frac


def with_repetition_stats(df: DataFrame, text_col: str = "text", n: int = 10) -> DataFrame:
    g, d, f = dup_ngram_stats(F.col(text_col), n)
    return df.withColumns(
        {"n_grams": g.cast("int"), "n_dup_grams": d.cast("int"), "dup_fraction": f}
    )


# --- PII scrubbing (training-data hygiene; public regex patterns only) -----

# Patterns restricted to the Java-regex ∩ RE2 common subset so the DuckDB
# oracle can run the SAME pattern strings.
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ipv4": r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b",
    "phone": r"\+[0-9]{1,3}[ -][0-9]{3}[ -][0-9]{4,10}",
}


def scrub_pii(col, kinds: list[str] | None = None):
    """(scrubbed_text, {kind: count}) — redact public-pattern PII (emails,
    IPv4 addresses, international phone numbers) with [KIND] placeholders
    and count the redactions per kind. Row-local regexp_replace /
    regexp_count — JVM-side, shuffle-free, linear scan at any corpus
    size."""
    kinds = list(kinds or PII_PATTERNS)
    scrubbed = col
    counts = {}
    for k in kinds:
        pat = PII_PATTERNS[k]
        counts[k] = F.regexp_count(scrubbed, F.lit(pat)).cast("int")
        scrubbed = F.regexp_replace(scrubbed, pat, f"[{k.upper()}]")
    return scrubbed, counts


def with_pii_scrubbed(
    df: DataFrame, text_col: str = "text", kinds: list[str] | None = None
) -> DataFrame:
    scrubbed, counts = scrub_pii(F.col(text_col), kinds)
    return df.withColumns(
        {"scrubbed": scrubbed, **{f"n_{k}": c for k, c in counts.items()}}
    )


def normalize_text(
    df: DataFrame,
    text_col: str = "text",
    form: str = "NFC",
    collapse_whitespace: bool = True,
    strip_control: bool = True,
    out_col: str | None = None,
) -> DataFrame:
    """Unicode text normalization — the standard first stage of a
    pre-training pipeline (mojibake-adjacent cleanup before dedup hashes
    anything: the SAME text in composed vs decomposed form must hash
    identically). Order: strip C0/C1 control characters (JVM regexp,
    keeps \\t \\n \\r) -> canonical normalization to ``form`` (NFC
    default; NFKC/NFD/NFKD accepted — unicodedata via an Arrow batch,
    Spark has no JVM builtin) -> collapse whitespace runs + trim (JVM
    regexp). Everything except the normalization proper stays codegen'd;
    scan-pass, zero shuffles.

    The NFC path is exactly oracle-checkable: DuckDB's nfc_normalize
    composes identically (both implement Unicode canonical composition),
    so the driver query hash-matches the full stage."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    if form not in ("NFC", "NFKC", "NFD", "NFKD"):
        raise ValueError(f"unknown normalization form {form!r}")
    out = out_col or text_col
    col = F.col(text_col)
    if strip_control:
        col = F.regexp_replace(col, "[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F-\\x9F]", "")

    def norm(s: pd.Series) -> pd.Series:
        import unicodedata

        return s.map(
            lambda x: None if x is None else unicodedata.normalize(form, x)
        )

    norm.__annotations__ = {"s": pd.Series, "return": pd.Series}
    col = pandas_udf("string")(norm)(col)
    if collapse_whitespace:
        col = F.trim(F.regexp_replace(col, "\\s+", " "))
    return df.withColumn(out, col)


# Entity decode map, applied in order — &amp; LAST so "&amp;lt;" decodes to
# the literal "&lt;" (one level), matching the standard single-pass rule.
HTML_ENTITIES: tuple[tuple[str, str], ...] = (
    ("&nbsp;", " "),
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&apos;", "'"),
    ("&amp;", "&"),
)

# block-level closers/breaks that become whitespace so words don't glue
_HTML_BREAK = r"(?i)<(?:br|/p|/div|/li|/tr|/h[1-6])[^>]*>"
# alternation, not a backreference — RE2 (the oracle's engine) has no \1
_HTML_DROP_BLOCKS = r"(?is)<script[^>]*>.*?</script>|<style[^>]*>.*?</style>"
_HTML_TAG = r"<[^>]*>"


def html_extract_text(col) -> "Column":
    """WET-style text extraction from HTML (the CCNet/CommonCrawl ingest
    step): drop <script>/<style> blocks, turn block-level breaks into
    spaces, strip remaining tags, decode the common entities, collapse
    whitespace. Pure regexp_replace chain — whole-stage codegen, no
    Python — and every pattern is RE2-compatible, so a DuckDB oracle
    replays it verbatim. NOT a browser: malformed nesting degrades
    gracefully (unmatched tags are stripped, their text kept)."""
    c = F.col(col) if isinstance(col, str) else col
    c = F.regexp_replace(c, _HTML_DROP_BLOCKS, " ")
    c = F.regexp_replace(c, _HTML_BREAK, " ")
    c = F.regexp_replace(c, _HTML_TAG, " ")
    for ent, rep in HTML_ENTITIES:
        # entity strings contain no regex metacharacters — literal match
        c = F.regexp_replace(c, ent, rep)
    return F.trim(F.regexp_replace(c, r"\s+", " "))


# --- line-wise boilerplate filtering (the RefinedWeb/Dolma per-line
# stage: a document's nav crumbs, share buttons, cookie banners and
# numeric junk live on their OWN lines — dropping lines, not documents,
# keeps the prose) ---------------------------------------------------------

LINE_FILTER_SCHEMA_COLS = ("n_lines", "n_kept", "chars_removed")


def line_keep_predicate(
    line: Column,
    min_chars: int = 1,
    max_digit_frac: float | None = None,
    max_punct_frac: float | None = None,
    drop_regex: str | None = None,
) -> Column:
    """Keep-predicate for one line — every rule is engine-portable column
    algebra (length / regexp_replace counting / RE2-safe regex), so a
    DuckDB oracle replays the exact decision:

    - ``min_chars``: drop ultra-short lines (nav crumbs, stray bullets);
    - ``max_digit_frac``: drop lines that are mostly digits (timestamps,
      vote counts, phone-number walls);
    - ``max_punct_frac``: drop separator/decoration lines;
    - ``drop_regex``: explicit boilerplate patterns (cookie banners,
      'share this', ...). RE2-compatible patterns only.
    """
    keep = F.length(line) >= int(min_chars)
    n = F.greatest(F.length(line), F.lit(1)).cast("double")
    if max_digit_frac is not None:
        digits = F.length(F.regexp_replace(line, r"[^0-9]", ""))
        keep = keep & (digits.cast("double") / n <= float(max_digit_frac))
    if max_punct_frac is not None:
        # Unicode-aware: strip letters (ANY script), digits and whitespace;
        # the remainder is punctuation/symbols. \p{L}/\p{N} are supported
        # by BOTH Java regex (Spark) and RE2 (the DuckDB oracle) — a naive
        # [^a-zA-Z0-9\s] complement would count accented/CJK prose as
        # punctuation and delete non-English lines.
        punct = F.length(F.regexp_replace(line, r"[\p{L}\p{N}\s]", ""))
        keep = keep & (punct.cast("double") / n <= float(max_punct_frac))
    if drop_regex:
        keep = keep & ~line.rlike(drop_regex)
    return keep


def line_filter_table(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    sep: str = "\n",
    joiner: str | None = None,
    min_chars: int = 1,
    max_digit_frac: float | None = None,
    max_punct_frac: float | None = None,
    drop_regex: str | None = None,
    keep_cols: "tuple[str, ...]" = (),
) -> DataFrame:
    """Rewrite each document keeping only lines that pass
    ``line_keep_predicate`` — plus an audit of what was dropped:
    (id, [keep_cols...,] text, n_lines, n_kept, chars_removed). Pure
    per-row array algebra (split -> filter -> array_join): zero shuffle,
    zero Python, embarrassingly parallel at any corpus size. A document
    whose every line is boilerplate survives with text '' (filter on
    n_kept > 0 to drop it — the caller's policy, not this stage's). A
    NULL text is treated as '' (one empty line, zero kept) rather than
    propagating NULL/-1 audit values (ADVICE r7). Caller columns named in
    ``keep_cols`` pass through unchanged (the remove_duplicate_spans
    convention).

    ``sep`` is a REGEX (F.split semantics); ``joiner`` is a LITERAL.
    When ``joiner`` is omitted it defaults to ``sep`` — valid only for
    metacharacter-free separators, so a regex ``sep`` without an explicit
    joiner is rejected instead of silently reassembling documents with
    the pattern text."""
    if joiner is None:
        meta = set("\\.[]{}()*+?^$|")
        if any(ch in meta for ch in sep):
            raise ValueError(
                f"sep={sep!r} is a regex; pass an explicit literal joiner"
            )
        joiner = sep
    lines = F.split(F.coalesce(F.col(text_col), F.lit("")), sep)
    kept = F.filter(
        lines,
        lambda l: line_keep_predicate(
            l, min_chars, max_digit_frac, max_punct_frac, drop_regex
        ),
    )
    # stage the two arrays ONCE (no CSE across lambda boundaries)
    staged = df.withColumn("__lines", lines).withColumn("__kept", kept)
    joined_len = F.aggregate(
        "__lines", F.lit(0), lambda a, l: a + F.length(l)
    )
    kept_len = F.aggregate("__kept", F.lit(0), lambda a, l: a + F.length(l))
    return staged.select(
        F.col(id_col),
        *[F.col(c) for c in keep_cols],
        F.array_join("__kept", joiner).alias(text_col),
        F.size("__lines").alias("n_lines"),
        F.size("__kept").alias("n_kept"),
        (joined_len - kept_len).cast("bigint").alias("chars_removed"),
    )


# --- URL / domain curation (the RefinedWeb URL-filtering stage: drop
# documents from blocklisted or adult/junk domains before any content
# work; the host is also the key for per-domain quality stats) ------------

# RE2-compatible (the oracle's engine): scheme :// [userinfo@] HOST [:port]
_URL_HOST_RE = r"^[a-zA-Z][a-zA-Z0-9+.-]*://(?:[^/@?#]*@)?([^/:?#]+)"


def url_host(col) -> Column:
    """Lower-cased host of a URL column ('' when the value does not parse
    as scheme://...). Pure regexp_extract — codegen, oracle-replayable."""
    c = F.col(col) if isinstance(col, str) else col
    return F.lower(F.regexp_extract(c, _URL_HOST_RE, 1))


def registrable_suffix(host: Column, levels: int = 2) -> Column:
    """Last ``levels`` labels of a host (crude eTLD+1 without a PSL:
    'a.b.example.com' -> 'example.com') — the grouping key for domain
    stats and blocklists. A real public-suffix list plugs in as a
    broadcast join on this column."""
    parts = F.split(host, r"\.")
    n = F.size(parts)
    return F.when(n <= levels, host).otherwise(
        F.array_join(F.slice(parts, n - levels + 1, levels), ".")
    )


def url_blocklist_filter(
    df: DataFrame,
    url_col: str = "url",
    blocklist: list[str] | None = None,
    match_subdomains: bool = True,
) -> DataFrame:
    """Drop rows whose URL host is on the blocklist (exact host, or any
    subdomain of a listed domain when ``match_subdomains``). The
    blocklist is a plan literal here (task-shipped); at real scale pass
    a blocklist TABLE and anti-join on registrable_suffix instead —
    same semantics, broadcast-sized."""
    host = url_host(F.col(url_col))
    bad = F.lit(False)
    for d in blocklist or ():
        d = d.lower()
        bad = bad | (host == d)
        if match_subdomains:
            bad = bad | host.endswith("." + d)
    # NULL url -> NULL host -> NULL comparisons: a null URL is not
    # blocklisted (it is unparseable, same as host ''), so the predicate
    # must not null-propagate into the filter and drop the row
    return df.filter(~F.coalesce(bad, F.lit(False)))
