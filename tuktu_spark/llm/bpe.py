"""Byte-pair-encoding tokenizer: distributed frequency extraction, exact
Sennrich-style merge learning, Arrow-batched encode/decode.

No reference analogue (the reference counts whitespace tokens); this is
the LLM-pipeline north-star operator the brief calls for ("token
counting — whitespace + a BPE-ish regex") done for real: learned merges,
not a fixed regex.

Scale design: the CORPUS-scale work is one distributed groupBy producing
the word-frequency table; everything after operates on the VOCABULARY
(distinct words), which is orders of magnitude smaller than the corpus
(a trillion-token crawl has ~10^7 distinct words after normalization).
Learning merges over the collected word-freq table on the driver is
therefore the correct topology — the alternative (a Spark job per merge,
K jobs of vocabulary-sized data) pays K scheduler round-trips to avoid
holding megabytes. Encoding broadcasts the merge ranks and runs inside
Arrow batches with a per-distinct-token memo (corpora repeat tokens
massively — same trick as the fastText bucket hashing).
"""

from __future__ import annotations

import json
from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_EOW = "▁"  # end-of-word marker (SentencePiece-style visible space)


@dataclass
class BpeModel:
    """Ordered merge list; rank = position. JSON round-trips for the
    model save/load surface the reference gives every trained model."""

    merges: list[tuple[str, str]]

    def to_json(self) -> str:
        return json.dumps({"merges": [list(m) for m in self.merges]})

    @classmethod
    def from_json(cls, s: str) -> "BpeModel":
        return cls(merges=[tuple(m) for m in json.loads(s)["merges"]])

    def ranks(self) -> dict[tuple[str, str], int]:
        return {m: i for i, m in enumerate(self.merges)}


def word_frequencies(
    df: DataFrame,
    text_col: str = "text",
    lowercase: bool = True,
    min_freq: int = 1,
    max_vocab: int | None = None,
) -> DataFrame:
    """(word, freq) over whitespace tokens — the one corpus-scale pass.

    ``min_freq``/``max_vocab`` bound the DRIVER-side collect in train_bpe:
    a web-scale corpus has 10^9+ distinct "words" (URLs, hex hashes,
    typos), nearly all hapaxes that cannot influence a merge anyway (a
    pair needs freq >= 2 to be chosen). Pruning happens INSIDE the
    aggregation job — the filter runs post-groupBy on the cluster, and
    the top-N is a distributed orderBy+limit — so the driver only ever
    sees the bounded table."""
    tok = F.explode(F.split(F.col(text_col), r"\s+")).alias("word")
    words = df.select(tok).filter(F.col("word") != "")
    if lowercase:
        words = words.select(F.lower("word").alias("word"))
    wf = words.groupBy("word").agg(F.count(F.lit(1)).alias("freq"))
    if min_freq > 1:
        wf = wf.filter(F.col("freq") >= min_freq)
    if max_vocab is not None:
        # deterministic: freq desc, then word asc as the tie-break
        wf = wf.orderBy(F.col("freq").desc(), F.col("word")).limit(max_vocab)
    return wf


def learn_bpe_merges(word_freq: list[tuple[str, int]], n_merges: int) -> BpeModel:
    """Exact Sennrich BPE on a (word, freq) table: repeatedly merge the
    most frequent adjacent symbol pair. Deterministic: ties break on the
    lexicographically smallest pair. Pure Python over the vocabulary."""
    vocab: dict[tuple[str, ...], int] = {}
    for w, f in word_freq:
        vocab[tuple(w) + (_EOW,)] = vocab.get(tuple(w) + (_EOW,), 0) + int(f)

    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs: dict[tuple[str, str], int] = {}
        for sym, f in vocab.items():
            for a, b in zip(sym, sym[1:]):
                pairs[(a, b)] = pairs.get((a, b), 0) + f
        if not pairs:
            break
        # deterministic: highest freq, then lexicographically smallest pair
        top_freq = max(pairs.values())
        if top_freq < 2:
            break
        best_pair = min(p for p, f in pairs.items() if f == top_freq)
        merges.append(best_pair)
        merged = best_pair[0] + best_pair[1]
        new_vocab: dict[tuple[str, ...], int] = {}
        for sym, f in vocab.items():
            out: list[str] = []
            i = 0
            while i < len(sym):
                if i + 1 < len(sym) and (sym[i], sym[i + 1]) == best_pair:
                    out.append(merged)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            key = tuple(out)
            new_vocab[key] = new_vocab.get(key, 0) + f
        vocab = new_vocab
    return BpeModel(merges=merges)


def train_bpe(
    df: DataFrame,
    text_col: str = "text",
    n_merges: int = 100,
    lowercase: bool = True,
    min_freq: int = 2,
    max_vocab: int | None = 5_000_000,
) -> BpeModel:
    """Distributed word-frequency pass + driver-side exact merge learning
    (see module docstring for why this topology is right at scale).

    The collect is bounded by ``min_freq`` (default 2 — hapax words can
    never push a pair to the freq>=2 merge threshold on their own, and
    they dominate web-scale distinct-word counts) and ``max_vocab``
    (default 5M rows ≈ a few hundred MB — ample for any natural-language
    vocabulary). Pass ``min_freq=1, max_vocab=None`` for exact tiny-corpus
    replication."""
    rows = word_frequencies(df, text_col, lowercase, min_freq, max_vocab).collect()
    return learn_bpe_merges([(r["word"], r["freq"]) for r in rows], n_merges)


def _encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    sym = list(word) + [_EOW]
    while len(sym) > 1:
        best_rank, best_i = None, None
        for i, pair in enumerate(zip(sym, sym[1:])):
            r = ranks.get(pair)
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_i is None:
            break
        sym[best_i : best_i + 2] = [sym[best_i] + sym[best_i + 1]]
    return sym


def bpe_encode(
    df: DataFrame,
    model: BpeModel,
    text_col: str = "text",
    out_col: str = "bpe_tokens",
    lowercase: bool = True,
) -> DataFrame:
    """Arrow-batched encode: text -> array<string> of BPE tokens. Merge
    ranks are broadcast (kilobytes); each batch keeps a per-distinct-word
    memo so repeated words cost one merge loop, not one per occurrence."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    spark = df.sparkSession
    b_ranks = spark.sparkContext.broadcast(model.ranks())

    def enc(texts):
        ranks = b_ranks.value
        memo: dict[str, list[str]] = {}

        def one(t):
            if t is None:
                return []
            out: list[str] = []
            for w in t.split():
                if lowercase:
                    w = w.lower()
                if w not in memo:
                    memo[w] = _encode_word(w, ranks)
                out.extend(memo[w])
            return out

        return texts.map(one)

    enc.__annotations__ = {"texts": pd.Series, "return": pd.Series}
    enc_udf = pandas_udf("array<string>")(enc)
    return df.withColumn(out_col, enc_udf(F.col(text_col)))


def bpe_decode(tokens_col) -> "F.Column":
    """array<string> of BPE tokens -> text. Inverse of encode up to
    whitespace normalization + lowercasing: concatenate and split on the
    end-of-word marker. Pure column algebra."""
    joined = F.array_join(tokens_col, "")
    return F.trim(F.regexp_replace(joined, _EOW, " "))
