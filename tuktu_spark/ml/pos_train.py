"""Train the heuristic POS tagger's open-class lexicon + suffix stats
from the bundled hand-tagged sample (round-4 verdict #6).

The reference loads pre-trained OpenNLP binaries per language
(nlp/processors/POSTagging.scala:17-64); the binaries are not in this
container, so the tagger's tables are LEARNED here from
``data/pos_tagged_sample.txt`` — a bundled, CC0, hand-tagged sample in
Universal-Dependencies style (one sentence per line, ``word/TAG``).
Training is pure Python over a ~140-sentence file and runs once at
import (deterministic: a pure function of the bundled file), keeping a
single source of truth — the Spark Column tagger AND the generated
DuckDB oracle CASE both read the same trained tables.

What is learned:

- ``TRAINED_LEXICON``: word -> majority tag (ties break on the
  lexicographically smallest tag, so the table is reproducible).
- ``suffix_stats``: per-suffix (majority_tag, count, purity) measured on
  HAPAX words only — words seen once are the standard proxy for the
  unseen words suffix rules actually fire on (the lexicon intercepts
  everything seen more often). ``train_suffix_rules`` keeps the
  hand-written rule order/precedence and swaps in the sample majority
  only where the evidence is strong (count >= min_count and purity >=
  min_purity); thin or impure evidence keeps the linguistically-informed
  default.
"""

from __future__ import annotations

import os
from collections import Counter, defaultdict

_SAMPLE_PATH = os.path.join(os.path.dirname(__file__), "data", "pos_tagged_sample.txt")


def load_tagged_sample(path: str | None = None) -> list[list[tuple[str, str]]]:
    """Parse the word/TAG sample: list of sentences of (word, tag)."""
    sentences: list[list[tuple[str, str]]] = []
    with open(path or _SAMPLE_PATH, encoding="utf-8") as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            sent = []
            for item in line.split():
                word, _, tag = item.rpartition("/")
                if not word or not tag:
                    raise ValueError(f"malformed token {item!r} in sample")
                sent.append((word.lower(), tag))
            sentences.append(sent)
    return sentences


def train_lexicon(
    sentences: list[list[tuple[str, str]]], min_count: int = 1
) -> dict[str, str]:
    """word -> majority tag; deterministic tie-break (smallest tag)."""
    counts: dict[str, Counter] = defaultdict(Counter)
    for sent in sentences:
        for word, tag in sent:
            counts[word][tag] += 1
    lexicon: dict[str, str] = {}
    for word, tags in counts.items():
        if sum(tags.values()) < min_count:
            continue
        top = max(tags.values())
        lexicon[word] = min(t for t, c in tags.items() if c == top)
    return lexicon


def suffix_stats(
    sentences: list[list[tuple[str, str]]],
    suffixes: list[str],
    hapax_only: bool = True,
) -> dict[str, tuple[str, int, float]]:
    """suffix -> (majority_tag, n, purity), measured on hapax words (the
    proxy for the OOV words suffix rules fire on). Respects the tagger's
    applicability guard: a suffix only counts when len(word) > len(sfx)+2."""
    word_freq: Counter = Counter()
    for sent in sentences:
        for word, _ in sent:
            word_freq[word] += 1
    per_sfx: dict[str, Counter] = {s: Counter() for s in suffixes}
    for sent in sentences:
        for word, tag in sent:
            if hapax_only and word_freq[word] != 1:
                continue
            for sfx in suffixes:
                if word.endswith(sfx) and len(word) > len(sfx) + 2:
                    per_sfx[sfx][tag] += 1
    out: dict[str, tuple[str, int, float]] = {}
    for sfx, tags in per_sfx.items():
        n = sum(tags.values())
        if n == 0:
            continue
        top = max(tags.values())
        best = min(t for t, c in tags.items() if c == top)
        out[sfx] = (best, n, top / n)
    return out


def train_suffix_rules(
    sentences: list[list[tuple[str, str]]],
    defaults: list[tuple[str, str]],
    min_count: int = 3,
    min_purity: float = 0.7,
) -> list[tuple[str, str]]:
    """Emit rules in LONGEST-SUFFIX-FIRST precedence (most specific wins;
    stable within a length by defaults order — round 6: list order alone
    let "s" shadow -ous/-less/-us forever); replace a rule's TAG with the
    sample majority only on strong hapax evidence."""
    stats = suffix_stats(sentences, [s for s, _ in defaults])
    rules: list[tuple[str, str]] = []
    for sfx, default_tag in defaults:
        got = stats.get(sfx)
        if got is not None and got[1] >= min_count and got[2] >= min_purity:
            rules.append((sfx, got[0]))
        else:
            rules.append((sfx, default_tag))
    return sorted(rules, key=lambda r: -len(r[0]))
