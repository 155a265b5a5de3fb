"""Porter2 (Snowball "english") stemmer — faithful implementation of the
public algorithm (https://snowballstem.org/algorithms/english/stemmer.html).

Reference capability: modules/nlp/app/tuktu/nlp/processors/Snowball.scala
(wraps the Tartarus Snowball JNI library). The container has no snowball
lib, so this is a from-spec pure-Python implementation, exposed to Spark as
an Arrow-batched pandas UDF (``stem_porter2``) — the per-word function is
branchy string logic that column algebra cannot express without a
thousand-line CASE tower, so this is the sanctioned Pandas-UDF seam.

The algorithm operates on fixed R1/R2 region POSITIONS computed once per
word (after y-marking), then applies suffix steps 0,1a,1b,1c,2,3,4,5 in
order. Exceptional forms and the post-1a invariants follow the spec table.
"""

from __future__ import annotations

VOWELS = set("aeiouy")
DOUBLES = ("bb", "dd", "ff", "gg", "mm", "nn", "pp", "rr", "tt")
LI_ENDINGS = set("cdeghkmnrt")

# Spec: exceptional forms mapped directly (stemmed immediately).
_EXCEPTIONS = {
    "skis": "ski",
    "skies": "sky",
    "dying": "die",
    "lying": "lie",
    "tying": "tie",
    "idly": "idl",
    "gently": "gentl",
    "ugly": "ugli",
    "early": "earli",
    "only": "onli",
    "singly": "singl",
    # invariant forms
    "sky": "sky",
    "news": "news",
    "howe": "howe",
    "atlas": "atlas",
    "cosmos": "cosmos",
    "bias": "bias",
    "andes": "andes",
}

# Spec: invariant after step 1a.
_EXCEPTIONS_1A = {
    "inning", "outing", "canning", "herring", "earring",
    "proceed", "exceed", "succeed",
}

_SPECIAL_R1_PREFIXES = ("gener", "commun", "arsen")

_STEP2 = (
    # (suffix, replacement) — longest match wins, applied only if suffix
    # lies entirely in R1. Ordered longest-first so a linear scan is a
    # longest-match scan. 'ogi' and 'li' carry extra conditions (below).
    ("ization", "ize"),
    ("ational", "ate"),
    ("fulness", "ful"),
    ("ousness", "ous"),
    ("iveness", "ive"),
    ("tional", "tion"),
    ("biliti", "ble"),
    ("lessli", "less"),
    ("entli", "ent"),
    ("ation", "ate"),
    ("alism", "al"),
    ("aliti", "al"),
    ("ousli", "ous"),
    ("iviti", "ive"),
    ("fulli", "ful"),
    ("enci", "ence"),
    ("anci", "ance"),
    ("abli", "able"),
    ("izer", "ize"),
    ("ator", "ate"),
    ("alli", "al"),
    ("bli", "ble"),
    ("ogi", "og"),   # only if preceded by l
    ("li", ""),      # only if preceded by a valid li-ending
)

_STEP3 = (
    ("ational", "ate"),
    ("tional", "tion"),
    ("alize", "al"),
    ("icate", "ic"),
    ("iciti", "ic"),
    ("ative", ""),   # only if in R2
    ("ical", "ic"),
    ("ness", ""),
    ("ful", ""),
)

_STEP4 = (
    "ement", "ance", "ence", "able", "ible", "ment",
    "ant", "ent", "ism", "ate", "iti", "ous", "ive", "ize",
    "ion",  # only if preceded by s or t
    "al", "er", "ic",
)


def _is_vowel(word: str, i: int) -> bool:
    return word[i] in VOWELS


def _compute_r1(word: str) -> int:
    for prefix in _SPECIAL_R1_PREFIXES:
        if word.startswith(prefix):
            return len(prefix)
    for i in range(1, len(word)):
        if not _is_vowel(word, i) and _is_vowel(word, i - 1):
            return i + 1
    return len(word)


def _compute_r2(word: str, r1: int) -> int:
    for i in range(r1 + 1, len(word)):
        if not _is_vowel(word, i) and _is_vowel(word, i - 1):
            return i + 1
    return len(word)


def _ends_short_syllable(word: str) -> bool:
    """Short syllable: vowel + non-vowel(not w/x/Y) preceded by non-vowel,
    at end of word; or vowel at word start followed by a non-vowel."""
    n = len(word)
    if n == 2:
        return word[0] in VOWELS and word[1] not in VOWELS
    if n >= 3:
        a, b, c = word[-3], word[-2], word[-1]
        return (
            a not in VOWELS
            and b in VOWELS and b != "Y"
            and c not in VOWELS and c not in "wxY"
        )
    return False


def _is_short(word: str, r1: int) -> bool:
    return r1 >= len(word) and _ends_short_syllable(word)


def _has_vowel(segment: str) -> bool:
    # marked 'Y' is a consonant; lowercase 'y' counts as a vowel
    return any(ch in VOWELS for ch in segment)


def porter2_stem(word: str) -> str:
    """Stem one lowercase word per the Porter2 (english) algorithm."""
    word = word.lower()
    if len(word) <= 2:
        return word
    if word.startswith("'"):
        word = word[1:]
    if word in _EXCEPTIONS:
        return _EXCEPTIONS[word]

    # Mark consonant-y: initial y, or y after a vowel, becomes Y.
    if word.startswith("y"):
        word = "Y" + word[1:]
    chars = list(word)
    for i in range(1, len(chars)):
        if chars[i] == "y" and chars[i - 1] in VOWELS:
            chars[i] = "Y"
    word = "".join(chars)

    r1 = _compute_r1(word)
    r2 = _compute_r2(word, r1)

    def in_r1(suffix: str) -> bool:
        return len(word) - len(suffix) >= r1

    def in_r2(suffix: str) -> bool:
        return len(word) - len(suffix) >= r2

    # Step 0: longest of ' 's 's'
    for suf in ("'s'", "'s", "'"):
        if word.endswith(suf):
            word = word[: -len(suf)]
            break

    # Step 1a
    if word.endswith("sses"):
        word = word[:-2]
    elif word.endswith(("ied", "ies")):
        word = word[:-2] if len(word) > 4 else word[:-1]
    elif word.endswith(("us", "ss")):
        pass
    elif word.endswith("s"):
        # delete if the preceding word part contains a vowel not
        # immediately before the s
        if _has_vowel(word[:-2]):
            word = word[:-1]

    if word in _EXCEPTIONS_1A:
        return word

    # Step 1b
    if word.endswith(("eedly", "eed")):
        suf = "eedly" if word.endswith("eedly") else "eed"
        if in_r1(suf):
            word = word[: -len(suf)] + "ee"
    else:
        for suf in ("ingly", "edly", "ing", "ed"):
            if word.endswith(suf):
                stem = word[: -len(suf)]
                if _has_vowel(stem):
                    word = stem
                    if word.endswith(("at", "bl", "iz")):
                        word += "e"
                    elif word.endswith(DOUBLES):
                        word = word[:-1]
                    elif _is_short(word, r1):
                        word += "e"
                break

    # Step 1c: y/Y -> i if preceded by a non-vowel which is not the first
    # letter of the word
    if (
        len(word) > 2
        and word[-1] in "yY"
        and word[-2] not in VOWELS
    ):
        word = word[:-1] + "i"

    # Step 2 (suffix must lie in R1)
    for suf, rep in _STEP2:
        if word.endswith(suf):
            if in_r1(suf):
                if suf == "ogi":
                    if word.endswith("logi"):
                        word = word[:-1]
                elif suf == "li":
                    if len(word) > 2 and word[-3] in LI_ENDINGS:
                        word = word[:-2]
                else:
                    word = word[: -len(suf)] + rep
            break

    # Step 3 (suffix must lie in R1; 'ative' additionally in R2)
    for suf, rep in _STEP3:
        if word.endswith(suf):
            if in_r1(suf):
                if suf == "ative":
                    if in_r2(suf):
                        word = word[: -len(suf)]
                else:
                    word = word[: -len(suf)] + rep
            break

    # Step 4 (suffix must lie in R2)
    for suf in _STEP4:
        if word.endswith(suf):
            if in_r2(suf):
                if suf == "ion":
                    if len(word) > 3 and word[-4] in "st":
                        word = word[:-3]
                else:
                    word = word[: -len(suf)]
            break

    # Step 5
    if word.endswith("e"):
        if in_r2("e") or (
            in_r1("e") and not _ends_short_syllable(word[:-1])
        ):
            word = word[:-1]
    elif word.endswith("l"):
        if in_r2("l") and len(word) > 1 and word[-2] == "l":
            word = word[:-1]

    return word.replace("Y", "y")


def stem_words(col):
    """Column wrapper: Arrow-batched pandas UDF applying porter2_stem to a
    string column. Null-safe; non-string inputs pass through unchanged."""
    import pandas as pd  # noqa: F401 — resolves the UDF's type hints
    from pyspark.sql.functions import pandas_udf

    # Explicit __annotations__ (not inline hints): `from __future__ import
    # annotations` would stringify them against globals where pd is absent.
    def _stem(s):
        return s.map(lambda w: porter2_stem(w) if isinstance(w, str) else w)

    _stem.__annotations__ = {"s": pd.Series, "return": pd.Series}
    return pandas_udf("string")(_stem)(col)


def stem_token_array(col):
    """Arrow-batched pandas UDF stemming every element of an
    array<string> column (one Python call per batch, not per row)."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    def _stem_arr(s):
        return s.map(
            lambda arr: None
            if arr is None
            else [porter2_stem(w) if isinstance(w, str) else w for w in arr]
        )

    _stem_arr.__annotations__ = {"s": pd.Series, "return": pd.Series}
    return pandas_udf("array<string>")(_stem_arr)(col)
