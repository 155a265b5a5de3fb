"""Porter2 (Snowball english) stemmer — algorithm-level verification.

Vectors are hand-derived from the published algorithm
(https://snowballstem.org/algorithms/english/stemmer.html), each labelled
with the step it exercises; several are the spec's own worked examples
(ties->tie, cry->cri, by->by, say->say). This is the independent evidence
for ml/porter2.py; the nlp_stem query then verifies the distributed
pandas-UDF plumbing against a DuckDB oracle generated from the same
implementation.
"""

import pytest
from pyspark.sql import functions as F

from tuktu_spark.ml.porter2 import (
    porter2_stem,
    stem_token_array,
    stem_words,
)

# (word, expected_stem, note)
VECTORS = [
    # --- exceptional forms (spec table) ---
    ("skis", "ski", "exception"),
    ("skies", "sky", "exception"),
    ("dying", "die", "exception"),
    ("lying", "lie", "exception"),
    ("tying", "tie", "exception"),
    ("idly", "idl", "exception"),
    ("gently", "gentl", "exception"),
    ("ugly", "ugli", "exception"),
    ("early", "earli", "exception"),
    ("only", "onli", "exception"),
    ("singly", "singl", "exception"),
    ("sky", "sky", "invariant"),
    ("news", "news", "invariant"),
    ("atlas", "atlas", "invariant"),
    ("cosmos", "cosmos", "invariant"),
    ("bias", "bias", "invariant"),
    ("andes", "andes", "invariant"),
    # --- post-1a invariants ---
    ("inning", "inning", "1a-exception"),
    ("outing", "outing", "1a-exception"),
    ("canning", "canning", "1a-exception"),
    ("herring", "herring", "1a-exception"),
    ("earring", "earring", "1a-exception"),
    ("proceed", "proceed", "1a-exception"),
    ("exceed", "exceed", "1a-exception"),
    ("succeed", "succeed", "1a-exception"),
    # --- step 0 (apostrophes) ---
    ("consign's", "consign", "step0"),
    ("dog's", "dog", "step0"),
    # --- step 1a ---
    ("caresses", "caress", "sses->ss"),
    ("ponies", "poni", "ies->i (long)"),
    ("ties", "tie", "ies->ie (short, spec example)"),
    ("dies", "die", "ies->ie (short)"),
    ("caress", "caress", "ss kept"),
    ("cats", "cat", "s deleted"),
    ("gaps", "gap", "s deleted"),
    ("kiwis", "kiwi", "s deleted"),
    ("gas", "gas", "no vowel before penultimate"),
    ("this", "this", "no vowel before penultimate"),
    # --- step 1b ---
    ("feed", "feed", "eed not in R1"),
    ("agreed", "agre", "eed->ee in R1, then step5 e-drop"),
    ("plastered", "plaster", "ed deleted"),
    ("bled", "bled", "stem has no vowel"),
    ("motoring", "motor", "ing deleted"),
    ("sing", "sing", "stem has no vowel"),
    ("conflated", "conflat", "at->ate repair, step5 e-drop"),
    ("troubled", "troubl", "bl->ble repair, step5 e-drop"),
    ("sized", "size", "iz->ize repair, e kept (short)"),
    ("hopping", "hop", "double pp undoubled"),
    ("tanned", "tan", "double nn undoubled"),
    ("falling", "fall", "ll is NOT a double"),
    ("hissing", "hiss", "ss is NOT a double"),
    ("failing", "fail", "not short (ai)"),
    ("filing", "file", "short word gets e"),
    ("hoping", "hope", "short word gets e"),
    # --- step 1c (spec examples) ---
    ("cry", "cri", "y->i"),
    ("by", "by", "two letters, untouched"),
    ("say", "say", "vowel before y"),
    ("enjoy", "enjoy", "vowel before y"),
    ("happy", "happi", "y->i"),
    ("beauty", "beauti", "y->i"),
    # --- step 2 ---
    ("relational", "relat", "ational->ate, then step4/5"),
    ("conditional", "condit", "tional->tion, then ion-deletion"),
    ("valenci", "valenc", "enci->ence, step5 e-drop"),
    ("digitizer", "digit", "izer->ize, then step4 ize"),
    ("vietnamization", "vietnam", "ization->ize, then step4 ize"),
    ("happily", "happili", "li NOT preceded by valid li-ending (p)"),
    ("yearly", "year", "li preceded by r (valid)"),
    ("generously", "generous", "ousli->ous with gener R1-prefix"),
    # --- step 3 ---
    ("hopefulness", "hope", "fulness->ful, ful deleted, e kept"),
    ("goodness", "good", "ness deleted"),
    ("electrical", "electr", "ical->ic, then step4 ic"),
    ("hopeful", "hope", "ful deleted, e kept (short syllable)"),
    ("operational", "oper", "ational->ate, step4 ate"),
    # --- step 4 (R2 deletions) ---
    ("revival", "reviv", "al in R2"),
    ("allowance", "allow", "ance in R2"),
    ("inference", "infer", "ence in R2"),
    ("airliner", "airlin", "er in R2"),
    ("adoption", "adopt", "ion preceded by t"),
    ("region", "region", "ion NOT in R2"),
    ("abatements", "abat", "ement in R2"),
    ("rational", "ration", "step3 ational blocked (R1), step4 al fires"),
    ("abilities", "abil", "ies->i, iti in R2"),
    ("feudalism", "feudal", "alism->al, al NOT in R2"),
    ("communism", "communism", "ism NOT in R2 (commun R1-prefix)"),
    ("communication", "communic", "ation->ate, icate->ic, ic NOT in R2"),
    ("arsenic", "arsenic", "ic NOT in R2 (arsen R1-prefix)"),
    # --- step 5 ---
    ("probate", "probat", "e in R2"),
    ("cease", "ceas", "e in R1, not short-preceded"),
    ("controll", "control", "ll in R2 undoubled"),
    ("generate", "generat", "e in R2 with gener prefix"),
    ("generic", "generic", "ic not in R2"),
    ("generous", "generous", "ous not in R2"),
    # --- trivial ---
    ("a", "a", "<=2 letters untouched"),
    ("as", "as", "<=2 letters untouched"),
    ("be", "be", "<=2 letters untouched"),
]


@pytest.mark.parametrize("word,expected,note", VECTORS, ids=[v[0] for v in VECTORS])
def test_porter2_vector(word, expected, note):
    assert porter2_stem(word) == expected, note


def test_porter2_uppercase_folds():
    assert porter2_stem("Hopping") == "hop"
    assert porter2_stem("NEWS") == "news"


class TestSparkWrappers:
    def test_stem_words_matches_python(self, spark):
        words = [v[0] for v in VECTORS]
        df = spark.createDataFrame([(w,) for w in words], "w string")
        got = {
            r["w"]: r["s"]
            for r in df.select("w", stem_words(F.col("w")).alias("s")).collect()
        }
        assert got == {w: porter2_stem(w) for w in words}

    def test_stem_words_null_safe(self, spark):
        df = spark.createDataFrame([(None,), ("running",)], "w string")
        got = [r["s"] for r in df.select(stem_words(F.col("w")).alias("s")).collect()]
        assert set(got) == {None, "run"}

    def test_stem_token_array(self, spark):
        df = spark.createDataFrame(
            [(["hopping", "ties", None],), (None,)],
            "t array<string>",
        )
        got = [
            r["s"] for r in df.select(stem_token_array(F.col("t")).alias("s")).collect()
        ]
        assert sorted(got, key=lambda x: (x is None, x)) == [
            ["hop", "tie", None],
            None,
        ]

    def test_stem_operator_registered(self, spark):
        from tuktu_spark.operators.registry import make_operator

        df = spark.createDataFrame([("hopping ties",)], "text string")
        toks = df.select(F.split("text", " ").alias("tokens"))
        out = make_operator("stem", {"field": "tokens"})(toks)
        assert out.first()["tokens"] == ["hop", "tie"]
        out2 = make_operator("stem", {"field": "tokens", "algorithm": "light"})(toks)
        assert out2.first()["tokens"] is not None
