"""Native fastText model reader (ml/fasttext_io.py): format round-trips,
the FNV-1a signed-char hash, subword extraction, word/sentence vectors,
supervised predict, and the Spark integration paths.

Reference behaviour: modules/nlp/app/tuktu/nlp/models/FastText.scala
(getWordVector / getSentenceVector / predict over a loaded model).
"""

from __future__ import annotations

import numpy as np
import pytest

from tuktu_spark.ml.fasttext_io import (
    BOW,
    EOW,
    FastTextArgs,
    FastTextModel,
    compute_subwords,
    ft_hash,
    read_bin,
    read_vec,
    write_bin,
    write_vec,
)


def _fnv1a_unsigned(data: bytes) -> int:
    """Independent plain FNV-1a 32 (no sign extension) for contrast."""
    h = 2166136261
    for b in data:
        h = ((h ^ b) * 16777619) & 0xFFFFFFFF
    return h


class TestHash:
    def test_ascii_equals_plain_fnv1a(self):
        for s in [b"a", b"the", b"<wh", b"ere>", b"hello"]:
            assert ft_hash(s) == _fnv1a_unsigned(s)

    def test_high_bytes_sign_extend(self):
        # uint32_t(int8_t(0xC3)) = 0xFFFFFFC3: xor flips the TOP bits too,
        # so the result diverges from the unsigned fold
        s = "é".encode("utf-8")  # b'\xc3\xa9'
        assert ft_hash(s) != _fnv1a_unsigned(s)
        # independent arithmetic for the first step
        h = 2166136261 ^ 0xFFFFFFC3
        h = (h * 16777619) & 0xFFFFFFFF
        h = h ^ 0xFFFFFFA9
        h = (h * 16777619) & 0xFFFFFFFF
        assert ft_hash(s) == h

    def test_str_and_bytes_agree(self):
        assert ft_hash("naïve") == ft_hash("naïve".encode("utf-8"))


class TestSubwords:
    def test_grams_of_where(self):
        # independent enumeration by string slicing (ASCII: chars == bytes)
        w = "<where>"
        want = []
        for i in range(len(w)):  # i-then-n order, as fastText emits them
            for n in range(3, 7):
                if i + n <= len(w):
                    want.append(w[i : i + n])
        got_hashes = compute_subwords(w, 3, 6, 2_000_000)
        assert got_hashes == [ft_hash(g) % 2_000_000 for g in want]

    def test_single_char_boundary_grams_excluded(self):
        # minn=1: the lone "<" (i==0) and ">" (j==size) 1-grams are skipped
        w = "<ab>"
        got = compute_subwords(w, 1, 2, 1000)
        want = ["<a", "a", "ab", "b", "b>"]
        assert got == [ft_hash(g) % 1000 for g in want]

    def test_utf8_chars_grouped(self):
        # 'é' is one CHARACTER (two bytes); a 2-gram of "né" hashes the
        # three bytes b'n\xc3\xa9'
        got = compute_subwords("né", 2, 2, 10_000)
        assert got == [ft_hash("né".encode()) % 10_000]

    def test_maxn_zero_no_subwords(self):
        assert compute_subwords("<abc>", 0, 0, 1000) == []
        assert compute_subwords("<abc>", 3, 2, 1000) == []


def _mini_model(bucket: int = 100, minn: int = 3, maxn: int = 4) -> FastTextModel:
    words = ["alpha", "beta", "gamma"]
    rng_rows = np.array(
        [[((i * 7 + j * 3) % 11 - 5) / 8.0 for j in range(6)] for i in range(3 + bucket)],
        dtype=np.float32,
    )
    args = FastTextArgs(dim=6, bucket=bucket, minn=minn, maxn=maxn)
    return FastTextModel(args=args, words=words, vectors=rng_rows, counts=[5, 3, 2])


class TestVectors:
    def test_in_vocab_word_vector_is_mean_of_word_row_and_grams(self):
        m = _mini_model()
        ids = m.subword_ids("beta")
        assert ids[0] == 1  # vocab row first
        grams = compute_subwords(BOW + "beta" + EOW, 3, 4, 100)
        assert ids[1:] == [3 + b for b in grams]
        want = m.vectors[ids].sum(axis=0) / len(ids)
        np.testing.assert_allclose(m.word_vector("beta"), want, rtol=1e-6)

    def test_oov_uses_only_grams(self):
        m = _mini_model()
        ids = m.subword_ids("delta")
        grams = compute_subwords(BOW + "delta" + EOW, 3, 4, 100)
        assert ids == [3 + b for b in grams]

    def test_sentence_vector_normalized_mean(self):
        m = _mini_model()
        sv = m.sentence_vector(["alpha", "beta"])
        va = m.word_vector("alpha").astype(np.float64)
        vb = m.word_vector("beta").astype(np.float64)
        va /= np.linalg.norm(va)
        vb /= np.linalg.norm(vb)
        np.testing.assert_allclose(sv, (va + vb) / 2, rtol=1e-6)

    def test_vec_model_oov_is_zero(self):
        args = FastTextArgs(dim=3, bucket=0, minn=0, maxn=0)
        m = FastTextModel(
            args=args, words=["x"], vectors=np.ones((1, 3), dtype=np.float32)
        )
        assert m.subword_ids("y") == []
        assert not m.word_vector("y").any()


class TestRoundTrips:
    def test_vec_roundtrip(self, tmp_path):
        p = str(tmp_path / "m.vec")
        words = ["a", "b"]
        mat = np.array([[0.5, -0.25], [1.0, 0.125]], dtype=np.float32)
        write_vec(p, words, mat)
        m = read_vec(p)
        assert m.words == words
        np.testing.assert_array_equal(m.vectors, mat)
        assert m.args.dim == 2

    def test_bin_roundtrip(self, tmp_path):
        p = str(tmp_path / "m.bin")
        src = _mini_model(bucket=16)
        write_bin(p, src)
        m = read_bin(p)
        assert m.words == src.words
        assert m.counts[:3] == [5, 3, 2]
        assert (m.args.dim, m.args.bucket, m.args.minn, m.args.maxn) == (6, 16, 3, 4)
        np.testing.assert_array_equal(m.vectors, src.vectors)
        # vectors identical => word vectors identical, incl. OOV subwords
        np.testing.assert_array_equal(m.word_vector("delta"), src.word_vector("delta"))

    def test_bin_rejects_bad_magic(self, tmp_path):
        p = tmp_path / "bad.bin"
        p.write_bytes(b"\x00" * 64)
        with pytest.raises(ValueError, match="magic"):
            read_bin(str(p))

    def test_quantized_seam(self, tmp_path):
        # hand-build a header with quant_input=1
        import struct

        from tuktu_spark.ml.fasttext_io import _ARGS_FIELDS, FASTTEXT_MAGIC

        buf = struct.pack("<ii", FASTTEXT_MAGIC, 12)
        a = FastTextArgs()
        for name, fmt in _ARGS_FIELDS:
            buf += struct.pack("<" + fmt, getattr(a, name))
        buf += struct.pack("<iii", 1, 1, 0) + struct.pack("<qq", 1, -1)
        buf += b"w\x00" + struct.pack("<q", 1) + struct.pack("<b", 0)
        buf += struct.pack("<b", 1)  # quant_input = TRUE
        p = tmp_path / "q.ftz"
        p.write_bytes(buf)
        with pytest.raises(NotImplementedError, match="quantized"):
            read_bin(str(p))


class TestPredict:
    def _sup_model(self, word_ngrams: int = 1) -> FastTextModel:
        words = ["good", "bad", "meh", "</s>"]
        labels = ["__label__pos", "__label__neg"]
        vecs = np.array(
            [[1.0, 0.0], [0.0, 1.0], [0.5, 0.5], [0.0, 0.0]]
            + [[0.1 * i, 0.05 * i] for i in range(8)],
            dtype=np.float32,
        )
        out = np.array([[2.0, -1.0], [-1.0, 2.0]], dtype=np.float32)
        args = FastTextArgs(
            dim=2, bucket=8, minn=0, maxn=0, model=3, loss=3, word_ngrams=word_ngrams
        )
        return FastTextModel(
            args=args, words=words, vectors=vecs, labels=labels, output=out
        )

    def test_softmax_predict(self):
        m = self._sup_model()
        # hidden = mean rows of [good(0), </s>(3)] = [0.5, 0.0]
        # scores = out @ h = [1.0, -0.5] -> softmax argmax = pos
        lab, prob = m.predict(["good"], k=1)[0]
        assert lab == "__label__pos"
        want = np.exp(1.0) / (np.exp(1.0) + np.exp(-0.5))
        assert prob == pytest.approx(want, rel=1e-9)

    def test_word_ngrams_change_features(self):
        m1, m2 = self._sup_model(1), self._sup_model(2)
        f1 = m1.line_feature_ids(["good", "bad"])
        f2 = m2.line_feature_ids(["good", "bad"])
        assert len(f2) == len(f1) + 2  # (good,bad) and (bad,</s>) bigrams
        assert all(i >= 4 for i in f2[len(f1):])  # bucket rows

    def test_oov_hash_still_feeds_ngrams(self):
        m = self._sup_model(2)
        # "zzz" is OOV: contributes no word row but its hash chains into
        # the (zzz, </s>) bigram bucket
        feats = m.predict(["zzz"], k=1)
        assert feats  # non-empty: the bigram bucket row exists

    def test_unsupervised_model_refuses(self):
        m = _mini_model()
        with pytest.raises(ValueError, match="supervised"):
            m.predict(["alpha"])

    def test_roundtrip_preserves_predict(self, tmp_path):
        p = str(tmp_path / "sup.bin")
        src = self._sup_model(2)
        write_bin(p, src)
        m = read_bin(p)
        assert m.labels == src.labels
        for toks in (["good"], ["bad", "meh"], ["zzz", "good"]):
            assert m.predict(toks, k=2) == src.predict(toks, k=2)


class TestSpark:
    def test_read_vec_spark_matches_driver(self, spark, tmp_path):
        p = str(tmp_path / "m.vec")
        words = ["aa", "bb", "cc"]
        mat = np.array(
            [[0.5, -0.25, 1.5], [2.0, 0.125, -8.0], [0.0, 3.0, 0.75]],
            dtype=np.float32,
        )
        write_vec(p, words, mat)
        from tuktu_spark.ml.fasttext_io import read_vec_spark

        rows = {r["word"]: r["vector"] for r in read_vec_spark(spark, p).collect()}
        assert set(rows) == set(words)
        for w, want in zip(words, mat):
            np.testing.assert_array_equal(np.array(rows[w], dtype=np.float32), want)

    def test_ft_doc_vectors_matches_reference(self, spark, tmp_path):
        m = _mini_model(bucket=32)
        from tuktu_spark.ml.fasttext import ft_doc_vectors

        docs = [
            (1, ["alpha", "beta"]),
            (2, ["delta", "unknown", "gamma"]),
            (3, []),
            (4, None),
        ]
        df = spark.createDataFrame(docs, "doc_id long, tokens array<string>")
        got = {r["doc_id"]: r["embedding"] for r in ft_doc_vectors(df, m).collect()}
        for did, toks in docs:
            want = m.sentence_vector(list(toks) if toks else [])
            np.testing.assert_allclose(
                np.array(got[did], dtype=np.float32), want, rtol=1e-6
            )

    def test_ft_predict_spark(self, spark):
        m = TestPredict()._sup_model(2)
        from tuktu_spark.ml.fasttext import ft_predict

        df = spark.createDataFrame(
            [(1, ["good"]), (2, ["bad"])], "doc_id long, tokens array<string>"
        )
        got = {(r["doc_id"], r["label"]): r["prob"] for r in ft_predict(df, m).collect()}
        assert got[(1, m.predict(["good"])[0][0])] == pytest.approx(
            m.predict(["good"])[0][1]
        )
        assert got[(2, m.predict(["bad"])[0][0])] == pytest.approx(
            m.predict(["bad"])[0][1]
        )

    def test_operator_registry(self, spark, tmp_path):
        import os

        from tuktu_spark.ml.fasttext_io import write_vec
        from tuktu_spark.operators.registry import make_operator

        p = str(tmp_path / "m.vec")
        write_vec(p, ["tok"], np.array([[1.0, 0.0]], dtype=np.float32))
        df = spark.createDataFrame([(1, ["tok"])], "doc_id long, tokens array<string>")
        out = make_operator("fasttext_vectors", {"model_path": p})(df).collect()
        assert len(out) == 1 and abs(out[0]["embedding"][0] - 1.0) < 1e-6
        assert os.path.exists(p)


class TestReferenceSurface:
    """The rest of FastText.scala's wrapper API: nearest words and the
    word-overlap classifier (simpleWordOverlapClassifier:82-97)."""

    def _model(self):
        # orthogonal-ish vocab: a/b similar, c distinct
        words = ["aa", "ab", "cc", "dd"]
        mat = np.array(
            [[1.0, 0.1, 0.0], [0.9, 0.2, 0.0], [0.0, 0.0, 1.0], [0.1, 1.0, 0.0]],
            dtype=np.float32,
        )
        args = FastTextArgs(dim=3, bucket=0, minn=0, maxn=0)
        return FastTextModel(args=args, words=words, vectors=mat)

    def test_similar_words(self, spark):
        from tuktu_spark.ml.fasttext import ft_similar_words

        out = ft_similar_words(spark, self._model(), ["aa"], k=2).collect()
        assert [r["word"] for r in sorted(out, key=lambda r: r["rank"])] == [
            "ab", "dd",
        ]
        assert all(r["word"] != "aa" for r in out)

    def test_word_overlap_classify_matches_reference_semantics(self, spark):
        import numpy as np

        from tuktu_spark.ml.fasttext import ft_word_overlap_classify

        m = self._model()
        classes = {"x": ["aa", "ab"], "y": ["cc"]}
        df = spark.createDataFrame(
            [(1, ["aa"]), (2, ["cc", "zz"]), (3, ["zz"])],
            "doc_id long, tokens array<string>",
        )
        got = {
            (r["doc_id"], r["label"]): r["score"]
            for r in ft_word_overlap_classify(df, m, classes, cutoff=0.5).collect()
        }

        def cos(a, b):
            a, b = np.asarray(a, float), np.asarray(b, float)
            return float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))

        # doc 1 vs class x: pairs (aa,aa)=1.0 and (aa,ab); both >= 0.5
        want = (1.0 + cos(m.word_vector("aa"), m.word_vector("ab"))) / 2
        assert got[(1, "x")] == pytest.approx(want, rel=1e-6)
        assert got[(1, "y")] == 0.0  # aa.cc cosine 0 < cutoff
        assert got[(2, "y")] == pytest.approx(1.0, rel=1e-6)  # cc self-match
        assert got[(3, "x")] == 0.0 and got[(3, "y")] == 0.0  # OOV-only doc

    def test_overlap_operator(self, spark, tmp_path):
        from tuktu_spark.ml.fasttext_io import write_vec
        from tuktu_spark.operators.registry import make_operator

        m = self._model()
        p = str(tmp_path / "m.vec")
        write_vec(p, m.words, m.vectors)
        df = spark.createDataFrame([(1, ["aa"])], "doc_id long, tokens array<string>")
        out = make_operator(
            "fasttext_word_overlap_classify",
            {"model_path": p, "classes": {"x": ["aa"], "y": ["cc"]}, "cutoff": 0.5},
        )(df).collect()
        scores = {r["label"]: r["score"] for r in out}
        assert scores["x"] == pytest.approx(1.0) and scores["y"] == 0.0

    def test_similar_words_operator(self, spark, tmp_path):
        from tuktu_spark.ml.fasttext_io import write_vec
        from tuktu_spark.operators.registry import make_operator

        m = self._model()
        p = str(tmp_path / "m.vec")
        write_vec(p, m.words, m.vectors)
        df = spark.range(1)
        out = make_operator(
            "fasttext_similar_words", {"model_path": p, "probes": ["aa"], "k": 1}
        )(df).collect()
        assert len(out) == 1 and out[0]["word"] == "ab"
