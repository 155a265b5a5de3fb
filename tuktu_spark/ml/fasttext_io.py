"""Native fastText model readers — no third-party lib required.

Reference surface: modules/nlp/app/tuktu/nlp/models/FastText.scala and
FastTextProcessor.scala load a TRAINED fastText model binary and compute
word / sentence vectors from it. Round 5 left that seam as "install the
fasttext lib"; this module closes it by reading the two PUBLIC fastText
model formats directly (format from the published fastText paper/repo
documentation — Bojanowski et al. 2017, Joulin et al. 2016):

- ``.vec`` — the text format: a ``"<nwords> <dim>"`` header line, then one
  ``word f1 .. fdim`` line per word. Word-level vectors only (no subword
  information), so OOV words get the zero vector.
- ``.bin`` — the binary format: int32 magic 793712314, int32 version,
  the Args block, the Dictionary block, then the dense input and output
  matrices (float32, row-major). The input matrix holds nwords + bucket
  rows: vocabulary rows first, then the hashed char-n-gram bucket rows
  that give fastText its OOV behaviour.

Everything here is exact-from-spec: the FNV-1a hash uses fastText's
signed-char quirk (``uint32_t(int8_t(byte))`` sign-extends before the
xor), subword extraction is character-grouped (UTF-8 continuation bytes
ride with their lead byte) and excludes the single-char "<" / ">"
boundary grams, in-vocab words contribute their own vocabulary row PLUS
their hashed n-grams, and sentence vectors average the L2-normalized
word vectors (words with zero norm are skipped) — the unsupervised
``getSentenceVector`` behaviour.

Quantized (.ftz) models are a documented NotImplementedError seam (the
product-quantizer codebook layout is supported by our own PQ module for
OUR indexes; re-reading fastText's .ftz adds little over .bin here).

Scale shape: a model is megabytes-to-gigabytes but BOUNDED (vocab +
2M buckets), so it broadcasts once per job; scoring is then a map-only
Arrow stage over the corpus — no shuffle at any corpus size. For models
too large to broadcast, ``read_vec_spark`` reads the .vec format as a
distributed DataFrame for join-based lookup instead.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass, field

import numpy as np

FASTTEXT_MAGIC = 793712314
FASTTEXT_VERSION = 12

BOW, EOW, EOS = "<", ">", "</s>"


def ft_hash(s: str | bytes) -> int:
    """fastText's FNV-1a (Dictionary::hash): 32-bit, with each byte
    SIGN-EXTENDED through int8 before the xor — ASCII hashes like plain
    FNV-1a, bytes >= 0x80 diverge. Must match bit-for-bit or every
    subword lands in the wrong bucket row."""
    if isinstance(s, str):
        s = s.encode("utf-8")
    h = 2166136261
    for b in s:
        sb = b - 256 if b >= 128 else b  # int8_t
        h ^= sb & 0xFFFFFFFF  # uint32_t(int8_t) sign-extends
        h = (h * 16777619) & 0xFFFFFFFF
    return h


def _chars(word: str) -> list[bytes]:
    """UTF-8 bytes of each CHARACTER (continuation bytes grouped with
    their lead byte, as fastText's byte walk does)."""
    return [c.encode("utf-8") for c in word]


def compute_subwords(word: str, minn: int, maxn: int, bucket: int) -> list[int]:
    """Bucket ids (0-based within the bucket table) of the char n-grams of
    ``word`` (caller passes the BOW/EOW-marked form). Excludes 1-grams
    that are exactly the leading "<" or trailing ">" marker; includes the
    full marked word when its length fits [minn, maxn]."""
    if maxn < minn or bucket <= 0:
        return []
    cs = _chars(word)
    size = len(cs)
    out: list[int] = []
    for i in range(size):
        gram = b""
        j = i
        n = 1
        while j < size and n <= maxn:
            gram += cs[j]
            j += 1
            if n >= minn and not (n == 1 and (i == 0 or j == size)):
                out.append(ft_hash(gram) % bucket)
            n += 1
    return out


@dataclass
class FastTextArgs:
    dim: int = 100
    ws: int = 5
    epoch: int = 5
    min_count: int = 5
    neg: int = 5
    word_ngrams: int = 1
    loss: int = 2  # 1=hs, 2=ns, 3=softmax (enum order per format)
    model: int = 2  # 1=cbow, 2=skipgram, 3=supervised (enum order per format)
    bucket: int = 2_000_000
    minn: int = 3
    maxn: int = 6
    lr_update_rate: int = 100
    t: float = 1e-4


@dataclass
class FastTextModel:
    """A loaded fastText model: vocabulary + the input-matrix rows needed
    for word/sentence vectors. ``vectors`` has nwords + bucket rows for
    .bin models; for .vec models bucket == 0 and OOV words are zero."""

    args: FastTextArgs
    words: list[str]
    vectors: np.ndarray  # float32 (nwords + bucket, dim)
    counts: list[int] = field(default_factory=list)
    word_index: dict[str, int] = field(default_factory=dict)
    labels: list[str] = field(default_factory=list)
    output: np.ndarray | None = None  # float32 (nlabels | nwords, dim)

    def __post_init__(self):
        if not self.word_index:
            self.word_index = {w: i for i, w in enumerate(self.words)}

    @property
    def nwords(self) -> int:
        return len(self.words)

    @property
    def dim(self) -> int:
        return int(self.vectors.shape[1])

    def subword_ids(self, word: str) -> list[int]:
        """Input-matrix row ids for ``word`` (Dictionary::getSubwords):
        in-vocab → [word row] + hashed n-gram rows; OOV → n-gram rows
        only; EOS → its vocab row only."""
        wid = self.word_index.get(word, -1)
        if word == EOS:
            return [wid] if wid >= 0 else []
        grams = [
            self.nwords + b
            for b in compute_subwords(
                BOW + word + EOW, self.args.minn, self.args.maxn, self.args.bucket
            )
        ]
        # .vec models carry no bucket rows — clamp to vocab-only lookup
        if self.vectors.shape[0] <= self.nwords:
            grams = []
        return ([wid] if wid >= 0 else []) + grams

    def word_vector(self, word: str) -> np.ndarray:
        """Mean of the word's subword rows (getWordVector)."""
        ids = self.subword_ids(word)
        if not ids:
            return np.zeros(self.dim, dtype=np.float32)
        return self.vectors[ids].sum(axis=0, dtype=np.float64).astype(np.float32) / len(
            ids
        )

    def sentence_vector(
        self, tokens: list[str], normalize_words: bool = True
    ) -> np.ndarray:
        """Unsupervised getSentenceVector: average of L2-normalized word
        vectors, skipping zero-norm words. ``normalize_words=False``
        gives the supervised-style plain average."""
        acc = np.zeros(self.dim, dtype=np.float64)
        count = 0
        for w in tokens:
            if not self.subword_ids(w):
                continue  # OOV with no subwords: dropped by the dictionary
            v = self.word_vector(w).astype(np.float64)
            if normalize_words:
                nrm = float(np.sqrt((v * v).sum()))
                if nrm <= 0:
                    continue
                v = v / nrm
            acc += v
            count += 1
        if count > 0:
            acc /= count
        return acc.astype(np.float32)

    def line_feature_ids(self, tokens: list[str], add_eos: bool = True) -> list[int]:
        """Supervised feature ids for a line (Dictionary::getLine +
        addWordNgrams): in-vocab word rows, then word-ngram bucket rows
        hashed over ALL word tokens' FNV hashes (OOV included) with
        fastText's uint64 chain h = h * 116049371 + hash(w_j), where each
        int32-stored hash is sign-extended into the uint64 — the quirk
        must match or every bigram lands in the wrong bucket."""
        toks = list(tokens) + ([EOS] if add_eos else [])
        ids: list[int] = []
        hashes: list[int] = []
        for tok in toks:
            wid = self.word_index.get(tok, -1)
            if wid >= 0:
                ids.append(wid)
            hashes.append(ft_hash(tok))
        n = self.args.word_ngrams
        if n > 1 and self.args.bucket > 0:
            M = (1 << 64) - 1

            def sx(u32: int) -> int:  # int32 reinterpret, uint64 sign-extend
                return (u32 - (1 << 32) if u32 >= (1 << 31) else u32) & M

            for i in range(len(hashes)):
                h = sx(hashes[i])
                for j in range(i + 1, min(i + n, len(hashes))):
                    h = (h * 116049371 + sx(hashes[j])) & M
                    ids.append(self.nwords + (h % self.args.bucket))
        return ids

    def predict(
        self, tokens: list[str], k: int = 1, add_eos: bool = True
    ) -> list[tuple[str, float]]:
        """Top-k (label, probability) for a supervised model: hidden =
        mean of the line's feature rows, scores = output @ hidden through
        softmax (loss=softmax) or sigmoid (one-vs-all / ns). Hierarchical
        softmax is a documented seam (needs the Huffman tree)."""
        if not self.labels or self.output is None:
            raise ValueError("predict needs a supervised model (labels + output)")
        if self.args.loss == 1:  # hs
            raise NotImplementedError(
                "hierarchical-softmax prediction is not implemented by the "
                "native reader; export the model with loss=softmax"
            )
        feats = self.line_feature_ids(tokens, add_eos=add_eos)
        if not feats:
            return []
        hidden = self.vectors[feats].mean(axis=0, dtype=np.float64)
        scores = self.output.astype(np.float64) @ hidden
        if self.args.loss == 3:  # softmax
            scores = scores - scores.max()
            e = np.exp(scores)
            probs = e / e.sum()
        else:  # ns / ova: independent binary logistic per label
            probs = 1.0 / (1.0 + np.exp(-scores))
        order = np.argsort(-probs)[: int(k)]
        return [(self.labels[i], float(probs[i])) for i in order]


# ---------------------------------------------------------------------------
# .vec (text) format
# ---------------------------------------------------------------------------


def read_vec(path: str, max_words: int | None = None) -> FastTextModel:
    """Driver-side .vec reader. Word vectors only (no subword rows)."""
    words: list[str] = []
    rows: list[np.ndarray] = []
    with open(path, "r", encoding="utf-8") as f:
        header = f.readline().split()
        n, dim = int(header[0]), int(header[1])
        for line in f:
            parts = line.rstrip("\n").split(" ")
            if len(parts) < dim + 1:
                continue
            words.append(parts[0])
            rows.append(np.array(parts[1 : dim + 1], dtype=np.float32))
            if max_words is not None and len(words) >= max_words:
                break
    mat = np.vstack(rows) if rows else np.zeros((0, dim), dtype=np.float32)
    args = FastTextArgs(dim=dim, bucket=0, minn=0, maxn=0)
    return FastTextModel(args=args, words=words, vectors=mat)


def write_vec(path: str, words: list[str], vectors: np.ndarray) -> None:
    """.vec writer (model export + test fixtures)."""
    with open(path, "w", encoding="utf-8") as f:
        f.write(f"{len(words)} {vectors.shape[1]}\n")
        for w, row in zip(words, vectors):
            f.write(w + " " + " ".join(repr(float(x)) for x in row) + "\n")


def read_vec_spark(spark, path: str):
    """Distributed .vec reader → DataFrame (word, vector array<float>).

    For models too large to hold on the driver: each executor parses its
    own text split (the header line is dropped by arity, not position, so
    no driver read is needed), giving join-based embedding lookup instead
    of a broadcast model."""
    from pyspark.sql import functions as F

    lines = spark.read.text(path)
    parts = F.split(F.col("value"), " ")
    return (
        lines.select(parts.alias("p"))
        .filter(F.size("p") >= 3)  # header is "n dim" (2 fields)
        .select(
            F.element_at("p", 1).alias("word"),
            F.expr("transform(slice(p, 2, size(p) - 1), x -> cast(x as float))").alias(
                "vector"
            ),
        )
    )


# ---------------------------------------------------------------------------
# .bin (binary) format
# ---------------------------------------------------------------------------

_ARGS_FIELDS = [
    ("dim", "i"),
    ("ws", "i"),
    ("epoch", "i"),
    ("min_count", "i"),
    ("neg", "i"),
    ("word_ngrams", "i"),
    ("loss", "i"),
    ("model", "i"),
    ("bucket", "i"),
    ("minn", "i"),
    ("maxn", "i"),
    ("lr_update_rate", "i"),
    ("t", "d"),
]


def read_bin(path: str) -> FastTextModel:
    """Native .bin reader (FastText::loadModel layout). Rejects quantized
    (.ftz) models with a documented seam error."""
    with open(path, "rb") as f:
        magic, version = struct.unpack("<ii", f.read(8))
        if magic != FASTTEXT_MAGIC:
            raise ValueError(
                f"not a fastText .bin model (magic {magic} != {FASTTEXT_MAGIC})"
            )
        if version > FASTTEXT_VERSION:
            raise ValueError(f"unsupported fastText model version {version}")
        kv = {}
        for name, fmt in _ARGS_FIELDS:
            (kv[name],) = struct.unpack(
                "<" + fmt, f.read(struct.calcsize("<" + fmt))
            )
        args = FastTextArgs(**kv)

        size, nwords, nlabels = struct.unpack("<iii", f.read(12))
        _ntokens, pruneidx_size = struct.unpack("<qq", f.read(16))
        words: list[str] = []
        counts: list[int] = []
        for _ in range(size):
            buf = bytearray()
            while True:
                c = f.read(1)
                if not c or c == b"\x00":
                    break
                buf += c
            (count,) = struct.unpack("<q", f.read(8))
            f.read(1)  # entry type (word=0 / label=1)
            words.append(buf.decode("utf-8"))
            counts.append(count)
        for _ in range(max(pruneidx_size, 0)):
            f.read(8)  # pruning index pairs (int32, int32)

        (quant_input,) = struct.unpack("<b", f.read(1))
        if quant_input:
            raise NotImplementedError(
                "quantized fastText models (.ftz) are not supported by the "
                "native reader; export to .bin/.vec, or use the PQ module "
                "(llm.similarity) for our own quantized indexes"
            )
        m, n = struct.unpack("<qq", f.read(16))
        data = np.frombuffer(f.read(m * n * 4), dtype="<f4", count=m * n)
        input_matrix = data.reshape(m, n).copy()
        output_matrix = None
        qout_b = f.read(1)
        if qout_b:
            (qout,) = struct.unpack("<b", qout_b)
            if qout:
                raise NotImplementedError(
                    "quantized output matrix (.ftz) not supported by the "
                    "native reader"
                )
            om, on = struct.unpack("<qq", f.read(16))
            odata = np.frombuffer(f.read(om * on * 4), dtype="<f4", count=om * on)
            output_matrix = odata.reshape(om, on).copy()
    return FastTextModel(
        args=args,
        words=words[:nwords],
        vectors=input_matrix,
        counts=counts,
        labels=words[nwords : nwords + nlabels],
        output=output_matrix,
    )


def write_bin(path: str, model: FastTextModel) -> None:
    """.bin writer, inverse of ``read_bin`` — model export and the
    round-trip fixture generator for tests (the same from-spec serializer
    pattern as the native xlsx/xls writers)."""
    a = model.args
    nwords, nlabels = len(model.words), len(model.labels)
    counts = model.counts or [1] * (nwords + nlabels)
    with open(path, "wb") as f:
        f.write(struct.pack("<ii", FASTTEXT_MAGIC, FASTTEXT_VERSION))
        for name, fmt in _ARGS_FIELDS:
            f.write(struct.pack("<" + fmt, getattr(a, name)))
        f.write(struct.pack("<iii", nwords + nlabels, nwords, nlabels))
        f.write(struct.pack("<qq", int(sum(counts)), -1))
        for i, w in enumerate(model.words + model.labels):
            f.write(w.encode("utf-8") + b"\x00")
            f.write(struct.pack("<q", counts[i] if i < len(counts) else 1))
            f.write(struct.pack("<b", 0 if i < nwords else 1))
        f.write(struct.pack("<b", 0))  # quant_input = false
        m, n = model.vectors.shape
        f.write(struct.pack("<qq", m, n))
        f.write(np.ascontiguousarray(model.vectors, dtype="<f4").tobytes())
        f.write(struct.pack("<b", 0))  # qout = false
        out = (
            model.output
            if model.output is not None
            else np.zeros((max(nlabels, nwords), n), dtype="<f4")
        )
        f.write(struct.pack("<qq", out.shape[0], out.shape[1]))
        f.write(np.ascontiguousarray(out, dtype="<f4").tobytes())


def load_model(path: str) -> FastTextModel:
    """Load a fastText model by extension (.vec text / .bin binary)."""
    if path.endswith(".vec"):
        return read_vec(path)
    return read_bin(path)
