"""Shipped trained CNN weights (r7 verdict #4): the .npz artifact, the
narrow-head load seam (ADVICE r7), and the trained-beats-random
accuracy invariant behind multimodal_cnn_pretrained_classify."""

import os

import numpy as np
import pytest

import tuktu_spark.ml as ml_pkg
from tuktu_spark.llm.multimodal import decode_pixels, make_png
from tuktu_spark.ml.cnn import EMBED_DIM, TinyConvNet, _to_gray_square

WEIGHTS = os.path.join(
    os.path.dirname(os.path.abspath(ml_pkg.__file__)),
    "weights", "tinyconvnet_textures_v1.npz",
)
FAMILIES = ((7, 0), (0, 7), (7, 7), (131, 77))


def _gray(png: bytes) -> np.ndarray:
    w, h, c, pix = decode_pixels(png)
    return _to_gray_square(pix, w, h, c)


def _query_png(i: int) -> tuple[bytes, int]:
    cls = i % 4
    dx, dy = FAMILIES[cls]
    return (
        make_png(18 + i % 7, 14 + (i // 4) % 5, gradient=((i * 37) % 256, dx, dy)),
        cls,
    )


def _accuracy(net: TinyConvNet, n: int = 400) -> float:
    ok = 0
    for i in range(n):
        png, cls = _query_png(i)
        ok += int(np.argmax(net.forward(_gray(png))) == cls)
    return ok / n


def test_narrow_head_roundtrips_through_npz(tmp_path):
    """A classifier net with n_classes < EMBED_DIM must survive
    save_weights -> load_weights (ADVICE r7: the old fixed-shape check
    rejected every trained head)."""
    net = TinyConvNet(seed=99)
    net.w3 = net.w3[:, :3].copy()
    net.b3 = np.array([0.1, -0.2, 0.3])
    path = str(tmp_path / "narrow.npz")
    net.save_weights(path)
    back = TinyConvNet.load_weights(path)
    for p in ("w1", "b1", "w2", "b2", "w3", "b3"):
        assert np.array_equal(getattr(back, p), getattr(net, p)), p
    assert back.w3.shape == (16, 3)


def test_bad_head_shapes_still_rejected(tmp_path):
    import numpy as np

    net = TinyConvNet()
    path = str(tmp_path / "bad.npz")
    net.save_weights(path)
    with np.load(path) as z:
        arrs = dict(z)
    arrs["w3"] = np.zeros((16, EMBED_DIM + 1))  # wider than the projection
    arrs["b3"] = np.zeros(EMBED_DIM + 1)
    np.savez(path, **arrs)
    with pytest.raises(ValueError, match="head w3"):
        TinyConvNet.load_weights(path)


def test_shipped_artifact_exists_and_is_narrow():
    assert os.path.exists(WEIGHTS), WEIGHTS
    net = TinyConvNet.load_weights(WEIGHTS)
    assert net.w3.shape == (16, 4) and net.b3.shape == (4,)


def test_trained_weights_beat_he_random_and_are_query_exact():
    """The invariant the driver query rests on: the SHIPPED artifact
    classifies the closed-form query corpus perfectly; He-random weights
    with the same architecture sit near 4-way chance. The image tuple is
    periodic in doc_id with lcm(7, 20, 256, 4) = 8960 (validated to zero
    errors over the WHOLE period by scripts/train_cnn_weights.py); the
    sample here strides across that full period, so every (w, h, seed)
    region is touched."""
    trained = TinyConvNet.load_weights(WEIGHTS)
    assert _accuracy(trained) == 1.0
    # stride-sample the high end of the period (doc_ids no sf reaches)
    for i in range(5000, 8960, 97):
        png, cls = _query_png(i)
        assert int(np.argmax(trained.forward(_gray(png)))) == cls, i
    base = TinyConvNet()
    base.w3 = base.w3[:, :4].copy()
    base.b3 = base.b3[:4].copy()
    random_acc = _accuracy(base, 200)
    assert random_acc < 0.6  # measured ~0.04; any untrained net is far from 1.0
