"""Property-based round-trip tests for the round-6 stdlib codecs: encode
with arbitrary (bounded) parameters, decode, and require exact recovery.
These are PURE-PYTHON properties (no Spark session) — the Arrow tables
are thin wrappers over these functions and are pinned separately."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings, strategies as st

_S = dict(max_examples=25, deadline=None,
          suppress_health_check=list(HealthCheck))

DIMS = st.tuples(st.integers(1, 12), st.integers(1, 9))
GRAD = st.tuples(st.integers(0, 255), st.integers(0, 255), st.integers(0, 255))


def _expected_rgb(w, h, seed, dx, dy):
    out = bytearray()
    for y in range(h):
        for x in range(w):
            v = (seed + dx * x + dy * y) % 256
            out += bytes([v, (2 * v) % 256, (3 * v) % 256])
    return bytes(out)


@settings(**_S)
@given(dims=DIMS, grad=GRAD, interlaced=st.booleans())
def test_gif_roundtrip(dims, grad, interlaced):
    from tuktu_spark.llm.multimodal import decode_gif_pixels, make_gif

    (w, h), (seed, dx, dy) = dims, grad
    gw, gh, c, rgb = decode_gif_pixels(
        make_gif(w, h, gradient=grad, interlaced=interlaced)
    )
    assert (gw, gh, c) == (w, h, 3)
    assert rgb == _expected_rgb(w, h, seed, dx, dy)


@settings(**_S)
@given(dims=DIMS, grad=GRAD)
def test_bmp_roundtrip(dims, grad):
    from tuktu_spark.llm.multimodal import decode_bmp_pixels, make_bmp

    (w, h), (seed, dx, dy) = dims, grad
    gw, gh, c, rgb = decode_bmp_pixels(make_bmp(w, h, gradient=grad))
    assert (gw, gh, c) == (w, h, 3)
    assert rgb == _expected_rgb(w, h, seed, dx, dy)


@settings(**_S)
@given(dims=DIMS, grad=GRAD,
       filters=st.lists(st.integers(0, 4), min_size=1, max_size=5),
       indexed=st.booleans())
def test_png_roundtrip_all_filters(dims, grad, filters, indexed):
    from tuktu_spark.llm.multimodal import decode_pixels, make_png

    (w, h), (seed, dx, dy) = dims, grad
    png = make_png(w, h, gradient=grad, filters=filters, indexed=indexed)
    gw, gh, c, px = decode_pixels(png)
    assert (gw, gh) == (w, h)
    if indexed:
        assert c == 3 and px == _expected_rgb(w, h, seed, dx, dy)
    else:
        assert c == 1
        assert px == bytes(
            (seed + dx * x + dy * y) % 256 for y in range(h) for x in range(w)
        )


@settings(**_S)
@given(dims=DIMS, n=st.integers(1, 4),
       grad4=st.tuples(st.integers(0, 255), st.integers(0, 255),
                       st.integers(0, 255), st.integers(0, 255)))
def test_avi_dib_roundtrip(dims, n, grad4):
    from tuktu_spark.llm.multimodal import decode_avi_frames, make_avi

    (w, h) = dims
    seed, dx, dy, dt = grad4
    gw, gh, frames = decode_avi_frames(make_avi(w, h, n, gradient=grad4))
    assert (gw, gh, len(frames)) == (w, h, n)
    for t, rgb in enumerate(frames):
        assert rgb == _expected_rgb(w, h, (seed + dt * t) % 256, dx, dy)


@settings(**_S)
@given(n=st.integers(30, 400), step=st.integers(0, 50),
       mod=st.integers(2, 1000), bits=st.sampled_from([8, 16]),
       channels=st.integers(1, 2))
def test_wav_ramp_roundtrip(n, step, mod, bits, channels):
    from tuktu_spark.llm.multimodal import decode_wav_samples, make_wav

    if bits == 8 and mod > 256:
        mod = 256  # 8-bit storage clamps outside [-128, 127]
    rate, ch, s = decode_wav_samples(
        make_wav(n_samples=n, channels=channels, bits=bits, ramp=(step, mod))
    )
    assert ch == channels and len(s) == n * channels
    mono = s[::channels]
    assert mono == [(i * step) % mod - mod // 2 for i in range(n)]


@settings(**_S)
@given(members=st.lists(
    st.tuples(
        st.text(alphabet="abc012", min_size=1, max_size=8),
        st.sampled_from(["png", "txt", "json", "seg.json"]),
        st.binary(min_size=0, max_size=600),
    ),
    min_size=0, max_size=8,
    unique_by=lambda m: (m[0], m[1]),
))
def test_tar_roundtrip(members):
    import io
    import tarfile

    from tuktu_spark.llm.multimodal import make_tar_shard

    named = [(f"{k}.{e}", payload) for k, e, payload in members]
    shard = make_tar_shard(named)
    assert shard == make_tar_shard(named)  # deterministic
    got = {}
    with tarfile.open(fileobj=io.BytesIO(shard)) as tf:
        for m in tf:
            got[m.name] = tf.extractfile(m).read()
    assert got == dict(named)


@settings(**_S)
@given(shades=st.lists(st.integers(0, 127).map(lambda v: 2 * v),
                       min_size=1, max_size=5),
       dims=st.tuples(st.integers(1, 20), st.integers(1, 20)),
       spc=st.integers(1, 6))
def test_mp4_mjpeg_roundtrip(shades, dims, spc):
    from tuktu_spark.llm.multimodal import decode_mp4_samples, make_mp4_mjpeg

    w, h = dims
    mp4 = make_mp4_mjpeg(w, h, shades, samples_per_chunk=spc)
    gw, gh, frames = decode_mp4_samples(mp4)
    assert (gw, gh, len(frames)) == (w, h, len(shades))
    for shade, rgb in zip(shades, frames):
        assert set(rgb) == {shade} and len(rgb) == w * h * 3


@settings(**_S)
@given(deltas=st.lists(st.integers(1, 5000), min_size=1, max_size=8))
def test_mp4_stts_prefix_sums(deltas):
    from tuktu_spark.llm.multimodal import make_mp4_mjpeg, mp4_sample_timestamps

    mp4 = make_mp4_mjpeg(4, 4, [10] * len(deltas), frame_deltas=deltas)
    ts = mp4_sample_timestamps(mp4)
    want, t = [], 0
    for d in deltas:
        want.append(t)
        t += d
    assert ts == want


@settings(**_S)
@given(samples=st.lists(st.integers(-32768, 32767), min_size=65, max_size=300),
       channels=st.integers(1, 2))
def test_audio_fingerprint_matches_naive(samples, channels):
    from tuktu_spark.llm.multimodal import audio_fingerprint_bits

    inter = [v for v in samples for _ in range(channels)]
    hi, lo = audio_fingerprint_bits(inter, channels)
    L = len(samples) // 65
    e = [sum(x * x for x in samples[t * L:(t + 1) * L]) for t in range(65)]
    want_hi = want_lo = 0
    for k in range(64):
        if e[k + 1] > e[k]:
            if k < 32:
                want_hi |= 1 << k
            else:
                want_lo |= 1 << (k % 32)
    assert (hi, lo) == (want_hi, want_lo)


@settings(**_S)
@given(dims=DIMS, grad=GRAD, rps=st.integers(1, 6), rgb=st.booleans())
def test_tiff_roundtrip(dims, grad, rps, rgb):
    from tuktu_spark.llm.multimodal import decode_tiff_pixels, make_tiff

    (w, h), (seed, dx, dy) = dims, grad
    t = make_tiff(w, h, gradient=grad, rows_per_strip=rps, rgb=rgb)
    dw, dh, c, px = decode_tiff_pixels(t)
    assert (dw, dh, c) == (w, h, 3 if rgb else 1)
    if rgb:
        assert px == _expected_rgb(w, h, seed, dx, dy)
    else:
        assert px == bytes(
            (seed + dx * x + dy * y) % 256 for y in range(h) for x in range(w)
        )


@settings(**_S)
@given(dims=DIMS, grad=GRAD, rgb=st.booleans(),
       comment=st.one_of(st.none(), st.text(alphabet="ab c", max_size=10)))
def test_pnm_roundtrip(dims, grad, rgb, comment):
    from tuktu_spark.llm.multimodal import decode_pnm_pixels, make_pnm

    (w, h), (seed, dx, dy) = dims, grad
    if comment is not None and ("\n" in comment or "\r" in comment):
        comment = comment.replace("\n", " ").replace("\r", " ")
    img = make_pnm(w, h, gradient=grad, rgb=rgb, comment=comment)
    dw, dh, c, px = decode_pnm_pixels(img)
    assert (dw, dh, c) == (w, h, 3 if rgb else 1)
    if rgb:
        assert px == _expected_rgb(w, h, seed, dx, dy)
    else:
        assert px == bytes(
            (seed + dx * x + dy * y) % 256 for y in range(h) for x in range(w)
        )
