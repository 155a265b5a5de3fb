"""Baseline JPEG codec (llm/jpeg.py): encoder/decoder round-trips over
every stage — Huffman tables, entropy coding with byte stuffing, zigzag,
quantization, IDCT, upsampling-free 4:4:4 color, YCbCr transform."""

from __future__ import annotations

import numpy as np
import pytest

from tuktu_spark.llm.jpeg import (
    AC_LUMA_SPEC,
    DC_LUMA_SPEC,
    _huff_codes,
    _huff_decode_table,
    dct2,
    decode_jpeg_pixels,
    idct2,
    make_jpeg,
    predicted_constant_decode,
)


class TestTransforms:
    def test_dct_idct_inverse(self):
        rng = np.random.RandomState(7)
        block = rng.randint(0, 256, (8, 8)).astype(np.float64)
        assert np.allclose(idct2(dct2(block)), block, atol=1e-9)

    def test_constant_block_is_dc_only(self):
        coef = dct2(np.full((8, 8), 57.0))
        assert coef[0, 0] == pytest.approx(8 * 57.0)
        off_dc = coef.copy()
        off_dc[0, 0] = 0
        assert np.abs(off_dc).max() < 1e-9


class TestHuffman:
    def test_codes_are_prefix_free(self):
        for spec in (DC_LUMA_SPEC, AC_LUMA_SPEC):
            codes = _huff_codes(spec)
            as_bits = {format(c, f"0{ln}b") for c, ln in codes.values()}
            assert len(as_bits) == len(codes)
            for a in as_bits:
                for b in as_bits:
                    if a != b:
                        assert not b.startswith(a)

    def test_decode_table_inverts_codes(self):
        codes = _huff_codes(AC_LUMA_SPEC)
        table = _huff_decode_table(AC_LUMA_SPEC)
        for v, (code, ln) in codes.items():
            assert table[(ln, code)] == v


class TestRoundTrip:
    @pytest.mark.parametrize("shade", [0, 10, 100, 128, 200, 254])
    def test_constant_gray_decodes_exactly(self, shade):
        # even shades quantize exactly (predicted_constant_decode)
        for w, h in [(8, 8), (16, 8), (13, 9), (40, 24)]:
            ww, hh, c, pix = decode_jpeg_pixels(make_jpeg(w, h, shade=shade))
            assert (ww, hh, c) == (w, h, 1)
            arr = np.frombuffer(pix, dtype=np.uint8)
            assert np.all(arr == predicted_constant_decode(shade))

    def test_constant_color_within_quant_error(self):
        for px in [(255, 0, 0), (0, 255, 0), (10, 20, 30), (200, 180, 90)]:
            w, h, c, pix = decode_jpeg_pixels(make_jpeg(16, 16, pixel=px))
            assert c == 3
            arr = np.frombuffer(pix, dtype=np.uint8).reshape(h, w, 3)
            mean = arr.reshape(-1, 3).mean(axis=0)
            assert np.abs(mean - np.array(px)).max() < 6

    def test_header_probe_sees_dimensions(self):
        from tuktu_spark.llm.multimodal import probe_media

        info = probe_media(make_jpeg(33, 21, shade=78))
        assert info == {"format": "jpeg", "width": 33, "height": 21}

    def test_unified_decode_pixels_dispatch(self):
        from tuktu_spark.llm.multimodal import decode_pixels, make_png

        w, h, c, _ = decode_pixels(make_jpeg(10, 6, shade=44))
        assert (w, h, c) == (10, 6, 1)
        w, h, c, _ = decode_pixels(make_png(4, 3, shade=9))
        assert (w, h, c) == (4, 3, 1)
        with pytest.raises(NotImplementedError):
            decode_pixels(b"GIF89a" + b"\x00" * 20)  # header-only format

    def test_progressive_rejected_cleanly(self):
        data = bytearray(make_jpeg(8, 8, shade=100))
        idx = data.find(b"\xff\xc0")
        data[idx + 1] = 0xC2  # rewrite SOF0 -> SOF2 (progressive)
        with pytest.raises(NotImplementedError, match="non-baseline"):
            decode_jpeg_pixels(bytes(data))

    def test_not_a_jpeg(self):
        with pytest.raises(NotImplementedError):
            decode_jpeg_pixels(b"plainly not a jpeg")


class Test420Subsampling:
    def test_gray_color_420_decodes_exact(self):
        from tuktu_spark.llm.jpeg import decode_jpeg_pixels, make_jpeg

        # partial MCUs in both axes (16x16 MCU grid): 9x5, 24x17, 33x31
        for w, h in ((16, 16), (9, 5), (24, 17), (33, 31)):
            for shade in (0, 64, 128, 254):
                j = make_jpeg(w, h, pixel=(shade, shade, shade), subsampling="420")
                dw, dh, c, pix = decode_jpeg_pixels(j)
                assert (dw, dh, c) == (w, h, 3)
                assert set(pix) == {shade}

    def test_sof_declares_22_sampling(self):
        from tuktu_spark.llm.jpeg import make_jpeg

        j = make_jpeg(16, 16, pixel=(100, 100, 100), subsampling="420")
        i = j.find(b"\xff\xc0")
        # SOF0: len(2) prec(1) h(2) w(2) nc(1), then comp 1: id, h<<4|v, tq
        assert j[i + 11] == 0x22

    def test_color_420_within_quant_error(self):
        from tuktu_spark.llm.jpeg import decode_jpeg_pixels, make_jpeg

        j = make_jpeg(16, 16, pixel=(200, 80, 40), subsampling="420")
        _, _, c, pix = decode_jpeg_pixels(j)
        assert c == 3
        rs, gs, bs = pix[0::3], pix[1::3], pix[2::3]
        for chan, target in ((rs, 200), (gs, 80), (bs, 40)):
            assert all(abs(v - target) <= 12 for v in chan)
