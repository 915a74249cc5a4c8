"""Baseline JPEG codec (functions/jpeg.py) and its multimodal dispatch.

The encoder and decoder are independent implementations of the public
spec's two directions (different code paths: DCT vs IDCT, Huffman build
vs lookup), so round-trip agreement within quantization error checks
both against ITU-T T.81 semantics; exactness cases (solid blocks at high
quality) pin the DC path bit-wise.
"""

from __future__ import annotations

import numpy as np
import pytest

from hg_data_pipelines_spark.functions.jpeg import (
    decode_jpeg,
    encode_jpeg,
)
from hg_data_pipelines_spark.multimodal import (
    decode_image,
    image_dimensions,
    jpeg_dimensions,
)


class TestRoundTrip:
    def test_solid_gray_exact(self):
        img = np.full((16, 24, 1), 128, np.uint8)
        out = decode_jpeg(encode_jpeg(img, quality=95))
        assert out.shape == (16, 24, 1)
        np.testing.assert_array_equal(out, img)

    def test_solid_color_rgb_close(self):
        img = np.zeros((8, 8, 3), np.uint8)
        img[:] = (200, 50, 90)
        out = decode_jpeg(encode_jpeg(img, quality=95))
        assert np.abs(out.astype(int) - img.astype(int)).max() <= 2

    def test_gradient_rgb_quality95(self):
        x = np.linspace(0, 255, 32)
        g = np.meshgrid(x, x)[0]
        img = np.stack([g, g[::-1], 255 - g], -1).astype(np.uint8)
        out = decode_jpeg(encode_jpeg(img, quality=95))
        assert out.shape == img.shape
        assert np.abs(out.astype(float) - img).mean() < 2.0

    def test_noise_bounded_by_quantization(self):
        rng = np.random.default_rng(7)
        img = rng.integers(0, 256, (24, 40, 3)).astype(np.uint8)
        out = decode_jpeg(encode_jpeg(img, quality=95))
        assert np.abs(out.astype(float) - img).mean() < 6.0

    def test_odd_dimensions_pad_and_crop(self):
        rng = np.random.default_rng(11)
        img = rng.integers(0, 256, (17, 19)).astype(np.uint8)
        out = decode_jpeg(encode_jpeg(img, quality=90))
        assert out.shape == (17, 19, 1)

    def test_lower_quality_degrades_not_breaks(self):
        x = np.linspace(0, 255, 64)
        img = np.meshgrid(x, x)[0].astype(np.uint8)
        hi = decode_jpeg(encode_jpeg(img, quality=95))[..., 0].astype(float)
        lo = decode_jpeg(encode_jpeg(img, quality=20))[..., 0].astype(float)
        assert np.abs(hi - img).mean() <= np.abs(lo - img).mean()
        assert np.abs(lo - img).mean() < 20.0


class TestBitstreamDetails:
    def test_ff_byte_stuffing_round_trips(self):
        # values near 255 produce 0xFF bytes in entropy data → stuffing path
        img = np.full((8, 8), 255, np.uint8)
        img[4:, :] = 0
        out = decode_jpeg(encode_jpeg(img, quality=100))
        assert out.shape == (8, 8, 1)
        assert np.abs(out[..., 0].astype(int) - img.astype(int)).max() <= 6

    def test_marker_headers(self):
        data = encode_jpeg(np.zeros((10, 20, 3), np.uint8), quality=80)
        assert data[:2] == b"\xff\xd8" and data[-2:] == b"\xff\xd9"
        assert jpeg_dimensions(data) == (20, 10)
        assert image_dimensions(data) == (20, 10, 3)

    def test_truncated_raises(self):
        data = encode_jpeg(np.zeros((8, 8), np.uint8))
        with pytest.raises((ValueError, EOFError, IndexError)):
            decode_jpeg(data[:20])

    def test_non_jpeg_raises(self):
        with pytest.raises(ValueError):
            decode_jpeg(b"plainly not a jpeg")


def _encode_420(y_plane: np.ndarray, cb_val: int, cr_val: int) -> bytes:
    """Hand-built single-quality 4:2:0 baseline JPEG: full-res Y (2×2
    sampling), quarter-res solid Cb/Cr — the layout every camera emits,
    which the 4:4:4-only production encoder never produces. Uses the
    module's own primitives for DCT/Huffman so only the MCU interleave
    and SOF sampling factors are test-local."""
    from hg_data_pipelines_spark.functions import jpeg as J

    h, w = y_plane.shape
    assert h % 16 == 0 and w % 16 == 0
    qt = J._scale_quant(J.QUANT_LUMA, 95)
    qt_nat = qt.astype(np.float64)[np.argsort(J.ZIGZAG)].reshape(8, 8)
    dc = J._HuffmanTable(J.DC_LUMA_BITS, J.DC_LUMA_VALS)
    ac = J._HuffmanTable(J.AC_LUMA_BITS, J.AC_LUMA_VALS)
    writer = J._BitWriter()
    pred = [0, 0, 0]

    def emit(block: np.ndarray, ci: int) -> None:
        coefs = J._dct_blocks((block.astype(np.float64) - 128.0).reshape(1, 8, 8))[0]
        zz = np.rint(coefs / qt_nat).astype(np.int64).reshape(64)[J.ZIGZAG]
        J._encode_block(writer, zz, dc, ac, pred, ci)

    cb_block = np.full((8, 8), cb_val, np.float64)
    cr_block = np.full((8, 8), cr_val, np.float64)
    for my in range(h // 16):
        for mx in range(w // 16):
            for by in range(2):
                for bx in range(2):
                    y0, x0 = my * 16 + by * 8, mx * 16 + bx * 8
                    emit(y_plane[y0 : y0 + 8, x0 : x0 + 8], 0)
            emit(cb_block, 1)
            emit(cr_block, 2)
    writer.flush()

    def seg(marker: int, body: bytes) -> bytes:
        return bytes([0xFF, marker]) + (len(body) + 2).to_bytes(2, "big") + body

    out = bytearray(b"\xff\xd8")
    out += seg(0xDB, bytes([0]) + bytes(int(x) for x in qt))
    comp = bytes([1, 0x22, 0]) + bytes([2, 0x11, 0]) + bytes([3, 0x11, 0])
    out += seg(
        0xC0,
        bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big") + bytes([3]) + comp,
    )
    out += seg(0xC4, bytes([0x00]) + bytes(J.DC_LUMA_BITS) + bytes(J.DC_LUMA_VALS))
    out += seg(0xC4, bytes([0x10]) + bytes(J.AC_LUMA_BITS) + bytes(J.AC_LUMA_VALS))
    scan = bytes([1, 0x00, 2, 0x00, 3, 0x00])
    out += seg(0xDA, bytes([3]) + scan + bytes([0, 63, 0]))
    out += writer.out
    out += b"\xff\xd9"
    return bytes(out)


def _quantized_blocks(plane: np.ndarray, qt_nat: np.ndarray):
    """(H, W) float plane → list of zigzag-ordered quantized int coef
    arrays, block raster order (H, W multiples of 8)."""
    from hg_data_pipelines_spark.functions import jpeg as J

    h, w = plane.shape
    out = []
    for by in range(0, h, 8):
        for bx in range(0, w, 8):
            block = plane[by : by + 8, bx : bx + 8].astype(np.float64) - 128.0
            coefs = J._dct_blocks(block.reshape(1, 8, 8))[0]
            out.append(np.rint(coefs / qt_nat).astype(np.int64).reshape(64)[J.ZIGZAG])
    return out


def _emit_eob(writer, ac, eobrun, be_bits):
    if eobrun == 0:
        return 0, be_bits
    r = eobrun.bit_length() - 1
    ln, huff = ac.codes[r << 4]
    writer.write(huff, ln)
    if r:
        writer.write(eobrun - (1 << r), r)
    for b in be_bits:
        writer.write(b, 1)
    return 0, []


def _progressive_ac_table():
    """AC Huffman table for the progressive test scans. The Annex K
    sequential table lacks the EOB-run symbols (0x10..0xE0) progressive
    streams use, so — like real progressive encoders — the test file
    carries a custom DHT: every needed symbol as a flat 9-bit code."""
    from hg_data_pipelines_spark.functions import jpeg as J

    vals = [r << 4 for r in range(15)] + [0xF0] + [
        (r << 4) | s for r in range(16) for s in range(1, 11)
    ]
    bits = [0] * 16
    bits[8] = len(vals)  # all codes at length 9
    return bits, vals, J._HuffmanTable(bits, vals)


def _progressive_gray(img: np.ndarray, quality: int = 95) -> bytes:
    """Test-side progressive encoder (grayscale, libjpeg-style scan
    script: DC first Al=1 → AC first 1..63 Al=1 → DC refine → AC refine),
    mirroring spec G.1.2 so the decoder's four progressive paths are all
    exercised. Coefficients match the baseline encoder's exactly, so
    progressive decode must equal baseline decode bit-for-bit."""
    from hg_data_pipelines_spark.functions import jpeg as J

    h, w = img.shape
    assert h % 8 == 0 and w % 8 == 0
    qt = J._scale_quant(J.QUANT_LUMA, quality)
    qt_nat = qt.astype(np.float64)[np.argsort(J.ZIGZAG)].reshape(8, 8)
    blocks = _quantized_blocks(img.astype(np.float64), qt_nat)
    dc = J._HuffmanTable(J.DC_LUMA_BITS, J.DC_LUMA_VALS)
    ac_bits, ac_vals, ac = _progressive_ac_table()

    def seg(marker, body):
        return bytes([0xFF, marker]) + (len(body) + 2).to_bytes(2, "big") + body

    def sos_header(ss, se, ah, al):
        return seg(0xDA, bytes([1, 1, 0x00, ss, se, (ah << 4) | al]))

    out = bytearray(b"\xff\xd8")
    out += seg(0xDB, bytes([0]) + bytes(int(x) for x in qt))
    out += seg(
        0xC2,
        bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big")
        + bytes([1, 1, 0x11, 0]),
    )
    out += seg(0xC4, bytes([0x00]) + bytes(J.DC_LUMA_BITS) + bytes(J.DC_LUMA_VALS))
    out += seg(0xC4, bytes([0x10]) + bytes(ac_bits) + bytes(ac_vals))

    # --- scan 1: DC first, Al=1 -------------------------------------------
    out += sos_header(0, 0, 0, 1)
    wtr = J._BitWriter()
    pred = 0
    for zz in blocks:
        v = int(zz[0]) >> 1
        diff = v - pred
        pred = v
        t, code = J._magnitude(diff)
        ln, huff = dc.codes[t]
        wtr.write(huff, ln)
        if t:
            wtr.write(code, t)
    wtr.flush()
    out += wtr.out

    # --- scan 2: AC first, band 1..63, Al=1 -------------------------------
    out += sos_header(1, 63, 0, 1)
    wtr = J._BitWriter()
    eobrun = 0
    for zz in blocks:
        vals = [
            (0 if abs(int(v)) >> 1 == 0 else (1 if v > 0 else -1) * (abs(int(v)) >> 1))
            for v in zz
        ]
        nz = [k for k in range(1, 64) if vals[k] != 0]
        if not nz:
            eobrun += 1
            continue
        eobrun, _ = _emit_eob(wtr, ac, eobrun, [])
        run = 0
        for k in range(1, 64):
            if vals[k] == 0:
                run += 1
                continue
            while run > 15:
                ln, huff = ac.codes[0xF0]
                wtr.write(huff, ln)
                run -= 16
            t, code = J._magnitude(vals[k])
            ln, huff = ac.codes[(run << 4) | t]
            wtr.write(huff, ln)
            wtr.write(code, t)
            run = 0
        if run:
            eobrun += 1
    eobrun, _ = _emit_eob(wtr, ac, eobrun, [])
    wtr.flush()
    out += wtr.out

    # --- scan 3: DC refine, Al=0 ------------------------------------------
    out += sos_header(0, 0, 1, 0)
    wtr = J._BitWriter()
    for zz in blocks:
        wtr.write(int(zz[0]) & 1, 1)
    wtr.flush()
    out += wtr.out

    # --- scan 4: AC refine, band 1..63, Ah=1 Al=0 (spec G.1.2.3) ----------
    # Two correction-bit buffers, as in libjpeg: `be` holds bits belonging
    # to the pending EOB run (previous blocks' tails); `br` holds the
    # current block's bits since its last emitted symbol.
    out += sos_header(1, 63, 1, 0)
    wtr = J._BitWriter()
    eobrun = 0
    be: list[int] = []
    for zz in blocks:
        br: list[int] = []
        run = 0
        emitted_any = False
        for k in range(1, 64):
            v = int(zz[k])
            prev_mag = abs(v) >> 1
            if prev_mag != 0:
                br.append(abs(v) & 1)  # correction bit
            elif abs(v) == 1:  # newly significant at this level
                eobrun, be = _emit_eob(wtr, ac, eobrun, be)
                while run > 15:
                    ln, huff = ac.codes[0xF0]
                    wtr.write(huff, ln)
                    for b in br:
                        wtr.write(b, 1)
                    br = []
                    run -= 16
                ln, huff = ac.codes[(run << 4) | 1]
                wtr.write(huff, ln)
                wtr.write(1 if v > 0 else 0, 1)
                for b in br:
                    wtr.write(b, 1)
                br = []
                run = 0
                emitted_any = True
            else:
                run += 1
        if run > 0 or br or not emitted_any:
            eobrun += 1  # the block tail joins an EOB run
            be.extend(br)
    eobrun, be = _emit_eob(wtr, ac, eobrun, be)
    wtr.flush()
    out += wtr.out

    out += b"\xff\xd9"
    return bytes(out)


class TestProgressiveDecode:
    def test_progressive_equals_baseline_decode(self):
        rng = np.random.default_rng(3)
        img = rng.integers(0, 256, (24, 32)).astype(np.uint8)
        base = decode_jpeg(encode_jpeg(img, quality=95))[..., 0]
        prog = decode_jpeg(_progressive_gray(img, quality=95))[..., 0]
        np.testing.assert_array_equal(prog, base)

    def test_progressive_gradient(self):
        x = np.linspace(0, 255, 32)
        img = np.meshgrid(x, x)[0].astype(np.uint8)
        base = decode_jpeg(encode_jpeg(img, quality=90))[..., 0]
        prog = decode_jpeg(_progressive_gray(img, quality=90))[..., 0]
        np.testing.assert_array_equal(prog, base)

    def test_progressive_sparse_blocks_exercise_eobrun(self):
        # mostly flat image → long EOB runs across blocks in the AC scans
        img = np.full((40, 48), 130, np.uint8)
        img[12, 20] = 160  # one active block
        base = decode_jpeg(encode_jpeg(img, quality=95))[..., 0]
        prog = decode_jpeg(_progressive_gray(img, quality=95))[..., 0]
        np.testing.assert_array_equal(prog, base)


class TestSubsampledDecode:
    def test_420_luma_recovered_chroma_upsampled(self):
        # left half dark, right half bright; neutral chroma (128 → gray)
        y = np.zeros((16, 32), np.float64)
        y[:, 16:] = 200.0
        y[:, :16] = 40.0
        out = decode_jpeg(_encode_420(y, cb_val=128, cr_val=128))
        assert out.shape == (16, 32, 3)
        # neutral chroma: all three channels ≈ luma
        assert np.abs(out[..., 0].astype(int) - out[..., 1].astype(int)).max() <= 1
        assert abs(float(out[:, :14, 0].mean()) - 40.0) < 4
        assert abs(float(out[:, 18:, 0].mean()) - 200.0) < 4

    def test_420_chroma_tints_full_image(self):
        y = np.full((16, 16), 128.0)
        out = decode_jpeg(_encode_420(y, cb_val=128, cr_val=200))
        # Cr > 128 → red shift everywhere after 2×2 upsample
        assert (out[..., 0].astype(int) - out[..., 2].astype(int)).min() > 50

    def test_multimodal_dispatch(self):
        img = np.full((12, 12, 3), 77, np.uint8)
        out = decode_image(encode_jpeg(img, quality=95))
        assert out.shape == (12, 12, 3)
        assert np.abs(out.astype(int) - img.astype(int)).max() <= 2
