"""Baseline JPEG codec tests (operators/jpeg.py): fixture-law exactness
across all variants, the general AC entropy path against an independent
naive IDCT, MCU interleave + chroma upsampling at 4:2:0, restart
markers, and the declared non-baseline seam."""

from __future__ import annotations

import numpy as np
import pytest

from etl_scripts_spark.operators import jpeg


@pytest.mark.parametrize("d", [0, 1, 2, 3, 4, 7, 8, 12, 17, 100, 255, 999])
def test_fixture_law_exact(d):
    """DC-only constant blocks with Q00=8 decode EXACTLY — gray and
    YCbCr 4:4:4 variants, non-multiple-of-8 dims (edge-block crops),
    restart-marker variant (d%4==0) included."""
    img = jpeg.decode_jpeg_pixels(jpeg.synthetic_jpeg_bytes(d))
    w, h = 16 + d % 9, 16 + (3 * d) % 9
    ch = 1 if d % 2 == 0 else 3
    assert img.shape == (h, w, ch)
    x, y = np.arange(w), np.arange(h)
    v = (5 * (x[None, :] // 8) + 11 * (y[:, None] // 8) + d) % 256
    assert np.array_equal(img, np.repeat(v[:, :, None], ch, axis=2).astype(np.uint8))


def _naive_idct(coeffs):
    out = np.zeros((8, 8))
    for x in range(8):
        for y in range(8):
            s = 0.0
            for u in range(8):
                for v in range(8):
                    cu = 1 / np.sqrt(2) if u == 0 else 1.0
                    cv = 1 / np.sqrt(2) if v == 0 else 1.0
                    s += (
                        cu * cv * coeffs[u, v]
                        * np.cos((2 * x + 1) * u * np.pi / 16)
                        * np.cos((2 * y + 1) * v * np.pi / 16)
                    )
            out[x, y] = s / 4
    return out


def test_ac_entropy_path_vs_naive_idct():
    """Arbitrary quantized coefficients — zero runs, ZRL (≥16-zero run to
    an isolated high-frequency coeff), a coefficient at the last zigzag
    position (no EOB), negative values — round-trip through the encoder
    and decode to exactly what a from-the-formula IDCT produces."""
    rng = np.random.RandomState(42)
    q = rng.randint(1, 32, size=(8, 8)).astype(np.int64)
    blocks = np.zeros((2, 3, 8, 8), dtype=np.int64)
    blocks[0, 0] = rng.randint(-100, 100, (8, 8))
    blocks[1, 2, 7, 7] = 50
    blocks[0, 2, 0, 0] = -30
    blocks[1, 1, 0, 7] = 5
    img = jpeg.decode_jpeg_pixels(jpeg.encode_baseline([blocks], 24, 16, [q]))
    for by in range(2):
        for bx in range(3):
            ref = np.clip(np.rint(_naive_idct(blocks[by, bx] * q) + 128), 0, 255)
            assert np.array_equal(img[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8, 0], ref)


def test_420_mcu_interleave_and_upsample():
    """2×2-sampled luma with distinct per-block DCs + single-block chroma:
    the decoder walks the interleaved MCU block order and np.repeats the
    chroma plane; gray content keeps the YCbCr→RGB transform exact."""
    yb = np.zeros((2, 2, 8, 8), dtype=np.int64)
    for i in range(2):
        for j in range(2):
            yb[i, j, 0, 0] = (i * 4 + j * 2) - 10
    cbcr = np.zeros((1, 1, 8, 8), dtype=np.int64)
    q8 = np.full((8, 8), 16, dtype=np.int64)
    q8[0, 0] = 8
    img = jpeg.decode_jpeg_pixels(
        jpeg.encode_baseline(
            [yb, cbcr, cbcr], 16, 16, [q8, q8], sampling=[(2, 2), (1, 1), (1, 1)]
        )
    )
    assert img.shape == (16, 16, 3)
    for i in range(2):
        for j in range(2):
            assert (img[i * 8 : i * 8 + 8, j * 8 : j * 8 + 8] == (i * 4 + j * 2) + 118).all()


def test_restart_markers_present_and_reset_prediction():
    payload = jpeg.synthetic_jpeg_bytes(4)  # DRI=3 variant
    assert b"\xff\xd0" in payload.split(b"\xff\xda")[1]
    # decoding already asserts value-exactness in test_fixture_law_exact;
    # a decoder that failed to reset DC predictors would shift every
    # post-restart block's constant
    assert jpeg.decode_jpeg_pixels(payload) is not None


def test_progressive_rejected_as_declared_seam():
    payload = bytearray(jpeg.synthetic_jpeg_bytes(2))
    payload[payload.find(b"\xff\xc0") + 1] = 0xC2  # SOF0 → SOF2
    with pytest.raises(ValueError):
        jpeg.decode_jpeg_pixels(bytes(payload))


def test_dispatch_routes_jpeg():
    from etl_scripts_spark.operators import multimodal

    fmt, img = multimodal.decode_image_pixels(jpeg.synthetic_jpeg_bytes(6))
    assert fmt == "jpeg" and img is not None
    fmt, img = multimodal.decode_image_pixels(b"\xff\xd8\xff\xd9")
    assert fmt == "jpeg" and img is None


def test_bitreader_acc_stays_byte_sized():
    """_fill replaces the accumulator (it never extends it): keeping
    consumed bits would grow a bigint linearly with the scan and make
    every read_bit an O(scan) shift — quadratic decode on real files."""
    r = jpeg._BitReader(bytes([0b10101010]) * 512, 0)
    for _ in range(8 * 511):
        r.read_bit()
    assert r.acc.bit_length() <= 8


def test_fill_bytes_before_marker_accepted():
    """T.81 B.1.1.2: any marker may be preceded by any number of 0xFF
    fill bytes; encoders emit them for alignment."""
    payload = jpeg.synthetic_jpeg_bytes(3)
    i = payload.find(b"\xff\xdb")
    padded = payload[:i] + b"\xff\xff\xff" + payload[i:]
    assert np.array_equal(
        jpeg.decode_jpeg_pixels(padded), jpeg.decode_jpeg_pixels(payload)
    )


def test_forged_sof_dims_rejected_before_allocation():
    """A tiny payload declaring a 65535x65535 frame must raise ValueError
    fast — not allocate a ~32 GB MCU grid from unvalidated SOF dims."""
    import struct as _s

    sof = _s.pack(">BHHB", 8, 65535, 65535, 1) + bytes([1, 0x11, 0])
    sos = bytes([1, 1, 0x00, 0x00, 0x3F, 0x00])
    payload = (
        b"\xff\xd8"
        + b"\xff\xc0" + _s.pack(">H", 2 + len(sof)) + sof
        + b"\xff\xda" + _s.pack(">H", 2 + len(sos)) + sos
        + b"\x00" * 16
    )
    with pytest.raises(ValueError):
        jpeg.decode_jpeg_pixels(payload)


def test_fractional_sampling_ratio_is_declared_seam():
    """Luma H=3 vs chroma H=2 (legal per T.81, fractional upsample ratio)
    raises ValueError instead of silently mis-registering chroma."""
    mcx, mcy = 1, 1
    luma = np.zeros((mcy, 3 * mcx, 8, 8), dtype=np.int64)
    chroma = np.zeros((mcy, 2 * mcx, 8, 8), dtype=np.int64)
    q = np.full((8, 8), 16, dtype=np.int64)
    q[0, 0] = 8
    payload = jpeg.encode_baseline(
        [luma, chroma, chroma], 24, 8, [q, q], sampling=[(3, 1), (2, 1), (2, 1)]
    )
    with pytest.raises(ValueError, match="sampling"):
        jpeg.decode_jpeg_pixels(payload)


def test_mjpeg_avi_codec_level_decode():
    """Codec-level video: demux the MJPEG AVI, JPEG-decode every frame,
    and the pixel stats match the closed-form DC-block law frame by
    frame (frame i uses fixture id d + i)."""
    from etl_scripts_spark.operators import multimodal

    for d in (0, 3, 7, 12):
        payload = multimodal.synthetic_mjpeg_avi_bytes(d)
        frames = multimodal.demux_avi_frames(payload)
        assert len(frames) == 2 + d % 5
        for i, (_off, data) in enumerate(frames):
            img = jpeg.decode_jpeg_pixels(data)
            fid = d + i
            w, h = 16 + fid % 9, 16 + (3 * fid) % 9
            ch = 1 if fid % 2 == 0 else 3
            assert img.shape == (h, w, ch)
            x, y = np.arange(w), np.arange(h)
            v = (5 * (x[None, :] // 8) + 11 * (y[:, None] // 8) + fid) % 256
            assert int(img.astype(np.int64).sum()) == int(v.sum()) * ch
