"""Property-based checks (hypothesis) for the pure-Python codec surfaces.

These run without a SparkSession: the pixel and PDF codecs are plain
functions executed inside Arrow batches, so fuzzing them directly covers
the exact code the executors run.  Two families:

  * round-trip laws — encode(x) then decode gives back x, for ALL ids
    (every container variant, every PNG filter phase, every dim class);
  * totality — arbitrary byte garbage never raises, it degrades to the
    documented "unknown/None/empty" values (the keep-flowing contract a
    100 TB corpus scan relies on).
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from etl_scripts_spark.operators import multimodal
from etl_scripts_spark.parsers import sidecars

ids = st.integers(min_value=0, max_value=2**31 - 1)


@settings(max_examples=150, deadline=None)
@given(ids)
def test_pixel_roundtrip_any_id(doc_id):
    fmt, img = multimodal.decode_image_pixels(
        multimodal.synthetic_pixel_image_bytes(doc_id)
    )
    exp = multimodal._pixel_pattern(doc_id)
    assert fmt == ("bmp" if doc_id % 3 == 0 else "png")
    assert img is not None and img.shape[:2] == exp.shape
    assert all((img[:, :, c] == exp).all() for c in range(img.shape[2]))


@settings(max_examples=150, deadline=None)
@given(ids)
def test_pdf_roundtrip_any_id(doc_id):
    text = sidecars.extract_pdf_text(sidecars.synthetic_pdf_bytes(doc_id))
    assert text == (
        f"Auftrag: A-{doc_id % 10000:04d}\n"
        f"Q{'ABCD'[doc_id % 4]}{'WXYZ'[(doc_id // 4) % 4]}0X{doc_id % 999:03d}A0"
        f" RIN: {doc_id % 10}.{doc_id % 7}"
    )


@settings(max_examples=300, deadline=None)
@given(st.binary(max_size=256))
def test_image_parsers_total_on_garbage(raw):
    fmt, w, h = multimodal.parse_image_header(raw)
    assert isinstance(fmt, str)
    dfmt, img = multimodal.decode_image_pixels(raw)
    assert isinstance(dfmt, str)
    assert img is None or img.ndim == 3


@settings(max_examples=300, deadline=None)
@given(st.binary(max_size=256))
def test_pdf_extractor_total_on_garbage(raw):
    assert isinstance(sidecars.extract_pdf_text(raw), str)


@settings(max_examples=150, deadline=None)
@given(st.binary(max_size=192))
def test_parsers_total_on_jpeg_prefixed_garbage(raw):
    # adversarial: valid SOI then garbage — the marker walk must terminate
    payload = b"\xff\xd8" + raw
    fmt, w, h = multimodal.parse_image_header(payload)
    # <4 bytes is below the JPEG branch's truncation guard → "unknown"
    assert fmt == ("jpeg" if len(payload) >= 4 else "unknown")


@settings(max_examples=150, deadline=None)
@given(st.binary(max_size=192))
def test_png_decoder_total_on_png_prefixed_garbage(raw):
    # valid PNG signature then garbage chunks: None, never an exception
    out = multimodal.decode_png_pixels(b"\x89PNG\r\n\x1a\n" + raw)
    assert out is None or out.ndim == 3


@settings(max_examples=150, deadline=None)
@given(ids)
def test_wav_roundtrip_any_id(doc_id):
    import numpy as np

    rate, s = multimodal.decode_wav_audio(multimodal.synthetic_wav_bytes(doc_id))
    n = 256 + doc_id % 256
    i = np.arange(n, dtype=np.int64)
    assert rate == 8000 + (doc_id % 4) * 4000
    assert (s.astype("int64") == ((doc_id * 31 + i * 7) % 65536) - 32768).all()


@settings(max_examples=150, deadline=None)
@given(ids)
def test_avi_demux_roundtrip_any_id(doc_id):
    frames = multimodal.demux_avi_frames(multimodal.synthetic_avi_bytes(doc_id))
    k = 2 + doc_id % 7
    assert len(frames) == k
    for i, (_off, data) in enumerate(frames):
        ln = 10 + (doc_id + i) % 50
        assert data == bytes(((doc_id + 3 * i + m) % 256) for m in range(ln))


@settings(max_examples=300, deadline=None)
@given(st.binary(max_size=256))
def test_riff_family_total_on_garbage(raw):
    assert multimodal.decode_wav_audio(raw) is None or True
    frames = multimodal.demux_avi_frames(raw)
    assert frames is None or isinstance(frames, list)
    # RIFF-prefixed garbage exercises the chunk walker specifically
    list(multimodal.parse_riff_chunks(b"RIFF" + raw))


@settings(max_examples=100, deadline=None)
@given(ids)
def test_jpeg_fixture_roundtrip_any_id(doc_id):
    """The JPEG fixture law holds for EVERY id — all container variants
    (gray / YCbCr 4:4:4), all dim classes (w,h ∈ 16..24 incl. edge-block
    crops), restart-marker phase included."""
    import numpy as np

    from etl_scripts_spark.operators import jpeg

    img = jpeg.decode_jpeg_pixels(jpeg.synthetic_jpeg_bytes(doc_id))
    w, h = 16 + doc_id % 9, 16 + (3 * doc_id) % 9
    ch = 1 if doc_id % 2 == 0 else 3
    x, y = np.arange(w), np.arange(h)
    v = (5 * (x[None, :] // 8) + 11 * (y[:, None] // 8) + doc_id) % 256
    assert np.array_equal(img, np.repeat(v[:, :, None], ch, axis=2).astype("uint8"))


@settings(max_examples=60, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=63),
            st.integers(min_value=-1023, max_value=1023).filter(lambda v: v != 0),
        ),
        max_size=12,
    ),
    st.integers(min_value=-128, max_value=127),
)
def test_jpeg_entropy_layer_roundtrip(sparse, dc):
    """The entropy+zigzag+dequant layers are LOSSLESS for any sparse
    quantized block (runs, ZRL, EOB-absent last coefficient, negative
    values): encode → decode must reproduce exactly the pixels the
    decoder's own IDCT produces from the original coefficients — any
    drift isolates a bug in the coding layers, independent of IDCT."""
    import numpy as np

    from etl_scripts_spark.operators import jpeg

    blk = np.zeros((1, 1, 8, 8), dtype=np.int64)
    blk[0, 0, 0, 0] = dc
    for pos, val in sparse:
        blk[0, 0, pos // 8, pos % 8] = val
    q = np.full((8, 8), 3, dtype=np.int64)
    img = jpeg.decode_jpeg_pixels(jpeg.encode_baseline([blk], 8, 8, [q]))
    ref = np.clip(
        np.rint(jpeg._idct_blocks((blk[0, 0] * q)[None].astype(float))[0] + 128),
        0,
        255,
    ).astype("uint8")
    assert np.array_equal(img[:, :, 0], ref)


@settings(max_examples=300, deadline=None)
@given(st.binary(max_size=300))
def test_jpeg_total_on_garbage(raw):
    """Arbitrary bytes after an SOI marker never escape as a non-ValueError
    — the keep-flowing contract decode_image_pixels relies on."""
    from etl_scripts_spark.operators import jpeg, multimodal

    try:
        jpeg.decode_jpeg_pixels(b"\xff\xd8" + raw)
    except ValueError:
        pass
    fmt, img = multimodal.decode_image_pixels(b"\xff\xd8" + raw)
    assert fmt == "jpeg"


@settings(max_examples=150, deadline=None)
@given(ids)
def test_square_wav_roundtrip_any_id(doc_id):
    dec = multimodal.decode_wav_pcm(multimodal.synthetic_square_wav_bytes(doc_id))
    assert dec is not None
    rate, channels, s = dec
    assert rate == 8000 + (doc_id % 4) * 4000 and channels == 1
    n = 256 * (1 + doc_id % 4)
    assert len(s) == n
    # square tone: every sample is exactly ±A, duty exactly half per frame
    assert set(abs(int(v)) for v in s) == {12000}
    frames = s.reshape(n // 256, 256)
    assert all(int((f > 0).sum()) == 128 for f in frames)


@settings(max_examples=300, deadline=None)
@given(st.binary(max_size=256))
def test_wav_pcm_total_on_garbage(raw):
    dec = multimodal.decode_wav_pcm(raw)
    if dec is not None:
        rate, channels, s = dec
        # the corrupt-header law: rates past INT32 (and 0) never escape
        assert 0 < rate < 2**31 and channels in (1, 2)
