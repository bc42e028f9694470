"""Baseline TIFF decoder — pure stdlib/numpy, like operators/jpeg.py
and operators/gif.py.

Extends the intra-frame image codec family with the container format
scientific instruments actually emit (the reference's imaging dropboxes
move .tif microscopy files as opaque payloads — register-omero-dropbox;
here the pixels are real): 8-bit grayscale (photometric 0/1) and RGB
(photometric 2), strip-based layout, BOTH byte orders (II/MM), and
compression 1 (none) + 32773 (PackBits, the spec's own RLE).  Declared
raising seams: tiles, planar=2, 16-bit/float samples, palette TIFF, and
LZW/JPEG-in-TIFF — baseline strips are what instrument exports and the
fixture generator use; the compressed-TIFF variants wrap codecs already
implemented elsewhere in this family.

Public law only: the TIFF 6.0 specification (Adobe, 1992).  PackBits is
the Apple RLE from the same spec (§9).

Scale shape: byte-sequential per payload (strip walk + RLE), the
parallelism axis is ACROSS payloads in the Arrow stage —
multimodal.decode_image_pixels dispatches here map-side, no shuffle.
An output-size cap keyed to the DECLARED dimensions bounds memory: a
kilobyte payload declaring 65535×65535 raises instead of ballooning
(the gif.py lesson); PackBits output is additionally clamped to the
strip's expected byte count, so a malformed run cannot overshoot.
"""

from __future__ import annotations

import struct

MAX_PIXELS = 1 << 26  # 64M samples — far above any fixture, bounds a lie


class TiffError(ValueError):
    pass


_TYPE_SIZE = {1: 1, 2: 1, 3: 2, 4: 4}  # BYTE, ASCII, SHORT, LONG


def _read_values(payload: bytes, bo: str, typ: int, count: int, raw: bytes):
    """Decode an IFD entry's values (inline if they fit 4 bytes, else at
    the offset the 4 bytes hold)."""
    size = _TYPE_SIZE.get(typ)
    if size is None:
        return None  # unsupported type: caller ignores the tag
    total = size * count
    if total <= 4:
        buf = raw[:total]
    else:
        (off,) = struct.unpack(bo + "I", raw)
        if off + total > len(payload):
            raise TiffError("tag value runs past payload")
        buf = payload[off : off + total]
    if typ in (1, 2):
        return list(buf)
    fmt = "H" if typ == 3 else "I"
    return list(struct.unpack(f"{bo}{count}{fmt}", buf))


def packbits_decode(data: bytes, expected: int) -> bytes:
    """TIFF §9 PackBits RLE: n in [0,127] → n+1 literal bytes follow;
    n in [-127,-1] → next byte repeats 1−n times; −128 is a no-op.
    Output is CLAMPED to `expected` (an overshooting final run cannot
    balloon past the strip); truncated runs and output short of the
    strip raise."""
    out = bytearray()
    pos = 0
    while pos < len(data) and len(out) < expected:
        n = data[pos]
        pos += 1
        if n == 128:
            continue
        if n < 128:
            end = pos + n + 1
            if end > len(data):
                raise TiffError("PackBits literal run truncated")
            out += data[pos:end]
            pos = end
        else:
            if pos >= len(data):
                raise TiffError("PackBits replicate run truncated")
            out += bytes([data[pos]]) * (257 - n)
            pos += 1
    if len(out) < expected:
        raise TiffError("PackBits output short of strip size")
    return bytes(out[:expected])


def decode_tiff_pixels(payload: bytes):
    """Baseline TIFF → (height, width, channels) uint8 ndarray
    (channels 1 for grayscale, 3 for RGB).  Raises TiffError on
    malformed input or a declared seam — callers map that to the
    undecodable-NULL flow, same as the JPEG/GIF branches."""
    import numpy as np

    if payload[:4] == b"II*\x00":
        bo = "<"
    elif payload[:4] == b"MM\x00*":
        bo = ">"
    else:
        raise TiffError("not a TIFF")
    if len(payload) < 8:
        raise TiffError("header truncated")
    (ifd_off,) = struct.unpack(bo + "I", payload[4:8])
    if ifd_off + 2 > len(payload):
        raise TiffError("IFD offset past payload")
    (n_entries,) = struct.unpack(bo + "H", payload[ifd_off : ifd_off + 2])
    tags: dict[int, list] = {}
    for i in range(n_entries):
        base = ifd_off + 2 + 12 * i
        if base + 12 > len(payload):
            raise TiffError("IFD entry truncated")
        tag, typ, count = struct.unpack(bo + "HHI", payload[base : base + 8])
        vals = _read_values(payload, bo, typ, count, payload[base + 8 : base + 12])
        if vals is not None:
            tags[tag] = vals

    def one(tag: int, default=None):
        v = tags.get(tag)
        if not v:  # absent OR present with count=0: both are "missing"
            if default is None:
                raise TiffError(f"missing required tag {tag}")
            return default
        return v[0]

    w, h = one(256), one(257)
    spp = one(277, 1)
    if spp not in (1, 3):
        # spp=0 would decode to an (h, w, 0) array that divides by zero
        # in the stats stage — outside the NULL-flow contract
        raise TiffError(f"samples-per-pixel {spp} is a declared seam")
    bits = tags.get(258, [8] * spp)
    compression = one(259, 1)
    photometric = one(262)
    planar = one(284, 1)
    if 322 in tags or 323 in tags or 324 in tags:
        raise TiffError("tiled TIFF is a declared seam")
    if planar != 1:
        raise TiffError("planar configuration 2 is a declared seam")
    if any(b != 8 for b in bits) or len(bits) != spp:
        raise TiffError("only 8-bit samples supported")
    if photometric not in (0, 1, 2):
        raise TiffError(f"photometric {photometric} is a declared seam")
    # with spp restricted to {1, 3}: gray (ph 0/1) pairs with spp 1,
    # RGB (ph 2) pairs with spp 3 — the XOR rejects both mismatches
    if (photometric == 2) != (spp == 3):
        raise TiffError("photometric/samples-per-pixel mismatch")
    if compression not in (1, 32773):
        raise TiffError(f"compression {compression} is a declared seam")
    if w == 0 or h == 0:
        raise TiffError("empty image")
    if w * h * spp > MAX_PIXELS:
        raise TiffError(f"image {w}x{h}x{spp} exceeds decoder sample cap")
    offsets = tags.get(273)
    counts = tags.get(279)
    if not offsets or not counts or len(offsets) != len(counts):
        raise TiffError("missing/mismatched strip tables")
    rps = one(278, h)
    rps = min(rps, h)
    if rps == 0:
        raise TiffError("zero rows per strip")
    row_bytes = w * spp
    out = bytearray()
    rows_done = 0
    for off, cnt in zip(offsets, counts):
        if off + cnt > len(payload):
            raise TiffError("strip runs past payload")
        rows = min(rps, h - rows_done)
        if rows <= 0:
            break
        expected = rows * row_bytes
        strip = payload[off : off + cnt]
        if compression == 32773:
            strip = packbits_decode(strip, expected)
        if len(strip) < expected:
            raise TiffError("strip shorter than its rows")
        out += strip[:expected]
        rows_done += rows
    if rows_done < h:
        raise TiffError("strips cover fewer rows than ImageLength")
    arr = np.frombuffer(bytes(out), dtype=np.uint8).reshape(h, w, spp).copy()
    if photometric == 0:  # WhiteIsZero: invert to the BlackIsZero domain
        arr = 255 - arr
    return arr


def _entry(bo: str, tag: int, typ: int, values: list[int], extra_at: int):
    """One 12-byte IFD entry (+ external data when values overflow the
    inline word).  Returns (entry_bytes, external_bytes)."""
    size = _TYPE_SIZE[typ]
    fmt = {1: "B", 3: "H", 4: "I"}[typ]
    packed = struct.pack(f"{bo}{len(values)}{fmt}", *values)
    head = struct.pack(bo + "HHI", tag, typ, len(values))
    if len(packed) <= 4:
        return head + packed.ljust(4, b"\x00"), b""
    return head + struct.pack(bo + "I", extra_at), packed


def synthetic_tiff_bytes(doc_id: int) -> bytes:
    """Deterministic little-endian grayscale TIFF over the SHARED fixture
    pixel law v(x,y) = (3x + 7y + doc_id) mod 256 (multimodal
    ._pixel_pattern — the same law the PNG/BMP fixtures use, so any
    pixel aggregate stays closed-form in doc_id for a SQL oracle).
    Two strips always; every 3rd doc is PackBits-compressed (literal
    runs — valid RLE that exercises the decompressor on every strip)."""
    from .multimodal import _pixel_pattern

    img = _pixel_pattern(doc_id)
    h, w = img.shape
    compression = 32773 if doc_id % 3 == 0 else 1
    rps = (h + 1) // 2
    strips = []
    for s in range(2):
        rows = img[s * rps : min((s + 1) * rps, h)]
        raw = rows.tobytes()
        if compression == 32773:
            # literal-run PackBits: chunks of ≤128 bytes, header n-1
            enc = bytearray()
            for i in range(0, len(raw), 128):
                chunk = raw[i : i + 128]
                enc.append(len(chunk) - 1)
                enc += chunk
            raw = bytes(enc)
        strips.append(raw)
    # layout: header(8) | IFD | strip0 | strip1
    n_tags = 9
    ifd_len = 2 + 12 * n_tags + 4
    data_at = 8 + ifd_len
    offs = [data_at, data_at + len(strips[0])]
    entries = [
        (256, 3, [w]),
        (257, 3, [h]),
        (258, 3, [8]),
        (259, 3, [compression]),
        (262, 3, [1]),
        (273, 4, offs),
        (277, 3, [1]),
        (278, 3, [rps]),
        (279, 4, [len(s) for s in strips]),
    ]
    body = struct.pack("<H", n_tags)
    extra = b""
    extra_base = data_at + len(strips[0]) + len(strips[1])
    for tag, typ, vals in entries:
        e, x = _entry("<", tag, typ, vals, extra_base + len(extra))
        body += e
        extra += x
    body += struct.pack("<I", 0)  # no next IFD
    assert len(body) == ifd_len
    return b"II*\x00" + struct.pack("<I", 8) + body + strips[0] + strips[1] + extra
