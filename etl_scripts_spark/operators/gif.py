"""Baseline GIF decoder — pure stdlib/numpy, like operators/jpeg.py.

Completes the intra-frame image codec family (PNG filters, BMP, baseline
JPEG, and now GIF's LZW): first frame of a GIF87a/89a stream → RGB pixel
array, via the spec's variable-width LSB-first LZW with dictionary reset
on CLEAR, 12-bit cap, deferred-clear tolerance, local/global color
tables, and all four interlace passes.  Animation (later frames),
transparency compositing, and the PLAIN-TEXT extension are declared
seams: the first frame is what pixel-stat curation consumes, and
compositing rules need the disposal-method state machine that belongs to
a player, not a feature extractor.

Public law only: the GIF89a specification (CompuServe, 1990) — the same
tables/behavior every OSS decoder implements.  No reference-repo
counterpart (the reference registers images as opaque files).

Scale shape: byte-sequential per payload (LZW is inherently a sequential
dictionary law — the codec analog of jpeg.py's entropy decode); the
parallelism axis is ACROSS payloads inside the Arrow batch stage
(multimodal.decode_image_pixels dispatches here map-side, no shuffle).
"""

from __future__ import annotations

import struct


class GifError(ValueError):
    pass


def _color_table(payload: bytes, pos: int, flag: int, size_bits: int):
    if not flag:
        return None, pos
    n = 2 << size_bits  # 2^(size_bits+1) entries
    end = pos + 3 * n
    if end > len(payload):
        raise GifError("color table truncated")
    return payload[pos:end], end


def _sub_blocks(payload: bytes, pos: int):
    """Concatenate length-prefixed data sub-blocks; returns (bytes, pos
    after the 0 terminator)."""
    out = bytearray()
    while True:
        if pos >= len(payload):
            raise GifError("unterminated sub-blocks")
        n = payload[pos]
        pos += 1
        if n == 0:
            return bytes(out), pos
        if pos + n > len(payload):
            raise GifError("sub-block truncated")
        out += payload[pos : pos + n]
        pos += n


def lzw_decode(data: bytes, min_code_size: int, max_pixels: int) -> list[int]:
    """GIF-variant LZW: codes are LSB-first bit-packed; CLEAR = 2^min,
    EOI = CLEAR+1; dictionary entries append (prev + first(cur)); code
    width grows when the NEXT code would not fit, capped at 12 bits
    (further growth 'deferred' until a CLEAR, per the spec's deferred
    clear-code note).  Bounded by `max_pixels` so a malformed stream
    cannot balloon memory past the declared image size."""
    if not 2 <= min_code_size <= 11:
        raise GifError(f"bad LZW min code size {min_code_size}")
    clear = 1 << min_code_size
    eoi = clear + 1
    out: list[int] = []

    # bit reader state
    acc = 0
    nbits = 0
    bytepos = 0

    def read_code(width: int):
        nonlocal acc, nbits, bytepos
        while nbits < width:
            if bytepos >= len(data):
                return None  # truncated stream: decode what we have
            acc |= data[bytepos] << nbits
            bytepos += 1
            nbits += 8
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        return code

    def reset_dict():
        return [(i,) for i in range(clear)] + [(), ()], min_code_size + 1

    table, width = reset_dict()
    prev: tuple[int, ...] | None = None
    while True:
        code = read_code(width)
        if code is None or code == eoi:
            return out
        if code == clear:
            table, width = reset_dict()
            prev = None
            continue
        # reserved indices can't be dereferenced here: clear/eoi were both
        # handled above, and every appended entry is non-empty
        if code < len(table):
            entry = table[code]
        elif code == len(table) and prev is not None:
            entry = prev + (prev[0],)  # the KwKwK case
        else:
            raise GifError("LZW code out of range")
        out.extend(entry)
        if len(out) > max_pixels:
            raise GifError("LZW output exceeds declared image size")
        if prev is not None and len(table) < 4096:
            table.append(prev + (entry[0],))
            if len(table) == (1 << width) and width < 12:
                width += 1
        prev = entry


#: decoder pixel cap (16.7M px ≈ a 4096x4096 frame): bounds LZW output
#: memory by the cap, not by an attacker-declared 65535x65535 header
MAX_PIXELS = 1 << 24

_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _deinterlace(height: int) -> list[int]:
    """inv[actual_row] = sequential stream row carrying it (4-pass layout)."""
    order = []
    for start, step in _INTERLACE_PASSES:
        order.extend(range(start, height, step))
    inv = [0] * height
    for seq, actual in enumerate(order):
        inv[actual] = seq
    return inv


def decode_gif_pixels(payload: bytes):
    """First image frame of a GIF → (height, width, 3) uint8 RGB ndarray.

    Raises GifError on malformed input (callers map that to the
    undecodable-NULL flow, same as the JPEG branch)."""
    import numpy as np

    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise GifError("not a GIF")
    if len(payload) < 13:
        raise GifError("header truncated")
    packed = payload[10]
    gct, pos = _color_table(payload, 13, packed & 0x80, packed & 0x07)
    while pos < len(payload):
        block = payload[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension: label + sub-blocks, skipped
            if pos >= len(payload):
                raise GifError("extension truncated")
            pos += 1
            _, pos = _sub_blocks(payload, pos)
            continue
        if block != 0x2C:
            raise GifError(f"unknown block 0x{block:02x}")
        if pos + 9 > len(payload):
            raise GifError("image descriptor truncated")
        _left, _top, w, h = struct.unpack("<HHHH", payload[pos : pos + 8])
        ipacked = payload[pos + 8]
        pos += 9
        lct, pos = _color_table(payload, pos, ipacked & 0x80, ipacked & 0x07)
        table = lct if lct is not None else gct
        if table is None:
            raise GifError("no color table")
        if w == 0 or h == 0:
            raise GifError("empty image")
        if w * h > MAX_PIXELS:
            # the LZW output bound is keyed to the DECLARED size; without
            # this cap a kilobyte-scale malformed payload declaring
            # 65535x65535 can legitimately expand toward 4.3e9 symbols
            # (KwKwK/deferred-clear streams are ~quadratic amplifiers) and
            # OOM the executor instead of NULL-flowing
            raise GifError(f"image {w}x{h} exceeds decoder pixel cap")
        if pos >= len(payload):
            raise GifError("missing LZW code size")
        min_code = payload[pos]
        data, pos = _sub_blocks(payload, pos + 1)
        idx = lzw_decode(data, min_code, w * h)
        if len(idx) < w * h:
            raise GifError("pixel data truncated")
        arr = np.asarray(idx[: w * h], dtype=np.int64).reshape(h, w)
        if arr.max() * 3 + 2 >= len(table):
            raise GifError("pixel index past color table")
        pal = np.frombuffer(table, dtype=np.uint8).reshape(-1, 3)
        img = pal[arr]
        if ipacked & 0x40:  # interlaced: rows arrive in 4-pass order
            img = img[np.asarray(_deinterlace(h))]
        return img
    raise GifError("no image block")


def _pack_codes(codes: list[int], width: int) -> bytes:
    """LSB-first fixed-width bit packing (the fixture emits CLEAR before
    every literal, so the width never grows — see synthetic_gif_bytes)."""
    acc = nbits = 0
    out = bytearray()
    for c in codes:
        acc |= c << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def synthetic_gif_bytes(doc_id: int) -> bytes:
    """Deterministic, fully-decodable GIF whose pixels are CLOSED-FORM:
    w = 8 + doc_id % 8, h = 8 + (doc_id·3) % 8, palette entry j =
    ((17j + doc_id) % 256, (23j + 2·doc_id) % 256, (29j + 3·doc_id) % 256)
    over n = 16 colors, pixel index p(i) = (13·doc_id + 7i) % 16 in row-
    major order; every 3rd doc interlaced (same pixels, 4-pass layout).
    The LZW stream interleaves CLEAR before every literal code, so the
    dictionary never grows and every code is exactly 5 bits — a valid
    stream any conforming decoder accepts, with none of the adaptive
    state (that part is pinned by hand-built streams in the unit tests,
    the jpeg.py fixture strategy)."""
    n_colors, min_code = 16, 4
    w = 8 + doc_id % 8
    h = 8 + (doc_id * 3) % 8
    pal = bytes(
        b
        for j in range(n_colors)
        for b in ((17 * j + doc_id) % 256, (23 * j + 2 * doc_id) % 256, (29 * j + 3 * doc_id) % 256)
    )
    idx = [(13 * doc_id + 7 * i) % n_colors for i in range(w * h)]
    interlaced = doc_id % 3 == 0
    if interlaced:
        order = []
        for start, step in _INTERLACE_PASSES:
            order.extend(range(start, h, step))
        rows = [idx[r * w : (r + 1) * w] for r in order]
        idx = [p for row in rows for p in row]
    clear, eoi = 1 << min_code, (1 << min_code) + 1
    codes: list[int] = []
    for p in idx:
        codes += [clear, p]
    codes.append(eoi)
    data = _pack_codes(codes, min_code + 1)
    blocks = bytearray()
    for off in range(0, len(data), 255):
        chunk = data[off : off + 255]
        blocks += bytes([len(chunk)]) + chunk
    blocks.append(0)
    return (
        b"GIF89a"
        + struct.pack("<HHBBB", w, h, 0x80 | 0x03, 0, 0)  # GCT, 16 entries
        + pal
        + b"\x2c"
        + struct.pack("<HHHH", 0, 0, w, h)
        + bytes([0x40 if interlaced else 0])
        + bytes([min_code])
        + bytes(blocks)
        + b"\x3b"
    )
