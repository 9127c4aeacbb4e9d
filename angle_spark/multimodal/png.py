"""Minimal pure-stdlib PNG codec (zlib + numpy unfilter) — no PIL needed.

Makes the multimodal decode leaf REAL (round-3 VERDICT task 5): the
container ships no image library, but PNG is just zlib over per-row
filtered scanlines, so decoding needs nothing beyond the stdlib. Scope is
the common still-image subset: 8-bit depth, color types 0 (gray),
2 (RGB), 4 (gray+alpha), 6 (RGBA), no interlacing — anything else raises
and the caller falls back to the disclosed histogram stub.

The encoder exists for tests/synthesis: it can emit any of the five
filter types (0=None 1=Sub 2=Up 3=Average 4=Paeth) so the decoder's
unfilter paths are all round-trip-tested against known pixels.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIGNATURE = b"\x89PNG\r\n\x1a\n"
_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def is_png(data: bytes) -> bool:
    return data[:8] == _SIGNATURE


def _chunk(tag: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + tag
        + body
        + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
    )


def _paeth(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    """Paeth predictor, vectorized (a=left, b=up, c=up-left; int16 in)."""
    p = a + b - c
    pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
    out = np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))
    return out


def encode_png(arr: np.ndarray, filter_type: int = 0) -> bytes:
    """uint8 array (h, w) | (h, w, 3) | (h, w, 4) -> PNG bytes.

    filter_type applies the same filter to every row (valid PNG; real
    encoders pick per-row — irrelevant for decoding)."""
    if arr.dtype != np.uint8:
        raise ValueError("encode_png: uint8 only")
    if arr.ndim == 2:
        color_type, c = 0, 1
        px = arr[:, :, None]
    elif arr.ndim == 3 and arr.shape[2] in (2, 3, 4):
        c = arr.shape[2]
        color_type = {2: 4, 3: 2, 4: 6}[c]
        px = arr
    else:
        raise ValueError(f"encode_png: unsupported shape {arr.shape}")
    h, w = px.shape[:2]
    rows = px.reshape(h, w * c).astype(np.int16)
    zero = np.zeros(w * c, dtype=np.int16)
    out_rows = []
    for y in range(h):
        cur = rows[y]
        up = rows[y - 1] if y else zero
        left = np.concatenate([np.zeros(c, dtype=np.int16), cur[:-c]])
        upleft = np.concatenate([np.zeros(c, dtype=np.int16), up[:-c]])
        if filter_type == 0:
            raw = cur
        elif filter_type == 1:
            raw = cur - left
        elif filter_type == 2:
            raw = cur - up
        elif filter_type == 3:
            raw = cur - ((left + up) // 2)
        elif filter_type == 4:
            raw = cur - _paeth(left, up, upleft)
        else:
            raise ValueError(f"filter {filter_type}")
        out_rows.append(bytes([filter_type]) + (raw % 256).astype(np.uint8).tobytes())
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    idat = zlib.compress(b"".join(out_rows))
    return (
        _SIGNATURE
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", idat)
        + _chunk(b"IEND", b"")
    )


def decode_png(data: bytes) -> np.ndarray:
    """PNG bytes -> uint8 array (h, w, channels). Raises ValueError on
    anything outside the supported subset (caller falls back)."""
    if not is_png(data):
        raise ValueError("not a PNG signature")
    pos, idat, ihdr = 8, [], None
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        if tag == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif tag == b"IDAT":
            idat.append(body)
        elif tag == b"IEND":
            break
        pos += 12 + length
    if ihdr is None or not idat:
        raise ValueError("missing IHDR/IDAT")
    w, h, depth, color_type, comp, filt, interlace = ihdr
    if depth != 8 or comp != 0 or filt != 0 or interlace != 0:
        raise ValueError(f"unsupported PNG variant: depth={depth} interlace={interlace}")
    c = _CHANNELS.get(color_type)
    if c is None:
        raise ValueError(f"unsupported color type {color_type}")
    raw = zlib.decompress(b"".join(idat))
    stride = w * c
    if len(raw) != h * (stride + 1):
        raise ValueError("scanline size mismatch")
    lines = np.frombuffer(raw, dtype=np.uint8).reshape(h, stride + 1)
    ftypes = lines[:, 0]
    rows = lines[:, 1:].astype(np.int16)
    recon = np.zeros((h, stride), dtype=np.int16)
    zero = np.zeros(stride, dtype=np.int16)
    for y in range(h):
        f = int(ftypes[y])
        cur = rows[y]
        up = recon[y - 1] if y else zero
        if f == 0:
            recon[y] = cur
        elif f == 1:
            # recon[x] = raw[x] + recon[x-c]: per-lane cumulative sum
            lanes = cur.reshape(-1, c)
            recon[y] = (np.cumsum(lanes, axis=0) % 256).reshape(-1)
        elif f == 2:
            recon[y] = (cur + up) % 256
        elif f in (3, 4):
            # left-dependency with up-mixing: sequential per pixel group
            r = recon[y]
            for x in range(0, stride, c):
                left = r[x - c : x] if x else zero[:c]
                upv = up[x : x + c]
                if f == 3:
                    pred = (left + upv) // 2
                else:
                    upleft = up[x - c : x] if x else zero[:c]
                    pred = _paeth(left, upv, upleft)
                r[x : x + c] = (cur[x : x + c] + pred) % 256
        else:
            raise ValueError(f"bad filter byte {f}")
    return recon.astype(np.uint8).reshape(h, w, c)
