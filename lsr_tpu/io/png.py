"""Minimal dependency-free PNG writer/reader (host-side edge IO).

The reference presents via SDL or saves PNGs; our headless edge is a PNG file.
Canvas arrays use bottom-left origin (conventions.md §2); PNG rows are
top-to-bottom, so `save_canvas_png` vertically flips — the same flip the
reference performs in Canvas::copy_to_SDLSurface (shs_renderer.hpp:770-781).
"""

from __future__ import annotations

import os
import struct
import zlib

import numpy as np


def _chunk(tag: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + tag
        + data
        + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
    )


def write_png(path: str, img_u8: np.ndarray) -> None:
    """Write (H, W, 3|4) u8 array as PNG; row 0 is the TOP row."""
    img = np.asarray(img_u8)
    if img.dtype != np.uint8:
        raise ValueError("write_png expects uint8")
    if img.ndim == 2:
        img = np.stack([img] * 3, axis=-1)
    h, w, ch = img.shape
    if ch == 3:
        color_type = 2
    elif ch == 4:
        color_type = 6
    else:
        raise ValueError(f"unsupported channel count {ch}")
    raw = b"".join(b"\x00" + img[y].tobytes() for y in range(h))
    out = b"\x89PNG\r\n\x1a\n"
    out += _chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0))
    out += _chunk(b"IDAT", zlib.compress(raw, 6))
    out += _chunk(b"IEND", b"")
    with open(path, "wb") as f:
        f.write(out)


def save_canvas_png(path: str, canvas_u8: np.ndarray) -> None:
    """Save a bottom-left-origin canvas (row 0 = bottom) as a PNG."""
    write_png(path, np.asarray(canvas_u8)[::-1])


_PNG_LIB = None
_PNG_LIB_TRIED = False


def _png_lib():
    """ctypes handle to the native scanline unfilterer (native/
    png_filters.cpp) — the data-loader hot loop in C; None if unbuilt."""
    global _PNG_LIB, _PNG_LIB_TRIED
    if _PNG_LIB_TRIED:
        return _PNG_LIB
    _PNG_LIB_TRIED = True
    import ctypes

    from lsr_tpu.utils.native_build import ensure_native_built

    lib_path = ensure_native_built("libpngfilters.so")
    if lib_path is None:
        _PNG_LIB = None
        return _PNG_LIB
    try:
        lib = ctypes.CDLL(lib_path)
        lib.png_unfilter.restype = ctypes.c_int
        lib.png_unfilter.argtypes = [
            ctypes.c_char_p, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int64, ctypes.c_void_p]
        _PNG_LIB = lib
    except OSError:
        _PNG_LIB = None
    return _PNG_LIB


def read_png(path: str) -> np.ndarray:
    """Read an 8-bit RGB/RGBA/gray PNG written by write_png (filters 0-4)."""
    with open(path, "rb") as f:
        data = f.read()
    if data[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not a PNG")
    pos = 8
    idat = b""
    w = h = bitdepth = color_type = None
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + length]
        pos += 12 + length
        if tag == b"IHDR":
            w, h, bitdepth, color_type = struct.unpack(">IIBB", payload[:10])
        elif tag == b"IDAT":
            idat += payload
        elif tag == b"IEND":
            break
    if bitdepth != 8:
        raise ValueError("only 8-bit PNGs supported")
    channels = {0: 1, 2: 3, 4: 2, 6: 4}[color_type]
    raw = zlib.decompress(idat)
    stride = w * channels

    lib = _png_lib()
    if lib is not None and len(raw) >= h * (stride + 1):
        out = np.empty(h * stride, np.uint8)
        rc = lib.png_unfilter(raw, h, stride, channels,
                              out.ctypes.data_as(__import__("ctypes").c_void_p))
        if rc == 0:
            return out.reshape(h, w, channels)
        # Unknown filter byte: fall through to the Python decoder's error.

    img = np.zeros((h, stride), np.uint8)
    prev = np.zeros(stride, np.int32)
    off = 0
    for y in range(h):
        ftype = raw[off]
        row = np.frombuffer(raw, np.uint8, stride, off + 1).astype(np.int32)
        off += 1 + stride
        if ftype == 0:
            cur = row
        elif ftype == 1:  # Sub
            cur = row.copy()
            for i in range(channels, stride):
                cur[i] = (cur[i] + cur[i - channels]) & 0xFF
        elif ftype == 2:  # Up
            cur = (row + prev) & 0xFF
        elif ftype == 3:  # Average
            cur = row.copy()
            for i in range(stride):
                left = cur[i - channels] if i >= channels else 0
                cur[i] = (cur[i] + ((left + prev[i]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            cur = row.copy()
            for i in range(stride):
                a = cur[i - channels] if i >= channels else 0
                b = prev[i]
                c = prev[i - channels] if i >= channels else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                cur[i] = (cur[i] + pred) & 0xFF
        else:
            raise ValueError(f"unsupported filter {ftype}")
        img[y] = cur.astype(np.uint8)
        prev = cur
    return img.reshape(h, w, channels)
