"""Minimal 16-bit PNG codec (numpy only).

Virtual KITTI 2 ships forward-optical-flow maps as 16-bit RGB PNGs, which
the reference decodes with ``cv::imread(..., IMREAD_ANYDEPTH)`` (reference
src/Frame.cc:1458-1494). PIL silently downcasts 48-bit RGB to uint8, so the
loader here inflates + unfilters the PNG stream directly. Only what the
flow maps need is supported: bit depth 16, color types 0 (gray) and 2
(RGB), no interlacing, no palette.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIGNATURE = b"\x89PNG\r\n\x1a\n"


def _paeth(a, b, c):
    # a = left, b = up, c = up-left (per-byte predictor, PNG spec 9.4)
    p = a.astype(np.int32) + b.astype(np.int32) - c.astype(np.int32)
    pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
    out = np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))
    return out.astype(np.uint8)


def read_png16(path: str) -> np.ndarray:
    """Decode a 16-bit PNG -> (H, W) or (H, W, 3) uint16."""
    with open(path, "rb") as f:
        data = f.read()
    if data[:8] != _SIGNATURE:
        raise ValueError(f"{path}: not a PNG file")
    pos = 8
    width = height = bit_depth = color_type = None
    idat = []
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        pos += 12 + length
        if tag == b"IHDR":
            width, height, bit_depth, color_type, _, _, interlace = struct.unpack(
                ">IIBBBBB", body
            )
            if bit_depth != 16:
                raise ValueError(f"{path}: bit depth {bit_depth}, expected 16")
            if color_type not in (0, 2):
                raise ValueError(f"{path}: unsupported color type {color_type}")
            if interlace:
                raise ValueError(f"{path}: interlaced PNGs unsupported")
        elif tag == b"IDAT":
            idat.append(body)
        elif tag == b"IEND":
            break
    raw = zlib.decompress(b"".join(idat))
    channels = 3 if color_type == 2 else 1
    bpp = 2 * channels                      # bytes per pixel
    stride = width * bpp
    rows = np.frombuffer(raw, np.uint8).reshape(height, stride + 1)
    filters = rows[:, 0]
    out = np.zeros((height, stride), np.uint8)
    prev = np.zeros(stride, np.uint8)
    for r in range(height):
        cur = rows[r, 1:].copy()
        ft = filters[r]
        if ft == 0:
            pass
        elif ft == 1:    # Sub: prefix sum (mod 256) over each byte lane
            lanes = cur.reshape(stride // bpp, bpp).astype(np.uint32)
            cur = np.cumsum(lanes, axis=0).astype(np.uint8).reshape(stride)
        elif ft == 2:    # Up
            cur = (cur.astype(np.int32) + prev).astype(np.uint8)
        elif ft == 3:    # Average
            for i in range(stride):
                left = cur[i - bpp] if i >= bpp else 0
                cur[i] = (int(cur[i]) + ((int(left) + int(prev[i])) >> 1)) & 0xFF
        elif ft == 4:    # Paeth
            for i in range(stride):
                left = cur[i - bpp] if i >= bpp else 0
                ul = prev[i - bpp] if i >= bpp else 0
                cur[i] = (int(cur[i]) + int(_paeth(
                    np.uint8(left), prev[i], np.uint8(ul)
                ))) & 0xFF
        else:
            raise ValueError(f"{path}: unknown filter {ft}")
        out[r] = cur
        prev = out[r]
    img = out.reshape(height, width, channels, 2)
    img = (img[..., 0].astype(np.uint16) << 8) | img[..., 1]
    return img[:, :, 0] if channels == 1 else img


def write_png16(path: str, arr: np.ndarray) -> None:
    """Encode (H, W) or (H, W, 3) uint16 -> 16-bit PNG (filter 0)."""
    arr = np.asarray(arr, np.uint16)
    if arr.ndim == 2:
        color_type, body = 0, arr[:, :, None]
    elif arr.ndim == 3 and arr.shape[2] == 3:
        color_type, body = 2, arr
    else:
        raise ValueError(f"unsupported shape {arr.shape}")
    h, w = arr.shape[:2]
    raw = bytearray()
    be = body.astype(">u2")
    for r in range(h):
        raw += b"\x00" + be[r].tobytes()

    def chunk(tag, data):
        c = struct.pack(">I", len(data)) + tag + data
        return c + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)

    with open(path, "wb") as f:
        f.write(_SIGNATURE)
        f.write(chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 16, color_type, 0, 0, 0)))
        f.write(chunk(b"IDAT", zlib.compress(bytes(raw))))
        f.write(chunk(b"IEND", b""))
