"""Pure-numpy media codecs for the multimodal stages.

This container ships no image/audio libraries, but three common
formats need none — they are fixed headers + raw samples:

* BMP  (uncompressed 24/32-bit BITMAPINFOHEADER)
* PPM  (binary P6)
* WAV  (RIFF PCM 8/16-bit)

``decode_image`` / ``decode_audio`` dispatch on magic bytes and raise
``NotImplementedError`` for codec formats (JPEG/PNG/MP3/...), which
keeps the "real decode" path honest: real for container-feasible
formats, stubbed only where a codec genuinely isn't available.
Encoders exist so tests can round-trip without fixtures.
"""

from __future__ import annotations

import struct

import numpy as np


# --------------------------------------------------------------------
# BMP
# --------------------------------------------------------------------

def encode_bmp(pixels: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB → uncompressed 24-bit BMP bytes."""
    h, w, _ = pixels.shape
    row_pad = (-(w * 3)) % 4
    img = np.flipud(pixels)[:, :, ::-1]  # bottom-up rows, BGR order
    rows = b"".join(
        img[r].tobytes() + b"\x00" * row_pad for r in range(h)
    )
    data_off = 14 + 40
    header = struct.pack("<2sIHHI", b"BM", data_off + len(rows), 0, 0, data_off)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(rows), 2835, 2835, 0, 0)
    return header + info + rows


def decode_bmp(payload: bytes) -> np.ndarray:
    """Uncompressed 24/32-bit BMP → (h, w, 3) uint8 RGB."""
    if payload[:2] != b"BM":
        raise ValueError("not a BMP")
    data_off = struct.unpack_from("<I", payload, 10)[0]
    hdr_size = struct.unpack_from("<I", payload, 14)[0]
    if hdr_size < 40:
        raise NotImplementedError("BITMAPCOREHEADER BMP not supported")
    w, h_signed = struct.unpack_from("<ii", payload, 18)
    bpp = struct.unpack_from("<H", payload, 28)[0]
    comp = struct.unpack_from("<I", payload, 30)[0]
    if comp != 0 or bpp not in (24, 32):
        raise NotImplementedError(f"BMP compression={comp} bpp={bpp} not supported")
    h = abs(h_signed)
    nbytes = bpp // 8
    stride = (w * nbytes + 3) & ~3
    raw = np.frombuffer(payload, dtype=np.uint8, count=stride * h, offset=data_off)
    rows = raw.reshape(h, stride)[:, : w * nbytes].reshape(h, w, nbytes)
    if h_signed > 0:  # bottom-up storage
        rows = rows[::-1]
    return rows[:, :, 2::-1].copy()  # BGR(A) → RGB


# --------------------------------------------------------------------
# PPM (P6)
# --------------------------------------------------------------------

def encode_ppm(pixels: np.ndarray) -> bytes:
    h, w, _ = pixels.shape
    return f"P6\n{w} {h}\n255\n".encode() + pixels.astype(np.uint8).tobytes()


def decode_ppm(payload: bytes) -> np.ndarray:
    if payload[:2] != b"P6":
        raise ValueError("not a P6 PPM")
    # header: three whitespace-separated ints, # comments allowed
    vals, pos = [], 2
    while len(vals) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":
            while pos < len(payload) and payload[pos : pos + 1] != b"\n":
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        vals.append(int(payload[start:pos]))
    pos += 1  # single whitespace after maxval
    w, h, maxval = vals
    if maxval > 255:
        raise NotImplementedError("16-bit PPM not supported")
    raw = np.frombuffer(payload, dtype=np.uint8, count=w * h * 3, offset=pos)
    return raw.reshape(h, w, 3).copy()


# --------------------------------------------------------------------
# WAV (RIFF PCM)
# --------------------------------------------------------------------

def encode_wav(samples: np.ndarray, sample_rate: int = 16000) -> bytes:
    """(n,) or (n, channels) int16 → RIFF PCM WAV bytes."""
    s = np.asarray(samples, dtype=np.int16)
    if s.ndim == 1:
        s = s[:, None]
    n, ch = s.shape
    data = s.tobytes()
    byte_rate = sample_rate * ch * 2
    fmt = struct.pack("<4sIHHIIHH", b"fmt ", 16, 1, ch, sample_rate, byte_rate, ch * 2, 16)
    hdr = struct.pack("<4sI4s", b"RIFF", 4 + len(fmt) + 8 + len(data), b"WAVE")
    return hdr + fmt + struct.pack("<4sI", b"data", len(data)) + data


def decode_wav(payload: bytes) -> tuple[int, np.ndarray]:
    """RIFF PCM WAV → (sample_rate, (n, channels) float32 in [-1, 1])."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos = 12
    sr = ch = bits = None
    data = None
    while pos + 8 <= len(payload):
        cid, size = struct.unpack_from("<4sI", payload, pos)
        body = pos + 8
        if cid == b"fmt ":
            fmt_tag, ch, sr = struct.unpack_from("<HHI", payload, body)
            bits = struct.unpack_from("<H", payload, body + 14)[0]
            if fmt_tag != 1 or bits not in (8, 16):
                raise NotImplementedError(f"WAV format={fmt_tag} bits={bits} not supported")
        elif cid == b"data":
            data = payload[body : body + size]
        pos = body + size + (size & 1)
    if sr is None or data is None:
        raise ValueError("missing fmt/data chunk")
    if bits == 16:
        arr = np.frombuffer(data, dtype="<i2").astype(np.float32) / 32768.0
    else:
        arr = (np.frombuffer(data, dtype=np.uint8).astype(np.float32) - 128.0) / 128.0
    n = len(arr) // ch * ch
    return sr, arr[:n].reshape(-1, ch)


# --------------------------------------------------------------------
# PNG (stdlib zlib + numpy unfiltering — the format LLM pipelines
# actually store; no external library needed)
# --------------------------------------------------------------------

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_chunk(tag: bytes, data: bytes) -> bytes:
    import zlib

    return (struct.pack(">I", len(data)) + tag + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF))


def encode_png(pixels: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB → PNG bytes (color type 2, filter 0 rows)."""
    import zlib

    h, w, _ = pixels.shape
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    raw = b"".join(b"\x00" + pixels[r].astype(np.uint8).tobytes() for r in range(h))
    return (_PNG_SIG + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"IDAT", zlib.compress(raw)) + _png_chunk(b"IEND", b""))


def decode_png(payload: bytes) -> np.ndarray:
    """8-bit non-interlaced PNG (gray / RGB / palette / gray+alpha /
    RGBA) → (h, w, 3) uint8 RGB.  All five row filters (None/Sub/Up/
    Average/Paeth) are supported; Sub is a per-row mod-256 cumsum, Up
    a vector add, Average/Paeth fall back to a per-byte row loop (the
    only sequential recurrences in the spec)."""
    import zlib

    if payload[:8] != _PNG_SIG:
        raise ValueError("not a PNG")
    pos, idat, plte = 8, [], None
    w = h = ch = ct = None
    while pos + 8 <= len(payload):
        ln, tag = struct.unpack_from(">I4s", payload, pos)
        body = payload[pos + 8 : pos + 8 + ln]
        if tag == b"IHDR":
            w, h, depth, ct, comp, filt, inter = struct.unpack(">IIBBBBB", body)
            if depth != 8 or inter != 0 or comp != 0 or filt != 0:
                raise NotImplementedError(
                    f"PNG depth={depth} interlace={inter} not supported (8-bit "
                    "non-interlaced only)")
            ch = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(ct)
            if ch is None:
                raise NotImplementedError(f"PNG color type {ct}")
        elif tag == b"PLTE":
            plte = np.frombuffer(body, np.uint8).reshape(-1, 3)
        elif tag == b"IDAT":
            idat.append(body)
        elif tag == b"IEND":
            break
        pos += 12 + ln
    if w is None or not idat:
        raise ValueError("missing IHDR/IDAT")
    raw = np.frombuffer(zlib.decompress(b"".join(idat)), np.uint8)
    stride = w * ch
    rows = raw[: h * (stride + 1)].reshape(h, stride + 1)
    ftype = rows[:, 0]
    data = rows[:, 1:]
    out = np.zeros((h, stride), np.uint8)
    for r in range(h):
        f = int(ftype[r])
        cur = data[r].astype(np.int32)
        up = out[r - 1].astype(np.int32) if r else np.zeros(stride, np.int32)
        if f == 0:
            rec = cur
        elif f == 2:  # Up
            rec = cur + up
        elif f == 1:  # Sub: recon[x] = raw[x] + recon[x-ch]  (mod 256)
            rec = np.cumsum(cur.reshape(-1, ch), axis=0).reshape(stride)
        elif f == 3:  # Average
            rec = np.empty(stride, np.int32)
            for x in range(stride):
                left = rec[x - ch] & 0xFF if x >= ch else 0
                rec[x] = cur[x] + ((left + up[x]) >> 1)
        elif f == 4:  # Paeth
            rec = np.empty(stride, np.int32)
            for x in range(stride):
                a = rec[x - ch] & 0xFF if x >= ch else 0
                c = up[x - ch] if x >= ch else 0
                b = up[x]
                p = a + b - c
                pa_, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa_ <= pb and pa_ <= pc) else (b if pb <= pc else c)
                rec[x] = cur[x] + pred
        else:
            raise ValueError(f"bad PNG filter {f}")
        out[r] = rec & 0xFF
    px = out.reshape(h, w, ch)
    if ct == 2:
        return px.copy()
    if ct == 0:
        return np.repeat(px, 3, axis=2)
    if ct == 3:
        if plte is None:
            raise ValueError("palette PNG without PLTE")
        return plte[px[:, :, 0]]
    if ct == 4:
        return np.repeat(px[:, :, :1], 3, axis=2)
    return px[:, :, :3].copy()  # ct == 6 (RGBA)


# --------------------------------------------------------------------
# dispatch
# --------------------------------------------------------------------

def decode_image(payload: bytes) -> np.ndarray:
    """(h, w, 3) uint8 RGB from BMP/PPM/PNG; codec formats that truly
    need an external library (JPEG) raise."""
    if payload[:2] == b"BM":
        return decode_bmp(payload)
    if payload[:2] == b"P6":
        return decode_ppm(payload)
    if payload[:8] == _PNG_SIG:
        return decode_png(payload)
    raise NotImplementedError(
        f"no codec for image magic {payload[:4]!r} in this environment "
        "(BMP, P6 PPM and 8-bit PNG decode natively)"
    )


def decode_audio(payload: bytes) -> tuple[int, np.ndarray]:
    if payload[:4] == b"RIFF":
        return decode_wav(payload)
    raise NotImplementedError(
        f"no codec for audio magic {payload[:4]!r} in this environment "
        "(RIFF PCM WAV decodes natively)"
    )
