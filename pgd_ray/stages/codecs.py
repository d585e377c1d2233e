"""Pure-numpy media codecs for the multimodal stages.

This container ships no image/audio libraries; everything here is
implemented against the public format specs:

* BMP  (uncompressed 24/32-bit BITMAPINFOHEADER)
* PPM  (binary P6, 8- and 16-bit)
* WAV  (RIFF PCM 8/16/24/32-bit, IEEE float32/64, EXTENSIBLE)
* PNG  (8/16-bit gray/RGB/palette/alpha, sequential or Adam7,
  stdlib zlib + numpy unfiltering)
* JPEG (baseline sequential AND progressive SOF2 decode, incl.
  grayscale, 4:2:2/4:2:0 subsampling and restart markers; baseline
  + scan-scripted progressive encoders)

``decode_image`` / ``decode_audio`` dispatch on magic bytes and raise
``NotImplementedError`` only for formats a pure-numpy sandbox
genuinely cannot cover (MP3/video codecs, JPEG arithmetic coding,
exotic BMP variants) — the "real decode" path stays honest.
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
    """BMP → (h, w, 3) uint8 RGB: uncompressed 8-bit-palette / 24 /
    32-bit BITMAPINFOHEADER (and later), RLE8-compressed 8-bit, and
    the OS/2 BITMAPCOREHEADER (12-byte, uint16 dims, 3-byte palette
    entries).  Anything else raises."""
    if payload[:2] != b"BM":
        raise ValueError("not a BMP")
    data_off = struct.unpack_from("<I", payload, 10)[0]
    hdr_size = struct.unpack_from("<I", payload, 14)[0]
    if hdr_size == 12:  # BITMAPCOREHEADER: uint16 dims, no compression
        w, h_signed = struct.unpack_from("<HH", payload, 18)
        bpp = struct.unpack_from("<H", payload, 24)[0]
        comp = 0
        pal_entry = 3
        pal_off = 14 + 12
    elif hdr_size >= 40:
        w, h_signed = struct.unpack_from("<ii", payload, 18)
        bpp = struct.unpack_from("<H", payload, 28)[0]
        comp = struct.unpack_from("<I", payload, 30)[0]
        pal_entry = 4
        pal_off = 14 + hdr_size
    else:
        raise NotImplementedError(f"BMP header size {hdr_size} not supported")
    if (comp, bpp) not in ((0, 8), (0, 24), (0, 32), (1, 8)):
        raise NotImplementedError(f"BMP compression={comp} bpp={bpp} not supported")
    h = abs(h_signed)
    if bpp == 8:
        # palette: stored BGR(X); index rows (raw or RLE8-decoded)
        pal = np.frombuffer(payload, np.uint8,
                            count=256 * pal_entry, offset=pal_off
                            ) if len(payload) >= pal_off + 256 * pal_entry \
            else np.frombuffer(payload[pal_off:data_off], np.uint8)
        pal = pal.reshape(-1, pal_entry)[:, 2::-1]  # BGR(X) → RGB
        if comp == 1:  # RLE8: (count, value) runs / escapes (0, n)
            idx = np.zeros((h, w), np.uint8)
            x = y = 0
            p = data_off
            while p + 1 < len(payload):
                c, v = payload[p], payload[p + 1]
                p += 2
                if c > 0:  # run
                    idx[y, x : x + c] = v
                    x += c
                elif v == 0:  # end of line
                    x, y = 0, y + 1
                elif v == 1:  # end of bitmap
                    break
                elif v == 2:  # delta jump
                    x += payload[p]
                    y += payload[p + 1]
                    p += 2
                else:  # absolute mode: v literal indices, word-aligned
                    idx[y, x : x + v] = np.frombuffer(
                        payload, np.uint8, count=v, offset=p)
                    x += v
                    p += v + (v & 1)
            rows = idx[:, :, None]
        else:
            stride = (w + 3) & ~3
            raw = np.frombuffer(payload, np.uint8, count=stride * h,
                                offset=data_off)
            rows = raw.reshape(h, stride)[:, :w, None]
        if h_signed > 0:  # bottom-up storage
            rows = rows[::-1]
        return pal[rows[:, :, 0]]
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
        # 16-bit samples are big-endian per the spec; rescale to the
        # uint8 contract with round-half-away (v·255/maxval)
        raw = np.frombuffer(payload, dtype=">u2", count=w * h * 3,
                            offset=pos).astype(np.float64)
        v = np.floor(raw * 255.0 / maxval + 0.5).astype(np.uint8)
        return v.reshape(h, w, 3)
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
    """RIFF WAV → (sample_rate, (n, channels) float32 in [-1, 1]).
    PCM 8/16/24/32-bit (fmt 1), IEEE float32/float64 (fmt 3), and
    WAVE_FORMAT_EXTENSIBLE (fmt 0xFFFE, resolved via the SubFormat
    GUID's leading tag) are decoded; anything else raises."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos = 12
    sr = ch = bits = None
    fmt_tag = None
    data = None
    while pos + 8 <= len(payload):
        cid, size = struct.unpack_from("<4sI", payload, pos)
        body = pos + 8
        if cid == b"fmt ":
            fmt_tag, ch, sr = struct.unpack_from("<HHI", payload, body)
            bits = struct.unpack_from("<H", payload, body + 14)[0]
            if fmt_tag == 0xFFFE and size >= 26:
                # EXTENSIBLE: the real format is the SubFormat GUID's
                # first two bytes (1 = PCM, 3 = IEEE float)
                fmt_tag = struct.unpack_from("<H", payload, body + 24)[0]
            if (fmt_tag, bits) not in ((1, 8), (1, 16), (1, 24),
                                       (1, 32), (3, 32), (3, 64)):
                raise NotImplementedError(
                    f"WAV format={fmt_tag} bits={bits} not supported")
        elif cid == b"data":
            data = payload[body : body + size]
        pos = body + size + (size & 1)
    if sr is None or data is None:
        raise ValueError("missing fmt/data chunk")
    if fmt_tag == 3:
        dt = "<f4" if bits == 32 else "<f8"
        arr = np.frombuffer(data, dtype=dt).astype(np.float32)
    elif bits == 16:
        arr = np.frombuffer(data, dtype="<i2").astype(np.float32) / 32768.0
    elif bits == 24:
        # 3-byte little-endian signed → sign-extended int32
        raw = np.frombuffer(data, dtype=np.uint8)
        raw = raw[: len(raw) // 3 * 3].reshape(-1, 3).astype(np.int64)
        v = raw[:, 0] | (raw[:, 1] << 8) | (raw[:, 2] << 16)
        v = np.where(v >= 1 << 23, v - (1 << 24), v)
        arr = v.astype(np.float32) / float(1 << 23)
    elif bits == 32:
        arr = np.frombuffer(data, dtype="<i4").astype(np.float32) \
            / float(1 << 31)
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


# Adam7 interlace pass geometry: (x0, y0, dx, dy) per pass
_ADAM7 = ((0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
          (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2))


def _png_unfilter(rows: np.ndarray, bpp: int) -> np.ndarray:
    """Filtered rows (h, 1 + stride) uint8 → reconstructed (h, stride)
    bytes.  All five row filters (None/Sub/Up/Average/Paeth); Sub is a
    per-row mod-256 cumsum, Up a vector add, Average/Paeth fall back
    to a per-byte row loop (the only sequential recurrences in the
    spec).  ``bpp`` is the filter unit in BYTES (channels × depth/8)."""
    h = rows.shape[0]
    stride = rows.shape[1] - 1
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
        elif f == 1:  # Sub: recon[x] = raw[x] + recon[x-bpp]  (mod 256)
            rec = np.cumsum(cur.reshape(-1, bpp), axis=0).reshape(stride)
        elif f == 3:  # Average
            rec = np.empty(stride, np.int32)
            for x in range(stride):
                left = rec[x - bpp] & 0xFF if x >= bpp else 0
                rec[x] = cur[x] + ((left + up[x]) >> 1)
        elif f == 4:  # Paeth
            rec = np.empty(stride, np.int32)
            for x in range(stride):
                a = rec[x - bpp] & 0xFF if x >= bpp else 0
                c = up[x - bpp] if x >= bpp else 0
                b = up[x]
                p = a + b - c
                pa_, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa_ <= pb and pa_ <= pc) else (b if pb <= pc else c)
                rec[x] = cur[x] + pred
        else:
            raise ValueError(f"bad PNG filter {f}")
        out[r] = rec & 0xFF
    return out


def _png_samples(rows: np.ndarray, pw: int, ch: int,
                 depth: int) -> np.ndarray:
    """Unfiltered row bytes (ph, stride) → sample array
    (ph, pw, ch, bytes-per-sample) uint8.  Sub-byte depths (1/2/4,
    single-channel only) unpack MSB-first within each byte."""
    ph = rows.shape[0]
    if depth == 16:
        return rows.reshape(ph, pw, ch, 2)
    if depth == 8:
        return rows.reshape(ph, pw, ch, 1)
    bits = np.unpackbits(rows, axis=1)
    vals = bits.reshape(ph, -1, depth)
    weights = (1 << np.arange(depth - 1, -1, -1)).astype(np.uint8)
    v = (vals * weights).sum(axis=2).astype(np.uint8)
    return v[:, :pw].reshape(ph, pw, 1, 1)


def decode_png(payload: bytes) -> np.ndarray:
    """PNG → (h, w, 3) uint8 RGB: 8/16-bit gray / RGB / palette /
    gray+alpha / RGBA plus 1/2/4-bit gray and palette, sequential OR
    Adam7-interlaced.  16-bit samples rescale to 8 bits by
    round(v·255/65535), sub-byte gray by exact bit replication
    (v·255/(2^d−1)); each Adam7 pass is unfiltered as its own
    sub-image (its rows' left/up neighbors are pass-local, per the
    spec) and scattered into place."""
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
            if depth not in (1, 2, 4, 8, 16) or inter not in (0, 1) \
                    or comp != 0 or filt != 0:
                raise NotImplementedError(
                    f"PNG depth={depth} interlace={inter} not supported")
            ch = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(ct)
            if ch is None:
                raise NotImplementedError(f"PNG color type {ct}")
            if depth < 8 and ct not in (0, 3):
                raise ValueError(f"PNG color type {ct} cannot be {depth}-bit")
            if ct == 3 and depth == 16:
                raise ValueError("palette PNG cannot be 16-bit")
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
    nb = max(1, depth // 8)
    bpp = max(1, ch * depth // 8)  # filter unit in bytes
    if inter == 0:
        stride = (w * ch * depth + 7) // 8
        rows = raw[: h * (stride + 1)].reshape(h, stride + 1)
        samples = _png_samples(_png_unfilter(rows, bpp), w, ch, depth)
    else:
        samples = np.zeros((h, w, ch, nb), np.uint8)
        off = 0
        for x0, y0, dx, dy in _ADAM7:
            pw = (w - x0 + dx - 1) // dx
            ph = (h - y0 + dy - 1) // dy
            if pw <= 0 or ph <= 0:
                continue
            stride = (pw * ch * depth + 7) // 8
            rows = raw[off : off + ph * (stride + 1)].reshape(
                ph, stride + 1)
            off += ph * (stride + 1)
            samples[y0::dy, x0::dx] = _png_samples(
                _png_unfilter(rows, bpp), pw, ch, depth)
    if depth < 8:
        px = samples[:, :, :, 0]
        if ct == 0:  # exact bit replication to 8 bits
            px = (px.astype(np.uint16)
                  * (255 // ((1 << depth) - 1))).astype(np.uint8)
    elif nb == 1:
        px = samples[:, :, :, 0]
    else:
        v = (samples[:, :, :, 0].astype(np.uint32) << 8) \
            | samples[:, :, :, 1]
        px = np.floor(v.astype(np.float64) * 255.0 / 65535.0
                      + 0.5).astype(np.uint8)
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
# JPEG — baseline sequential DCT (ITU T.81), pure numpy (round 4).
# The DECODER takes its Huffman/quant tables from the stream's own
# DHT/DQT segments, so it reads real-world baseline files (including
# Annex-K-table encoders); grayscale and up-to-2×2 subsampled YCbCr
# (4:4:4 / 4:2:2 / 4:2:0), restart markers included.  Progressive
# (SOF2) decodes too (round 5); arithmetic coding raises honestly.
# The ENCODER (the test/writer side) emits 4:4:4 or grayscale with
# canonical per-image Huffman tables built from the actual symbol
# stream — valid JPEG without relying on memorized spec tables.
# --------------------------------------------------------------------

def _zigzag_order() -> np.ndarray:
    """8×8 zigzag scan order, generated (not transcribed)."""
    idx = np.empty(64, dtype=np.int64)
    k = 0
    for s in range(15):
        rng = range(s + 1)
        for i in (rng if s % 2 else reversed(rng)):
            r, c = i, s - i
            if r < 8 and c < 8:
                idx[k] = r * 8 + c
                k += 1
    return idx


_ZZ = _zigzag_order()
_IDCT_A = None


def _dct_matrix() -> np.ndarray:
    global _IDCT_A
    if _IDCT_A is None:
        u = np.arange(8).reshape(8, 1)
        x = np.arange(8).reshape(1, 8)
        A = 0.5 * np.cos((2 * x + 1) * u * np.pi / 16)
        A[0] /= np.sqrt(2.0)
        _IDCT_A = A
    return _IDCT_A


_JPEG_QL = np.array([  # luminance base quant (written to DQT; any
    16, 11, 10, 16, 24, 40, 51, 61,      # valid table round-trips)
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99], dtype=np.int64)
_JPEG_QC = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99], dtype=np.int64)


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def put(self, code: int, length: int):
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            b = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self):
        if self.nbits:
            pad = 8 - self.nbits
            self.put((1 << pad) - 1, pad)  # 1-fill per spec


class _BitReader:
    def __init__(self, data: bytes):
        self.d = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def _fill(self):
        b = self.d[self.pos]
        self.pos += 1
        if b == 0xFF:
            nxt = self.d[self.pos] if self.pos < len(self.d) else 0
            if nxt == 0x00:
                self.pos += 1  # stuffed
            # restart markers are handled OUTSIDE via align()
        self.acc = (self.acc << 8) | b
        self.nbits += 8

    def bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v

    def align(self):
        self.nbits = 0
        self.acc = 0


def _canonical_codes(lengths: dict[int, int]) -> dict[int, tuple[int, int]]:
    """symbol → (code, length) from per-symbol code lengths, canonical
    (JPEG DHT) order: by length then symbol value."""
    code, last_len = 0, 0
    out = {}
    for sym, ln in sorted(lengths.items(), key=lambda kv: (kv[1], kv[0])):
        code <<= (ln - last_len)
        out[sym] = (code, ln)
        code += 1
        last_len = ln
    return out


def _build_table(symbols: list[int]) -> tuple[bytes, bytes, dict]:
    """Uniform-length canonical Huffman table over the distinct symbols
    actually used (valid as long as count ≤ 2^L − 1, reserving the
    all-ones code).  Returns (BITS[16], HUFFVAL, symbol→(code,len))."""
    uniq = sorted(set(symbols)) or [0]
    L = 1
    while (1 << L) - 1 < len(uniq):
        L += 1
    bits = bytearray(16)
    bits[L - 1] = len(uniq)
    lengths = {s: L for s in uniq}
    return bytes(bits), bytes(uniq), _canonical_codes(lengths)


def _cat(v: int) -> int:
    return int(v).bit_length() if v > 0 else int(-v).bit_length()


def _block_symbols(coef_zz: np.ndarray, dc_pred: int):
    """(dc_symbol, dc_bits, [(ac_symbol, ac_bits, size), ...], new_pred)
    for one zigzagged quantized block."""
    dc = int(coef_zz[0])
    diff = dc - dc_pred
    s = _cat(diff)
    dcb = diff if diff >= 0 else diff + (1 << s) - 1
    acs = []
    run = 0
    nz = np.flatnonzero(coef_zz[1:])
    lastnz = (nz[-1] + 1) if len(nz) else 0
    for k in range(1, lastnz + 1):
        v = int(coef_zz[k])
        if v == 0:
            run += 1
            if run == 16:
                acs.append((0xF0, 0, 0))  # ZRL
                run = 0
            continue
        sz = _cat(v)
        vb = v if v >= 0 else v + (1 << sz) - 1
        acs.append(((run << 4) | sz, vb, sz))
        run = 0
    if lastnz < 63:
        acs.append((0x00, 0, 0))  # EOB
    return (s, dcb), acs, dc


def encode_jpeg_baseline(pixels: np.ndarray, quality: int = 85,
                         subsampling: str = "444",
                         restart_interval: int = 0) -> bytes:
    """(h, w, 3) uint8 RGB or (h, w) grayscale → baseline JFIF bytes
    with per-image canonical Huffman tables.  ``subsampling``:
    '444' (1×1 chroma) or '420' (2×2 luma MCU, box-averaged chroma).
    ``restart_interval`` > 0 emits a DRI segment and an RSTn marker
    every that many MCUs (DC predictors reset)."""
    gray = pixels.ndim == 2
    h, w = pixels.shape[:2]
    q = max(1, min(100, int(quality)))
    scale = 5000 // q if q < 50 else 200 - 2 * q
    qt_l = np.clip((_JPEG_QL * scale + 50) // 100, 1, 255)
    qt_c = np.clip((_JPEG_QC * scale + 50) // 100, 1, 255)
    if gray:
        planes = [pixels.astype(np.float64)]
        samp = [(1, 1)]
        ncomp = 1
    else:
        p = pixels.astype(np.float64)
        r, g, b = p[:, :, 0], p[:, :, 1], p[:, :, 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        ncomp = 3
        if subsampling == "420":
            # pad to even, box-average 2×2 for chroma
            he, we = h + (h & 1), w + (w & 1)
            pads = []
            for pl in (y, cb, cr):
                pp = np.empty((he, we), np.float64)
                pp[:h, :w] = pl
                pp[h:, :w] = pl[h - 1 :, :]
                pp[:, w:] = pp[:, w - 1 : w]
                pads.append(pp)
            y = pads[0][:h, :w]
            cb = 0.25 * (pads[1][0::2, 0::2] + pads[1][1::2, 0::2]
                         + pads[1][0::2, 1::2] + pads[1][1::2, 1::2])
            cr = 0.25 * (pads[2][0::2, 0::2] + pads[2][1::2, 0::2]
                         + pads[2][0::2, 1::2] + pads[2][1::2, 1::2])
            planes = [y, cb, cr]
            samp = [(2, 2), (1, 1), (1, 1)]
        elif subsampling == "444":
            planes = [y, cb, cr]
            samp = [(1, 1)] * 3
        else:
            raise ValueError(f"subsampling {subsampling!r}")
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    A = _dct_matrix()
    qts = [qt_l, qt_c]
    # pad each plane to its MCU grid
    padded = []
    for pl, (hf, vf) in zip(planes, samp):
        ph, pw = mcuy * vf * 8, mcux * hf * 8
        pp = np.empty((ph, pw), np.float64)
        sh, sw = pl.shape
        pp[:sh, :sw] = pl
        if ph > sh:
            pp[sh:, :sw] = pl[sh - 1 :, :]
        if pw > sw:
            pp[:, sw:] = pp[:, sw - 1 : sw]
        padded.append(pp)

    def zz_block(pl: np.ndarray, by: int, bx: int, tid: int) -> np.ndarray:
        blk = pl[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] - 128.0
        F = A @ blk @ A.T
        # zigzag coefficient k sits at natural position _ZZ[k], so its
        # divisor is the natural-order table at _ZZ
        return np.rint(F.flatten()[_ZZ]
                       / qts[tid][_ZZ].astype(np.float64)).astype(np.int64)

    # interleaved MCU scan order, symbols per (dc/ac, luma/chroma) class
    dc_syms: list[list[int]] = [[], []]
    ac_syms: list[list[int]] = [[], []]
    preds = [0] * ncomp
    enc_plan = []
    mcu_i = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_i and \
                    mcu_i % restart_interval == 0:
                enc_plan.append(("RST", (mcu_i // restart_interval - 1) % 8))
                preds = [0] * ncomp  # DC predictors reset at RSTn
            mcu_i += 1
            for c in range(ncomp):
                hf, vf = samp[c]
                tid = min(c, 1)
                for byy in range(vf):
                    for bxx in range(hf):
                        zz = zz_block(padded[c], my * vf + byy,
                                      mx * hf + bxx, tid)
                        (s, dcb), acs, preds[c] = _block_symbols(
                            zz, preds[c])
                        dc_syms[tid].append(s)
                        ac_syms[tid].extend(a[0] for a in acs)
                        enc_plan.append((tid, s, dcb, acs))
    ntab = 1 if ncomp == 1 else 2
    dct_tabs = [_build_table(dc_syms[t]) for t in range(ntab)]
    act_tabs = [_build_table(ac_syms[t]) for t in range(ntab)]

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">HH", marker, len(body) + 2) + body

    out = bytearray(b"\xff\xd8")
    out += seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += seg(0xFFDB, b"\x00" + bytes(int(qt_l[_ZZ][i]) for i in range(64)))
    if ncomp == 3:
        out += seg(0xFFDB, b"\x01" + bytes(int(qt_c[_ZZ][i])
                                           for i in range(64)))
    comp_spec = b"".join(
        struct.pack("BBB", c + 1, (samp[c][0] << 4) | samp[c][1],
                    min(c, 1))
        for c in range(ncomp))
    out += seg(0xFFC0, struct.pack(">BHHB", 8, h, w, ncomp) + comp_spec)
    for t in range(ntab):
        out += seg(0xFFC4, bytes([t]) + dct_tabs[t][0] + dct_tabs[t][1])
        out += seg(0xFFC4, bytes([0x10 | t]) + act_tabs[t][0]
                   + act_tabs[t][1])
    if restart_interval:
        out += seg(0xFFDD, struct.pack(">H", restart_interval))
    out += seg(0xFFDA, bytes([ncomp]) + b"".join(
        struct.pack("BB", c + 1, (min(c, 1) << 4) | min(c, 1))
        for c in range(ncomp)) + b"\x00\x3f\x00")
    bwr = _BitWriter()
    for item in enc_plan:
        if item[0] == "RST":
            bwr.flush()  # byte-align (1-fill), then the bare marker
            out += bwr.out
            out += bytes([0xFF, 0xD0 + item[1]])
            bwr = _BitWriter()
            continue
        tid, s, dcb, acs = item
        code, ln = dct_tabs[tid][2][s]
        bwr.put(code, ln)
        if s:
            bwr.put(dcb, s)
        for sym, vb, sz in acs:
            code, ln = act_tabs[tid][2][sym]
            bwr.put(code, ln)
            if sz:
                bwr.put(vb, sz)
    bwr.flush()
    out += bwr.out
    out += b"\xff\xd9"
    return bytes(out)


def _jpeg_coef_arrays(pixels: np.ndarray, quality: int,
                      subsampling: str):
    """Quantized zigzag DCT coefficient arrays (BY, BX, 64) int64 per
    component on the MCU-padded grid, plus frame metadata — the shared
    front half of the encoders, vectorized over all blocks (einsum
    DCT).  Identical numbers to encode_jpeg_baseline's per-block
    path."""
    gray = pixels.ndim == 2
    h, w = pixels.shape[:2]
    q = max(1, min(100, int(quality)))
    scale = 5000 // q if q < 50 else 200 - 2 * q
    qt_l = np.clip((_JPEG_QL * scale + 50) // 100, 1, 255)
    qt_c = np.clip((_JPEG_QC * scale + 50) // 100, 1, 255)
    if gray:
        planes = [pixels.astype(np.float64)]
        samp = [(1, 1)]
        ncomp = 1
    else:
        p = pixels.astype(np.float64)
        r, g, b = p[:, :, 0], p[:, :, 1], p[:, :, 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        ncomp = 3
        if subsampling == "420":
            he, we = h + (h & 1), w + (w & 1)
            pads = []
            for pl in (y, cb, cr):
                pp = np.empty((he, we), np.float64)
                pp[:h, :w] = pl
                pp[h:, :w] = pl[h - 1 :, :]
                pp[:, w:] = pp[:, w - 1 : w]
                pads.append(pp)
            y = pads[0][:h, :w]
            cb = 0.25 * (pads[1][0::2, 0::2] + pads[1][1::2, 0::2]
                         + pads[1][0::2, 1::2] + pads[1][1::2, 1::2])
            cr = 0.25 * (pads[2][0::2, 0::2] + pads[2][1::2, 0::2]
                         + pads[2][0::2, 1::2] + pads[2][1::2, 1::2])
            planes = [y, cb, cr]
            samp = [(2, 2), (1, 1), (1, 1)]
        elif subsampling == "444":
            planes = [y, cb, cr]
            samp = [(1, 1)] * 3
        else:
            raise ValueError(f"subsampling {subsampling!r}")
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    A = _dct_matrix()
    qts = [qt_l, qt_c]
    coefs = []
    for c, (pl, (hf, vf)) in enumerate(zip(planes, samp)):
        ph, pw = mcuy * vf * 8, mcux * hf * 8
        pp = np.empty((ph, pw), np.float64)
        sh, sw = pl.shape
        pp[:sh, :sw] = pl
        if ph > sh:
            pp[sh:, :sw] = pl[sh - 1 :, :]
        if pw > sw:
            pp[:, sw:] = pp[:, sw - 1 : sw]
        by, bx = ph // 8, pw // 8
        b8 = (pp - 128.0).reshape(by, 8, bx, 8).transpose(0, 2, 1, 3)
        F = np.einsum("ik,yxkl,jl->yxij", A, b8, A)
        zz = np.rint(
            F.reshape(by, bx, 64)[:, :, _ZZ]
            / qts[min(c, 1)][_ZZ].astype(np.float64)).astype(np.int64)
        coefs.append(zz)
    return coefs, samp, ncomp, qt_l, qt_c, h, w, mcux, mcuy


def encode_jpeg_progressive(pixels: np.ndarray, quality: int = 85,
                            subsampling: str = "444",
                            restart_interval: int = 0) -> bytes:
    """(h, w, 3) uint8 RGB or (h, w) grayscale → progressive (SOF2)
    JFIF bytes.  The scan script exercises every progressive decode
    shape: an interleaved DC-first scan at Al=1, per-component
    spectral-selection AC-first scans at nonzero Al, AC
    successive-approximation refinement scans (correction bits + EOB
    runs, JPEG G.1.2.2), and a DC refinement scan.  Per-scan canonical
    Huffman tables are emitted as DHT segments immediately before each
    SOS (also exercising the decoder's between-scan table updates).
    ``restart_interval`` > 0 emits a DRI segment and RSTn markers
    every that many MCUs (interleaved scans) / blocks (single-
    component scans); DC predictors and EOB runs reset at each marker
    per the standard.  Coefficients are identical to
    encode_jpeg_baseline at the same quality/subsampling, so
    decode(progressive) == decode(baseline) exactly."""
    coefs, samp, ncomp, qt_l, qt_c, h, w, mcux, mcuy = \
        _jpeg_coef_arrays(pixels, quality, subsampling)
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    ndims = []
    for hf, vf in samp:
        cw = -(-(w * hf) // hmax)
        ch = -(-(h * vf) // vmax)
        ndims.append((-(-ch // 8), -(-cw // 8)))

    if ncomp == 1:
        script = [([0], 0, 0, 0, 1), ([0], 1, 5, 0, 2),
                  ([0], 6, 63, 0, 2), ([0], 1, 63, 2, 1),
                  ([0], 0, 0, 1, 0), ([0], 1, 63, 1, 0)]
    else:
        script = [([0, 1, 2], 0, 0, 0, 1), ([0], 1, 5, 0, 2),
                  ([2], 1, 63, 0, 1), ([1], 1, 63, 0, 1),
                  ([0], 6, 63, 0, 2), ([0], 1, 63, 2, 1),
                  ([0, 1, 2], 0, 0, 1, 0), ([0], 1, 63, 1, 0),
                  ([2], 1, 63, 1, 0), ([1], 1, 63, 1, 0)]

    ri = int(restart_interval)

    def dc_units(scomps):
        """Blocks grouped per MCU — the restart-counting unit for
        interleaved scans."""
        for my in range(mcuy):
            for mx in range(mcux):
                blocks = []
                for c in scomps:
                    hf, vf = samp[c]
                    for byy in range(vf):
                        for bxx in range(hf):
                            blocks.append((c, my * vf + byy,
                                           mx * hf + bxx))
                yield blocks

    def plan_scan(scomps, ss, se, ah, al):
        """(ops, used_tables): ops are ('s', tkey, sym, extra, nbits)
        Huffman items, ('b', val, nbits) raw bits, and ('r',) restart
        boundaries."""
        ops: list = []
        used: set = set()
        if ss == 0:  # DC scan (interleaved when len(scomps) > 1)
            preds = {c: 0 for c in scomps}
            for ui, blocks in enumerate(dc_units(scomps)):
                if ri and ui and ui % ri == 0:
                    ops.append(("r",))
                    preds = {c: 0 for c in scomps}
                for c, by, bx in blocks:
                    if ah == 0:
                        v = int(coefs[c][by, bx, 0]) >> al
                        diff = v - preds[c]
                        preds[c] = v
                        s = _cat(diff)
                        vb = diff if diff >= 0 else diff + (1 << s) - 1
                        tkey = (0, min(c, 1))
                        used.add(tkey)
                        ops.append(("s", tkey, s, vb, s))
                    else:
                        ops.append(
                            ("b", (int(coefs[c][by, bx, 0]) >> al) & 1,
                             1))
            return ops, used
        # AC scans are single-component, raster over the component's
        # own (non-interleaved) block grid
        (c,) = scomps
        tkey = (1, min(c, 1))
        used.add(tkey)
        bh, bw = ndims[c]
        eobrun = 0
        pend: list[int] = []  # correction bits of completed EOB blocks

        def flush_eob():
            nonlocal eobrun, pend
            if eobrun:
                r = eobrun.bit_length() - 1
                ops.append(("s", tkey, r << 4, eobrun - (1 << r), r))
                eobrun = 0
                for bit in pend:
                    ops.append(("b", bit, 1))
                pend = []

        ui = 0

        def maybe_restart():
            nonlocal ui
            if ri and ui and ui % ri == 0:
                flush_eob()  # EOB runs cannot cross a restart
                ops.append(("r",))
            ui += 1

        if ah == 0:  # AC first (values scaled down by 2^al)
            for by in range(bh):
                for bx in range(bw):
                    maybe_restart()
                    band = coefs[c][by, bx, ss : se + 1]
                    tv = np.sign(band) * (np.abs(band) >> al)
                    if not tv.any():
                        eobrun += 1
                        if eobrun == 0x7FFF:
                            flush_eob()
                        continue
                    flush_eob()
                    run = 0
                    last = int(np.flatnonzero(tv)[-1])
                    for idx in range(last + 1):
                        x = int(tv[idx])
                        if x == 0:
                            run += 1
                            continue
                        while run > 15:
                            ops.append(("s", tkey, 0xF0, 0, 0))
                            run -= 16
                        s = _cat(x)
                        vb = x if x > 0 else x + (1 << s) - 1
                        ops.append(("s", tkey, (run << 4) | s, vb, s))
                        run = 0
                    if last < len(tv) - 1:
                        eobrun += 1
                        if eobrun == 0x7FFF:
                            flush_eob()
            flush_eob()
            return ops, used
        # AC refinement (JPEG G.1.2.3): one correction bit per
        # previously-nonzero coefficient, (run, 1) symbols appoint
        # newly-significant ones, trailing zeros fold into EOB runs
        for by in range(bh):
            for bx in range(bw):
                maybe_restart()
                band = coefs[c][by, bx, ss : se + 1]
                absv = np.abs(band) >> al
                newly = np.flatnonzero(absv == 1)
                eobpos = int(newly[-1]) if len(newly) else -1
                run = 0
                br: list[int] = []  # bits since last symbol, this block
                for idx in range(len(band)):
                    a = int(absv[idx])
                    if a == 0:
                        run += 1
                        continue
                    while run > 15 and idx <= eobpos:
                        flush_eob()
                        ops.append(("s", tkey, 0xF0, 0, 0))
                        run -= 16
                        for bit in br:
                            ops.append(("b", bit, 1))
                        br = []
                    if a > 1:
                        br.append(a & 1)
                        continue
                    flush_eob()
                    ops.append(("s", tkey, (run << 4) | 1, 0, 0))
                    ops.append(("b", 1 if int(band[idx]) > 0 else 0, 1))
                    for bit in br:
                        ops.append(("b", bit, 1))
                    br = []
                    run = 0
                if run > 0 or br:
                    eobrun += 1
                    pend.extend(br)
                    if eobrun == 0x7FFF or len(pend) > 930:
                        flush_eob()
        flush_eob()
        return ops, used

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">HH", marker, len(body) + 2) + body

    out = bytearray(b"\xff\xd8")
    out += seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += seg(0xFFDB, b"\x00" + bytes(int(qt_l[_ZZ][i]) for i in range(64)))
    if ncomp == 3:
        out += seg(0xFFDB, b"\x01" + bytes(int(qt_c[_ZZ][i])
                                           for i in range(64)))
    comp_spec = b"".join(
        struct.pack("BBB", c + 1, (samp[c][0] << 4) | samp[c][1],
                    min(c, 1))
        for c in range(ncomp))
    out += seg(0xFFC2, struct.pack(">BHHB", 8, h, w, ncomp) + comp_spec)
    if ri:
        out += seg(0xFFDD, struct.pack(">H", ri))
    for scomps, ss, se, ah, al in script:
        ops, used = plan_scan(scomps, ss, se, ah, al)
        tables = {}
        for tkey in sorted(used):
            syms = [op[2] for op in ops
                    if op[0] == "s" and op[1] == tkey]
            bits, vals, codes = _build_table(syms)
            tables[tkey] = codes
            out += seg(0xFFC4, bytes([(tkey[0] << 4) | tkey[1]])
                       + bits + vals)
        out += seg(0xFFDA, bytes([len(scomps)]) + b"".join(
            struct.pack("BB", c + 1,
                        (min(c, 1) << 4) | min(c, 1))
            for c in scomps) + bytes([ss, se, (ah << 4) | al]))
        bwr = _BitWriter()
        rst = 0
        for op in ops:
            if op[0] == "s":
                _, tkey, sym, extra, nbits = op
                code, ln = tables[tkey][sym]
                bwr.put(code, ln)
                if nbits:
                    bwr.put(extra, nbits)
            elif op[0] == "r":
                bwr.flush()  # byte-align (1-fill), then the marker
                out += bwr.out
                out += bytes([0xFF, 0xD0 + rst % 8])
                rst += 1
                bwr = _BitWriter()
            else:
                bwr.put(op[1], op[2])
        bwr.flush()
        out += bwr.out
    out += b"\xff\xd9"
    return bytes(out)


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Sequential (SOF0/1) and progressive (SOF2) JFIF → (h, w, 3)
    uint8 RGB.  Huffman and quant tables come from the stream
    (DHT/DQT, updated between progressive scans); grayscale and
    sampling factors up to 2×2 supported; DRI restart markers handled.
    Progressive streams decode all spectral-selection and
    successive-approximation scan shapes (DC first/refine, AC
    first/refine with EOB runs) into per-block coefficient arrays,
    then share the sequential path's dequant + IDCT + upsample
    finalization.

    Subsampled chroma (4:2:0 / 4:2:2) is upsampled NEAREST-NEIGHBOR
    (``np.repeat``), matching this module's encoder (box-average
    downsampling), so encode→decode round-trips are exact — but
    libjpeg's "fancy" (triangular) upsampling differs slightly, so
    pixel-level comparisons against libjpeg-decoded output of
    externally produced subsampled files are NOT expected to match
    bit-for-bit (ADVICE r4)."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}
    comps = []  # (id, hf, vf, qid)
    h = w = None
    restart = 0
    scan = None
    scan_spec = None
    progressive = False
    pscans: list[dict] = []
    while pos + 4 <= len(payload):
        if payload[pos] != 0xFF:
            pos += 1
            continue
        marker = payload[pos + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        if marker == 0xD9:
            break
        ln = struct.unpack_from(">H", payload, pos + 2)[0]
        body = payload[pos + 4 : pos + 2 + ln]
        if marker == 0xDB:
            b = 0
            while b < len(body):
                pq, tq = body[b] >> 4, body[b] & 0xF
                if pq == 0:
                    tab = np.frombuffer(body[b + 1 : b + 65],
                                        np.uint8).astype(np.int64)
                    b += 65
                else:
                    tab = np.frombuffer(body[b + 1 : b + 129],
                                        ">u2").astype(np.int64)
                    b += 129
                dz = np.empty(64, np.int64)
                dz[_ZZ] = tab
                qt[tq] = dz
        elif marker == 0xC4:
            b = 0
            while b < len(body):
                tc, th = body[b] >> 4, body[b] & 0xF
                bits = body[b + 1 : b + 17]
                nsym = sum(bits)
                vals = body[b + 17 : b + 17 + nsym]
                lengths = {}
                vi = 0
                for L in range(1, 17):
                    for _ in range(bits[L - 1]):
                        lengths[vals[vi]] = L
                        vi += 1
                codes = _canonical_codes(
                    {s: ln2 for s, ln2 in lengths.items()})
                # decode map: (length, code) -> symbol
                huff[(tc, th)] = {(ln2, c): s
                                  for s, (c, ln2) in codes.items()}
                b += 17 + nsym
        elif marker in (0xC0, 0xC1, 0xC2):
            _, h, w, nc = struct.unpack_from(">BHHB", body, 0)
            comps = [(body[6 + 3 * i], body[7 + 3 * i] >> 4,
                      body[7 + 3 * i] & 0xF, body[8 + 3 * i])
                     for i in range(nc)]
            progressive = marker == 0xC2
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                        0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"JPEG SOF{marker - 0xC0} not supported (baseline "
                "sequential and progressive only)")
        elif marker == 0xDD:
            restart = struct.unpack_from(">H", body, 0)[0]
        elif marker == 0xDA:
            ns = body[0]
            scan_spec = {body[1 + 2 * i]: (body[2 + 2 * i] >> 4,
                                           body[2 + 2 * i] & 0xF)
                         for i in range(ns)}
            if not progressive:
                scan = payload[pos + 2 + ln :]
                break
            # progressive: slice this scan's entropy bytes (up to the
            # next non-RST, non-stuffing marker), snapshot the current
            # Huffman tables (DHT may redefine them between scans),
            # and keep walking the marker stream
            order = [body[1 + 2 * i] for i in range(ns)]
            ss, se = body[1 + 2 * ns], body[2 + 2 * ns]
            ahal = body[3 + 2 * ns]
            p = pos + 2 + ln
            q = p
            while q + 1 < len(payload):
                if payload[q] == 0xFF and payload[q + 1] != 0x00 \
                        and not (0xD0 <= payload[q + 1] <= 0xD7):
                    break
                q += 1
            else:
                q = len(payload)
            pscans.append({
                "order": order, "spec": dict(scan_spec),
                "ss": ss, "se": se, "ah": ahal >> 4, "al": ahal & 0xF,
                "data": payload[p:q], "huff": dict(huff),
                "restart": restart,
            })
            pos = q
            continue
        pos += 2 + ln
    if progressive:
        if h is None or not pscans:
            raise ValueError("missing SOF/SOS")
        return _decode_jpeg_progressive(h, w, comps, qt, pscans)
    if h is None or scan is None:
        raise ValueError("missing SOF/SOS")
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mw, mh = 8 * hmax, 8 * vmax
    mcux, mcuy = -(-w // mw), -(-h // mh)
    A = _dct_matrix()
    planes = {}
    for cid, hf, vf, qid in comps:
        planes[cid] = np.zeros((mcuy * vf * 8, mcux * hf * 8), np.float64)
    rdr = _BitReader(scan)
    preds = {c[0]: 0 for c in comps}

    def read_sym(table: dict) -> int:
        code, ln2 = 0, 0
        for _ in range(16):
            code = (code << 1) | rdr.bit()
            ln2 += 1
            s = table.get((ln2, code))
            if s is not None:
                return s
        raise ValueError("bad Huffman code")

    def extend(v: int, sz: int) -> int:
        return v if v >= (1 << (sz - 1)) else v - (1 << sz) + 1

    mcu_i = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart and mcu_i and mcu_i % restart == 0:
                rdr.align()
                # skip the RSTn marker.  The bit reader may already
                # have PREFETCHED the marker's 0xFF as padding (its
                # byte-fill peeks one ahead only for 0x00 stuffing),
                # leaving pos ON the D0-D7 byte — handle that case
                # before scanning forward.
                p = rdr.pos
                if p and rdr.d[p - 1] == 0xFF and p < len(rdr.d) \
                        and 0xD0 <= rdr.d[p] <= 0xD7:
                    rdr.pos = p + 1
                else:
                    while rdr.pos + 1 < len(rdr.d) and not (
                            rdr.d[rdr.pos] == 0xFF
                            and 0xD0 <= rdr.d[rdr.pos + 1] <= 0xD7):
                        rdr.pos += 1
                    rdr.pos += 2
                for k in preds:
                    preds[k] = 0
            mcu_i += 1
            for cid, hf, vf, qid in comps:
                td, ta = scan_spec[cid]
                for byy in range(vf):
                    for bxx in range(hf):
                        zz = np.zeros(64, np.int64)
                        s = read_sym(huff[(0, td)])
                        diff = extend(rdr.bits(s), s) if s else 0
                        preds[cid] += diff
                        zz[0] = preds[cid]
                        k = 1
                        while k < 64:
                            rs = read_sym(huff[(1, ta)])
                            r, sz = rs >> 4, rs & 0xF
                            if sz == 0:
                                if r == 15:
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise ValueError("AC run overflow")
                            zz[k] = extend(rdr.bits(sz), sz)
                            k += 1
                        coef = np.zeros(64, np.float64)
                        coef[_ZZ] = zz * qt[qid][_ZZ]
                        blk = A.T @ coef.reshape(8, 8) @ A + 128.0
                        py = (my * vf + byy) * 8
                        px = (mx * hf + bxx) * 8
                        planes[cid][py : py + 8, px : px + 8] = blk
    return _jpeg_finalize(planes, comps, h, w, hmax, vmax)


def _jpeg_finalize(planes: dict, comps, h: int, w: int,
                   hmax: int, vmax: int) -> np.ndarray:
    """Upsample component planes to full resolution (nearest-neighbor,
    see decode_jpeg docstring) and convert YCbCr→RGB — shared by the
    sequential and progressive paths."""
    full = []
    for cid, hf, vf, qid in comps:
        pl = planes[cid]
        pl = np.repeat(np.repeat(pl, vmax // vf, axis=0),
                       hmax // hf, axis=1)
        full.append(pl[:h, :w])
    if len(full) == 1:
        yv = np.clip(np.rint(full[0]), 0, 255).astype(np.uint8)
        return np.repeat(yv[:, :, None], 3, axis=2)
    y, cb, cr = full[0], full[1] - 128.0, full[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.clip(np.rint(np.stack([r, g, b], axis=2)), 0,
                   255).astype(np.uint8)


def _jpeg_extend(v: int, sz: int) -> int:
    """JPEG F.12 EXTEND: sz-bit magnitude v → signed value."""
    return v if v >= (1 << (sz - 1)) else v - (1 << sz) + 1


def _decode_jpeg_progressive(h: int, w: int, comps, qt: dict,
                             pscans: list[dict]) -> np.ndarray:
    """Progressive (SOF2) scan sequence → pixels.  Every scan refines
    a per-block zigzag coefficient array (int64); spectral selection
    picks the band [Ss, Se], successive approximation the bit plane
    (Ah = previously-coded precision, Al = this scan's).  Multi-
    component scans (DC only, per the standard) traverse MCUs
    interleaved; single-component scans traverse the component's own
    block raster (which is SMALLER than its MCU-padded grid when
    sampling factors pad the frame).  After the last scan the
    coefficients run through the same dequant + IDCT + upsample tail
    as the sequential decoder."""
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux, mcuy = -(-w // (8 * hmax)), -(-h // (8 * vmax))
    info = {c[0]: c for c in comps}
    coef = {cid: np.zeros((mcuy * vf, mcux * hf, 64), np.int64)
            for cid, hf, vf, qid in comps}
    ndims = {}
    for cid, hf, vf, qid in comps:
        cw = -(-(w * hf) // hmax)
        ch = -(-(h * vf) // vmax)
        ndims[cid] = (-(-ch // 8), -(-cw // 8))

    for sc in pscans:
        rdr = _BitReader(sc["data"])
        huff = sc["huff"]
        ss, se, ah, al = sc["ss"], sc["se"], sc["ah"], sc["al"]
        restart = sc["restart"]

        def read_sym(table: dict) -> int:
            code, ln2 = 0, 0
            for _ in range(16):
                code = (code << 1) | rdr.bit()
                ln2 += 1
                s = table.get((ln2, code))
                if s is not None:
                    return s
            raise ValueError("bad Huffman code")

        preds = {cid: 0 for cid in sc["order"]}
        eobrun = 0

        def dec_dc_first(blk, cid):
            td = huff[(0, sc["spec"][cid][0])]
            s = read_sym(td)
            diff = _jpeg_extend(rdr.bits(s), s) if s else 0
            preds[cid] += diff
            blk[0] = preds[cid] << al

        def dec_dc_refine(blk):
            if rdr.bit():
                blk[0] |= 1 << al

        def dec_ac_first(blk, ta):
            nonlocal eobrun
            if eobrun > 0:
                eobrun -= 1
                return
            k = ss
            while k <= se:
                rs = read_sym(ta)
                r, s = rs >> 4, rs & 0xF
                if s == 0:
                    if r == 15:
                        k += 16
                        continue
                    eobrun = (1 << r) - 1
                    if r:
                        eobrun += rdr.bits(r)
                    break
                k += r
                if k > se:
                    raise ValueError("AC run overflow")
                blk[k] = _jpeg_extend(rdr.bits(s), s) << al
                k += 1

        def dec_ac_refine(blk, ta):
            # JPEG G.1.2.3 successive-approximation AC refinement:
            # every nonzero-history coefficient traversed gets one
            # correction bit; zero-history coefficients consume the
            # run length and the (r, 1) symbol appoints a newly-
            # significant one with a sign bit
            nonlocal eobrun
            p1 = 1 << al
            m1 = -p1
            k = ss
            if eobrun == 0:
                while k <= se:
                    rs = read_sym(ta)
                    r, s = rs >> 4, rs & 0xF
                    val = 0
                    if s == 0:
                        if r != 15:
                            eobrun = 1 << r
                            if r:
                                eobrun += rdr.bits(r)
                            break
                    else:
                        val = p1 if rdr.bit() else m1
                    while k <= se:
                        if blk[k] != 0:
                            if rdr.bit() and (blk[k] & p1) == 0:
                                blk[k] += p1 if blk[k] >= 0 else m1
                        else:
                            if r == 0:
                                break
                            r -= 1
                        k += 1
                    if s and k <= se:
                        blk[k] = val
                    k += 1
            if eobrun > 0:
                while k <= se:
                    if blk[k] != 0:
                        if rdr.bit() and (blk[k] & p1) == 0:
                            blk[k] += p1 if blk[k] >= 0 else m1
                    k += 1
                eobrun -= 1

        def at_restart():
            nonlocal eobrun
            rdr.align()
            p = rdr.pos
            if p and rdr.d[p - 1] == 0xFF and p < len(rdr.d) \
                    and 0xD0 <= rdr.d[p] <= 0xD7:
                rdr.pos = p + 1
            else:
                while rdr.pos + 1 < len(rdr.d) and not (
                        rdr.d[rdr.pos] == 0xFF
                        and 0xD0 <= rdr.d[rdr.pos + 1] <= 0xD7):
                    rdr.pos += 1
                rdr.pos += 2
            for c in preds:
                preds[c] = 0
            eobrun = 0

        ui = 0
        if len(sc["order"]) > 1:  # interleaved (DC band only)
            if ss != 0 or se != 0:
                raise ValueError(
                    "invalid progressive stream: interleaved scans "
                    "must be DC-only (Ss=Se=0)")
            for my in range(mcuy):
                for mx in range(mcux):
                    if restart and ui and ui % restart == 0:
                        at_restart()
                    ui += 1
                    for cid in sc["order"]:
                        _, hf, vf, qid = info[cid]
                        for byy in range(vf):
                            for bxx in range(hf):
                                blk = coef[cid][my * vf + byy,
                                                mx * hf + bxx]
                                if ah == 0:
                                    dec_dc_first(blk, cid)
                                else:
                                    dec_dc_refine(blk)
        else:
            cid = sc["order"][0]
            bh, bw = ndims[cid]
            ta = huff.get((1, sc["spec"][cid][1]))
            for by in range(bh):
                for bx in range(bw):
                    if restart and ui and ui % restart == 0:
                        at_restart()
                    ui += 1
                    blk = coef[cid][by, bx]
                    if ss == 0:
                        if ah == 0:
                            dec_dc_first(blk, cid)
                        else:
                            dec_dc_refine(blk)
                    elif ah == 0:
                        dec_ac_first(blk, ta)
                    else:
                        dec_ac_refine(blk, ta)

    # dequant + IDCT, vectorized over all blocks per component
    A = _dct_matrix()
    planes = {}
    for cid, hf, vf, qid in comps:
        c = coef[cid]
        by, bx = c.shape[0], c.shape[1]
        nat = np.zeros((by, bx, 64), np.float64)
        nat[:, :, _ZZ] = c * qt[qid][_ZZ][None, None, :].astype(np.float64)
        b8 = nat.reshape(by, bx, 8, 8)
        blk = np.einsum("ki,yxkl,lj->yxij", A, b8, A) + 128.0
        planes[cid] = blk.transpose(0, 2, 1, 3).reshape(by * 8, bx * 8)
    return _jpeg_finalize(planes, comps, h, w, hmax, vmax)


# --------------------------------------------------------------------
# dispatch
# --------------------------------------------------------------------

def decode_image(payload: bytes) -> np.ndarray:
    """(h, w, 3) uint8 RGB from BMP/PPM/PNG/baseline JPEG."""
    if payload[:2] == b"BM":
        return decode_bmp(payload)
    if payload[:2] == b"P6":
        return decode_ppm(payload)
    if payload[:8] == _PNG_SIG:
        return decode_png(payload)
    if payload[:2] == b"\xff\xd8":
        return decode_jpeg(payload)
    raise NotImplementedError(
        f"no codec for image magic {payload[:4]!r} in this environment "
        "(BMP, P6 PPM, 8-bit PNG and baseline JPEG decode natively)"
    )


def decode_audio(payload: bytes) -> tuple[int, np.ndarray]:
    if payload[:4] == b"RIFF":
        return decode_wav(payload)
    raise NotImplementedError(
        f"no codec for audio magic {payload[:4]!r} in this environment "
        "(RIFF PCM WAV decodes natively)"
    )
